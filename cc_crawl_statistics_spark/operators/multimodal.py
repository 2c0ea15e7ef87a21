"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs via mapInPandas.

The decode step is STUBBED (no image/audio libraries in this container —
clearly marked below); everything Spark-side is real and tested: schema,
batch iteration, partition sizing, and the deterministic fake feature
extractor that stands in for a real decoder.

Scale notes: binary payloads dominate partition size — size partitions by
bytes not rows (spark.sql.files.maxPartitionBytes), keep metadata in
separate columns so pruning can skip payload IO for metadata-only queries
(parquet column pruning makes `select(media_type, width)` free of blob
reads), and never collect payloads to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "doc_id long, media_type string, n_bytes long, feature array<float>"


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from documents: payload bytes
    are a stable function of (doc_id, text) so tests are reproducible."""
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.to_binary(F.sha2(F.concat(F.col("text"), F.col("doc_id")), 256), F.lit("hex")).alias(
            "payload"
        ),
        (F.col("doc_id") % 1920 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 1080 + 1).cast("int").alias("height"),
        (F.col("doc_id") % 60000).cast("int").alias("duration_ms"),
    )


def decode_payload(payload: bytes, media_type: str):  # pragma: no cover
    """STUB: real deployments decode here (PIL/libav/ffmpeg). The container
    has no media libraries, so decoding raises — callers use
    extract_features' deterministic fake path instead."""
    raise NotImplementedError(
        "media decoding requires image/audio libs not present in this "
        "container; production wires PIL/torchaudio here"
    )


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas: the batch shape, schema, and partition flow are the real
    production plumbing; the 'feature' is a deterministic fake (bytes →
    normalized histogram) standing in for the stubbed decoder."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            payloads = pdf["payload"]
            feats = []
            for b in payloads:
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                total = hist.sum() or 1.0
                feats.append(hist / total)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode the sample timeline JVM-side
    (sequence), leaving only per-frame decode to the (stubbed) UDF — the
    explode must happen before the decoder so frames parallelize across
    tasks, not inside one Python batch."""
    return media.filter(F.col("media_type") == "video").select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


RESIZE_SCHEMA = (
    "doc_id long, media_type string, width int, height int, "
    "payload binary"
)


def resize_plan(
    media: DataFrame, max_w: int = 224, max_h: int = 224
) -> DataFrame:
    """Image/video-frame resize plumbing via mapInPandas: the real
    production shape — target geometry computed JVM-side (aspect-
    preserving fit into max_w×max_h, integer arithmetic, so the metadata
    columns are exact and SQL-checkable), payload transformation in an
    Arrow batch. The byte transform is a deterministic fake (truncate the
    payload proportionally to the area ratio) standing in for the stubbed
    decoder (decode_payload) exactly like extract_features' histogram;
    everything around it — schema, pruning (only image/video rows enter
    the Python stage), batch shape, output metadata — is the real
    pipeline."""
    fit = F.least(
        F.lit(1_000_000),
        F.least(
            (F.lit(max_w) * 1_000_000 / F.col("width")).cast("long"),
            (F.lit(max_h) * 1_000_000 / F.col("height")).cast("long"),
        ),
    )
    sized = media.filter(
        F.col("media_type").isin("image", "video")
    ).select(
        "doc_id",
        "media_type",
        "payload",
        "width",
        "height",
        F.greatest(
            F.lit(1), (F.col("width") * fit / 1_000_000).cast("int")
        ).alias("new_w"),
        F.greatest(
            F.lit(1), (F.col("height") * fit / 1_000_000).cast("int")
        ).alias("new_h"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_bytes = []
            for b, w, h, nw, nh in zip(
                pdf["payload"], pdf["width"], pdf["height"],
                pdf["new_w"], pdf["new_h"], strict=True,
            ):
                # deterministic stand-in for decode→resample→encode:
                # keep a byte count proportional to the area ratio
                keep = max(1, (len(b) * int(nw) * int(nh)) // (int(w) * int(h)))
                out_bytes.append(bytes(b)[:keep])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": pdf["new_w"].astype("int32"),
                    "height": pdf["new_h"].astype("int32"),
                    "payload": out_bytes,
                }
            )

    return sized.mapInPandas(batches, RESIZE_SCHEMA)
