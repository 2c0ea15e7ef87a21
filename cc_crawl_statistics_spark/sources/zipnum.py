"""ZipNum CDX index sink + seek/read path — the format Common Crawl
publishes its URL index in (cc-index: sharded ``cdx-NNNNN.gz`` files of
independently-gzipped blocks of N index lines, plus a ``cluster.idx``
secondary index mapping each block's first key to (file, offset, length)).

The reference repo CONSUMES cdx lines (crawlstats.py:776-798); producing
the index is the upstream step of the same public pipeline
(webarchive-indexing: a total-order sort of the lines, then block-gzip +
secondary index). Spark restatement of that MapReduce job:

- total order  = ``repartitionByRange`` (sampled range boundaries — the
  TotalOrderPartitioner analog) + ``sortWithinPartitions``; shard *i*'s
  keys all precede shard *i+1*'s (plan-free global sort, no single-task
  orderBy).
- block-gzip   = ``mapInPandas`` over each sorted shard, carrying a line
  buffer across Arrow batches and emitting one row per gzip *member*
  (``gzip.compress(..., mtime=0)`` — deterministic bytes, and
  concatenated members form a valid multi-member ``.gz`` file, which is
  exactly what makes ZipNum seekable).
- cluster.idx  = per-shard running sum of member lengths (offset =
  cumsum - length) over the bounded block dimension — one row per
  ``block_size`` lines, ~10^6 rows at 100 TB, so the final coalesce(1)
  text sink is safe.
- the read path (``zipnum_lookup``) prunes to candidate blocks via the
  secondary index key range BEFORE any decompression — the whole point
  of the format: a prefix query touches O(matching blocks), not O(index).
"""

from __future__ import annotations

import gzip
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MEMBER_SCHEMA = (
    "shard int, block_no long, first_key string, n_lines long, "
    "length long, member binary"
)


def render_cdx_index_lines(pages: DataFrame) -> DataFrame:
    """Inverse of sources/cdx.py:parse_cdx_lines — one
    ``<surt_key> <timestamp> <json>`` index line per fetch row, all
    codegen: ``to_json(struct(...))`` renders the metadata blob with
    real JSON escaping (raw mime strings may contain quotes) and omits
    NULL fields, exactly the dict-shaped blob the parser's all-nullable
    ``from_json`` schema tolerates."""
    blob = F.to_json(
        F.struct(
            F.col("url"),
            F.col("status").cast("string").alias("status"),
            F.col("mime"),
            F.col("mime_detected").alias("mime-detected"),
            F.col("charset"),
            F.col("languages"),
            F.col("digest"),
            F.col("warc_filename").alias("filename"),
        )
    )
    return pages.select(
        F.concat_ws(
            " ", F.col("surt_key"), F.col("fetch_ts").cast("string"), blob
        ).alias("value")
    )


def zipnum_members(
    lines: DataFrame, n_shards: int = 8, block_size: int = 3000
) -> DataFrame:
    """Sorted index lines → one row per gzip member (ZipNum block).

    Output: (shard, block_no, first_key, n_lines, length, member) where
    ``member`` is a complete deterministic gzip member of ``block_size``
    lines (the last block of a shard may be short). Concatenating a
    shard's members in block_no order yields the shard's ``.gz`` file
    bytes verbatim — pinned by tests/test_zipnum.py."""
    sorted_lines = lines.repartitionByRange(
        n_shards, F.col("value")
    ).sortWithinPartitions("value")
    with_shard = sorted_lines.select(
        F.spark_partition_id().alias("shard"), "value"
    )

    def compress_blocks(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        buf: list[str] = []
        shard = None
        block_no = 0

        def flush() -> pd.DataFrame:
            nonlocal block_no, buf
            data = ("\n".join(buf) + "\n").encode("utf-8")
            member = gzip.compress(data, compresslevel=6, mtime=0)
            row = pd.DataFrame(
                {
                    "shard": [shard],
                    "block_no": [block_no],
                    "first_key": [buf[0].split(" ", 1)[0]],
                    "n_lines": [len(buf)],
                    "length": [len(member)],
                    "member": [member],
                }
            )
            block_no += 1
            buf = []
            return row

        for pdf in batches:
            if len(pdf) and shard is None:
                shard = int(pdf["shard"].iloc[0])
            for line in pdf["value"]:
                buf.append(line)
                if len(buf) == block_size:
                    yield flush()
        if buf:
            yield flush()

    return with_shard.mapInPandas(compress_blocks, schema=MEMBER_SCHEMA)


def cluster_index(members: DataFrame) -> DataFrame:
    """Secondary index: each block's first key → (shard file, byte offset,
    member length, line count). The window partitions by shard over the
    bounded block dimension (one row per block_size lines)."""
    w = (
        Window.partitionBy("shard")
        .orderBy("block_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return members.select(
        "first_key",
        F.format_string("cdx-%05d.gz", F.col("shard")).alias("shard_file"),
        "shard",
        "block_no",
        (F.sum("length").over(w) - F.col("length")).alias("offset"),
        "length",
        "n_lines",
    )


def decode_members(members: DataFrame) -> DataFrame:
    """Read path for fetched blocks: gzip member bytes → index lines (one
    row per line). Arrow-batched; only ever applied to blocks the
    secondary index selected."""

    def decompress(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[str] = []
            for member in pdf["member"]:
                out.extend(
                    gzip.decompress(bytes(member))
                    .decode("utf-8")
                    .splitlines()
                )
            yield pd.DataFrame({"value": out})

    return members.mapInPandas(decompress, schema="value string")


def zipnum_lookup(members: DataFrame, key_prefix: str) -> DataFrame:
    """Prefix query against the index, pruning via block key ranges
    exactly as a cluster.idx binary search would: a block can contain the
    prefix iff first_key <= the prefix's upper sibling AND the NEXT
    block's first_key >= the prefix (lead() closes each block's key
    range; the shard's last block is unbounded above). Only surviving
    blocks are decompressed."""
    nxt = Window.partitionBy("shard").orderBy("block_no")
    bounded = members.withColumn(
        "next_first_key", F.lead("first_key").over(nxt)
    )
    candidates = bounded.filter(
        (F.col("first_key") < key_prefix + "￿")
        & (
            F.col("next_first_key").isNull()
            | (F.col("next_first_key") >= key_prefix)
        )
    )
    return decode_members(candidates).filter(
        F.col("value").startswith(key_prefix)
    )


def read_zipnum_lines(spark, path: str) -> DataFrame:
    """Read a published index back to lines: ``binaryFile`` scan of the
    shard files (one task per shard — CC's gzip-per-file layout), whole-
    file multi-member decompression in an Arrow batch. For selective
    reads use zipnum_lookup/cluster.idx instead; this is the full-scan
    path (reindexing, merging, auditing)."""

    def decompress(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[str] = []
            for blob in pdf["content"]:
                out.extend(
                    gzip.decompress(bytes(blob)).decode("utf-8").splitlines()
                )
            yield pd.DataFrame({"value": out})

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "cdx-*.gz")
        .load(path)
        .select("content")
    )
    return files.mapInPandas(decompress, schema="value string")


def merge_zipnum_segments(
    spark,
    segment_dirs: list[str],
    out: str,
    n_shards: int = 8,
    block_size: int = 3000,
) -> None:
    """Merge per-segment indexes (e.g. streaming batch-N publications)
    into one global index: union the segment lines, re-run the
    total-order shard/block pass, publish. The shuffle is the sorted
    merge — range partitioning with sampled bounds over already-sorted
    inputs moves each line once."""
    lines = read_zipnum_lines(spark, segment_dirs[0])
    for d in segment_dirs[1:]:
        lines = lines.union(read_zipnum_lines(spark, d))
    write_zipnum(zipnum_members(lines, n_shards, block_size), out)


def write_zipnum(members: DataFrame, path: str) -> None:
    """Materialize the index: one ``cdx-NNNNN.gz`` per shard (members
    appended in block order — executor-local streaming write, one
    partition per shard so no file is touched by two tasks) plus a
    single sorted ``cluster.idx``."""
    os.makedirs(path, exist_ok=True)
    # Pin the block lineage: it is consumed TWICE (the .gz file writes and
    # cluster_index), and re-executing the sampled repartitionByRange +
    # block-gzip pipeline would both double the compression cost and risk
    # a secondary index derived from a divergent recomputation whose
    # (offset, length) don't address the bytes actually written.
    members = members.persist()
    per_shard = members.repartition(F.col("shard")).sortWithinPartitions(
        "shard", "block_no"
    )

    def write_partition(rows) -> None:
        # hash partitioning may co-locate several shards in one task;
        # rows arrive sorted (shard, block_no), so switch files on change
        fh, current = None, None
        try:
            for row in rows:
                if row.shard != current:
                    if fh is not None:
                        fh.close()
                    current = row.shard
                    fname = os.path.join(path, f"cdx-{row.shard:05d}.gz")
                    fh = open(fname, "wb")
                fh.write(bytes(row.member))
        finally:
            if fh is not None:
                fh.close()

    per_shard.foreachPartition(write_partition)
    idx_lines = cluster_index(members).select(
        F.concat_ws(
            "\t",
            "first_key",
            "shard_file",
            F.col("offset").cast("string"),
            F.col("length").cast("string"),
            F.col("n_lines").cast("string"),
        ).alias("value")
    )
    (
        idx_lines.orderBy("value")
        .coalesce(1)
        .write.mode("overwrite")
        .text(os.path.join(path, "cluster.idx"))
    )
    members.unpersist()
