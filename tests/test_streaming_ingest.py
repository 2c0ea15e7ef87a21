"""Streaming WARC ingestion (streaming/ingest.py): stream == batch parse
parity, and exactly-once WARC→WET derivation across a query restart."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cc_crawl_statistics_spark.sources import warc as W
from cc_crawl_statistics_spark.sources.tables import pages_df
from cc_crawl_statistics_spark.streaming import ingest as I
from tests.conftest import SF_SMOKE


def _write_warc_parts(spark, out):
    pages = pages_df(spark, SF_SMOKE).repartition(4)
    W.write_warc(pages, out)
    return pages


def test_stream_publish_zipnum_incremental_and_idempotent(spark, tmp_path):
    """Each pages micro-batch publishes a complete, self-contained ZipNum
    segment index; a restarted query with no new data publishes nothing
    more (exactly once)."""
    import gzip

    pages_dir = str(tmp_path / "pages")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    pages = pages_df(spark, SF_SMOKE)
    crawls = sorted(r.crawl for r in pages.select("crawl").distinct().collect())

    def run():
        q = I.stream_publish_zipnum(
            spark, pages_dir, index_dir, ckpt,
            schema=pages.schema, n_shards=2, block_size=64,
        )
        q.processAllAvailable()
        q.stop()

    # wave 1: first crawl lands
    pages.filter(F.col("crawl") == crawls[0]).write.mode("append").parquet(
        pages_dir
    )
    run()
    batches = sorted(os.listdir(index_dir))
    assert len(batches) == 1

    # wave 2: second crawl lands -> one more segment index
    pages.filter(F.col("crawl") == crawls[1]).write.mode("append").parquet(
        pages_dir
    )
    run()
    batches = sorted(os.listdir(index_dir))
    assert len(batches) == 2

    # restart with no new data publishes nothing more
    run()
    assert sorted(os.listdir(index_dir)) == batches

    # the union of segment lines covers exactly all published rows, and
    # each segment is internally sorted
    total_lines = 0
    for b in batches:
        bdir = os.path.join(index_dir, b)
        lines = []
        for f in sorted(os.listdir(bdir)):
            if f.startswith("cdx-"):
                with open(os.path.join(bdir, f), "rb") as fh:
                    lines.extend(
                        gzip.decompress(fh.read()).decode().splitlines()
                    )
        # shard files concatenate in name order to the segment's total
        # order (range partitioning: shard i's keys precede shard i+1's)
        assert lines == sorted(lines)
        total_lines += len(lines)
    expected = pages.filter(F.col("crawl").isin(crawls[:2])).count()
    assert total_lines == expected


def test_stream_stats_match_batch(spark, tmp_path):
    """Complete-mode streaming aggregation over the WARC stream equals the
    batch aggregation over the same files — including the HLL distinct-URL
    sketch (deterministic on identical input sets)."""
    warc_dir = str(tmp_path / "warc")
    _write_warc_parts(spark, warc_dir)

    q = (
        I.streaming_crawl_stats(I.stream_warc_records(spark, warc_dir))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("warc_stats")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.table("warc_stats")

    batch = (
        W.parse_warc_records(W.read_warc_records(spark, warc_dir))
        .filter(F.col("is_valid"))
        .groupBy("status", "mime")
        .agg(
            F.count("*").alias("n_records"),
            F.approx_count_distinct("url").alias("urls_est"),
        )
    )
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_stream_wet_exactly_once_across_restart(spark, tmp_path):
    """foreachBatch WET derivation with a checkpoint: all records derived
    once; restarting the query over the same input writes nothing new."""
    warc_dir = str(tmp_path / "warc")
    pages = _write_warc_parts(spark, warc_dir)
    wet_dir = str(tmp_path / "wet")
    ckpt = str(tmp_path / "ckpt")

    q = I.stream_warc_to_wet(spark, warc_dir, wet_dir, ckpt)
    q.processAllAvailable()
    q.stop()

    def read_wet():
        return W.parse_wet_records(
            W.read_warc_records(spark, os.path.join(wet_dir, "batch-*"))
        )

    n_pages = pages.count()
    first = read_wet()
    assert first.count() == n_pages
    # text is the byte-identical extraction of the deterministic body
    want = pages.select(
        "url", F.concat(F.col("url"), F.col("digest")).alias("text")
    )
    assert first.select("url", "text").exceptAll(want).count() == 0

    # restart over the same input: checkpoint replays nothing new
    q2 = I.stream_warc_to_wet(spark, warc_dir, wet_dir, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert read_wet().count() == n_pages
