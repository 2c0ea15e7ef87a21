"""ZipNum CDX index sink: format pins + roundtrip + seek-path pruning.

Pins the properties the real consumers rely on:
- concatenated members per shard = a valid multi-member .gz whose
  decompression is exactly the shard's sorted lines;
- every (offset, length) slice from cluster.idx decompresses standalone
  to exactly that block's lines (the seek contract);
- shards are globally range-ordered (total sort), blocks within a shard
  ascending;
- the lookup path decompresses ONLY index-selected candidate blocks and
  returns exactly the prefix-matching lines.
"""

import gzip
import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cc_crawl_statistics_spark.sources.zipnum import (
    cluster_index,
    decode_members,
    render_cdx_index_lines,
    write_zipnum,
    zipnum_lookup,
    zipnum_members,
)
from tests.conftest import spark  # noqa: F401  (fixture)


def _lines_df(spark, n=100):
    # deterministic unsorted cdx-ish lines: key zone + payload
    return spark.range(n).select(
        F.concat(
            F.lit("com,site"),
            ((F.col("id") * 7) % 13).cast("string"),
            F.lit(")/page/"),
            ((F.col("id") * 31) % 97).cast("string"),
            F.lit(" 2024"),
            F.col("id").cast("string"),
            F.lit(' {"url": "u'),
            F.col("id").cast("string"),
            F.lit('"}'),
        ).alias("value")
    )


@pytest.fixture(scope="module")
def built(spark):  # noqa: F811
    lines = _lines_df(spark)
    members = zipnum_members(lines, n_shards=3, block_size=7).cache()
    expected = sorted(r.value for r in lines.collect())
    return lines, members, expected


def test_members_roundtrip_and_total_order(built):
    _, members, expected = built
    rows = sorted(
        members.collect(), key=lambda r: (r.shard, r.block_no)
    )
    # concatenated members decompress to the globally sorted line list
    blob = b"".join(bytes(r.member) for r in rows)
    assert gzip.decompress(blob).decode().splitlines() == expected
    # per-member metadata is self-consistent
    for r in rows:
        lines = gzip.decompress(bytes(r.member)).decode().splitlines()
        assert len(lines) == r.n_lines <= 7
        assert r.first_key == lines[0].split(" ", 1)[0]
        assert r.length == len(bytes(r.member))
        assert lines == sorted(lines)
    # shard ranges do not interleave (total order across shards)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.first_key)
    shards = sorted(by_shard)
    for a, b in zip(shards, shards[1:]):
        assert max(by_shard[a]) <= min(by_shard[b])
    assert sum(r.n_lines for r in rows) == len(expected)


def test_cluster_index_offsets_slice_members(built):
    _, members, expected = built
    idx = {
        (r.shard, r.block_no): r
        for r in cluster_index(members).collect()
    }
    shard_bytes = {}
    for r in sorted(members.collect(), key=lambda x: (x.shard, x.block_no)):
        shard_bytes[r.shard] = shard_bytes.get(r.shard, b"") + bytes(r.member)
    seen = []
    for (shard, block_no), ix in sorted(idx.items()):
        sl = shard_bytes[shard][ix.offset : ix.offset + ix.length]
        lines = gzip.decompress(sl).decode().splitlines()
        assert lines[0].startswith(ix.first_key + " ")
        assert len(lines) == ix.n_lines
        seen.extend(lines)
    assert sorted(seen) == expected


def test_decode_members_matches_lines(built):
    _, members, expected = built
    got = sorted(r.value for r in decode_members(members).collect())
    assert got == expected


def test_lookup_prunes_and_matches(built, spark):  # noqa: F811
    _, members, expected = built
    prefix = "com,site3)/"
    got = sorted(r.value for r in zipnum_lookup(members, prefix).collect())
    assert got == sorted(v for v in expected if v.startswith(prefix))
    assert got  # fixture guarantees matches
    # pruning: candidate blocks (pre-decode) are a strict subset
    nxt = F.lead("first_key").over(
        Window.partitionBy("shard").orderBy("block_no")
    )
    bounded = members.withColumn("nfk", nxt)
    n_candidates = bounded.filter(
        (F.col("first_key") < prefix + "￿")
        & (F.col("nfk").isNull() | (F.col("nfk") >= prefix))
    ).count()
    assert n_candidates < members.count()


def test_write_zipnum_files(built, spark, tmp_path):  # noqa: F811
    _, members, expected = built
    out = str(tmp_path / "zipnum")
    write_zipnum(members, out)
    # shard files decompress to the full sorted corpus
    lines = []
    shard_files = sorted(
        f for f in os.listdir(out) if f.startswith("cdx-")
    )
    assert shard_files == [
        f"cdx-{r.shard:05d}.gz"
        for r in sorted(
            members.select("shard").distinct().collect(),
            key=lambda r: r.shard,
        )
    ]
    for f in shard_files:
        with open(os.path.join(out, f), "rb") as fh:
            data = fh.read()
        lines.extend(gzip.decompress(data).decode().splitlines())
    assert sorted(lines) == expected
    # cluster.idx: one sorted line per block, offsets slice the files
    idx_dir = os.path.join(out, "cluster.idx")
    part = [p for p in os.listdir(idx_dir) if p.startswith("part-")]
    assert len(part) == 1
    with open(os.path.join(idx_dir, part[0])) as fh:
        idx_lines = fh.read().splitlines()
    assert idx_lines == sorted(idx_lines)
    assert len(idx_lines) == members.count()
    for line in idx_lines:
        key, shard_file, offset, length, n_lines = line.split("\t")
        with open(os.path.join(out, shard_file), "rb") as fh:
            fh.seek(int(offset))
            block = gzip.decompress(fh.read(int(length)))
        blines = block.decode().splitlines()
        assert blines[0].startswith(key + " ")
        assert len(blines) == int(n_lines)


def test_read_back_and_merge_segments(built, spark, tmp_path):  # noqa: F811
    from cc_crawl_statistics_spark.sources.zipnum import (
        merge_zipnum_segments,
        read_zipnum_lines,
    )

    lines, members, expected = built
    # publish two disjoint segments, then merge into one global index
    seg_a = str(tmp_path / "seg_a")
    seg_b = str(tmp_path / "seg_b")
    half = lines.filter(F.crc32(F.col("value")) % 2 == 0)
    other = lines.filter(F.crc32(F.col("value")) % 2 == 1)
    write_zipnum(zipnum_members(half, n_shards=2, block_size=5), seg_a)
    write_zipnum(zipnum_members(other, n_shards=2, block_size=5), seg_b)
    # read path returns exactly the published lines
    got_a = sorted(r.value for r in read_zipnum_lines(spark, seg_a).collect())
    assert got_a == sorted(r.value for r in half.collect())
    merged = str(tmp_path / "merged")
    merge_zipnum_segments(
        spark, [seg_a, seg_b], merged, n_shards=3, block_size=7
    )
    got = sorted(
        r.value for r in read_zipnum_lines(spark, merged).collect()
    )
    assert got == expected
    # merged index is one total order across its shard files
    import gzip as _gz
    import os as _os

    all_lines = []
    for f in sorted(
        x for x in _os.listdir(merged) if x.startswith("cdx-")
    ):
        with open(_os.path.join(merged, f), "rb") as fh:
            all_lines.extend(
                _gz.decompress(fh.read()).decode().splitlines()
            )
    assert all_lines == expected


def test_render_from_pages_parses_back(spark):  # noqa: F811
    from cc_crawl_statistics_spark.sources.cdx import parse_cdx_lines
    from cc_crawl_statistics_spark.sources.tables import pages_df

    p = pages_df(spark, "/root/testdata/sf0.001")
    lines = render_cdx_index_lines(p)
    members = zipnum_members(lines, n_shards=4, block_size=64)
    parsed = parse_cdx_lines(decode_members(members))
    assert parsed.filter(~F.col("is_valid")).count() == 0
    assert parsed.count() == p.count()
    # url/status survive the full render -> block-gzip -> decode -> parse
    orig = p.groupBy("status").agg(
        F.countDistinct("url").alias("u"), F.count("*").alias("n")
    )
    got = parsed.groupBy("status").agg(
        F.countDistinct("url").alias("u"), F.count("*").alias("n")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, orig.collect())
    )
