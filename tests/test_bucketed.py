"""Bucketed tables: Exchange-free co-located joins + aggregations, with
value parity against the unbucketed plans."""

import pytest
from pyspark.sql import functions as F

from cc_crawl_statistics_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)
from cc_crawl_statistics_spark.sources.tables import pages_df
from tests.conftest import SF_SMOKE, spark  # noqa: F401  (fixture)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):  # noqa: F811
    base = tmp_path_factory.mktemp("bucketed")
    p = pages_df(spark, SF_SMOKE)
    crawls = [r.crawl for r in p.select("crawl").distinct().collect()]
    names = []
    for i, crawl in enumerate(sorted(crawls)[:2]):
        name = f"pages_bucketed_{i}"
        write_bucketed(
            p.filter(F.col("crawl") == crawl),
            name,
            n_buckets=8,
            bucket_cols=("url",),
            sort_cols=("url",),
            path=str(base / name),
        )
        names.append(name)
    yield names
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_cocolocated_join_has_no_exchange(spark, bucketed):  # noqa: F811
    a = read_bucketed(spark, bucketed[0]).select("url", "digest")
    b = read_bucketed(spark, bucketed[1]).select("url", "digest")
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "url")
        joined.collect()  # materialize so the AQE final plan is real
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # unbucketed control: the same join DOES shuffle
        ub_a = pages_df(spark, SF_SMOKE).select("url", "digest")
        control = ub_a.join(
            ub_a.withColumnRenamed("digest", "d2"), "url"
        )
        control.collect()
        assert "Exchange" in _plan(control)
        # value parity with the unbucketed join
        p = pages_df(spark, SF_SMOKE)
        crawls = sorted(r.crawl for r in p.select("crawl").distinct().collect())
        ref = (
            p.filter(F.col("crawl") == crawls[0])
            .select("url", "digest")
            .join(
                p.filter(F.col("crawl") == crawls[1]).select(
                    "url", F.col("digest").alias("digest2")
                ),
                "url",
            )
            .count()
        )
        assert joined.count() == ref
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed):  # noqa: F811
    t = read_bucketed(spark, bucketed[0])
    agg = t.groupBy("url").agg(F.count("*").alias("n"))
    agg.collect()
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    # the agg's scan consumes the bucket spec...
    assert "Bucketed: true" in plan, plan
    # ...while a plain projection correctly DISABLES the bucketed scan
    # (autoBucketedScan: nothing downstream needs the distribution, so
    # Spark is free to split the files for parallelism)
    assert "Bucketed: false" in _plan(t.select("url"))
