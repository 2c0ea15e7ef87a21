"""Every oracle-paired query must match DuckDB exactly at sf0.001
(the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from cc_crawl_statistics_spark.plans.queries import ORACLES, QUERIES
from tests.conftest import SF_SMOKE, value_hash


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_SMOKE).toPandas()
    ddf = duck.execute(ORACLES[name]).fetchdf()
    assert len(sdf) == len(ddf), f"{name}: row count {len(sdf)} != {len(ddf)}"
    assert sorted(sdf.columns) == sorted(ddf.columns), f"{name}: columns differ"
    assert value_hash(sdf) == value_hash(ddf), f"{name}: values differ"


def test_all_queries_nonempty(spark):
    for name, fn in QUERIES.items():
        assert fn(spark, SF_SMOKE).limit(1).count() > 0, f"{name} empty"


def test_oracle_keys_subset():
    assert set(ORACLES) <= set(QUERIES)
