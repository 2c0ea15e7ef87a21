"""distribution_drift semantics on a hand-computed fixture.

The oracle-parity test proves Spark == DuckDB on the same SQL shape; this
pins the *intended* numbers (integer-ppm shares, TVD, churn, min-key
tiebreak) against values computed by hand, so both engines being wrong the
same way would still fail.
"""

from cc_crawl_statistics_spark.operators.timeseries import distribution_drift


def _counts(spark):
    # crawl A: x=3/4, y=1/4   crawl B: x=1/2, z=1/2   crawl C: x=1/1
    rows = [
        ("A", "x", 3),
        ("A", "y", 1),
        ("B", "x", 1),
        ("B", "z", 1),
        ("C", "x", 1),
    ]
    return spark.createDataFrame(rows, "crawl string, k string, pages long")


def test_drift_hand_computed(spark):
    out = {
        (r["crawl_prev"], r["crawl"]): r.asDict()
        for r in distribution_drift(_counts(spark), "k").collect()
    }
    assert set(out) == {("A", "B"), ("B", "C")}

    ab = out[("A", "B")]
    # shares A: x=750000 y=250000; B: x=500000 z=500000
    # shifts: x 250000, y 250000 (dropped), z 500000 (new)
    assert ab["keys_prev"] == 2 and ab["keys_curr"] == 2
    assert ab["new_keys"] == 1 and ab["dropped_keys"] == 1
    assert ab["tvd_ppm"] == 500_000
    assert ab["max_shift_ppm"] == 500_000
    assert ab["max_shift_key"] == "z"

    bc = out[("B", "C")]
    # shares B: x=500000 z=500000; C: x=1000000
    # shifts: x 500000, z 500000 -> max tie, min-key tiebreak picks 'x'
    assert bc["keys_prev"] == 2 and bc["keys_curr"] == 1
    assert bc["new_keys"] == 0 and bc["dropped_keys"] == 1
    assert bc["tvd_ppm"] == 500_000
    assert bc["max_shift_ppm"] == 500_000
    assert bc["max_shift_key"] == "x"


def test_drift_identical_distributions_zero(spark):
    rows = [("A", "x", 2), ("A", "y", 2), ("B", "x", 4), ("B", "y", 4)]
    counts = spark.createDataFrame(
        rows, "crawl string, k string, pages long"
    )
    [r] = distribution_drift(counts, "k").collect()
    assert r["tvd_ppm"] == 0
    assert r["max_shift_ppm"] == 0
    assert r["new_keys"] == 0 and r["dropped_keys"] == 0
