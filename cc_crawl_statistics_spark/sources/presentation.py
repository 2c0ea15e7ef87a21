"""S7: CSV / HTML presentation sinks for the plot layer.

The reference's plot scripts materialize their (already tiny, fully
aggregated) pandas frames to ``data/*.csv`` and ``plots/*.html``:

- crawl_size.py:162-165  ``self.size.to_csv('data/crawlsize.csv')``
- table.py:121-135       ``save_data_percentage`` — percent-of-crawl CSV
                         with ``float_format='%.4f'``, no index
- table.py:146-160       ``plot`` — percentage pivot (rows=type,
                         cols=crawl) rendered via ``to_html`` with
                         ``{:,.4f}`` formatters and tablesorter CSS

These are PRESENTATION sinks, not data paths: their inputs are the
plot-layer aggregates (≤ a few thousand rows — crawls × top-N types), so
a driver-side ``toPandas`` render is the correct design at any corpus
scale. What must NOT happen driver-side is the aggregation itself —
``percentage_pivot`` therefore computes the percent-of-crawl shares and
the pivot IN SPARK (map-side-combined groupBy + relational pivot) and
only collects the final crawls-wide table. A guard refuses frames whose
row count exceeds ``max_rows`` so an unaggregated table can never be
dragged through the driver by accident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: presentation frames are plot-layer aggregates; anything bigger is a
#: pipeline bug, not a rendering job
DEFAULT_MAX_ROWS = 100_000


def _bounded_pandas(df: DataFrame, max_rows: int):
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"presentation sink refused: > {max_rows} rows — this is an "
            "aggregate-rendering sink, not a data export; aggregate first"
        )
    return pdf


def write_csv(
    df: DataFrame,
    path: str,
    float_format: str | None = "%.4f",
    index: bool = False,
    max_rows: int = DEFAULT_MAX_ROWS,
) -> str:
    """Render a bounded aggregate to one CSV file, matching the
    reference's ``DataFrame.to_csv(..., float_format='%.4f',
    index=None)`` byte shape (table.py:121-135)."""
    pdf = _bounded_pandas(df, max_rows)
    pdf.to_csv(path, float_format=float_format, index=index)
    return path


def percentage_pivot(
    counts: DataFrame,
    key: str,
    value: str = "pages",
    crawl_col: str = "crawl",
) -> DataFrame:
    """table.py:146-153 semantics as a Spark plan: per-crawl percentage of
    ``value`` for each ``key``, pivoted to one row per key with one column
    per crawl. Percent values are permille-floored integers divided at
    render time in the reference; here they stay exact micro-percent
    integers (pct * 10^4, floored) so the sink output is deterministic
    across partitionings — the HTML formatter divides for display."""
    per = counts.groupBy(crawl_col, key).agg(F.sum(value).alias("v"))
    tot = counts.groupBy(crawl_col).agg(F.sum(value).alias("t"))
    pct = per.join(F.broadcast(tot), crawl_col).select(
        crawl_col,
        key,
        F.floor(F.lit(1_000_000) * F.col("v") / F.col("t"))
        .cast("long")
        .alias("pct_x10000"),
    )
    return (
        pct.groupBy(key).pivot(crawl_col).agg(F.first("pct_x10000"))
    ).orderBy(key)


def write_percentage_html(
    counts: DataFrame,
    path: str,
    key: str,
    value: str = "pages",
    css_classes: tuple[str, ...] = ("tablesorter", "tablepercentage"),
    max_rows: int = DEFAULT_MAX_ROWS,
) -> str:
    """table.py:154-160: render the percentage pivot as an HTML table with
    ``{0:,.4f}``-formatted percent cells and tablesorter CSS classes."""
    piv = percentage_pivot(counts, key, value)
    pdf = _bounded_pandas(piv, max_rows).set_index(key)
    pdf = pdf / 10_000.0  # micro-percent ints -> percent for display
    formatters = {c: "{0:,.4f}".format for c in pdf.columns}
    pdf.to_html(path, formatters=formatters, classes=list(css_classes))
    return path
