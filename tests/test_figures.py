"""Figure layer (sources/figures.py): golden tests on figure DATA —
series membership, exact values vs independent DuckDB recomputation,
the reference's tick ladder / color policy / heatmap cell-text rounding
(crawlplot.py:372-516, plot/overlap.py:233-250) — and the sanctioned
NotImplementedError path for pixel rendering (no matplotlib here)."""

import duckdb
import pytest

from cc_crawl_statistics_spark.sources import figures as FG
from cc_crawl_statistics_spark.sources.tables import pages_df
from tests.conftest import spark  # noqa: F401  (fixture)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages(spark):  # noqa: F811
    return pages_df(spark, SF)


def _duck(sql):
    """Independent recomputation: DuckDB over the same documents parquet
    through the shared pages derivation (synth.PAGES_SQL)."""
    from cc_crawl_statistics_spark.synth import PAGES_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    con.execute(f"CREATE VIEW pages AS ({PAGES_SQL})")
    return con.execute(sql).fetchall()


def test_nice_tick_step_ladder():
    """1/2/5 × 10^k, the reference's nice_tick_step (crawlplot.py:372)."""
    assert FG.nice_tick_step(0, 10, 5) == 2
    assert FG.nice_tick_step(0, 100, 5) == 20
    assert FG.nice_tick_step(0, 7, 5) == 2
    assert FG.nice_tick_step(0, 26, 5) == 10
    assert FG.nice_tick_step(0, 0.4, 5) == pytest.approx(0.1)
    assert FG.nice_tick_step(3, 3, 5) == 1.0  # zero span


def test_crawl_size_figure_golden(spark, pages):  # noqa: F811
    spec = FG.crawl_size_figure(pages)
    assert spec.kind == "line" and spec.series == "type"
    assert set(spec.frame["type"]) == {"page", "url", "digest"}
    # ≤3 series → the reference pins ggplot2's categorical hues
    assert spec.colors() == FG.GGPLOT2_COLORS_3
    # exact values vs an independent engine
    pdf = spec.frame
    is_page = (
        "status = 200 AND NOT regexp_matches(warc_filename, '/robotstxt/')"
    )
    for crawl, n in _duck(
        f"SELECT crawl, COUNT(*) FROM pages WHERE {is_page} GROUP BY crawl"
    ):
        got = pdf[(pdf["type"] == "page") & (pdf["crawl"] == crawl)][
            "size"
        ].iloc[0]
        assert int(got) == n
    for crawl, n in _duck(
        f"SELECT crawl, COUNT(DISTINCT url) FROM pages WHERE {is_page} "
        "GROUP BY crawl"
    ):
        got = pdf[(pdf["type"] == "url") & (pdf["crawl"] == crawl)][
            "size"
        ].iloc[0]
        assert int(got) == n


def test_trailing_figure_series_and_values(spark, pages):  # noqa: F811
    spec = FG.trailing_figure(pages, ns=(2, 3))
    assert set(spec.frame["type"]) == {"2 crawls", "3 crawls"}
    assert spec.clabel == "n crawls"
    # window shorter than N → 0 (the reference's nan slot)
    first_crawl = spec.frame["crawl"].min()
    under = spec.frame[
        (spec.frame["crawl"] == first_crawl)
    ]
    assert (under["size"] == 0).all()


def test_url_status_figure_partition(spark, pages):  # noqa: F811
    """new + revisit + duplicate = fetched pages per crawl (the melt is
    a partition of page fetches — crawl_size.py:278-298)."""
    spec = FG.url_status_figure(pages)
    per_crawl = spec.frame.groupby("crawl")["size"].sum()
    for crawl, n in _duck(
        "SELECT crawl, COUNT(*) FROM pages WHERE status = 200 "
        "AND NOT regexp_matches(warc_filename, '/robotstxt/') "
        "GROUP BY crawl"
    ):
        assert int(per_crawl[crawl]) == n


def test_mime_share_figure_topn_and_permille(spark, pages):  # noqa: F811
    spec = FG.mime_share_figure(pages, top_n=3)
    assert spec.frame["type"].nunique() == 3
    # permille of a full partition sums to ≤1000 per crawl (floor)
    per_crawl = spec.frame.groupby("crawl")["size"].sum()
    assert (per_crawl <= 1000).all()


def test_overlap_matrix_rounding_rules(spark, pages):  # noqa: F811
    """Cell text follows overlap.py:233-250: spread ≤ .2 → 3 decimals,
    minshown .0005, leading zero stripped, below-threshold = '0'."""
    spec = FG.overlap_matrix_figure(pages)
    sim = spec.frame["similarity_permille"] / 1000.0
    spread = sim.max() - sim.min()
    decimals = spec.meta["decimals"]
    assert decimals == (2 if spread > 0.2 else 3)
    for s, txt in zip(sim, spec.frame["sim_rounded"]):
        minshown = 0.005 if decimals == 2 else 0.0005
        if s >= minshown:
            assert txt == ("{0:.%df}" % decimals).format(s).lstrip("0")
        else:
            assert txt == "0"
    # midpoint is the median (the reference's diverging-scale anchor)
    assert spec.meta["midpoint_permille"] == int(sim.median() * 1000)


def test_histogram_figure_bins_are_125(spark, pages):  # noqa: F811
    spec = FG.histogram_figure(pages)
    for b in spec.frame["x"]:
        s = str(int(b))
        assert s[0] in "125" and set(s[1:]) <= {"0"}


def test_build_figures_all(spark):  # noqa: F811
    specs = FG.build_figures(spark, SF)
    assert len(specs) == len(FG.ALL_FIGURES)
    names = [s.name for s in specs]
    assert len(names) == len(set(names))
    for s in specs:
        assert len(s.frame) > 0
        assert s.kind in ("line", "bar", "heatmap")
        # bounded, dimension-sized frames only — presentation contract
        assert len(s.frame) < 10_000


def test_render_without_matplotlib_raises(spark, pages, tmp_path):  # noqa: F811
    """Sanctioned stub: the container has no matplotlib, so rendering
    raises a clear NotImplementedError while the data path stays green.
    If matplotlib IS present (a real deployment), the render must
    produce a file instead."""
    spec = FG.crawl_size_figure(pages)
    try:
        import matplotlib  # noqa: F401

        have_mpl = True
    except ImportError:
        have_mpl = False
    out = str(tmp_path / "fig.png")
    if have_mpl:  # pragma: no cover - not this sandbox
        import os

        assert FG.render_figure(spec, out) == out and os.path.exists(out)
    else:
        with pytest.raises(NotImplementedError):
            FG.render_figure(spec, out)


def test_share_family_and_continent_figures(spark, pages):  # noqa: F811
    """The charset/language share charts follow the same permille
    partition rule as mimetype; the continent rollup is a partition of
    each crawl's TLD pages (with '(other)' fallback)."""
    for fig in (
        FG.charset_share_figure(pages, top_n=3),
        FG.language_share_figure(pages, top_n=3),
    ):
        assert fig.frame["type"].nunique() <= 3
        assert (fig.frame.groupby("crawl")["size"].sum() <= 1000).all()
    cont = FG.tld_continent_figure(pages)
    per_crawl = cont.frame.groupby("crawl")["size"].sum()
    for crawl, n in _duck(
        "SELECT crawl, COUNT(*) FROM pages WHERE status = 200 "
        "AND NOT regexp_matches(warc_filename, '/robotstxt/') "
        "GROUP BY crawl"
    ):
        assert int(per_crawl[crawl]) == n


def test_fetch_status_figure_partition(spark, pages):  # noqa: F811
    """success/temp_moved/notfound/exception partition the non-robots
    fetches per crawl (plot/crawler_metrics.py's counter chart)."""
    spec = FG.fetch_status_figure(pages)
    per_crawl = spec.frame.groupby("crawl")["size"].sum()
    for crawl, n in _duck(
        "SELECT crawl, COUNT(*) FROM pages WHERE NOT "
        "regexp_matches(warc_filename, '/robotstxt/') GROUP BY crawl"
    ):
        assert int(per_crawl[crawl]) == n
    assert set(spec.frame["type"]) <= {
        "success", "temp_moved", "notfound", "exception"
    }


def test_mime_detected_figure_totals(spark, pages):  # noqa: F811
    """The declared-vs-detected matrix cells partition the page fetches
    (plot/mimetype_detected.py's comparison)."""
    spec = FG.mime_detected_figure(pages)
    total = int(spec.frame["similarity_permille"].sum())
    (expected,) = _duck(
        "SELECT COUNT(*) FROM pages WHERE status = 200 "
        "AND NOT regexp_matches(warc_filename, '/robotstxt/')"
    )[0]
    assert total == expected
    assert (spec.frame["cell_text"] ==
            spec.frame["similarity_permille"].astype(str)).all()
