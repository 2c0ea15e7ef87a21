"""Edge-case pins for the full-PSL suffix split (reference parity with
tldextract behavior at crawlstats.py:501-528) and the vendored dimension
data (IANA TLD table, continent map, MonthlyCrawl registry)."""

from __future__ import annotations

from cc_crawl_statistics_spark.dims import (
    crawl_date,
    monthly_crawl_dim,
    tld_dim,
)
from cc_crawl_statistics_spark.dims_data import (
    monthly_crawl_registry,
    tld_continent_rows,
    tld_type_rows,
)
from cc_crawl_statistics_spark.functions.psl import split_host


def _split(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    return {
        r.host: (r.domain, r.tld) for r in split_host(df, "host").collect()
    }


def test_psl_longest_match_depths(spark):
    got = _split(
        spark,
        [
            "example.org",                  # 1-label suffix
            "www.site.co.uk",               # 2-label suffix
            "school.act.edu.au",            # 3-label suffix
            "deep.sub.school.act.edu.au",   # registrable from deep subdomain
        ],
    )
    assert got["example.org"] == ("example.org", "org")
    assert got["www.site.co.uk"] == ("site.co.uk", "co.uk")
    assert got["school.act.edu.au"] == ("school.act.edu.au", "act.edu.au")
    assert got["deep.sub.school.act.edu.au"] == (
        "school.act.edu.au",
        "act.edu.au",
    )


def test_psl_wildcard_and_exception_rules(spark):
    got = _split(
        spark,
        [
            "foo.pref.yokohama.jp",  # *.yokohama.jp wildcard
            "city.yokohama.jp",      # !city.yokohama.jp exception
            "www.city.yokohama.jp",
            "shop.example.ck",       # *.ck wildcard
            "www.ck",                # !www.ck exception
        ],
    )
    # wildcard: pref.yokohama.jp is itself a public suffix
    assert got["foo.pref.yokohama.jp"] == (
        "foo.pref.yokohama.jp",
        "pref.yokohama.jp",
    )
    # exception: city.yokohama.jp is registrable under yokohama.jp
    assert got["city.yokohama.jp"] == ("city.yokohama.jp", "yokohama.jp")
    assert got["www.city.yokohama.jp"] == ("city.yokohama.jp", "yokohama.jp")
    assert got["shop.example.ck"] == ("shop.example.ck", "example.ck")
    assert got["www.ck"] == ("www.ck", "ck")


def test_psl_ip_invalid_and_unlisted(spark):
    got = _split(spark, ["192.168.0.1", "localhost", "foo.notatld1234"])
    assert got["192.168.0.1"] == ("192.168.0.1", "(ip address)")
    # unlisted suffix -> tld '', domain = last label (tldextract semantics)
    assert got["localhost"] == ("localhost", "")
    assert got["foo.notatld1234"] == ("notatld1234", "")


def test_psl_host_equals_suffix(spark):
    # tldextract: domain='' -> reference emits '.suffix' (crawlstats.py:521)
    got = _split(spark, ["co.uk"])
    assert got["co.uk"] == (".co.uk", "co.uk")


def test_monthly_crawl_registry_pins():
    reg = monthly_crawl_registry()
    assert len(reg) == 126
    # registration-order ids (crawlstats.py:35-167)
    assert reg["CC-MAIN-2014-52"] == 0
    assert reg["CC-MAIN-2016-50"] == 19
    assert reg["CC-MAIN-2024-22"] == 87
    assert reg["CC-MAIN-2008-2009"] == 88
    assert reg["CC-MAIN-2014-49"] == 99
    assert reg["CC-MAIN-2024-26"] == 100
    assert reg["CC-MAIN-2026-30"] == 125
    # ids are unique and dense
    assert sorted(reg.values()) == list(range(126))


def test_crawl_dates_incl_historical():
    import datetime as dt

    assert crawl_date("CC-MAIN-2008-2009") == dt.date(2009, 1, 12)
    assert crawl_date("CC-MAIN-2009-2010") == dt.date(2010, 9, 25)
    assert crawl_date("CC-MAIN-2012") == dt.date(2012, 11, 2)
    assert crawl_date("CC-MAIN-2024-10") == dt.date(2024, 3, 4)


def test_monthly_crawl_dim_shape(spark):
    dim = monthly_crawl_dim(spark).toPandas()
    assert len(dim) == 126
    assert dim.crawl_id.is_unique


def test_vendored_tld_tables_token_integrity():
    """Pins against the round-2 corruption class: blob wrapping must never
    shear a token ('xn-- ' + '4dbrk0ce'). No token equals 'xn--'/'xn', no
    duplicates, ASCII tokens match ^[a-z0-9-]+$, and the row counts are
    pinned against the reference snapshot (top_level_domain.py:122ff =
    1767 classifications; plot/tld_by_continent.py = 464 mappings incl.
    'aq'; tld_ccs = 128 IDN first-level rows)."""
    import re

    from cc_crawl_statistics_spark.dims_data import (
        _CONTINENT_GROUPS,
        _TLD_TYPE_GROUPS,
        tld_first_level_rows,
    )

    type_rows = tld_type_rows()
    toks = [t for t, _ in type_rows]
    assert len(type_rows) == 1767
    assert len(set(toks)) == len(toks), "duplicate TLD tokens"
    cont_all = [
        t for blob in _CONTINENT_GROUPS.values() for t in blob.split()
    ]
    assert len(cont_all) == 464
    assert len(set(cont_all)) == len(cont_all)
    fl = tld_first_level_rows()
    assert len(fl) == 128
    for tok in [*toks, *cont_all, *(t for t, _ in fl)]:
        assert tok not in ("xn--", "xn"), f"sheared token: {tok!r}"
        if tok.isascii():
            assert re.fullmatch(r"[a-z0-9-]+", tok), tok
        if tok.startswith("xn--"):
            assert len(tok) > 4, tok
    # the IDN ccTLD set matches the reference count (102 xn-- ccTLDs +
    # unicode forms); spot-pin entries the corrupted table lost
    types = dict(type_rows)
    for lost in ("xn--4dbrk0ce", "xn--lgbbat1ad8j", "xn--clchc0ea0b2g2a9gcd",
                 "xn--fpcrj9c3d", "xn--80ao21a"):
        assert types[lost] == "IDN ccTLD", lost


def test_idn_first_level_rollup():
    """TopLevelDomain.first_level semantics (top_level_domain.py:24-42):
    both forms of an IDN ccTLD roll up to the ASCII country code."""
    from cc_crawl_statistics_spark.dims_data import tld_first_level_rows

    fl = dict(tld_first_level_rows())
    assert fl["xn--p1ai"] == "ru"
    assert fl["рф"] == "ru"
    assert fl["xn--fiqs8s"] == "cn"
    assert fl["中国"] == "cn"
    assert fl["xn--wgbh1c"] == "eg"


def test_idn_continent_inheritance():
    """tld_by_continent.py:122-124: each IDN ccTLD inherits its country's
    continent — xn--p1ai (ru) -> Europe, xn--fiqs8s (cn) -> Asia."""
    conts = dict(tld_continent_rows())
    assert conts["xn--p1ai"] == "Europe"
    assert conts["xn--fiqs8s"] == "Asia"
    assert conts["xn--lgbbat1ad8j"] == "Africa"  # dz


def test_idn_split_host_end_to_end(spark):
    """IDN hosts through the full PSL splitter — the exact path the
    round-2 corrupted table broke (missing 1-label suffix rules made
    domain/tld splits wrong for ~26 IDN TLDs)."""
    got = _split(
        spark,
        ["www.site1.xn--p1ai", "shop.пример.рф", "a.b.xn--4dbrk0ce"],
    )
    assert got["www.site1.xn--p1ai"] == ("site1.xn--p1ai", "xn--p1ai")
    assert got["shop.пример.рф"] == ("пример.рф", "рф")
    assert got["a.b.xn--4dbrk0ce"] == ("b.xn--4dbrk0ce", "xn--4dbrk0ce")


def test_tld_dim_full_coverage(spark):
    types = dict(tld_type_rows())
    assert len(types) > 1700
    assert types["com"] == "gTLD"
    assert types["de"] == "ccTLD"
    assert types["edu"] == "sTLD"
    assert types["arpa"] == "ARPA"
    assert types["name"] == "grTLD"
    conts = dict(tld_continent_rows())
    assert len(conts) > 400
    assert conts["de"] == "Europe"
    assert conts["jp"] == "Asia"
    assert conts["br"] == "South America"
    assert conts["tokyo"] == "Asia"      # geographic gTLD
    assert conts["com"] == "com,net"
    assert "aq" not in conts             # Antarctica excluded at lookup
    dim = tld_dim(spark)
    assert dim.count() == len(tld_type_rows())
