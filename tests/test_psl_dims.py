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
