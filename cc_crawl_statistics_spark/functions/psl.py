"""Public-suffix split (tldextract equivalent — reference behavior at
/root/reference/crawlstats.py:501-528) as a broadcast-join DataFrame
transform.

Rule data: every IANA-registered TLD (dims_data.py, 1769 entries) is a
1-label public suffix, plus a vendored snapshot of multi-label rules from
the Public Suffix List (https://publicsuffix.org/list/ — public facts;
production regenerates this module from a fresh PSL download). The
snapshot covers the high-traffic ccTLD registries with 2- and 3-label
suffixes, the PSL wildcard rules under .jp city domains and .ck, and
their exception rules.

Matching algorithm (PSL spec): the prevailing rule is the one with the
most labels; an exception rule (!foo) beats everything and yields its own
suffix minus the first label. Outputs mirror tldextract via
crawlstats.py:509-521:

  - host is None            -> domain '(invalid)', tld NULL
  - host is an IPv4 literal -> domain = host, tld '(ip address)'
  - no suffix rule matches  -> domain = last label, tld ''
  - otherwise               -> tld = matched suffix,
                               domain = registrable domain (one label +
                               suffix; '.suffix' when host == suffix,
                               matching ''.join semantics at :521)

Scale: the rule tables are a few thousand rows — each lookup is a
broadcast hash join against a candidate-suffix column, all inside
whole-stage codegen. No UDF, no giant IN-list in the codegen'd predicate
(1769-branch isin() chains blow up the generated method size; the
broadcast join keeps codegen small and the rule data updatable without
replanning)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dims_data import tld_type_rows

IP_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"  # reference-lax (crawlstats.py:487)

# --- vendored multi-label PSL snapshot (publicsuffix.org facts) ------------

_JP_PREFECTURES = (
    "aichi akita aomori chiba ehime fukui fukuoka fukushima gifu gunma "
    "hiroshima hokkaido hyogo ibaraki ishikawa iwate kagawa kagoshima "
    "kanagawa kochi kumamoto kyoto mie miyagi miyazaki nagano nagasaki "
    "nara niigata oita okayama okinawa osaka saga saitama shiga shimane "
    "shizuoka tochigi tokushima tokyo tottori toyama wakayama yamagata "
    "yamaguchi yamanashi"
)

_TWO_LABEL = {
    "uk": "ac co gov judiciary ltd me net nhs org plc police sch",
    "au": "com net org edu gov asn id act nsw nt qld sa tas vic wa",
    "jp": "ac ad co ed go gr lg ne or " + _JP_PREFECTURES,
    "br": "com net org gov edu mil art blog eco emp far imb ind inf jus "
          "leg mp nom",
    "cn": "com net org gov edu ac mil",
    "in": "co net org firm gen ind nic ac edu res gov mil",
    "nz": "ac co geek gen govt health iwi kiwi maori mil net org "
          "parliament school",
    "za": "ac co edu gov law mil net nom org school web",
    "kr": "ac co es go hs kg mil ms ne or pe re sc seoul busan",
    "tw": "com net org edu gov idv game club",
    "mx": "com net org edu gob",
    "ar": "com net org edu gob gov int mil musica tur",
    "tr": "com net org edu gov mil av bbs dr gen info k12 name tel web",
    "il": "co net org ac gov idf k12 muni",
    "id": "co net or ac go mil sch web biz my desa ponpes",
    "th": "co net or ac go in mi",
    "ua": "com net org edu gov in",
    "pl": "com net org edu gov info waw wroc krakow poznan lodz gda",
    "sg": "com net org edu gov per",
    "hk": "com net org edu gov idv",
    "my": "com net org edu gov mil name",
    "vn": "com net org edu gov int ac biz info name pro health",
    "ke": "co or ne go ac sc me mobi info",
    "ng": "com net org edu gov name sch mil mobi",
    "eg": "com net org edu gov mil name sci eun",
    "sa": "com net org edu gov med pub sch",
    "es": "com nom org gob edu",
    "it": "gov edu",
    "fr": "asso com gouv nom prd tm avocat",
    "ru": "com net org msk spb",
}

# 3-label exact rules: Australian state education/government registries
_THREE_LABEL = [
    f"{state}.{sub}.au"
    for sub in ("edu", "gov")
    for state in ("act", "nsw", "nt", "qld", "sa", "tas", "vic", "wa")
]

# wildcard rules *.P : any single label under P forms a public suffix
_WILDCARD_PARENTS = [
    f"{city}.jp"
    for city in (
        "kawasaki kitakyushu kobe nagoya sapporo sendai yokohama".split()
    )
] + ["ck"]

# exception rules !E : E is NOT a suffix despite a wildcard covering it;
# the prevailing suffix is E minus its first label
_EXCEPTIONS = [
    f"city.{city}.jp"
    for city in (
        "kawasaki kitakyushu kobe nagoya sapporo sendai yokohama".split()
    )
] + ["www.ck"]


def public_suffix_rules() -> dict[str, list[str]]:
    """All vendored rules grouped by kind (for tests and regeneration)."""
    one = [tld for tld, _ in tld_type_rows()]
    two = [
        f"{label}.{cc}"
        for cc, labels in _TWO_LABEL.items()
        for label in labels.split()
    ]
    return {
        "exact1": one,
        "exact2": two,
        "exact3": list(_THREE_LABEL),
        "wildcard": list(_WILDCARD_PARENTS),
        "exception": list(_EXCEPTIONS),
    }


def _dim(spark: SparkSession, names: list[str], col: str) -> DataFrame:
    return spark.createDataFrame([(n,) for n in sorted(set(names))], f"{col} string")


def split_host(
    df: DataFrame, host_col: str = "host", spark: SparkSession | None = None
) -> DataFrame:
    """Append ``domain`` and ``tld`` columns derived from ``host_col`` by
    longest-match public-suffix split. Plan: six broadcast hash joins (one
    per rule table × candidate depth), then a single CASE picking the
    prevailing rule per the PSL spec."""
    spark = spark or df.sparkSession
    rules = public_suffix_rules()

    host = F.col(host_col)
    parts = F.split(host, r"\.")
    n = F.size(parts)

    def tail(k: int):
        return F.concat_ws(".", F.slice(parts, n - k + 1, k))

    with_cands = df.withColumns(
        {
            "_s1": tail(1),
            "_s2": F.when(n >= 2, tail(2)),
            "_s3": F.when(n >= 3, tail(3)),
        }
    )

    joins = [
        ("exact1", "_s1", "_m_e1"),
        ("exact2", "_s2", "_m_e2"),
        ("exact3", "_s3", "_m_e3"),
        ("wildcard", "_s1", "_m_w1"),  # *.ck — parent is 1 label
        ("wildcard", "_s2", "_m_w2"),  # *.city.jp — parent is 2 labels
        ("exception", "_s2", "_m_x2"),  # !www.ck
        ("exception", "_s3", "_m_x3"),  # !city.<city>.jp
    ]
    out = with_cands
    for kind, cand, flag in joins:
        dim = _dim(spark, rules[kind], "_r").withColumn(flag, F.lit(True))
        out = out.join(
            F.broadcast(dim), out[cand] == dim["_r"], "left"
        ).drop("_r")

    def m(flag):
        return F.coalesce(F.col(flag), F.lit(False))

    # prevailing rule label count (exceptions first, then longest):
    #   exception E (k labels)       -> suffix = k-1 labels
    #   wildcard *.P (P = k labels)  -> suffix = k+1 labels (needs n > k)
    #   exact suffix (k labels)      -> suffix = k labels
    suffix_labels = (
        F.when(m("_m_x3"), 2)
        .when(m("_m_x2"), 1)
        .when(m("_m_w2") & (n >= 3), 3)
        .when(m("_m_e3"), 3)
        .when(m("_m_w1") & (n >= 2), 2)
        .when(m("_m_e2"), 2)
        .when(m("_m_e1"), 1)
        .otherwise(0)
    )
    is_ip = host.rlike(IP_RE)
    sl = F.col("_suffix_labels")
    suffix = F.concat_ws(".", F.slice(parts, n - sl + 1, sl))
    registrable = F.when(
        n > sl, F.concat_ws(".", F.slice(parts, n - sl, sl + 1))
    ).otherwise(F.concat(F.lit("."), suffix))

    out = out.withColumn("_suffix_labels", suffix_labels)
    out = out.withColumn(
        "tld",
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(is_ip, F.lit("(ip address)"))
        .when(sl == 0, F.lit(""))
        .otherwise(suffix),
    ).withColumn(
        "domain",
        F.when(host.isNull(), F.lit("(invalid)"))
        .when(is_ip, host)
        .when(sl == 0, tail(1))
        .otherwise(registrable),
    )
    return out.drop(
        "_s1", "_s2", "_s3", "_suffix_labels",
        "_m_e1", "_m_e2", "_m_e3", "_m_w1", "_m_w2", "_m_x2", "_m_x3",
    )
