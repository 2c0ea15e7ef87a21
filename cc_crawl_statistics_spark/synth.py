"""Deterministic Common-Crawl-style ``pages`` derivation.

The driver's testdata (TESTDATA.md) has no crawl/pages fact table, so the
engine synthesizes one *deterministically and SQL-expressibly* from the
``documents`` table (FIXTURES.md §1).  The derivation below is written in a
dialect-neutral SQL fragment that parses and evaluates identically in
Spark SQL and DuckDB — this is what lets every crawl-statistics query have
an exact DuckDB oracle (driver contract, __spark_entry__.py).

Shape mirrors the fields the reference consumes from CDX metadata
(/root/reference/crawlstats.py:549-595): url, status, mime, mime_detected,
charset, languages, digest, warc_filename — plus the derived url parts
(scheme, host, domain, tld, surt_domain) the reference computes at
crawlstats.py:487-528.

Fetch multiplicity (repeat fetches of a URL within a crawl) and cross-crawl
URL overlap are injected via UNION ALL branches, driving the reference's
pages-vs-unique-urls twin counts (crawlstats.py:585-595), the
fetches-per-URL histogram (crawlstats.py:817-820), and the crawl-set /
new-items semantics (crawlstats.py:841-863).

Dialect-neutrality rules used here (verified end-to-end by every
oracle-compared query in tools/check_parity.py / tests/test_oracle_parity.py,
which evaluate this SQL in both engines):
  - only ``||`` concat, CASE WHEN, %, CAST(x AS STRING), comparison ops
  - no timestamps (fetch time is an epoch-seconds BIGINT)
  - no floats
  - integer literals only, all non-negative (both dialects agree on %)
"""

from __future__ import annotations

# One fetch row per output record.  Keys:
#   3 crawls (slots 0,1,2) -> CC-MAIN-2024-{10,14,18}
#   40 hosts over 12 registrable domains x 5 TLDs, 3 subdomain patterns
#   ~20% repeat fetches (same url, same crawl)  -> pages > urls
#   25% of urls re-fetched in the following crawl -> overlap / new-items
#   4% robots.txt records -> routed out of page stats
#   non-200 statuses -> only http_status histogram
_PAGES_TEMPLATE = """
WITH u AS (
  SELECT
    doc_id,
    lang,
    doc_id % 3 AS crawl_slot,
    CASE WHEN (doc_id % {hp}) % 5 = 0 THEN 'com'
         WHEN (doc_id % {hp}) % 5 = 1 THEN 'org'
         WHEN (doc_id % {hp}) % 5 = 2 THEN 'net'
         WHEN (doc_id % {hp}) % 5 = 3 THEN 'de'
         ELSE 'jp' END AS tld,
    (doc_id % {hp}) % {sp} AS site_id,
    CASE WHEN doc_id % {hp3} < {hp} THEN 'www.'
         WHEN doc_id % {hp3} < {hp2} THEN ''
         ELSE 'cdn.' END AS sub,
    CASE WHEN doc_id % 10 < 8 THEN 'https' ELSE 'http' END AS scheme,
    '/page/' || CAST(doc_id AS STRING) || '.html' AS path
  FROM documents
),
f AS (
  SELECT *, crawl_slot AS slot, 0 AS dup_seq FROM u
  UNION ALL
  SELECT *, crawl_slot AS slot, 1 AS dup_seq FROM u WHERE doc_id % 5 = 0
  UNION ALL
  SELECT *, (crawl_slot + 1) % 3 AS slot, 0 AS dup_seq
  FROM u WHERE doc_id % 4 = 0
)
SELECT
  scheme || '://' || sub || 'site' || CAST(site_id AS STRING) || '.' || tld
    || path AS url,
  scheme,
  sub || 'site' || CAST(site_id AS STRING) || '.' || tld AS host,
  'site' || CAST(site_id AS STRING) || '.' || tld AS domain,
  tld,
  tld || ',site' || CAST(site_id AS STRING) AS surt_domain,
  tld || ',site' || CAST(site_id AS STRING) || ')' || path AS surt_key,
  'CC-MAIN-2024-' || CAST(10 + slot * 4 AS STRING) AS crawl,
  slot AS crawl_id,
  CASE WHEN doc_id % 20 = 16 THEN 301
       WHEN doc_id % 20 = 17 THEN 404
       WHEN doc_id % 20 = 18 THEN 503
       ELSE 200 END AS status,
  CASE WHEN doc_id % 8 = 4 THEN 'text/html; charset=UTF-8'
       WHEN doc_id % 8 = 5 THEN 'Text/HTML'
       WHEN doc_id % 8 = 6 THEN '"application/pdf"'
       WHEN doc_id % 8 = 7 THEN 'application/json'
       ELSE 'text/html' END AS mime,
  CASE WHEN doc_id % 8 = 6 THEN 'application/pdf'
       WHEN doc_id % 8 = 7 THEN 'application/json'
       ELSE 'text/html' END AS mime_detected,
  CASE WHEN doc_id % 6 = 5 THEN CAST(NULL AS STRING)
       WHEN doc_id % 2 = 0 THEN 'UTF-8'
       ELSE 'ISO-8859-1' END AS charset,
  CASE WHEN doc_id % 11 = 0 THEN lang || ',en' ELSE lang END AS languages,
  'sha1:' || CAST(doc_id % 180 AS STRING) AS digest,
  CASE WHEN doc_id % 25 = 0
       THEN 'crawl-data/CC-MAIN-2024-' || CAST(10 + slot * 4 AS STRING)
            || '/segments/robotstxt/part-' || CAST(doc_id % 10 AS STRING)
            || '.warc.gz'
       ELSE 'crawl-data/CC-MAIN-2024-' || CAST(10 + slot * 4 AS STRING)
            || '/segments/warc/part-' || CAST(doc_id % 10 AS STRING)
            || '.warc.gz' END AS warc_filename,
  1709251200 + slot * 2419200 + doc_id * 60 + dup_seq AS fetch_ts,
  doc_id
FROM f
"""


def pages_sql(host_pool: int = 40, site_pool: int = 12) -> str:
    """Render the derivation for a given host/site cardinality. The default
    (40 hosts / 12 sites) is the oracle-compared fixture shape; the bench
    path uses much larger pools so per-host politeness budgets don't cap the
    schedulable volume unrealistically."""
    return _PAGES_TEMPLATE.format(
        hp=host_pool, sp=site_pool, hp2=2 * host_pool, hp3=3 * host_pool
    )


# the oracle-compared fixture derivation (fixed shape, shared with DuckDB)
PAGES_SQL = pages_sql()


def scaled_documents_sql(factor: int, documents_rel: str = "documents") -> str:
    """Deterministically widen the document universe by ``factor`` for
    benchmarking: each source row becomes ``factor`` rows with distinct
    doc_ids (doc_id*factor + i), so the derived pages table and the frontier
    universe grow linearly while staying fully reproducible (no random
    state, no external data). Spark-only (bench path, not oracle-compared).
    """
    return f"""
SELECT d.doc_id * {factor} + r.i AS doc_id,
       d.lang, d.source, d.n_chars,
       d.text AS text
FROM {documents_rel} d
LATERAL VIEW explode(sequence(0, {factor - 1})) r AS i
"""


# Deduplication test corpus: documents + injected exact duplicates and
# near-duplicates (tail-padded copies). Dialect-neutral like PAGES_SQL so
# dedup/text queries get exact DuckDB oracles. Injected ids are offset far
# above the real id range.
CORPUS_SQL = """
SELECT doc_id, text, lang, source FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id, text, lang, source
FROM documents WHERE doc_id % 17 = 0
UNION ALL
SELECT doc_id + 2000000 AS doc_id,
       text || ' trailing filler words appended' AS text, lang, source
FROM documents WHERE doc_id % 13 = 0
"""

# Embedding corpus with injected duplicates: exact copies (cosine = 1) and
# direction-shifted copies (each component +0.25 → high-but-not-1 cosine).
# Components are cast to double BEFORE arithmetic in both engines.
EMB_CORPUS_SQL_SPARK = """
SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
FROM embeddings
UNION ALL
SELECT vec_id + 1000000 AS vec_id,
       transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
FROM embeddings WHERE vec_id % 11 = 0
UNION ALL
SELECT vec_id + 2000000 AS vec_id,
       transform(embedding, x -> CAST(x AS DOUBLE) + 0.25) AS embedding
FROM embeddings WHERE vec_id % 7 = 0
"""

EMB_CORPUS_SQL_DUCK = """
SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
UNION ALL
SELECT vec_id + 1000000 AS vec_id, embedding::DOUBLE[] AS embedding
FROM embeddings WHERE vec_id % 11 = 0
UNION ALL
SELECT vec_id + 2000000 AS vec_id,
       list_transform(embedding::DOUBLE[], x -> x + 0.25) AS embedding
FROM embeddings WHERE vec_id % 7 = 0
"""


def child_url_sql(c: str) -> str:
    """Dialect-neutral URL of doc ``c`` (an integer SQL expression) — the
    exact formula _PAGES_TEMPLATE's ``u`` CTE uses at the oracle fixture
    shape (host_pool=40, site_pool=12). Shared verbatim by the Spark plan
    (via ``F.expr``) and the DuckDB link-graph oracles, so the two engines
    derive child URLs from one source of truth while Spark additionally
    proves it can RE-PARSE those URLs out of the html bytes
    (operators/linkgraph.py)."""
    return (
        f"CASE WHEN ({c}) % 10 < 8 THEN 'https' ELSE 'http' END || '://' || "
        f"CASE WHEN ({c}) % 120 < 40 THEN 'www.' "
        f"     WHEN ({c}) % 120 < 80 THEN '' ELSE 'cdn.' END || "
        f"'site' || CAST((({c}) % 40) % 12 AS STRING) || '.' || "
        f"CASE WHEN (({c}) % 40) % 5 = 0 THEN 'com' "
        f"     WHEN (({c}) % 40) % 5 = 1 THEN 'org' "
        f"     WHEN (({c}) % 40) % 5 = 2 THEN 'net' "
        f"     WHEN (({c}) % 40) % 5 = 3 THEN 'de' ELSE 'jp' END || "
        f"'/page/' || CAST(({c}) AS STRING) || '.html'"
    )


def child_host_sql(c: str) -> str:
    """Host part of child_url_sql(c) — for host-graph oracles."""
    return (
        f"CASE WHEN ({c}) % 120 < 40 THEN 'www.' "
        f"     WHEN ({c}) % 120 < 80 THEN '' ELSE 'cdn.' END || "
        f"'site' || CAST((({c}) % 40) % 12 AS STRING) || '.' || "
        f"CASE WHEN (({c}) % 40) % 5 = 0 THEN 'com' "
        f"     WHEN (({c}) % 40) % 5 = 1 THEN 'org' "
        f"     WHEN (({c}) % 40) % 5 = 2 THEN 'net' "
        f"     WHEN (({c}) % 40) % 5 = 3 THEN 'de' ELSE 'jp' END"
    )


# the three deterministic outlinks page d carries (functions/links.py
# embeds them as anchors; frontier/scheduler.expand_links uses children
# 1-2 as its discovery model): two absolute cross-host links and one
# root-relative same-host link
def rep_meta_robots_sql(d: str = "doc_id") -> str:
    """Dialect-neutral meta-robots directive content for doc ``d`` — the
    REP fixture's source of truth (functions/rep.py). Covers every
    directive class: plain noindex/nofollow, the combined list, the
    'none' alias, the no-op 'index, follow'/'all' lists, and tag-absent
    (NULL). Shared verbatim by cc_pages_rep_df (which embeds it into the
    html bytes) and the DuckDB oracles (which recompute it without ever
    seeing the html)."""
    return (
        f"CASE WHEN ({d}) % 7 = 0 THEN 'noindex' "
        f"WHEN ({d}) % 7 = 1 THEN 'nofollow' "
        f"WHEN ({d}) % 7 = 2 THEN 'noindex, nofollow' "
        f"WHEN ({d}) % 7 = 3 THEN 'none' "
        f"WHEN ({d}) % 7 = 4 THEN 'index, follow' "
        f"WHEN ({d}) % 7 = 5 THEN 'all' "
        f"ELSE CAST(NULL AS STRING) END"
    )


# oracle-side boolean reductions of rep_meta_robots_sql's seven classes
REP_NOINDEX_SQL = "(doc_id % 7 = 0 OR doc_id % 7 = 2 OR doc_id % 7 = 3)"
REP_NOFOLLOW_SQL = "(doc_id % 7 = 1 OR doc_id % 7 = 2 OR doc_id % 7 = 3)"


def rep_canonical_sql(d: str = "doc_id") -> str:
    """Dialect-neutral rel=canonical href for doc ``d``: docs come in
    groups of 4 consecutive ids whose canonical member is the group
    floor (id - id%4); every third doc omits the tag (NULL) so absence
    is exercised too. The href is the canonical member's own page URL
    (child_url_sql), so canonical-aware dedup groups resolve to real
    captures."""
    target = child_url_sql(f"({d}) - (({d}) % 4)")
    return (
        f"CASE WHEN ({d}) % 3 = 2 THEN CAST(NULL AS STRING) "
        f"ELSE {target} END"
    )


def rep_anchor_nofollow_sql(d: str, i: int) -> str:
    """Per-anchor rel=nofollow flag for anchor ``i`` of doc ``d`` (the
    fixture emits three anchors per page, same children as the linked
    flavor)."""
    return f"((({d}) + {i}) % 3 = 0)"


def messy_url_sql(d: str = "doc_id") -> str:
    """Dialect-neutral URL-alias generator for the normalization fixture:
    five deterministic alias classes over the page's own URL (case,
    fragment, default port, dot-segment, duplicate-slash + '.' segment),
    the rest passed through clean — every class is exactly recovered by
    functions/urlkit.normalize_url, which is what the url_normalize
    oracle checks."""
    path = f"'/page/' || CAST({d} AS STRING) || '.html'"
    return (
        f"CASE ({d}) % 13 "
        f"WHEN 0 THEN scheme || '://' || UPPER(host) || {path} "
        f"WHEN 1 THEN url || '#frag' "
        f"WHEN 2 THEN scheme || '://' || host || "
        f"CASE WHEN scheme = 'http' THEN ':80' ELSE ':443' END || {path} "
        f"WHEN 3 THEN scheme || '://' || host || '/x/..' || {path} "
        f"WHEN 4 THEN scheme || '://' || host || '//page/./' || "
        f"CAST({d} AS STRING) || '.html' "
        # class 5: a case-sensitive query carrying slash/dot decoys —
        # normalization must leave it byte-identical (query is opaque)
        f"WHEN 5 THEN url || '?next=//a/../b&T=AbC' "
        f"ELSE url END"
    )


def outlink_child_ids_sql(n_docs: int) -> tuple[str, str, str]:
    return (
        f"(doc_id * 2 + 1) % {n_docs}",
        f"(doc_id * 3 + 7) % {n_docs}",
        f"(doc_id * 5 + 3) % {n_docs}",
    )


def pages_view_sql(
    documents_rel: str = "documents",
    host_pool: int = 40,
    site_pool: int = 12,
) -> str:
    """Derivation SQL with the documents relation name substituted."""
    return pages_sql(host_pool, site_pool).replace(
        "FROM documents", f"FROM {documents_rel}"
    )


def oracle_cte(body_sql: str) -> str:
    """Wrap a query body in the shared pages CTE for the DuckDB oracle."""
    return f"WITH pages AS ({PAGES_SQL})\n{body_sql}"
