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

Dialect-neutrality rules used here (verified by tests/test_synth.py):
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
PAGES_SQL = """
WITH u AS (
  SELECT
    doc_id,
    lang,
    doc_id % 3 AS crawl_slot,
    CASE WHEN (doc_id % 40) % 5 = 0 THEN 'com'
         WHEN (doc_id % 40) % 5 = 1 THEN 'org'
         WHEN (doc_id % 40) % 5 = 2 THEN 'net'
         WHEN (doc_id % 40) % 5 = 3 THEN 'de'
         ELSE 'jp' END AS tld,
    (doc_id % 40) % 12 AS site_id,
    CASE WHEN doc_id % 120 < 40 THEN 'www.'
         WHEN doc_id % 120 < 80 THEN ''
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


def pages_view_sql(documents_rel: str = "documents") -> str:
    """PAGES_SQL with the documents relation name substituted."""
    return PAGES_SQL.replace("FROM documents", f"FROM {documents_rel}")


def oracle_cte(body_sql: str) -> str:
    """Wrap a query body in the shared pages CTE for the DuckDB oracle."""
    return f"WITH pages AS ({PAGES_SQL})\n{body_sql}"
