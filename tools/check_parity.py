"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given sf dir, compares row count, column names, and an
order-insensitive value hash. Usage:

    python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from cc_crawl_statistics_spark.session import get_spark  # noqa: E402
from cc_crawl_statistics_spark.sources.tables import TABLES  # noqa: E402

import __spark_entry__ as E  # noqa: E402


def value_hash(df) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    rows = sorted("|".join(r) for r in df.itertuples(index=False, name=None))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, oracles = E.queries(), E.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:24s} rows={len(sdf):6d}  (rows-only, no oracle) "
                  f"[{t_spark:.1f}s]")
            if len(sdf) == 0:
                n_fail += 1
                print(f"FAIL {name}: 0 rows")
            continue
        ddf = con.execute(oracles[name]).fetchdf()
        ok_rows = len(sdf) == len(ddf)
        ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
        ok_vals = ok_rows and ok_cols and value_hash(sdf) == value_hash(ddf)
        status = "OK  " if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            n_fail += 1
        print(
            f"{status} {name:24s} rows={len(sdf):6d}/{len(ddf):6d} "
            f"cols={'=' if ok_cols else 'DIFF'} vals={'=' if ok_vals else 'DIFF'} "
            f"[{t_spark:.1f}s]"
        )
        if not ok_cols:
            print(f"     spark cols: {sorted(sdf.columns)}")
            print(f"     duck  cols: {sorted(ddf.columns)}")
        if ok_rows and ok_cols and not ok_vals:
            import pandas as pd

            m = sdf.merge(ddf, how="outer", indicator=True)
            diff = m[m["_merge"] != "both"]
            with pd.option_context("display.width", 200):
                print(diff.head(10))
    spark.stop()
    print("ALL OK" if n_fail == 0 else f"{n_fail} FAILURES")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
