"""Worker for the two-cluster-size scaling evidence: runs the identical
workload on local[N] against a pre-materialized pages parquet and prints one
JSON line of per-phase seconds (min over REPS repetitions).

Invoked by tools/scaling_evidence.py under taskset, e.g.
    taskset -c 0-7 env SPARK_GRAFT_CPUS=8 PAGES_DIR=... python tools/scaling_worker.py
so the N-core level genuinely has N CPUs (JVM GC/IO threads included) —
the sandbox stand-in for an N-executor vs 4N-executor cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cc_crawl_statistics_spark.operators import counts as C  # noqa: E402
from cc_crawl_statistics_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PAGES_DIR = os.environ["PAGES_DIR"]
REPS = int(os.environ.get("REPS", "3"))

PHASES = {
    "crawl_size": C.crawl_size,
    "host_counts": C.host_counts,
    "url_fetch_histogram": C.url_fetch_histogram,
    "url_crawl_set": C.url_crawl_set,
    "mimetype": C.mimetype_counts,
}


def main() -> None:
    spark = get_spark(
        app_name=f"scaling-{CPUS}",
        cores=CPUS,
        shuffle_partitions=CPUS * 2,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # split the scan finely enough that both levels parallelize fully
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.local.dir": os.environ.get("SPARK_LOCAL_DIR", "/tmp"),
        },
    )
    pages = spark.read.parquet(PAGES_DIR)
    n_rows = pages.count()

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    force(C.crawl_size(pages))  # warm-up: JIT + parquet footers

    phases: dict[str, float] = {}
    for name, op in PHASES.items():
        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            force(op(pages))
            best = min(best, time.time() - t0)
        phases[name] = best

    total = sum(phases.values())
    print(
        json.dumps(
            {
                "cpus": CPUS,
                "rows": n_rows,
                "phases": {k: round(v, 2) for k, v in phases.items()},
                "total_sec": round(total, 2),
                "rows_per_sec": round(n_rows * len(phases) / total),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
