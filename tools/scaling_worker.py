"""Worker for the two-cluster-size scaling evidence: runs the identical
workload on local[N] against a pre-materialized pages parquet and prints one
JSON line of per-phase seconds (min over REPS repetitions).

Invoked by tools/scaling_evidence.py under taskset, e.g.
    taskset -c 0-7 env SPARK_GRAFT_CPUS=8 PAGES_DIR=... python tools/scaling_worker.py
so the N-core level genuinely has N CPUs (JVM GC/IO threads included) —
the sandbox stand-in for an N-executor vs 4N-executor cluster.

Besides the crawl-statistics phases it times
  - one steady-state frontier scheduling round (the north-rule metric,
    URLs scheduled/sec), and
  - a pure-compute calibration job (embarrassingly parallel arithmetic over
    spark.range, no shuffle, no I/O) that measures the *platform's* scaling
    ceiling at this core count — on this sandbox VM the 32 vCPUs are backed
    by fewer physical cores' worth of high-IPC capacity, so even perfectly
    parallel codegen loops stop scaling past ~8-16 cores; the calibration
    lets the harness report workload efficiency normalized by what the
    hardware can actually deliver.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
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

CALIBRATION_ROWS = 2_000_000_000


def calibration(spark) -> float:
    """Pure-compute, shuffle-free, allocation-light job: the upper bound of
    what N cores can do on this host. Modular-arithmetic chain keeps values
    in registers (no strings, no GC pressure)."""
    df = spark.range(CALIBRATION_ROWS, numPartitions=max(CPUS * 8, 64))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        df.selectExpr(
            "sum(((id % 100000) * 26543 % 97) * ((id % 9999991) * 31 % 89)"
            " + shiftright(id, 7)) s"
        ).collect()
        best = min(best, time.time() - t0)
    return best


def frontier_round(spark, pages) -> tuple[float, int]:
    """Seed + round 1 untimed (store bootstrap), round 2 timed — the
    steady-state scheduling round of the north-rule metric."""
    from cc_crawl_statistics_spark.frontier import scheduler
    from cc_crawl_statistics_spark.frontier.state import SnapshotStore

    root = tempfile.mkdtemp(prefix=f"scal_frontier_{CPUS}_")
    store = SnapshotStore(root)
    try:
        scheduler.run_round(
            spark, store, PAGES_DIR, n_partitions=CPUS, pages=pages
        )
        t0 = time.time()
        metrics = scheduler.run_round(
            spark, store, PAGES_DIR, n_partitions=CPUS, pages=pages
        )
        dt = time.time() - t0
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return dt, metrics["n_scheduled"]


def main() -> None:
    spark = get_spark(
        app_name=f"scaling-{CPUS}",
        cores=CPUS,
        # identical plan at every level: fixed partition counts (not
        # core-derived) and no adaptive coalescing, so the ONLY variable
        # across levels is the number of cores executing the same tasks
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # split the scan finely enough that both levels parallelize fully
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
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

    t_frontier, n_sched = frontier_round(spark, pages)
    calib = calibration(spark)

    total = sum(phases.values())
    print(
        json.dumps(
            {
                "cpus": CPUS,
                "rows": n_rows,
                "phases": {k: round(v, 2) for k, v in phases.items()},
                "total_sec": round(total, 2),
                "rows_per_sec": round(n_rows * len(phases) / total),
                "frontier_round_sec": round(t_frontier, 2),
                "frontier_urls_scheduled": n_sched,
                "frontier_urls_per_sec": round(n_sched / t_frontier),
                "calibration_sec": round(calib, 2),
                "calibration_rows_per_sec": round(CALIBRATION_ROWS / calib),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
