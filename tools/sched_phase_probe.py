"""Decompose the scheduling round's sched phase at two CPU levels.

The factor-16000 ladder showed the commit writes scaling ~3.7-3.8x from
2->8 cores while sched_ckpt scales only ~2.2x. This probe splits the sched
plan into cumulative prefixes and times each as a noop write at pinned CPU
levels, attributing the non-scaling component:

  t0_frontier   raw reconstruction scan (base + deltas - retired)
  t1_topk       + politeness gate + salted two-phase top-K
  t2_universe   raw universe scan (sched-needed columns only)
  t3_sched      full sched plan (topk broadcast + universe join)
  t4_ckpt       t3 materialized via localCheckpoint (the real phase)

Usage: python tools/sched_phase_probe.py [factor] [levels-csv]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def worker() -> None:
    from pyspark.sql import functions as F

    from cc_crawl_statistics_spark.frontier import scheduler
    from cc_crawl_statistics_spark.frontier.state import SnapshotStore
    from cc_crawl_statistics_spark.session import get_spark

    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    store_dir = os.environ["STORE_DIR"]
    reps = int(os.environ.get("REPS", "2"))
    spark = get_spark(
        app_name=f"sched-probe-{cpus}",
        cores=cpus,
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.local.dir": os.environ.get("SPARK_LOCAL_DIR", "/tmp"),
        },
    )
    store = SnapshotStore(store_dir)
    latest = store.latest_round()
    frontier = store.read_frontier(spark, latest)
    ledger = store.read(spark, 0, "host_ledger")
    universe = store.read(spark, 0, "universe")

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    pending = frontier.filter(F.col("state") == "pending")
    eligible = pending.join(F.broadcast(ledger), "host").filter(
        F.col("robots_status") != 403
    )
    topk = scheduler.host_bucketed_topk(eligible)
    uni_cols = universe.select("url", "doc_id", *scheduler.ATTR_COLS)
    sched = uni_cols.join(F.broadcast(topk), "url")

    phases = {
        "t0_frontier": lambda: noop(pending),
        "t1_topk": lambda: noop(topk),
        "t2_universe": lambda: noop(uni_cols),
        "t3_sched": lambda: noop(sched),
        "t4_ckpt": lambda: sched.localCheckpoint(eager=True),
    }
    out: dict = {"cpus": cpus}
    for name, fn in phases.items():
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        out[name] = round(best, 2)
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    levels = (
        [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [2, 8]
    )
    tmp = tempfile.mkdtemp(prefix="sprobe_")
    try:
        from bench import materialize_scaled_pages
        from cc_crawl_statistics_spark.frontier import scheduler
        from cc_crawl_statistics_spark.frontier.state import SnapshotStore
        from cc_crawl_statistics_spark.session import get_spark

        spark = get_spark(
            app_name="sprobe-setup",
            cores=32,
            shuffle_partitions=64,
            extra_conf={
                "spark.ui.showConsoleProgress": "false",
                "spark.network.timeout": "600s",
                "spark.rpc.askTimeout": "600s",
                "spark.local.dir": "/tmp/sprobe-scratch,/dev/shm/sprobe-scratch",
            },
        )
        pages_dir = os.path.join(tmp, "pages")
        materialize_scaled_pages(spark, SF_DIR, factor, pages_dir, 32)
        pages = spark.read.parquet(pages_dir)
        base_store = os.path.join(tmp, "store")
        st = SnapshotStore(base_store)
        scheduler.run_round(spark, st, SF_DIR, n_partitions=32, pages=pages)
        scheduler.run_round(spark, st, SF_DIR, n_partitions=32, pages=pages)
        spark.stop()

        results = {}
        for cpus in levels:
            env = dict(
                os.environ,
                SPARK_GRAFT_CPUS=str(cpus),
                STORE_DIR=base_store,
                SPARK_LOCAL_DIR="/dev/shm/spark-sprobe",
            )
            cmd = [
                "python",
                os.path.join(REPO, "tools", "sched_phase_probe.py"),
                "worker",
            ]
            if shutil.which("taskset"):
                pins = f"0-{cpus - 1}" if cpus > 1 else "0"
                cmd = ["taskset", "-c", pins] + cmd
            out = subprocess.run(
                cmd, env=env, capture_output=True, text=True, check=True
            )
            results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
            print(json.dumps(results[cpus]))
        if len(levels) == 2:
            lo, hi = levels
            for k in results[lo]:
                if k == "cpus":
                    continue
                sp = results[lo][k] / max(results[hi][k], 1e-9)
                print(f"{k}: {results[lo][k]} -> {results[hi][k]}  {sp:.2f}x")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree("/dev/shm/spark-sprobe", ignore_errors=True)
        shutil.rmtree("/tmp/sprobe-scratch", ignore_errors=True)
        shutil.rmtree("/dev/shm/sprobe-scratch", ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker()
    else:
        main()
