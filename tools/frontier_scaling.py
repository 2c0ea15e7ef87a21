"""Frontier-round scaling evidence at a factor where round compute dominates
the fixed per-round orchestration cost (driver-side job scheduling,
broadcast builds, manifest commits — constant across levels; at 29M rows it
is ~14s/round and caps apparent scaling, Amdahl fit t(n) ≈ 14 + 71/n s).

Methodology: generate the scaled pages universe ONCE, seed + bootstrap the
snapshot store ONCE at full parallelism (untimed setup), then for each
pinned CPU level copy the bootstrapped store and time steady-state rounds —
every level starts from the IDENTICAL committed snapshot and the identical
plan (fixed 64 shuffle partitions, adaptive coalescing off); the only
variable is cores. Appends to BENCH.md.

Usage: python tools/frontier_scaling.py [factor] [levels-csv]
  e.g.  python tools/frontier_scaling.py 64000 2,8,32
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


def _pins(cpus: int) -> str:
    """CPU list for taskset at any level (first ``cpus`` cores)."""
    return f"0-{cpus - 1}" if cpus > 1 else "0"


def worker() -> None:
    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    pages_dir = os.environ["PAGES_DIR"]
    store_dir = os.environ["STORE_DIR"]
    rounds = int(os.environ.get("ROUNDS", "2"))

    from cc_crawl_statistics_spark.frontier import scheduler
    from cc_crawl_statistics_spark.frontier.state import SnapshotStore
    from cc_crawl_statistics_spark.session import get_spark

    spark = get_spark(
        app_name=f"frontier-scaling-{cpus}",
        cores=cpus,
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"
            ),
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.local.dir": os.environ.get("SPARK_LOCAL_DIR", "/tmp"),
            "spark.network.timeout": "600s",
            "spark.rpc.askTimeout": "600s",
        },
    )
    pages = spark.read.parquet(pages_dir)
    store = SnapshotStore(store_dir)
    best, n_sched = float("inf"), 0
    want_timings = bool(os.environ.get("SPARK_GRAFT_TIMINGS"))
    all_timings = []
    for _ in range(rounds):
        timings: dict | None = {} if want_timings else None
        t0 = time.time()
        m = scheduler.run_round(
            spark, store, SF_DIR, n_partitions=cpus, pages=pages,
            timings=timings,
        )
        wall = time.time() - t0
        best = min(best, wall)
        n_sched = m["n_scheduled"]
        if want_timings:
            timings["round_wall"] = round(wall, 2)
            all_timings.append(timings)
    out = {
        "cpus": cpus,
        "round_sec": round(best, 2),
        "urls_scheduled": n_sched,
        "urls_per_sec": round(n_sched / best),
    }
    if want_timings:
        out["timings"] = all_timings
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    level_list = (
        [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [2, 8, 32]
    )
    # SPARK_GRAFT_SETUP_DIR: persistent setup (pages + bootstrapped store)
    # reused across invocations, so conf/levels experiments pay the
    # many-minute materialization once instead of per run.
    keep = os.environ.get("SPARK_GRAFT_SETUP_DIR")
    tmp = keep or tempfile.mkdtemp(prefix="fscale_")
    if keep:
        os.makedirs(tmp, exist_ok=True)
    try:
        from bench import materialize_scaled_pages
        from cc_crawl_statistics_spark.frontier import scheduler
        from cc_crawl_statistics_spark.frontier.state import SnapshotStore
        from cc_crawl_statistics_spark.session import get_spark

        spark = get_spark(
            app_name="fscale-setup",
            cores=32,
            shuffle_partitions=64,
            extra_conf={
                "spark.ui.showConsoleProgress": "false",
                # large-factor bootstraps can hit multi-minute full-GC
                # pauses; don't let an RPC ask timeout kill the run
                "spark.network.timeout": "600s",
                "spark.rpc.askTimeout": "600s",
                # factor-64000 seed shuffles spill >80G — spread scratch
                # across disk AND tmpfs so neither fills alone
                "spark.local.dir": "/tmp/fscale-scratch,/dev/shm/fscale-scratch",
            },
        )
        pages_dir = os.path.join(tmp, "pages")
        base_store = os.path.join(tmp, "store_base")
        if keep and os.path.exists(
            os.path.join(base_store, "round=0001", "_MANIFEST.json")
        ):
            pages = spark.read.parquet(pages_dir)
            n_rows = pages.count()
        else:
            materialize_scaled_pages(spark, SF_DIR, factor, pages_dir, 32)
            pages = spark.read.parquet(pages_dir)
            n_rows = pages.count()
            # seed (round 0) + round 1: untimed bootstrap at full parallelism
            scheduler.run_round(
                spark,
                SnapshotStore(base_store),
                SF_DIR,
                n_partitions=32,
                pages=pages,
            )
        spark.stop()

        levels: dict[int, dict] = {}
        for cpus in level_list:
            store_dir = os.path.join(tmp, f"store_{cpus}")
            # a killed prior run can leave a stale per-level copy behind
            shutil.rmtree(store_dir, ignore_errors=True)
            shutil.copytree(base_store, store_dir)
            env = dict(
                os.environ,
                SPARK_GRAFT_CPUS=str(cpus),
                PAGES_DIR=pages_dir,
                STORE_DIR=store_dir,
                SPARK_LOCAL_DIR="/dev/shm/spark-fscale",
            )
            cmd = [
                "python",
                os.path.join(REPO, "tools", "frontier_scaling.py"),
                "worker",
            ]
            pinned = bool(shutil.which("taskset"))
            if pinned:
                cmd = ["taskset", "-c", _pins(cpus)] + cmd
            out = subprocess.run(
                cmd, env=env, capture_output=True, text=True, check=True
            )
            levels[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
            levels[cpus]["pinned"] = pinned
            print(json.dumps(levels[cpus]))
            shutil.rmtree(store_dir, ignore_errors=True)

        result = {"factor": factor, "rows": n_rows, "levels": levels}
        spans = []
        for lo, hi in ((2, 8), (8, 32)):
            if lo in levels and hi in levels:
                sp = levels[hi]["urls_per_sec"] / levels[lo]["urls_per_sec"]
                spans.append((lo, hi, sp))
                result[f"frontier_{lo}_to_{hi}"] = {
                    "speedup": round(sp, 2),
                    "efficiency": round(sp / 4, 3),
                }
        print(json.dumps(result, indent=2))
        rows_md = "\n".join(
            f"| local[{c}]"
            + (f" (taskset {_pins(c)})" if levels[c]["pinned"] else "")
            + f" | {levels[c]['round_sec']} | "
            f"{levels[c]['urls_scheduled']:,} | {levels[c]['urls_per_sec']:,} |"
            for c in level_list
        )
        span_md = "; ".join(
            f"{lo}→{hi}: **{sp:.2f}×** (efficiency **{sp / 4:.3f}**)"
            for lo, hi, sp in spans
        )
        if os.environ.get("SPARK_GRAFT_NO_BENCHMD"):
            return
        with open(os.path.join(REPO, "BENCH.md"), "a") as f:
            f.write(
                f"\n## Frontier scheduling-round scaling — factor {factor} "
                f"({n_rows:,} pages rows), shared bootstrap snapshot, "
                f"pinned levels\n\n"
                f"| level | steady-state round sec | URLs scheduled | URLs/sec |\n"
                f"|---|---|---|---|\n{rows_md}\n\n"
                f"Frontier throughput scaling {span_md}.\n"
            )
    finally:
        if not keep:
            shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree("/dev/shm/spark-fscale", ignore_errors=True)
        shutil.rmtree("/dev/shm/fscale-scratch", ignore_errors=True)
        shutil.rmtree("/tmp/fscale-scratch", ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker()
    else:
        main()
