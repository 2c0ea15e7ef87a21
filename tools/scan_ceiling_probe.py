"""Measure the platform's parallel-scan ceiling at pinned CPU levels.

The frontier round is scan-dominated (BENCH.md sched-phase decomposition),
so its attainable N→4N speedup is capped by how well a bare parquet scan
of the SAME tables scales on this VM — memory-bandwidth-bound work on
SMT-shared cores does not scale like a cache-resident compute loop. This
probe times a noop write (full scan, no shuffle, no Python) of the scaled
pages/universe/frontier parquet at pinned levels, giving the denominator
for ceiling-normalized scaling efficiency.

Usage: python tools/scan_ceiling_probe.py <parquet_dir> [levels-csv] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker() -> None:
    from cc_crawl_statistics_spark.session import get_spark

    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    path = os.environ["SCAN_DIR"]
    reps = int(os.environ.get("REPS", "3"))
    spark = get_spark(
        app_name=f"scan-ceiling-{cpus}",
        cores=cpus,
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"
            ),
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.local.dir": os.environ.get("SPARK_LOCAL_DIR", "/tmp"),
        },
    )
    df = spark.read.parquet(path)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    print(json.dumps({"cpus": cpus, "scan_sec": round(best, 2)}))
    spark.stop()


def main() -> None:
    path = sys.argv[1]
    levels = (
        [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [2, 8]
    )
    reps = sys.argv[3] if len(sys.argv) > 3 else "3"
    out: dict[int, float] = {}
    for cpus in levels:
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(cpus),
            SCAN_DIR=path,
            REPS=reps,
            SPARK_LOCAL_DIR="/dev/shm/spark-scanprobe",
        )
        cmd = ["python", os.path.join(REPO, "tools", "scan_ceiling_probe.py"), "worker"]
        if shutil.which("taskset"):
            pins = f"0-{cpus - 1}" if cpus > 1 else "0"
            cmd = ["taskset", "-c", pins] + cmd
        r = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
        res = json.loads(r.stdout.strip().splitlines()[-1])
        out[cpus] = res["scan_sec"]
        print(json.dumps(res))
    for lo, hi in ((2, 8), (8, 32)):
        if lo in out and hi in out:
            sp = out[lo] / out[hi]
            print(
                json.dumps(
                    {
                        "span": f"{lo}->{hi}",
                        "scan_speedup": round(sp, 2),
                        "scan_ceiling_efficiency": round(sp / 4, 3),
                    }
                )
            )
    shutil.rmtree("/dev/shm/spark-scanprobe", ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker()
    else:
        main()
