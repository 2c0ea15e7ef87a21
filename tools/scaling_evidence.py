"""Two-cluster-size scaling evidence (BASELINE.md engine target).

Generates the scaled pages universe once, then runs the identical workload
at two parallelism levels — local[8] pinned to 8 CPUs via taskset, and
local[32] on all 32 — in fresh JVMs, and reports throughput at both plus
scaling efficiency = (T_N / T_4N) / 4. Appends the result to BENCH.md.

Usage: python tools/scaling_evidence.py [factor]
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, cpu_list: str | None, pages_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        PAGES_DIR=pages_dir,
        SPARK_LOCAL_DIR="/dev/shm/spark-scaling",
    )
    cmd = ["python", os.path.join(REPO, "tools", "scaling_worker.py")]
    if cpu_list is not None and shutil.which("taskset"):
        cmd = ["taskset", "-c", cpu_list] + cmd
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    tmp = tempfile.mkdtemp(prefix="scaling_pages_")
    try:
        from bench import materialize_scaled_pages
        from cc_crawl_statistics_spark.session import get_spark

        spark = get_spark(
            app_name="scaling-gen",
            cores=32,
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        pages_dir = os.path.join(tmp, "pages")
        materialize_scaled_pages(spark, SF_DIR, factor, pages_dir, 32)
        spark.stop()

        t0 = time.time()
        low = run_level(8, "0-7", pages_dir)
        high = run_level(32, None, pages_dir)
        wall = time.time() - t0

        speedup = low["total_sec"] / high["total_sec"]
        eff = speedup / 4
        per_phase = {
            k: round(low["phases"][k] / high["phases"][k] / 4, 2)
            for k in low["phases"]
        }
        result = {
            "factor": factor,
            "rows": low["rows"],
            "local8_total_sec": low["total_sec"],
            "local32_total_sec": high["total_sec"],
            "local8_rows_per_sec": low["rows_per_sec"],
            "local32_rows_per_sec": high["rows_per_sec"],
            "speedup_8_to_32": round(speedup, 2),
            "scaling_efficiency": round(eff, 3),
            "per_phase_efficiency": per_phase,
            "harness_wall_sec": round(wall, 1),
        }
        print(json.dumps(result, indent=2))
        with open(os.path.join(REPO, "BENCH.md"), "a") as f:
            f.write(
                f"\n## Scaling evidence (local[8] pinned vs local[32], "
                f"{low['rows']:,} rows)\n\n"
                f"| level | total sec | rows/sec |\n|---|---|---|\n"
                f"| local[8] (taskset 0-7) | {low['total_sec']} | "
                f"{low['rows_per_sec']:,} |\n"
                f"| local[32] | {high['total_sec']} | "
                f"{high['rows_per_sec']:,} |\n\n"
                f"Speedup 8→32: **{speedup:.2f}×**, scaling efficiency "
                f"(speedup/4): **{eff:.3f}**\n\n"
                f"Per-phase efficiency: "
                f"{json.dumps(per_phase)}\n"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree("/dev/shm/spark-scaling", ignore_errors=True)


if __name__ == "__main__":
    main()
