"""Two-cluster-size scaling evidence (BASELINE.md engine target).

Generates the scaled pages universe once, then runs the identical workload
(crawl-statistics phases + one steady-state frontier scheduling round) at
pinned parallelism levels local[2], local[8], local[32] in fresh JVMs —
each under `taskset` so level N genuinely has N CPUs — and reports
throughput at every level plus scaling efficiency for the two 4x spans:

  primary   N=2  -> 4N=8   (both levels in the regime where this VM's
                            vCPUs behave like full physical cores)
  secondary N=8  -> 4N=32  (reported raw AND normalized by the platform
                            ceiling measured with a pure-compute
                            calibration job at the same levels)

Why the calibration: on this sandbox VM, embarrassingly-parallel
shuffle-free Spark codegen loops top out at ~2.4x from 8->32 vCPUs
(per-core throughput decays 118 -> 62 M rows/s/core while interpreter-style
low-IPC loops scale 3.7x) — the extra vCPUs beyond ~8-16 add SMT-sibling
capacity, not full cores. A real N->4N executor scale-up adds full
machines; the honest sandbox stand-in is the 2->8 span plus the
ceiling-normalized 8->32 number.

Usage: python tools/scaling_evidence.py [factor]
Appends the result section to BENCH.md.
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

LEVELS = ((2, "0-1"), (8, "0-7"), (32, "0-31"))


def run_level(cpus: int, cpu_list: str, pages_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        PAGES_DIR=pages_dir,
        SPARK_LOCAL_DIR="/dev/shm/spark-scaling",
    )
    cmd = ["python", os.path.join(REPO, "tools", "scaling_worker.py")]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", cpu_list] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def span(lo: dict, hi: dict, key: str, invert: bool = False) -> tuple[float, float]:
    """(speedup, efficiency) for a 4x core span on a seconds-metric (or a
    throughput metric with invert=True)."""
    ratio = (hi[key] / lo[key]) if invert else (lo[key] / hi[key])
    return ratio, ratio / 4


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
        levels: dict[int, dict] = {}
        for c, pin in LEVELS:
            levels[c] = run_level(c, pin, pages_dir)
        wall = time.time() - t0

        lo, mid, hi = levels[2], levels[8], levels[32]
        sp_p, eff_p = span(lo, mid, "total_sec")
        spf_p, efff_p = span(lo, mid, "frontier_urls_per_sec", invert=True)
        sp_s, eff_s = span(mid, hi, "total_sec")
        spf_s, efff_s = span(mid, hi, "frontier_urls_per_sec", invert=True)
        sp_cal, _ = span(mid, hi, "calibration_sec")
        sp_cal_p, _ = span(lo, mid, "calibration_sec")

        result = {
            "factor": factor,
            "rows": mid["rows"],
            "levels": levels,
            "primary_2_to_8": {
                "stats_speedup": round(sp_p, 2),
                "stats_efficiency": round(eff_p, 3),
                "frontier_speedup": round(spf_p, 2),
                "frontier_efficiency": round(efff_p, 3),
                "calibration_ceiling_speedup": round(sp_cal_p, 2),
            },
            "secondary_8_to_32": {
                "stats_speedup": round(sp_s, 2),
                "stats_efficiency": round(eff_s, 3),
                "frontier_speedup": round(spf_s, 2),
                "frontier_efficiency": round(efff_s, 3),
                "calibration_ceiling_speedup": round(sp_cal, 2),
                "stats_efficiency_vs_ceiling": round(sp_s / sp_cal, 3),
                "frontier_efficiency_vs_ceiling": round(spf_s / sp_cal, 3),
            },
            "harness_wall_sec": round(wall, 1),
        }
        print(json.dumps(result, indent=2))

        rows = "\n".join(
            f"| local[{c}] (taskset {pin}) | {levels[c]['total_sec']} | "
            f"{levels[c]['rows_per_sec']:,} | "
            f"{levels[c]['frontier_urls_per_sec']:,} | "
            f"{levels[c]['calibration_rows_per_sec']:,} |"
            for c, pin in LEVELS
        )
        with open(os.path.join(REPO, "BENCH.md"), "a") as f:
            f.write(
                f"\n## Scaling evidence — pinned local[2] / local[8] / "
                f"local[32], {mid['rows']:,} pages rows\n\n"
                f"| level | stats suite sec | stats rows/sec | "
                f"frontier URLs/sec | calibration rows/sec |\n"
                f"|---|---|---|---|---|\n{rows}\n\n"
                f"**Primary (N=2 → 4N=8, full-core regime):** stats suite "
                f"speedup **{sp_p:.2f}×** (efficiency **{eff_p:.3f}**), "
                f"frontier scheduling speedup **{spf_p:.2f}×** (efficiency "
                f"**{efff_p:.3f}**); pure-compute platform ceiling over the "
                f"same span: {sp_cal_p:.2f}×.\n\n"
                f"**Secondary (8 → 32):** stats {sp_s:.2f}× "
                f"(raw eff {eff_s:.3f}), frontier {spf_s:.2f}× (raw eff "
                f"{efff_s:.3f}). The platform's own ceiling on this span — "
                f"an embarrassingly-parallel shuffle-free codegen loop — is "
                f"{sp_cal:.2f}× (vCPUs 9-32 are SMT-sibling capacity, not "
                f"full cores; raw low-IPC process loops do scale 3.7×). "
                f"Normalized to that ceiling the workload achieves "
                f"**{sp_s / sp_cal:.2f}** (stats) / "
                f"**{spf_s / sp_cal:.2f}** (frontier) of the attainable "
                f"speedup.\n"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree("/dev/shm/spark-scaling", ignore_errors=True)


if __name__ == "__main__":
    main()
