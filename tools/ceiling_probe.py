"""One-off probe: max attainable 8→32 scaling on this box for (a) pure
compute (sha2 over generated rows, no shuffle) and (b) shuffle-heavy
(groupBy on random key). Determines whether measured efficiency is workload
shape or a hardware/JVM ceiling. Reports per-rep times; env HEAP to vary."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker() -> None:
    sys.path.insert(0, REPO)
    from cc_crawl_statistics_spark.session import get_spark

    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    heap = os.environ.get("HEAP", "8g")
    spark = get_spark(
        app_name=f"probe-{cpus}",
        cores=cpus,
        shuffle_partitions=cpus * 2,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": heap,
        },
    )
    n = 40_000_000
    df = spark.range(n, numPartitions=cpus * 4)
    df.selectExpr("sum(id)").collect()

    out = {"compute": [], "shuffle": []}
    for _ in range(3):
        t0 = time.time()
        df.selectExpr(
            "sha2(concat(cast(id as string), 'x', cast(id*7 as string)), 256) h"
        ).selectExpr("count(distinct substring(h,1,2))").collect()
        out["compute"].append(round(time.time() - t0, 2))

        t0 = time.time()
        df.selectExpr("cast(id % 1000000 as string) k", "id v").groupBy(
            "k"
        ).agg({"v": "sum"}).selectExpr("count(*)").collect()
        out["shuffle"].append(round(time.time() - t0, 2))
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    res = {}
    for cpus, pin in ((8, "0-7"), (32, None)):
        cmd = ["python", __file__, "worker"]
        if pin:
            cmd = ["taskset", "-c", pin] + cmd
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        out = subprocess.run(cmd, env=env, capture_output=True, text=True)
        res[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    print(json.dumps(res))
    for phase in res[8]:
        t8, t32 = min(res[8][phase]), min(res[32][phase])
        sp = t8 / t32
        print(f"{phase}: t8={t8} t32={t32} speedup={sp:.2f} eff={sp / 4:.3f}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker()
    else:
        main()
