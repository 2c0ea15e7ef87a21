"""CPU-bound text-operator phases for the scaling evidence (regex + array
higher-order functions dominate; shuffle volume is small relative to
compute, so these phases reflect executor-CPU scaling rather than the
single-node memory-bandwidth ceiling)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cc_crawl_statistics_spark.operators import dedup as D  # noqa: E402
from cc_crawl_statistics_spark.operators import textstats as TX  # noqa: E402
from cc_crawl_statistics_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CORPUS_DIR = os.environ["CORPUS_DIR"]
REPS = int(os.environ.get("REPS", "2"))

PHASES = {
    "quality_scores": TX.quality_scores,
    "language_id": TX.language_id,
    "simhash": D.simhash,
    "fingerprint": TX.fingerprint,
}


def main() -> None:
    spark = get_spark(
        app_name=f"scaling-text-{CPUS}",
        cores=CPUS,
        shuffle_partitions=CPUS * 2,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.local.dir": os.environ.get("SPARK_LOCAL_DIR", "/tmp"),
        },
    )
    docs = spark.read.parquet(CORPUS_DIR)
    n_rows = docs.count()

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    force(TX.token_stats(docs))  # warm-up

    phases: dict[str, float] = {}
    for name, op in PHASES.items():
        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            force(op(docs))
            best = min(best, time.time() - t0)
        phases[name] = round(best, 2)

    total = sum(phases.values())
    print(
        json.dumps(
            {
                "cpus": CPUS,
                "rows": n_rows,
                "phases": phases,
                "total_sec": round(total, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
