"""SparkSession factory tuned for the sandbox (local[N]) and for scale.

Settings chosen for 100TB-readiness, not just the local run:
  - AQE on (runtime partition coalescing, skew-join splitting) — replaces the
    reference's hand-tuned reducer counts (/root/reference/crawlstats.py:1023-1029)
  - shuffle partitions sized to cores locally; on a real cluster AQE
    coalesces from the configured initial number
  - Arrow enabled: all Python-side work is vectorized (pandas UDFs),
    never per-row Python (BASELINE.json input_hint)
  - UTC session timezone so results compare exactly against DuckDB
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cc-crawl-statistics-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # runtime Bloom-filter join: prefilters the frontier side of the
        # URL-seen anti-join so only candidate partitions shuffle
        # (scheduler.py scale design); no-op on small inputs
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
