#!/bin/bash
# CPU-bound text-phase scaling: generate corpus once, run 4 vs 16 cores.
set -e
cd "$(dirname "$0")/.."
python - <<'PYEOF'
import sys; sys.path.insert(0, '.')
from cc_crawl_statistics_spark.session import get_spark
from cc_crawl_statistics_spark.synth import scaled_documents_sql
s = get_spark(cores=32, extra_conf={"spark.ui.showConsoleProgress": "false"})
s.read.parquet('/root/testdata/sf0.1/documents.parquet') \
    .repartition(64).createOrReplaceTempView("documents_raw")
s.sql(scaled_documents_sql(200, "documents_raw")) \
    .write.mode("overwrite").parquet('/dev/shm/exp_corpus')
s.stop()
PYEOF
taskset -c 0-3 env SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=4 \
  CORPUS_DIR=/dev/shm/exp_corpus SPARK_LOCAL_DIR=/dev/shm/spark-exp \
  python tools/scaling_text_worker.py 2>/dev/null
taskset -c 0-15 env SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=16 \
  CORPUS_DIR=/dev/shm/exp_corpus SPARK_LOCAL_DIR=/dev/shm/spark-exp \
  python tools/scaling_text_worker.py 2>/dev/null
