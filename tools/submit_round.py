"""spark-submit entry point for frontier scheduling rounds (north rule:
"submitted via spark-submit --py-files").

    python tools/package.py
    spark-submit --master 'local[8]' --py-files dist/ccspark.zip \
        tools/submit_round.py --sf /root/testdata/sf0.001 \
        --store /tmp/frontier_store --rounds 2 [--extract]

On a cluster the only change is --master / deploy-mode: all engine state
lives in the snapshot store path (shared filesystem / object store), no
driver-local state. Re-submitting with the same --store resumes from the
latest committed snapshot.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--store", required=True)
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument(
        "--extract", action="store_true",
        help="run the fetch+extract stage each round (byte-identity metrics)",
    )
    ap.add_argument(
        "--age-boost", type=int, default=0,
        help="starvation-free priority aging: effective score = score + "
        "age_boost x rounds-waiting (0 = static ordering)",
    )
    ap.add_argument(
        "--n-fetchers", type=int, default=0,
        help="stamp each schedule row with its consistent-hash fetcher "
        "shard (host-affine; frontier/capacity.py) and record the fleet "
        "balance metric (0 = off)",
    )
    ap.add_argument(
        "--enforce-robots-paths", action="store_true",
        help="fetch-time per-path robots gate: denied schedule rows are "
        "persisted allowed=false, retired unfetched, never expanded",
    )
    ap.add_argument(
        "--expire", action="store_true",
        help="after each round, drop state tables unreachable past the "
        "newest compaction bases (SnapshotStore.expire_rounds — the "
        "Iceberg expire_snapshots analog; gives up pre-cutoff time travel)",
    )
    args = ap.parse_args()

    # Imports resolve from --py-files on executors and driver alike.
    from pyspark.sql import SparkSession

    from cc_crawl_statistics_spark.frontier import scheduler
    from cc_crawl_statistics_spark.frontier.state import SnapshotStore
    from cc_crawl_statistics_spark.sources.tables import load_table

    spark = SparkSession.builder.getOrCreate()
    store = SnapshotStore(args.store)
    docs = (
        load_table(spark, args.sf, "documents").select("doc_id", "text")
        if args.extract
        else None
    )
    for _ in range(args.rounds):
        metrics = scheduler.run_round(
            spark,
            store,
            args.sf,
            n_partitions=args.partitions,
            docs=docs,
            age_boost=args.age_boost,
            n_fetchers=args.n_fetchers,
            enforce_robots_paths=args.enforce_robots_paths,
        )
        if args.expire:
            removed = store.expire_rounds(metrics["round"])
            metrics["n_expired_tables"] = len(removed)
        print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
