"""Snapshot-versioned frontier state store.

Production target is Iceberg (snapshot commits ARE the checkpoints); the
sandbox image has no Iceberg runtime jar, so the same semantics are provided
by a directory-per-snapshot parquet layout behind one small interface:

    root/
      round=0000/  _MANIFEST.json  frontier/  url_seen/  host_ledger/ schedule/
      round=0001/  ...

A snapshot is visible only once ``_MANIFEST.json`` exists (written last,
atomically via tmp+rename) — the same commit-protocol property an Iceberg
snapshot gives. Resume = open the highest round with a manifest; a crashed
round leaves no manifest and is ignored, so re-running it is idempotent
(north_rule: resumable from checkpoint with per-partition lineage+metrics).

Scale notes:
  - frontier and url_seen are written ``repartitionByRange(N, "surt_key")``
    / by seen-key range, so each partition owns a contiguous key range —
    the anti-join and next round's scan are partition-aligned, and hot SURT
    prefixes can be split by raising N (salting handled in scheduler.py);
  - at 10^10 URLs, url_seen is ~64 bits/key ≈ 80 GiB spread over range
    partitions, each with a Bloom prefilter (~1.2 GiB per 10^9 keys at 1%
    FPR) built via df.stat.bloomFilter on the partition's range — the exact
    anti-join only touches partitions the Bloom admits.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST.json"


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _round_dir(self, rnd: int) -> str:
        return os.path.join(self.root, f"round={rnd:04d}")

    def latest_round(self) -> int | None:
        """Highest round with a committed manifest, or None."""
        best = None
        for name in os.listdir(self.root):
            if not name.startswith("round="):
                continue
            rnd = int(name.split("=", 1)[1])
            if os.path.exists(os.path.join(self.root, name, MANIFEST)):
                best = rnd if best is None else max(best, rnd)
        return best

    def read(self, spark: SparkSession, rnd: int, table: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self._round_dir(rnd), table))

    def read_seen(self, spark: SparkSession, upto_rnd: int) -> DataFrame:
        """The URL-seen set as of a round: union of per-round append-only
        deltas (the Iceberg-append pattern — each round adds one delta
        instead of rewriting the 10^10-key set)."""
        paths = [
            os.path.join(self._round_dir(r), "url_seen_delta")
            for r in range(upto_rnd + 1)
        ]
        return spark.read.parquet(*[p for p in paths if os.path.exists(p)])

    def manifest(self, rnd: int) -> dict:
        with open(os.path.join(self._round_dir(rnd), MANIFEST)) as f:
            return json.load(f)

    def commit(self, rnd: int, tables: dict[str, DataFrame], metrics) -> dict:
        """Write all tables, then the manifest last (atomic rename) — the
        snapshot-commit point. ``metrics`` may be a dict or a callable
        ``(read: table_name -> DataFrame) -> dict`` evaluated *after* the
        data is on disk, so metric counts scan written parquet instead of
        re-executing the round's whole lineage."""
        rdir = self._round_dir(rnd)
        if os.path.exists(rdir):  # crashed, uncommitted attempt: redo
            if os.path.exists(os.path.join(rdir, MANIFEST)):
                raise ValueError(f"round {rnd} already committed")
            shutil.rmtree(rdir)
        os.makedirs(rdir)
        lineage = {}
        for name, df in tables.items():
            path = os.path.join(rdir, name)
            df.write.mode("overwrite").parquet(path)
            lineage[name] = sorted(
                f for f in os.listdir(path) if f.endswith(".parquet")
            )
        if callable(metrics):
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            metrics = metrics(
                lambda name: spark.read.parquet(os.path.join(rdir, name))
            )
        tmp = os.path.join(rdir, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(
                {"round": rnd, "metrics": metrics, "partition_lineage": lineage},
                f,
                indent=1,
                sort_keys=True,
            )
        os.replace(tmp, os.path.join(rdir, MANIFEST))
        return metrics
