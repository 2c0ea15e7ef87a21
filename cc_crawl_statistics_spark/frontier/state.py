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
  - the frontier is written ``repartitionByRange(N, "surt_key")`` so each
    partition owns a contiguous SURT range — the next round's scan is
    partition-aligned and hot SURT prefixes split by raising N (salting
    handled in scheduler.py);
  - url_seen is APPEND-ONLY: the seed delta is range-partitioned on
    seen_key, every later round's delta is HASH-partitioned (seen keys
    are uniform 64-bit hashes, so hash partitioning clusters identically
    to range without the range partitioner's extra sampling pass). The
    full set as of round R = compacted base (if any) + subsequent deltas;
  - ``compact_seen`` merges the deltas into one hash-partitioned base
    every K rounds, bounding the file/listing count read_seen unions (at
    thousands of rounds an uncompacted store is a file-listing problem,
    ~64 bits/key ≈ 80 GiB at 10^10 URLs) and materializes the Bloom
    prefilter (frontier/bloom.py) the anti-join consults: candidates the
    Bloom rejects as definitely-unseen skip the exact anti-join shuffle;
    "maybe seen" rows still go through it, so results stay exact.
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
        # Per-table-kind schema cache: every spark.read.parquet without an
        # explicit schema pays a driver-side footer read for inference.
        # A round reads 6-7 store tables, so at steady state those footer
        # reads are a constant ~0.3-0.5s/round of driver latency. The
        # schema of a table kind never changes within a store, so the
        # first read's inferred schema is reused for the rest of the
        # store handle's life (a resume constructs a fresh handle and
        # re-infers once).
        self._schemas: dict[str, object] = {}

    def _round_dir(self, rnd: int) -> str:
        return os.path.join(self.root, f"round={rnd:04d}")

    def _read_parquet(
        self, spark: SparkSession, kind: str, *paths: str
    ) -> DataFrame:
        """Read parquet path(s) of one table kind with the cached schema."""
        schema = self._schemas.get(kind)
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.parquet(*paths)
        if schema is None:
            self._schemas[kind] = df.schema
        return df

    def table_rows(self, rnd: int, table: str) -> int:
        """Exact row count of a written table from parquet footer metadata —
        driver-side file reads, no Spark job (the Iceberg-manifest
        row-count pattern: snapshot metadata answers COUNT(*) without
        touching data). File count per table is bounded by n_partitions."""
        import pyarrow.parquet as pq

        d = os.path.join(self._round_dir(rnd), table)
        return sum(
            pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

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
        # no kind-schema cache for single-dir reads: one bounded dir infers
        # cheaply, and a table's schema may legitimately widen between
        # rounds (schedule gains allowed/fetcher when enforcement/sharding
        # is enabled mid-store) — a cached narrower schema would silently
        # hide the new columns. The cache serves the MULTI-path readers
        # (read_frontier / read_seen_deltas), which project only columns
        # present in every round.
        return spark.read.parquet(os.path.join(self._round_dir(rnd), table))

    def seen_base_round(self, upto_rnd: int) -> int | None:
        """Highest round ≤ upto_rnd holding a compacted url_seen_base."""
        for r in range(upto_rnd, -1, -1):
            if os.path.exists(
                os.path.join(self._round_dir(r), "url_seen_base")
            ):
                return r
        return None

    def read_seen(self, spark: SparkSession, upto_rnd: int) -> DataFrame:
        """The URL-seen set as of a round: the latest compacted base (if
        any) plus the per-round append-only deltas after it (the
        Iceberg-append + periodic-rewrite pattern — each round adds one
        delta instead of rewriting the 10^10-key set; compaction bounds
        the delta-file count), minus any re-opened keys (reopen_seen)
        not re-added by a later delta."""
        from pyspark.sql import functions as F

        base = self.seen_base_round(upto_rnd)
        paths = []
        if base is not None:
            paths.append(os.path.join(self._round_dir(base), "url_seen_base"))
        start = 0 if base is None else base + 1
        paths += [
            os.path.join(self._round_dir(r), "url_seen_delta")
            for r in range(start, upto_rnd + 1)
        ]
        seen = self._read_parquet(
            spark, "url_seen_delta", *[p for p in paths if os.path.exists(p)]
        )
        # reopen lists: bounded per round (recrawl tiers), retired by the
        # next compaction (the rewritten base already excludes them).
        # Range starts AT the base round: a reopen filed after that
        # round's compaction must still apply; one filed before was
        # folded in, and re-applying is a no-op thanks to the
        # re-add guard below.
        for r0 in range(max(start - 1, 0), upto_rnd + 1):
            p = os.path.join(self._round_dir(r0), "url_seen_reopen")
            if not os.path.exists(p):
                continue
            rk = self._read_parquet(spark, "url_seen_delta", p)
            # a key re-seen AFTER its reopen is seen again — keep it
            readd = self.read_seen_deltas(spark, r0 + 1, upto_rnd)
            eff = rk.join(readd, "seen_key", "left_anti")
            seen = seen.join(F.broadcast(eff), "seen_key", "left_anti")
        return seen

    def reopen_seen(
        self, spark: SparkSession, rnd: int, keys: DataFrame
    ) -> None:
        """Re-open previously-seen URLs for refetch (adaptive recrawl,
        operators/recrawl.py decides which): file a bounded reopen list
        under ``rnd``. read_seen subtracts these keys until a later delta
        re-adds them; a materialized cuckoo prefilter drops them in place
        (frontier/cuckoo.py — the reason it exists); a Bloom needs no
        change (it only over-approximates, and the exact anti-join
        consults the reopen-adjusted seen set — the scheduler's running
        broadcast may stay stale until the next compaction, which only
        costs those keys the maybe-path, never correctness). The next
        discovery of a reopened URL schedules it again."""
        out = os.path.join(self._round_dir(rnd), "url_seen_reopen")
        keys.select("seen_key").coalesce(1).write.mode("overwrite").parquet(
            out
        )
        pf = self.prefilter_path(rnd)
        if pf is not None and pf[0] == "cuckoo":
            from .shardedfilter import delete_keys_sharded, is_sharded

            if not is_sharded(pf[1]):
                # legacy single-blob store (pre-sharding rounds):
                # migrate-on-touch — rebuild it sharded from the base
                # parquet, so the driver-side load/delete/save (and its
                # unbounded keys.collect()) never runs
                pf = self.migrate_prefilter(spark, rnd)
            # deletion is a Spark job that edits only the affected shard
            # files (two-phase: tasks write temp siblings, the driver
            # renames after success) — the reopen list never assembles on
            # the driver, so an unbounded robots-drift reopen stays
            # executor-bounded (frontier/shardedfilter.py)
            delete_keys_sharded(spark, pf[1], keys)

    def read_seen_deltas(
        self, spark: SparkSession, from_rnd: int, upto_rnd: int
    ) -> DataFrame:
        """Just the per-round deltas in [from_rnd, upto_rnd] (used as the
        small anti-join side for Bloom-rejected candidates). Returns an
        empty seen-key relation when no deltas exist in the range."""
        paths = [
            os.path.join(self._round_dir(r), "url_seen_delta")
            for r in range(from_rnd, upto_rnd + 1)
        ]
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            return spark.createDataFrame([], "seen_key bigint")
        return self._read_parquet(spark, "url_seen_delta", *paths)

    def frontier_base_round(self, upto_rnd: int) -> int | None:
        """Highest round ≤ upto_rnd holding a materialized full frontier
        (the seed round, a compaction rewrite, or any round committed by
        the pre-delta engine format)."""
        for r in range(upto_rnd, -1, -1):
            if os.path.exists(os.path.join(self._round_dir(r), "frontier")):
                return r
        return None

    def read_frontier(
        self,
        spark: SparkSession,
        upto_rnd: int,
        keep_src_rnd: bool = False,
    ) -> DataFrame:
        """The pending frontier as of a round — same append-only +
        periodic-rewrite pattern as read_seen, because at 10¹⁰ URLs the
        frontier must not be rewritten per round any more than the seen
        set: latest materialized base, plus the per-round discovery deltas
        after it, minus the per-round retire lists. The retire lists are
        the ALREADY-PERSISTED schedule and blocked tables (scheduled rows
        retire by url; blocked rows are by construction exactly the
        pending rows on robots-403 hosts that round), budget-bounded per
        round (hosts × budget, plus newly-discovered blocked-host rows),
        so the anti-join side broadcasts. Compaction bounds the chain
        length. Bit-identical to the full-rewrite layout
        (test_frontier.py::test_three_rounds_bit_for_bit)."""
        from pyspark.sql import functions as F

        base = self.frontier_base_round(upto_rnd)
        if base is None:
            raise FileNotFoundError(f"no frontier base ≤ round {upto_rnd}")
        # Retires are ROUND-AWARE: a schedule/blocked list written at round
        # r can only retire pending rows discovered at a round < r (a row
        # discovered at round d first appears in schedule at some round
        # > d). Without this, a URL re-opened for recrawl and then
        # re-discovered at round d would be silently swallowed by its own
        # pre-reopen schedule entry whenever that entry is younger than the
        # last frontier compaction. The round of every row is recovered
        # from its snapshot path (round=NNNN), so the retire sides stay
        # one multi-path read each (not one reader per round: each
        # spark.read.parquet call pays a serial driver-side listing pass).
        rnd_of_path = F.regexp_extract(
            F.input_file_name(), r"round=(\d+)", 1
        ).cast("int")
        cur = self.read(spark, base, "frontier").withColumn(
            "_src_rnd", F.lit(base)
        )
        deltas = [
            os.path.join(self._round_dir(r), "frontier_delta")
            for r in range(base + 1, upto_rnd + 1)
        ]
        deltas = [p for p in deltas if os.path.exists(p)]
        if deltas:
            # same column set as the frontier base (FRONTIER_COLS) — reuse
            # its cached schema; explicit-schema parquet reads bind by name
            cur = cur.unionByName(
                self._read_parquet(spark, "frontier", *deltas).withColumn(
                    "_src_rnd", rnd_of_path
                )
            )
        retired = []
        for t in ("schedule", "blocked"):
            paths = [
                os.path.join(self._round_dir(r), t)
                for r in range(base + 1, upto_rnd + 1)
            ]
            paths = [p for p in paths if os.path.exists(p)]
            if paths:
                retired.append(
                    self._read_parquet(spark, t, *paths).select(
                        "url", rnd_of_path.alias("_ret_rnd")
                    )
                )
        if retired:
            ret = retired[0]
            for x in retired[1:]:
                ret = ret.unionByName(x)
            # broadcast hash anti-join on url; the round inequality rides
            # along as an extra join condition (still a BHJ, no loop join)
            cur = cur.alias("f").join(
                F.broadcast(ret).alias("r"),
                (F.col("f.url") == F.col("r.url"))
                & (F.col("r._ret_rnd") > F.col("f._src_rnd")),
                "left_anti",
            )
        # _src_rnd = the round each pending row was discovered (recovered
        # from its snapshot path; floored to the base round after a
        # frontier compaction rewrite). keep_src_rnd exposes it for
        # priority aging (scheduler.run_round age_boost).
        return cur if keep_src_rnd else cur.drop("_src_rnd")

    def compact_frontier(
        self, spark: SparkSession, upto_rnd: int, n_partitions: int = 4
    ) -> None:
        """Materialize the reconstructed frontier as the new base under
        ``upto_rnd`` (tmp + rename — idempotent post-commit maintenance; a
        crash loses nothing, read_frontier keeps using the older
        base+deltas). repartitionByRange restores the contiguous-SURT
        clustering the hash-partitioned deltas don't maintain."""
        out = os.path.join(self._round_dir(upto_rnd), "frontier")
        if os.path.exists(out):
            return
        tmp = out + ".tmp"
        self.read_frontier(spark, upto_rnd).repartitionByRange(
            n_partitions, "surt_key"
        ).write.mode("overwrite").parquet(tmp)
        os.replace(tmp, out)

    def compact_seen(
        self,
        spark: SparkSession,
        upto_rnd: int,
        n_partitions: int = 4,
        bloom_bits_per_key: int = 10,
        prefilter: str = "bloom",
    ) -> None:
        """Merge base + deltas up to ``upto_rnd`` into a single
        hash-partitioned ``url_seen_base`` under that round's directory,
        and materialize the chosen prefilter beside it — ``"bloom"``
        (default, smallest) or ``"cuckoo"`` (deletable: recrawl re-opens
        can remove keys in place, frontier/cuckoo.py). Idempotent: safe to
        re-run after a crash (tmp + rename into place); read_seen prefers
        the newest base, so an interrupted compaction never loses keys —
        the old deltas remain until the new base is in place."""
        seen = self.read_seen(spark, upto_rnd)
        rdir = self._round_dir(upto_rnd)
        tmp = os.path.join(rdir, "url_seen_base.tmp")
        final = os.path.join(rdir, "url_seen_base")
        seen.repartition(n_partitions, "seen_key").write.mode(
            "overwrite"
        ).parquet(tmp)
        # prefilters are SHARDED (frontier/shardedfilter.py): each Spark
        # task builds and writes its own key-range shard file; the filter
        # never exists as one driver/broadcast object (the 10^10-key
        # frame makes a single blob ~12.5 GB — SURVEY §7 hard part 6)
        if prefilter == "cuckoo":
            from .shardedfilter import build_sharded_cuckoo

            build_sharded_cuckoo(
                spark.read.parquet(tmp),
                os.path.join(rdir, "url_seen_cuckoo.d"),
            )
        else:
            from .shardedfilter import build_sharded_bloom

            build_sharded_bloom(
                spark.read.parquet(tmp),
                os.path.join(rdir, "url_seen_bloom.d"),
                bits_per_key=bloom_bits_per_key,
            )
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)

    # per-round state tables an expiration may remove (never the round-0
    # corpus dimensions universe/host_ledger, never manifests)
    _STATE_TABLES = (
        "frontier",
        "frontier_delta",
        "url_seen_base",
        "url_seen_delta",
        "url_seen_reopen",
        "schedule",
        "blocked",
    )
    _OUTPUT_TABLES = ("round_stats", "fetched")
    _PREFILTER_FILES = (
        "url_seen_bloom.npy",
        "url_seen_cuckoo.npy",
        "url_seen_bloom.d",
        "url_seen_cuckoo.d",
    )

    def expire_rounds(
        self, upto_rnd: int, include_outputs: bool = False
    ) -> list[str]:
        """Iceberg ``expire_snapshots`` analog: drop per-round state tables
        that no read at rounds ≥ the newest bases can ever touch, bounding
        store growth over thousands of rounds (at 10¹⁰ URLs the dead
        pre-compaction deltas/bases dominate the footprint).

        Safe-set derivation (mirrors read_frontier/read_seen exactly):
        with fb = frontier_base_round(upto) and sb = seen_base_round(upto),
        any read at rounds ≥ cutoff = min(fb, sb) touches only (a) the
        bases themselves, (b) deltas/retire lists/reopens at rounds ≥ the
        respective base, and (c) the round-0 corpus dimensions + manifests
        — so every state table at rounds < cutoff is unreachable. Those
        are removed; manifests (metrics / partition-lineage history) and
        ``universe``/``host_ledger`` are always kept, and the analytics
        outputs (round_stats, fetched) only go with ``include_outputs``.

        The trade-off is Iceberg's: time travel BEFORE the cutoff is gone
        (read_frontier raises FileNotFoundError for expired rounds —
        pinned by test); resume from any round ≥ cutoff is bit-identical
        (pinned by test). Idempotent and crash-safe: deletion order
        doesn't matter because nothing reachable is ever deleted."""
        fb = self.frontier_base_round(upto_rnd)
        sb = self.seen_base_round(upto_rnd)
        if fb is None or sb is None:
            return []
        cutoff = min(fb, sb)
        removed: list[str] = []
        tables = self._STATE_TABLES + (
            self._OUTPUT_TABLES if include_outputs else ()
        )
        for r in range(0, cutoff):
            rdir = self._round_dir(r)
            if not os.path.isdir(rdir):
                continue
            for t in tables:
                p = os.path.join(rdir, t)
                if os.path.exists(p):
                    shutil.rmtree(p)
                    removed.append(p)
            for fname in self._PREFILTER_FILES:
                p = os.path.join(rdir, fname)
                if os.path.isdir(p):
                    shutil.rmtree(p)
                    removed.append(p)
                elif os.path.exists(p):
                    os.remove(p)
                    removed.append(p)
        return removed

    def bloom_path(self, upto_rnd: int) -> str | None:
        """Path of the newest materialized Bloom filter ≤ upto_rnd —
        the sharded directory (current format) or the legacy .npy blob."""
        base = self.seen_base_round(upto_rnd)
        if base is None:
            return None
        for fname in ("url_seen_bloom.d", "url_seen_bloom.npy"):
            p = os.path.join(self._round_dir(base), fname)
            if os.path.isdir(p):
                from .shardedfilter import is_committed

                if is_committed(p):
                    return p
            elif os.path.exists(p):
                return p
        return None

    def prefilter_path(self, upto_rnd: int) -> tuple[str, str] | None:
        """(kind, path) of the newest materialized seen-set prefilter ≤
        upto_rnd — whichever of cuckoo/bloom the compaction wrote. A
        directory path is the sharded format (frontier/shardedfilter.py);
        a .npy file is a legacy pre-sharding store, which the engine no
        longer reads — it is rebuilt sharded at its next touch
        (migrate_prefilter)."""
        base = self.seen_base_round(upto_rnd)
        if base is None:
            return None
        rdir = self._round_dir(base)
        for kind, fname in (
            ("cuckoo", "url_seen_cuckoo.d"),
            ("bloom", "url_seen_bloom.d"),
            ("cuckoo", "url_seen_cuckoo.npy"),
            ("bloom", "url_seen_bloom.npy"),
        ):
            p = os.path.join(rdir, fname)
            if os.path.isdir(p):
                from .shardedfilter import is_committed

                if is_committed(p):
                    return kind, p
            elif os.path.exists(p):
                return kind, p
        return None

    def migrate_prefilter(
        self, spark: SparkSession, upto_rnd: int
    ) -> tuple[str, str] | None:
        """Migrate-on-touch for pre-sharding stores: if the newest
        prefilter ≤ ``upto_rnd`` is a legacy single-blob ``.npy``,
        rebuild it as a SHARDED filter from the same base round's
        ``url_seen_base`` parquet, remove the blob, and return the new
        (kind, dir). Already-sharded stores return unchanged, so callers
        use this as their prefilter_path (the scheduler's UDF seam and
        reopen deletion both do) — after which no code path anywhere
        loads, assembles, or broadcasts a whole filter.

        Crash-safe by the same header-last protocol as the build: if the
        rebuild commits but the blob removal doesn't, prefilter_path
        already prefers the sharded dir and the next touch sweeps the
        dead blob. Rebuilding from the base parquet is conservative for a
        legacy cuckoo that had deletions applied: reopened keys re-enter
        the prefilter as "maybe seen", take the exact anti-join path, and
        come out correctly unseen — the no-false-negative contract is
        what migration must (and does) preserve."""
        pf = self.prefilter_path(upto_rnd)
        if pf is None:
            return None
        kind, path = pf
        from .shardedfilter import (
            build_sharded_bloom,
            build_sharded_cuckoo,
            is_sharded,
        )

        base = self.seen_base_round(upto_rnd)
        rdir = self._round_dir(base)
        if not is_sharded(path):
            seen = self._read_parquet(
                spark,
                "url_seen_delta",
                os.path.join(rdir, "url_seen_base"),
            )
            out = os.path.join(rdir, f"url_seen_{kind}.d")
            build = (
                build_sharded_cuckoo if kind == "cuckoo"
                else build_sharded_bloom
            )
            build(seen, out)
            path = out
        for name in ("url_seen_cuckoo.npy", "url_seen_bloom.npy"):
            p = os.path.join(rdir, name)
            if os.path.exists(p):
                os.remove(p)
        return kind, path

    def manifest(self, rnd: int) -> dict:
        with open(os.path.join(self._round_dir(rnd), MANIFEST)) as f:
            return json.load(f)

    def commit(self, rnd: int, tables: dict, metrics) -> dict:
        """Write all tables, then the manifest last (atomic rename) — the
        snapshot-commit point. ``metrics`` may be a dict or a callable
        ``(read: table_name -> DataFrame) -> dict`` evaluated *after* the
        data is on disk, so metric counts scan written parquet instead of
        re-executing the round's whole lineage.

        A table value may be a DataFrame or a CALLABLE ``read -> DataFrame``
        evaluated after the tables it reads are on disk (``read``
        resolves already-written tables of this round). Callables express
        derived tables (e.g. the seen-key projection of the discovery
        delta): the heavy lineage executes exactly once, inside the write
        of the table it derives from, and the derived write re-reads that
        bounded parquet instead of forcing an eager checkpoint upstream —
        so the expensive write overlaps the other concurrent writes
        instead of serializing before them. Derivation chains any depth:
        callables are resolved in waves — each wave evaluates every
        remaining callable whose inputs exist (``read`` of an unwritten
        table defers the callable to a later wave) and writes the wave
        concurrently."""
        rdir = self._round_dir(rnd)
        if os.path.exists(rdir):  # crashed, uncommitted attempt: redo
            if os.path.exists(os.path.join(rdir, MANIFEST)):
                raise ValueError(f"round {rnd} already committed")
            shutil.rmtree(rdir)
        os.makedirs(rdir)
        import time as _time
        from concurrent.futures import ThreadPoolExecutor

        self.last_commit_timings = {}

        # The table writes are independent jobs over already-materialized
        # inputs (checkpointed/persisted upstream), so they are submitted
        # CONCURRENTLY from driver threads: py4j releases the GIL during
        # JVM work and Spark schedules the jobs side by side, overlapping
        # the per-job fixed latency (driver scheduling + output commit)
        # that otherwise serializes — measured as the largest slice of the
        # round's constant cost (BENCH.md Amdahl fit). A failed write
        # raises before the manifest is written, so crash semantics are
        # unchanged (no manifest = round never happened).
        def _write(item):
            name, df = item
            path = os.path.join(rdir, name)
            t0 = _time.time()
            df.write.mode("overwrite").parquet(path)
            self.last_commit_timings[f"write_{name}"] = round(
                _time.time() - t0, 3
            )

        t0 = _time.time()
        workers = int(
            os.environ.get("SPARK_GRAFT_COMMIT_WORKERS", "0")
        ) or max(len(tables), 1)
        eager = {n: df for n, df in tables.items() if not callable(df)}
        derived = {n: fn for n, fn in tables.items() if callable(fn)}
        class _NotYetWritten(Exception):
            pass

        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(_write, eager.items()))
            written = set(eager)
            if derived:
                from pyspark.sql import SparkSession

                spark = SparkSession.getActiveSession()

                def _read(name):
                    if name not in written:
                        raise _NotYetWritten(name)
                    # NO kind-schema cache here: a round may legitimately
                    # widen a table's schema mid-store-life (e.g. turning
                    # on fetcher sharding or per-path robots enforcement
                    # adds schedule columns), and binding the cached
                    # NARROWER schema would silently drop the new columns
                    # from this round's derived tables. Inference over one
                    # just-written bounded dir is cheap; historical
                    # multi-path readers (read_frontier retire lists) keep
                    # the cache — they project only always-present columns.
                    return spark.read.parquet(os.path.join(rdir, name))

                remaining = dict(derived)
                while remaining:
                    wave = []
                    for n, fn in list(remaining.items()):
                        try:
                            wave.append((n, fn(_read)))
                        except _NotYetWritten:
                            continue
                    if not wave:
                        raise ValueError(
                            "circular derived-table dependencies: "
                            f"{sorted(remaining)}"
                        )
                    list(pool.map(_write, wave))
                    for n, _ in wave:
                        written.add(n)
                        del remaining[n]
        self.last_commit_timings["writes_wall"] = round(_time.time() - t0, 3)
        lineage = {
            name: sorted(
                f
                for f in os.listdir(os.path.join(rdir, name))
                if f.endswith(".parquet")
            )
            for name in tables
        }
        if callable(metrics):
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            t0 = _time.time()
            # same no-cache rule as the derived-table reads above: this
            # round's tables may be wider than the cached kind schema
            metrics = metrics(
                lambda name: spark.read.parquet(os.path.join(rdir, name))
            )
            self.last_commit_timings["metrics"] = round(_time.time() - t0, 3)
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


def round_trajectory(spark: SparkSession, store: "SnapshotStore") -> DataFrame:
    """Per-round engine telemetry as a DataFrame, read purely from the
    committed manifests (driver-side JSON, zero data scans — the Iceberg
    snapshot-summary pattern): one row per committed round with the
    scheduling/discovery/seen counters plus the round-over-round discovery
    ratio (new URLs this round per URL scheduled, permille) — the decay
    curve an operator watches to decide when a crawl has converged or a
    compaction/expiration policy should kick in. Dimension-sized by
    construction (#rounds), so building it driver-side is the right
    shape; schema is stable across engine versions (absent counters
    surface as NULL, never KeyError)."""
    latest = store.latest_round()
    rows = []
    for rnd in range(0, (latest or 0) + 1):
        try:
            m = dict(store.manifest(rnd).get("metrics", {}))
        except FileNotFoundError:
            continue  # expired round: manifest retained normally, but be lenient
        sched = m.get("n_scheduled")
        new = m.get("n_discovered_new")
        rows.append(
            (
                rnd,
                m.get("n_seeded"),
                sched,
                m.get("n_blocked"),
                new,
                m.get("n_frontier_pending"),
                m.get("n_seen"),
                (new * 1000 // sched)
                if (new is not None and sched)
                else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "round long, n_seeded long, n_scheduled long, n_blocked long, "
        "n_discovered_new long, n_frontier_pending long, n_seen long, "
        "discovery_permille long",
    )
