"""Tiered continuous-aggregate catalog with retention and compaction.

Materializes ADDITIVE rollup partials (see operators.rollup) at
hourly/daily/weekly retention tiers as partitioned parquet tables.
No Iceberg runtime jar ships in this sandbox, so the catalog emulates
the Iceberg operations it would map to 1:1 in production:

    upsert (batch delta) -> append snapshot (here: dynamic partition
                            overwrite of the batch's own partitions)
    expire               -> DROP PARTITION (here: delete period-bucket
                            directories older than the horizon)
    compact              -> rewriteDataFiles (here: merge all deltas
                            into a single base delta)

Layout: ``<root>/<tier>/pbucket=<k>/batch=<id>/…parquet`` where
``pbucket = floor(period / bucket_periods)``.

Why batch-delta partitions instead of read-merge-rewrite: re-running a
crashed ingest unit must be IDEMPOTENT. Deltas are written with dynamic
partition overwrite keyed by (pbucket, batch), so a re-run replaces the
batch's own files and never double-counts — the same reason Iceberg
ingests append snapshots rather than rewriting merged state. Partials
are additive, so the read path merges deltas with one hash aggregate
(``merge_partials``), and ``compact`` folds deltas into a ``__base``
batch to keep read amplification bounded.

Reader atomicity (the Iceberg snapshot-pointer analog): each tier keeps
a ``_batches.txt`` manifest naming the LIVE batch set; readers filter
to it (a partition-column filter, so dead dirs are pruned, not read).
``compact`` writes the new base under a batch name readers cannot see
yet, then atomically replaces the manifest (os.replace), then vacuums
dead dirs — a reader planning at any instant sees either the old delta
set or the new base, never both and never a half-written base. Mirrors
Iceberg commit (manifest swap) + expire_snapshots (vacuum). Deletion
can be deferred (``remove_old=False`` + later ``vacuum``) to give
in-flight readers a grace period, exactly like snapshot expiry.
The manifest assumes one writer per tier (the runner's shape); files
beginning with ``_`` are ignored by Spark's file listing.

The pbucket partition column gives (a) partition pruning on
period-range reads, (b) O(1) retention drops, (c) the natural unit for
per-partition lineage.
"""

from __future__ import annotations

import os
import re
import shutil
from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..errors import TimeperiodsError
from ..operators.rollup import finalize_rollup, merge_partials

#: default tier widths in hour grid units
DEFAULT_TIERS = {"hourly": 1, "daily": 24, "weekly": 168}

BASE_BATCH = "__base"


@dataclass
class TierCatalog:
    root: str
    value_vars: Sequence[str]
    group_vars: Sequence[str]
    tiers: dict[str, int] = field(default_factory=lambda: dict(DEFAULT_TIERS))
    bucket_periods: int = 1024  # periods per physical partition

    # ------------------------------------------------------------ paths
    def tier_path(self, tier: str) -> str:
        if tier not in self.tiers:
            raise TimeperiodsError(f"unknown tier {tier!r}; have {sorted(self.tiers)}")
        return os.path.join(self.root, tier)

    def _with_parts(self, df: DataFrame, batch_id: str) -> DataFrame:
        return df.withColumn(
            "pbucket",
            F.floor(F.col("period") / F.lit(self.bucket_periods)).cast("long"),
        ).withColumn("batch", F.lit(batch_id))

    def exists(self, tier: str) -> bool:
        return os.path.isdir(self.tier_path(tier))

    # -------------------------------------------------------- manifest
    def _manifest_path(self, tier: str) -> str:
        return os.path.join(self.tier_path(tier), "_batches.txt")

    def _present_batches(self, tier: str) -> set[str]:
        """Batch names that physically exist under any pbucket dir."""
        path = self.tier_path(tier)
        batches: set[str] = set()
        if not os.path.isdir(path):
            return batches
        for pb in os.listdir(path):
            p = os.path.join(path, pb)
            if pb.startswith("pbucket=") and os.path.isdir(p):
                batches.update(
                    b.split("=", 1)[1]
                    for b in os.listdir(p)
                    if b.startswith("batch=")
                )
        return batches

    def live_batches(self, tier: str) -> Optional[list[str]]:
        """The manifest's live batch set, or None when no manifest
        exists (legacy layout: every present dir is live)."""
        mp = self._manifest_path(tier)
        if not os.path.isfile(mp):
            return None
        with open(mp) as fh:
            return [ln.strip() for ln in fh if ln.strip()]

    def _write_manifest(self, tier: str, batches: Sequence[str]) -> None:
        """Atomic manifest swap (write temp + os.replace) — the commit
        point every reader keys off."""
        mp = self._manifest_path(tier)
        tmp = mp + ".tmp"
        with open(tmp, "w") as fh:
            fh.write("\n".join(sorted(set(batches))) + "\n")
        os.replace(tmp, mp)

    # ------------------------------------------------------------- I/O
    def upsert(self, new_partials: DataFrame, tier: str, batch_id: str) -> None:
        """Add one batch's additive partials as a delta. Idempotent:
        re-running the same batch_id overwrites exactly its own
        (pbucket, batch) partitions and nothing else."""
        if batch_id.startswith(BASE_BATCH):
            # the __base<n> namespace is reserved for compact(): a user
            # batch like "__basefoo" would make compact's generation
            # parse ambiguous (and could be clobbered by a future base)
            raise ValueError(
                f"batch_id may not start with the reserved prefix "
                f"{BASE_BATCH!r} (compaction namespace)"
            )
        path = self.tier_path(tier)
        # cluster rows by target partition before writing: without this,
        # every task opens a file in every pbucket dir (tasks x buckets
        # small files — measured ~40s of fs overhead per 256M-doc batch)
        delta = self._with_parts(new_partials, batch_id).repartition("pbucket")
        # per-write option, NOT a session-conf toggle: concurrent
        # writers sharing the SparkSession (parallel tier ingests, a
        # streaming query plus a batch job) could interleave a toggled
        # global conf and run a static-mode overwrite that clobbers
        # other batches' partitions
        (
            delta.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("pbucket", "batch")
            .parquet(path)
        )
        # register in the live set AFTER the data lands (a crash before
        # this line leaves an invisible, vacuum-able dir; the re-run
        # overwrites it and registers — never a torn visible batch)
        live = self.live_batches(tier)
        if live is None:
            # first manifest: adopt every physically present batch so a
            # legacy (pre-manifest) tier keeps all its data visible
            live = sorted(self._present_batches(tier))
            if batch_id not in live:
                live.append(batch_id)
        elif batch_id not in live:
            live = list(live) + [batch_id]
        self._write_manifest(tier, live)

    def read_batch_delta(
        self, spark: SparkSession, tier: str, batch_id: str
    ) -> DataFrame:
        """Read back exactly one batch's delta (partition-pruned on the
        batch column). Used by ingest to cascade coarser tiers from the
        just-written fine tier instead of recomputing from raw data."""
        return (
            spark.read.parquet(self.tier_path(tier))
            .filter(F.col("batch") == batch_id)
            .drop("pbucket", "batch")
        )

    def read_partials(self, spark: SparkSession, tier: str) -> DataFrame:
        """Merged view over all LIVE deltas — one hash aggregate;
        pbucket pruning still applies to filters pushed through it, and
        the live-batch filter prunes dead (pre-vacuum) batch dirs.

        Snapshot order matters: the manifest is read BEFORE the
        directory listing. A concurrent compact() writes its new base
        dir first and swaps the manifest after, so manifest-then-list
        always yields a consistent snapshot (an old manifest names dirs
        that still exist pre-vacuum; a new manifest names a base that
        was fully written before the swap). The reverse order could
        list the old dirs, then read the NEW manifest, and filter the
        listing down to a base dir it never saw — an empty read."""
        live = self.live_batches(tier)
        raw = spark.read.parquet(self.tier_path(tier))
        if live is not None:
            # batch is a partition column: isin prunes dead dirs
            raw = raw.filter(F.col("batch").isin(list(live)))
        raw = raw.drop("pbucket", "batch")
        return merge_partials(raw, self.value_vars, self.group_vars)

    def read_finished(
        self,
        spark: SparkSession,
        tier: str,
        required_percentage: float = 100.0,
        origin: int = 0,
    ) -> DataFrame:
        """Reference-contract projection (weighted mean + coverage mask,
        timeperiod_functions.R:319-343) applied lazily over partials."""
        return finalize_rollup(
            self.read_partials(spark, tier),
            self.value_vars,
            self.group_vars,
            width=self.tiers[tier],
            origin=origin,
            required_percentage=required_percentage,
        )

    # -------------------------------------------------------- retention
    def expire(self, tier: str, keep_periods_from: int) -> list[str]:
        """Drop whole period buckets strictly older than the horizon —
        pure directory removal, no rewrite. A bucket is dropped iff its
        newest period < keep_periods_from."""
        path = self.tier_path(tier)
        if not os.path.isdir(path):
            return []
        horizon_bucket = keep_periods_from // self.bucket_periods
        dropped = []
        for entry in sorted(os.listdir(path)):
            if not entry.startswith("pbucket="):
                continue
            if int(entry.split("=", 1)[1]) < horizon_bucket:
                shutil.rmtree(os.path.join(path, entry))
                dropped.append(entry)
        return dropped

    def compact(
        self, spark: SparkSession, tier: str, *, remove_old: bool = True
    ) -> str:
        """Fold all live deltas into a single base delta (bounds read
        amplification after many batches; Iceberg rewriteDataFiles).

        Reader-safe: the base is written under a NEW batch name that no
        manifest references yet (concurrent readers keep seeing the old
        delta set), then one atomic manifest swap makes it the only
        live batch. ``remove_old=True`` vacuums the dead dirs
        immediately — a reader that planned against the old snapshot
        and is still executing could then hit missing files, so
        deployments with long-running readers should pass
        ``remove_old=False`` and ``vacuum()`` after a grace period
        (Iceberg expire_snapshots). Returns the new base batch name."""
        live = self.live_batches(tier)
        if live is None:
            live = sorted(self._present_batches(tier))
            self._write_manifest(tier, live)
        # localCheckpoint severs the file lineage: the write below
        # targets the same directory tree it was read from, which
        # Spark's overwrite-while-reading guard would otherwise reject
        # (and eager materialization snapshots the old delta set before
        # any new files land)
        merged = self.read_partials(spark, tier).localCheckpoint(eager=True)
        # unique, monotone base name: readers can never have seen it
        # only __base / __base<digits> participate in the generation
        # count — a stray non-numeric suffix (pre-guard data, foreign
        # writer) must not brick compaction for the tier
        gen = 1 + max(
            (int(m.group(1) or 0) for m in (
                re.match(re.escape(BASE_BATCH) + r"(\d*)$", b)
                for b in self._present_batches(tier)
            ) if m),
            default=-1,
        )
        base_name = f"{BASE_BATCH}{gen}"
        self._with_parts(merged, base_name).repartition("pbucket").write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "pbucket", "batch"
        ).parquet(self.tier_path(tier))
        self._write_manifest(tier, [base_name])  # the commit point
        if remove_old:
            self.vacuum(tier)
        return base_name

    def vacuum(self, tier: str) -> list[str]:
        """Delete batch dirs no longer in the live manifest (Iceberg
        expire_snapshots + remove_orphan_files). Safe to defer."""
        live = self.live_batches(tier)
        if live is None:
            return []
        keep = set(live)
        path = self.tier_path(tier)
        dropped = []
        for pb in sorted(os.listdir(path)):
            p = os.path.join(path, pb)
            if not (pb.startswith("pbucket=") and os.path.isdir(p)):
                continue
            for b in sorted(os.listdir(p)):
                if b.startswith("batch=") and b.split("=", 1)[1] not in keep:
                    shutil.rmtree(os.path.join(p, b))
                    dropped.append(f"{pb}/{b}")
        return dropped

    def delta_count(self, tier: str) -> int:
        """Number of LIVE deltas (what the read path pays); dead dirs
        awaiting vacuum don't count."""
        if not os.path.isdir(self.tier_path(tier)):
            return 0
        live = self.live_batches(tier)
        if live is not None:
            return len(live)
        return len(self._present_batches(tier))
