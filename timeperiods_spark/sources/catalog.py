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

The pbucket partition column gives (a) partition pruning on
period-range reads, (b) O(1) retention drops, (c) the natural unit for
per-partition lineage.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field
from typing import Sequence

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

    # ------------------------------------------------------------- I/O
    def upsert(self, new_partials: DataFrame, tier: str, batch_id: str) -> None:
        """Add one batch's additive partials as a delta. Idempotent:
        re-running the same batch_id overwrites exactly its own
        (pbucket, batch) partitions and nothing else."""
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
        """Merged view over all deltas — one hash aggregate; pbucket
        pruning still applies to filters pushed through it."""
        raw = spark.read.parquet(self.tier_path(tier)).drop("pbucket", "batch")
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

    def compact(self, spark: SparkSession, tier: str) -> None:
        """Fold all deltas into a single ``__base`` delta (bounds read
        amplification after many batches; Iceberg rewriteDataFiles)."""
        path = self.tier_path(tier)
        merged = self.read_partials(spark, tier).cache()
        merged.count()  # materialize before we delete the source
        tmp = path + ".compact.tmp"
        self._with_parts(merged, BASE_BATCH).write.mode("overwrite").partitionBy(
            "pbucket", "batch"
        ).parquet(tmp)
        merged.unpersist()
        shutil.rmtree(path)
        os.replace(tmp, path)

    def delta_count(self, tier: str) -> int:
        path = self.tier_path(tier)
        if not os.path.isdir(path):
            return 0
        batches = set()
        for pb in os.listdir(path):
            p = os.path.join(path, pb)
            if pb.startswith("pbucket=") and os.path.isdir(p):
                batches.update(b for b in os.listdir(p) if b.startswith("batch="))
        return len(batches)
