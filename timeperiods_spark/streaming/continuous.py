"""Incremental continuous aggregates over retention tiers.

The reference is batch-only (SURVEY.md §2.3: no streaming); the north
star's "continuous aggregates" are therefore repeated incremental
batch: each arriving batch of interval measurements is rolled to
ADDITIVE hourly partials, upserted into the hourly tier, and cascaded
into every coarser tier by re-binning the *batch's own* partials —
never rescanning history. Additivity makes the result exactly equal to
a from-scratch rebuild (asserted in tests), which is the TimescaleDB-
style continuous-aggregate contract, expressed as plain DataFrame ops.

Skew note: the hourly groupBy keys are (source, period); the dominant
source is spread across periods, and AQE skew handling plus
``salted_repartition`` (functions.grid) cover pathological cases.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame

from ..operators.rollup import cascade, rollup_regular
from ..runner import ResumableJob
from ..sources.catalog import TierCatalog


def ingest_batch(
    catalog: TierCatalog,
    batch: DataFrame,
    interval_vars: Sequence[str],
    *,
    base_tier: str = "hourly",
    job: Optional[ResumableJob] = None,
    batch_id: Optional[str] = None,
    collect_counts: bool = False,
    group_encoders: Optional[dict] = None,
    algorithm: str = "explode",
) -> dict[str, int]:
    """Roll one batch into every tier of the catalog.

    With ``job``/``batch_id``, each (batch, tier) pair is a resumable
    lineage unit. Re-running any unit is idempotent: the catalog stores
    each batch's contribution as its own delta partition, so a crash
    after commit but before the lineage record simply rewrites the same
    delta. Returns per-tier row counts.
    """
    value_vars = list(catalog.value_vars)
    group_vars = list(catalog.group_vars)
    base_width = catalog.tiers[base_tier]
    spark = batch.sparkSession
    counts: dict[str, int] = {}
    bid = batch_id or "adhoc"

    def upsert_tier(tier: str) -> dict[str, int]:
        width = catalog.tiers[tier]
        if tier == base_tier:
            # the only pass over raw data: one explode + hash aggregate
            tier_partials = rollup_regular(
                batch,
                interval_vars,
                value_vars,
                group_vars,
                width=base_width,
                partial=True,
                group_encoders=group_encoders,
                algorithm=algorithm,
            )
        else:
            # coarser tiers re-bin the just-written base delta (tiny,
            # partition-pruned parquet read) — raw data is scanned once
            # per batch no matter how many tiers exist, and a resumed
            # run cascades without recomputing the base tier.
            tier_partials = cascade(
                catalog.read_batch_delta(spark, base_tier, bid),
                value_vars,
                group_vars,
                fine_width=base_width,
                coarse_width=width,
            )
        import os
        import time as _t

        _t0 = _t.time()
        catalog.upsert(tier_partials, tier, bid)
        if os.environ.get("SPARK_GRAFT_DEBUG_PHASES"):
            print(f"[phase] {bid}:{tier} upsert {_t.time() - _t0:.1f}s", flush=True)
        # counting re-executes the tier plan; only pay for it when
        # lineage metrics explicitly ask (collect_counts)
        n = tier_partials.count() if collect_counts else -1
        counts[tier] = n
        return {"rows": n, "tier": tier}

    ordered = sorted(catalog.tiers, key=catalog.tiers.get)
    if ordered and ordered[0] != base_tier:
        raise ValueError(f"base tier {base_tier} must be the finest tier")
    for tier in ordered:
        if catalog.tiers[tier] % base_width != 0:
            raise ValueError(
                f"tier {tier} width {catalog.tiers[tier]} does not nest in "
                f"base tier width {base_width}"
            )
        if job is not None and batch_id is not None:
            job.run_unit(f"{batch_id}:{tier}", lambda t=tier: upsert_tier(t))
        else:
            upsert_tier(tier)
    return counts
