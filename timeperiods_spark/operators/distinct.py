"""Mergeable distinct-count tiers: HLL sketch partials that cascade.

Beyond the reference (whose aggregates are all additive means —
timeperiod_functions.R:270-285): the one statistic every tier store is
asked for that is NOT additive is COUNT(DISTINCT key) ("daily/weekly
active users"). Recomputing it per tier from raw data defeats the
whole continuous-aggregate design, so this module keeps the tier-store
contract — partials, exact cascade, finalize — with Apache DataSketches
HLL partials (Spark's built-in ``hll_sketch_agg`` family):

* ``distinct_rollup``: one hash aggregate per (group, period) emitting
  a BINARY sketch column (plus the exact count when ``exact=True`` —
  audit/small-scale only, exact counts cannot cascade).
* ``distinct_cascade``: daily→weekly by ``hll_union_agg`` — the union
  sees every register the raw data would populate, so NO accuracy is
  lost to the tiering itself beyond one known effect: a union falls
  back from the HIP estimator to the composite estimator (standard
  DataSketches behavior), so a cascaded estimate can differ from a
  direct raw-data sketch by a fraction of the configured RSE. In
  sparse/coupon mode (small cells) the union is bit-exact.
* ``finalize_distinct``: project ``n_distinct_est`` (+ period bounds).

Error model: DataSketches HLL with ``lgk`` config (default 12 →
~1.6% relative standard error, ~2.5 KB dense sketch per cell). The
sketch column rides the same parquet tier files the additive partials
use (TierCatalog treats it as an opaque binary payload).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..errors import RoleValidationError


def _period(t: Column, width: int, origin: int) -> Column:
    return F.floor((t - F.lit(int(origin))) / F.lit(int(width))).cast("long")


def distinct_rollup(
    df: DataFrame,
    t_col: str,
    key_col: str,
    group_vars: Optional[Sequence[str]] = None,
    *,
    width: int,
    origin: int = 0,
    lgk: int = 12,
    exact: bool = False,
) -> DataFrame:
    """HLL distinct-count partials on a regular period grid.

    ``t_col`` must be long-grid units (callers with timestamps go
    through ``timestamp_to_grid`` first, same convention as the tier
    jobs). NULL times are excluded; NULL keys are excluded (matching
    COUNT(DISTINCT) SQL semantics). Output: ``group_vars…, period,
    hll_<key_col>`` (+ ``n_distinct`` when ``exact=True``).

    One map-side-combined hash aggregate — the sketch's update and
    merge both run JVM-side; nothing leaves the executor but ~2.5 KB
    per (group, period) cell.
    """
    if width <= 0:
        raise RoleValidationError("width must be a positive number of grid units")
    gcols = list(group_vars or [])
    base = (
        df.filter(F.col(t_col).isNotNull() & F.col(key_col).isNotNull())
        .withColumn("period", _period(F.col(t_col).cast("long"), width, origin))
    )
    aggs = [
        F.hll_sketch_agg(F.col(key_col), F.lit(int(lgk))).alias(f"hll_{key_col}")
    ]
    if exact:
        aggs.append(
            F.count_distinct(F.col(key_col)).cast("long").alias("n_distinct")
        )
    return base.groupBy(*gcols, "period").agg(*aggs)


def distinct_cascade(
    partials: DataFrame,
    key_col: str,
    group_vars: Optional[Sequence[str]] = None,
    *,
    fine_width: int,
    coarse_width: int,
) -> DataFrame:
    """Coarse-tier sketch partials from fine-tier ones — no raw
    rescan. The union covers the same register population as a direct
    sketch of the raw union; the estimate may differ by a fraction of
    the RSE because a union uses the composite estimator where a
    direct aggregation keeps HIP (see module docstring). Requires
    nested widths (same contract as ``rollup.cascade``)."""
    if coarse_width % fine_width != 0:
        raise RoleValidationError(
            f"coarse width {coarse_width} must be a multiple of fine width {fine_width}"
        )
    gcols = list(group_vars or [])
    factor = coarse_width // fine_width
    col = f"hll_{key_col}"
    if col not in partials.columns:
        raise RoleValidationError(f"partials carry no {col!r} sketch column")
    out = partials.withColumn(
        "period", F.floor(F.col("period") / F.lit(factor)).cast("long")
    )
    return out.groupBy(*gcols, "period").agg(
        F.hll_union_agg(F.col(col)).alias(col)
    )


def finalize_distinct(
    partials: DataFrame,
    key_col: str,
    group_vars: Optional[Sequence[str]] = None,
    *,
    width: int,
    origin: int = 0,
) -> DataFrame:
    """Project sketch partials to ``n_distinct_est`` with the tier
    period bounds (closed-interval grid, like ``finalize_rollup``)."""
    gcols = list(group_vars or [])
    col = f"hll_{key_col}"
    if col not in partials.columns:
        raise RoleValidationError(f"partials carry no {col!r} sketch column")
    w = F.lit(int(width))
    o = F.lit(int(origin))
    return partials.select(
        *gcols,
        "period",
        (o + F.col("period") * w).cast("long").alias("start"),
        (o + (F.col("period") + 1) * w - 1).cast("long").alias("end"),
        F.hll_sketch_estimate(F.col(col)).cast("long").alias("n_distinct_est"),
        *(["n_distinct"] if "n_distinct" in partials.columns else []),
    )
