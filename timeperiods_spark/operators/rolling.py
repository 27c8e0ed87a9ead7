"""Trailing rolling-window aggregates over sparse period series.

Beyond the reference's surface: the smoothing/trailing-statistics layer
every tier consumer asks for (7-day moving average over daily rollups,
trailing max, …). The textbook formulation is a RANGE window
(``RANGE BETWEEN k-1 PRECEDING AND CURRENT ROW``) — which in Spark
partitions by the group columns and hits the same one-task-per-group
ceiling this engine eliminates everywhere else.

Spark-first shape: NO window at all. Each observation at period ``p``
contributes to the k target periods ``p .. p+k-1``
(``explode(sequence(...))`` — map-side, fan-out = k), one hash
aggregate by (group…, target period) computes every trailing statistic
with map-side combine, and an equi join back to the observed rows
keeps the output at observed periods only (matching the RANGE-window
contract over a sparse series). Two shuffles, both keyed by
(group, period), fully parallel at any group cardinality — the right
trade whenever k is modest (k rows shuffled per input row).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from ..errors import RoleValidationError


def rolling_window_agg(
    df: DataFrame,
    period_col: str,
    value_col: str,
    group_vars: Optional[Sequence[str]] = None,
    *,
    k: int,
    prefix: str = "roll_",
) -> DataFrame:
    """Attach trailing ``k``-period aggregates (sum, mean, count, min,
    max of ``value_col`` over periods ``[p-k+1, p]``) to every observed
    row. Rows with NULL periods are excluded; NULL values count toward
    no statistic (SQL aggregate semantics).
    """
    group_vars = list(group_vars or [])
    if k <= 0:
        raise RoleValidationError("k must be a positive number of periods")
    p = F.col(period_col).cast("long")
    contrib = df.filter(p.isNotNull()).select(
        *group_vars,
        F.col(value_col).cast("double").alias("__v"),
        F.explode(F.sequence(p, p + F.lit(int(k) - 1))).alias("__tp"),
    )
    agg = contrib.groupBy(*group_vars, "__tp").agg(
        F.sum("__v").alias(f"{prefix}sum"),
        F.count("__v").cast("long").alias(f"{prefix}count"),
        F.min("__v").alias(f"{prefix}min"),
        F.max("__v").alias(f"{prefix}max"),
    ).withColumn(
        f"{prefix}mean", F.col(f"{prefix}sum") / F.when(F.col(f"{prefix}count") > 0, F.col(f"{prefix}count"))
    )
    for g in group_vars:
        agg = agg.withColumnRenamed(g, f"__a_{g}")
    cond = p == F.col("__tp")
    for g in group_vars:
        cond = cond & F.col(g).eqNullSafe(F.col(f"__a_{g}"))
    return (
        df.filter(p.isNotNull())
        .join(agg, cond, "left")
        .drop("__tp", *[f"__a_{g}" for g in group_vars])
    )
