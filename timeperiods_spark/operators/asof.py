"""As-of join: match each query time to the latest observation at or
before it (optionally within a tolerance), per group.

Beyond the reference's surface (SURVEY.md §2.3 notes it has no as-of
join), but the canonical timeseries join every retention-tier user
asks for next — e.g. "the tier value in force at time t".

Spark-first shape: NOT a join at all. Observations and query times are
UNIONED into one stream with a marker, sorted within group by
(time, marker), and the observation columns are carried forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window —
one shuffle by group, linear work, no pair fan-out (a naive theta join
on ``obs.ts <= q.ts`` is quadratic per group and then needs a max
reduction). With no group columns the stream is RANGE-partitioned by
time and the carry crosses partition boundaries via a per-partition
"latest observation" handoff (same pattern as the ungrouped integrity
scan) — no single-task window.

Ties: an observation AT the query time matches (closed semantics,
consistent with the engine's closed intervals). Duplicate observation
times within a group resolve to the last one in (time, order of
appearance) — pass pre-deduplicated observations for determinism, as
the driver query does.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

from ..errors import RoleValidationError


def asof_join(
    queries: DataFrame,
    observations: DataFrame,
    on: str,
    value_vars: Sequence[str],
    group_vars: Optional[Sequence[str]] = None,
    *,
    tolerance: Optional[int] = None,
) -> DataFrame:
    """For each query row, attach the latest observation value(s) with
    ``obs.on <= query.on`` (and ``query.on - obs.on <= tolerance`` when
    given) in the same group. Unmatched queries keep NULL values.

    Output: all query columns + ``value_vars…`` + ``asof_<on>`` (the
    matched observation time, NULL when unmatched).
    """
    group_vars = list(group_vars or [])
    value_vars = list(value_vars)
    if not value_vars:
        raise RoleValidationError("value_vars must name at least one column")
    for name, df, need in (
        ("queries", queries, group_vars + [on]),
        ("observations", observations, group_vars + [on] + value_vars),
    ):
        missing = [c for c in need if c not in df.columns]
        if missing:
            raise RoleValidationError(f"columns {missing} not present in {name}")
    clash = [c for c in value_vars + [f"asof_{on}"] if c in queries.columns]
    if clash:
        raise RoleValidationError(
            f"columns {clash} would collide with query columns; rename them"
        )

    q_payload = [c for c in queries.columns if c not in group_vars and c != on]
    obs = observations.select(
        *group_vars,
        F.col(on).cast("long").alias("__t"),
        F.lit(0).alias("__m"),  # observations sort BEFORE queries at a tie
        F.lit(None).cast("long").alias("__qrow"),
        *[F.col(v).alias(f"__v_{v}") for v in value_vars],
        *[F.lit(None).cast(queries.schema[c].dataType).alias(f"__q_{c}") for c in q_payload],
    )
    qs = queries.select(
        *group_vars,
        F.col(on).cast("long").alias("__t"),
        F.lit(1).alias("__m"),
        F.monotonically_increasing_id().alias("__qrow"),
        *[F.lit(None).cast(observations.schema[v].dataType).alias(f"__v_{v}") for v in value_vars],
        *[F.col(c).alias(f"__q_{c}") for c in q_payload],
    )
    stream = obs.unionByName(qs)

    carry_cols = [f"__v_{v}" for v in value_vars]
    obs_t = F.when(F.col("__m") == 0, F.col("__t"))

    if group_vars:
        w = (
            Window.partitionBy(*group_vars)
            .orderBy("__t", "__m")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = stream.select(
            *group_vars,
            "__t",
            "__m",
            "__qrow",
            *[F.col(f"__q_{c}") for c in q_payload],
            F.last(obs_t, ignorenulls=True).over(w).alias("__asof_t"),
            *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carry_cols],
        )
    else:
        # ungrouped: range-partition the stream by time, carry within
        # each physical partition, then fix rows whose carry started
        # before their partition using per-partition "latest obs" stats
        # (tiny: one row per partition, running-carried on the driver).
        spark = stream.sparkSession
        n_parts = max(2, spark.sparkContext.defaultParallelism)
        parts = stream.repartitionByRange(n_parts, "__t", "__m").withColumn(
            "__pid", F.spark_partition_id()
        )
        w = (
            Window.partitionBy("__pid")
            .orderBy("__t", "__m")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = parts.select(
            "__pid",
            "__t",
            "__m",
            "__qrow",
            *[F.col(f"__q_{c}") for c in q_payload],
            F.last(obs_t, ignorenulls=True).over(w).alias("__asof_t"),
            *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carry_cols],
        )
        # per-partition latest observation (= the carry at partition end)
        wp = Window.partitionBy("__pid").orderBy(F.col("__t").desc(), F.col("__m").desc())
        tail = (
            carried.withColumn("__rn", F.row_number().over(wp))
            .filter(F.col("__rn") == 1)
            .select("__pid", F.col("__asof_t").alias("__pt"),
                    *[F.col(c).alias(f"__p{c}") for c in carry_cols])
            .collect()
        )
        run_t, run_v = None, {c: None for c in carry_cols}
        handoff = []  # carry INTO partition pid (from all earlier pids)
        for r in sorted(tail, key=lambda r: r["__pid"]):
            handoff.append((r["__pid"], run_t, *[run_v[c] for c in carry_cols]))
            if r["__pt"] is not None:
                run_t = r["__pt"]
                run_v = {c: r[f"__p{c}"] for c in carry_cols}
        hdf = spark.createDataFrame(
            handoff,
            schema=carried.select(
                "__pid", F.col("__asof_t").alias("__ht"),
                *[F.col(c).alias(f"__h{c}") for c in carry_cols],
            ).schema,
        )
        carried = carried.join(F.broadcast(hdf), "__pid", "left").select(
            "__t",
            "__m",
            "__qrow",
            *[F.col(f"__q_{c}") for c in q_payload],
            F.coalesce("__asof_t", "__ht").alias("__asof_t"),
            *[F.coalesce(c, f"__h{c}").alias(c) for c in carry_cols],
        )

    out = carried.filter(F.col("__m") == 1)
    if tolerance is not None:
        stale = F.col("__t") - F.col("__asof_t") > F.lit(int(tolerance))
        out = out.select(
            *[c for c in out.columns if c != "__asof_t" and c not in carry_cols],
            F.when(stale, F.lit(None)).otherwise(F.col("__asof_t")).alias("__asof_t"),
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c) for c in carry_cols],
        )
    return out.select(
        *group_vars,
        F.col("__t").alias(on),
        *[F.col(f"__q_{c}").alias(c) for c in q_payload],
        *[F.col(f"__v_{v}").alias(v) for v in value_vars],
        F.col("__asof_t").alias(f"asof_{on}"),
    )
