"""As-of join: match each query time to the latest observation at or
before it (optionally within a tolerance), per group.

Beyond the reference's surface (SURVEY.md §2.3 notes it has no as-of
join), but the canonical timeseries join every retention-tier user
asks for next — e.g. "the tier value in force at time t".

Spark-first shape: NOT a join at all. Observations and query times are
UNIONED into one stream with a marker and the observation columns are
carried forward with ``last(..., ignorenulls=True)`` — linear work, no
pair fan-out (a naive theta join on ``obs.ts <= q.ts`` is quadratic per
group and then needs a max reduction). The carry window runs within
(group…, time-bucket), where the bucket is a DETERMINISTIC function of
the row (``floor((t - lo) / W)``); each bucket's carry-in is the
group's latest observation from all earlier buckets, chained over the
tiny per-bucket frame and broadcast back. This keeps parallelism
independent of group cardinality (one huge group — or no groups —
would otherwise serialize through a single window task) and avoids
``spark_partition_id`` over a range exchange, whose sampled boundaries
can differ between the jobs that compute a handoff and the main result.

Ties: an observation AT the query time matches (closed semantics,
consistent with the engine's closed intervals). Duplicate observation
times within a group resolve arbitrarily among the duplicates — pass
pre-deduplicated observations for determinism, as the driver query
does.
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
    n_buckets: Optional[int] = None,
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
    carry_cols = ["__ot"] + [f"__v_{v}" for v in value_vars]
    obs = observations.select(
        *group_vars,
        F.col(on).cast("long").alias("__t"),
        F.lit(0).alias("__m"),  # observations sort BEFORE queries at a tie
        F.col(on).cast("long").alias("__ot"),
        *[F.col(v).alias(f"__v_{v}") for v in value_vars],
        *[
            F.lit(None).cast(queries.schema[c].dataType).alias(f"__q_{c}")
            for c in q_payload
        ],
    )
    qs = queries.select(
        *group_vars,
        F.col(on).cast("long").alias("__t"),
        F.lit(1).alias("__m"),
        F.lit(None).cast("long").alias("__ot"),
        *[
            F.lit(None).cast(observations.schema[v].dataType).alias(f"__v_{v}")
            for v in value_vars
        ],
        *[F.col(c).alias(f"__q_{c}") for c in q_payload],
    )
    from pyspark import StorageLevel

    # the stream feeds three subtrees (bounds, per-bucket carry, bucket
    # last-observations): persist so sources are scanned once
    stream = obs.unionByName(qs).persist(StorageLevel.MEMORY_AND_DISK)

    bounds = stream.agg(F.min("__t").alias("lo")).first()
    if bounds is None or bounds["lo"] is None:
        # no rows at all → empty result with the right schema
        return stream.filter(F.lit(False)).select(
            *group_vars,
            F.col("__t").alias(on),
            *[F.col(f"__q_{c}").alias(c) for c in q_payload],
            *[F.col(f"__v_{v}").alias(v) for v in value_vars],
            F.col("__ot").alias(f"asof_{on}"),
        )
    spark = stream.sparkSession
    if n_buckets is None:
        n_buckets = max(2, spark.sparkContext.defaultParallelism * 4)
    lo = int(bounds["lo"])
    hi = int(stream.agg(F.max("__t")).first()[0])
    width = max(1, (hi - lo) // n_buckets + 1)
    bucketed = stream.withColumn(
        "__bk", ((F.col("__t") - F.lit(lo)) / F.lit(width)).cast("long")
    )

    # local carry within (group…, bucket)
    w = Window.partitionBy(*group_vars, "__bk").orderBy("__t", "__m").rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = bucketed.select(
        *group_vars,
        "__t",
        "__m",
        "__bk",
        *[F.col(f"__q_{c}") for c in q_payload],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carry_cols],
    )

    # carry-in per (group…, bucket): the group's latest observation from
    # all STRICTLY EARLIER buckets — max_by over each bucket's obs rows
    # (map-side combined, one row per non-empty (group, bucket)), then a
    # running last-non-null over the tiny per-bucket frame
    bucket_last = bucketed.filter(F.col("__m") == 0).groupBy(
        *group_vars, "__bk"
    ).agg(
        F.max_by(F.struct(*carry_cols), F.struct("__t", "__m")).alias("lastobs")
    )
    all_buckets = bucketed.select(*group_vars, "__bk").dropDuplicates()
    jb = bucket_last
    for g in group_vars:
        jb = jb.withColumnRenamed(g, f"__j_{g}")
    jb = jb.withColumnRenamed("__bk", "__jbk")
    cond = F.col("__bk") == F.col("__jbk")
    for g in group_vars:
        cond = cond & F.col(g).eqNullSafe(F.col(f"__j_{g}"))
    per_bucket = all_buckets.join(jb, cond, "left").select(
        *group_vars, "__bk", "lastobs"
    )
    wg = (
        Window.partitionBy(*group_vars)
        if group_vars
        else Window.partitionBy(F.lit(1))
    ).orderBy("__bk").rowsBetween(Window.unboundedPreceding, -1)
    carry_in = per_bucket.select(
        *[F.col(g).alias(f"__h_{g}") for g in group_vars],
        F.col("__bk").alias("__hbk"),
        F.last("lastobs", ignorenulls=True).over(wg).alias("__carry"),
    )

    cond2 = F.col("__bk") == F.col("__hbk")
    for g in group_vars:
        cond2 = cond2 & F.col(g).eqNullSafe(F.col(f"__h_{g}"))
    stitched = local.join(F.broadcast(carry_in), cond2, "left").select(
        *group_vars,
        "__t",
        "__m",
        *[F.col(f"__q_{c}") for c in q_payload],
        *[
            F.coalesce(F.col(c), F.col("__carry").getField(c)).alias(c)
            for c in carry_cols
        ],
    )

    out = stitched.filter(F.col("__m") == 1)
    if tolerance is not None:
        stale = F.col("__t") - F.col("__ot") > F.lit(int(tolerance))
        out = out.select(
            *group_vars,
            "__t",
            *[F.col(f"__q_{c}") for c in q_payload],
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
                for c in carry_cols
            ],
        )
    return out.select(
        *group_vars,
        F.col("__t").alias(on),
        *[F.col(f"__q_{c}").alias(c) for c in q_payload],
        *[F.col(f"__v_{v}").alias(v) for v in value_vars],
        F.col("__ot").alias(f"asof_{on}"),
    )
