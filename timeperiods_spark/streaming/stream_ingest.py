"""Structured Streaming front-ends for the tier catalog.

The reference is batch-only (SURVEY.md §2.3); the retention tiers are
continuous aggregates = repeated incremental batch. Two idiomatic
Spark bridges are provided:

``stream_ingest``
    readStream over a growing file/table source → ``foreachBatch`` →
    the SAME ``ingest_batch`` used for batch loads, with the micro-batch
    epoch as the lineage/delta batch id. Spark's streaming checkpoint
    tracks which source files were consumed; the catalog's batch-delta
    layout makes epoch replays (after a crash between checkpoint and
    commit) idempotent. Exactly-once end to end without any new
    machinery — this is the recommended production path.

``windowed_rollup_stream``
    A pure Structured Streaming event-time aggregation with a watermark,
    for point-event sources (one timestamp per row, not intervals):
    window(ts, width) + additive partials, append mode after the
    watermark closes each window. Demonstrates the native streaming
    operator surface; interval-valued measurements still go through
    ``stream_ingest`` (windows can't split a row across periods —
    that overlap-weighting is exactly what the batch core does).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..runner import ResumableJob
from ..sources.catalog import TierCatalog
from .continuous import ingest_batch


def stream_ingest(
    spark: SparkSession,
    source_path: str,
    schema,
    catalog: TierCatalog,
    interval_vars: Sequence[str],
    *,
    checkpoint_dir: str,
    manifest_dir: Optional[str] = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously ingest parquet files appearing under ``source_path``
    into every tier of ``catalog``. With ``available_now`` the query
    drains the currently-available input and stops (the batch-refresh
    cadence pattern); otherwise it runs until stopped."""
    job = ResumableJob(manifest_dir) if manifest_dir else None

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_batch(
            catalog,
            batch_df,
            interval_vars,
            job=job,
            batch_id=f"epoch{epoch_id}",
        )

    stream = spark.readStream.schema(schema).parquet(source_path)
    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_rollup_stream(
    events: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: Sequence[str],
    *,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked event-time rollup of a point-event stream: additive
    partials per (group, window), append-mode-ready. Late rows beyond
    the watermark are dropped by Spark's state store — the streaming
    analog of required_percentage accounting is carried by n_events
    vs the expected density, decided downstream."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*group_cols, F.window(ts_col, window_duration).alias("win"))
        .agg(
            F.count(value_col).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            *group_cols,
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
            "sum_value",
            "first_ts",
            "last_ts",
        )
    )


def distinct_rollup_stream(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    group_cols: Sequence[str],
    *,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    lgk: int = 12,
) -> DataFrame:
    """Watermarked distinct-count sketch partials of a point-event
    stream: one HLL sketch per (group, window) — the streaming front
    of ``operators.distinct``. The emitted BINARY sketch column merges
    downstream with ``hll_union_agg`` (``distinct_cascade`` /
    ``merge_partials``), so a streaming hourly tier cascades into the
    batch daily/weekly tiers with no raw replay. NULL keys are
    excluded (COUNT DISTINCT semantics); late rows beyond the
    watermark are dropped by the state store."""
    return (
        events.filter(F.col(key_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(*group_cols, F.window(ts_col, window_duration).alias("win"))
        .agg(
            F.hll_sketch_agg(F.col(key_col), F.lit(int(lgk)))
            .alias(f"hll_{key_col}"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            *group_cols,
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            f"hll_{key_col}",
            "n_events",
        )
    )


def stateful_locf_stream(
    events: DataFrame,
    group_cols: Sequence[str],
    period_col: str,
    value_col: str,
) -> DataFrame:
    """Streaming gap-fill/LOCF as a CUSTOM STATEFUL operator
    (``applyInPandasWithState``) — the one tier operation native
    windowed aggregation cannot express, because filling a gap needs
    the last observation carried across micro-batch boundaries.

    Per group, the state is (last_period, last_value). Each micro-batch
    emits one row per grid period from the previous watermark point to
    the batch's max period: observed periods carry their (mean) value
    with ``gap_filled=false``; missing periods repeat the carried value
    with ``gap_filled=true`` (the batch ``gap_fill_locf`` contract,
    SURVEY.md §7 M5). A gap is emitted when the NEXT observation
    arrives — no timeout-based speculation, so replays are
    deterministic and the stream stays append-only. State size is O(1)
    per group (two scalars) regardless of history length.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    group_cols = list(group_cols)
    gfields = [f for f in events.schema.fields if f.name in group_cols]
    out_schema = T.StructType(
        gfields
        + [
            T.StructField(period_col, T.LongType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("gap_filled", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_period", T.LongType()),
            T.StructField("last_value", T.DoubleType()),
        ]
    )

    def fill(key, pdfs, state: GroupState):
        chunks = [pdf for pdf in pdfs]
        if not chunks:
            # a group can surface with no data rows (e.g. state-only
            # invocations); nothing to emit
            return
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        # one value per period inside the batch (mean of duplicates),
        # ordered — the stateful walk needs monotone periods
        obs = (
            pdf.groupby(period_col)[value_col].mean().sort_index()
        )
        last_p, last_v = state.get if state.exists else (None, None)
        out_p, out_v, out_g = [], [], []
        for p, v in obs.items():
            p = int(p)
            if last_p is not None and p <= last_p:
                # late/out-of-order observation at or before the carried
                # frontier: already emitted (possibly as a gap fill) —
                # re-emitting would duplicate periods in append mode.
                # Dropped, matching watermark semantics; sources that
                # must not lose data should be watermarked/monotone per
                # group upstream.
                continue
            if last_p is not None:
                for gap in range(last_p + 1, p):
                    out_p.append(gap)
                    out_v.append(last_v)
                    out_g.append(True)
            out_p.append(p)
            out_v.append(float(v))
            out_g.append(False)
            last_p, last_v = p, float(v)
        state.update((last_p, last_v))
        frame = pd.DataFrame({period_col: out_p, value_col: out_v, "gap_filled": out_g})
        for g, val in zip(group_cols, key):
            frame[g] = val
        yield frame[group_cols + [period_col, value_col, "gap_filled"]]

    return events.groupBy(*group_cols).applyInPandasWithState(
        fill, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def ewma_stream(
    events: DataFrame,
    group_cols: Sequence[str],
    t_col: str,
    value_col: str,
    *,
    alpha: float,
    init: str = "first",
) -> DataFrame:
    """Streaming EWMA as a custom stateful operator — the continuous
    front of ``operators.trend.ewma``. A recurrence cannot be a
    windowed aggregate (each output needs the previous output), so the
    state is O(1) per group: (last_t, last_e). Each micro-batch sorts
    its rows per group, folds the recurrence from the carried state,
    and emits one row per observation; rows at or before the carried
    frontier are dropped (same late-data contract as the LOCF stream —
    re-emitting would duplicate keys in append mode). A replay of the
    same batch sequence reproduces the same outputs (state transitions
    are pure).

    Continuity guarantee (pytest-pinned): feeding batches 1..k through
    the stream equals the batch ``ewma`` over the concatenation.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if not (0.0 < float(alpha) <= 1.0):
        raise ValueError(f"ewma_stream: alpha must be in (0, 1], got {alpha}")
    if init not in ("first", "zero"):
        raise ValueError("ewma_stream: init must be 'first' or 'zero'")
    a = float(alpha)
    group_cols = list(group_cols)
    gfields = [f for f in events.schema.fields if f.name in group_cols]
    out_schema = T.StructType(
        gfields
        + [
            T.StructField(t_col, T.LongType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("ewma", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_t", T.LongType()),
            T.StructField("last_e", T.DoubleType()),
        ]
    )

    def step(key, pdfs, state: GroupState):
        chunks = [pdf for pdf in pdfs]
        if not chunks:
            return
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        pdf = pdf[[t_col, value_col]].dropna().sort_values(t_col)
        last_t, e = state.get if state.exists else (None, None)
        out_t, out_v, out_e = [], [], []
        for t, v in zip(pdf[t_col], pdf[value_col]):
            t, v = int(t), float(v)
            if last_t is not None and t <= last_t:
                continue  # late/duplicate: frontier already emitted
            if e is None:
                e = v if init == "first" else a * v
            else:
                e = (1.0 - a) * e + a * v
            out_t.append(t)
            out_v.append(v)
            out_e.append(round(e, 6))
            last_t = t
        if out_t:
            state.update((last_t, e))
            frame = pd.DataFrame(
                {t_col: out_t, value_col: out_v, "ewma": out_e}
            )
            for g, val in zip(group_cols, key):
                frame[g] = val
            yield frame[group_cols + [t_col, value_col, "ewma"]]

    return events.groupBy(*group_cols).applyInPandasWithState(
        step, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def sessionized_rollup_stream(
    events: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: Sequence[str],
    *,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked SESSION-window rollup of a point-event stream —
    Spark's native ``session_window`` (dynamic, gap-merged windows in
    the state store), the streaming counterpart of the batch row-level
    ``operators.sessions.sessionize``. Append-mode-ready: a session
    closes (and emits) once the watermark passes its end + gap. Use the
    batch operator when every ROW needs its session ordinal; use this
    when you need per-session aggregates continuously."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*group_cols, F.session_window(ts_col, gap).alias("win"))
        .agg(
            F.count(value_col).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            *group_cols,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
            "first_ts",
            "last_ts",
        )
    )


def dedup_ingest_epoch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    *,
    id_col: str,
    text_col: str,
    index_dir: str,
    out_dir: str,
    k: int = 5,
    n_hashes: int = 12,
    bands: int = 4,
    verify_threshold: float = 0.7,
) -> None:
    """One micro-batch of incremental near-dup ingestion, IDEMPOTENT
    under crash replay: every write (survivors, band index, shingle
    index) lands under an ``__epoch=<id>`` subdirectory with
    ``mode("overwrite")``, so a replayed epoch overwrites its own files
    instead of appending a second copy. Without this a replay would
    permanently duplicate the epoch's index rows — the index grows and
    the candidate/verify fan-out inflates on every future batch.
    (Iceberg equivalent: MERGE on (id, band) or a snapshot-id commit
    check.) Replay also re-runs the dedup against an index that may
    already contain this batch's signatures, which only ADDS
    self-matches with id_a < id_b — all batch-internal pairs already
    found — so the survivor set is unchanged too.

    Index reads and the epoch lifecycle go through
    ``streaming.dedup_index``: each sub-index keeps a ``_epochs.json``
    live-set manifest, an epoch becomes reader-visible only at its
    ``register_epoch`` commit, and ``compact_index`` (run from the
    maintenance cadence, through the last CHECKPOINTED epoch) folds old
    epochs into a ``__base<gen>`` dir so the directory count stays
    bounded. A replay of an already-compacted epoch is a full no-op —
    its rows are in the base and re-registering is refused."""
    import os

    from ..operators.dedup import minhash_dedup_incremental
    from . import dedup_index as dix

    bands_path = os.path.join(index_dir, "bands")
    shingles_path = os.path.join(index_dir, "shingles")

    if int(epoch_id) <= dix.compacted_through(bands_path):
        # this epoch was folded into a compacted base: its index rows
        # and survivors are already durable — rewriting the epoch dir
        # would resurrect rows the manifest no longer references
        return

    def _epoch_write(df: DataFrame, root: str) -> None:
        df.write.mode("overwrite").parquet(
            os.path.join(root, f"__epoch={int(epoch_id)}")
        )

    r = minhash_dedup_incremental(
        batch_df,
        id_col,
        text_col,
        index_bands=dix.read_live(spark, bands_path),
        index_shingles=dix.read_live(spark, shingles_path),
        k=k,
        n_hashes=n_hashes,
        bands=bands,
        verify_threshold=verify_threshold,
        broadcast_batch=True,
    )
    _epoch_write(r["deduped"], out_dir)
    _epoch_write(r["new_bands"], bands_path)
    _epoch_write(r["new_shingles"], shingles_path)
    # commit point: the epoch enters the live set only after its data
    # files are fully on disk (a crash before here leaves invisible
    # dirs that the replay overwrites, a crash after is idempotent)
    dix.register_epoch(bands_path, int(epoch_id))
    dix.register_epoch(shingles_path, int(epoch_id))
    # release the per-batch shingle cache: a long-running stream would
    # otherwise accumulate one persisted frame per epoch
    r["new_shingles"].unpersist()


def stream_dedup_ingest(
    spark: SparkSession,
    source_path: str,
    schema,
    *,
    id_col: str,
    text_col: str,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    n_hashes: int = 12,
    bands: int = 4,
    verify_threshold: float = 0.7,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming incremental near-dup ingestion: every micro-batch is
    deduplicated against the PERSISTED MinHash band index (plus itself)
    via ``operators.dedup.minhash_dedup_incremental``, survivors land
    in ``out_dir``, and the batch's signatures (survivors AND dropped —
    required for whole-corpus equivalence) extend the index. The
    streaming checkpoint gives exactly-once file consumption, and every
    write is epoch-keyed (see ``dedup_ingest_epoch``) so a crash-replayed
    epoch overwrites its own output instead of duplicating index rows;
    with monotone doc ids the accumulated output equals the
    whole-corpus single_hop dedup at every point in time.

    Index layout: ``<index_dir>/bands`` (id, band, bsig) and
    ``<index_dir>/shingles`` (id, hashes), one ``__epoch=<id>`` dir per
    micro-batch under a ``_epochs.json`` live-set manifest — partition/
    bucket by (band, hash(bsig)) at real scale. Run
    ``streaming.dedup_index.compact_index(spark, index_dir,
    through_epoch=<last checkpointed>)`` on a maintenance cadence to
    fold old epochs into a base dir; otherwise the directory count
    grows one per batch forever.
    """

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        dedup_ingest_epoch(
            spark,
            batch_df,
            epoch_id,
            id_col=id_col,
            text_col=text_col,
            index_dir=index_dir,
            out_dir=out_dir,
            k=k,
            n_hashes=n_hashes,
            bands=bands,
            verify_threshold=verify_threshold,
        )

    stream = spark.readStream.schema(schema).parquet(source_path)
    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
