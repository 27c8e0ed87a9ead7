"""End-to-end training-data pipeline over the token table: the
composition a 10^12-sequence deployment runs nightly, here at demo
scale.

    1. near-dup dedup of the incoming batch against a persisted
       MinHash band index (incremental — no whole-corpus rescan);
    2. rollup of the survivors' token counts into the hourly tier
       (additive partials, sweep algorithm, carry hints);
    3. cascade to daily/weekly + gap-fill + 7-day rolling mean;
    4. Gorilla-compress the daily series into bounded blocks and prove
       the bit-exact round-trip;
    5. coverage report: merged active intervals and the gap report.

Run: python examples/example_pipeline.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from timeperiods_spark import (  # noqa: E402
    build_minhash_index,
    cascade,
    compress_series,
    decompress_series,
    find_gaps,
    gap_fill_locf,
    get_spark,
    merge_intervals,
    minhash_dedup_incremental,
    rolling_window_agg,
    rollup_regular,
    token_table,
)
from timeperiods_spark.operators.rollup import finalize_rollup  # noqa: E402


def main() -> None:
    spark = get_spark("example-pipeline", master="local[4]", shuffle_partitions=8)
    tmp = tempfile.mkdtemp(prefix="pipeline_demo_")
    try:
        # --- 1. incremental dedup: yesterday's corpus is the index ---
        docs = spark.createDataFrame(
            [(i, f"shared boilerplate text block number {i % 4} tail {i}")
             for i in range(40)],
            "doc_id long, text string",
        )
        idx_bands, idx_sh = build_minhash_index(
            docs.filter("doc_id < 20"), "doc_id", "text"
        )
        r = minhash_dedup_incremental(
            docs.filter("doc_id >= 20"), "doc_id", "text",
            index_bands=idx_bands, index_shingles=idx_sh,
            verify_threshold=0.5, broadcast_batch=True,
        )
        survivors = r["deduped"].count()
        print(f"[1] incremental dedup: {survivors} survivors of 20 new docs")

        # --- 2./3. tiers over the (already-clean) token table ---
        tok = token_table(spark, 20_000)
        hourly = rollup_regular(
            tok, ("start_hour", "end_hour"), ("n_tok",), ("source",),
            width=1, partial=True, algorithm="sweep", validate=False,
            carry_hints={"span": (0, 365 * 24 + 64), "groups": 11},
        )
        daily_p = cascade(hourly, ("n_tok",), ("source",), fine_width=1, coarse_width=24)
        daily = finalize_rollup(
            daily_p, ("n_tok",), ("source",), width=24, required_percentage=0.0
        )
        filled = gap_fill_locf(
            daily, ("n_tok",), ("source",), width=24,
            span=(0, 24 * 366 - 1), group_count_hint=11,
        )
        smooth = rolling_window_agg(
            daily.select("source", "period", F.col("n_tok").alias("value")),
            "period", "value", ["source"], k=7,
        )
        print(f"[2] daily tier: {daily.count()} rows; "
              f"[3] gap-filled {filled.count()}, 7d-rolling {smooth.count()}")

        # --- 4. compression round-trip ---
        series = daily.select("source", "period", F.col("n_tok").alias("value"))
        comp = compress_series(series, ["source"], block_size=4096).cache()
        back = decompress_series(comp, ["source"]).withColumnRenamed("value", "rt")
        mismatch = (
            series.join(back, ["source", "period"])
            .filter(~F.col("value").eqNullSafe(F.col("rt")))
            .count()
        )
        blocks = comp.count()
        raw, enc = comp.agg(F.sum("raw_bytes"), F.sum(F.length("blob"))).first()
        print(f"[4] gorilla: {blocks} blocks, {raw}->{enc} bytes "
              f"({raw/enc:.1f}x), {mismatch} round-trip mismatches")
        assert mismatch == 0

        # --- 5. coverage report on the raw intervals ---
        active = merge_intervals(
            tok.select("source", "start_hour", "end_hour"),
            ("start_hour", "end_hour"), ["source"],
        )
        gaps = find_gaps(
            tok.select("source", "start_hour", "end_hour"),
            ("start_hour", "end_hour"), ["source"], span=(0, 365 * 24 - 1),
        )
        print(f"[5] coverage: {active.count()} active intervals, "
              f"{gaps.count()} gaps across sources")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
