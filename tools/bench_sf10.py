"""One-more-decade probe (VERDICT r5 item 8): the design point is a
10^12-sequence store; the tier job has run at 512M synthetic docs, and
the pipeline ops have 10x evidence in BENCH_DETAIL_SF1.json. This tool
adds the 100x point for the cheap-to-scale legs:

- ``tier_rollup`` at 100x the headline's doc count (1M -> 100M docs
  through the same rollup_regular + two cascades the bench times),
- ``duplicate_spans`` and ``dedup_lines`` over a 100-copy documents
  corpus (500k docs; per-copy Caesar rotation like the sf1 harness —
  with only 26 distinct rotations, copies i and i+26 are identical
  text, which is FINE for these two ops: both are count-keyed
  (window-hash counts / line-hash elections), so cross-copy cliques
  grow the per-key counts, never a quadratic pair set; noted in the
  output so the ratios are read correctly).

Output: BENCH_DETAIL_SF10.json with walls at each scale, the 100x
ratio vs the committed sf0.1 walls, the 10x intermediate point pulled
from BENCH_DETAIL_SF1.json (a three-point curve per op), and the same
bracketed steal probes the bench uses.

Usage:
    python tools/bench_sf10.py            # all three legs
    SPARK_GRAFT_SF10_ONLY=dedup_lines python tools/bench_sf10.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF10_DIR = os.environ.setdefault("SPARK_GRAFT_SF10_DIR", "/tmp/sparkgraft_sf10")
COPIES = int(os.environ.get("SPARK_GRAFT_SF10_COPIES", "100"))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from timeperiods_spark import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
ALPHA = "abcdefghijklmnopqrstuvwxyz"
DIGITS = "0123456789"


def _rot(s: str, i: int) -> str:
    i %= len(s)
    return s[i:] + s[:i]


def synthesize_documents(spark) -> None:
    """100 shifted copies of the sf0.1 documents table (same per-copy
    Caesar rotation as tools/bench_sf1.py, v2: digits included)."""
    marker = os.path.join(SF10_DIR, "_SYNTH_OK_V2")
    if os.path.exists(marker):
        return
    os.makedirs(SF10_DIR, exist_ok=True)
    df = spark.read.parquet(f"{SRC}/documents.parquet")
    shift = df.agg(F.max("doc_id")).first()[0] + 1
    parts = []
    for i in range(COPIES):
        part = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * shift))
        if i % 26:
            part = part.withColumn(
                "text",
                F.translate(
                    "text",
                    ALPHA + ALPHA.upper() + DIGITS,
                    _rot(ALPHA, i) + _rot(ALPHA.upper(), i) + _rot(DIGITS, i),
                ),
            )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(bench.CPUS * 2).write.mode("overwrite").parquet(
        f"{SF10_DIR}/documents.parquet"
    )
    with open(marker, "w") as f:
        f.write("ok\n")
    print(f"synthesized documents: {COPIES}x", flush=True)


def w_tier(spark, n_docs: int):
    """Same shape as bench.py's q_tier (hourly sweep rollup + daily and
    weekly cascades, production settings), parameterized by doc count."""
    from timeperiods_spark import cascade, rollup_regular, token_table

    def run():
        tok = token_table(spark, n_docs, partitions=bench.CPUS * 4)
        hourly = rollup_regular(
            tok, ("start_hour", "end_hour"), ("n_tok",), ("source",),
            width=1, partial=True, algorithm="sweep", validate=False,
            group_encoders={"source": F.substring("source", 5, 3).cast("int")},
            group_dim=spark.range(11).selectExpr("concat('src_', id) AS source"),
            carry_hints={"span": (0, 365 * 24 + 64), "groups": 11},
        ).cache()
        pts = hourly.count()
        pts += cascade(hourly, ("n_tok",), ("source",), fine_width=1,
                       coarse_width=24).count()
        pts += cascade(hourly, ("n_tok",), ("source",), fine_width=1,
                       coarse_width=168).count()
        hourly.unpersist()
        return pts

    return run


def w_spans(spark, sf_dir: str):
    def run():
        from timeperiods_spark import duplicate_spans

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return duplicate_spans(docs, "doc_id", "text", k=12,
                               hash_windows=True).count()

    return run


def w_dedup_lines(spark, sf_dir: str):
    def run():
        from timeperiods_spark import dedup_lines

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        broken = docs.select(
            F.col("doc_id"),
            F.regexp_replace(
                F.col("text"), r"((?:\S+\s+){5})", "$1\n"
            ).alias("text"),
        )
        return dedup_lines(broken, "doc_id", "text", hash_lines=True).count()

    return run


def main() -> None:
    spark = get_spark(
        "bench-sf10",
        master=f"local[{bench.CPUS}]",
        shuffle_partitions=bench.CPUS * 2,
        driver_memory="96g",
    )
    t0 = time.time()
    synthesize_documents(spark)
    synth_s = round(time.time() - t0, 1)

    # 10x intermediate points from the committed sf1 detail (3-point
    # curve: sf0.1 -> sf1 -> sf10 per op)
    mid: dict = {}
    sf1_path = os.path.join(REPO, "BENCH_DETAIL_SF1.json")
    if os.path.exists(sf1_path):
        with open(sf1_path) as f:
            mid = json.load(f).get("pipeline_10x", {}) or {}

    n_tier_base = bench.N_DOCS  # the headline tier leg's doc count
    legs = {
        "tier_rollup": (w_tier(spark, n_tier_base),
                        w_tier(spark, n_tier_base * 100)),
        "duplicate_spans": (w_spans(spark, SRC), w_spans(spark, SF10_DIR)),
        "dedup_lines": (w_dedup_lines(spark, SRC),
                        w_dedup_lines(spark, SF10_DIR)),
    }
    only = os.environ.get("SPARK_GRAFT_SF10_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        legs = {k: v for k, v in legs.items() if k in keep}

    thr = bench._probe_threshold(bench.HEAD_CANARY_THREADS)
    out: dict = {
        "scale_factor": 100,
        "copies": COPIES,
        "synth_seconds": synth_s,
        "cpus": bench.CPUS,
        "note": (
            "100-copy corpus has only 26 distinct Caesar rotations, so "
            "copies i and i+26 are identical text — harmless for these "
            "count-keyed ops (window-hash counts / line elections grow "
            "per-key counts, never a pair set); tier runs the bench's "
            "exact q_tier shape at 100x its doc count"
        ),
    }
    for name, (small, large) in legs.items():
        rows_s, wall_s, pr_s = bench._bracketed_call(
            small, bench.HEAD_CANARY_THREADS
        )
        rows_l, wall_l, pr_l = bench._bracketed_call(
            large, bench.HEAD_CANARY_THREADS
        )
        rec = {
            "small_seconds": wall_s,
            "large_seconds": wall_l,
            "ratio_at_100x": round(wall_l / max(wall_s, 1e-9), 2),
            "rows": [rows_s, rows_l],
            "clean": bool(max(pr_s + pr_l) <= thr),
            "probes": [[round(p, 3) for p in pr_s],
                       [round(p, 3) for p in pr_l]],
        }
        m = mid.get(name)
        if isinstance(m, dict) and "large_seconds" in m:
            rec["sf1_10x_seconds"] = m["large_seconds"]
            rec["ratio_10x_to_100x"] = round(
                wall_l / max(m["large_seconds"], 1e-9), 2
            )
        out[name] = rec
        print(json.dumps({name: {k: v for k, v in rec.items()
                                 if k != "probes"}}), flush=True)

    out_path = os.environ.get(
        "SPARK_GRAFT_SF10_OUT", os.path.join(REPO, "BENCH_DETAIL_SF10.json")
    )
    if os.environ.get("SPARK_GRAFT_SF10_MERGE") == "1" and os.path.exists(
        out_path
    ):
        with open(out_path) as f:
            prev = json.load(f)
        prev.update({k: v for k, v in out.items()
                     if k not in ("scale_factor", "copies", "cpus", "note")
                     or k not in prev})
        out = prev
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(json.dumps({"done": True, "out": out_path}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
