"""One-shot sf1.0 headline bench (VERDICT r3 item 9).

The driver only ships sf0.1 parquet; this tool deterministically
synthesizes a 10x corpus (/tmp, never under /root/testdata) and runs
the SAME headline queries bench.py runs, recording per-query walls and
the sf1.0/sf0.1 ratio so superlinear fan-out constants show up one
order of magnitude closer to the design point.

Synthesis = 10 shifted copies of each sf0.1 table with remapped keys.
documents.text additionally gets a per-copy Caesar rotation
(``translate`` over both alphabets), so copies are NOT near-duplicates
of each other: every base doc would otherwise become a 10-clique and
the minhash pair count would scale ~100x for 10x rows — a property of
that artificial corpus, not of the operator. Rotation keeps the
per-copy near-dup density identical to sf0.1 → honest linear scaling.

Run:  python tools/bench_sf1.py            (~tens of minutes)
Out:  BENCH_DETAIL_SF1.json at the repo root + one summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1_DIR = os.environ.setdefault("SPARK_GRAFT_SF1_DIR", "/tmp/sparkgraft_sf1")
COPIES = int(os.environ.get("SPARK_GRAFT_SF1_COPIES", "10"))

# bench.py reads these at import time — set before importing
os.environ["SPARK_GRAFT_SF_DIR"] = SF1_DIR
os.environ.setdefault("SPARK_GRAFT_BENCH_DOCS", str(10_000_000))
os.environ.setdefault("SPARK_GRAFT_BENCH_REPS", "2")

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from timeperiods_spark import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
ALPHA = "abcdefghijklmnopqrstuvwxyz"
DIGITS = "0123456789"


def _rot(s: str, i: int) -> str:
    return s[i % len(s):] + s[: i % len(s)]


def synthesize(spark) -> None:
    # v2: rotation also covers digits — leaving numbers unrotated made
    # numeric shingles identical across copies, creating hot cross-copy
    # LSH buckets (measured 113x candidate pairs at 10x docs: a data-
    # construction artifact, not operator behavior)
    marker = os.path.join(SF1_DIR, "_SYNTH_OK_V2")
    if os.path.exists(marker):
        return
    os.makedirs(SF1_DIR, exist_ok=True)
    specs = {
        # table -> (key shift columns, per-copy extra transform)
        "orders": (["o_orderkey", "o_custkey"], None),
        "events": (["event_id", "user_id"], None),
        "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], None),
        "documents": (["doc_id"], "rotate_text"),
    }
    for name, (keys, xform) in specs.items():
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        row = df.agg(*[F.max(k).alias(k) for k in keys]).first()
        if any(row[k] is None for k in keys):
            raise ValueError(f"{name}: empty source or all-NULL key column")
        shifts = {k: row[k] + 1 for k in keys}
        parts = []
        for i in range(COPIES):
            part = df
            for k, m in shifts.items():
                part = part.withColumn(k, F.col(k) + F.lit(i * m))
            if xform == "rotate_text" and i > 0:
                part = part.withColumn(
                    "text",
                    F.translate(
                        "text",
                        ALPHA + ALPHA.upper() + DIGITS,
                        _rot(ALPHA, i) + _rot(ALPHA.upper(), i)
                        + _rot(DIGITS, i),
                    ),
                )
            parts.append(part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(bench.CPUS * 2).write.mode("overwrite").parquet(
            f"{SF1_DIR}/{name}.parquet"
        )
        print(f"synthesized {name}: {COPIES}x", flush=True)
    with open(marker, "w") as f:
        f.write("ok\n")


def main() -> None:
    spark = get_spark(
        "bench-sf1",
        master=f"local[{bench.CPUS}]",
        shuffle_partitions=bench.CPUS * 2,
        driver_memory="96g",
    )
    t0 = time.time()
    synthesize(spark)
    synth_s = round(time.time() - t0, 1)

    t0 = time.time()
    times, extras = bench.bench_queries(spark)
    total = round(sum(times.values()), 3)

    # sf0.1 best reference from the committed BENCH_DETAIL.json
    # (headline_extras carries per-rep walls as <q>_all_seconds)
    ref = {}
    ref_path = os.path.join(REPO, "BENCH_DETAIL.json")
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            he = json.load(f).get("headline_extras", {})
        ref = {
            k[: -len("_all_seconds")]: min(v)
            for k, v in he.items()
            if k.endswith("_all_seconds") and isinstance(v, list) and v
        }
    ratios = {
        q: round(times[q] / ref[q], 2)
        for q in times
        if isinstance(ref.get(q), (int, float)) and ref[q] > 0
    }

    out = {
        "sf": 1.0,
        "copies": COPIES,
        "synth_seconds": synth_s,
        "cpus": bench.CPUS,
        "n_docs_tier": bench.N_DOCS,
        "total_seconds": total,
        "queries": {q: round(t, 3) for q, t in times.items()},
        "sf01_reference": ref,
        "ratio_vs_sf01": ratios,
        "wall_seconds": round(time.time() - t0, 1),
        "extras": {
            k: v
            for k, v in extras.items()
            if not k.endswith("_bracket_probes")
        },
    }
    with open(os.path.join(REPO, "BENCH_DETAIL_SF1.json"), "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(json.dumps({
        "metric": "sf1_headline_seconds",
        "value": total,
        "unit": "sec",
        "queries": out["queries"],
        "ratio_vs_sf01": ratios,
        "sf": 1.0,
    }))


if __name__ == "__main__":
    main()
