"""Quiet-window hunter for clean HEADLINE reps (r4 verdict item 3).

r4 shipped six headline values with every `<q>_clean` flag false: both
blind reps of each query landed inside co-tenant steal bursts, so
regression-vs-noise for `remove_overlaps`/`minhash_dedup` stayed
undecidable. This tool runs for hours in the background with ONE warm
local[N] session: it probes the 4-thread steal canary cheaply and only
when the host reads quiet does it spend a full measured pass (the same
query closures and `_bracketed_call` probes `bench.bench_queries`
uses). Per-pass walls accumulate in a JSONL state file;
`bench.bench_queries` merges them (source-labeled, timestamped,
sha-stamped) into its rep pool so the driver's own BENCH artifact can
finally carry a clean rep.

Honesty contract: a merged rep is only as comparable as the query code
is unchanged between record time and bench time — every record carries
the repo HEAD sha and a dirty-tree flag so the provenance is
auditable. TRUNCATE the state file after changing any measured
operator. Walls here come from a session whose JIT is warm (one
unrecorded warmup pass at startup), matching the bench's
min-of-interleaved-reps steady-state framing; steal can only inflate a
wall, so a background rep can never flatter the result — it can only
replace a steal-inflated number with a quieter, still-conservative one.

Coordination protocol (shared with tools/scale_hunt.py): skips the
cycle while /tmp/spark_graft_busy or /tmp/spark_graft_leg_running
exists; holds /tmp/spark_graft_busy itself during a measured pass so
the scale hunter never starts a leg beside it.

Usage:
    python tools/headline_hunt.py --hours 3 --state /tmp/headline_hunt.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from timeperiods_spark.session import get_spark  # noqa: E402

BUSY_FLAG = "/tmp/spark_graft_busy"
LEG_FLAG = "/tmp/spark_graft_leg_running"


def _sha() -> str:
    # shared with the bench merge gate so a recorded sha and the gate's
    # _code_current comparison can never drift apart
    return bench._sha_label()


def _quiet_now(width: int, need: int = 2) -> bool:
    thr = bench._probe_threshold(width)
    # warm burn, unjudged: the FIRST probe after a long idle sleep pays
    # the CPU frequency ramp + cold caches and reads ~0.4s on a genuinely
    # quiet host — judging it made the hunter miss every 45s cycle once
    # the machine had nothing else keeping the clocks up
    bench._cpu_probe(width)
    for _ in range(need):
        if bench._cpu_probe(width) > thr:
            return False
        time.sleep(1.0)
    return True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=3.0)
    ap.add_argument("--state", default="/tmp/headline_hunt.jsonl")
    ap.add_argument("--probe-every", type=float, default=45.0)
    ap.add_argument("--max-passes", type=int, default=30)
    args = ap.parse_args()

    sha = _sha()
    spark = get_spark("timeperiods-headline-hunt",
                      master=f"local[{bench.CPUS}]")
    state: dict = {}
    extras: dict = {}
    queries = bench._build_queries(spark, state, extras)

    def one_pass(record: bool) -> dict | None:
        walls: dict = {}
        for name, fn in queries:
            _, wall, brackets = bench._bracketed_call(
                fn, bench.HEAD_CANARY_THREADS
            )
            walls[name] = {"wall": wall,
                           "brackets": [round(b, 3) for b in brackets]}
        cleanup = state.pop("cleanup", None)
        if cleanup:
            cleanup()
        if not record:
            return None
        return {
            "t": round(time.time(), 1),
            "sha": sha,
            "sf_dir": bench.SF_DIR,
            "cpus": bench.CPUS,
            "queries": walls,
        }

    print(json.dumps({"warmup": True, "sha": sha}), flush=True)
    one_pass(record=False)  # JVM/JIT warmup, unrecorded

    deadline = time.time() + args.hours * 3600
    n_recorded = 0
    n_probe = 0
    while time.time() < deadline and n_recorded < args.max_passes:
        if (
            os.path.exists(BUSY_FLAG)
            or os.path.exists(LEG_FLAG)
            or os.path.exists(bench.BENCH_FLAG)
        ):
            time.sleep(args.probe_every)
            continue
        if _quiet_now(bench.HEAD_CANARY_THREADS):
            try:
                with open(BUSY_FLAG, "w") as f:
                    f.write(f"headline_hunt:{os.getpid()}")
                rec = one_pass(record=True)
            finally:
                try:
                    os.remove(BUSY_FLAG)
                except OSError:
                    pass
            with open(args.state, "a") as f:
                f.write(json.dumps(rec) + "\n")
            n_recorded += 1
            clean = {
                n: max(v["brackets"])
                <= bench._probe_threshold(bench.HEAD_CANARY_THREADS)
                for n, v in rec["queries"].items()
            }
            print(json.dumps({
                "t": rec["t"],
                "walls": {n: v["wall"] for n, v in rec["queries"].items()},
                "clean": clean,
            }), flush=True)
            # after a recorded pass, back off: one pass per quiet window
            # is enough and the pass itself perturbs the canary
            time.sleep(args.probe_every)
        else:
            n_probe += 1
            if n_probe % 10 == 0:
                print(json.dumps({
                    "t": round(time.time(), 1),
                    "probe4": [round(bench._cpu_probe(4), 3)
                               for _ in range(3)],
                }), flush=True)
            time.sleep(args.probe_every)
    spark.stop()
    print(json.dumps({"done": True, "passes": n_recorded}), flush=True)


if __name__ == "__main__":
    main()
