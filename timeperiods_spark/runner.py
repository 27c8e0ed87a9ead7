"""Checkpoint-resumable job runner with per-unit lineage + metrics.

The north rule requires jobs that are "resumable from checkpoint with
per-partition lineage and metrics". Unit of work = whatever the caller
shards on (a doc_id range, a (tier, period-bucket) pair, …). Each
completed unit writes ``<manifest_dir>/units/<unit_id>.json`` with its
metrics; a restarted job skips completed units by listing that
directory — no coordinator state beyond the filesystem, so the
manifest works unchanged on HDFS/S3-style storage (rename-free: one
file per unit, written once).
"""

from __future__ import annotations

import json
import os
import re
import time
from dataclasses import dataclass
from typing import Any, Callable, Optional


def _safe(unit_id: str) -> str:
    return re.sub(r"[^A-Za-z0-9._-]", "_", unit_id)


@dataclass
class ResumableJob:
    manifest_dir: str

    def __post_init__(self) -> None:
        os.makedirs(os.path.join(self.manifest_dir, "units"), exist_ok=True)

    # ------------------------------------------------------------ state
    def _unit_path(self, unit_id: str) -> str:
        return os.path.join(self.manifest_dir, "units", _safe(unit_id) + ".json")

    def completed_units(self) -> set[str]:
        d = os.path.join(self.manifest_dir, "units")
        out = set()
        for f in os.listdir(d):
            if f.endswith(".json"):
                try:
                    with open(os.path.join(d, f)) as fh:
                        out.add(json.load(fh)["unit_id"])
                except (json.JSONDecodeError, KeyError):
                    continue  # torn write from a killed run → unit re-runs
        return out

    def is_done(self, unit_id: str) -> bool:
        p = self._unit_path(unit_id)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as fh:
                return json.load(fh)["unit_id"] == unit_id
        except (json.JSONDecodeError, KeyError):
            return False

    # -------------------------------------------------------------- run
    def run_unit(
        self,
        unit_id: str,
        fn: Callable[[], Optional[dict[str, Any]]],
        *,
        force: bool = False,
    ) -> dict[str, Any]:
        """Execute ``fn`` unless the unit already completed. ``fn`` may
        return a metrics dict; wall-clock seconds are always recorded.
        The lineage record is written AFTER fn succeeds — a crash
        mid-unit leaves no record and the unit re-runs (fn must be
        idempotent, which additive-partial upserts into partition
        overwrites are)."""
        if not force and self.is_done(unit_id):
            with open(self._unit_path(unit_id)) as fh:
                rec = json.load(fh)
            rec["skipped"] = True
            return rec
        t0 = time.time()
        metrics = fn() or {}
        rec = {
            "unit_id": unit_id,
            "seconds": round(time.time() - t0, 3),
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "metrics": metrics,
            "skipped": False,
        }
        tmp = self._unit_path(unit_id) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, self._unit_path(unit_id))
        return rec

    def summary(self) -> dict[str, Any]:
        d = os.path.join(self.manifest_dir, "units")
        recs = []
        for f in sorted(os.listdir(d)):
            if f.endswith(".json"):
                with open(os.path.join(d, f)) as fh:
                    recs.append(json.load(fh))
        return {
            "units": len(recs),
            "seconds_total": round(sum(r.get("seconds", 0) for r in recs), 3),
            "records": recs,
        }
