"""Epoch lifecycle for the persisted streaming dedup indexes.

``stream_dedup_ingest`` writes every micro-batch's index rows under an
``__epoch=<id>`` directory (replay-idempotent: a crash-replayed epoch
overwrites its own files). Without maintenance those directories
accumulate forever — after a year of nightly batches every index read
is a listing over ~365 directories and the file count grows without
bound (VERDICT r4 finding 3). This module adds the same
manifest + atomic-swap compaction the tier catalog uses
(``sources/catalog.py``: compact/vacuum), adapted to the epoch model:

- ``_epochs.json`` in each index root is the LIVE SET: the list of
  directories a reader loads, plus ``compacted_through`` — the highest
  epoch id folded into a base. Readers never list the filesystem when
  a manifest exists, so a half-written replay directory is invisible
  until its commit point (the manifest add).
- ``compact_index`` folds every live directory holding epochs ≤ a
  caller-supplied watermark into one ``__base<gen>`` directory, then
  swaps the manifest atomically (``os.replace``). Concurrent readers
  keep the old snapshot; ``remove_old=False`` defers the vacuum for
  long-running readers (same contract as the catalog).
- Replay of a COMPACTED epoch is a no-op: ``register_epoch`` refuses
  epochs ≤ ``compacted_through`` (their rows already live in the
  base), so the replayed directory is never added back to the live
  set — ``dedup_ingest_epoch`` checks this first and skips the whole
  batch. The caller must only compact through the last CHECKPOINTED
  epoch: Structured Streaming never replays epochs at or before the
  checkpoint commit, which is what makes the ≤-watermark skip safe.

At 100 TB the same layout holds on object storage: the manifest is the
snapshot pointer (Iceberg's metadata.json), ``__base<gen>`` is
rewriteDataFiles output, vacuum is expire_snapshots.
"""

from __future__ import annotations

import fcntl
import json
import os
import re
import shutil
from contextlib import contextmanager
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

EPOCH_PREFIX = "__epoch="
BASE_PREFIX = "__base"
MANIFEST = "_epochs.json"

#: sub-indexes a minhash dedup index root holds (each gets its own
#: manifest — they are written together but read independently)
SUB_INDEXES = ("bands", "shingles")


def _manifest_path(root: str) -> str:
    return os.path.join(root, MANIFEST)


@contextmanager
def _manifest_lock(root: str):
    """Serialize manifest writers. ``register_epoch`` (ingest thread)
    and ``compact_root`` (maintenance) both read-modify-write
    ``_epochs.json``; unserialized, a stale register write can drop a
    just-swapped ``__base`` from the live set and resurrect folded
    epoch dirs the vacuum already deleted (ADVICE r5). An exclusive
    ``flock`` on a sidecar lock file makes every writer see the
    latest manifest; readers stay lock-free (the swap itself is
    already atomic via ``os.replace``). On object storage the same
    role is played by the catalog's conditional-put / CAS on the
    snapshot pointer."""
    os.makedirs(root, exist_ok=True)
    with open(_manifest_path(root) + ".lock", "w") as f:
        fcntl.flock(f, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)


def _present_dirs(root: str) -> List[str]:
    """Data directories on disk (legacy layout discovery): epoch dirs
    and base dirs, nothing else."""
    if not os.path.isdir(root):
        return []
    return sorted(
        d
        for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d))
        and (d.startswith(EPOCH_PREFIX) or d.startswith(BASE_PREFIX))
    )


#: sidecar marker naming a base dir whose compact_root merge is still
#: in flight (dir on disk, manifest swap not yet run)
PENDING_PREFIX = "__pending."


def _pending_marker(root: str, base_name: str) -> str:
    return os.path.join(root, PENDING_PREFIX + base_name)


def _pending_bases(root: str) -> set:
    """Base names reserved by an in-flight compact_root (ADVICE r6):
    the name is chosen and the empty dir + this marker created under
    the manifest lock, but the expensive merge write runs outside it —
    without the marker a concurrent vacuum_root would see a non-live
    base dir and rmtree the merge out from under the swap. A marker
    left by a CRASHED compactor shields one dead dir until the next
    successful compact_root of the same root completes (its vacuum
    drops markers whose base became live; an orphaned never-swapped
    base stays until manual cleanup — the safe direction)."""
    if not os.path.isdir(root):
        return set()
    return {
        f[len(PENDING_PREFIX):]
        for f in os.listdir(root)
        if f.startswith(PENDING_PREFIX)
        and os.path.isfile(os.path.join(root, f))
    }


def _epoch_id(name: str) -> Optional[int]:
    """Numeric epoch id of a live-set entry, None for base dirs."""
    if not name.startswith(EPOCH_PREFIX):
        return None
    try:
        return int(name[len(EPOCH_PREFIX):])
    except ValueError:
        return None


def read_manifest(root: str) -> Tuple[Optional[List[str]], int]:
    """(live directory names, compacted_through). live=None means no
    manifest yet — legacy layout; callers fall back to discovery."""
    p = _manifest_path(root)
    if not os.path.exists(p):
        return None, -1
    with open(p) as f:
        m = json.load(f)
    return list(m["live"]), int(m.get("compacted_through", -1))


def _write_manifest(root: str, live: List[str], compacted_through: int) -> None:
    """Atomic snapshot swap — readers see the old or the new live set,
    never a partial one."""
    os.makedirs(root, exist_ok=True)
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"live": sorted(live), "compacted_through": int(compacted_through)},
            f,
        )
    os.replace(tmp, _manifest_path(root))


def live_dirs(root: str) -> List[str]:
    """The directories a reader loads: manifest live set, or (legacy,
    pre-manifest layout) every epoch/base dir present — minus any base
    a concurrent first-compaction is still writing (pending marker)."""
    live, _ = read_manifest(root)
    if live is not None:
        return live
    pend = _pending_bases(root)
    return [d for d in _present_dirs(root) if d not in pend]


def compacted_through(root: str) -> int:
    return read_manifest(root)[1]


def register_epoch(root: str, epoch_id: int) -> bool:
    """Commit an epoch directory into the live set AFTER its data files
    land. Returns False (and changes nothing) when the epoch is already
    compacted into a base — the replay-no-op guard. Idempotent: re-adds
    of a live epoch are silent. The read-modify-write runs under the
    manifest lock so a concurrent compaction swap is never clobbered."""
    with _manifest_lock(root):
        live, ct = read_manifest(root)
        if epoch_id <= ct:
            return False
        if live is None:
            # first manifest: adopt everything already on disk (legacy
            # dirs written before this module existed stay visible) —
            # except a base a concurrent compact_root is still writing
            pend = _pending_bases(root)
            live = [d for d in _present_dirs(root) if d not in pend]
        name = f"{EPOCH_PREFIX}{int(epoch_id)}"
        if name not in live:
            live = live + [name]
        _write_manifest(root, live, ct)
        return True


def read_live(spark: SparkSession, root: str) -> Optional[DataFrame]:
    """Union of the live directories, read as explicit leaf paths — no
    partition discovery, so a stale replayed ``__epoch=`` dir outside
    the manifest is invisible and no ``__epoch`` column appears.
    Returns None for an empty/absent index."""
    dirs = live_dirs(root)
    if not dirs:
        return None
    return spark.read.parquet(*(os.path.join(root, d) for d in dirs))


def _next_base_name(root: str) -> str:
    gen = 1 + max(
        (
            int(m.group(1) or 0)
            for m in (
                re.match(re.escape(BASE_PREFIX) + r"(\d*)$", d)
                for d in _present_dirs(root)
            )
            if m
        ),
        default=-1,
    )
    return f"{BASE_PREFIX}{gen}"


def compact_root(
    spark: SparkSession,
    root: str,
    *,
    through_epoch: int,
    remove_old: bool = True,
) -> Optional[str]:
    """Fold every live directory whose content is ≤ ``through_epoch``
    (numbered epochs ≤ the watermark, plus every earlier base) into one
    new ``__base<gen>`` directory; atomically swap the manifest to
    [new base] + tail epochs. Returns the base name, or None when
    nothing qualifies.

    ``through_epoch`` MUST be ≤ the streaming checkpoint's last
    committed epoch — that is what guarantees no future replay targets
    a folded epoch (see module docstring).

    Safe to run WHILE the stream commits epochs: the fold set is chosen
    and the final swap performed under the manifest lock, and the swap
    re-reads the manifest so epochs registered during the (long) base
    write are preserved in the new live set. Also safe against a
    CONCURRENT compact_root or vacuum_root (ADVICE r6): the base name
    is reserved on disk under the lock (no two compactors share a dir),
    a ``__pending.`` marker shields the in-flight base from vacuum
    until the swap, and a compactor whose fold set was swapped away by
    a faster peer abandons its base (returns None) instead of
    publishing duplicate rows."""
    with _manifest_lock(root):
        live = live_dirs(root)
        _, ct = read_manifest(root)
        fold = [
            d
            for d in live
            if d.startswith(BASE_PREFIX)
            or (_epoch_id(d) is not None and _epoch_id(d) <= through_epoch)
        ]
        if len(fold) < 2 and not (
            len(fold) == 1 and fold[0].startswith(EPOCH_PREFIX)
        ):
            # nothing to merge: zero or one dir and it is already a base
            return None
        base_name = _next_base_name(root)
        # reserve the name UNDER the lock (ADVICE r6): the empty dir
        # makes a concurrent compactor's _next_base_name scan skip it,
        # and the pending marker makes vacuum_root spare it while the
        # merge below runs outside the lock
        os.makedirs(os.path.join(root, base_name), exist_ok=True)
        with open(_pending_marker(root, base_name), "w"):
            pass
    lost_race = False
    try:
        # the expensive merge runs OUTSIDE the lock — ingest keeps
        # committing; the fold set is frozen (folded dirs are immutable)
        merged = spark.read.parquet(*(os.path.join(root, d) for d in fold))
        # sever lineage before writing into the tree we just read from
        # (catalog.compact's overwrite-while-reading pattern)
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(os.path.join(root, base_name))
        with _manifest_lock(root):
            # re-read-and-merge: keep every dir registered since the plan
            now_live, now_ct = read_manifest(root)
            if now_live is None:
                pend = _pending_bases(root)
                now_live = [
                    d for d in _present_dirs(root) if d not in pend
                ]
            if any(d not in now_live for d in fold):
                # a concurrent compact_root already folded (part of) our
                # fold set and swapped its base in — publishing ours too
                # would duplicate those rows in the live set. Keep the
                # winner's manifest; our base is reclaimed below.
                lost_race = True
            else:
                tail = [
                    d for d in now_live if d not in fold and d != base_name
                ]
                _write_manifest(
                    root, [base_name] + tail, max(through_epoch, now_ct)
                )
    finally:
        # after the swap the base is live (vacuum keeps it); after a
        # failed merge the marker's removal lets vacuum reclaim the junk
        try:
            os.remove(_pending_marker(root, base_name))
        except FileNotFoundError:
            pass
    if lost_race:
        shutil.rmtree(os.path.join(root, base_name), ignore_errors=True)
        return None
    if remove_old:
        vacuum_root(root)
    return base_name


def vacuum_root(root: str) -> List[str]:
    """Delete epoch/base dirs outside the live manifest (dead after a
    compaction swap, or stale replays of compacted epochs). Safe to
    defer for long-running readers.

    Epoch dirs are only reclaimed when their id is ≤
    ``compacted_through``: an id ABOVE the watermark that is not (yet)
    live is an in-flight micro-batch whose data files landed but whose
    ``register_epoch`` commit has not run — deleting it would race the
    ingest thread. Non-live base dirs are dead UNLESS a
    ``__pending.<base>`` marker names them (ADVICE r6): that is a
    concurrent ``compact_root`` mid-merge, between its reservation and
    its manifest swap — deleting it would publish a manifest pointing
    at a vanished directory. Generation names are never reused while
    the dir (or its marker) exists."""
    live, ct = read_manifest(root)
    if live is None:
        return []
    keep = set(live)
    pending = _pending_bases(root)
    dropped = []
    for d in _present_dirs(root):
        if d in keep:
            continue
        if d in pending:
            continue  # in-flight compact_root base: not ours to delete
        eid = _epoch_id(d)
        if eid is not None and eid > ct:
            continue  # uncommitted in-flight epoch: not ours to delete
        shutil.rmtree(os.path.join(root, d))
        dropped.append(d)
    for b in pending & keep:
        # compactor crashed between swap and marker removal: the base
        # is live, the marker is stale — drop it (idempotent vs the
        # compactor's own finally-removal)
        try:
            os.remove(_pending_marker(root, b))
        except FileNotFoundError:
            pass
    return dropped


def compact_index(
    spark: SparkSession,
    index_dir: str,
    *,
    through_epoch: int,
    remove_old: bool = True,
) -> Dict[str, Optional[str]]:
    """Compact every sub-index of a minhash dedup index root
    (``bands`` and ``shingles``) through the given checkpointed epoch.
    Returns {sub_index: new base name or None}."""
    return {
        sub: compact_root(
            spark,
            os.path.join(index_dir, sub),
            through_epoch=through_epoch,
            remove_old=remove_old,
        )
        for sub in SUB_INDEXES
    }
