"""Managed cache lifecycle for operator intermediates.

Several operators persist an intermediate frame that is consumed more
than once downstream (the as-of union frame, the overlap melt, the
interval-algebra delta frame, the dedup shingle/batch frames). A bare
``.persist()`` there leaks in long-lived sessions: nothing ever
unpersists, and repeated operator calls grow the storage pool without
bound (VERDICT r3 item 6).

This module is the single place that owns those intermediates. Each
persist site registers under a stable tag; re-registering a tag
unpersists the PREVIOUS frame first, so repeated calls of the same
operator hold at most one cached intermediate each — the storage pool
is bounded by the number of distinct operator call-sites, not the
number of calls. ``release()`` drops everything (or one tag) eagerly,
e.g. at the end of a pipeline stage.

Contract notes:
- Unpersisting a frame a still-lazy earlier RESULT depends on is
  correctness-safe (Spark recomputes); only the caching benefit for
  that stale result is lost. Callers that materialize results promptly
  (the normal shape) never notice.
- ``blocking=False``: unpersist is async cleanup, never a barrier.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_REGISTRY: Dict[str, DataFrame] = {}


def managed_persist(
    df: DataFrame,
    tag: str,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``df`` under ``tag``, unpersisting whatever frame the
    tag previously held. Returns the persisted frame."""
    prev = _REGISTRY.pop(tag, None)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass  # session gone / already unpersisted — nothing to hold
    out = df.persist(storage_level)
    _REGISTRY[tag] = out
    return out


def release(tag: Optional[str] = None) -> int:
    """Unpersist managed intermediates — one tag, or all when ``tag``
    is None. Returns the number of frames released."""
    tags = [tag] if tag is not None else list(_REGISTRY)
    n = 0
    for t in tags:
        df = _REGISTRY.pop(t, None)
        if df is not None:
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass
            n += 1
    return n


def managed_tags() -> List[str]:
    """Currently-held tags (for tests / introspection)."""
    return sorted(_REGISTRY)
