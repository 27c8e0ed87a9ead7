"""Grouped cartesian product of N DataFrames.

Reimplements ``CJ.dt`` (/root/reference/timeperiod_functions.R:19-49):
the per-group cartesian product of any number of tables, keeping only
group combinations present in every input (inner semantics,
timeperiod_functions.R:46). In Spark an equi join on the group keys IS
a per-group cartesian product, so with groups this is a chain of inner
joins (null-safe — NA group keys match, as in data.table keyed merges)
and without groups a chain of ``crossJoin``.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from ..errors import RoleValidationError, TimeperiodsError


def grouped_cartesian(
    dfs: Sequence[DataFrame],
    groups: Optional[Sequence[str]] = None,
    *,
    check_nonempty: bool = False,
    auto_rename: bool = True,
) -> DataFrame:
    """Cartesian-expand ``dfs`` within each group combination.

    Colliding non-group column names in later inputs are auto-renamed
    with an ``i_`` prefix, repeated until unused — mirroring the
    reference's ``i.``-prefix gensym (create_unused_name,
    timeperiod_functions.R:5-12, applied at :33). Spark column names
    with dots need backtick quoting everywhere, hence ``i_`` instead of
    ``i.`` (same documented deviation as remove_overlaps' ``o_``).
    Pass ``auto_rename=False`` to make collisions a hard error instead.

    ``check_nonempty=True`` reproduces the reference's eager
    "one or more data.tables have no rows" error
    (timeperiod_functions.R:22) at the cost of one action per input.
    """
    dfs = list(dfs)
    if len(dfs) < 2:
        raise RoleValidationError("grouped_cartesian needs at least two DataFrames")
    groups = list(groups or [])
    seen: set[str] = set()
    renamed_dfs: list[DataFrame] = []
    for i, df in enumerate(dfs):
        missing = [g for g in groups if g not in df.columns]
        if missing:
            raise RoleValidationError(f"group columns {missing} missing from input {i}")
        out = df
        # the gensym must also dodge the df's OWN other columns: renaming
        # a colliding 'v' to 'i_v' when this df already has an 'i_v'
        # would produce duplicate column names (r2 advice finding)
        own = set(df.columns)
        for c in df.columns:
            if c in groups:
                continue
            name = c
            while name in seen or (name != c and name in own):
                if not auto_rename:
                    raise RoleValidationError(
                        f"non-group column {c!r} appears in multiple inputs; "
                        "rename to disambiguate (or leave auto_rename=True)"
                    )
                name = f"i_{name}"
            if name != c:
                out = out.withColumnRenamed(c, name)
            seen.add(name)
        renamed_dfs.append(out)
    dfs = renamed_dfs
    if check_nonempty:
        for i, df in enumerate(dfs):
            if df.limit(1).count() == 0:
                raise TimeperiodsError(f"input {i} has no rows")

    if not groups:
        return reduce(lambda a, b: a.crossJoin(b), dfs)

    def join_pair(acc: DataFrame, nxt: DataFrame) -> DataFrame:
        right = nxt
        renames = {g: f"__r_{g}" for g in groups}
        for g, rg in renames.items():
            right = right.withColumnRenamed(g, rg)
        cond = None
        for g, rg in renames.items():
            c = F.col(g).eqNullSafe(F.col(rg))
            cond = c if cond is None else (cond & c)
        return acc.join(right, cond, "inner").drop(*renames.values())

    return reduce(join_pair, dfs)
