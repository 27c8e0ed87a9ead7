"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; signed-random-
projection (SRP) LSH bucketing as the scale path. Dot products run as
native ``aggregate(zip_with(...))`` column expressions — JVM-side,
no Python. Plane coefficients are deterministic integer arithmetic so
the DuckDB oracle reproduces buckets bit-identically.

Scale design:
- Brute force is |Q| x |C| scoring — only viable with a broadcast
  query set. Ranking does NOT shuffle the scored pairs: each task
  pre-reduces its partition to the top-k per query (an Arrow-batched
  bounded selection), so the final rank exchange carries
  |Q| x k x partitions rows instead of |Q| x |C|.
- SRP buckets turn scoring into an equi join on bucket id; recall is
  tuned by n_planes (fewer planes = bigger buckets = higher recall,
  more compute). Plane vectors are ARRAY LITERALS (constant-folded to
  one literal each) and the per-plane dot is aggregate(zip_with(...)),
  so the plan size is O(n_planes), independent of dim — an unrolled
  element_at sum at dim=1024, n_planes=16 would be a 16k-node plan
  that breaks codegen. Multi-probe (``probes=``, flipping sign bits to
  visit neighboring buckets) is implemented in ``srp_probe_buckets``
  below — the fan-out is on the broadcast query side only.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (NULL when
    either norm is zero).

    NOTE for hot paths: this single-expression form evaluates each
    norm twice (the guard and the value) and re-derives both norms per
    PAIR — Catalyst's subexpression elimination skips lambda-bearing
    aggregates, so nothing is shared. The batch operators below instead
    attach each side's norm once per ROW and combine with
    :func:`_cosine_pre`, cutting a k-NN scoring projection from five
    array passes per pair to one. Same expressions, same float
    evaluation order, bit-identical results."""
    return _dot(a, b) / F.when(_norm(a) * _norm(b) > 0, _norm(a) * _norm(b))


def _cosine_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine from precomputed norms: one _dot pass per pair, two
    scalar multiplies. ``na``/``nb`` must be ``_norm`` of ``a``/``b``
    in the SAME order so the product na*nb reproduces the public
    :func:`cosine`'s norm(a)*norm(b) float product exactly."""
    return _dot(a, b) / F.when(na * nb > 0, na * nb)


def _ranked_topk(scored: DataFrame, k: int, partial_topk: bool) -> DataFrame:
    """rank per query_id with an optional per-partition pre-top-k.

    The naive formulation is one global row_number window — an exchange
    of EVERY scored pair by query_id. With ``partial_topk`` each task
    first reduces its own rows to the k best per query (sorted by the
    same total order the final rank uses, so the reduction is exact:
    any row outside a partition's local top-k cannot be in the global
    top-k). Arrow-batched; bounded output of |Q| x k per batch.
    """
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    reduced = scored
    if partial_topk:

        def local_topk(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                yield (
                    pdf.sort_values(
                        ["query_id", "cosine", "vec_id"],
                        ascending=[True, False, True],
                    )
                    .groupby("query_id", sort=False)
                    .head(k)
                )

        reduced = scored.mapInPandas(local_topk, scored.schema)

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        reduced.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    partial_topk: bool = True,
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query set against
    the corpus, rank per query. Columns: query_id, vec_id, cosine, rank."""
    from ..functions.grid import spread_input

    c = spread_input(corpus).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).withColumn("__cn", _norm(F.col("__cv")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumn("__qn", _norm(F.col("__qv")))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        _cosine_pre(
            F.col("__cv"), F.col("__qv"), F.col("__cn"), F.col("__qn")
        ).alias("cosine"),
    )
    return _ranked_topk(scored, k, partial_topk)


def _srp_coeff(p: int, i: int) -> int:
    return (p * 10007 + i * 131) % 997 - 498


def srp_bucket(vec: Column, dim: int, n_planes: int) -> Column:
    """Signed-random-projection bucket id from deterministic integer
    planes: plane_p[i] = ((p*10007 + i*131) % 997) - 498 — portable to
    ANSI SQL verbatim (see srp_bucket_sql).

    Each plane is ONE array literal (Catalyst constant-folds the
    CreateArray of literals) and its dot product one
    aggregate(zip_with(...)) — plan size O(n_planes), not O(dim x
    n_planes)."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        # F.lit(list) builds ONE ArrayType Literal node directly —
        # cheaper to analyze than a dim-child CreateArray that constant
        # folding must collapse
        plane = F.lit([float(_srp_coeff(p, i)) for i in range(dim)])
        dot = _dot(vec, plane)
        bucket = bucket + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def srp_bucket_sql(vec_expr: str, dim: int, n_planes: int) -> str:
    parts = []
    for p in range(n_planes):
        plane = ", ".join(
            f"{_srp_coeff(p, i)}.0" for i in range(dim)
        )
        parts.append(
            f"(CASE WHEN list_dot_product({vec_expr}, [{plane}]) >= 0 "
            f"THEN {1 << p} ELSE 0 END)"
        )
    return "(" + " + ".join(parts) + ")::BIGINT"


def srp_probe_buckets(bucket: Column, n_planes: int, probes: int = 1) -> Column:
    """Multi-probe bucket set: the row's own SRP bucket plus every
    bucket within hamming distance ``probes`` (all plane-bit flips up
    to that depth). Flipping the least-confident planes first is the
    classic refinement; flipping ALL combinations is the deterministic
    superset of it, which keeps the DuckDB oracle exact. probes=0 →
    just the own bucket; the fan-out is 1 + C(n,1) + … + C(n,probes)
    per QUERY row (the broadcast side), never on the corpus."""
    if probes not in (0, 1, 2):
        raise ValueError("probes must be 0, 1 (single-bit), or 2 (two-bit flips)")
    masks = _probe_masks(n_planes, probes)
    return F.array(*[bucket.bitwiseXOR(F.lit(m)) for m in masks])


def _probe_masks(n_planes: int, probes: int) -> list[int]:
    masks = [0]
    if probes >= 1:
        masks += [1 << p for p in range(n_planes)]
    if probes >= 2:
        masks += [
            (1 << p) | (1 << q)
            for p in range(n_planes)
            for q in range(p + 1, n_planes)
        ]
    return masks


def srp_probe_buckets_sql(bucket_expr: str, n_planes: int, probes: int = 1) -> str:
    parts = ", ".join(
        bucket_expr if m == 0 else f"xor({bucket_expr}, {m})"
        for m in _probe_masks(n_planes, probes)
    )
    return f"[{parts}]"


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    partial_topk: bool = True,
    probes: int = 2,
) -> DataFrame:
    """Approximate top-k: SRP-bucket both sides, rank only within the
    query's bucket(s). Same output shape as cosine_topk; recall < 1 by
    construction (cross-bucket neighbors are missed). ``probes=1``
    multi-probes each query into all buckets one plane-flip away —
    ~(n_planes+1)x the candidate volume for a large recall gain; the
    fan-out rides on the (small, broadcast) query side only. The
    default is the measured-recall setting (probes=2 ≈ 0.64 recall@10
    on the 64-dim bench corpus vs 0.47 at probes=0 — BENCH extras);
    pass probes=0 explicitly for the cheapest own-bucket-only scan."""
    from ..functions.grid import spread_input

    c = spread_input(corpus).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).withColumn("__cn", _norm(F.col("__cv"))).withColumn(
        "__bucket", srp_bucket(F.col("__cv"), dim, n_planes)
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumn("__qn", _norm(F.col("__qv"))).withColumn(
        "__bucket",
        F.explode(
            srp_probe_buckets(
                srp_bucket(F.col("__qv"), dim, n_planes), n_planes, probes
            )
        ),
    )
    scored = c.join(F.broadcast(q), "__bucket").select(
        "query_id",
        "vec_id",
        _cosine_pre(
            F.col("__cv"), F.col("__qv"), F.col("__cn"), F.col("__qn")
        ).alias("cosine"),
    )
    if probes > 0:
        # a corpus vector can match a query through several probe
        # buckets — dedup before ranking so rank stays a bijection
        scored = scored.dropDuplicates(["query_id", "vec_id"])
    return _ranked_topk(scored, k, partial_topk)


# ------------------------------------------------------------------ IVF

def _ivf_centroid(c: int, dim: int) -> list[float]:
    """Deterministic integer-arithmetic centroid — portable to ANSI SQL
    verbatim, like the SRP planes."""
    return [float((c * 7919 + i * 104729) % 211 - 105) for i in range(dim)]


def _ivf_centroid_norm(c: int, dim: int) -> float:
    import math

    return math.sqrt(sum(v * v for v in _ivf_centroid(c, dim)))


def _ivf_scores(vec: Column, dim: int, n_centroids: int) -> list[Column]:
    """Per-centroid cosine-proportional scores: dot(v, centroid)/|centroid|
    (|v| is constant across centroids so it cannot change the argmax).
    The centroid norm is precomputed in Python and embedded as a literal
    so both engines compare the exact same doubles."""
    return [
        _dot(vec, F.lit(_ivf_centroid(c, dim)))
        / F.lit(_ivf_centroid_norm(c, dim))
        for c in range(n_centroids)
    ]


def ivf_cell(vec: Column, dim: int, n_centroids: int) -> Column:
    """Inverted-file cell id: index of the nearest centroid by cosine
    (ties -> smallest index, via greatest() + first-match CASE — the
    same shape the SQL twin uses, so comparisons are bit-identical).

    NOTE for hot paths: as one expression, greatest() + the CASE chain
    evaluates every centroid score twice (2 x n_centroids array
    aggregates per row — lambda-bearing aggregates are invisible to
    subexpression elimination). The operators below use
    :func:`_with_ivf_cell`, which materializes the score array in its
    own projection and argmaxes it once; identical tie semantics
    (array_position finds the FIRST equal element, like the
    first-match CASE)."""
    scores = _ivf_scores(vec, dim, n_centroids)
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    out = F.when(scores[0] == best, F.lit(0))
    for c in range(1, n_centroids):
        out = out.when(scores[c] == best, F.lit(c))
    return out.cast("int")


def _with_ivf_cell(
    df: DataFrame, vec_col: str, out_col: str, dim: int, n_centroids: int
) -> DataFrame:
    """Attach the IVF cell id evaluating each centroid score ONCE: the
    score array gets its own projection (CollapseProject keeps a
    non-cheap alias that is referenced twice), then the cell is
    array_position(scores, array_max(scores)) - 1 — the same value the
    greatest+CASE form yields for every input, including NULL vectors
    (both produce NULL) and ties (both take the smallest index)."""
    tmp = f"__{out_col}_scores"
    return (
        df.withColumn(
            tmp, F.array(*_ivf_scores(F.col(vec_col), dim, n_centroids))
        )
        .withColumn(
            out_col,
            (
                F.array_position(F.col(tmp), F.array_max(F.col(tmp))) - 1
            ).cast("int"),
        )
        .drop(tmp)
    )


def ivf_query_cells(vec: Column, dim: int, n_centroids: int, n_probe: int) -> Column:
    """The n_probe nearest cells for a query vector (array<int>), by
    descending score then descending cell id — a deterministic order
    both engines reproduce."""
    scores = _ivf_scores(vec, dim, n_centroids)
    ranked = F.sort_array(
        F.array(
            *[
                F.struct(s.alias("s"), F.lit(c).alias("c"))
                for c, s in enumerate(scores)
            ]
        ),
        asc=False,
    )
    return F.transform(F.slice(ranked, 1, n_probe), lambda x: x["c"])


def build_ivf_index(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_centroids: int = 16,
) -> DataFrame:
    """Bootstrap the persistable inverted-file index: one row per
    corpus vector — ``(vec_id, cell, v)`` with ``cell`` = the nearest
    deterministic centroid. The 100 TB deployment writes this
    PARTITIONED BY ``cell`` (``df.write.partitionBy("cell")`` /
    a bucketed table): a query batch probing ``n_probe`` cells then
    reads only ``n_probe / n_centroids`` of the corpus — partition
    pruning does the cell selection before any I/O (pinned by
    ``tests/test_plans.py::test_ivf_index_partition_pruning``).
    Nightly appends just assign cells to the new batch and append —
    no rebuild (centroids are deterministic in the vector dim)."""
    from ..functions.grid import spread_input

    base = spread_input(corpus).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    return _with_ivf_cell(base, "v", "cell", dim, n_centroids).select(
        "vec_id", "cell", "v"
    )


def cosine_topk_ivf_index(
    index: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    dim: int = 64,
    n_centroids: int = 16,
    n_probe: int = 8,
    partial_topk: bool = True,
) -> DataFrame:
    """IVF top-k against a PERSISTED index (``build_ivf_index``
    output, usually read back from a cell-partitioned table): exactly
    :func:`cosine_topk_ivf` semantics, but corpus cell assignment is
    never recomputed, and when the index source is partitioned by
    ``cell`` the probed-cell filter prunes at the file level."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumn("__qn", _norm(F.col("__qv"))).withColumn(
        "cell",
        F.explode(ivf_query_cells(F.col("__qv"), dim, n_centroids, n_probe)),
    )
    scored = (
        index.withColumn("__cn", _norm(F.col("v")))
        .join(F.broadcast(q), "cell")
        .select(
            "query_id",
            "vec_id",
            _cosine_pre(
                F.col("v"), F.col("__qv"), F.col("__cn"), F.col("__qn")
            ).alias("cosine"),
        )
    )
    return _ranked_topk(scored, k, partial_topk)


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    dim: int = 64,
    n_centroids: int = 16,
    n_probe: int = 8,
    partial_topk: bool = True,
) -> DataFrame:
    """Approximate top-k via an inverted file: every corpus vector lives
    in exactly ONE cell (nearest deterministic centroid); each query
    scans its n_probe nearest cells. Compared to SRP-LSH: recall is
    tuned by n_probe instead of plane count, cells are size-balanced by
    the centroid spread rather than hamming geometry, and the corpus is
    never replicated (the probe fan-out rides on the query side).
    Candidate pairs are unique by construction (one cell per corpus
    row), so no dedup precedes ranking."""
    from ..functions.grid import spread_input

    c = _with_ivf_cell(
        spread_input(corpus).select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("__cv"),
        ).withColumn("__cn", _norm(F.col("__cv"))),
        "__cv", "__cell", dim, n_centroids,
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumn("__qn", _norm(F.col("__qv"))).withColumn(
        "__cell",
        F.explode(ivf_query_cells(F.col("__qv"), dim, n_centroids, n_probe)),
    )
    scored = c.join(F.broadcast(q), "__cell").select(
        "query_id",
        "vec_id",
        _cosine_pre(
            F.col("__cv"), F.col("__qv"), F.col("__cn"), F.col("__qn")
        ).alias("cosine"),
    )
    return _ranked_topk(scored, k, partial_topk)
