"""Line-level corpus hygiene: exact cross-corpus line dedup and
rule-based line filtering.

Beyond the reference (which has no text surface at all): the two
line-granular passes every web-scale LLM corpus runs before document-
level dedup — C4's rule filters (Raffel et al., JMLR'20 §2.2) and
RefinedWeb/CCNet-style exact line dedup (keep the first occurrence of
every repeated line corpus-wide).

Scale shape:

* ``filter_lines`` is a PURE MAP: split -> higher-order ``filter`` ->
  reassemble, all JVM-side expressions. Zero shuffle at any corpus
  size; pushdown-friendly.

* ``dedup_lines`` needs corpus-wide state, priced at exactly two
  exchanges: (1) a hash aggregate keyed by the line (or its xxhash64
  — ``hash_lines=True`` ships 8-byte keys, the 100 TB default) that
  elects each line's first occurrence, (2) the explode-side join back
  on that key, then a per-document reassembly keyed by doc id
  (``collect_list`` bounded by the document's own line count). The
  survivor election is ``min(struct(id, idx))`` — deterministic under
  any partitioning, same tie rule as exact_dedup.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

#: terminal punctuation accepted by the C4-style rule
TERMINAL_PUNCT = (".", "!", "?", '"', "'")


def filter_lines(
    df: DataFrame,
    text_col: str = "text",
    *,
    sep: str = "\n",
    min_words: int = 3,
    require_terminal_punct: bool = False,
    deny_substrings: Optional[Sequence[str]] = None,
    out_col: Optional[str] = None,
) -> DataFrame:
    """C4-style line filtering as one map-side projection.

    A line survives when it has at least ``min_words`` whitespace
    words, (optionally) ends in terminal punctuation, and contains
    none of ``deny_substrings`` (case-insensitive). Adds
    ``<out_col>`` (kept lines rejoined with ``sep``),
    ``lines_kept`` and ``lines_dropped``.
    """
    out_col = out_col or f"{text_col}_filtered"
    # NULL text behaves as empty text (its single empty line drops)
    parts = F.split(F.coalesce(F.col(text_col), F.lit("")), F.lit(sep), -1)

    def keep(ln):
        c = F.size(F.split(F.trim(ln), r"\s+")) >= int(min_words)
        c = c & (F.length(F.trim(ln)) > 0)
        if require_terminal_punct:
            t = F.trim(ln)
            c = c & F.substring(t, -1, 1).isin(*TERMINAL_PUNCT)
        for bad in deny_substrings or ():
            c = c & ~F.contains(F.lower(ln), F.lit(bad.lower()))
        return c

    kept = F.filter(parts, keep)
    return df.select(
        "*",
        F.concat_ws(sep, kept).alias(out_col),
        F.size(kept).cast("long").alias("lines_kept"),
        (F.size(parts) - F.size(kept)).cast("long").alias("lines_dropped"),
    )


def dedup_lines(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    *,
    sep: str = "\n",
    normalize: bool = False,
    min_chars: int = 1,
    hash_lines: bool = False,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Exact cross-corpus line dedup, keep-first (RefinedWeb-style).

    Every line whose key (trimmed; lowercased when ``normalize``)
    occurs more than once in the corpus is removed everywhere except
    its first occurrence — "first" = smallest ``(id, line index)``,
    deterministic under any partitioning. Lines whose trimmed length
    is below ``min_chars`` are never candidates (always kept), so
    blank separators survive.

    ``hash_lines=True`` keys the election by ``xxhash64(key)`` instead
    of the line text — 8-byte shuffle keys, the production shape (a
    2^-64 collision merges two lines' elections; the kept text is
    always the original). Output: ``id_col``, ``<out_col>`` (kept
    lines rejoined), ``lines_kept``, ``lines_dropped``.

    Documents whose lines are ALL removed stay in the output with an
    empty string.
    """
    out_col = out_col or f"{text_col}_deduped"
    ids = F.col(id_col)
    # NULL text behaves as empty text; ids must be unique (same
    # contract as exact_dedup)
    lines = df.select(
        ids.alias("__id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), F.lit(sep), -1)
        ).alias("__idx", "__ln"),
    )
    key = F.trim(F.col("__ln"))
    if normalize:
        key = F.lower(key)
    lines = lines.withColumn("__cand", F.length(key) >= int(min_chars))
    lines = lines.withColumn(
        "__key", F.xxhash64(key) if hash_lines else key
    )
    surv = (
        lines.filter(F.col("__cand"))
        .groupBy("__key")
        .agg(F.min(F.struct("__id", "__idx")).alias("__first"))
    )
    kept = (
        lines.join(surv, "__key", "left")
        .filter(
            ~F.col("__cand")
            | (
                (F.col("__first.__id") == F.col("__id"))
                & (F.col("__first.__idx") == F.col("__idx"))
            )
        )
        .groupBy("__id")
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__idx", "__ln"))),
                    lambda s: s["__ln"],
                ),
            ).alias(out_col),
            F.count(F.lit(1)).cast("long").alias("lines_kept"),
        )
    )
    totals = lines.groupBy("__id").agg(
        F.count(F.lit(1)).cast("long").alias("__total")
    )
    return (
        totals.join(kept, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
            F.coalesce(F.col("lines_kept"), F.lit(0).cast("long")).alias(
                "lines_kept"
            ),
            (F.col("__total") - F.coalesce(F.col("lines_kept"), F.lit(0)))
            .cast("long")
            .alias("lines_dropped"),
        )
    )
