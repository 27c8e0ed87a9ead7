"""Vocabulary tokenization: greedy longest-match (WordPiece-style)
encoding of text into token-id sequences.

Beyond the reference (no text surface): the step that turns a cleaned
corpus into model input. The naive shape — a Python UDF walking every
character of every document — is corpus-sized Python, the exact slow
path this engine avoids. The Spark-first shape exploits Zipf's law:

1. split documents into words (pure map-side ``posexplode(split)``),
2. tokenize only the DISTINCT words — vocabulary-sized work, orders
   of magnitude below corpus-sized; this is the only Python (an
   Arrow-batched greedy matcher over strings that are each a few
   dozen characters),
3. join the per-word token arrays back (AQE picks broadcast vs
   shuffle by the actual distinct-word volume) and reassemble per
   document (``collect_list`` bounded by the document's own word
   count, ``array_sort`` + ``flatten`` — no window).

Greedy longest-match semantics (deterministic): at each position take
the longest vocab piece that matches; if none matches, emit
``unk_id`` and advance one character. An equivalent ANSI-SQL
formulation exists (recursive CTE over word positions with
``arg_max(piece, len)``), which the driver oracle runs verbatim —
see ``__spark_entry__.SQL_TOKENIZE``.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from ..errors import RoleValidationError


def tokenize_word(word: str, vocab: Mapping[str, int], unk_id: int,
                  max_len: int) -> list:
    """Greedy longest-match over one word (the per-distinct-word
    kernel; exposed for tests)."""
    toks = []
    pos, n = 0, len(word)
    while pos < n:
        for L in range(min(max_len, n - pos), 0, -1):
            tid = vocab.get(word[pos:pos + L])
            if tid is not None:
                toks.append(tid)
                pos += L
                break
        else:
            toks.append(unk_id)
            pos += 1
    return toks


def tokenize_vocab(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    vocab: Optional[Mapping[str, int]] = None,
    *,
    unk_id: int = 0,
    sep: str = " ",
    lowercase: bool = False,
) -> DataFrame:
    """Encode ``text_col`` into ``tokens`` (array<int>) + ``n_tok``
    per row, greedy-longest-match against ``vocab`` (piece -> id).

    NULL text encodes to an empty sequence. Words (maximal runs
    between ``sep``) tokenize independently — the standard
    pre-tokenized WordPiece contract; ``sep`` itself emits nothing.
    ``ids`` must be unique per row (output is keyed by them).
    """
    if not vocab:
        raise RoleValidationError("tokenize_vocab: a non-empty vocab is required")
    vocab = {str(k): int(v) for k, v in vocab.items()}
    if any(len(k) == 0 for k in vocab):
        raise RoleValidationError("tokenize_vocab: empty vocab piece")
    max_len = max(len(k) for k in vocab)
    unk = int(unk_id)

    txt = F.coalesce(F.col(text_col), F.lit(""))
    if lowercase:
        txt = F.lower(txt)
    words = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(txt, F.lit(sep), -1)).alias("__idx", "__w"),
    ).filter(F.length("__w") > 0)

    distinct_words = words.select("__w").distinct()
    out_schema = T.StructType([
        T.StructField("__w", T.StringType()),
        T.StructField("__toks", T.ArrayType(T.IntegerType())),
    ])

    def _tok(it):
        for pdf in it:
            ws = pdf["__w"].tolist()
            yield pd.DataFrame({
                "__w": ws,
                "__toks": [tokenize_word(w, vocab, unk, max_len) for w in ws],
            })

    encoded = distinct_words.mapInPandas(_tok, out_schema)

    joined = words.join(encoded, "__w", "left")
    per_doc = joined.groupBy("__id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__idx", "__toks"))),
                lambda s: s["__toks"],
            )
        ).alias("tokens")
    )
    ids = df.select(F.col(id_col).alias("__id"))
    return (
        ids.join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(
                F.col("tokens"), F.lit([]).cast("array<int>")
            ).alias("tokens"),
        )
        .withColumn("n_tok", F.size("tokens").cast("long"))
    )
