"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristics, document fingerprinting.

Everything is a native column expression (regexp + aggregate) — no
Python in the hot path — and every formulation has a portable ANSI-SQL
twin used by the driver oracle (the *_sql helpers). At 100 TB these are
pure map-side projections: zero shuffle, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[^A-Za-z0-9\s]"

#: tiny per-language function-word lists for the n-gram/stopword
#: heuristic (public knowledge; deliberately small — this is a
#: heuristic scorer, not a trained model)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "los"],
}

# 41-bit field: acc*1000003 + c stays < 2^62, so ANSI overflow
# checking (Spark 4 default) never trips
FP_MOD = (1 << 41) - 1


def whitespace_token_count(col: Column) -> Column:
    return F.when(
        F.length(F.trim(col)) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(col), r"\s+")))


def whitespace_token_count_sql(expr: str) -> str:
    return (
        f"(CASE WHEN length(trim({expr})) = 0 THEN 0 "
        f"ELSE len(regexp_split_to_array(trim({expr}), '\\s+')) END)"
    )


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / punct)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_RE), F.lit(0)))


def bpe_token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{BPE_RE}'))"


def punct_ratio(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(PUNCT_RE), F.lit(0))) / F.when(
        F.length(col) > 0, F.length(col)
    )


def punct_ratio_sql(expr: str) -> str:
    return (
        f"(len(regexp_extract_all({expr}, '{PUNCT_RE}')) / "
        f"(CASE WHEN length({expr}) > 0 THEN length({expr}) END))"
    )


def stopword_count(col: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pat), F.lit(0)))


def stopword_count_sql(expr: str, words: list[str]) -> str:
    pat = r"\b(" + "|".join(words) + r")\b"
    return f"len(regexp_extract_all(lower({expr}), '{pat}'))"


def quality_score(col: Column) -> Column:
    """Heuristic quality in [0,1]: rewards reasonable length, words of
    plausible size, stopword presence; penalizes punctuation soup.
    Deliberately simple and fully portable — the shape of the C4/Gopher
    rules, not a reimplementation of any proprietary filter."""
    n_tok = whitespace_token_count(col)
    mean_wl = F.length(F.regexp_replace(col, r"\s+", "")) / F.when(n_tok > 0, n_tok)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), 1.0).otherwise(0.0)
    wl_ok = F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), 1.0).otherwise(0.0)
    stop_ok = F.when(
        stopword_count(col, LANG_MARKERS["en"]) / F.when(n_tok > 0, n_tok) >= 0.01,
        1.0,
    ).otherwise(0.0)
    punct_ok = F.when(F.coalesce(punct_ratio(col), F.lit(1.0)) <= 0.2, 1.0).otherwise(0.0)
    return (len_ok + wl_ok + stop_ok + punct_ok) / 4.0


def quality_score_sql(expr: str) -> str:
    n_tok = whitespace_token_count_sql(expr)
    mean_wl = (
        f"(length(regexp_replace({expr}, '\\s+', '', 'g')) / "
        f"(CASE WHEN {n_tok} > 0 THEN {n_tok} END))"
    )
    stop = stopword_count_sql(expr, LANG_MARKERS["en"])
    return (
        f"((CASE WHEN {n_tok} >= 5 AND {n_tok} <= 100000 THEN 1.0 ELSE 0.0 END)"
        f" + (CASE WHEN {mean_wl} >= 2.0 AND {mean_wl} <= 12.0 THEN 1.0 ELSE 0.0 END)"
        f" + (CASE WHEN ({stop} / (CASE WHEN {n_tok} > 0 THEN {n_tok} END)) >= 0.01 THEN 1.0 ELSE 0.0 END)"
        f" + (CASE WHEN COALESCE({punct_ratio_sql(expr)}, 1.0) <= 0.2 THEN 1.0 ELSE 0.0 END)"
        f") / 4.0"
    )


def lang_id(col: Column) -> Column:
    """Argmax of per-language marker-word ratios; 'und' (undetermined)
    when no marker matches. A length-normalized stopword heuristic —
    the classic cheap language filter for web-scale corpora."""
    n_tok = whitespace_token_count(col)
    scores = {
        lang: stopword_count(col, words) / F.when(n_tok > 0, n_tok)
        for lang, words in LANG_MARKERS.items()
    }
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    for lang in sorted(LANG_MARKERS):  # deterministic tie-break: first wins
        s = F.coalesce(scores[lang], F.lit(0.0))
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def lang_id_sql(expr: str) -> str:
    n_tok = whitespace_token_count_sql(expr)
    score = {
        lang: (
            f"COALESCE({stopword_count_sql(expr, words)} / "
            f"(CASE WHEN {n_tok} > 0 THEN {n_tok} END), 0.0)"
        )
        for lang, words in LANG_MARKERS.items()
    }
    # replicate the same fold: iterate langs in sorted order, strict >
    best_lang, best_score = "'und'", "0.0"
    for lang in sorted(LANG_MARKERS):
        s = score[lang]
        best_lang = f"(CASE WHEN {s} > {best_score} THEN '{lang}' ELSE {best_lang} END)"
        best_score = f"(CASE WHEN {s} > {best_score} THEN {s} ELSE {best_score} END)"
    return best_lang


def fingerprint(col: Column) -> Column:
    """64-bit-ish rolling (Horner) hash over the normalized text
    (lowercased, whitespace collapsed), in the 2^61-1 field. One
    ``aggregate`` over the character sequence — linear, map-side."""
    norm = F.regexp_replace(F.lower(col), r"\s+", " ")
    chars = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm), F.lit(1))),
        lambda i: F.ascii(norm.substr(i, F.lit(1))),
    )
    return F.when(F.length(norm) == 0, F.lit(0)).otherwise(
        F.aggregate(
            chars,
            F.lit(0).cast("long"),
            lambda acc, c: (acc * F.lit(1000003) + c) % F.lit(FP_MOD),
        )
    )


def fingerprint_sql(expr: str) -> str:
    norm = f"regexp_replace(lower({expr}), '\\s+', ' ', 'g')"
    return (
        f"(CASE WHEN length({norm}) = 0 THEN 0 ELSE "
        f"list_reduce(list_prepend(0::BIGINT, list_transform("
        f"range(1, length({norm}) + 1), "
        f"i -> ord(substring({norm}, CAST(i AS INT), 1))::BIGINT)), "
        f"(acc, c) -> (acc * 1000003 + c) % {FP_MOD}) END)"
    )


# --- PII detection / scrubbing -------------------------------------
#: detection patterns in SCRUB ORDER — email first (its local part can
#: contain digits a later pass would mangle), then IPv4, then phone
#: (whose charset includes '.' and would otherwise swallow IPs). All
#: three are valid in both Java regex (Spark) and RE2 (DuckDB): no
#: backreferences, no lookaround.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9() .-]{6,}[0-9]", "<PHONE>"),
)


def pii_count(col: Column, pattern: str) -> Column:
    """Occurrences of one PII pattern (whole-match extraction — Spark's
    regexp_extract_all defaults to GROUP 1, so the explicit 0 matters
    whenever the pattern contains groups)."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def pii_count_sql(expr: str, pattern: str) -> str:
    pat = pattern.replace("'", "''")
    return f"len(regexp_extract_all({expr}, '{pat}'))"


def scrub_text(col: Column, patterns=PII_PATTERNS) -> Column:
    """Replace every PII match with its typed placeholder, applying
    the patterns in order (earlier scrubs change what later patterns
    can see — the order above is load-bearing)."""
    out = col
    for _, pat, repl in patterns:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_text_sql(expr: str, patterns=PII_PATTERNS) -> str:
    """DuckDB twin — the 'g' flag is required (DuckDB replaces only
    the FIRST match by default; Spark replaces all)."""
    out = expr
    for _, pat, repl in patterns:
        pat = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def scrub_pii(df, text_col: str = "text", *, out_col=None, patterns=PII_PATTERNS):
    """DataFrame form: adds ``<label>_count`` per pattern plus the
    scrubbed text column (default ``<text_col>_scrubbed``). Pure
    map-side projection — no shuffle, pushdown-friendly; counts are
    computed on the ORIGINAL text (before any placeholder rewrites)."""
    out_col = out_col or f"{text_col}_scrubbed"
    cols = [
        pii_count(F.col(text_col), pat).alias(f"{label}_count")
        for label, pat, _ in patterns
    ]
    return df.select(
        "*", *cols, scrub_text(F.col(text_col), patterns).alias(out_col)
    )
