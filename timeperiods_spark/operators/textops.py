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


# --- Gopher quality rules (Rae et al. 2021, Appendix A subset) -------
#: default thresholds, published values
GOPHER_DEFAULTS = dict(
    min_words=50,
    max_words=100_000,
    min_mean_word_len=3.0,
    max_mean_word_len=10.0,
    max_symbol_word_ratio=0.1,
    min_alpha_word_frac=0.8,
    min_stopword_hits=2,
    max_bullet_line_frac=0.9,
    max_ellipsis_line_frac=0.3,
)

#: Gopher's stop-word presence list (the published eight)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    df,
    text_col: str = "text",
    *,
    keep_col: str = "gopher_keep",
    **overrides,
):
    """Gopher-style document quality rules as one map-side projection:
    adds a boolean per rule plus ``gopher_keep`` (all rules pass).

    Rules (published thresholds; override via kwargs):
    ``words_ok`` (word count in [min_words, max_words]),
    ``word_len_ok`` (mean word length in [3, 10]),
    ``symbol_ok`` (# and ellipsis per word < 0.1),
    ``alpha_ok`` (>= 80% of words contain a letter),
    ``stopword_ok`` (>= 2 hits from the 8-word presence list),
    ``bullet_ok`` (< 90% of lines start with a bullet glyph),
    ``ellipsis_ok`` (< 30% of lines end with an ellipsis).

    A SIGNAL, not a verdict: these rules were tuned for web English —
    the flags exist so downstream sampling (``hash_sample(rate_col=)``)
    can weight rather than hard-drop. NULL text fails every rule.
    Zero shuffle; pushes into the scan."""
    p = dict(GOPHER_DEFAULTS)
    unknown = set(overrides) - set(p)
    if unknown:
        raise ValueError(f"gopher_quality: unknown overrides {sorted(unknown)}")
    p.update(overrides)

    t = F.coalesce(F.col(text_col), F.lit(""))
    n_words = whitespace_token_count(t)
    mean_wl = F.length(F.regexp_replace(t, r"\s+", "")) / F.when(n_words > 0, n_words)
    n_symbols = F.size(F.regexp_extract_all(t, F.lit(r"#|\.\.\."), F.lit(0)))
    n_alpha_words = F.size(
        F.regexp_extract_all(t, F.lit(r"(^|\s)[^\s]*[A-Za-z][^\s]*"), F.lit(0))
    )
    lines = F.split(t, F.lit("\n"), -1)
    n_lines = F.size(lines)
    bullet_lines = F.size(F.filter(
        lines, lambda ln: F.trim(ln).rlike(r"^([*\-\u2022\u2023\u25aa])")
    ))
    ellipsis_lines = F.size(F.filter(
        lines,
        lambda ln: F.trim(ln).rlike(r"(\.\.\.|\u2026)$"),
    ))
    rules = {
        "words_ok": (n_words >= p["min_words"]) & (n_words <= p["max_words"]),
        "word_len_ok": (
            (mean_wl >= p["min_mean_word_len"])
            & (mean_wl <= p["max_mean_word_len"])
        ),
        "symbol_ok": F.when(
            n_words > 0, n_symbols / n_words < p["max_symbol_word_ratio"]
        ),
        "alpha_ok": F.when(
            n_words > 0, n_alpha_words / n_words >= p["min_alpha_word_frac"]
        ),
        "stopword_ok": stopword_count(t, GOPHER_STOPWORDS)
        >= p["min_stopword_hits"],
        "bullet_ok": F.when(
            n_lines > 0,
            bullet_lines / n_lines < p["max_bullet_line_frac"],
        ),
        "ellipsis_ok": F.when(
            n_lines > 0,
            ellipsis_lines / n_lines < p["max_ellipsis_line_frac"],
        ),
    }
    cols = [F.coalesce(c, F.lit(False)).alias(name) for name, c in rules.items()]
    keep = None
    for name, c in rules.items():
        cc = F.coalesce(c, F.lit(False))
        keep = cc if keep is None else (keep & cc)
    return df.select("*", *cols, keep.alias(keep_col))


def gopher_quality_sql(expr: str, p: dict | None = None) -> dict:
    """DuckDB twins of each rule predicate (keyed like the output
    columns); compose with AND for the keep column."""
    d = dict(GOPHER_DEFAULTS)
    d.update(p or {})
    t = f"COALESCE({expr}, '')"
    n_words = whitespace_token_count_sql(t)
    mean_wl = (
        f"(length(regexp_replace({t}, '\\s+', '', 'g')) / "
        f"(CASE WHEN {n_words} > 0 THEN {n_words} END))"
    )
    n_symbols = f"len(regexp_extract_all({t}, '#|\\.\\.\\.'))"
    n_alpha = f"len(regexp_extract_all({t}, '(^|\\s)[^\\s]*[A-Za-z][^\\s]*'))"
    lines = f"string_split({t}, chr(10))"
    n_lines = f"len({lines})"
    n_bullet = (
        f"len(list_filter({lines}, x -> "
        "regexp_matches(trim(x), '^([*\\-•‣▪])')))"
    )
    n_ellip = (
        f"len(list_filter({lines}, x -> "
        "regexp_matches(trim(x), '(\\.\\.\\.|…)$')))"
    )
    rules = {
        "words_ok": f"({n_words} >= {d['min_words']} AND {n_words} <= {d['max_words']})",
        "word_len_ok": (
            f"({mean_wl} >= {d['min_mean_word_len']} AND "
            f"{mean_wl} <= {d['max_mean_word_len']})"
        ),
        "symbol_ok": (
            f"(CASE WHEN {n_words} > 0 THEN "
            f"{n_symbols} / CAST({n_words} AS DOUBLE) < {d['max_symbol_word_ratio']} END)"
        ),
        "alpha_ok": (
            f"(CASE WHEN {n_words} > 0 THEN "
            f"{n_alpha} / CAST({n_words} AS DOUBLE) >= {d['min_alpha_word_frac']} END)"
        ),
        "stopword_ok": (
            f"({stopword_count_sql(t, GOPHER_STOPWORDS)} >= {d['min_stopword_hits']})"
        ),
        "bullet_ok": (
            f"(CASE WHEN {n_lines} > 0 THEN {n_bullet} / "
            f"CAST({n_lines} AS DOUBLE) < {d['max_bullet_line_frac']} END)"
        ),
        "ellipsis_ok": (
            f"(CASE WHEN {n_lines} > 0 THEN {n_ellip} / "
            f"CAST({n_lines} AS DOUBLE) < {d['max_ellipsis_line_frac']} END)"
        ),
    }
    return {k: f"COALESCE({v}, FALSE)" for k, v in rules.items()}
