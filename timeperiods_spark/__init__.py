"""timeperiods_spark — a PySpark-native time-weighted rollup engine.

From-scratch reimplementation of the query semantics of
kaufman-lab/timeperiods (reference at /root/reference, R/data.table) as
idiomatic Spark DataFrame operators, generalized to web scale:
range-join + hash-aggregate overlap averaging, interval decomposition,
regular-grid tier rollups, gap-fill/LOCF, Gorilla compression of
per-period series, and retention-tiered continuous aggregates.
"""

from .errors import (
    DuplicateIntervalError,
    IntervalValidationError,
    OverlapError,
    RoleValidationError,
    TimeperiodsError,
)
from .functions.compression import compress_series, decompress_series
from .functions.grid import salted_repartition, spread_input, timestamp_to_grid
from .operators.cross import grouped_cartesian
from .operators.downsample import downsample_m4, rollup_ohlc
from .operators.correlate import cross_correlation
from .operators.histogram import (
    histogram_quantiles,
    merge_histograms,
    rollup_histogram,
)
from .operators.rolling import rolling_window_agg
from .operators.interval_diff import find_gaps, interval_difference
from .operators.interval_union import merge_intervals
from .operators.sessions import sessionize
from .operators.dedup import (
    build_embedding_index,
    build_minhash_index,
    connected_components,
    embedding_dedup_incremental,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_candidate_pairs,
    minhash_dedup,
    minhash_dedup_incremental,
    build_simhash_index,
    ngram_jaccard_pairs,
    simhash_dedup_incremental,
    simhash_frame,
    simhash_pairs,
)
from .operators.asof import asof_join
from .operators.packing import pack_chunks, pack_sequences
from .operators.sampling import hash_sample, hash_sample_n, source_mix
from .operators.spandedup import duplicate_span_stats, duplicate_spans
from .operators.distinct import (
    distinct_cascade,
    distinct_rollup,
    finalize_distinct,
)
from .operators.lines import dedup_lines, filter_lines
from .operators.textops import gopher_quality, scrub_pii
from .operators.tokenize import tokenize_vocab
from .operators.anomaly import seasonal_adjust, zscore_anomaly
from .operators.trend import cusum, ewma, holt
from .operators.tokenstats import (
    ngram_contamination,
    ngram_logprob,
    ngram_repetition,
    tfidf_topk,
    token_histogram,
    token_ngram_counts,
    topk_per_group,
    vocab_coverage,
)
from .plans.cachectl import release as release_caches
from .operators.similarity import (
    build_ivf_index,
    cosine,
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_ivf_index,
    cosine_topk_lsh,
)
from .operators.rollup import (
    cascade,
    finalize_rollup,
    gap_fill_interpolate,
    gap_fill_locf,
    merge_partials,
    period_scaffold,
    rollup_regular,
)
from .runner import ResumableJob
from .sources.catalog import TierCatalog
from .sources.tokens import token_table
from .streaming.continuous import ingest_batch
from .operators.interval_avg import RESERVED_OUTPUT_NAMES, interval_weighted_avg
from .operators.interval_avg_slow import interval_weighted_avg_slow
from .operators.overlaps import (
    check_no_overlaps,
    overlap_join,
    remove_overlaps,
    running_max,
)
from .session import get_spark

__all__ = [
    "interval_weighted_avg",
    "interval_weighted_avg_slow",
    "remove_overlaps",
    "overlap_join",
    "check_no_overlaps",
    "running_max",
    "grouped_cartesian",
    "rollup_regular",
    "finalize_rollup",
    "merge_partials",
    "cascade",
    "gap_fill_locf",
    "gap_fill_interpolate",
    "sessionize",
    "downsample_m4",
    "rollup_ohlc",
    "cross_correlation",
    "vocab_coverage",
    "rolling_window_agg",
    "rollup_histogram",
    "merge_histograms",
    "histogram_quantiles",
    "merge_intervals",
    "interval_difference",
    "find_gaps",
    "period_scaffold",
    "compress_series",
    "decompress_series",
    "token_table",
    "TierCatalog",
    "ResumableJob",
    "ingest_batch",
    "salted_repartition",
    "spread_input",
    "timestamp_to_grid",
    "exact_dedup",
    "duplicate_spans",
    "duplicate_span_stats",
    "scrub_pii",
    "gopher_quality",
    "tokenize_vocab",
    "dedup_lines",
    "filter_lines",
    "distinct_rollup",
    "distinct_cascade",
    "finalize_distinct",
    "cusum",
    "ewma",
    "holt",
    "zscore_anomaly",
    "seasonal_adjust",
    "ngram_jaccard_pairs",
    "minhash_candidate_pairs",
    "minhash_dedup",
    "minhash_dedup_incremental",
    "build_minhash_index",
    "build_embedding_index",
    "embedding_dedup_incremental",
    "release_caches",
    "connected_components",
    "simhash_frame",
    "simhash_pairs",
    "build_simhash_index",
    "simhash_dedup_incremental",
    "pack_sequences",
    "pack_chunks",
    "token_histogram",
    "token_ngram_counts",
    "topk_per_group",
    "ngram_contamination",
    "ngram_logprob",
    "ngram_repetition",
    "tfidf_topk",
    "hash_sample",
    "hash_sample_n",
    "source_mix",
    "embedding_neardup_pairs",
    "cosine",
    "cosine_topk",
    "cosine_topk_ivf",
    "cosine_topk_ivf_index",
    "build_ivf_index",
    "cosine_topk_lsh",
    "asof_join",
    "get_spark",
    "RESERVED_OUTPUT_NAMES",
    "TimeperiodsError",
    "RoleValidationError",
    "IntervalValidationError",
    "DuplicateIntervalError",
    "OverlapError",
]

__version__ = "0.1.0"
