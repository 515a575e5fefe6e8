from mimic_spark.operators.catalog import OPS, QueryOp, load_tables, register  # noqa: F401

# importing these modules populates the registry
from mimic_spark.operators import relational  # noqa: F401,E402
from mimic_spark.operators import windows  # noqa: F401,E402
from mimic_spark.operators import timeseries  # noqa: F401,E402
from mimic_spark.operators import text  # noqa: F401,E402
from mimic_spark.operators import dedup  # noqa: F401,E402
from mimic_spark.operators import similarity  # noqa: F401,E402
from mimic_spark.operators import multimodal  # noqa: F401,E402
from mimic_spark.operators import skew  # noqa: F401,E402
from mimic_spark.operators import packing  # noqa: F401,E402
from mimic_spark.operators import cdc_flagship  # noqa: F401,E402

# The driver's correctness gate checks the FIRST 50 registered queries.
# The window membership is FROZEN (the exact oracled set green since r3):
# newly added oracled queries register after position 50 — they stay
# value-checked by tools/check_correctness.py without ever displacing a
# window entry (window churn would make round-over-round records
# incomparable).  Rows-only entries (pytest twins, COVERAGE.md) go last.
_WINDOW_50 = [
    "q1_pricing_summary", "proj_rename_string_funcs", "filter_case_cascade",
    "join_broadcast_star", "join_left_chain", "join_disjunctive_split",
    "cross_join_scalar", "join_on_expression", "anti_join_dup_removal",
    "semi_join_exists", "union_distinct_reagg", "agg_conditional_having",
    "distinct_count_audit", "topk_per_group", "global_topk",
    "set_intersect_except", "pivot_event_matrix", "scalar_functions",
    "explode_split_words", "deterministic_row_id", "cube_rollup_totals",
    "unpivot_stack", "array_agg_sorted", "exact_percentiles",
    "vocab_union_custom", "window_dedup_latest", "window_first_running_max",
    "sessionize_gaps", "asof_range_join", "era_variable_intervals",
    "window_rank_family", "timeseries_expand_samples", "text_quality_scores",
    "lang_id_stopwords", "doc_fingerprint", "text_redact_pii",
    "tfidf_top_terms", "contamination_ngram_overlap", "sample_stratified",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_levenshtein_blocked", "ann_cosine_topk",
    "ann_lsh_bucketed", "dedup_embedding_cosine", "embedding_quantize_int8",
    "multimodal_frame_sample", "skew_salted_rollup",
]
assert all(n in OPS and OPS[n].oracle for n in _WINDOW_50), (
    "window query missing or lost its oracle: "
    + str([n for n in _WINDOW_50 if n not in OPS or not OPS[n].oracle])
)
_window = {n: OPS[n] for n in _WINDOW_50}
_late_oracled = {
    k: v for k, v in OPS.items() if v.oracle and k not in _window
}
_rows_only = {k: v for k, v in OPS.items() if not v.oracle}
OPS.clear()
OPS.update(_window)
OPS.update(_late_oracled)
OPS.update(_rows_only)
