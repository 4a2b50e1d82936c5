"""The oracle-testable query corpus (SURVEY.md section 2.2).

Every operator the engine claims is registered here as a QuerySpec:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) the equivalent ANSI SQL that DuckDB runs on the same
parquet tables.  The driver's correctness gate compares row count,
schema, and an order-insensitive value hash — so every module follows
the canonicalization rules in ``registry.py``.
"""

from .registry import REGISTRY, QuerySpec, register, spark_queries, oracle_map

# Importing the modules populates the registry.
from . import relational  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import scalar  # noqa: E402,F401
from . import llm_ops  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import udfs  # noqa: E402,F401
from . import subqueries  # noqa: E402,F401
from . import stream_queries  # noqa: E402,F401


def _prioritize(first: list[str], last: list[str] = ()) -> None:
    """Reorder the registry: ``first``, then everything else in original
    registration order, then ``last``.

    The external correctness gate verifies a prefix of the registry in
    enumeration order, so queries that have not yet earned a verified
    row — plus any query whose oracle changed this round — are rotated
    to the front.  ``last`` holds the deliberately oracle-less queries
    (approx sketches, seeded sampling, iterative k-means — each bound/
    property-tested in pytest instead) so the gate prefix never contains
    a row the gate cannot hash-verify.  Rotation history: round 1 gated
    the relational/window/scalar prefix; round 2 the LLM-pipeline /
    similarity / UDF / subquery block; round 3 rotates the round-1 block
    back to the front (plus the repaired ``fn_higher_order``) so every
    query keeps a driver-green row within the trailing two rounds.
    """
    missing = [n for n in [*first, *last] if n not in REGISTRY]
    if missing:
        raise ValueError(f"unknown names in priority list: {missing}")
    ordered = {n: REGISTRY[n] for n in first}
    for n, spec in list(REGISTRY.items()):
        if n not in ordered and n not in last:
            ordered[n] = spec
    for n in last:
        ordered[n] = REGISTRY[n]
    REGISTRY.clear()
    REGISTRY.update(ordered)


# Round-3 rotation: fn_higher_order (repaired serialization this round),
# the new round-3 queries, then the 42 oracle-bearing queries whose last
# driver-green row is from round 1.
#
# ROUND-4 PLAN (the corpus now exceeds 2x the 50-slot gate, so rotation
# alternates halves): front-load the 46 oracle-bearing names whose last
# green row is round 2, PLUS text_clean and events_top_paths (registered
# late in round 3 past the cutoff — no driver row yet, highest priority)
# = 48, leaving room for AT MOST 2 brand-new round-4 queries; round 5
# then rotates this round's gated block back. Overflowing 50 pushes
# stale names to 3 rounds without a green row. The 98-oracle corpus is
# at the 2x50 saturation point — do NOT register more than 2 further
# oracle-bearing queries unless the external gate grows.
#
# Pre-staged round-4 first list (computed from this round's enumeration;
# insert up to 2 new round-4 names after events_top_paths):
#   text_clean, events_top_paths, agg_global, agg_distinct, agg_stats,
#   events_window_tumbling, events_funnel_depth, events_cohort_retention,
#   events_window_sliding, fn_cast, fn_array, fn_explode, fn_map,
#   dedup_exact, dedup_ngram_jaccard, dedup_group_assign,
#   dedup_minhash_lsh, dedup_minhash_groups, dedup_simhash, text_langid,
#   text_quality, text_tokens, text_fingerprint, mm_binary_meta,
#   asof_event_value, text_pii_mask, text_topk_terms, text_tfidf_topk,
#   text_pack_shards, sample_weighted_reservoir, sim_cosine_topk,
#   sim_ann_bucketed, sim_pairs_threshold, dedup_embedding_cosine,
#   sim_centroid_per_label, sim_ann_multiprobe, udf_scalar_python,
#   udf_pandas_vectorized, udf_grouped_map, udf_grouped_agg,
#   udf_table_function, udf_native_udtf, udf_map_in_pandas,
#   sql_correlated_exists, sql_not_exists, sql_scalar_subquery,
#   sql_correlated_scalar_agg, sql_in_subquery
_prioritize(
    first=[
        "fn_higher_order",
        # --- round-3 additions (must be in the gate prefix) ---
        "stream_tumbling_replay",
        "stream_join_replay",
        "text_chunk_overlap",
        "pipeline_curate_corpus",
        "sample_domain_mix",
        "dedup_embedding_groups",
        # --- round-1-gated tail: joins ---
        "join_revenue_per_customer",
        "join_region_revenue",
        "join_left_outer",
        "join_right_outer",
        "join_full_outer",
        "join_merge_hint",
        "join_semi",
        "join_anti",
        "join_cross",
        "join_self_nation_pairs",
        "join_range_bands",
        "join_asof_last_event",
        # --- aggregation ---
        "agg_percentiles",
        "agg_rollup",
        "agg_cube",
        "agg_grouping_sets",
        "agg_pivot",
        "agg_collect_sorted",
        "agg_salted_skew",
        "dedup_dropduplicates_subset",
        # --- sort / limit / set ops ---
        "sort_topk_orders",
        "sort_multikey_nulls",
        "setop_union",
        "setop_intersect",
        "setop_except",
        "setop_intersect_all",
        "setop_except_all",
        # --- windows / events ---
        "win_ranking_suite",
        "win_lag_lead",
        "win_first_last_nth",
        "win_running_frames",
        "win_range_between",
        "win_topk_per_group",
        "win_time_bucket",
        "events_sessionize",
        # --- scalar fns ---
        "fn_strings",
        "fn_regex",
        "fn_dates",
        "fn_math",
        "fn_conditional",
        "fn_json",
        "fn_from_json_struct",
    ],
    last=[
        # Oracle-less by design; pytest-verified (bounds / properties /
        # determinism).  Kept out of the gate prefix so every gated row
        # is hash-checkable.
        "agg_approx_distinct",
        "agg_approx_percentile",
        "sample_stratified",
        "sim_kmeans_groups",
    ],
)

__all__ = ["REGISTRY", "QuerySpec", "register", "spark_queries", "oracle_map"]
