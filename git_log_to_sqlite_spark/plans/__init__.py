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
from . import etl_parity  # noqa: E402,F401


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



# Round-16 rotation (executing the plan pre-staged in round 15's
# COVERAGE.md, with ZERO registry growth — the standing rule: the
# corpus HOLDS at 126 queries / 121 oracles until the gate grows).
# Pure rotation again: the twenty-one round-13 rows spilled past
# round 15's slot 50 LEAD (their last gate is r13 — the oldest
# driver rows in the corpus: the multimodal segment pair, SemDeDup
# assign, DSIR, the fn_* scalar block, the text-cleaning trio, the
# udf_* surface block, and the substring-dedup pair), then 29 of the
# 50 round-14-gated rows in CORRECTNESS_r14 key order with the
# special evidence classes FORCE-INCLUDED per the standing doctrine
# (never spill streaming-replay, ETL-parity, or composite rows): the
# first 27 rows of the r14 key order (dedup_incremental_substring ..
# text_langid) plus etl_repos_skipped_parity and stream_dedup_replay
# at their r14 relative positions (slots 49-50 there).  The
# twenty-one r14 rows after the prefix — all deterministic/
# hash-checkable and green in r14 — spill to lead round 17.
# Freshness cycle stays ~2.52 rounds (126 against a 2x50 gate),
# accepted per the round-10 verdict's adjudication (a never-gated
# operator is worse than a slightly staler rotation).
_prioritize(
    first=[
        # --- round-13 spills (oldest driver rows; spilled past
        #     round 15's slot 50; order = round-15 spill list /
        #     COVERAGE.md pre-staging) ---
        "mm_image_in_video",
        "mm_audio_segment_pairs",
        "sem_dedup_assign",
        "sample_dsir",
        "fn_math",
        "fn_conditional",
        "fn_strings",
        "fn_regex",
        "fn_dates",
        "fn_json",
        "fn_from_json_struct",
        "text_chunk_overlap",
        "text_pii_mask",
        "text_clean",
        "udf_scalar_python",
        "udf_pandas_vectorized",
        "udf_map_in_pandas",
        "udf_table_function",
        "udf_native_udtf",
        "dedup_substring_spans",
        "dedup_substring_groups",
        # --- round-14-gated block, CORRECTNESS_r14 key order (29 of
        #     50 names: the first 27 rows, then the two
        #     force-included special evidence rows
        #     etl_repos_skipped_parity and stream_dedup_replay at
        #     their r14 relative positions; the twenty-one rows
        #     listed after the prefix spill to round 17) ---
        "dedup_incremental_substring",
        "sim_ann_ivf_assign",
        "dedup_simhash_pairs",
        "dedup_decontaminate",
        "sample_token_budget",
        "dedup_incremental_lsh",
        "join_revenue_per_customer",
        "join_region_revenue",
        "join_left_outer",
        "join_full_outer",
        "join_right_outer",
        "join_merge_hint",
        "join_semi",
        "join_anti",
        "join_range_bands",
        "join_asof_last_event",
        "agg_salted_skew",
        "events_sessionize",
        "events_cohort_retention",
        "sample_domain_mix",
        "dedup_embedding_groups",
        "dedup_dropduplicates_subset",
        "agg_pivot",
        "agg_grouping_sets",
        "fn_array",
        "fn_explode",
        "text_langid",
        "etl_repos_skipped_parity",
        "stream_dedup_replay",
        # --- spill past slot 50 → lead the round-17 rotation (r14
        #     key order; all deterministic/hash-checkable, green in
        #     r14) ---
        "text_quality",
        "text_tokens",
        "text_fingerprint",
        "mm_binary_meta",
        "text_repetition",
        "win_topk_per_group",
        "win_ranking_suite",
        "win_lag_lead",
        "win_running_frames",
        "win_first_last_nth",
        "win_range_between",
        "win_time_bucket",
        "agg_collect_sorted",
        "agg_rollup",
        "agg_cube",
        "mm_image_near_dup",
        "mm_video_near_dup",
        "mm_audio_near_dup",
        "sort_topk_orders",
        "sort_multikey_nulls",
        "setop_union",
    ],
    last=[
        # Oracle-less by design; pytest-verified (bounds / properties /
        # determinism).  Kept out of the gate prefix so every gated row
        # is hash-checkable.
        "agg_approx_distinct",
        "agg_approx_percentile",
        "sample_stratified",
        "sim_kmeans_groups",
        "sim_ann_ivf",
    ],
)

__all__ = ["REGISTRY", "QuerySpec", "register", "spark_queries", "oracle_map"]
