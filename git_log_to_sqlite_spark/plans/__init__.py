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



# Round-11 rotation (executing the plan pre-staged in round 10, plus
# this round's additions): the SIX new gate rows lead — the whole
# round-10 operator wave (`mm_fuzzy_decontaminate`: simhash-distance
# benchmark decontamination over the gate-green simhash CTE chain;
# `mm_video_scene_pairs`: scene-level video dedup, frame dHash into
# the substring gaps-and-islands recovery; `mm_image_in_video`: the
# cross-modal hamming_probe content-ID lookup, brute-force twin;
# `mm_audio_segment_pairs`: the sub-fingerprint sequence twin, the
# hardest of the wave, landed a round early) PLUS this round's two
# new operators gated same-round rather than staged
# (`sem_dedup_assign`: SemDeDup's deterministic tail under pinned
# centroids and the rounding knobs; `sample_dsir`: DSIR selection
# with the salted clamped Gumbel coin) — per the standing new-query
# precedent.  Then the fifteen round-8 rows spilled past round 10's
# slot 50 (oldest driver rows), then the round-9-gated block in
# CORRECTNESS_r09's key order.  6 + 15 + 50 names against a 50-slot
# prefix means twenty-one round-9 rows spill to round 12; per the
# standing steering rule the spill lands on the lowest-risk
# deterministic tail of that block (dedup_dropduplicates_subset /
# agg_pivot / agg_grouping_sets / agg_rollup / agg_cube /
# agg_collect_sorted deterministic aggregates, the fn_array /
# fn_explode projections, the per-row text_* / mm_binary_meta
# projections, the six win_* window suites, win_time_bucket,
# text_repetition), never on the streaming-replay, ETL-parity, or
# composite-pipeline rows — those stay in the prefix.  The corpus is
# 126 registered queries (121 oracle-bearing, 5 oracle-less tail)
# against a 2x50 gate — freshness cycle ~2.52 rounds, marginally
# past the ~2.5 guideline and accepted because a never-gated
# operator is worse than a slightly staler rotation (the round-10
# verdict's adjudication); the registry now HOLDS at this size.
_prioritize(
    first=[
        # --- new queries with no driver row yet ---
        "mm_fuzzy_decontaminate",
        "mm_video_scene_pairs",
        "mm_image_in_video",
        "mm_audio_segment_pairs",
        "sem_dedup_assign",
        "sample_dsir",
        # --- round-8 holdovers (oldest driver rows; spilled past
        #     round 10's slot 50) ---
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
        # --- round-9-gated block, CORRECTNESS_r09 key order (31 of
        #     50 names; the nineteen deterministic scalar/window/agg
        #     rows listed after the prefix spill to round 12) ---
        "dedup_substring_spans",
        "dedup_substring_groups",
        "dedup_incremental_substring",
        "sim_ann_ivf_assign",
        "dedup_simhash_pairs",
        "pipeline_pretrain_corpus",
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
        "pipeline_curate_corpus",
        "dedup_embedding_groups",
        "stream_tumbling_replay",
        "stream_session_replay",
        "stream_join_replay",
        "etl_logs_parity",
        # --- spill past slot 50 → lead the round-12 rotation ---
        "dedup_dropduplicates_subset",
        "agg_pivot",
        "agg_grouping_sets",
        "fn_array",
        "fn_explode",
        "text_langid",
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
