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



# Round-9 rotation (executing the plan pre-staged in round 8, plus
# this round's additions): the five queries with no driver row yet
# lead — `dedup_substring_spans` + `dedup_substring_groups` +
# `dedup_incremental_substring` (NEW: exact-substring dedup — pairs,
# transitive-closure groups, and the daily-increment-vs-history
# production shape), `sim_ann_ivf_assign` (NEW: the oracle-gated
# deterministic tail of IVF ANN), and `dedup_simhash_pairs`
# (registered in round 8) — per the standing new-query precedent.
# Then the seven zero-shuffle projections that spilled past round 8's
# slot 50 (oldest driver rows — round 6), then the round-7-gated
# block in its standing gate order.  5 + 7 + 50 names against a
# 50-slot prefix means twelve round-7 rows spill to round 10; per the
# standing precedent the spill is steered onto the lowest-risk
# deterministic tail of that block (the five setops, the two sorts,
# the fn_higher_order / fn_cast / fn_map scalar projections, and the
# bounded 25-nation join_cross / join_self_nation_pairs — each a pure
# Catalyst plan over static parquet, no timestamp, streaming, or
# encoding surface), never onto the streaming-replay, ETL-parity, or
# composite-pipeline rows, so those twelve move to the list tail and
# lead the pre-staged round-10 rotation.  The corpus is 117
# registered queries (112 oracle-bearing, 5 oracle-less tail) against
# a 2x50 gate — a 12-name oracle overhang, so the freshness cycle
# stays ~2.3 rounds; grow the corpus further only if the gate grows.
_prioritize(
    first=[
        # --- new queries with no driver row yet ---
        "dedup_substring_spans",
        "dedup_substring_groups",
        "dedup_incremental_substring",
        "sim_ann_ivf_assign",
        "dedup_simhash_pairs",
        # --- round-6 holdovers (oldest driver rows; spilled past
        #     round 8's slot 50) ---
        "fn_array",
        "fn_explode",
        "text_langid",
        "text_quality",
        "text_tokens",
        "text_fingerprint",
        "mm_binary_meta",
        # --- round-7-gated block, standing gate order (38 of 50
        #     names; the twelve setop/sort/scalar/cross rows below
        #     spill to round 10) ---
        "pipeline_pretrain_corpus",
        "dedup_decontaminate",
        "text_repetition",
        "sample_token_budget",
        "dedup_incremental_lsh",
        "agg_rollup",
        "agg_cube",
        "agg_collect_sorted",
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
        "agg_grouping_sets",
        "dedup_dropduplicates_subset",
        "agg_salted_skew",
        "agg_pivot",
        "win_topk_per_group",
        "win_ranking_suite",
        "win_lag_lead",
        "win_running_frames",
        "win_first_last_nth",
        "win_range_between",
        "win_time_bucket",
        "events_sessionize",
        "events_cohort_retention",
        "sample_domain_mix",
        "pipeline_curate_corpus",
        "dedup_embedding_groups",
        "stream_tumbling_replay",
        "stream_session_replay",
        "stream_join_replay",
        "etl_logs_parity",
        # --- spill past slot 50 → lead the round-10 rotation ---
        "sort_topk_orders",
        "sort_multikey_nulls",
        "setop_union",
        "setop_intersect",
        "setop_except",
        "setop_intersect_all",
        "setop_except_all",
        "fn_higher_order",
        "fn_cast",
        "fn_map",
        "join_cross",
        "join_self_nation_pairs",
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
