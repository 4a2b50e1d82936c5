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


# Round-5 rotation (executing the plan pre-staged in rounds 3-4): the
# four queries broken by the events.parquet encoding switch lead the
# prefix so each gets a driver-green row immediately after the repair
# (events_cohort_retention was round 4's one red row; events_sessionize
# crashed the bench; the two stream_* replays read garbage silently).
# Next come this round's 2 new gate queries (the previously reserved
# free slots: the ETL-parity golden query and the session-window
# streaming replay), then the round-3-gated block back at the front per
# the standing two-round cadence.  Three names spill past the 50-row
# prefix: agg_pricing_summary and agg_percentiles carry fresh round-4
# rows, and text_chunk_overlap (round-3 row + pytest; a zero-shuffle
# map-side op with no ts/join surface) is the lowest-risk holdover —
# all three rotate back in round 6 with the round-4 block.  The
# 100-oracle corpus stays at the 2x50 gate saturation point — do not
# grow the corpus faster than the gate.
#
# Pre-staged round-6 rotation: text_chunk_overlap first (its last
# driver row is round 3 — the oldest in the corpus after this round),
# then agg_pricing_summary + agg_percentiles (round-4 rows), then the
# round-4-gated block (text_clean, events_top_paths, agg_global,
# agg_distinct, agg_stats, events_window_tumbling, events_funnel_depth,
# events_window_sliding, fn_cast/array/explode/map, the dedup family,
# text analysis, mm_binary_meta, asof_event_value, similarity, UDFs,
# subqueries — the current post-prefix order, 45 names after removing
# events_cohort_retention which re-verifies this round).  3+45 = 48
# slots; at most 2 new round-6 oracle queries take the remaining 2.
_prioritize(
    first=[
        # --- repaired this round; driver must re-verify first ---
        "events_cohort_retention",
        "events_sessionize",
        "stream_tumbling_replay",
        "stream_join_replay",
        # --- round-5 additions (the 2 reserved slots) ---
        "etl_logs_parity",
        "stream_session_replay",
        # --- round-3-gated block: core relational ---
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
        "join_cross",
        "join_self_nation_pairs",
        "join_range_bands",
        "join_asof_last_event",
        "sort_topk_orders",
        "sort_multikey_nulls",
        "setop_union",
        "setop_intersect",
        "setop_except",
        "setop_intersect_all",
        "setop_except_all",
        "agg_grouping_sets",
        "dedup_dropduplicates_subset",
        "agg_salted_skew",
        "agg_pivot",
        # --- windows ---
        "win_topk_per_group",
        "win_ranking_suite",
        "win_lag_lead",
        "win_running_frames",
        "win_first_last_nth",
        "win_range_between",
        "win_time_bucket",
        # --- scalar fns ---
        "fn_strings",
        "fn_regex",
        "fn_dates",
        "fn_math",
        "fn_conditional",
        "fn_json",
        "fn_from_json_struct",
        "fn_higher_order",
        # --- LLM-pipeline ops ---
        "sample_domain_mix",
        "pipeline_curate_corpus",
        "dedup_embedding_groups",
        # --- holdovers past the prefix (fresh r4 rows / lowest risk) ---
        "text_chunk_overlap",
        "agg_pricing_summary",
        "agg_percentiles",
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
