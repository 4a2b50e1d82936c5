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



# Round-17 rotation (executing the plan pre-staged in round 16's
# COVERAGE.md, with ZERO registry growth — the standing rule: the
# corpus HOLDS at 126 queries / 121 oracles until the gate grows).
# Pure rotation again: the twenty-one round-14 rows spilled past
# round 16's slot 50 LEAD (last gate r14 — the oldest driver rows:
# the text scalar block, the win_* window block, the three sketch
# aggregates, the binary-modality near-dup trio, the sort/setop
# pair), in their order at slots 51-71 of the round-16 registry;
# then 29 of the 50 round-15-gated rows in CORRECTNESS_r15 key
# order with the special evidence classes FORCE-INCLUDED per the
# standing doctrine (never spill streaming-replay, ETL-parity, or
# composite rows): the first 23 rows of the r15 key order
# (setop_intersect .. dedup_minhash_groups) plus
# pipeline_pretrain_corpus, pipeline_curate_corpus,
# stream_tumbling_replay, stream_session_replay, stream_join_replay
# and etl_logs_parity at their r15 relative positions (slots 45-50
# there).  The twenty-one r15 rows after the prefix — all
# deterministic/hash-checkable and green in r15 — spill to lead
# round 18.  Freshness cycle stays ~2.52 rounds (126 against a
# 2x50 gate), accepted per the round-10 verdict's adjudication (a
# never-gated operator is worse than a slightly staler rotation).
_prioritize(
    first=[
        # --- round-14 spills (oldest driver rows; spilled past
        #     round 16's slot 50; order = round-16 spill list /
        #     COVERAGE.md pre-staging) ---
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
        # --- round-15-gated block, CORRECTNESS_r15 key order (29 of
        #     50 names: the first 23 rows, then the six
        #     force-included special evidence rows — the two
        #     composites, the three stream replays, and etl_logs_
        #     parity — at their r15 relative positions; the
        #     twenty-one rows listed after the prefix spill to
        #     round 18) ---
        "setop_intersect",
        "setop_except",
        "setop_intersect_all",
        "setop_except_all",
        "fn_higher_order",
        "fn_cast",
        "fn_map",
        "join_cross",
        "join_self_nation_pairs",
        "agg_pricing_summary",
        "agg_percentiles",
        "agg_global",
        "agg_distinct",
        "agg_stats",
        "events_window_tumbling",
        "events_funnel_depth",
        "events_window_sliding",
        "events_top_paths",
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_group_assign",
        "dedup_minhash_lsh",
        "dedup_minhash_groups",
        "pipeline_pretrain_corpus",
        "pipeline_curate_corpus",
        "stream_tumbling_replay",
        "stream_session_replay",
        "stream_join_replay",
        "etl_logs_parity",
        # --- spill past slot 50 → lead the round-18 rotation (r15
        #     key order; all deterministic/hash-checkable, green in
        #     r15) ---
        "dedup_simhash",
        "asof_event_value",
        "text_topk_terms",
        "text_tfidf_topk",
        "text_pack_shards",
        "sample_weighted_reservoir",
        "sim_cosine_topk",
        "sim_ann_bucketed",
        "sim_pairs_threshold",
        "dedup_embedding_cosine",
        "sim_centroid_per_label",
        "sim_ann_multiprobe",
        "udf_grouped_map",
        "udf_grouped_agg",
        "sql_correlated_exists",
        "sql_not_exists",
        "sql_scalar_subquery",
        "sql_correlated_scalar_agg",
        "sql_in_subquery",
        "mm_fuzzy_decontaminate",
        "mm_video_scene_pairs",
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
