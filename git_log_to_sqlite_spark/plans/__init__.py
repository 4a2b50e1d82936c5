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



# Round-8 rotation (executing the plan pre-staged in round 7): the
# seven round-5 scalar holdovers that spilled past round 7's slot 50
# lead (oldest driver rows in the corpus — round 5), then the
# round-6-gated block in its standing gate order.  7 + 50 names
# against a 50-slot prefix means seven round-6 rows spill to round 9;
# per the standing precedent the spill is steered onto pure
# zero-shuffle per-row projections (fn_array, fn_explode, text_langid,
# text_quality, text_tokens, text_fingerprint, mm_binary_meta — no
# timestamp, join, shuffle, or encoding surface), never onto the
# streaming-replay or ETL-parity rows, so those seven are moved to the
# list tail and lead the pre-staged round-9 rotation.  The corpus is
# 111 oracle queries against a 2x50 gate — an 11-name overhang, so the
# freshness cycle is ~2.2 rounds; grow the corpus further only if the
# gate grows.
_prioritize(
    first=[
        # --- round-5 holdovers (oldest driver rows; spilled past
        #     round 7's slot 50) ---
        "fn_math",
        "fn_conditional",
        "fn_strings",
        "fn_regex",
        "fn_dates",
        "fn_json",
        "fn_from_json_struct",
        # --- round-6-gated block, standing gate order (43 of 50
        #     names; the seven zero-shuffle projections below spill
        #     to round 9) ---
        "text_chunk_overlap",
        "etl_repos_skipped_parity",
        "stream_dedup_replay",
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
        "dedup_simhash",
        "asof_event_value",
        "text_pii_mask",
        "text_topk_terms",
        "text_tfidf_topk",
        "text_pack_shards",
        "text_clean",
        "sample_weighted_reservoir",
        "sim_cosine_topk",
        "sim_ann_bucketed",
        "sim_pairs_threshold",
        "dedup_embedding_cosine",
        "sim_centroid_per_label",
        "sim_ann_multiprobe",
        "udf_scalar_python",
        "udf_pandas_vectorized",
        "udf_grouped_map",
        "udf_grouped_agg",
        "udf_table_function",
        "udf_native_udtf",
        "udf_map_in_pandas",
        "sql_correlated_exists",
        "sql_not_exists",
        "sql_scalar_subquery",
        "sql_correlated_scalar_agg",
        "sql_in_subquery",
        # --- spill past slot 50 → lead the round-9 rotation ---
        "fn_array",
        "fn_explode",
        "text_langid",
        "text_quality",
        "text_tokens",
        "text_fingerprint",
        "mm_binary_meta",
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
