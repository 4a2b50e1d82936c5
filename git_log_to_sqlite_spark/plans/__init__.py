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


def _prioritize(first: list[str]) -> None:
    """Reorder the registry so ``first`` (then everything else, in
    original registration order) enumerates first.

    The external correctness gate verifies a prefix of the registry in
    enumeration order, so queries that have not yet earned a verified
    row — plus any query whose oracle changed this round — are rotated
    to the front.  Rotation plan: round 1 gated the relational/window/
    scalar prefix; round 2 front-loads the LLM-pipeline, similarity,
    UDF, subquery, and array/map-function queries that round 1 never
    reached, plus the two queries whose oracles were corrected.
    """
    missing = [n for n in first if n not in REGISTRY]
    if missing:
        raise ValueError(f"unknown names in priority list: {missing}")
    ordered = {n: REGISTRY[n] for n in first}
    for n, spec in list(REGISTRY.items()):
        if n not in ordered:
            ordered[n] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


# Round-2 rotation: the 36 queries never reached by round 1's gate,
# then the two repaired oracles (events_window_tumbling, fn_cast).
_prioritize(
    [
        # scalar fns past round-1's cutoff
        "fn_array",
        "fn_explode",
        "fn_map",
        "fn_higher_order",
        # LLM-pipeline ops
        "dedup_exact",
        "dedup_group_assign",
        "dedup_minhash_groups",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "text_langid",
        "text_quality",
        "text_tokens",
        "text_fingerprint",
        "mm_binary_meta",
        "asof_event_value",
        "text_pii_mask",
        "text_topk_terms",
        "text_tfidf_topk",
        "text_pack_shards",
        "sample_stratified",
        "sample_weighted_reservoir",
        # similarity / ANN
        "sim_cosine_topk",
        "sim_ann_bucketed",
        "sim_pairs_threshold",
        "dedup_embedding_cosine",
        "sim_centroid_per_label",
        "sim_ann_multiprobe",
        "sim_kmeans_groups",
        # UDF surface
        "udf_scalar_python",
        "udf_pandas_vectorized",
        "udf_grouped_map",
        "udf_grouped_agg",
        "udf_table_function",
        "udf_native_udtf",
        "udf_map_in_pandas",
        # subqueries
        "sql_correlated_exists",
        "sql_not_exists",
        "sql_scalar_subquery",
        "sql_correlated_scalar_agg",
        "sql_in_subquery",
        # event analytics added in round 2
        "events_funnel_depth",
        "events_cohort_retention",
        "events_window_sliding",
        # repaired oracles from round 1
        "events_window_tumbling",
        "fn_cast",
    ]
)

__all__ = ["REGISTRY", "QuerySpec", "register", "spark_queries", "oracle_map"]
