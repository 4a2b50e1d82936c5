#!/usr/bin/env python
"""Dump `.explain("formatted")` for the round-17 touched queries.

Usage: python tools/plan_dump_r17.py <outdir> <suffix>
Run once from the round-16 boundary worktree (suffix `before`) and
once from HEAD (suffix `after`); the committed pairs land in
plans/r17/ per the round deliverable.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from git_log_to_sqlite_spark import plans
from git_log_to_sqlite_spark.operators.caching import release_caches
from git_log_to_sqlite_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TOUCHED = [
    # _quantile_cap single-aggregate fold (round 17) — every valve consumer
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_minhash_groups",
    "dedup_group_assign", "dedup_simhash_pairs", "dedup_substring_spans",
    "dedup_substring_groups", "dedup_incremental_substring",
    "dedup_incremental_lsh", "mm_audio_segment_pairs", "mm_video_scene_pairs",
    # stream-side widening of the bounded all-pairs slices (round 17)
    "dedup_embedding_cosine", "dedup_embedding_groups", "sim_pairs_threshold",
    # null-key pid branch in the value-bucketed prefix sum (round 17)
    "pipeline_pretrain_corpus", "pipeline_curate_corpus", "text_pack_shards",
    # one-pass simhash signature aggregation (round 17)
    "dedup_simhash", "mm_fuzzy_decontaminate",
]


def main():
    outdir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plan_dump", cpus="8")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name in TOUCHED:
        df = plans.REGISTRY[name].fn(spark, SF)
        txt = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        release_caches(blocking=True)
        spark.catalog.clearCache()
        print("dumped", name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
