#!/usr/bin/env python
"""Capture .explain("formatted") output for a set of registry queries.

Usage:
    python tools/capture_plans_r16.py OUT_DIR SUFFIX [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query (default set below).
Run at HEAD for the *_after.txt files and from a worktree checked out at
the round-15 boundary commit for the *_before.txt files, so the judge
can diff the physical plans the round's changes produced.
"""

from __future__ import annotations

import os
import sys

DEFAULT = [
    # the 15 headline queries (schema-cache change: plan shape must be
    # IDENTICAL before/after — the win is construction-time only)
    "agg_pricing_summary", "agg_rollup", "join_revenue_per_customer",
    "join_region_revenue", "join_anti", "win_topk_per_group",
    "events_sessionize", "events_window_tumbling", "fn_explode",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "sim_cosine_topk", "text_quality", "asof_event_value",
    # prefix-sum laziness change: plan shape CHANGES (checkpoint scan
    # LogicalRDD -> lazily pinned InMemoryRelation + in-plan bucketing)
    "pipeline_pretrain_corpus", "pipeline_curate_corpus",
    "text_pack_shards",
]


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    os.makedirs(out_dir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from git_log_to_sqlite_spark import plans
    from git_log_to_sqlite_spark.session import get_spark

    spark = get_spark("capture-plans", cpus=cpus)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        try:
            df = plans.REGISTRY[name].fn(spark, sf_dir)
            text = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001 — record, keep capturing
            text = f"CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
