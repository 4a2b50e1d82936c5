#!/usr/bin/env python
"""Round-17 A/B: does whole-stage-codegen cache eviction explain the
gap between tight-loop cold runs (~1.1-1.3 s) and bench-context cold
runs (~4.2-6.5 s) of dedup_minhash_lsh?

The codegen cache (spark.sql.codegen.cache.maxEntries, static conf,
default 100) is keyed by generated source; the 15-query suite emits
well over 100 fragments per pass, so by the time pass 2 reaches a
query, pass 1's fragments may be evicted and Janino recompiles the
whole plan.  Protocol: run the full headline suite once (populating /
thrashing the cache), then time the two LSH-family queries cold
(release + clearCache between runs, min-of-3) — under A (default 100)
and B (maxEntries from argv).  Same box, same data, interleavable.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from git_log_to_sqlite_spark import plans
from git_log_to_sqlite_spark.operators.caching import release_caches
from git_log_to_sqlite_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "agg_pricing_summary", "agg_rollup", "join_revenue_per_customer",
    "join_region_revenue", "join_anti", "win_topk_per_group",
    "events_sessionize", "events_window_tumbling", "fn_explode",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "sim_cosine_topk", "text_quality", "asof_event_value",
]


def main():
    max_entries = sys.argv[1] if len(sys.argv) > 1 else None
    extra_conf = (
        {"spark.sql.codegen.cache.maxEntries": max_entries}
        if max_entries else {}
    )
    spark = get_spark(f"codegen_ab_{max_entries or 'default'}", cpus=CPUS,
                      extra_conf=extra_conf)
    print("effective maxEntries:",
          spark.conf.get("spark.sql.codegen.cache.maxEntries"),
          file=sys.stderr)

    def run(name):
        plans.REGISTRY[name].fn(spark, SF).write.mode("overwrite").format(
            "noop").save()
        release_caches(blocking=True)
        spark.catalog.clearCache()

    # pass 1: whole suite (populate/thrash)
    t0 = time.perf_counter()
    for name in HEADLINE:
        run(name)
    pass1 = round(time.perf_counter() - t0, 3)

    out = {"max_entries": max_entries or "default(100)", "pass1_suite": pass1}
    # pass 2: cold-timed LSH pair after the full suite cycled through
    for name in ("dedup_minhash_lsh", "dedup_ngram_jaccard"):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(name)
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(runs), "runs": runs}
        print(name, runs, file=sys.stderr)
    # pass 3: full suite again, per-query — the bench-shaped number
    per = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        run(name)
        per[name] = round(time.perf_counter() - t0, 3)
    out["pass3_suite_per_query"] = per
    out["pass3_suite_total"] = round(sum(per.values()), 3)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
