#!/usr/bin/env python
"""Split one cold run of each LSH-family query into driver phases:
construct (analysis) / optimize+physical (executedPlan string) /
execute (noop save).  Guide §7.3: a huge logical plan can make the
OPTIMIZER the bottleneck; the event-log probe showed a 5-6 s pre-job
gap, which is driver-side planning, not execution."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from git_log_to_sqlite_spark import plans
from git_log_to_sqlite_spark.operators.caching import release_caches
from git_log_to_sqlite_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_spark("plan_phase", cpus="32")
    plans.REGISTRY["agg_global"].fn(spark, SF).write.mode(
        "overwrite").format("noop").save()

    for name in ("dedup_minhash_lsh", "dedup_ngram_jaccard",
                 "dedup_minhash_groups", "pipeline_pretrain_corpus"):
        for rep in range(3):
            t0 = time.perf_counter()
            df = plans.REGISTRY[name].fn(spark, SF)
            t1 = time.perf_counter()
            # force optimization + physical planning WITHOUT executing
            _ = df._jdf.queryExecution().executedPlan().toString()
            t2 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t3 = time.perf_counter()
            release_caches(blocking=True)
            spark.catalog.clearCache()
            print(f"{name} rep{rep}: construct={t1-t0:.3f} "
                  f"plan={t2-t1:.3f} exec={t3-t2:.3f} total={t3-t0:.3f}",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
