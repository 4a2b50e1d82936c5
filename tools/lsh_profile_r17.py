#!/usr/bin/env python
"""Round-17 profiling: where do the COLD seconds of the two LSH-family
headline queries go? (guide §1: measure first; VERDICT r16 item 3.)

Each probe materializes one prefix of the pipeline through the noop
sink from a fully cold cache (release_caches + clearCache between
every run), min-of-3, and reports the Spark JOB COUNT of the final
run — at sf0.1 the suite is dispatch-dominated, so the job/stage
count is the cost model, not bytes.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from git_log_to_sqlite_spark.operators import dedup as dd
from git_log_to_sqlite_spark.operators.caching import pin, release_caches
from git_log_to_sqlite_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def cold_time(spark, build, n=3):
    tracker = spark.sparkContext._jsc.statusTracker()
    runs, jobs = [], 0
    for _ in range(n):
        df = build()
        before = len(tracker.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        runs.append(round(time.perf_counter() - t0, 3))
        jobs = len(tracker.getJobIdsForGroup(None)) - before
        release_caches(blocking=True)
        spark.catalog.clearCache()
    return round(min(runs), 3), jobs, runs


def main():
    spark = get_spark("lsh_profile", cpus=CPUS)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # warm JVM
    docs.write.mode("overwrite").format("noop").save()

    out = {}
    K, RPB, Q = 8, 2, 0.92

    def sigs():
        return dd.minhash_signatures(docs, "doc_id", "text", K, 3)

    def bands_raw():
        return dd._band_keys(pin(sigs()), "doc_id", K, RPB)

    def hot_set():
        return dd._hot_key_set(bands_raw(), ["band", "band_key"], None, Q,
                               quantile_headroom=10)

    def bands_capped():
        return dd._capped_bands(bands_raw(), None, Q)

    def cand():
        return dd._band_self_pairs(bands_capped(), "doc_id")

    def full():
        return dd.minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=K,
                                    rows_per_band=RPB, min_agree=0.25,
                                    band_size_quantile=Q)

    for name, build in [("signatures", sigs), ("bands_raw", bands_raw),
                        ("hot_set", hot_set), ("bands_capped", bands_capped),
                        ("cand_pairs", cand), ("full_lsh", full)]:
        spark.sparkContext.setJobDescription(f"lsh-profile: {name}")
        m, j, runs = cold_time(spark, build)
        out[name] = {"min_s": m, "jobs_final_run": j, "runs": runs}
        print(f"{name}: {m}s jobs={j} runs={runs}", file=sys.stderr)

    # jaccard decomposition
    def j_sh():
        sh = docs.select(F.col("doc_id").alias("_id"),
                         dd.exploded_shingles("text", 3).alias("shingle"))
        return sh.select("_id", F.xxhash64("shingle").alias("shingle"))

    def j_counts():
        return dd._hot_key_set(j_sh(), ["shingle"], None, 0.92)

    def j_full():
        return dd.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.2,
                                      max_df_quantile=0.92)

    for name, build in [("jac_shingles", j_sh), ("jac_hotset", j_counts),
                        ("jac_full", j_full)]:
        spark.sparkContext.setJobDescription(f"jac-profile: {name}")
        m, j, runs = cold_time(spark, build)
        out[name] = {"min_s": m, "jobs_final_run": j, "runs": runs}
        print(f"{name}: {m}s jobs={j} runs={runs}", file=sys.stderr)

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
