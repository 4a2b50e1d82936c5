"""Concurrent-query throughput probe (round 16).

Every measured curve so far is single-query: one driver thread submits
one plan and waits. A deployment serving a team runs MANY queries on a
shared SparkSession (a thrift/connect server shape) — the unmeasured
axis is whether independent queries actually OVERLAP (Spark's scheduler
is job-parallel; Python's GIL releases around py4j socket waits) or
serialize on the driver.

Protocol (sf0.1, local[32] — the bench shape):
1. Warm every headline query once (parquet footers, JIT, broadcast).
2. SEQUENTIAL pass: run the 15 headline queries back-to-back on the
   main thread; record per-query wall and the summed wall.
3. CONCURRENT pass: submit all 15 from 15 Python threads at once;
   record the single wall-clock. Repeat 3x, keep min.
4. Repeat step 3 under FAIR scheduling (spark.scheduler.pool set
   per-thread from a fairscheduler allocation) to show the knob works;
   FIFO is the default comparison.

Throughput factor = sequential_sum / concurrent_wall. On local[32]
every query shares ONE executor's 32 cores, so the ceiling is NOT 15x —
it is bounded by aggregate core demand; what the probe verifies is (a)
no driver-side serialization (factor >> 1), (b) no failure/livelock
under concurrent submission, (c) results identical to the sequential
pass (row counts compared per query).

Output: tools/concurrency_probe_r16_results.json.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession


def _run_one(spark, fn, sf_dir, pool=None):
    if pool is not None:
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
    t0 = time.perf_counter()
    n = len(fn(spark, sf_dir).collect())
    return time.perf_counter() - t0, n


def _concurrent_pass(spark, fns, sf_dir, pool_prefix=None):
    walls: dict[str, float] = {}
    counts: dict[str, int] = {}
    errs: dict[str, str] = {}

    def work(name, fn, i):
        try:
            pool = f"{pool_prefix}{i % 4}" if pool_prefix else None
            w, n = _run_one(spark, fn, sf_dir, pool=pool)
            walls[name], counts[name] = w, n
        except Exception as e:  # noqa: BLE001 — probe records, caller asserts
            errs[name] = f"{type(e).__name__}: {e}"[:200]

    threads = [
        threading.Thread(target=work, args=(name, fn, i))
        for i, (name, fn) in enumerate(fns.items())
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    return wall, walls, counts, errs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("concurrency-probe-r16")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.scheduler.mode", "FAIR")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    from git_log_to_sqlite_spark.plans.registry import REGISTRY

    fns = {name: REGISTRY[name].fn for name in bench.HEADLINE}

    # 1. Warm.
    for fn in fns.values():
        fn(spark, sf_dir).collect()

    # 2. Sequential pass (FIFO-equivalent: single submitting thread).
    seq_walls: dict[str, float] = {}
    seq_counts: dict[str, int] = {}
    for name, fn in fns.items():
        w, n = _run_one(spark, fn, sf_dir)
        seq_walls[name], seq_counts[name] = round(w, 3), n
    seq_sum = round(sum(seq_walls.values()), 3)

    # 3. Concurrent passes, default pool then FAIR pools.
    runs = {}
    for label, prefix in (("default_pool", None), ("fair_pools", "probe")):
        best = None
        for _ in range(3):
            wall, walls, counts, errs = _concurrent_pass(spark, fns, sf_dir, prefix)
            if errs:
                best = {"wall_s": round(wall, 3), "errs": errs}
                break
            mismatches = {
                k: (counts[k], seq_counts[k])
                for k in counts
                if counts[k] != seq_counts[k]
            }
            sample = {
                "wall_s": round(wall, 3),
                "per_query_wall": {k: round(v, 3) for k, v in walls.items()},
                "rowcount_mismatches": mismatches,
            }
            if best is None or sample["wall_s"] < best["wall_s"]:
                best = sample
        runs[label] = best

    out = {
        "sf_dir": sf_dir,
        "n_queries": len(fns),
        "sequential_per_query": seq_walls,
        "sequential_sum_s": seq_sum,
        "concurrent": runs,
        "throughput_factor": {
            k: round(seq_sum / v["wall_s"], 2)
            for k, v in runs.items()
            if v and "errs" not in v
        },
    }
    path = os.path.join(os.path.dirname(__file__), "concurrency_probe_r16_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("sequential_sum_s", "throughput_factor")}))
    for k, v in runs.items():
        print(k, v.get("wall_s"), "mismatches:", v.get("rowcount_mismatches"), "errs:", v.get("errs"))
    spark.stop()


if __name__ == "__main__":
    main()
