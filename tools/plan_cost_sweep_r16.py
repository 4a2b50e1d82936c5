"""Registry-wide plan-cost sweep (round 16).

Round 15's one real engineering find — the literal centroid fan-out whose
ANALYZER/codegen cost dominated IVF probe wall-clock — was caught
anecdotally, on one operator, by a scale probe that happened to hit it.
This tool closes the loop SYSTEMATICALLY: for every query in the
registry it separates

* ``t_construct`` — calling ``fn(spark, sf_dir)``: Python work plus the
  eager Catalyst ANALYSIS each DataFrame operator triggers (and any jobs
  the builder deliberately runs, e.g. a k-means fit or an events-ts
  probe — those show up here and are classified by re-running with the
  plan already warm);
* ``t_plan`` — forcing ``queryExecution().executedPlan()``: optimizer +
  physical planning (AQE wrapper; no execution);
* ``t_exec`` — ``collect()``: the actual data work at sf0.01.

A query whose ``t_construct + t_plan`` rivals ``t_exec`` at this SF has
a plan-cost smell of exactly the round-15 class: data work grows with
the corpus, plan work grows with the OPERATOR'S KNOBS — at 100 TB the
former is paid by 1000 executors, the latter by one driver thread.

Protocol notes:
* One warm-up query first (parquet footer caches, JVM JIT).
* Per-query, the three phases run back-to-back, twice; the SECOND
  sample is reported (first-touch parquet/footer noise lands on sample
  one) with sample one kept in the JSON for honesty.
* Everything runs on the same session, sf0.01, local[32] — the driver
  gate's own shape.

Output: tools/plan_cost_sweep_r16_results.json + a flagged table on
stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession


def _phase_times(spark, fn, sf_dir):
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    t1 = time.perf_counter()
    df._jdf.queryExecution().executedPlan()
    t2 = time.perf_counter()
    rows = df.collect()
    t3 = time.perf_counter()
    return {
        "construct": round(t1 - t0, 4),
        "plan": round(t2 - t1, 4),
        "exec": round(t3 - t2, 4),
        "rows": len(rows),
    }


def main() -> None:
    sf_dir = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("plan-cost-sweep-r16")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from git_log_to_sqlite_spark.plans.registry import REGISTRY

    # Warm-up: JIT + parquet footer caches on a mid-weight query.
    warm = REGISTRY["agg_pricing_summary"].fn
    warm(spark, sf_dir).collect()

    results: dict[str, dict] = {}
    for name, spec in REGISTRY.items():
        try:
            s1 = _phase_times(spark, spec.fn, sf_dir)
            s2 = _phase_times(spark, spec.fn, sf_dir)
        except Exception as e:  # noqa: BLE001 — survey tool, record and move on
            results[name] = {"err": f"{type(e).__name__}: {e}"[:300]}
            continue
        results[name] = {"cold": s1, "warm": s2}
        print(
            f"{name:36s} construct {s2['construct']:7.3f}  plan {s2['plan']:7.3f}"
            f"  exec {s2['exec']:7.3f}  rows {s2['rows']}",
            flush=True,
        )

    flagged = []
    for name, r in results.items():
        if "warm" not in r:
            continue
        w = r["warm"]
        plan_cost = w["construct"] + w["plan"]
        if plan_cost > max(0.5, w["exec"]):
            flagged.append((name, plan_cost, w["exec"]))
    flagged.sort(key=lambda t: -t[1])

    out = {
        "sf_dir": sf_dir,
        "flag_rule": "warm construct+plan > max(0.5s, warm exec)",
        "flagged": [
            {"query": n, "plan_cost_s": round(p, 3), "exec_s": round(e, 3)}
            for n, p, e in flagged
        ],
        "queries": results,
    }
    out_name = os.environ.get("SWEEP_OUT", "plan_cost_sweep_r16_results.json")
    path = os.path.join(os.path.dirname(__file__), out_name)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nflagged {len(flagged)} / {len(results)} -> {path}")
    for n, p, e in flagged:
        print(f"  {n:36s} plan-cost {p:7.3f}s  vs exec {e:7.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
