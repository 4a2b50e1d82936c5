#!/usr/bin/env python
"""A/B: per-round materialization strategy inside connected_components.

Shipping form (A): every round runs ``localCheckpoint(eager=True)``
(one pass that computes and persists the round's edge blocks) followed
by the signature collect (count + hash-sum fixpoint probe — a second
job re-reading those blocks).  Three candidates were measured against
it at sf0.1 (results: cc_closure_ab_r16_results.json and the two OOM
records below):

* Variant B — ``persist()`` everywhere, no checkpoints: **OOMs the
  driver** on dedup_minhash_groups.  Without the flat LogicalRDD base,
  every round's logical tree embeds the full LSH pair-generation plan
  4x per round (large-star and small-star each reference their input
  twice); plan-tree stringification alone exhausted the heap at round 3.
* Variant C — eager checkpoint of the canonical base only, per-round
  ``persist()``: 4.7x SLOWER on dedup_minhash_groups (23.1 vs 4.9 s)
  and 1.4-1.5x slower on the others, then **OOMs** on
  dedup_embedding_groups, whose deeper component chains take more
  rounds (4^rounds analyzer nodes).  Per-round lineage truncation is
  load-bearing, not just the base.
* Variant D (current code below) — ``localCheckpoint(eager=False)``
  everywhere: truncation kept, the block-persist pass fused into the
  signature job.  Result: a WASH (±3%, inside window noise — e.g.
  minhash 4.835 vs 4.836, embedding 2.866 vs 2.491, group_assign
  4.513 vs 4.64).  The dominant per-round term is AQE query-stage
  dispatch for the star-op exchanges, which both forms pay equally;
  the deferred final pass over a small edge set is milliseconds.

Conclusion: the shipping eager-checkpoint protocol stays — it is at
its cost floor for this algorithm shape, and its failure mode under
block loss (job failure + consistent retry) is simpler to reason about
than lazy materialization.

Usage: python tools/cc_closure_ab_r16.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from git_log_to_sqlite_spark import plans  # noqa: E402
from git_log_to_sqlite_spark.operators import graph  # noqa: E402
from git_log_to_sqlite_spark.session import get_spark  # noqa: E402

QUERIES = ["dedup_minhash_groups", "dedup_substring_groups",
           "dedup_group_assign", "dedup_embedding_groups"]


def cc_lazy_ckpt(edges, src="src", dst="dst", max_rounds=25, stats=None):
    """Variant D: identical to shipping except eager=False — lineage is
    STILL truncated per round (LogicalRDD), but block materialization is
    deferred to the signature collect, fusing the per-round persist pass
    into the signature job."""
    def _signature(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    cur = graph._canonical(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ).localCheckpoint(eager=False)
    cur_sig = _signature(cur)
    converged = cur_sig[0] == 0
    rounds = 0
    for _ in range(max_rounds):
        if converged:
            break
        nxt = graph._small_star(graph._large_star(cur)).localCheckpoint(
            eager=False
        )
        rounds += 1
        nxt_sig = _signature(nxt)  # materializes the blocks in the same job
        if nxt_sig == cur_sig and nxt.exceptAll(cur).isEmpty():
            converged = True
        cur, cur_sig = nxt, nxt_sig
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(f"no convergence in {max_rounds} rounds")
    roots = cur.select(F.col("v").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    return (
        cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .union(roots)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


def timed(spark, sf_dir, name):
    t0 = time.perf_counter()
    plans.REGISTRY[name].fn(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return round(dt, 3)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("cc-ab", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    orig = graph.connected_components
    out = {"sf_dir": sf_dir, "queries": {}}
    for name in QUERIES:
        legs = {"checkpoint": [], "lazy_ckpt": []}
        # warm once (codegen/footers) outside the timed legs
        timed(spark, sf_dir, name)
        for _ in range(3):
            graph.connected_components = orig
            legs["checkpoint"].append(timed(spark, sf_dir, name))
            graph.connected_components = cc_lazy_ckpt
            legs["lazy_ckpt"].append(timed(spark, sf_dir, name))
        graph.connected_components = orig
        out["queries"][name] = {
            "checkpoint_runs": legs["checkpoint"],
            "lazy_ckpt_runs": legs["lazy_ckpt"],
            "checkpoint_min": min(legs["checkpoint"]),
            "lazy_ckpt_min": min(legs["lazy_ckpt"]),
        }
        print(name, out["queries"][name], file=sys.stderr)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "cc_closure_ab_r16_results.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
