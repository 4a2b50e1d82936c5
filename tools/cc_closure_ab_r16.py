#!/usr/bin/env python
"""A/B: per-round materialization strategy inside connected_components.

Shipping form (A): nxt.localCheckpoint(eager=True)  — one job to
materialize the round's edge set, then the signature collect runs a
SECOND job over the frozen blocks (cheap, but still a full job
dispatch).  Candidate form (B): nxt.persist() lazily — the signature
collect itself materializes the cache, fusing the two jobs into one
per round.  Lineage is NOT truncated under B, so round k's plan embeds
rounds 1..k-1 as InMemoryTableScans; rounds are bounded (2-3 measured,
25 hard cap) so analyzer growth is bounded too.

Correctness note for the A/B: both variants compute identical edge
sets (persist/checkpoint do not change values); the question is ONLY
job count / wall clock.  The experiment interleaves A/B/A/B ... at
min-of-3 per leg on the two CC-heavy registry queries, timing
construct+execute (the closure loop runs at construction; the noop
write times the final join).

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


def cc_persist(edges, src="src", dst="dst", max_rounds=25, stats=None):
    """Variant B: lazy persist; the signature collect materializes."""
    def _signature(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    pinned = []
    cur = graph._canonical(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ).persist()
    pinned.append(cur)
    cur_sig = _signature(cur)
    converged = cur_sig[0] == 0
    rounds = 0
    for _ in range(max_rounds):
        if converged:
            break
        nxt = graph._small_star(graph._large_star(cur)).persist()
        pinned.append(nxt)
        rounds += 1
        nxt_sig = _signature(nxt)
        if nxt_sig == cur_sig and nxt.exceptAll(cur).isEmpty():
            converged = True
        cur, cur_sig = nxt, nxt_sig
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        for df in pinned:
            df.unpersist()
        raise RuntimeError(f"no convergence in {max_rounds} rounds")
    roots = cur.select(F.col("v").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    out = (
        cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .union(roots)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
    # NOTE: intermediates stay pinned until clearCache between runs —
    # fine for the A/B (each leg clears), flagged for the real impl.
    return out


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
        legs = {"checkpoint": [], "persist": []}
        # warm once (codegen/footers) outside the timed legs
        timed(spark, sf_dir, name)
        for _ in range(3):
            graph.connected_components = orig
            legs["checkpoint"].append(timed(spark, sf_dir, name))
            graph.connected_components = cc_persist
            legs["persist"].append(timed(spark, sf_dir, name))
        graph.connected_components = orig
        out["queries"][name] = {
            "checkpoint_runs": legs["checkpoint"],
            "persist_runs": legs["persist"],
            "checkpoint_min": min(legs["checkpoint"]),
            "persist_min": min(legs["persist"]),
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
