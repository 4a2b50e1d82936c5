#!/usr/bin/env python
"""Round-16 memory-pressure probe: correctness under a 4x smaller heap.

Every scale curve so far was measured at the default 16 g local heap.
The untested resilience claim is spill-safety: at 100 TB an executor's
per-partition working set WILL exceed memory somewhere, and the
engine's answer must be "Spark spills and the result is identical",
never an OOM or a silently different answer.

Protocol: the two CC-closure heavyweights at 30x distinct-content
scale (150k docs — the largest corpus this repo has measured) run in
TWO subprocess sessions: default heap (16 g) and a 4 g heap, same
local[32] (32 concurrent tasks sharing 4 g forces execution-memory
pressure at this scale). Compared: pair counts, group counts, and the
sum of group sizes — value-level equality, not just "it finished".

Output: tools/memory_pressure_probe_r16_results.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
from scale_probe_r15 import replicate_documents
from git_log_to_sqlite_spark.operators import dedup as dd
from git_log_to_sqlite_spark.operators.graph import connected_components
from git_log_to_sqlite_spark.plans import llm_ops
from git_log_to_sqlite_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark("mem-probe", cpus="32")
spark.sparkContext.setLogLevel("ERROR")
tmp = tempfile.mkdtemp(prefix="memprobe_")
docs_path = replicate_documents(spark, tmp, 30)
docs = spark.read.parquet(docs_path)
out = {"heap": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")}
t0 = time.perf_counter()
pairs = dd.minhash_lsh_pairs(
    docs, "doc_id", "text",
    num_hashes=llm_ops._MINHASH_K, rows_per_band=2, min_agree=0.25,
    band_size_quantile=llm_ops._BAND_Q,
)
out["minhash_pairs"] = pairs.count()
groups = connected_components(pairs, src="id_a", dst="id_b")
agg = groups.groupBy().agg(
    F.count(F.lit(1)).alias("n"),
    F.countDistinct("component").alias("n_groups"),
    F.expr("bit_xor(xxhash64(node, component))").alias("hashsum"),
).first()
out["minhash_members"], out["minhash_groups"], out["minhash_hashsum"] = (
    agg["n"], agg["n_groups"], int(agg["hashsum"]))
out["minhash_wall_s"] = round(time.perf_counter() - t0, 2)
t0 = time.perf_counter()
spans = dd.substring_span_pairs(
    docs, "doc_id", "text",
    window=llm_ops._SUBSTR_K, min_run_tokens=llm_ops._SUBSTR_MIN_RUN,
    max_df_quantile=llm_ops._SUBSTR_Q, quantile_headroom=llm_ops._SUBSTR_HEADROOM,
)
out["substr_pairs"] = spans.count()
out["substr_wall_s"] = round(time.perf_counter() - t0, 2)
import shutil; shutil.rmtree(tmp, ignore_errors=True)
print("RESULT::" + json.dumps(out))
spark.stop()
"""


def run(heap: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=heap)
    proc = subprocess.run(
        [sys.executable, "-c", WORKER], env=env, capture_output=True, text=True,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT::"):
            return json.loads(line[len("RESULT::"):])
    return {"heap": heap, "err": (proc.stderr or proc.stdout)[-600:]}


def main() -> None:
    results = {"scale": "30x (150k docs)", "runs": [run("16g"), run("4g")]}
    a, b = results["runs"]
    keys = ["minhash_pairs", "minhash_members", "minhash_groups",
            "minhash_hashsum", "substr_pairs"]
    results["identical"] = all(
        a.get(k) is not None and a.get(k) == b.get(k) for k in keys
    )
    out = os.path.join(os.path.dirname(__file__),
                       "memory_pressure_probe_r16_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
