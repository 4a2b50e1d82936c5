#!/usr/bin/env python
"""Round-17 A/B for the pretrain decontamination gram branch.

The round-16 form computed the decontamination hit ids from the
`quality` frame, so the repetition gate (an interpreted per-doc
sort + aggregate fold) executed in BOTH plan branches; the round-17
form reads the raw corpus under the parquet-pushable n_chars band
instead (result-identical by the subset argument in the operator
comment — and the oracle's own `g4` CTE reads `toks`, not `quality`).

This tool checks, in ONE session:
  1. VALUE-level equality of the new pipeline vs an inline replica of
     the round-16 formulation at sf0.001/sf0.01/sf0.1 (every cell
     compared after a total-order sort), and vs the DuckDB oracle.
  2. Interleaved cold timing (new, old, new, old ... with pins
     released + cache cleared between runs, noop sink) at sf0.1 —
     interleaving makes the comparison robust to window drift.

Appends to tools/pretrain_decon_ab_r17_results.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from git_log_to_sqlite_spark import plans
from git_log_to_sqlite_spark.operators.caching import release_caches
from git_log_to_sqlite_spark.plans.registry import table
from git_log_to_sqlite_spark.session import get_spark

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
NAME = "pipeline_pretrain_corpus"
DECON_MOD = 29
ROUNDS = 4


def old_form(spark, sf_dir):
    """Inline replica of the ROUND-16 pretrain composition (hit ids
    from the quality frame) built from the same library pieces."""
    from git_log_to_sqlite_spark.operators.dedup import (
        _spread,
        exploded_shingles,
    )
    from git_log_to_sqlite_spark.operators.ordered import ordered_running_sum
    from git_log_to_sqlite_spark.operators.sampling import token_budget_sample
    from git_log_to_sqlite_spark.operators.text import repetition_gate

    d = table(spark, sf_dir, "documents")
    benchmark = d.filter(F.col("doc_id") % DECON_MOD == 0)
    corpus = _spread(d.filter(F.col("doc_id") % DECON_MOD != 0))
    quality = corpus.filter(
        repetition_gate(F.col("text")) & F.col("n_chars").between(50, 20000)
    ).select("doc_id", "source", "n_chars", "text")
    gram = exploded_shingles("text", 4)
    ev = benchmark.select(gram.alias("gram")).distinct()
    hit_ids = (
        quality.select("doc_id", gram.alias("gram"))
        .join(F.broadcast(ev), "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = quality.join(hit_ids, "doc_id", "left_anti")
    surv = (
        clean.groupBy(F.md5("text").alias("_fp"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.expr("min_by(source, doc_id)").alias("source"),
            F.min("n_chars").alias("n_chars"),
        )
        .drop("_fp")
    )
    kept = token_budget_sample(
        surv, "doc_id", "n_chars", 4000, domain_col="source", via="window"
    ).select("doc_id", "source", "n_chars")
    packed = ordered_running_sum(kept, ["doc_id"], "n_chars", out_col="cum")
    return packed.select(
        "doc_id", "source", "n_chars",
        F.floor((F.col("cum") - 1) / 2000).cast("int").alias("shard_id"),
    )


def oracle_df(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def norm(df):
    cols = list(df.columns)
    return [tuple(str(v) for v in row) for row in
            df.sort_values(cols).itertuples(index=False, name=None)]


def cold_run(df):
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    dt = round(time.perf_counter() - t0, 3)
    release_caches(blocking=True)
    return dt


def main():
    spark = get_spark("pretrain_ab", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ent = plans.REGISTRY[NAME]
    out = {"value_equal_vs_old": {}, "value_equal_vs_oracle": {},
           "cold_runs_new": [], "cold_runs_old": []}
    for sf_dir in SFS:
        tag = sf_dir.rsplit("/", 1)[-1]
        new_p = ent.fn(spark, sf_dir).toPandas()
        release_caches(blocking=True)
        spark.catalog.clearCache()
        old_p = old_form(spark, sf_dir).toPandas()
        release_caches(blocking=True)
        spark.catalog.clearCache()
        odf = oracle_df(sf_dir, ent.oracle)
        assert list(new_p.columns) == list(odf.columns) == list(old_p.columns)
        eq_old = norm(new_p) == norm(old_p)
        eq_orc = norm(new_p) == norm(odf)
        out["value_equal_vs_old"][tag] = bool(eq_old)
        out["value_equal_vs_oracle"][tag] = bool(eq_orc)
        print(tag, "rows", len(new_p), "vs_old", eq_old, "vs_oracle", eq_orc,
              flush=True)
    sf = "/root/testdata/sf0.1"
    spark.catalog.clearCache()
    for i in range(ROUNDS):
        out["cold_runs_new"].append(cold_run(ent.fn(spark, sf)))
        spark.catalog.clearCache()
        out["cold_runs_old"].append(cold_run(old_form(spark, sf)))
        spark.catalog.clearCache()
        print(f"round {i}: new {out['cold_runs_new'][-1]} "
              f"old {out['cold_runs_old'][-1]}", flush=True)
    out["min_new"] = min(out["cold_runs_new"])
    out["min_old"] = min(out["cold_runs_old"])
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "pretrain_decon_ab_r17_results.json")
    hist = []
    if os.path.exists(path):
        with open(path) as fh:
            hist = json.load(fh)
    hist.append(out)
    with open(path, "w") as fh:
        json.dump(hist, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
