#!/usr/bin/env python
"""Round-17 three-way interleaved A/B for the simhash signature shape,
measured THROUGH the consuming gate queries (dedup_simhash,
dedup_simhash_pairs, mm_fuzzy_decontaminate) in ONE session so window
drift cannot masquerade as a code delta.

Forms under test (all signature-value-identical, asserted first):
  * r16    — two narrow aggregates behind a DISTINCT over the exploded
             (id, token) stream (the round-16 boundary form);
  * onepass — all ``bits`` majorities as sum-aggregates in a single
             wide groupBy (the pre-interruption round-17 form);
  * final  — the shipping form: narrow two-aggregate shape, md5 fold
             projected once per token row, NO distinct.

Protocol: 6 rounds, leg order rotated per round, cold runs (pins
released + session cache cleared between every timed run, noop sink).
Results of record: tools/simhash_pairs_ab_r17_results.json (includes
the earlier two-way and isolated-signature entries this tool's legs
superseded).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from git_log_to_sqlite_spark import plans
from git_log_to_sqlite_spark.operators import dedup as dd
from git_log_to_sqlite_spark.operators.caching import release_caches
from git_log_to_sqlite_spark.operators.dedup import _spread, md5_long
from git_log_to_sqlite_spark.session import get_spark

SF = "/root/testdata/sf0.1"
QS = ["dedup_simhash", "dedup_simhash_pairs", "mm_fuzzy_decontaminate"]
ROUNDS = 6
FINAL = dd.simhash  # the shipping form


def r16_simhash(df, id_col, text_col, bits=32):
    """Verbatim round-16 boundary (faf92a1) form."""
    hex_chars = 8 if bits <= 32 else 15
    toks = _spread(df).select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("token"),
    ).distinct()
    weights = (
        toks.withColumn("h", md5_long(F.col("token"), hex_chars=hex_chars))
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))))
        .withColumn(
            "bit_weight", F.when(F.expr("(shiftright(h, i) & 1) = 1"), 1).otherwise(-1)
        )
        .groupBy("_id", "i")
        .agg(F.sum("bit_weight").alias("weight"))
    )
    return (
        weights.groupBy("_id")
        .agg(
            F.sum(
                F.when(F.col("weight") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), i)"))
                .otherwise(0)
            )
            .cast("long")
            .alias("simhash")
        )
        .withColumnRenamed("_id", id_col)
    )


def onepass_simhash(df, id_col, text_col, bits=32):
    """The rejected pre-interruption round-17 form (wide aggregate)."""
    hex_chars = 8 if bits <= 32 else 15
    toks = _spread(df).select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("token"),
    ).select("_id", md5_long(F.col("token"), hex_chars=hex_chars).alias("h"))
    per_bit = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"_w{i}")
        for i in range(bits)
    ]
    sig = sum(
        F.when(F.col(f"_w{i}") > 0, F.lit(1 << i).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        for i in range(bits)
    )
    return (
        toks.groupBy("_id")
        .agg(*per_bit)
        .select(F.col("_id").alias(id_col), sig.cast("long").alias("simhash"))
    )


def cold(fn, spark):
    t0 = time.perf_counter()
    fn(spark, SF).write.mode("overwrite").format("noop").save()
    dt = round(time.perf_counter() - t0, 3)
    release_caches(blocking=True)
    spark.catalog.clearCache()
    return dt


def main():
    spark = get_spark("simhash_ab", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    d = spark.read.parquet(f"{SF}/documents.parquet")
    spark.range(1000).groupBy((F.col("id") % 7)).count().write.mode(
        "overwrite").format("noop").save()
    for bits in (32, 60):
        a = {tuple(r) for r in FINAL(d, "doc_id", "text", bits=bits).collect()}
        release_caches(blocking=True); spark.catalog.clearCache()
        b = {tuple(r) for r in r16_simhash(d, "doc_id", "text", bits=bits).collect()}
        release_caches(blocking=True); spark.catalog.clearCache()
        c = {tuple(r) for r in onepass_simhash(d, "doc_id", "text", bits=bits).collect()}
        release_caches(blocking=True); spark.catalog.clearCache()
        assert a == b == c, f"signature drift at bits={bits}"
        print(f"bits={bits}: all three forms value-identical "
              f"({len(a)} rows)", flush=True)

    impls = [("final", FINAL), ("r16", r16_simhash), ("onepass", onepass_simhash)]
    runs = {q: {label: [] for label, _ in impls} for q in QS}
    for r in range(ROUNDS):
        rot = impls[r % 3:] + impls[:r % 3]
        for q in QS:
            fn = plans.REGISTRY[q].fn
            for label, impl in rot:
                dd.simhash = impl
                runs[q][label].append(cold(fn, spark))
            dd.simhash = FINAL
            print(f"r{r} {q}: " + " ".join(
                f"{label} {runs[q][label][-1]}" for label, _ in impls), flush=True)
    summary = {
        q: {label: {"min": min(v), "median": sorted(v)[len(v) // 2]}
            for label, v in byq.items()}
        for q, byq in runs.items()
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "simhash_pairs_ab_r17_results.json")
    hist = []
    if os.path.exists(path):
        with open(path) as fh:
            hist = json.load(fh)
    hist.append({"label": "three_way_tool_run", "runs": runs,
                 "summary": summary})
    with open(path, "w") as fh:
        json.dump(hist, fh, indent=1)
        fh.write("\n")
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
