"""Scale smoke (SURVEY.md section 5.2.5): replicate the fact table 16x
and check (a) the heavy plans complete, (b) exact aggregates scale
EXACTLY multiplicatively — decimal sums make 16 copies sum to exactly
16x the base, so any nondeterminism or partial-agg drift at higher
row counts shows up as a value mismatch, not a flake."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from git_log_to_sqlite_spark.plans.registry import table

REPLICAS = 16


@pytest.fixture(scope="module")
def big_lineitem(spark, oracle_sf_dir):
    li = table(spark, oracle_sf_dir, "lineitem")
    copies = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000))
        for i in range(REPLICAS)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def test_aggregate_scales_exactly(spark, oracle_sf_dir, big_lineitem):
    base = (
        table(spark, oracle_sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"),
        )
    )
    big = big_lineitem.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"),
    )
    b = {r["l_returnflag"]: (r["n"], r["q"]) for r in base.collect()}
    g = {r["l_returnflag"]: (r["n"], r["q"]) for r in big.collect()}
    assert set(b) == set(g)
    for k, (n, q) in b.items():
        assert g[k] == (n * REPLICAS, q * REPLICAS), k


def test_window_topk_stable_under_replication(spark, big_lineitem):
    """Top-k per group on the replicated table completes and every
    group returns exactly k rows (the window plan holds at 16x rows)."""
    from pyspark.sql import Window

    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    top = (
        big_lineitem.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("k"))
    )
    assert all(r["k"] == 10 for r in top.collect())


def test_join_agg_pipeline_at_replicated_scale(spark, oracle_sf_dir, big_lineitem):
    """The pre-aggregate-then-join shape at 16x: per-order rollup of
    ~1M lineitem rows joined back to orders, row count must equal the
    base query's count (replica orderkeys never match real orders
    except replica 0)."""
    o = table(spark, oracle_sf_dir, "orders")
    per_order = big_lineitem.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines")
    )
    joined = o.join(per_order, o["o_orderkey"] == per_order["l_orderkey"])
    base_orders = (
        table(spark, oracle_sf_dir, "lineitem").select("l_orderkey").distinct().count()
    )
    assert joined.count() == base_orders
