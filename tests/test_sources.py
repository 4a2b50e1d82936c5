"""Source-format coverage (SURVEY.md section 2.2 "Sources / sinks"):
CSV / JSON / text scans with DECLARED schemas round-trip the same rows
as the parquet scan. Schemas are always supplied — inference is a
correctness hazard (silent type drift) and a performance hazard (an
extra full read) at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from git_log_to_sqlite_spark.plans.registry import table

CUSTOMER_SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey bigint,"
    " c_acctbal double, c_mktsegment string"
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_scan_schema_supplied(spark, oracle_sf_dir, tmp_path):
    pq = table(spark, oracle_sf_dir, "customer")
    path = str(tmp_path / "customer_csv")
    pq.write.option("header", True).mode("overwrite").csv(path)
    got = spark.read.schema(CUSTOMER_SCHEMA).option("header", True).csv(path)
    assert _rows(got) == _rows(pq)


def test_json_scan_schema_supplied(spark, oracle_sf_dir, tmp_path):
    pq = table(spark, oracle_sf_dir, "nation")
    path = str(tmp_path / "nation_json")
    pq.write.mode("overwrite").json(path)
    got = spark.read.schema(pq.schema).json(path)
    assert _rows(got) == _rows(pq)


def test_json_corrupt_records_are_isolated(spark, tmp_path):
    """PERMISSIVE mode routes malformed rows to _corrupt_record instead
    of failing the job — the reference's R8/R27 error-containment
    pattern (drop bad units, keep going) at the source layer."""
    p = tmp_path / "mixed.json"
    p.write_text('{"a": 1}\n{"a": 2}\nnot-json\n{"a": 3}\n')
    schema = "a bigint, _corrupt_record string"
    df = spark.read.schema(schema).json(str(p)).cache()
    try:
        good = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert sorted(r["a"] for r in good.collect()) == [1, 2, 3]
        assert bad.count() == 1
    finally:
        df.unpersist()


def test_text_scan_line_per_row(spark, tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text("alpha\nbeta\ngamma\n")
    df = spark.read.text(str(p))
    assert df.columns == ["value"]
    assert sorted(r["value"] for r in df.collect()) == ["alpha", "beta", "gamma"]


def test_csv_pushdown_still_prunes_columns(spark, oracle_sf_dir, tmp_path):
    """Column pruning reaches non-parquet scans too: a 2-column select
    over a 5-column CSV must not carry the rest into the plan."""
    pq = table(spark, oracle_sf_dir, "customer")
    path = str(tmp_path / "customer_csv2")
    pq.write.option("header", True).mode("overwrite").csv(path)
    df = spark.read.schema(CUSTOMER_SCHEMA).option("header", True).csv(path)
    plan = df.select("c_custkey", "c_acctbal")._jdf.queryExecution().executedPlan().toString()
    assert "c_mktsegment" not in plan
