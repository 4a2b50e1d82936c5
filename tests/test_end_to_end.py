"""End-to-end user journey (SURVEY.md section 7 PR1 minimum slice):
git-log text -> ETL -> partitioned parquet -> analytical query over the
produced tables, checked against DuckDB on the SAME parquet files.

This is the integration seam the unit suites don't cross: the ETL
writer's output is the analytics layer's input, and the oracle runs on
the materialized tables rather than the driver's fixtures.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from git_log_to_sqlite_spark.etl import parse_git_log, run_pipeline
from git_log_to_sqlite_spark.etl.writers import write_parquet

from .fixtures import write_fixture_logs


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    """ETL the fixture logs and land logs/changed_files/repositories as
    parquet — the layout a downstream user queries."""
    tmp = tmp_path_factory.mktemp("e2e")
    logdir = write_fixture_logs(tmp / "logs")
    commits = parse_git_log(spark, str(logdir))
    repos_meta = commits.select(F.col("repository").alias("name")).distinct().withColumn(
        "url", F.lit(None).cast("string")
    )
    res = run_pipeline(spark, commits, repos_meta)
    out = tmp / "wh"
    write_parquet(res.logs, str(out / "logs"))
    write_parquet(res.changed_files, str(out / "changed_files"))
    write_parquet(res.repositories, str(out / "repositories"))
    return str(out)


def test_top_authors_per_repository(spark, warehouse):
    """The PR1 flagship: top-2 authors by commit count per repository,
    window-ranked with deterministic ties — Spark vs DuckDB on the
    parquet the pipeline just wrote."""
    logs = spark.read.parquet(f"{warehouse}/logs")
    repos = spark.read.parquet(f"{warehouse}/repositories")
    w = Window.partitionBy("repository_id").orderBy(
        F.col("n_commits").desc(), F.col("author_name")
    )
    got = (
        logs.groupBy("repository_id", "author_name")
        .agg(F.count("*").alias("n_commits"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .join(F.broadcast(repos), logs["repository_id"] == repos["id"])
        .select("name", "author_name", "n_commits", "rn")
    )
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH counts AS (
          SELECT repository_id, author_name, COUNT(*) AS n_commits
          FROM read_parquet('{warehouse}/logs/*.parquet')
          GROUP BY repository_id, author_name
        ), ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY repository_id
                                       ORDER BY n_commits DESC, author_name) AS rn
          FROM counts)
        SELECT name, author_name, n_commits, rn
        FROM ranked JOIN read_parquet('{warehouse}/repositories/*.parquet') r
          ON ranked.repository_id = r.id
        WHERE rn <= 2
        """
    ).fetchall()
    assert sorted(tuple(r) for r in got.collect()) == sorted(want)
    assert len(want) > 0


def test_changed_files_analytics_roundtrip(spark, warehouse):
    """Churn per file across the normalized child table equals the
    DuckDB aggregation over the same parquet."""
    cf = spark.read.parquet(f"{warehouse}/changed_files")
    got = sorted(
        tuple(r)
        for r in cf.groupBy("file_path")
        .agg(F.count("*").alias("n_touches"))
        .collect()
    )
    con = duckdb.connect()
    want = sorted(
        con.execute(
            f"""
            SELECT file_path, COUNT(*) AS n_touches
            FROM read_parquet('{warehouse}/changed_files/*.parquet')
            GROUP BY file_path
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_write_delta_gated_on_optional_dep(spark, tmp_path):
    """write_delta works where delta-spark exists and fails with setup
    guidance (not an opaque ClassNotFound) where it doesn't."""
    import importlib.util

    import pytest

    from git_log_to_sqlite_spark.etl.writers import write_delta

    df = spark.range(3)
    if importlib.util.find_spec("delta") is None:
        with pytest.raises(ModuleNotFoundError, match="delta-spark"):
            write_delta(df, str(tmp_path / "t"))
    else:
        write_delta(df, str(tmp_path / "t"))
        assert spark.read.format("delta").load(str(tmp_path / "t")).count() == 3
