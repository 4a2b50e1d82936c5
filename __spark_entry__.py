"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full registered corpus from
``git_log_to_sqlite_spark.plans`` (one entry per implemented operator
from SURVEY.md section 2, each with a DuckDB-checkable ANSI-SQL oracle
where SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from git_log_to_sqlite_spark import plans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the end-to-end
    pre-training data pipeline (repetition+length quality gate ->
    benchmark decontamination -> exact dedup -> per-domain token-budget
    mix -> two-phase shard packing) as ONE declarative plan —
    ``pipeline_pretrain_corpus``, oracle-gated at sf0.01/sf0.1."""
    return plans.REGISTRY["pipeline_pretrain_corpus"].fn(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return plans.spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each hash-checkable query; entries
    without SQL-expressible semantics (approx_* bounds) are omitted and
    get the driver's rows-only check."""
    return plans.oracle_map()
