"""SQL-entry surface: correlated subqueries through ``spark.sql``.

The reference's only join is a correlated scalar subquery per inserted
row (``SELECT id FROM repositories WHERE name = ?``, analyzer.rs:322).
Catalyst decorrelates these shapes into joins (SURVEY.md section 4.2)
— each query here states the subquery form in SQL and relies on the
optimizer to plan a semi/anti/aggregate join, which
tests/test_plans.py pins (no per-row execution survives).

DuckDB runs the identical SQL, so these double as parser-parity checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import register, table


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        table(spark, sf_dir, n).createOrReplaceTempView(f"_sq_{n}")


@register(
    "sql_correlated_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
    """,
    doc="Correlated EXISTS -> decorrelated to a left-semi join "
    "(never a per-row probe; the R20 pattern class).",
)
def sql_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM _sq_customer c
        WHERE EXISTS (SELECT 1 FROM _sq_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
        """
    )


@register(
    "sql_not_exists",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Correlated NOT EXISTS -> left-anti join (reference R25's "
    "skipped-directories shape, stated in SQL).",
)
def sql_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey FROM _sq_customer c
        WHERE NOT EXISTS (SELECT 1 FROM _sq_orders o
                          WHERE o.o_custkey = c.c_custkey)
        """
    )


@register(
    "sql_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
    """,
    doc="Uncorrelated scalar subquery: one global aggregate computed "
    "once and broadcast into the filter, not per row.",
)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM _sq_orders
        WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM _sq_orders)
        """
    )


@register(
    "sql_correlated_scalar_agg",
    oracle="""
    SELECT o.o_orderkey,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE l.l_orderkey = o.o_orderkey) AS BIGINT) AS n_lines
    FROM orders o WHERE o.o_orderkey < 2000
    """,
    doc="Correlated scalar aggregate subquery -> decorrelated to an "
    "aggregate + left outer join (COUNT gets the 0-for-no-match "
    "patch-up, which naive decorrelation famously breaks).",
)
def sql_correlated_scalar_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey,
               (SELECT COUNT(*) FROM _sq_lineitem l
                WHERE l.l_orderkey = o.o_orderkey) AS n_lines
        FROM _sq_orders o WHERE o.o_orderkey < 2000
        """
    )


@register(
    "sql_in_subquery",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                        WHERE l_quantity >= 49)
    """,
    doc="IN subquery -> left-semi join on the subquery output.",
)
def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM _sq_part
        WHERE p_partkey IN (SELECT l_partkey FROM _sq_lineitem
                            WHERE l_quantity >= 49)
        """
    )
