"""The oracle-testable query corpus (SURVEY.md section 2.2).

Every operator the engine claims is registered here as a QuerySpec:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) the equivalent ANSI SQL that DuckDB runs on the same
parquet tables.  The driver's correctness gate compares row count,
schema, and an order-insensitive value hash — so every module follows
the canonicalization rules in ``registry.py``.
"""

from .registry import REGISTRY, QuerySpec, register, spark_queries, oracle_map

# Importing the modules populates the registry.
from . import relational  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import scalar  # noqa: E402,F401
from . import llm_ops  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import udfs  # noqa: E402,F401
from . import subqueries  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "register", "spark_queries", "oracle_map"]
