"""Scalar expression helpers — all JVM-side Column expressions.

Every function here returns a ``Column`` built from
``pyspark.sql.functions`` so it stays inside whole-stage codegen; no
Python UDFs in this module.
"""

from .core import (
    commit_summary,
    normalize_remote_url,
    with_author_sentinels,
    zero_oid_parent,
)

__all__ = [
    "commit_summary",
    "normalize_remote_url",
    "with_author_sentinels",
    "zero_oid_parent",
]
