"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime by splitting oversized shuffle partitions. These
operators cover the cases AQE cannot fix:

* a single hot GROUP BY key whose partial aggregate still lands on one
  reducer — ``salted_aggregate`` splits each key across B sub-keys and
  recombines, so the hot key's work spreads over B tasks;
* a hot join key against a small-but-not-broadcastable dimension —
  ``salted_join`` replicates the small side B ways so the hot key's
  fact rows spread over B tasks.

Salts are deterministic (hash of a caller-named unique column, never
rand()): results are reproducible and retried tasks can't double-count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Algebraic aggregates decompose into (partial op, final op) — the same
# pair Spark's own HashAggregate partial/final split uses.
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _salt(unique_col: Column, buckets: int) -> Column:
    return F.pmod(F.xxhash64(unique_col), F.lit(buckets)).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_from: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt on the first shuffle.

    ``aggs`` maps output name -> (op, column) with op in sum / count /
    min / max (the algebraic set that re-merges exactly). Phase 1
    groups by (keys, salt) — the hot key spreads over ``buckets``
    reducers; phase 2 merges the B partials per key. Total shuffle rows:
    |keys| x B (phase 2 input), versus a single-phase plan funneling
    every hot-key row through one reducer.
    """
    for name, (op, _col) in aggs.items():
        if op not in _MERGEABLE:
            raise ValueError(f"{name}: op {op!r} is not mergeable (use {sorted(_MERGEABLE)})")
    salted = df.withColumn("_salt", _salt(F.col(salt_from), buckets))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _MERGEABLE[op][0](F.col(c)).alias(f"_p_{name}")
            for name, (op, c) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGEABLE[op][1](F.col(f"_p_{name}")).alias(name)
            for name, (op, _c) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    fact_unique: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted and the dim side replicated.

    Each fact row gets a deterministic salt in [0, B); the dim side is
    exploded B ways so every (key, salt) pair exists. The shuffle key
    becomes (on, salt): a hot key's rows land on B reducers instead of
    one. Dim cost: B x |dim| rows — use only when the dim is too big to
    broadcast but B x |dim| still shuffles comfortably.
    """
    f = fact.withColumn("_salt", _salt(F.col(fact_unique), buckets))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<int>"))
    )
    return f.join(d, [on, "_salt"], how).drop("_salt")
