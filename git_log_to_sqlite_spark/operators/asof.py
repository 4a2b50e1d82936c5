"""General event-time as-of join (nearest prior right-side row per
left row, within a key).

Implementation: the union + last(ignorenulls) window trick —
  1. tag left rows (queries) and right rows (points), union them;
  2. one window per key ordered by (ts, is_query, tie): a running
     ``last(value, ignorenulls=True)`` carries the latest point value
     forward;
  3. keep query rows.

Cost: ONE shuffle on the key + one ordered pass — no range-join
explosion, no per-row subquery; scales to billions of points. This is
the composition form from SURVEY.md section 2.2 (as-of row); a
``pd.merge_asof``-based ``applyInPandas`` variant is deliberately NOT
the default — it moves both sides through Arrow for semantics the
window already expresses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tie_col: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right-side
    ``value_cols`` with ``right_ts <= left_ts`` and the same ``key``.

    ``tie_col`` breaks ordering ties among right rows at equal
    timestamps (latest wins); required for deterministic output when
    duplicate timestamps exist.
    """
    left_cols = left.columns
    tie = F.col(tie_col) if tie_col else F.lit(0)

    q = left.select(
        *left_cols,
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_q"),
        F.lit(None).cast("long").alias("_tie"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_v_{c}") for c in value_cols],
    )
    p = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in left_cols],
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_q"),
        tie.cast("long").alias("_tie"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_q", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = q.unionByName(p).select(
        *left_cols,
        "_is_q",
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_is_q") == 1).drop("_is_q")
