"""Scale-safe global ordered computations (running sums, row numbers).

``Window.orderBy(...)`` with no partition key funnels every row through
ONE reducer — the classic single-machine bottleneck hiding inside a
distributed plan (Spark even warns: "No Partition Defined for Window
operation"). These operators compute the same totally-ordered result in
two phases, the textbook parallel prefix-sum shape:

1. **Range-partition on the order key** (`repartitionByRange`), so
   partition i holds a contiguous key range and all of partition i's
   keys precede partition i+1's. Each partition then computes its LOCAL
   running sum / row number in parallel — the window partitions on
   `spark_partition_id()`, never on a single global partition.
2. **Offsets**: one tiny aggregate (one row per partition) is
   prefix-summed and broadcast back; adding `offset[pid]` to the local
   value yields the exact global result.

Cost: one range shuffle + one pid shuffle of the data and a
broadcast-joined aggregate of #partitions rows — versus the global
window's shuffle of EVERYTHING to one reducer. The only remaining
global sort is over the per-partition totals, bounded by the shuffle
partition count (thousands of rows at most).

Determinism: the order columns must form a total order (unique key) —
the same requirement the global-window formulation has for a stable
result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__ordered_pid"
_LOCAL = "__ordered_local"
_OFFSET = "__ordered_offset"


def _ranged_with_pid(df: DataFrame, order_cols: list[str], num_partitions: int | None) -> DataFrame:
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    # The ranged+pid result feeds TWO plan branches (per-pid totals and
    # the partition-local window), and correctness requires both to see
    # the SAME pid assignment. RangePartitioner samples its bounds per
    # exchange execution, so relying on Catalyst's reuseExchange to
    # plan the exchange once is fragile (a refactor that breaks
    # canonical-plan equality, or disabling reuse, would let the two
    # branches draw different bounds). localCheckpoint materializes the
    # partitions on first use and both branches read the SAME frozen
    # blocks; eager=False defers that to the query's own action, so no
    # extra job runs. (Trade-off: truncated lineage means a lost block
    # fails the job instead of recomputing — acceptable for a
    # deterministic two-stage op; a retry recomputes both branches from
    # the new blocks consistently.)
    return ranged.withColumn(_PID, F.spark_partition_id()).localCheckpoint(eager=False)


def _attach_offsets(ranged: DataFrame, partial: F.Column, local_fn,
                    order_cols: list[str], out_col: str) -> DataFrame:
    """partial: per-row contribution aggregated per pid; local_fn: maps
    the partition-local window spec to the windowed value the offset is
    added to."""
    totals = ranged.groupBy(_PID).agg(partial.alias("_ptotal"))
    # Global window over #partitions rows only — bounded, not a
    # data-sized single-reducer sort (warning suppressed at the logger
    # in session.get_spark; a lit(0) partition key gets folded away).
    off_w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _PID, F.coalesce(F.sum("_ptotal").over(off_w), F.lit(0)).alias(_OFFSET)
    )
    local_w = Window.partitionBy(_PID).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ranged.withColumn(_LOCAL, local_fn(local_w))
        .join(F.broadcast(offsets), _PID)
        .withColumn(out_col, F.col(_LOCAL) + F.col(_OFFSET))
        .drop(_PID, _LOCAL, _OFFSET)
    )


def ordered_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running sum of ``value_col`` over the total order
    ``order_cols``, computed with partition-parallel windows (see module
    docstring). Equivalent to
    ``SUM(value) OVER (ORDER BY order_cols ROWS UNBOUNDED PRECEDING)``.
    """
    ranged = _ranged_with_pid(df, order_cols, num_partitions)
    return _attach_offsets(
        ranged, F.sum(value_col), lambda w: F.sum(value_col).over(w), order_cols, out_col
    )


def ordered_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "row_number",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global 1-based row number over the total order
    ``order_cols`` — the scale-safe replacement for AUTOINCREMENT-style
    id assignment. Equivalent to
    ``ROW_NUMBER() OVER (ORDER BY order_cols)``.
    """
    ranged = _ranged_with_pid(df, order_cols, num_partitions)
    return _attach_offsets(
        ranged,
        F.count(F.lit(1)),
        lambda w: F.row_number().over(w).cast("long"),
        order_cols,
        out_col,
    )
