"""Scale-safe global ordered computations (running sums, row numbers).

``Window.orderBy(...)`` with no partition key funnels every row through
ONE reducer — the classic single-machine bottleneck hiding inside a
distributed plan (Spark even warns: "No Partition Defined for Window
operation"). These operators compute the same totally-ordered result in
two phases, the textbook parallel prefix-sum shape:

1. **Contiguous bucketing on the order key.** Numeric first keys
   (every analytical call site) use the round-16 VALUE-BUCKETED form:
   an in-plan broadcast (min, max) of the key assigns each row its
   equal-width bucket — fully lazy, fully visible to Catalyst, and
   deterministic under recomputation because the pid is a function of
   the row's value, not of partitioner state. Non-numeric first keys
   (the ETL's commit ids) keep the `repartitionByRange` +
   `localCheckpoint` form, which supports arbitrary orderable types at
   the cost of construction-time materialization under AQE (see
   `_bucketed_with_pid` for the measurement that motivated the split).
   Either way each bucket computes its LOCAL running sum / row number
   in parallel — the window partitions on the bucket id, never on a
   single global partition.
2. **Offsets**: one tiny aggregate (one row per bucket) is
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
from pyspark.sql.types import (
    ByteType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
)

_PID = "__ordered_pid"
_LOCAL = "__ordered_local"
_OFFSET = "__ordered_offset"
_LO = "__ordered_lo"
_HI = "__ordered_hi"

_NUMERIC_FIRST = (
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType, DecimalType,
)


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


def _bucketed_with_pid(
    df: DataFrame, order_cols: list[str], num_partitions: int | None
) -> DataFrame:
    """Value-deterministic pid assignment for a NUMERIC first order
    column — the round-16 replacement for the checkpoint-frozen range
    partitioning on every numeric-keyed call site.

    Why (measured, tools/plan_cost_sweep_r16.py follow-up): the
    ``localCheckpoint(eager=False)`` form is NOT lazy under AQE —
    ``Dataset.checkpoint`` calls ``queryExecution.toRdd``, and
    ``AdaptiveSparkPlanExec.doExecute`` materializes every upstream
    query stage right there, at CONSTRUCTION time (the pretrain
    composite measured 10 jobs / ~2-6.5 s of data work per
    construction before any action ran). The checkpoint also severs
    the plan at a LogicalRDD, so Catalyst cannot prune columns or push
    filters across the prefix-sum boundary.

    This form derives the pid from the ROW'S VALUE instead of from
    partitioner state: a one-row (min, max) aggregate of the first
    order column is broadcast (in-plan, lazy), and each row's bucket is
    its equal-width position in that range. Determinism no longer
    depends on materialization AT ALL — min/max are exact, so any
    branch recomputation reproduces identical pids — which is what
    makes dropping the checkpoint sound. The frame is pinned
    (``caching.pin``: lazy persist + registry) so the totals branch and
    the local-window branch still share one computation of the
    upstream pipeline, matching the checkpoint's cost shape without its
    eagerness; if the cache is evicted, recomputation is correct, just
    slower — the failure mode the checkpoint turned into a job failure.

    Bucketing correctness does not depend on balance: the pid is
    monotone (non-strict) in the first order column, rows tying on it
    share a bucket, and the local window orders by the FULL key inside
    the bucket, so the offset identity holds for ANY bounds. Balance —
    parallelism, not correctness — assumes a roughly uniform first
    key (true of every call site: dense ids). Pathological doubles
    degrade to fewer effective buckets, never to wrong results: NaN
    and +inf keys land in the top bucket (their sort position), a
    -inf/degenerate range collapses to one bucket, null keys take
    bucket 0 (nulls-first sort position).
    """
    from .caching import pin

    sess = df.sparkSession
    n = int(
        num_partitions
        or sess.conf.get("spark.sql.shuffle.partitions", "200")
    )
    n = max(n, 1)
    if n == 1:
        return pin(df.withColumn(_PID, F.lit(0)))
    key = F.col(order_cols[0]).cast("double")
    rng = df.select(F.min(key).alias(_LO), F.max(key).alias(_HI))
    span = F.col(_HI) - F.col(_LO)
    frac = (key - F.col(_LO)) / span
    safe = (
        F.when(F.isnan(frac) | (frac > 1.0), F.lit(1.0))
        .when(frac < 0.0, F.lit(0.0))
        .otherwise(frac)
    )
    # Null keys FIRST and explicitly: for a null key ``frac`` is null,
    # ``safe`` stays null (``isnan(null)`` and ``null < 0`` are null,
    # so both WHEN branches are skipped and OTHERWISE passes the null
    # through), and ``least(null, n-1)`` — which SKIPS nulls — would
    # return ``n-1``: a non-null value, so the coalesce rescue below
    # never fires and nulls would land in the TOP bucket while the
    # local window sorts them FIRST (Spark default nulls-first),
    # breaking the offset identity. Bucket 0 is their sort position.
    pid = F.when(key.isNull(), F.lit(0)).otherwise(
        F.least(F.floor(safe * n), F.lit(n - 1).cast("bigint")).cast("int")
    )
    bucketed = (
        df.crossJoin(F.broadcast(rng))
        .withColumn(
            _PID,
            F.coalesce(F.when(span > 0, pid).otherwise(F.lit(0)), F.lit(0)),
        )
        .drop(_LO, _HI)
    )
    return pin(bucketed)


def _with_pid(
    df: DataFrame, order_cols: list[str], num_partitions: int | None
) -> DataFrame:
    """Dispatch: numeric first order column -> the lazy value-bucketed
    form; anything else (the ETL's string commit ids, the two-phase
    mix's domain-first order) -> the checkpoint-frozen range form,
    whose construction-time materialization is harmless there (those
    callers execute the pipeline immediately) and whose ordering
    supports arbitrary orderable types."""
    if isinstance(df.schema[order_cols[0]].dataType, _NUMERIC_FIRST):
        return _bucketed_with_pid(df, order_cols, num_partitions)
    return _ranged_with_pid(df, order_cols, num_partitions)


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
    ranged = _with_pid(df, order_cols, num_partitions)
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
    ranged = _with_pid(df, order_cols, num_partitions)
    return _attach_offsets(
        ranged,
        F.count(F.lit(1)),
        lambda w: F.row_number().over(w).cast("long"),
        order_cols,
        out_col,
    )
