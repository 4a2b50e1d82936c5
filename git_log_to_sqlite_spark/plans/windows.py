"""Window functions: ranking, analytic, frames, time buckets,
sessionization.

Every window has a deterministic total order (ties broken by a unique
key) so row_number/lag/frames are oracle-reproducible.  At scale the
partition key matters more than the function: windows partitioned by a
high-cardinality key (custkey, user_id) parallelize per key group; an
unpartitioned window is a single-task bottleneck and appears here only
where the input is provably tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, table
from .relational import _DSUM, dsum


def _epoch_seconds(col):
    """Fractional epoch seconds from any timestamp flavor. The leading
    TIMESTAMP cast makes the expression NTZ-proof: ``CAST(ntz AS
    DOUBLE)`` throws DATATYPE_MISMATCH, while NTZ -> TIMESTAMP is legal
    and (with the session TZ pinned to UTC) preserves the wall clock.
    On an already-TIMESTAMP column the extra cast folds away."""
    return col.cast("timestamp").cast("double")


@register(
    "win_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
    doc="Top-3 orders per customer — the canonical top-k-per-group: "
    "one shuffle on the partition key, per-group sort, early filter.",
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "win_ranking_suite",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4)     OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cdist
    FROM orders WHERE o_orderkey < 2000
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
    doc="rank / dense_rank / ntile / percent_rank / cume_dist over "
    "one shared window definition.",
)
def win_ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_totalprice)  OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           CAST(o_orderdate AS DATE) - CAST(LAG(o_orderdate) OVER w AS DATE)
             AS days_since_prev
    FROM orders WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="lag/lead analytics + inter-order gap in days.",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
        ).alias("days_since_prev"),
    )


@register(
    "win_running_frames",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
             AS moving_avg4
    FROM orders WHERE o_custkey < 100
    """,
    doc="ROWS frames: running total + 4-row moving average, decimal-"
    "exact inside the frame.",
)
def win_running_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    order = [F.col("o_orderdate"), F.col("o_orderkey")]
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_mov = Window.partitionBy("o_custkey").orderBy(*order).rowsBetween(-3, 0)
    dec = F.col("o_totalprice").cast("decimal(18,4)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec).over(w_run).cast("double").alias("running_total"),
        (F.sum(dec).over(w_mov).cast("double") / F.count("*").over(w_mov)).alias(
            "moving_avg4"
        ),
    )


@register(
    "win_first_last_nth",
    oracle="""
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER w AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order
    FROM orders WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="first/last/nth over an explicit full frame (the default frame "
    "makes LAST_VALUE the current row — a classic trap; both engines "
    "get the explicit frame).",
)
def win_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    ).distinct()


@register(
    "win_range_between",
    oracle="""
    SELECT o_custkey, o_orderkey, day_no,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY day_no
                          RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
             AS orders_last_90d
    FROM (SELECT o_custkey, o_orderkey,
                 CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS day_no
          FROM orders WHERE o_custkey < 100) t
    """,
    doc="RANGE frame over a numeric day offset: orders in the trailing "
    "90 days per customer (value-based, not row-based).",
)
def win_range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    day_no = F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
    w = Window.partitionBy("o_custkey").orderBy("day_no").rangeBetween(-90, 0)
    return o.select(
        "o_custkey", "o_orderkey", day_no.alias("day_no")
    ).withColumn("orders_last_90d", F.count("*").over(w))


@register(
    "win_time_bucket",
    oracle=f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           o_orderpriority,
           COUNT(*) AS n_orders,
           {_DSUM('o_totalprice')} AS month_value
    FROM orders GROUP BY 1, 2
    """,
    doc="Time-bucketed rollup via date_trunc (SURVEY 2.2 prefers "
    "date_trunc over window() for oracle parity).",
)
def win_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
            F.col("o_orderpriority"),
        )
        .agg(F.count("*").alias("n_orders"), dsum(F.col("o_totalprice")).alias("month_value"))
    )


@register(
    "events_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked)
    SELECT user_id, CAST(session_id AS INT) AS session_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="Batch sessionization: lag-gap flag + running sum = session id "
    "(the composition the streaming session_window operator mirrors; "
    "batch-equivalence is tested in tests/test_streaming.py).",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    # Both windows order by (ts, event_id): the lag-gap flag AND the
    # running sum must walk rows in the same total order, or two events
    # with equal (user_id, ts) where the first is a session break could
    # be summed in opposite orders by Spark and the oracle, splitting
    # sessions differently (pinned by the tie-case test in
    # tests/test_plans.py).
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap = _epoch_seconds(F.col("ts")) - _epoch_seconds(F.lag(F.col("ts")).over(w))
    new_session = F.when(gap.isNull() | (gap > 30 * 60.0), 1).otherwise(0)
    return (
        e.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(w_run).cast("int"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            dsum(F.col("value")).alias("session_value"),
        )
    )


@register(
    "events_window_tumbling",
    oracle=f"""
    SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT))
                AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n,
           {_DSUM('value')} AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="Tumbling 1-hour window aggregate in batch form — the exact "
    "shape the streaming query in streaming/replay.py runs; Spark uses "
    "the native window() operator, the oracle floors epoch seconds.",
)
def events_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value")).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "events_funnel_depth",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id),
    u AS (SELECT DISTINCT user_id FROM events)
    SELECT u.user_id,
           CASE WHEN t3 IS NOT NULL THEN 3
                WHEN t2 IS NOT NULL THEN 2
                WHEN t1 IS NOT NULL THEN 1
                ELSE 0 END AS funnel_depth
    FROM u
    LEFT JOIN v ON v.user_id = u.user_id
    LEFT JOIN c ON c.user_id = u.user_id
    LEFT JOIN p ON p.user_id = u.user_id
    """,
    doc="Ordered funnel (view -> click -> purchase, strictly "
    "increasing timestamps): per-user funnel depth. Spark computes all "
    "three stage times as STACKED windows over the same user partition "
    "— the conditional mins nest (stage n filters on stage n-1's "
    "window value), so the whole funnel is ONE exchange + sort reused "
    "by three Window nodes, versus the oracle's three join-aggregate "
    "rounds. The classic sequential-pattern query without a "
    "match_recognize engine.",
)
def events_funnel_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    e = e.withColumn("t1", t1)
    t2 = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
    ).over(w)
    e = e.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    e = e.withColumn("t3", t3)
    depth = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return e.select("user_id", depth.alias("funnel_depth")).distinct()


@register(
    "events_cohort_retention",
    oracle="""
    WITH first_ev AS (
      SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id,
             CAST(date_trunc('week', f.first_ts) AS TIMESTAMP) AS cohort_week,
             CAST(floor((epoch(e.ts) - epoch(f.first_ts)) / 604800.0) AS INT)
               AS week_offset
      FROM events e JOIN first_ev f ON e.user_id = f.user_id)
    SELECT cohort_week, week_offset, COUNT(*) AS n_users
    FROM activity GROUP BY cohort_week, week_offset
    """,
    doc="Cohort retention: users grouped by first-seen ISO week, "
    "counted per whole-week offset of later activity. Week offsets "
    "come from fractional epoch-second arithmetic (cast timestamp to "
    "double) so both engines floor identical IEEE values — "
    "unix_timestamp() truncation would disagree with DuckDB's "
    "fractional epoch() at week boundaries. ONE data-sized exchange "
    "(round-6 reshape; the funnel query's pattern): first_ts is "
    "min(ts) OVER (PARTITION BY user_id) instead of a groupBy+join-"
    "back, and the following distinct reuses the window's hash(user_id)"
    " partitioning — HashPartitioning on a SUBSET of the grouping keys "
    "satisfies ClusteredDistribution, so no second data shuffle; only "
    "the bounded cohort rollup shuffles after that (plan-pinned in "
    "tests/test_plans.py).",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    first_ts = F.min("ts").over(Window.partitionBy("user_id"))
    activity = e.select(
        "user_id",
        F.date_trunc("week", first_ts).alias("cohort_week"),
        F.floor(
            (_epoch_seconds(F.col("ts")) - _epoch_seconds(first_ts)) / 604800.0
        )
        .cast("int")
        .alias("week_offset"),
    ).distinct()
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_users")
    )


@register(
    "events_window_sliding",
    oracle=f"""
    SELECT CAST(to_timestamp((CAST(floor(epoch(ts) / 3600) AS BIGINT) - j) * 3600)
                AS TIMESTAMP) AS window_start,
           COUNT(*) AS n,
           {_DSUM('value')} AS total_value
    FROM events CROSS JOIN (SELECT unnest([0, 1]) AS j) offs
    GROUP BY 1
    """,
    doc="Sliding 2-hour window, 1-hour slide, in batch form (the "
    "overlap twin of events_window_tumbling; the streaming equivalent "
    "is sliding_value_sum in streaming/replay.py). Spark's window() "
    "fans each event into its two covering windows; the oracle "
    "replicates the fan-out with an explicit 0/1 hour-offset unnest. "
    "to_timestamp is CAST to naive TIMESTAMP (DuckDB returns "
    "TIMESTAMPTZ otherwise — the round-1 tumbling bug).",
)
def events_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), dsum(F.col("value")).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


@register(
    "events_top_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events)
    SELECT prev AS prev_type, event_type AS next_type,
           COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
    FROM seq WHERE prev IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="Sequential path mining: consecutive event-type transitions per "
    "user (lag over the per-user time order, ties broken by event_id "
    "for determinism) aggregated into the corpus transition matrix — "
    "the navigation-pattern shape behind funnel discovery. One "
    "exchange on user_id for the lag window, then a partial+final agg "
    "on the (prev, next) pair.",
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    return seq.groupBy(
        F.col("prev").alias("prev_type"), F.col("event_type").alias("next_type")
    ).agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )
