"""Driver-gated Structured Streaming queries.

These entries run the REAL streaming engine end-to-end at the
correctness gate — not a batch twin: the events parquet is replayed
through ``spark.readStream``, flows through a watermarked stateful
operator (streaming aggregation / stream-stream join), lands in a
memory sink, and the materialized sink table is returned as the batch
result the driver hashes against the DuckDB oracle.

Determinism: the replay consumes every file in ONE micro-batch
(``maxFilesPerTrigger`` far above the file count). The event-time
watermark only advances AFTER a micro-batch completes, so no row can
be late relative to batch 0's watermark and the streaming result is
bit-equal to the batch semantics — which is exactly what makes an
exact oracle possible. Multi-batch replays (where the watermark DOES
drop late rows, state is evicted, and output modes differ) are
covered by the batch-equivalence suite in tests/test_streaming.py —
semantics the gate's hash comparison cannot express.

At scale the same builders (streaming/replay.py) run against a Kafka
source; state is bounded by the watermark horizon x key cardinality,
not stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import register

_SINK_SEQ = [0]


def _unique_sink(name: str) -> str:
    """Memory-sink query names are session-global; make each call's
    sink distinct so repeated gate/bench invocations never race a
    prior (stopped) query's registration."""
    _SINK_SEQ[0] += 1
    return f"{name}_{_SINK_SEQ[0]}"


@register(
    "stream_tumbling_replay",
    oracle="""
    SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT))
                AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="Structured Streaming end-to-end at the gate: events replayed "
    "via readStream -> withWatermark -> tumbling stateful aggregation "
    "(streaming/replay.py tumbling_counts) -> memory sink (complete "
    "mode), sink table returned. Single-micro-batch replay makes the "
    "stream result exactly the batch tumbling aggregate, so the "
    "events_window_tumbling oracle applies verbatim.",
)
def stream_tumbling_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.replay import read_events_stream, run_to_memory, tumbling_counts

    # read_events_stream probes the parquet footer itself and declares
    # the matching schema; no batch-side table() read is needed.
    stream = read_events_stream(
        spark, f"{sf_dir}/events.parquet", max_files_per_trigger=1_000_000
    )
    sink = _unique_sink("stream_tumbling_replay")
    run_to_memory(tumbling_counts(stream), sink, output_mode="complete")
    return spark.table(sink)


@register(
    "stream_session_replay",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked)
    SELECT CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
           user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="Streaming session windows end-to-end at the gate "
    "(streaming/replay.py session_agg): events replayed via readStream "
    "-> withWatermark -> session_window(ts, 30 min) stateful "
    "aggregation -> memory sink. The oracle rebuilds gap sessions with "
    "the lag-gap + running-sum composition; note the break condition "
    "is >= gap (session_window merges HALF-OPEN [ts, ts+gap) "
    "intervals, so an event landing exactly gap after its predecessor "
    "opens a NEW session — the one-sided difference from "
    "events_sessionize's strict > lag-gap semantics), and the window "
    "end is last_event + gap.",
)
def stream_session_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.replay import read_events_stream, run_to_memory, session_agg

    stream = read_events_stream(
        spark, f"{sf_dir}/events.parquet", max_files_per_trigger=1_000_000
    )
    sink = _unique_sink("stream_session_replay")
    run_to_memory(session_agg(stream), sink, output_mode="complete")
    return spark.table(sink)


@register(
    "stream_join_replay",
    oracle="""
    SELECT a.user_id AS a_user,
           a.event_id AS a_event,
           b.event_id AS b_event,
           CAST(a.ts AS TIMESTAMP) AS a_ts,
           CAST(b.ts AS TIMESTAMP) AS b_ts,
           b.value AS b_value
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    """,
    doc="Stream-stream time-bounded inner join at the gate "
    "(streaming/replay.py typed_event_join): both sides replayed via "
    "readStream with watermarks, joined on user + 1h event-time bound "
    "-> append-mode memory sink. Inner-join matches are emitted in the "
    "micro-batch that computes them, so the single-batch replay emits "
    "exactly the batch range-join result.",
)
def stream_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.replay import read_events_stream, run_to_memory, typed_event_join

    a = read_events_stream(
        spark, f"{sf_dir}/events.parquet", max_files_per_trigger=1_000_000
    )
    b = read_events_stream(
        spark, f"{sf_dir}/events.parquet", max_files_per_trigger=1_000_000
    )
    sink = _unique_sink("stream_join_replay")
    run_to_memory(typed_event_join(a, b), sink, output_mode="append")
    return spark.table(sink)


@register(
    "stream_dedup_replay",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
    FROM events
    """,
    doc="Stateful stream dedup at the gate (streaming/replay.py "
    "dedup_within_watermark): the events parquet is replayed TWICE and "
    "unioned, so every row genuinely arrives as a duplicate, then "
    "dropDuplicatesWithinWatermark('event_id') keeps exactly one copy "
    "per id -> append-mode memory sink. The oracle is the plain events "
    "table because event_id is unique in the source (pinned by the "
    "testdata contract test) and both copies of a row are bit-equal, "
    "so survivor choice cannot change values. Unlike a plain stream "
    "dropDuplicates (which retains every id forever), state here is "
    "evicted once the watermark passes an id's event time — bounded "
    "memory on an unbounded stream.",
)
def stream_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.replay import (
        dedup_within_watermark,
        read_events_stream,
        run_to_memory,
    )

    a = read_events_stream(
        spark, f"{sf_dir}/events.parquet", max_files_per_trigger=1_000_000
    )
    b = read_events_stream(
        spark, f"{sf_dir}/events.parquet", max_files_per_trigger=1_000_000
    )
    sink = _unique_sink("stream_dedup_replay")
    run_to_memory(dedup_within_watermark(a.unionByName(b)), sink, output_mode="append")
    return spark.table(sink).select("event_id", "ts", "user_id", "event_type", "value")
