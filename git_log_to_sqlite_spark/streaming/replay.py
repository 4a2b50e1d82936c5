"""Events replay source + streaming transformation builders.

The reference is strictly batch (SURVEY.md section 1.4); streaming is
engine surface we add for incremental ingestion. The file source
replays parquet in file order (``maxFilesPerTrigger=1`` gives one
micro-batch per file), which makes watermark progression deterministic
in tests.

At scale: the same builders run unchanged against a Kafka source; the
watermark bounds state (old windows are evicted once the event-time
watermark passes), so state size tracks the window span x key
cardinality, not stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", ts_type, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )


# TIMESTAMP(NANOS) files: Spark reads ts as raw LongType nanos under
# the legacy conf.
EVENTS_RAW_SCHEMA = _events_schema(T.LongType())

# timestamp[us] with no timezone: Spark reads TIMESTAMP_NTZ.
EVENTS_NTZ_SCHEMA = _events_schema(T.TimestampNTZType())

# timestamp[us, tz=UTC] / re-materialized event parquet: TIMESTAMP.
EVENTS_SCHEMA = _events_schema(T.TimestampType())


def with_event_time(df: DataFrame) -> DataFrame:
    """Normalize ``ts`` to TimestampType event time from any physical
    encoding: raw nanos (integer division — a double division would
    lose precision on 1e18-scale nanos) or TIMESTAMP_NTZ (cast under
    the UTC session TZ, wall clock preserved)."""
    ts_dtype = dict(df.dtypes).get("ts")
    if ts_dtype == "bigint":
        return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    if ts_dtype == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Replay parquet file(s) as a stream, one micro-batch per file.

    File-source schemas must be declared, never inferred — and a
    declared schema that disagrees with the file's physical encoding
    reads garbage **silently** (a LongType declaration over micros
    files yields values 1000x off, no error). So the encoding is never
    a caller-supplied flag: a one-time driver-side footer probe (a
    batch ``spark.read.parquet`` touches only metadata) picks the
    matching declared schema, and ``with_event_time`` normalizes to
    TIMESTAMP. Upstream writers have switched encodings before
    (TIMESTAMP(NANOS) -> timestamp[us]); this probe is what survives
    the next switch.
    """
    from ..sources.events_probe import probe_events_ts

    # The probe scopes the nanosAsLong legacy conf: restored unless the
    # file really is nanos-encoded (sources/events_probe.py has the
    # lifetime rule — a nanos file needs the conf at stream-execution
    # time too, so only the not-nanos path can undo it).
    probed = probe_events_ts(spark, path)
    if probed == "bigint":
        schema = EVENTS_RAW_SCHEMA
    elif probed == "timestamp_ntz":
        schema = EVENTS_NTZ_SCHEMA
    else:
        schema = EVENTS_SCHEMA
    reader = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    # The file-stream source requires a DIRECTORY basePath; a single
    # file becomes parent dir + glob filter.
    if path.endswith(".parquet") and not any(ch in path for ch in "*?["):
        parent, _, fname = path.rpartition("/")
        reader = reader.option("pathGlobFilter", fname)
        path = parent
    return with_event_time(reader.parquet(path))


# --- transformation builders (batch AND stream) ------------------------

def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window: count + value sum per (window,
    event_type). The watermark bounds streaming state; in batch it is
    a no-op (batch frames have complete data by definition)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def sliding_value_sum(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding window: each event lands in window/slide overlapping
    windows (here 2); state cost scales with the overlap factor."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "user_id", "n")
    )


def session_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows (gap-based): the streaming-native form of the
    batch lag-gap sessionization in plans/windows.events_sessionize."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful stream dedup on event_id: duplicates arriving within
    the watermark horizon are dropped; state for ids older than the
    watermark is evicted (bounded memory — plain dropDuplicates on a
    stream keeps ALL ids forever)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def typed_event_join(
    events_a: DataFrame,
    events_b: DataFrame,
    type_a: str = "click",
    type_b: str = "purchase",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: type-B events following a type-A event
    by the same user within ``within``.

    On streams, BOTH sides carry watermarks and the join condition
    includes the time bound — that pair is what lets Spark evict join
    state (a stream-stream join without a time bound buffers both
    streams forever). On batch frames the same builder is a plain
    range-condition join, which the equivalence test exploits.
    """
    a = events_a.filter(F.col("event_type") == type_a).select(
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
        F.col("event_id").alias("a_event"),
    )
    b = events_b.filter(F.col("event_type") == type_b).select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("event_id").alias("b_event"),
        F.col("value").alias("b_value"),
    )
    if events_a.isStreaming:
        a = a.withWatermark("a_ts", watermark)
        b = b.withWatermark("b_ts", watermark)
    return a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {within}")),
    ).select("a_user", "a_event", "b_event", "a_ts", "b_ts", "b_value")


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming frame to a memory sink synchronously; returns
    the query (stopped) after all available input is processed."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
