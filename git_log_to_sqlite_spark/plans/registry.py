"""Query registry + the canonicalization rules that make results
hash-comparable between Spark and DuckDB.

Canonicalization rules (applied inside every query, both engines):

* **Money sums are exact.** Sums over double columns are computed as
  ``SUM(CAST(x AS DECIMAL(18,4)))`` then cast back to DOUBLE — decimal
  addition is associative, so partial aggregation order (Spark's
  map-side combine, DuckDB's parallel groups) cannot change the result.
  A plain double sum over 60k rows can drift in the last bits depending
  on reduction order.
* **Averages are a deterministic division**: exact decimal sum cast to
  double, divided by the count — same IEEE operands on both sides.
* **Ratios/statistics are rounded** (6 dp) — they are float-unstable by
  nature but land far from rounding boundaries at these magnitudes.
* **Every computed column is aliased identically** in the Spark plan
  and the oracle SQL (the driver sorts columns by name before hashing).
* **Integer widths match**: DuckDB's ``year()`` is BIGINT and ``SUM``
  of integers is HUGEINT; the oracle SQL casts them to the width Spark
  produces (INT / BIGINT).
* **Top-k always breaks ties** with a unique key so LIMIT is stable.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a Spark query (and its oracle SQL) to the corpus."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return wrap


def spark_queries() -> dict[str, SparkQuery]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver table. Plain parquet read — filters/projections
    in the calling query push down into this scan.

    ``events.ts`` is normalized to TIMESTAMP here — the single choke
    point — whatever the producer's physical encoding, because upstream
    writers change encodings over time (this repo has seen both):

    * ``TIMESTAMP(NANOS)``: Spark's parquet reader rejects it natively;
      read as raw nanos (legacy conf) and converted with integer
      division (a double division would lose precision on 1e18-scale
      nanos). DuckDB truncates the same nanos to micros — identical.
    * ``timestamp[us]`` with no timezone (Spark TIMESTAMP_NTZ): cast to
      session-TZ TIMESTAMP. The session TZ is pinned to UTC, so the
      wall-clock reading — and therefore the epoch value DuckDB's naive
      TIMESTAMP read produces — is unchanged.
    * ``timestamp[us, tz=UTC]`` (plain TIMESTAMP): passthrough.

    Schemas are served from the fingerprint-keyed cache
    (``sources.schema_cache``) so repeated ``table()`` calls — every
    query construction, every bench pass — skip parquet schema
    inference (a measured ~0.19 s listing+footer job per plain
    ``spark.read.parquet`` call, ~6x the explicit-schema read);
    rewritten files re-infer via the fingerprint, unstattable paths
    fall back to plain inference.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        from pyspark.sql import functions as F

        from ..sources.events_probe import probe_events_ts
        from ..sources.schema_cache import cached_parquet_schema

        ts_dtype = probe_events_ts(spark, path)  # scopes the legacy conf
        # probe first, THEN schema: a nanos file's schema (ts bigint)
        # is only inferable/cacheable under the conf the probe latches.
        schema = cached_parquet_schema(spark, path)
        reader = spark.read.schema(schema) if schema is not None else spark.read
        df = reader.parquet(path)
        if ts_dtype == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        elif ts_dtype == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    from ..sources.schema_cache import read_parquet_cached

    return read_parquet_cached(spark, path)
