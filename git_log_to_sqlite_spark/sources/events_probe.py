"""Footer probe for the events table's physical ts encoding.

Shared by the batch choke point (plans/registry.table) and the
streaming replay source (streaming/replay.read_events_stream), so the
legacy-conf lifetime rule lives in exactly one place.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"

# path -> probed dtype. A physical-encoding switch only happens when the
# producer regenerates the file between driver rounds (never mid
# session), and every consumer builds a fresh session then — so one
# probe per path per process is sound, and repeated table()/replay
# calls in a bench or gate loop skip the extra footer listing+read.
_PROBE_CACHE: dict[str, str | None] = {}


def probe_events_ts(spark: SparkSession, path: str) -> str | None:
    """Return events' ``ts`` dtype as Spark reads it: ``"bigint"``
    (TIMESTAMP(NANOS) under the legacy conf), ``"timestamp_ntz"``
    (timestamp[us], no tz), or ``"timestamp"``.

    The probe needs ``spark.sql.legacy.parquet.nanosAsLong=true`` set
    *speculatively* — a TIMESTAMP(NANOS) footer makes the read throw
    without it. The conf cannot simply be restored afterwards in every
    case, because for a genuinely nanos-encoded file it must also be
    active when the returned DataFrame / stream EXECUTES, not just at
    probe time. So the scope rule is:

    * file is NOT nanos-encoded (the common case): restore the conf to
      its prior state — no session-wide side effect leaks, and a later
      batch read of some other table with a real TIMESTAMP(NANOS)
      column fails loudly instead of silently coming back as bigint;
    * file IS nanos-encoded: the conf stays set for the session, and
      every parquet read of a nanos column returns bigint — the
      invariant tests/test_event_time_encodings.py exercises.
    """
    if path in _PROBE_CACHE:
        probed = _PROBE_CACHE[path]
        if probed == "bigint":
            # cache hits must re-establish the invariant too: a nanos
            # frame built after the hit still needs the conf at
            # execution time.
            spark.conf.set(_NANOS_CONF, "true")
        return probed
    prior = spark.conf.get(_NANOS_CONF, None)
    spark.conf.set(_NANOS_CONF, "true")
    probed = dict(spark.read.parquet(path).dtypes).get("ts")
    if probed != "bigint":
        if prior is None:
            spark.conf.unset(_NANOS_CONF)
        else:
            spark.conf.set(_NANOS_CONF, prior)
    _PROBE_CACHE[path] = probed
    return probed
