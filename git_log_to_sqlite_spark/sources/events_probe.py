"""Footer probe for the events table's physical ts encoding.

Shared by the batch choke point (plans/registry.table) and the
streaming replay source (streaming/replay.read_events_stream), so the
legacy-conf lifetime rule lives in exactly one place.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"

# (path, file fingerprint) -> probed dtype. The fingerprint (size +
# mtime of the parquet file(s), see _fingerprint) makes a regenerated
# file invalidate its entry even inside one process lifetime — a
# re-encoded events.parquet must never be served the stale dtype, which
# would silently misdecode every ts by 1000x. Repeated table()/replay
# calls on the unchanged file still skip the extra footer listing+read.
_PROBE_CACHE: dict[tuple[str, tuple], str | None] = {}


def _fingerprint(path: str) -> tuple:
    """Cheap local-file identity for cache invalidation: (size,
    mtime_ns) of the file, or of every FILE under a directory of part
    files, walked recursively — partitioned layouts nest part files
    one level down (``date=.../part-*.parquet``), and a directory's
    own mtime does NOT change when a child file is rewritten in place,
    so a top-level-only listing would serve a stale dtype for exactly
    the in-place re-encode this cache key exists to catch. Non-local /
    unstattable paths (object stores) return a constant — those fall
    back to path-only caching, the pre-round-7 behavior, which is
    sound as long as the remote file is not regenerated mid-process."""
    def _raise(err: OSError) -> None:
        # os.walk's default is to silently SKIP unlistable directories,
        # which would return a fingerprint that omits their part files
        # — a later in-place rewrite there would not change the cache
        # key. Re-raise so the except below falls back to the safe
        # "unstattable" constant (= path-only caching) instead.
        raise err

    try:
        st = os.stat(path)
        if os.path.isdir(path):
            entries = []
            for root, _dirs, files in os.walk(path, onerror=_raise):
                rel = os.path.relpath(root, path)
                for name in files:
                    fst = os.stat(os.path.join(root, name))
                    entries.append(
                        (os.path.join(rel, name), fst.st_size, fst.st_mtime_ns)
                    )
            return tuple(sorted(entries))
        return (st.st_size, st.st_mtime_ns)
    except OSError:
        return ("unstattable",)


#: Public alias — sources.schema_cache keys its schema cache on the
#: same content fingerprint so the two caches invalidate identically.
content_fingerprint = _fingerprint


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
    * probe read THROWS (missing/corrupt path): restore the prior state
      before re-raising — a failed probe must not leave the speculative
      conf latched session-wide (the exact silent-bigint leak this
      module exists to prevent);
    * file IS nanos-encoded: the conf stays set for the session, and
      every parquet read of ANY nanos column in that session returns
      bigint — the invariant tests/test_event_time_encodings.py
      exercises. This bakes in the single-nanos-table assumption:
      ``events`` is the only nanos-candidate table in this engine's
      data model, so no OTHER table's read can be silently widened by
      the latched conf. A deployment adding a second
      TIMESTAMP(NANOS)-encoded table must normalize it through the
      same choke point (plans/registry.table) rather than reading it
      raw while an events probe may have latched the conf —
      tests/test_event_time_encodings.py::test_latched_nanos_conf_is_session_wide
      pins the latched behavior so the assumption is explicit.
    """
    key = (path, _fingerprint(path))
    if key in _PROBE_CACHE:
        probed = _PROBE_CACHE[key]
        if probed == "bigint":
            # cache hits must re-establish the invariant too: a nanos
            # frame built after the hit still needs the conf at
            # execution time.
            spark.conf.set(_NANOS_CONF, "true")
        return probed
    prior = spark.conf.get(_NANOS_CONF, None)
    spark.conf.set(_NANOS_CONF, "true")
    try:
        probed = dict(spark.read.parquet(path).dtypes).get("ts")
    except Exception:
        if prior is None:
            spark.conf.unset(_NANOS_CONF)
        else:
            spark.conf.set(_NANOS_CONF, prior)
        raise
    if probed != "bigint":
        if prior is None:
            spark.conf.unset(_NANOS_CONF)
        else:
            spark.conf.set(_NANOS_CONF, prior)
    _PROBE_CACHE[key] = probed
    return probed
