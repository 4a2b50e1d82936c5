"""Structured Streaming surface: events replay + windowed aggregations.

Batch-stream parity by construction: every transformation builder in
``replay.py`` takes a DataFrame — batch-read or stream-read — and
returns the transformed frame. The batch-equivalence tests (SURVEY.md
section 5.2.3) apply the SAME builder to both and assert equal results.
"""

from .replay import (
    dedup_within_watermark,
    typed_event_join,
    read_events_stream,
    run_to_memory,
    session_agg,
    sliding_value_sum,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_value_sum",
    "session_agg",
    "dedup_within_watermark",
    "typed_event_join",
    "run_to_memory",
]
