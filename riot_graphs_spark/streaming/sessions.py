"""Streaming sessionization: gap-based user sessions maintained
incrementally over an event stream.

The batch engine answers "what were yesterday's sessions" with the
gaps-and-islands operator (``operators/timeseries.session_windows`` —
SURVEY §2.6 O6); this is the always-on form: Structured Streaming's
``session_window`` aggregate merges a user's events into an open session
as they arrive, holds the session in state while it could still grow, and
FINALIZES it once the event-time watermark passes ``last_ts + gap`` — at
which point the row is emitted exactly once (append mode).  State per key
is one open session, evicted at finalization, so a 100 TB/day stream
holds state proportional to concurrently-active users, not history.

Late data: a row older than the watermark is dropped (the documented
tolerance contract of the other streaming operators); a row within the
watermark re-opens/merges its session before finalization — semantics a
hand-rolled stateful implementation gets wrong first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_session_stats(
    stream: DataFrame,
    ts: str = "ts",
    key: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    value: str | None = "value",
) -> DataFrame:
    """Per-(key, session) aggregate over a stream: session bounds, event
    count, and an exact decimal value sum.  Compose with
    ``writeStream.outputMode("append")`` — sessions emit exactly once,
    when finalized by the watermark.

    Output: ``(key, session_start timestamp, session_end timestamp,
    n_events bigint[, value_sum double])`` — ``session_end`` is
    exclusive (``last_ts + gap``), matching the batch operator.
    """
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value is not None:
        aggs.append(
            F.sum(F.col(value).cast("decimal(28,6)"))
            .cast("double")
            .alias("value_sum")
        )
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap), F.col(key))
        .agg(*aggs)
        .select(
            key,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            *(["value_sum"] if value is not None else []),
        )
    )
