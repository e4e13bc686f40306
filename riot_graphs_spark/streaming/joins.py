"""Stream-stream joins — the J1 build⋈event pairing (reference
``riot_graphs/rg.py:75-82, 226-253``) when BOTH sides arrive continuously.

Batch J1 is a plain equi-join; in streaming, an unbounded equi-join would
keep every row of both sides in state forever. Spark evicts state only when
the join condition also bounds event time on both sides — so the operator
takes an interval tolerance and folds it into the condition, exactly the
watermark + time-bound pattern from the Structured Streaming join docs.

Scale: state per key is (rows within the tolerance horizon) on each side;
eviction follows the slower watermark. The equi-key keeps the join hash-
partitioned — no broadcast, both sides shuffle on the key once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: str = "1 hour",
    left_watermark: str = "1 day",
    right_watermark: str = "1 day",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on an equi-key, accepting right rows whose event
    time lies within ±``tolerance`` of the left row's.

    Both inputs must be streaming DataFrames; watermarks are applied here so
    callers can't accidentally build an unbounded-state join. For outer
    variants Spark additionally requires the time bound to decide when an
    unmatched row is final — the same condition serves.  Outer semantics
    (pinned by ``test_stream_stream_left_outer_emits_nulls_only_after_
    watermark``): an unmatched outer-side row emits null-padded only AFTER
    the join watermark — the MIN across both inputs — passes its time bound
    (``ts + tolerance + delay``), never in the batch that read it, since a
    match could still arrive within the tolerance; expect outer rows to
    trail the inner results by up to tolerance + the slower watermark.
    """
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    # Disambiguate the ts columns for the output (the key stays shared).
    lts, rts = f"_l_{left_ts}", f"_r_{right_ts}"
    lw = lw.withColumnRenamed(left_ts, lts)
    rw = rw.withColumnRenamed(right_ts, rts)
    cond = (
        (lw[key] == rw[key])
        & (F.col(rts) >= F.col(lts) - F.expr(f"INTERVAL {tolerance}"))
        & (F.col(rts) <= F.col(lts) + F.expr(f"INTERVAL {tolerance}"))
    )
    return lw.join(rw, cond, how).drop(rw[key])
