"""Flagship query (SURVEY §7 step 2): per series, the daily *last* observation
and its day-over-day delta, annotated for dashboard display.

On the RIOT domain this is "per (test, board): last build size of each
03:00-anchored day, its delta vs the previous day, with the merged-PR
annotation" — A1 last-of-day + G5 lag delta + P12 formatting in one plan.
On the driver's ``events`` table the same shape is: per ``event_type``, the
last event value of each anchored day and its delta.

One shuffle for the last-of-day aggregate (partial-aggregable ``max_by``),
one for the per-series lag window — the minimum any engine needs here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import anchored_day
from ..operators.timeseries import delta_vs_prev, last_per_bucket


def daily_last_value_delta(
    events: DataFrame,
    dims: tuple[str, ...] = ("event_type",),
    anchor_hours: int = 3,
) -> DataFrame:
    """Per (anchored day, dims): last event's value + day-over-day delta.

    Output: ``day, *dims, last_event_id, last_value, delta`` — doubles are
    per-row arithmetic on already-aggregated scalars (deterministic).
    """
    last = last_per_bucket(
        events,
        ts="ts",
        dims=list(dims),
        payload=["event_id", "value"],
        bucket=anchored_day("ts", anchor_hours),
        tiebreak="event_id",
    ).select(
        F.col("bucket").alias("day"),
        *dims,
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )
    return delta_vs_prev(last, dims=list(dims), ts="day", value="last_value")
