"""Incremental materialized-aggregate maintenance: mergeable partial states.

The 100 TB pattern behind every "daily dashboard over years of events"
surface (the reference's nightly cron materializes exactly one day per run
— ``/root/reference/rg.py`` appends a day of build rows, and Grafana's
weekly/monthly panels re-aggregate in InfluxDB): keep a PARTIAL-AGGREGATE
table at the finest grain (day), and answer every coarser rollup (week,
month, all-time) by MERGING states — never by rescanning the fact table.

The states here are the classic commutative-monoid set: ``count`` and
``sum`` add, ``min``/``max`` combine by min/max, and ``avg`` is derived at
read time as ``sum / count`` (storing avg itself would make states
non-mergeable — the textbook partial-aggregation rule, same as Spark's own
partial/final HashAggregate split).  Sums are carried in ``decimal(28,6)``
so merge order can never change a result bit — which is also what makes
two-level (day → week) aggregation provably EQUAL to direct aggregation,
the invariant the registered query pins against the SQL oracle.

Maintenance is idempotent: :func:`upsert_partials` replaces the states of
the re-delivered grain keys (CDC-style), so replaying a day is a no-op and
a corrected day overwrites cleanly.  At scale the partial table is
date-partitioned and tiny relative to the fact (one row per (day, dims)),
and the weekly/monthly merge shuffles only partial rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(28,6)"

#: State columns produced by :func:`daily_partials` / consumed by merges.
STATE_COLS = ("n_rows", "sum_value", "min_value", "max_value")


def daily_partials(
    df: DataFrame,
    dims: Sequence[str],
    ts: str = "ts",
    value: str = "value",
    grain: str = "day",
) -> DataFrame:
    """One partial-aggregate state row per (``grain`` bucket, dims).

    Output: ``(bucket timestamp, *dims, n_rows bigint,
    sum_value decimal(28,6), min_value double, max_value double)`` —
    the finest-grain materialization a rollup table stores.
    """
    return df.groupBy(
        F.date_trunc(grain, F.col(ts)).alias("bucket"), *dims
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(value).cast(_DEC)).alias("sum_value"),
        F.min(value).alias("min_value"),
        F.max(value).alias("max_value"),
    )


def merge_to_grain(
    partials: DataFrame, dims: Sequence[str], grain: str = "week"
) -> DataFrame:
    """Merge finer-grain partial states into ``grain`` buckets — counts and
    sums add, min/max combine; no fact-table access.  Emits the derived
    ``avg_value`` beside the still-mergeable states.

    Output: ``(bucket, *dims, n_rows, sum_value, min_value, max_value,
    avg_value double)``.
    """
    merged = partials.groupBy(
        F.date_trunc(grain, F.col("bucket")).alias("bucket"), *dims
    ).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_value").cast(_DEC).alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )
    # double/double division, not decimal division: Spark and DuckDB give
    # decimal quotients different intermediate scales, while the two exact
    # decimal-derived doubles divide identically in IEEE arithmetic.
    return merged.withColumn(
        "avg_value",
        F.col("sum_value").cast("double") / F.col("n_rows").cast("double"),
    )


def upsert_partials(
    existing: DataFrame, fresh: DataFrame, dims: Sequence[str]
) -> DataFrame:
    """Idempotent maintenance step: the re-delivered (bucket, dims) keys in
    ``fresh`` REPLACE their rows in ``existing``; all other rows pass
    through.  Replaying the same day twice is a no-op; a corrected day
    overwrites.  One anti-join on the grain key — at scale, pair with the
    partition-pruned dynamic-overwrite sink (``sources/sinks.py``) so only
    touched date partitions rewrite.
    """
    keys = ["bucket", *dims]
    kept = existing.join(fresh.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(fresh)
