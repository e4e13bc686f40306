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


def histogram_partials(
    df: DataFrame,
    dims: Sequence[str],
    ts: str = "ts",
    value: str = "value",
    lo: float = 0.0,
    hi: float = 1.0,
    nbuckets: int = 50,
    grain: str = "day",
) -> DataFrame:
    """Mergeable QUANTILE state at the finest grain: a fixed-boundary
    equi-width histogram per (``grain`` bucket, dims) — one row per
    non-empty bin.  Bin counts are plain ints, so merging day states into
    a week is exact addition: the one aggregate family
    :func:`daily_partials` could not carry (avg-style derived quantiles
    are non-mergeable; bin counts are), closing the "weekly p95 panel
    without rescanning the fact" gap.

    Bin index is the same clamped ``floor((x - lo) / width)`` arithmetic
    as ``profile.fixed_histogram`` (bit-identical across engines, stays in
    whole-stage codegen; out-of-range values land in the edge bins so
    totals reconcile with ``count(*)``).  NULL values are excluded.  The
    bin's lower edge rides along as a derived column so readers never need
    the (lo, hi, nbuckets) spec again.

    Output: ``(bucket timestamp, *dims, bin int, edge_lo double,
    n bigint)``.
    """
    if nbuckets < 1 or not hi > lo:
        raise ValueError("need nbuckets >= 1 and hi > lo")
    width = (hi - lo) / nbuckets
    x = F.col(value)
    bucket_bin = F.greatest(
        F.lit(0),
        F.least(F.lit(nbuckets - 1), F.floor((x - F.lit(lo)) / F.lit(width))),
    ).cast("int")
    return (
        df.filter(x.isNotNull())
        .groupBy(
            F.date_trunc(grain, F.col(ts)).alias("bucket"),
            *dims,
            bucket_bin.alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "edge_lo", F.lit(lo) + F.col("bin").cast("double") * F.lit(width)
        )
        .select("bucket", *dims, "bin", "edge_lo", "n")
    )


def merge_histogram_to_grain(
    partials: DataFrame, dims: Sequence[str], grain: str = "week"
) -> DataFrame:
    """Merge finer-grain histogram states into ``grain`` buckets — bin
    counts ADD, exactly, so day→week merge equals the histogram computed
    directly from the fact (the invariant the registered query pins
    against the SQL oracle).  Shuffles only partial rows, never the fact.
    """
    return (
        partials.groupBy(
            F.date_trunc(grain, F.col("bucket")).alias("bucket"),
            *dims,
            "bin",
            "edge_lo",
        )
        .agg(F.sum("n").alias("n"))
        .select("bucket", *dims, "bin", "edge_lo", "n")
    )


def histogram_percentiles(
    hist: DataFrame,
    dims: Sequence[str],
    percentiles: Sequence[int] = (50, 95, 99),
) -> DataFrame:
    """Derive nearest-rank percentiles (at bin resolution) from a
    histogram-state table at read time: per (bucket, dims), ``pQQ`` is the
    LOWER EDGE of the first bin whose cumulative count reaches QQ% of the
    group — the deterministic integer comparison ``100·cum >= QQ·total``
    (no floating-point rank), so the result is engine-identical given
    identical bin counts.

    Resolution is the bin width by construction: the answer is exact to
    within one bin, the textbook fixed-histogram quantile guarantee; size
    ``nbuckets`` to the dashboard's tolerance.  Percentile targets are
    integer percents (50, 95, 99…).

    The window runs over bins WITHIN one (bucket, dims) group — state-
    table-sized (≤ nbuckets rows per group), never fact-sized.

    Output: ``(bucket, *dims, n_rows bigint, p50 double, p95 double, …)``.
    """
    from pyspark.sql import Window

    for q in percentiles:
        if not 0 < q <= 100:
            raise ValueError("percentiles are integer percents in (0, 100]")
    keys = ["bucket", *dims]
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*keys)
    c = hist.withColumn("cum", F.sum("n").over(w_cum)).withColumn(
        "tot", F.sum("n").over(w_tot)
    )
    aggs = [F.max("tot").alias("n_rows")]
    for q in percentiles:
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") * 100 >= F.lit(int(q)) * F.col("tot"),
                    F.col("edge_lo"),
                )
            ).alias(f"p{int(q)}")
        )
    return c.groupBy(*keys).agg(*aggs)


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
