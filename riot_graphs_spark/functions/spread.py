"""Scan-parallelism guard for per-row-heavy pipelines.

A small or compacted table (one parquet row group) arrives as ONE input
split, so every row-local-expensive stage built on it — tokenize +
shingle + MinHash, per-bit SimHash terms, winnowing sparse tables,
language-profile scoring — runs on a single task while every other core
idles (optimization guide §2.6, stragglers and idle capacity).  Row-group
granularity means ``spark.sql.files.maxPartitionBytes`` cannot split such
a file, so the only fix is an explicit round-robin spread.

The spread is GATED: it fires only when the scan has fewer splits than
the cluster has slots, so at real scale (any table big enough to have
>= cores row groups) it is a no-op and no extra exchange appears in the
plan.  It is applied inside the per-row-heavy operators — never blanket
at the table reader — because a scan-light query (an md5 fingerprint, a
projection) loses more to the extra stage than the parallelism returns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin-repartition *df* to the default parallelism when (and
    only when) its current plan yields fewer partitions — the
    under-partitioned-scan straggler fix for compute-heavy per-row
    pipelines.  Results are row-local and therefore identical under any
    partitioning; round-robin repartition is deterministic under task
    retry (Spark sorts before repartitioning, SPARK-23207)."""
    if df.isStreaming:
        # partition counting needs a batch plan; micro-batches get their
        # parallelism from the source anyway
        return df
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
