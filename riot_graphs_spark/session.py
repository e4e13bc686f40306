"""SparkSession factory with defaults chosen for both local testing and
cluster-scale execution.

Design notes (100 TB posture, SURVEY §4):

- AQE is always on: runtime partition coalescing, skew-join splitting, and
  dynamic join-strategy switching replace hand-tuned shuffle counts when the
  same plan runs on a 1000-executor cluster.
- ``spark.sql.session.timeZone`` is pinned to UTC — the reference mixes naive
  and tz-aware datetimes (``rg.py:101`` vs ``rg.py:62-67``); we are tz-correct
  by construction.
- ``spark.sql.legacy.parquet.nanosAsLong`` lets Spark read TIMESTAMP(NANOS)
  parquet columns (the driver's ``events.ts``); :mod:`..sources.tables`
  converts them back to TimestampType losslessly at microsecond precision.
- Arrow is enabled so the few pandas-UDF operators (text wrap P13, multimodal
  decode stubs) move data in columnar batches, never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime SQL confs applied even when the caller (e.g. the verify driver)
# hands us an already-built session.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Naive (no-tz) parquet timestamps must land as TIMESTAMP (LTZ, session
    # tz pinned to UTC above), not TIMESTAMP_NTZ: event-time watermarks and
    # window() require TIMESTAMP, and batch/stream must see identical types.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Set runtime confs on an externally-provided session (idempotent)."""
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Static confs on a running session — keep whatever it has.
            pass
    return spark


def get_spark(
    app_name: str = "riot-graphs-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``shuffle_partitions`` defaults to the local core count — right for test
    scale factors; on a real cluster AQE coalescing makes the initial number
    mostly irrelevant as long as it is not absurdly small.
    """
    master = master or os.environ.get(
        "SPARK_GRAFT_MASTER", f"local[{default_parallelism()}]"
    )
    nshuffle = shuffle_partitions or default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    return apply_runtime_confs(builder.getOrCreate())
