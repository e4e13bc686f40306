"""Streaming tests (SURVEY §5 item 4): availableNow incremental ingestion,
idempotency under replayed/duplicate input, watermarked windowed rollup."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from riot_graphs_spark.streaming.ingest import (
    incremental_refresh,
    stream_events_rollup,
)


def _doc(day: int, sha: str, boards: dict[str, dict]) -> str:
    return json.dumps(
        {
            "ts": f"2024-01-{day:02d} 04:00:00",
            "sha": sha,
            "sizes": {"tests_shell": boards},
        }
    )


@pytest.fixture()
def dirs(tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    return {
        "landing": str(landing),
        "sink": str(tmp_path / "sink"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def test_incremental_refresh_and_idempotency(spark, dirs):
    landing = dirs["landing"]
    b = {"bss": 1, "text": 2, "data": 3, "count": 0}
    with open(f"{landing}/day1.json", "w") as f:
        f.write(_doc(1, "sha1", {"native": b, "samr21-xpro": b}))

    # First /update: 2 (test, board) rows land.
    n1 = incremental_refresh(spark, landing, dirs["sink"], dirs["ckpt"])
    assert n1 == 2

    # Second /update with no new files: checkpoint skips everything (O5).
    n2 = incremental_refresh(spark, landing, dirs["sink"], dirs["ckpt"])
    assert n2 == 2

    # New file arrives with one NEW key and one REPLAYED key → only the new
    # key lands (O2 idempotent merge).
    with open(f"{landing}/day1b.json", "w") as f:
        f.write(_doc(1, "sha1", {"native": b, "esp32": b}))
    n3 = incremental_refresh(spark, landing, dirs["sink"], dirs["ckpt"])
    assert n3 == 3

    sink = spark.read.parquet(dirs["sink"])
    assert sink.select("test", "board", "ts").distinct().count() == 3
    assert {r.board for r in sink.select("board").collect()} == {
        "native",
        "samr21-xpro",
        "esp32",
    }


def test_streaming_rollup_matches_batch(spark, sf_dir, tmp_path):
    from riot_graphs_spark.sources.tables import load_table

    # Materialize events as a file-stream source, run the watermarked rollup
    # with availableNow into a memory sink, compare against the batch agg.
    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_src")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        stream_events_rollup(spark, stream)
        .writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination()
    got = spark.table("rollup_test")

    expected = (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("bucket_start"), "event_type", "n")
    )
    diff = got.select("bucket_start", "event_type", "n").exceptAll(expected)
    # Append mode only emits windows closed by the watermark; everything
    # emitted must agree with batch, and most windows should have closed.
    assert diff.count() == 0
    assert got.count() >= expected.count() - 25  # open tail windows may be held back
