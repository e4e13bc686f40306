"""applyInPandasWithState operator tests: delta continuity across
micro-batch boundaries (the state carry-over a batch lag() can't provide
on a stream), and parity with the batch delta operator."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from riot_graphs_spark.streaming.stateful import stream_size_deltas

SCHEMA = StructType(
    [
        StructField("test", StringType()),
        StructField("board", StringType()),
        StructField("ts", TimestampType()),
        StructField("text", LongType()),
    ]
)


def build(day: int, board: str, text: int) -> Row:
    return Row(
        test="t", board=board, ts=dt.datetime(2024, 1, day, 4), text=text
    )


def _run_batch(spark, src: str, ckpt: str, out: str) -> None:
    # parquet sink: unlike the memory sink it supports checkpoint recovery,
    # which is the whole point of the cross-trigger test
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        stream_size_deltas(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()


def test_state_carries_across_triggers(spark, tmp_path):
    src, ckpt, out = (
        str(tmp_path / "src"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )

    spark.createDataFrame(
        [build(1, "b1", 100), build(2, "b1", 110), build(1, "b2", 50)], SCHEMA
    ).write.mode("append").parquet(src)
    _run_batch(spark, src, ckpt, out)
    got1 = {
        (r.board, r.ts.day): (r.text, r.delta)
        for r in spark.read.parquet(out).collect()
    }
    assert got1[("b1", 1)] == (100, None)  # first-ever: no previous
    assert got1[("b1", 2)] == (110, 10)
    assert got1[("b2", 1)] == (50, None)

    # Second trigger: delta of the first new row must use the STATE
    # (110 from the previous run), not restart at NULL.
    spark.createDataFrame(
        [build(3, "b1", 95), build(2, "b2", 70)], SCHEMA
    ).write.mode("append").parquet(src)
    _run_batch(spark, src, ckpt, out)
    got2 = {
        (r.board, r.ts.day): (r.text, r.delta)
        for r in spark.read.parquet(out).collect()
    }
    assert got2[("b1", 3)] == (95, -15)  # 95 - 110: state carried
    assert got2[("b2", 2)] == (70, 20)  # 70 - 50
    assert len(got2) == 5  # first-run rows not re-emitted


def test_matches_batch_delta_operator(spark, tmp_path):
    from riot_graphs_spark.operators.timeseries import delta_vs_prev

    rows = [build(d, "b1", 100 + 7 * d * (-1) ** d) for d in range(1, 9)] + [
        build(d, "b2", 200 + 3 * d) for d in range(1, 6)
    ]
    df = spark.createDataFrame(rows, SCHEMA)

    src, ckpt, out = (
        str(tmp_path / "src"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    df.write.parquet(src)
    _run_batch(spark, src, ckpt, out)

    streamed = spark.read.parquet(out).select("board", "ts", "delta")
    batch = delta_vs_prev(df, dims=["test", "board"], ts="ts", value="text").select(
        "board", "ts", "delta"
    )
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
