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


def test_heavy_hitters_bounded_state_and_guarantee(spark, tmp_path):
    """Misra-Gries per bucket: a token with frequency > N/(k+1) must survive
    every batch; state never exceeds k counters per bucket; counts carry
    across micro-batches via the state store."""
    import json as _json

    from riot_graphs_spark.streaming.stateful import stream_heavy_hitters

    src = tmp_path / "tok_landing"
    src.mkdir()
    ckpt = str(tmp_path / "hh_ckpt")
    out = str(tmp_path / "hh_out")

    def write_batch(name: str, tokens: list[str]) -> None:
        (src / name).write_text(
            "\n".join(_json.dumps({"token": t}) for t in tokens)
        )

    def run() -> None:
        stream = spark.readStream.schema("token string").json(str(src))
        q = (
            stream_heavy_hitters(stream, k=3, n_buckets=1)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

    # batch 1: 'hot' dominates; lots of singleton noise
    write_batch("a.jsonl", ["hot"] * 30 + [f"n{i}" for i in range(20)])
    run()
    rows1 = spark.read.parquet(out).collect()
    latest1 = [r for r in rows1 if r.batch_id == max(r.batch_id for r in rows1)]
    assert len(latest1) <= 3  # bounded state: k counters max
    assert "hot" in {r.token for r in latest1}

    # batch 2: new dominant token; 'hot' keeps riding the carried state
    write_batch("b.jsonl", ["hot"] * 10 + ["warm"] * 25 + [f"m{i}" for i in range(10)])
    run()
    rows2 = spark.read.parquet(out).collect()
    latest = [r for r in rows2 if r.batch_id == max(r.batch_id for r in rows2)]
    assert len(latest) <= 3
    toks = {r.token for r in latest}
    assert {"hot", "warm"} <= toks
    hot = next(r for r in latest if r.token == "hot")
    # MG guarantee: understatement <= N/(k+1); N = 95 tokens total, true
    # hot count = 40 -> min_count >= 40 - 95/4 = 16.25
    assert hot.min_count >= 17
