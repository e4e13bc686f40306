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

    # First /update: 2 (test, board) rows land; the return is the DELTA
    # ingested by this call (reference rg.py:156), not the sink total.
    n1 = incremental_refresh(spark, landing, dirs["sink"], dirs["ckpt"])
    assert n1 == 2

    # Second /update with no new files: checkpoint skips everything (O5),
    # so the ingested delta is 0.
    n2 = incremental_refresh(spark, landing, dirs["sink"], dirs["ckpt"])
    assert n2 == 0

    # New file arrives with one NEW key and one REPLAYED key → only the new
    # key lands (O2 idempotent merge), delta = 1.
    with open(f"{landing}/day1b.json", "w") as f:
        f.write(_doc(1, "sha1", {"native": b, "esp32": b}))
    n3 = incremental_refresh(spark, landing, dirs["sink"], dirs["ckpt"])
    assert n3 == 1

    sink = spark.read.parquet(dirs["sink"])
    assert sink.select("test", "board", "ts").distinct().count() == 3
    assert {r.board for r in sink.select("board").collect()} == {
        "native",
        "samr21-xpro",
        "esp32",
    }


def test_merge_sink_read_is_partition_pruned(spark, dirs, tmp_path):
    """The anti-join's sink-side read must carry a partition filter on the
    batch's dates — at a 100-TB sink the merge touches only the named date
    partitions, never the whole table (VERDICT r01 'What's wrong' #1)."""
    import datetime

    from riot_graphs_spark.streaming.ingest import (
        PARTITION_COL,
        _existing_keys,
    )

    landing = dirs["landing"]
    b = {"bss": 1, "text": 2, "data": 3, "count": 0}
    for day in (1, 2, 3):
        with open(f"{landing}/day{day}.json", "w") as f:
            f.write(_doc(day, f"sha{day}", {"native": b}))
    incremental_refresh(spark, landing, dirs["sink"], dirs["ckpt"])

    # Sink is laid out one directory per date.
    dirs_on_disk = {
        p.name
        for p in __import__("pathlib").Path(dirs["sink"]).iterdir()
        if p.is_dir()
    }
    assert dirs_on_disk == {
        f"{PARTITION_COL}=2024-01-0{d}" for d in (1, 2, 3)
    }

    existing = _existing_keys(
        spark, dirs["sink"], ["test", "board", "ts"], [datetime.date(2024, 1, 2)]
    )
    plan = existing._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and PARTITION_COL in plan
    # Only the named partition survives pruning.
    assert existing.count() == 1


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


def test_streaming_session_windows(spark, tmp_path):
    """O6 in streaming: the same session_windows operator body runs under a
    watermark with availableNow — batch/stream operator sharing (SURVEY §7
    step 4)."""
    import datetime as dt

    from pyspark.sql import Row

    from riot_graphs_spark.operators.timeseries import session_windows

    rows = [
        Row(user_id=1, ts=dt.datetime(2024, 1, 1, 10, 0), value=1.0),
        Row(user_id=1, ts=dt.datetime(2024, 1, 1, 10, 10), value=2.0),
        Row(user_id=1, ts=dt.datetime(2024, 1, 1, 12, 0), value=3.0),  # new session
        Row(user_id=2, ts=dt.datetime(2024, 1, 1, 10, 5), value=4.0),
    ]
    src = str(tmp_path / "sessions_src")
    df = spark.createDataFrame(rows)
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        session_windows(
            stream.withWatermark("ts", "1 hour"),
            ts="ts",
            dims=["user_id"],
            gap="30 minutes",
            aggs=[F.count("*").alias("n_events")],
        )
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_sessions"))
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start.hour): r.n_events
        for r in spark.table("sessions_out").collect()
    }
    # The watermark has passed the first two sessions; the 12:00 one may be
    # withheld as open. Closed sessions must be exact.
    assert got[(1, 10)] == 2
    assert got[(2, 10)] == 1


def test_corrupt_json_lands_in_corrupt_record(spark, tmp_path):
    """P11: PERMISSIVE JSON parsing — malformed CI documents survive the
    scan with NULL fields + populated _corrupt_record instead of failing
    the job (the batch analogue of the reference's non-200 tolerance,
    rg.py:100-104)."""
    from pyspark.sql.types import StringType, StructField, StructType

    from riot_graphs_spark.schemas import SIZES_RAW

    path = tmp_path / "landing"
    path.mkdir()
    good = '{"ts": "2024-01-01 04:00:00", "sha": "aaa", "sizes": {"t": {"b": {"bss": 1, "text": 2, "data": 3}}}}'
    bad = '{"ts": "2024-01-01 04:00:00", "sha": "bbb", "sizes": {TRUNCATED'
    (path / "docs.json").write_text(good + "\n" + bad + "\n")

    schema = StructType(
        [*SIZES_RAW.fields, StructField("_corrupt_record", StringType())]
    )
    # cache first: Spark disallows querying only _corrupt_record from the
    # raw file scan
    df = spark.read.schema(schema).option("mode", "PERMISSIVE").json(str(path)).cache()
    ok = df.filter(F.col("_corrupt_record").isNull())
    corrupt = df.filter(F.col("_corrupt_record").isNotNull())
    assert ok.count() == 1 and ok.collect()[0].sha == "aaa"
    assert corrupt.count() == 1  # quarantined, job not failed


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """O2's pure-streaming form: dropDuplicatesWithinWatermark dedups
    replayed (test, board, ts) points without a sink-side merge — state
    stays bounded by the watermark horizon instead of growing forever."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    rows = [
        ("t", "native", "2024-01-01 04:00:00", 10),
        ("t", "native", "2024-01-01 04:00:00", 10),  # exact replay
        ("t", "esp32", "2024-01-01 04:00:00", 20),
        ("t", "native", "2024-01-02 04:00:00", 11),
    ]
    df = spark.createDataFrame(
        [(a, b, ts, v) for a, b, ts, v in rows],
        "test string, board string, ts_s string, text int",
    ).select("test", "board", F.to_timestamp("ts_s").alias("ts"), "text")
    df.coalesce(1).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(
            "test string, board string, ts timestamp, text int"
        )
        .parquet(src)
        .withWatermark("ts", "2 days")
        .dropDuplicatesWithinWatermark(["test", "board", "ts"])
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out)
    assert got.count() == 3
    assert got.select("test", "board", "ts").distinct().count() == 3


def test_stream_stream_interval_join(spark, tmp_path):
    """J1 with both sides streaming: builds pair with events on hash within
    the tolerance; an event outside it must not match. Inner stream-stream
    join with watermarks on both sides (state evictable)."""
    import datetime as dt

    from pyspark.sql import Row

    from riot_graphs_spark.streaming.joins import stream_interval_join

    t0 = dt.datetime(2024, 1, 1, 10, 0)
    builds = [
        Row(hash="aaa", ts=t0, text=100),
        Row(hash="bbb", ts=t0 + dt.timedelta(hours=5), text=200),
    ]
    events = [
        Row(hash="aaa", ts=t0 + dt.timedelta(minutes=30), pr_num=1),  # in
        Row(hash="bbb", ts=t0 + dt.timedelta(hours=9), pr_num=2),  # out: 4h gap
        Row(hash="ccc", ts=t0, pr_num=3),  # no build
    ]
    bsrc, esrc = str(tmp_path / "b"), str(tmp_path / "e")
    bdf, edf = spark.createDataFrame(builds), spark.createDataFrame(events)
    bdf.write.parquet(bsrc)
    edf.write.parquet(esrc)

    joined = stream_interval_join(
        spark.readStream.schema(bdf.schema).parquet(bsrc),
        spark.readStream.schema(edf.schema).parquet(esrc),
        key="hash",
        tolerance="1 hour",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .start()
    )
    q.awaitTermination()
    got = [(r.hash, r.pr_num) for r in spark.table("ssj_out").collect()]
    assert got == [("aaa", 1)]


def test_streaming_cdc_materialization_matches_batch_compaction(spark, dirs):
    import json as _json

    from riot_graphs_spark.operators.cdc import apply_changelog
    from riot_graphs_spark.streaming.cdc import materialize_changelog

    landing, state, ckpt = dirs["landing"], dirs["sink"], dirs["ckpt"]
    schema = "event_id long, user_id long, ts timestamp, op string, value double"

    def write_changes(name, rows):
        with open(f"{landing}/{name}.json", "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    batch1 = [
        {"event_id": 1, "user_id": 1, "ts": "2024-01-01 00:00:00", "op": "U", "value": 10.0},
        {"event_id": 2, "user_id": 2, "ts": "2024-01-01 00:00:00", "op": "U", "value": 20.0},
    ]
    write_changes("b1", batch1)
    n1 = materialize_changelog(
        spark, landing, state, ckpt, schema,
        keys=["user_id"], seq=["ts", "event_id"], op_col="op", delete_op="D",
    )
    assert n1 == 2

    # batch 2: update user 1, delete user 2, insert user 3
    batch2 = [
        {"event_id": 3, "user_id": 1, "ts": "2024-01-01 01:00:00", "op": "U", "value": 11.0},
        {"event_id": 4, "user_id": 2, "ts": "2024-01-01 01:00:00", "op": "D", "value": 0.0},
        {"event_id": 5, "user_id": 3, "ts": "2024-01-01 01:00:00", "op": "U", "value": 30.0},
    ]
    write_changes("b2", batch2)
    n2 = materialize_changelog(
        spark, landing, state, ckpt, schema,
        keys=["user_id"], seq=["ts", "event_id"], op_col="op", delete_op="D",
    )
    assert n2 == 2  # user 2 tombstoned

    from riot_graphs_spark.streaming.cdc import current_state

    got = {
        r["user_id"]: (r["event_id"], r["value"])
        for r in current_state(spark, state, "op").collect()
    }
    # incremental materialization == one-shot batch compaction of the full log
    full = spark.createDataFrame(
        [tuple(r.values()) for r in batch1 + batch2],
        "event_id long, user_id long, ts string, op string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    expect = {
        r["user_id"]: (r["event_id"], r["value"])
        for r in apply_changelog(
            full, keys=["user_id"], seq=["ts", "event_id"], op_col="op"
        ).collect()
    }
    assert got == expect == {1: (3, 11.0), 3: (5, 30.0)}

    # replay: no new files -> checkpoint makes the run a no-op
    n3 = materialize_changelog(
        spark, landing, state, ckpt, schema,
        keys=["user_id"], seq=["ts", "event_id"], op_col="op", delete_op="D",
    )
    assert n3 == 2

    # batch 3: a LATE change for user 2, older than its tombstone — must NOT
    # resurrect the key (the state keeps the delete as the LWW winner)
    write_changes("b3", [
        {"event_id": 6, "user_id": 2, "ts": "2024-01-01 00:30:00", "op": "U", "value": 21.0},
    ])
    n4 = materialize_changelog(
        spark, landing, state, ckpt, schema,
        keys=["user_id"], seq=["ts", "event_id"], op_col="op", delete_op="D",
    )
    assert n4 == 2
    assert 2 not in {
        r["user_id"] for r in current_state(spark, state, "op").collect()
    }


def test_cdc_corrupt_state_fails_batch_instead_of_resetting(spark, dirs):
    """A corrupt EXISTING state must fail the micro-batch (streaming retry
    semantics) — NOT be mistaken for first-batch and overwritten, which
    would silently discard all accumulated CDC state (ADVICE r01)."""
    import json as _json
    import pathlib

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from riot_graphs_spark.streaming.cdc import materialize_changelog

    landing, state, ckpt = dirs["landing"], dirs["sink"], dirs["ckpt"]
    schema = "event_id long, user_id long, ts timestamp, op string, value double"

    with open(f"{landing}/b1.json", "w") as f:
        f.write(_json.dumps(
            {"event_id": 1, "user_id": 1, "ts": "2024-01-01 00:00:00",
             "op": "U", "value": 10.0}) + "\n")
    n1 = materialize_changelog(
        spark, landing, state, ckpt, schema,
        keys=["user_id"], seq=["ts", "event_id"], op_col="op", delete_op="D",
    )
    assert n1 == 1

    # Corrupt the state files in place.
    corrupted = list(pathlib.Path(state).glob("*.parquet"))
    assert corrupted
    for p in corrupted:
        p.write_bytes(b"this is not parquet")

    with open(f"{landing}/b2.json", "w") as f:
        f.write(_json.dumps(
            {"event_id": 2, "user_id": 2, "ts": "2024-01-01 01:00:00",
             "op": "U", "value": 20.0}) + "\n")
    with pytest.raises(StreamingQueryException):
        materialize_changelog(
            spark, landing, state, ckpt, schema,
            keys=["user_id"], seq=["ts", "event_id"], op_col="op",
            delete_op="D",
        )
    # The (corrupt) state was left untouched — nothing reset/overwrote it.
    for p in corrupted:
        assert p.read_bytes() == b"this is not parquet"


def test_streaming_m4_downsample_complete_mode(spark, tmp_path):
    """M4 as a continuous aggregate: the same operator body (min_by/max_by
    per bucket + row-local explode) runs on a stream in complete mode — the
    live-dashboard downsampler."""
    import datetime as dt

    from pyspark.sql import Row

    from riot_graphs_spark.operators.timeseries import m4_downsample

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        Row(event_type="a", event_id=1, ts=t0 + dt.timedelta(hours=8), value=5.0),
        Row(event_type="a", event_id=2, ts=t0 + dt.timedelta(hours=10), value=1.0),
        Row(event_type="a", event_id=3, ts=t0 + dt.timedelta(hours=12), value=9.0),
        Row(event_type="a", event_id=4, ts=t0 + dt.timedelta(hours=14), value=5.0),
    ]
    src = str(tmp_path / "m4_src")
    df = spark.createDataFrame(rows)
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        m4_downsample(
            stream, dims=["event_type"], ts="ts", value="value",
            unit="day", tiebreak="event_id",
        )
        .writeStream.format("memory")
        .queryName("m4_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_m4"))
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["ts"], r["value"])
        for r in spark.sql("SELECT * FROM m4_out").collect()
    )
    assert got == [
        (t0 + dt.timedelta(hours=8), 5.0),
        (t0 + dt.timedelta(hours=10), 1.0),
        (t0 + dt.timedelta(hours=12), 9.0),
        (t0 + dt.timedelta(hours=14), 5.0),
    ]


def test_stream_static_enrichment_join(spark, tmp_path):
    """J2 in streaming: a live event stream enriched against a static
    dimension with the same operators.joins.enrich body — stream-static
    joins are stateless (each micro-batch probes the dim; broadcast at
    dim sizes), unlike stream-stream joins."""
    import datetime as dt

    from pyspark.sql import Row

    from riot_graphs_spark.operators.joins import enrich

    t0 = dt.datetime(2024, 1, 1)
    events = [
        Row(event_id=1, ts=t0, pr_num=7, value=1.0),
        Row(event_id=2, ts=t0, pr_num=8, value=2.0),
        Row(event_id=3, ts=t0, pr_num=99, value=3.0),  # no dim row
    ]
    dim = spark.createDataFrame(
        [Row(pr_num=7, title="fix build"), Row(pr_num=8, title="add board")]
    )
    src = str(tmp_path / "ss_src")
    df = spark.createDataFrame(events)
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        enrich(stream, dim, on="pr_num")
        .writeStream.format("memory")
        .queryName("ss_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
        .start()
    )
    q.awaitTermination()
    got = {r.event_id: r.title for r in spark.table("ss_out").collect()}
    # left-outer tolerance (reference rg.py:361-362): missing PR -> NULL title
    assert got == {1: "fix build", 2: "add board", 3: None}


def test_streaming_ohlc_complete_mode(spark, tmp_path):
    """OHLC as a continuous aggregate: the same ohlc_candles body (min_by/
    max_by per bucket) runs on a stream in complete mode — the live candle
    panel."""
    import datetime as dt

    from pyspark.sql import Row

    from riot_graphs_spark.operators.timeseries import ohlc_candles

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        Row(event_type="a", event_id=1, ts=t0 + dt.timedelta(hours=8), value=5.0),
        Row(event_type="a", event_id=2, ts=t0 + dt.timedelta(hours=10), value=1.0),
        Row(event_type="a", event_id=3, ts=t0 + dt.timedelta(hours=12), value=9.0),
        Row(event_type="a", event_id=4, ts=t0 + dt.timedelta(hours=14), value=4.0),
    ]
    src = str(tmp_path / "ohlc_src")
    df = spark.createDataFrame(rows)
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        ohlc_candles(
            stream, dims=["event_type"], ts="ts", value="value",
            unit="day", tiebreak="event_id",
        )
        .writeStream.format("memory")
        .queryName("ohlc_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_ohlc"))
        .start()
    )
    q.awaitTermination()
    r = spark.sql("SELECT * FROM ohlc_out").collect()[0]
    assert (r["open"], r["high"], r["low"], r["close"], r["n"]) == (
        5.0, 9.0, 1.0, 4.0, 4
    )


def test_streaming_corpus_ingest_normalizes_dedups_and_gates(spark, tmp_path):
    """Streaming curation pipeline: landed JSONL docs are normalized,
    markup-only variants collapse to one fingerprint, Gopher rejects are
    dropped in-stream, and a replayed file ingests nothing new."""
    from riot_graphs_spark.streaming.corpus import stream_corpus_ingest

    landing = tmp_path / "docs_landing"
    landing.mkdir()
    sink = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    prose = "the quick brown fox jumps over the lazy dogs again and again"

    def doc(i, text):
        return json.dumps(
            {
                "doc_id": i,
                "ts": "2024-01-01 04:00:00",
                "text": text,
                "lang": "en",
                "source": "web",
            }
        )

    (landing / "a.jsonl").write_text(
        "\n".join(
            [
                doc(1, prose),
                doc(2, f"<p>{prose}</p><!-- c -->"),  # markup-only dup of 1
                doc(3, "# # # w1 w2 # # #"),  # symbol soup → gopher reject
                doc(4, prose + " but this one really is different text here"),
            ]
        )
    )
    counts: list[int] = []
    q = stream_corpus_ingest(spark, str(landing), sink, ckpt, batch_counts=counts)
    q.awaitTermination()
    got = spark.read.parquet(sink)
    assert got.count() == 2  # docs 1+2 collapsed, 3 rejected, 4 kept
    texts = {r.text for r in got.collect()}
    assert prose in texts  # markup stripped before fingerprinting
    assert sum(counts) == 2

    # replay: same file again → checkpoint skips it; a NEW file with an
    # already-seen fingerprint is caught by the sink merge
    (landing / "b.jsonl").write_text(doc(9, f"<div>{prose}</div>"))
    counts2: list[int] = []
    q = stream_corpus_ingest(spark, str(landing), sink, ckpt, batch_counts=counts2)
    q.awaitTermination()
    assert sum(counts2) == 0
    assert spark.read.parquet(sink).count() == 2


def test_streaming_corpus_near_dedup_via_bucket_table(spark, tmp_path):
    """Near-dup filtering against the already-ingested corpus: batch 2's
    paraphrase-free near-copy (shares most shingles, different fingerprint)
    is dropped via the maintained band-bucket table; fresh text passes."""
    import json as _json

    from riot_graphs_spark.streaming.corpus import stream_corpus_ingest

    landing = tmp_path / "docs_landing"
    landing.mkdir()
    sink = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    buckets = str(tmp_path / "corpus_buckets")

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliett "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    fresh = (
        "umbrella vortex willow xylophone yonder zeppelin anchor bridge "
        "castle dolphin ember forest garden harbor island jungle kettle"
    )

    def doc(i, text):
        return _json.dumps(
            {"doc_id": i, "ts": "2024-01-01 04:00:00", "text": text,
             "lang": "en", "source": "web"}
        )

    (landing / "a.jsonl").write_text(doc(1, base))
    counts: list[int] = []
    q = stream_corpus_ingest(
        spark, str(landing), sink, ckpt, batch_counts=counts,
        near_dedup_buckets_path=buckets,
    )
    q.awaitTermination()
    assert sum(counts) == 1
    assert spark.read.parquet(buckets).count() > 0

    # batch 2: a near-copy of doc 1 (one word changed → same minhash bands,
    # different exact fingerprint) and genuinely fresh text
    (landing / "b.jsonl").write_text(
        "\n".join([doc(2, base.replace("tango", "waltz")), doc(3, fresh)])
    )
    counts2: list[int] = []
    q = stream_corpus_ingest(
        spark, str(landing), sink, ckpt, batch_counts=counts2,
        near_dedup_buckets_path=buckets,
    )
    q.awaitTermination()
    assert sum(counts2) == 1  # near-copy dropped, fresh kept
    ids = sorted(r.doc_id for r in spark.read.parquet(sink).collect())
    assert ids == [1, 3]


def test_streaming_near_dedup_bucket_table_tolerates_replay(spark, tmp_path):
    """Crash-replay semantics: re-running the same landing file with a
    FRESH checkpoint (simulating a lost checkpoint / replayed batch)
    appends duplicate bucket rows but never corrupts semantics — the
    semi-join is key-based, and the corpus merge stays idempotent."""
    import json as _json

    from riot_graphs_spark.streaming.corpus import stream_corpus_ingest

    landing = tmp_path / "docs_landing"
    landing.mkdir()
    sink = str(tmp_path / "corpus")
    buckets = str(tmp_path / "buckets")

    text = (
        "replay tolerance check sentence with enough distinct words to "
        "shingle and band reliably across runs"
    )
    (landing / "a.jsonl").write_text(
        _json.dumps(
            {"doc_id": 1, "ts": "2024-01-01 04:00:00", "text": text,
             "lang": "en", "source": "web"}
        )
    )

    counts: list[int] = []
    q = stream_corpus_ingest(
        spark, str(landing), sink, str(tmp_path / "ck1"),
        batch_counts=counts, near_dedup_buckets_path=buckets,
    )
    q.awaitTermination()
    n_buckets_1 = spark.read.parquet(buckets).count()

    # fresh checkpoint -> the same file replays end-to-end
    counts2: list[int] = []
    q = stream_corpus_ingest(
        spark, str(landing), sink, str(tmp_path / "ck2"),
        batch_counts=counts2, near_dedup_buckets_path=buckets,
    )
    q.awaitTermination()

    assert sum(counts) == 1 and sum(counts2) == 0  # corpus merge idempotent
    assert spark.read.parquet(sink).count() == 1
    b = spark.read.parquet(buckets)
    assert b.count() >= n_buckets_1  # dup rows allowed...
    assert b.select("band", "band_key").distinct().count() == n_buckets_1


def test_streaming_partial_rollup_maintenance_foreachbatch(spark, sf_dir, tmp_path):
    """The incremental-materialization loop end-to-end: a file stream of
    events drives foreachBatch micro-batches, each batch's day-grain
    partial states upsert into a maintained parquet rollup table, and the
    final table merged to week grain equals the direct batch aggregate —
    the operators/rollup.py contract under streaming delivery (including a
    replayed batch being a no-op thanks to the keyed upsert)."""
    from riot_graphs_spark.operators.rollup import (
        daily_partials,
        merge_to_grain,
        upsert_partials,
    )
    from riot_graphs_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value"
    )
    src = str(tmp_path / "events_src")
    # several files => several micro-batches with maxFilesPerTrigger
    events.repartition(4).write.parquet(src)
    table_path = str(tmp_path / "rollup_table")

    import os as _os

    marker_dir = str(tmp_path / "batch_markers")
    _os.makedirs(marker_dir)

    def maintain(batch_df, batch_id):
        # Exactly-once under foreachBatch redelivery: merging states with
        # sum() is NOT replay-idempotent (a redelivered batch would
        # double-count into the absorbed states), so the recipe follows
        # the standard batch-id ledger — a replayed id is skipped whole.
        marker = _os.path.join(marker_dir, str(batch_id))
        if _os.path.exists(marker):
            return
        fresh = daily_partials(
            batch_df, dims=["event_type"], ts="ts", value="value"
        )
        s = batch_df.sparkSession
        try:
            existing = s.read.parquet(table_path)
        except Exception:
            existing = fresh.limit(0)
        # A micro-batch may split a (day, type) grain across batches:
        # merge the fresh partials with the existing STATES (states add),
        # then replace the touched grain keys.
        merged = (
            existing.unionByName(fresh)
            .groupBy("bucket", "event_type")
            .agg(
                F.sum("n_rows").alias("n_rows"),
                F.sum("sum_value").cast("decimal(28,6)").alias("sum_value"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )
        out = upsert_partials(existing, merged, dims=["event_type"])
        out.write.mode("overwrite").parquet(table_path + ".tmp")
        s.read.parquet(table_path + ".tmp").write.mode("overwrite").parquet(
            table_path
        )
        open(marker, "w").close()  # commit the ledger entry LAST

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(maintain)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_rollup"))
        .start()
    )
    q.awaitTermination()

    final = spark.read.parquet(table_path)
    got = merge_to_grain(final, dims=["event_type"], grain="week")
    expected = merge_to_grain(
        daily_partials(events, dims=["event_type"], ts="ts", value="value"),
        dims=["event_type"],
        grain="week",
    )
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in expected.collect()
    }

    # Redeliver a batch (foreachBatch's at-least-once contract): the
    # ledger must make the replay a no-op, not a double count.
    before = {tuple(r) for r in spark.read.parquet(table_path).collect()}
    maintain(events.limit(500), 0)  # batch id 0 already committed
    after = {tuple(r) for r in spark.read.parquet(table_path).collect()}
    assert after == before


def test_stream_stream_left_outer_emits_nulls_only_after_watermark(
    spark, tmp_path
):
    """Outer stream-stream join semantics pin (the Spark subtlety the
    operator docstring claims is legal): an unmatched LEFT row must emit
    null-padded only AFTER the watermark passes its time bound
    (lts + tolerance + delay) — never in the batch that read it, because
    a match could still arrive within the tolerance."""
    import datetime as dt

    from pyspark.sql import Row

    from riot_graphs_spark.streaming.joins import stream_interval_join

    t0 = dt.datetime(2024, 1, 1, 10, 0)
    bsrc, esrc = str(tmp_path / "b"), str(tmp_path / "e")
    builds1 = [
        Row(hash="aaa", ts=t0, text=100),   # matches
        Row(hash="zzz", ts=t0, text=900),   # never matches
    ]
    events1 = [Row(hash="aaa", ts=t0 + dt.timedelta(minutes=30), pr_num=1)]
    bdf = spark.createDataFrame(builds1)
    edf = spark.createDataFrame(events1)
    bdf.write.parquet(bsrc)
    edf.write.parquet(esrc)

    out = str(tmp_path / "out")

    def run():
        # file sink, not memory: the second phase must RESUME from the
        # same checkpoint (memory sink is not recovery-capable)
        joined = stream_interval_join(
            spark.readStream.schema(bdf.schema).parquet(bsrc),
            spark.readStream.schema(edf.schema).parquet(esrc),
            key="hash",
            tolerance="1 hour",
            left_watermark="1 minute",
            right_watermark="1 minute",
            how="left_outer",
        )
        q = (
            joined.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination()
        return {
            (r.hash, r.text, r.pr_num)
            for r in spark.read.parquet(out).collect()
        }

    # Phase 1: watermark has not passed zzz's bound -> inner match only,
    # NO premature null row (emitting it now would be wrong: a matching
    # event could still arrive within the 1h tolerance).
    got1 = run()
    assert got1 == {("aaa", 100, 1)}

    # Phase 2: append far-future rows on BOTH sides (the join watermark is
    # the min across inputs), advancing the watermark past
    # zzz.ts + tolerance + delay -> the unmatched left row finalizes.
    far = t0 + dt.timedelta(days=2)
    spark.createDataFrame([Row(hash="www", ts=far, text=1)]).write.mode(
        "append"
    ).parquet(bsrc)
    spark.createDataFrame([Row(hash="vvv", ts=far, pr_num=9)]).write.mode(
        "append"
    ).parquet(esrc)
    got2 = run()
    assert ("zzz", 900, None) in got2
    # the future rows themselves are still within their own bound: no
    # null emission for them yet
    assert not any(h == "www" for h, _, _ in got2)


def test_streaming_drift_monitor_scores_each_batch_against_baseline(
    spark, tmp_path
):
    """Per-ingest drift loop (streaming/drift.py): a batch drawn from the
    baseline distribution must score PSI == 0 exactly (identical bin
    shares), a shifted batch must cross the 0.25 'shifted' band; one
    monitor row lands per (micro-batch, group)."""
    import json as _json

    from riot_graphs_spark.streaming.drift import (
        drift_monitor_writer,
        record_baseline,
    )

    spec = dict(value_col="value", lo=0.0, hi=100.0, nbuckets=10,
                group_cols=["grp"])
    base_vals = [5.0, 15.0, 25.0, 35.0] * 25  # equal mass in bins 0-3
    baseline = spark.createDataFrame(
        [("g", v) for v in base_vals], "grp string, value double"
    )
    counts = record_baseline(baseline, **spec)
    assert {(r.bin, r.n) for r in counts.collect()} == {
        (0, 25), (1, 25), (2, 25), (3, 25)
    }

    landing = tmp_path / "landing"
    landing.mkdir()
    with open(landing / "b1.json", "w") as f:  # same distribution
        for v in [5.0, 15.0, 25.0, 35.0] * 5:
            f.write(_json.dumps({"grp": "g", "value": v}) + "\n")
    with open(landing / "b2.json", "w") as f:  # shifted to bins 8-9
        for v in [85.0, 95.0] * 8:
            f.write(_json.dumps({"grp": "g", "value": v}) + "\n")

    stream = (
        spark.readStream.schema("grp string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(landing))
    )
    monitor = str(tmp_path / "monitor")
    q = (
        stream.writeStream.foreachBatch(
            drift_monitor_writer(counts, monitor, **spec)
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()

    rows = {
        r.batch_id: (r.n_a, r.n_b, r.psi)
        for r in spark.read.parquet(monitor).collect()
    }
    assert len(rows) == 2
    assert {n_a for n_a, _, _ in rows.values()} == {100}
    # file order into micro-batches is not guaranteed; identify by size
    by_size = {n_b: psi for (_, n_b, psi) in rows.values()}
    assert by_size[20] == 0.0   # baseline-distribution batch: exactly zero
    assert by_size[16] > 0.25   # shifted batch crosses the 'shifted' band


def test_streaming_drift_monitor_emits_ks_beside_psi(spark, tmp_path):
    """KS wiring (streaming/drift.py): with a recorded CDF artifact the
    monitor emits ks_d beside psi.  The motivating case: a shift WITHIN
    one PSI bin scores psi == 0 (bin shares identical) but a large ks_d —
    the bin-free alarm PSI is blind to."""
    import json as _json

    from riot_graphs_spark.streaming.drift import (
        drift_monitor_writer,
        record_baseline,
        record_baseline_cdf,
    )

    # one huge PSI bin [0,100): any within-range shift is PSI-invisible
    spec = dict(value_col="value", lo=0.0, hi=100.0, nbuckets=1,
                group_cols=["grp"])
    base_vals = [10.0, 20.0, 30.0, 40.0] * 25
    baseline = spark.createDataFrame(
        [("g", v) for v in base_vals], "grp string, value double"
    )
    counts = record_baseline(baseline, **spec)
    cdf = record_baseline_cdf(baseline, "value", nbins=4,
                              group_cols=["grp"])
    got = {(r.grp, r._v): (r.cum, r.n) for r in cdf.collect()}
    # equi-depth edges = the four values; exact cumulative counts; the
    # max value is always recorded so the restricted CDF ends at 1
    assert got == {
        ("g", 10.0): (25, 100), ("g", 20.0): (50, 100),
        ("g", 30.0): (75, 100), ("g", 40.0): (100, 100),
    }

    landing = tmp_path / "landing"
    landing.mkdir()
    with open(landing / "b1.json", "w") as f:  # baseline distribution
        for v in [10.0, 20.0, 30.0, 40.0] * 5:
            f.write(_json.dumps({"grp": "g", "value": v}) + "\n")
    with open(landing / "b2.json", "w") as f:  # shifted WITHIN the bin
        for v in [41.0, 45.0, 48.0, 49.0] * 4:
            f.write(_json.dumps({"grp": "g", "value": v}) + "\n")

    stream = (
        spark.readStream.schema("grp string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(landing))
    )
    monitor = str(tmp_path / "monitor")
    q = (
        stream.writeStream.foreachBatch(
            drift_monitor_writer(counts, monitor, baseline_cdf=cdf, **spec)
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()

    rows = spark.read.parquet(monitor).collect()
    assert len(rows) == 2 and all(r.grp == "g" for r in rows)
    by_size = {r.n_b: (r.psi, r.ks_d) for r in rows}
    # identical distribution: BOTH scores exactly zero
    assert by_size[20] == (0.0, 0.0)
    # within-bin shift: PSI blind (identical bin shares), KS fires —
    # every batch value sits above the baseline's whole mass: D = 1
    psi, ks = by_size[16]
    assert psi == 0.0 and ks == 1.0


def test_drift_monitor_replay_reappends_and_dedups_on_read(spark, tmp_path):
    """A replayed micro-batch (same epoch_id) re-appends identical monitor
    rows — the documented idempotency contract: readers dedup by taking
    one row per (batch_id, group)."""
    from pyspark.sql import functions as F

    from riot_graphs_spark.streaming.drift import (
        drift_monitor_writer,
        record_baseline,
        record_baseline_cdf,
    )

    spec = dict(value_col="value", lo=0.0, hi=10.0, nbuckets=5,
                group_cols=["grp"])
    baseline = spark.createDataFrame(
        [("g", float(v % 10)) for v in range(100)],
        "grp string, value double",
    )
    counts = record_baseline(baseline, **spec)
    cdf = record_baseline_cdf(baseline, "value", nbins=5,
                              group_cols=["grp"])
    monitor = str(tmp_path / "monitor")
    writer = drift_monitor_writer(counts, monitor, baseline_cdf=cdf, **spec)
    batch = spark.createDataFrame(
        [("g", float(v % 5)) for v in range(20)], "grp string, value double"
    )
    writer(batch, 7)
    writer(batch, 7)  # replay
    raw = spark.read.parquet(monitor).collect()
    assert len(raw) == 2
    assert len({(r.batch_id, r.grp, r.psi, r.ks_d) for r in raw}) == 1
    deduped = (
        spark.read.parquet(monitor)
        .groupBy("batch_id", "grp")
        .agg(F.first("psi").alias("psi"), F.first("ks_d").alias("ks_d"))
        .collect()
    )
    assert len(deduped) == 1 and deduped[0].psi > 0.0
    assert deduped[0].ks_d is not None and deduped[0].ks_d > 0.0


def test_stream_session_stats_finalizes_on_watermark(spark, tmp_path):
    """Streaming sessionization (streaming/sessions.py): sessions emit in
    append mode exactly when the watermark passes last_ts + gap; an open
    recent session stays in state (not emitted); a replayed trigger does
    not duplicate finalized sessions."""
    import datetime as dt
    import json as _json

    from riot_graphs_spark.streaming.sessions import stream_session_stats

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def iso(m):
        return (t0 + dt.timedelta(minutes=m)).strftime("%Y-%m-%dT%H:%M:%S")

    landing = tmp_path / "landing"
    landing.mkdir()
    # user 7: burst at t+0..t+10 (one session), then nothing until the
    # far-future row from user 9 advances the watermark past its close.
    # user 9: a very recent burst that must stay open/unemitted.
    with open(landing / "b1.json", "w") as f:
        for m, u, v in [(0, 7, 1.0), (5, 7, 2.0), (10, 7, 3.0)]:
            f.write(_json.dumps({"ts": iso(m), "user_id": u, "value": v})
                    + "\n")
        for m, u, v in [(600, 9, 5.0), (605, 9, 5.0)]:
            f.write(_json.dumps({"ts": iso(m), "user_id": u, "value": v})
                    + "\n")

    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(
                "ts timestamp, user_id bigint, value double"
            ).json(str(landing))
        )
        q = (
            stream_session_stats(
                stream, gap="30 minutes", watermark="1 hour"
            )
            .writeStream.outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .format("parquet")
            .option("path", out)
            .start()
        )
        q.awaitTermination()
        return {
            (r.user_id, r.session_start, r.session_end, r.n_events,
             r.value_sum)
            for r in spark.read.parquet(out).collect()
        }

    got1 = run()
    # watermark after batch 1 = t+605m - 60m = t+545m: user 7's session
    # (closes t+10+30=t+40) finalizes; user 9's is still open
    assert got1 == {
        (7, t0, t0 + dt.timedelta(minutes=40), 3, 6.0)
    }

    # replay with no new data: nothing re-emits (checkpointed state)
    assert run() == got1

    # a far-future row advances the watermark past user 9's close
    with open(landing / "b2.json", "w") as f:
        f.write(_json.dumps(
            {"ts": iso(2000), "user_id": 1, "value": 0.0}) + "\n")
    got3 = run()
    assert (
        9,
        t0 + dt.timedelta(minutes=600),
        t0 + dt.timedelta(minutes=635),
        2,
        10.0,
    ) in got3
    assert len(got3) == 2  # user 1's own session still open


def test_drift_monitor_baseline_staleness_guard(spark, tmp_path):
    """Staleness guard (streaming/drift.py): a baseline recorded with a
    recorded_at stamp carries it onto every monitor row; max_age_sec
    flags a too-old calibration as baseline_stale=True (and a fresh-
    enough one False); max_age_sec without a stamped baseline raises."""
    import json as _json

    import pytest as _pytest

    from riot_graphs_spark.streaming.drift import (
        drift_monitor_writer,
        record_baseline,
    )

    spec = dict(value_col="value", lo=0.0, hi=100.0, nbuckets=10,
                group_cols=["grp"])
    baseline = spark.createDataFrame(
        [("g", v) for v in [5.0, 15.0, 25.0, 35.0] * 25],
        "grp string, value double",
    )
    stamped = record_baseline(
        baseline, recorded_at="2020-01-01 00:00:00", **spec
    )
    assert "recorded_at" in stamped.columns

    landing = tmp_path / "landing"
    landing.mkdir()
    with open(landing / "b1.json", "w") as f:
        for v in [5.0, 15.0] * 5:
            f.write(_json.dumps({"grp": "g", "value": v}) + "\n")

    def _run(writer, subdir):
        stream = (
            spark.readStream.schema("grp string, value double")
            .option("maxFilesPerTrigger", 1)
            .json(str(landing))
        )
        q = (
            stream.writeStream.foreachBatch(writer)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / (subdir + "_ck")))
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(str(tmp_path / subdir)).collect()

    # 2020 calibration vs a 1-hour age budget: stale, loudly
    rows = _run(
        drift_monitor_writer(
            stamped, str(tmp_path / "m1"), max_age_sec=3600, **spec
        ),
        "m1",
    )
    assert len(rows) == 1
    assert str(rows[0].baseline_recorded_at).startswith("2020-01-01")
    assert bool(rows[0].baseline_stale) is True
    # same stamp vs a 100-year budget: fresh enough
    rows = _run(
        drift_monitor_writer(
            stamped, str(tmp_path / "m2"),
            max_age_sec=100 * 365 * 86400, **spec
        ),
        "m2",
    )
    assert bool(rows[0].baseline_stale) is False
    # stamp column rides along even without an age budget
    rows = _run(
        drift_monitor_writer(stamped, str(tmp_path / "m3"), **spec), "m3"
    )
    assert str(rows[0].baseline_recorded_at).startswith("2020-01-01")
    assert "baseline_stale" not in rows[0].asDict()
    # age budget without a stamped baseline: configuration error
    unstamped = record_baseline(baseline, **spec)
    with _pytest.raises(ValueError):
        drift_monitor_writer(
            unstamped, str(tmp_path / "m4"), max_age_sec=60, **spec
        )


def test_ph_monitor_accumulates_and_alarms_on_creep(spark, tmp_path):
    """Page-Hinkley monitor (streaming/drift.ph_monitor_writer): a slow
    per-batch creep that PSI would score as individually unremarkable
    accumulates across batches until U - min(U) crosses lambda; a
    replayed epoch recomputes from the same predecessor state (no
    double-apply)."""
    from riot_graphs_spark.streaming.drift import (
        ph_monitor_writer,
        record_baseline_mean,
    )

    baseline = spark.createDataFrame(
        [("g", 10.0)] * 50, "grp string, value double"
    )
    mu = record_baseline_mean(baseline, "value", ["grp"])
    monitor = str(tmp_path / "ph")
    # delta tolerates 0.1 of drift; lambda alarms after ~3 units of
    # accumulated excess
    writer = ph_monitor_writer(
        mu, monitor, "value", delta=0.1, lam=3.0, group_cols=["grp"]
    )

    def batch(mean):
        return spark.createDataFrame(
            [("g", float(mean))] * 10, "grp string, value double"
        )

    # stable batches: U drifts DOWN by delta each time, min tracks it,
    # no alarm
    writer(batch(10.0), 0)
    writer(batch(10.0), 1)
    # creep: +1.1 over baseline accumulates 1.0 of excess per batch
    for i in range(2, 6):
        writer(batch(11.1), i)
    rows = {
        r.batch_id: r
        for r in spark.read.parquet(monitor).collect()
    }
    assert not rows[0].ph_alarm and not rows[1].ph_alarm
    # after 4 creep batches the excess is 4.0 > lambda=3
    assert not rows[2].ph_alarm and not rows[3].ph_alarm
    assert rows[5].ph_alarm
    # U at batch 5: -0.2 (two stable) + 4 * 1.0 = 3.8 exactly
    import pytest as _pytest

    assert rows[5].ph_u == _pytest.approx(3.8)
    assert rows[5].ph_min == _pytest.approx(-0.2)

    # replay of epoch 5: state reads only batch_id < 5, so the
    # re-appended row is identical, not double-applied
    writer(batch(11.1), 5)
    raw = spark.read.parquet(monitor).filter("batch_id = 5").collect()
    assert len(raw) == 2
    assert len({(r.ph_u, r.ph_min, r.ph_alarm) for r in raw}) == 1


def test_streaming_ab_guardrail_cumulative_verdicts(spark, tmp_path):
    """Continuous A/B guardrail (streaming/guardrail.py): per-batch
    counts land in the ledger, every batch's verdict row scores the
    CUMULATIVE contingency table — a treatment lift that only clears
    significance once enough batches accumulate must flip the flag on
    the later batch, and a balanced split must never trip SRM."""
    import json as _json

    from riot_graphs_spark.streaming.guardrail import ab_guardrail_writer

    landing = tmp_path / "landing"
    landing.mkdir()
    with open(landing / "b1.json", "w") as f:  # balanced, equal rates
        for i in range(50):
            f.write(_json.dumps({"arm": "0", "converted": i < 10}) + "\n")
        for i in range(50):
            f.write(_json.dumps({"arm": "1", "converted": i < 10}) + "\n")
    with open(landing / "b2.json", "w") as f:  # treatment lift in arm a
        for i in range(40):
            f.write(_json.dumps({"arm": "0", "converted": i < 30}) + "\n")
        for i in range(40):
            f.write(_json.dumps({"arm": "1", "converted": i < 10}) + "\n")

    stream = (
        spark.readStream.schema("arm string, converted boolean")
        .option("maxFilesPerTrigger", 1)
        .json(str(landing))
    )
    monitor = str(tmp_path / "monitor")
    q = (
        stream.writeStream.foreachBatch(ab_guardrail_writer(monitor))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()

    rows = {
        r.n_batches: r
        for r in spark.read.parquet(f"{monitor}/report").collect()
    }
    assert set(rows) == {1, 2}
    final = rows[2]
    # cumulative table is order-independent: 90/90 split, 40 vs 20 hits
    assert (final.n_a, final.k_a, final.n_b, final.k_b) == (90, 40, 90, 20)
    assert final.srm_chi2 == 0.0 and not final.srm
    assert final.significant and final.z > 1.96
    # the balanced first batch alone must not be significant
    assert not rows[1].significant


def test_streaming_ab_guardrail_replay_idempotent_and_paired(spark, tmp_path):
    """Replay idempotency + the paired McNemar cells + staleness guard:
    re-delivering a micro-batch re-appends an identical ledger row that
    the cumulative dedup collapses, so totals and verdicts are unchanged;
    discordant cells accumulate across batches; a stamped design with an
    exceeded age budget flags design_stale."""
    import pytest as _pytest

    from riot_graphs_spark.streaming.guardrail import ab_guardrail_writer

    monitor = str(tmp_path / "mon")
    writer = ab_guardrail_writer(
        monitor,
        baseline_flag_col="baseline",
        recorded_at="2024-01-01 00:00:00",
        max_age_sec=60.0,
    )

    def batch(rows):
        return spark.createDataFrame(
            rows, "arm string, converted boolean, baseline boolean"
        )

    b0 = batch([("0", True, False)] * 6 + [("1", False, True)] * 4)
    b1 = batch([("0", False, True)] * 3 + [("1", True, False)] * 7)
    writer(b0, 0)
    writer(b1, 1)
    writer(b1, 1)  # at-least-once re-delivery

    ledger = spark.read.parquet(f"{monitor}/ledger").collect()
    assert len(ledger) == 3  # replay re-appended...
    reports = spark.read.parquet(f"{monitor}/report").collect()
    last = {r.batch_id: r for r in sorted(reports, key=lambda r: r.n_batches)}
    final = last[1]
    assert final.n_batches == 2  # ...but dedup collapsed it
    assert (final.n_a, final.k_a, final.n_b, final.k_b) == (9, 6, 11, 7)
    # discordant cells: b0 contributes d01=4, d10=6; b1 d01=3, d10=7
    assert (final.d01, final.d10) == (7, 13)
    # continuity-corrected McNemar: (|7-13|-1)^2 / 20
    assert final.mcnemar_chi2 == _pytest.approx(25.0 / 20.0)
    # 2024 design stamp is long past the 60 s budget
    assert final.design_stale

    with _pytest.raises(ValueError):
        ab_guardrail_writer(monitor, max_age_sec=5.0)


def test_streaming_ab_guardrail_srm_fires_on_broken_split(spark, tmp_path):
    """A 90/10 observed split against a designed 50/50 must trip the SRM
    alarm at the 0.001 threshold — the broken-assignment incident the
    guardrail exists for — while the two-proportion readout stays
    computable on the skewed cells."""
    from riot_graphs_spark.streaming.guardrail import ab_guardrail_writer

    monitor = str(tmp_path / "mon")
    writer = ab_guardrail_writer(monitor)
    rows = [("0", True)] * 450 + [("1", True)] * 50
    df = spark.createDataFrame(rows, "arm string, converted boolean")
    writer(df, 0)
    r = spark.read.parquet(f"{monitor}/report").collect()[0]
    assert (r.n_a, r.n_b) == (450, 50)
    # chi2 = (450-250)^2/250 + (50-250)^2/250 = 320
    assert r.srm_chi2 == 320.0
    assert r.srm and r.srm_p < 0.001
    assert r.rate_a == 1.0 and r.rate_b == 1.0


def test_streaming_ab_guardrail_cuped_readout_and_replay(spark, tmp_path):
    """CUPED in the ledger (r11): with a pre-period covariate the verdict
    row carries theta / cuped_diff / cuped_z / var_reduction derived from
    the cumulative per-arm moment sums; a replayed batch leaves the CUPED
    readout bit-identical (decimal moments dedup like the counts); the
    adjusted effect must equal the hand-computed pooled-theta estimate;
    and without a covariate the readout is NULL, not zero."""
    import pytest as _pytest

    from riot_graphs_spark.streaming.guardrail import ab_guardrail_writer

    monitor = str(tmp_path / "mon")
    writer = ab_guardrail_writer(monitor, covariate_col="pre")

    def batch(rows):
        return spark.createDataFrame(
            rows, "arm string, converted boolean, pre double"
        )

    # covariate correlates with conversion inside each arm; arm a's
    # covariate mean is higher → raw diff overstates the lift and CUPED
    # must pull it back toward zero.
    b0 = batch(
        [("0", True, 3.0), ("0", True, 2.0), ("0", False, 1.0),
         ("1", True, 2.0), ("1", False, 1.0), ("1", False, 0.0)]
    )
    b1 = batch(
        [("0", True, 4.0), ("0", False, 2.0),
         ("1", True, 3.0), ("1", False, 1.0)]
    )
    writer(b0, 0)
    writer(b1, 1)
    reports = {r.batch_id: r for r in spark.read.parquet(f"{monitor}/report").collect()}
    final = reports[1]

    # hand-compute the pooled CUPED estimate over all 10 rows
    data = [
        (0, 1, 3.0), (0, 1, 2.0), (0, 0, 1.0),
        (1, 1, 2.0), (1, 0, 1.0), (1, 0, 0.0),
        (0, 1, 4.0), (0, 0, 2.0),
        (1, 1, 3.0), (1, 0, 1.0),
    ]
    n = len(data)
    sx = sum(x for _, _, x in data)
    sy = sum(y for _, y, _ in data)
    sxx = sum(x * x for _, _, x in data)
    sxy = sum(x * y for _, y, x in data)
    s_xx = sxx - sx * sx / n
    s_xy = sxy - sx * sy / n
    s_yy = sy - sy * sy / n
    theta = s_xy / s_xx
    rho2 = s_xy**2 / (s_xx * s_yy)
    a = [(y, x) for arm, y, x in data if arm == 0]
    b = [(y, x) for arm, y, x in data if arm == 1]
    pa = sum(y for y, _ in a) / len(a)
    pb = sum(y for y, _ in b) / len(b)
    xa = sum(x for _, x in a) / len(a)
    xb = sum(x for _, x in b) / len(b)
    cuped_diff = (pa - pb) - theta * (xa - xb)
    assert final.cuped_theta == _pytest.approx(theta, abs=1e-8)
    assert final.cuped_diff == _pytest.approx(cuped_diff, abs=1e-8)
    assert final.var_reduction == _pytest.approx(rho2, abs=1e-8)
    # CUPED pulled the covariate-imbalance inflation out of the raw diff
    assert abs(final.cuped_diff) < abs(final.diff)

    # replay: identical readout after re-delivering batch 1
    writer(b1, 1)
    rows = [
        r
        for r in spark.read.parquet(f"{monitor}/report").collect()
        if r.batch_id == 1
    ]
    by_batches = {r.n_batches: r for r in rows}
    assert by_batches[2].cuped_theta == final.cuped_theta
    assert by_batches[2].cuped_diff == final.cuped_diff
    assert by_batches[2].cuped_z == final.cuped_z
    assert by_batches[2].var_reduction == final.var_reduction

    # no covariate → NULL readout (schema present, values absent)
    mon2 = str(tmp_path / "mon2")
    w2 = ab_guardrail_writer(mon2)
    w2(
        spark.createDataFrame(
            [("0", True), ("1", False)], "arm string, converted boolean"
        ),
        0,
    )
    r2 = spark.read.parquet(f"{mon2}/report").collect()[0]
    assert r2.cuped_theta is None and r2.cuped_diff is None
    assert r2.cuped_z is None and r2.var_reduction is None
    assert r2.cuped_significant is None


def test_streaming_quantile_guardrail_cumulative_and_breach(spark, tmp_path):
    """Percentile guardrail from mergeable sketch state
    (streaming/guardrail.quantile_guardrail_writer): each batch appends
    bounded sketch rows; the verdict reads CUMULATIVE percentiles (merged
    across batches, never re-scanning past values) and flags ceilings.
    Two disjoint uniform batches must read a combined median near their
    joint midpoint, and a p99 ceiling placed under the data must breach."""
    from riot_graphs_spark.streaming.guardrail import quantile_guardrail_writer

    monitor = str(tmp_path / "mon")
    writer = quantile_guardrail_writer(
        monitor, alarm_above={99: 100.0, 50: 10_000.0}
    )

    def batch(lo, hi):
        return spark.createDataFrame(
            [("2024-01-01 00:00:00", float(v)) for v in range(lo, hi)],
            "ts string, value double",
        ).select(F.col("ts").cast("timestamp").alias("ts"), "value")

    writer(batch(1, 1001), 0)
    writer(batch(1001, 2001), 1)

    reports = {
        r.batch_id: r for r in spark.read.parquet(f"{monitor}/report").collect()
    }
    assert set(reports) == {0, 1}
    first, final = reports[0], reports[1]
    assert first.n_rows == 1000 and final.n_rows == 2000
    assert final.n_batches == 2
    # merged median sits near the joint midpoint (sketch read ≲ 5% error)
    assert abs(final.p50 - 1000.0) <= 50.0
    assert final.p99 >= 1900.0 * 0.95
    # ceilings: p99 over 100 breaches, p50 under 10k does not
    assert final.breach_p99 and not final.breach_p50 and final.breach
    # ledger state is bounded: (batches × days × k) rows, k=64 anchors
    ledger = spark.read.parquet(f"{monitor}/ledger").collect()
    assert len(ledger) == 2 and all(len(r.anchors) == 64 for r in ledger)


def test_streaming_quantile_guardrail_replay_idempotent(spark, tmp_path):
    """At-least-once redelivery: a replayed micro-batch re-appends ledger
    rows for its batch_id, but the cumulative read takes one state per
    (batch, bucket, dims) — the replayed verdict row must carry
    IDENTICAL totals and percentiles, and a grouped guardrail keeps one
    verdict row per dims group."""
    from riot_graphs_spark.streaming.guardrail import quantile_guardrail_writer

    monitor = str(tmp_path / "mon")
    writer = quantile_guardrail_writer(
        monitor,
        dims=["svc"],
        percentiles=(50, 95),
        recorded_at="2024-01-01 00:00:00",
        max_age_sec=60.0,
    )

    def batch(rows):
        return spark.createDataFrame(
            rows, "ts string, svc string, value double"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "svc", "value")

    b0 = batch([("2024-01-01 00:00:00", "api", float(v)) for v in range(100)]
               + [("2024-01-01 00:00:00", "db", 5.0)] * 10)
    writer(b0, 0)
    writer(b0, 0)  # redelivery

    reports = spark.read.parquet(f"{monitor}/report").collect()
    by_run = {}
    for r in reports:
        by_run.setdefault((r.batch_id, r.svc), []).append(r)
    # two identical verdict rows per (batch 0, svc) — replay changed nothing
    for (bid, svc), rows in by_run.items():
        assert bid == 0
        vals = {(r.n_batches, r.n_rows, r.p50, r.p95) for r in rows}
        assert len(vals) == 1, (svc, vals)
    svcs = {r.svc for r in reports}
    assert svcs == {"api", "db"}
    db = next(r for r in reports if r.svc == "db")
    assert db.n_rows == 10 and db.p50 == 5.0 and db.p95 == 5.0
    # 2024 config stamp is long past the 60 s budget
    assert all(r.config_stale for r in reports)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        quantile_guardrail_writer(monitor, max_age_sec=5.0)


def test_streaming_ab_guardrail_resumes_pre_cuped_ledger(spark, tmp_path):
    """Schema back-compat (r11 advice): a monitor directory whose ledger
    was written by the pre-CUPED 7-column writer must keep resuming —
    the cumulative read merges footers and treats the missing moment
    columns as zero, so old batches contribute counts but no covariate
    evidence."""
    from riot_graphs_spark.streaming.guardrail import ab_guardrail_writer

    monitor = str(tmp_path / "mon")
    # simulate a pre-upgrade ledger: 7 columns, no sx_*/sxx_*/sxy_*
    spark.createDataFrame(
        [(0, 5, 2, 5, 1, 0, 0)],
        "batch_id int, n_a bigint, k_a bigint, n_b bigint, k_b bigint,"
        " d01 bigint, d10 bigint",
    ).write.mode("append").parquet(f"{monitor}/ledger")

    writer = ab_guardrail_writer(monitor, covariate_col="pre")
    df = spark.createDataFrame(
        [("0", True, 1.0)] * 4 + [("1", False, 2.0)] * 4,
        "arm string, converted boolean, pre double",
    )
    writer(df, 1)

    reports = sorted(
        spark.read.parquet(f"{monitor}/report").collect(),
        key=lambda r: r.n_batches,
    )
    final = reports[-1]
    # counts pooled across the old and new batches
    assert final.n_batches == 2
    assert (final.n_a, final.k_a, final.n_b, final.k_b) == (9, 6, 9, 1)
