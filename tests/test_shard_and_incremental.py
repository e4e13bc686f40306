"""shard_corpus (deterministic training-shard shuffle) and
incremental_novel_docs (batch-vs-corpus near-dup filter)."""

from __future__ import annotations

from pyspark.sql import functions as F

from riot_graphs_spark.operators.curation import shard_corpus
from riot_graphs_spark.operators.dedup import incremental_novel_docs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shard_corpus_partitions_and_positions(spark):
    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    out = shard_corpus(df, n_shards=4).collect()
    assert len(out) == 200
    shards = {r.shard for r in out}
    assert shards <= set(range(4)) and len(shards) == 4
    # positions are exactly 0..n-1 within each shard (a total order, no gaps)
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))


def test_shard_corpus_deterministic_and_decoupled_from_input_order(spark):
    fwd = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    rev = fwd.orderBy(F.desc("doc_id"))
    a = {(r.doc_id): (r.shard, r.shard_pos) for r in shard_corpus(fwd, 8).collect()}
    b = {(r.doc_id): (r.shard, r.shard_pos) for r in shard_corpus(rev, 8).collect()}
    assert a == b  # assignment is a pure function of the key
    # shard order is decoupled from doc_id order: within some shard the
    # hash-ordered positions must not be monotone in doc_id
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for doc, (s, p) in a.items():
        by_shard.setdefault(s, []).append((p, doc))
    assert any(
        [d for _, d in sorted(v)] != sorted(d for _, d in v)
        for v in by_shard.values()
        if len(v) > 2
    )


def test_shard_corpus_rejects_bad_n():
    try:
        shard_corpus(None, 0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_incremental_novel_keeps_fresh_drops_near_dup(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog near the river"),
            (2, "completely different text about spark shuffle partitions"),
        ],
    )
    batch = _docs(
        spark,
        [
            # near-verbatim copy of corpus doc 1 → every band collides
            (10, "the quick brown fox jumps over the lazy dog near the river"),
            # fresh content → no band collision
            (11, "fresh unrelated sentence with entirely novel vocabulary words"),
        ],
    )
    kept = sorted(
        r.doc_id for r in incremental_novel_docs(batch, corpus).collect()
    )
    assert kept == [11]


def test_incremental_novel_shingleless_docs_survive(spark):
    corpus = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta")])
    batch = _docs(spark, [(10, "two words")])  # < 3 words: no shingles
    kept = [r.doc_id for r in incremental_novel_docs(batch, corpus).collect()]
    assert kept == [10]


def test_lsh_tuning_picks_sane_banding():
    from riot_graphs_spark.operators.dedup import lsh_tuning

    t = lsh_tuning(0.8, num_hashes=16)
    assert t["bands"] * t["rows"] == 16
    # S-curve: likely above threshold, unlikely well below it
    assert t["p_above"] > t["p_at_threshold"] > t["p_below"]
    assert abs(t["s_curve_threshold"] - 0.8) < 0.25
    # default 4x4 banding is what the tuner itself picks near 0.7
    t7 = lsh_tuning(0.7)
    assert (t7["bands"], t7["rows"]) == (4, 4)
    try:
        lsh_tuning(1.5)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# --------------------------------------------------------------------------
# rollup: mergeable partial aggregates (incremental materialization)
# --------------------------------------------------------------------------
def test_rollup_two_level_equals_direct(spark):
    """day->week merge of partial states must EXACTLY equal aggregating
    the fact directly at week grain (mergeability invariant)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from riot_graphs_spark.operators.rollup import (
        daily_partials,
        merge_to_grain,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(hours=7 * i), "a" if i % 3 else "b",
         float((i * 37) % 100) / 8)
        for i in range(200)
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    two_level = merge_to_grain(
        daily_partials(ev, dims=["event_type"]), dims=["event_type"]
    )
    direct = ev.groupBy(
        F.date_trunc("week", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").cast("decimal(28,6)")).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ).withColumn(
        "avg_value",
        F.col("sum_value").cast("double") / F.col("n_rows").cast("double"),
    )
    a = {tuple(r) for r in two_level.collect()}
    b = {tuple(r) for r in direct.collect()}
    assert a == b and len(a) > 0


def test_rollup_upsert_replay_is_noop_and_correction_overwrites(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from riot_graphs_spark.operators.rollup import (
        daily_partials,
        upsert_partials,
    )

    d1 = dt.datetime(2024, 1, 1)
    d2 = dt.datetime(2024, 1, 2)
    ev = spark.createDataFrame(
        [(d1, "a", 1.0), (d1, "a", 3.0), (d2, "a", 5.0)],
        "ts timestamp, event_type string, value double",
    )
    table = daily_partials(ev, dims=["event_type"])
    # replay day 2: identical fresh partials -> table unchanged
    fresh = daily_partials(
        ev.filter(F.to_date("ts") == "2024-01-02"), dims=["event_type"]
    )
    replayed = upsert_partials(table, fresh, dims=["event_type"])
    assert {tuple(r) for r in replayed.collect()} == {
        tuple(r) for r in table.collect()
    }
    # correction: day 2 re-delivered with an extra row -> only day 2 moves
    corrected_src = spark.createDataFrame(
        [(d2, "a", 5.0), (d2, "a", 7.0)],
        "ts timestamp, event_type string, value double",
    )
    fixed = upsert_partials(
        table, daily_partials(corrected_src, dims=["event_type"]),
        dims=["event_type"],
    )
    got = {r.bucket: (r.n_rows, float(r.sum_value)) for r in fixed.collect()}
    assert got[d1] == (2, 4.0)
    assert got[d2] == (2, 12.0)


def test_histogram_state_upsert_replaces_all_bins_of_redelivered_day(spark):
    """upsert_partials keys on (bucket, dims) only, so a re-delivered day
    must replace EVERY bin row of that (day, dims) — including bins the
    correction no longer populates — or a stale bin count would survive
    and silently skew every later percentile read."""
    import datetime as dt

    from pyspark.sql import functions as F

    from riot_graphs_spark.operators.rollup import (
        histogram_partials,
        histogram_percentiles,
        upsert_partials,
    )

    d1 = dt.datetime(2024, 1, 1)
    d2 = dt.datetime(2024, 1, 2)
    spec = dict(dims=["event_type"], lo=0.0, hi=10.0, nbuckets=10)
    ev = spark.createDataFrame(
        [(d1, "a", 1.5), (d1, "a", 8.5), (d2, "a", 2.5), (d2, "a", 9.5)],
        "ts timestamp, event_type string, value double",
    )
    table = histogram_partials(ev, **spec)
    # replay day 2 unchanged -> no-op
    fresh = histogram_partials(
        ev.filter(F.to_date("ts") == "2024-01-02"), **spec
    )
    replayed = upsert_partials(table, fresh, dims=["event_type"])
    assert {tuple(r) for r in replayed.collect()} == {
        tuple(r) for r in table.collect()
    }
    # correction drops day 2's bin-9 row and moves mass to bin 0: the old
    # bin-9 state row must disappear, not linger beside the new bins
    corrected = histogram_partials(
        spark.createDataFrame(
            [(d2, "a", 0.5), (d2, "a", 2.5)],
            "ts timestamp, event_type string, value double",
        ),
        **spec,
    )
    fixed = upsert_partials(table, corrected, dims=["event_type"])
    got = {(r.bucket, r.bin): r.n for r in fixed.collect()}
    assert got == {
        (d1, 1): 1, (d1, 8): 1,   # day 1 untouched
        (d2, 0): 1, (d2, 2): 1,   # day 2 replaced wholesale
    }
    # and the percentile read sees only the corrected state
    p = histogram_percentiles(fixed, dims=["event_type"]).collect()
    by_day = {r.bucket: r.p95 for r in p}
    assert by_day[d2] == 2.0
