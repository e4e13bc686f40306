"""Unit tests for connected-components dedup clustering and the
fixed-bound histogram operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from riot_graphs_spark.operators.dedup import connected_components
from riot_graphs_spark.operators.profile import fixed_histogram


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def test_cc_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: every node must land in component 1, even though
    # 5 is four hops from 1 (exercises multi-round propagation).
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = {
        (r.id, r.component_id)
        for r in connected_components(pairs).collect()
    }
    assert got == {(i, 1) for i in range(1, 6)}


def test_cc_multiple_components_and_edge_direction(spark):
    # Two components; edges given in both (a<b) and (a>b) orientation.
    pairs = _pairs(spark, [(10, 11), (12, 11), (20, 21)])
    got = {
        (r.id, r.component_id)
        for r in connected_components(pairs).collect()
    }
    assert got == {(10, 10), (11, 10), (12, 10), (20, 20), (21, 20)}


def test_cc_converges_before_max_iter(spark):
    # A triangle converges in one round; max_iter is an upper bound, not a
    # row-count knob — result identical with a tight cap.
    pairs = _pairs(spark, [(1, 2), (2, 3), (1, 3)])
    a = sorted(
        (r.id, r.component_id)
        for r in connected_components(pairs, max_iter=2).collect()
    )
    b = sorted(
        (r.id, r.component_id)
        for r in connected_components(pairs, max_iter=15).collect()
    )
    assert a == b == [(1, 1), (2, 1), (3, 1)]


def test_histogram_clamps_and_reconciles(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.9,), (10.0,), (55.0,), (100.0,), (250.0,), (None,)],
        "x double",
    )
    hist = fixed_histogram(df, "x", 0.0, 100.0, 10).collect()
    by_bucket = {r.bucket: r for r in hist}
    # -5 clamps into bucket 0; 100 and 250 clamp into bucket 9.
    assert by_bucket[0].n == 3 and by_bucket[0].bucket_min == -5.0
    assert by_bucket[9].n == 2 and by_bucket[9].bucket_max == 250.0
    assert by_bucket[1].n == 1  # 10.0 belongs to [10, 20)
    assert by_bucket[5].n == 1
    # Null dropped; bucket totals reconcile with non-null count.
    assert sum(r.n for r in hist) == 7
    # Edges are lo + k*width.
    assert by_bucket[5].edge_lo == 50.0 and by_bucket[5].edge_hi == 60.0


def test_ewma_matches_hand_recursion(spark):
    import datetime as dt

    from pyspark.sql import Row

    from riot_graphs_spark.operators.timeseries import ewma

    base = dt.datetime(2024, 1, 1)
    xs = [10.0, 20.0, 0.0, 40.0, 40.0]
    rows = [
        Row(series="a", ts=base + dt.timedelta(hours=i), event_id=i, value=x)
        for i, x in enumerate(xs)
    ] + [Row(series="b", ts=base, event_id=99, value=7.0)]
    df = spark.createDataFrame(rows)
    got = {
        (r.series, r.ts): r.ewma
        for r in ewma(
            df, dims=["series"], ts="ts", value="value", alpha=0.5,
            tiebreak="event_id",
        ).collect()
    }
    acc, exp = None, []
    for i, x in enumerate(xs):
        acc = x if i == 0 else 0.5 * x + 0.5 * acc
        exp.append(acc)
    for i, e in enumerate(exp):
        assert abs(got[("a", base + dt.timedelta(hours=i))] - e) < 1e-12
    assert got[("b", base)] == 7.0  # single point: seed passes through
