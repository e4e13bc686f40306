

def test_zipf_fit_hand_cases(spark):
    import math

    import pytest as _pytest

    from riot_graphs_spark.operators.textstats import zipf_fit

    # construct exact Zipf: token t1 x8, t2 x4, t3 x2, t4 x1 with
    # freq = 8/rank^1.5... use powers of 2 so ln-freq is linear in
    # ln(1/2): freqs 8,4,2,1 over ranks 1..4 is NOT log-log linear
    # (ranks aren't geometric) — instead fit y = ln f on x = ln r and
    # check against numpy-free closed-form computed here in python
    docs = spark.createDataFrame(
        [(" ".join(["aa"] * 8 + ["bb"] * 4 + ["cc"] * 2 + ["dd"]),)],
        "text string",
    )
    got = zipf_fit(docs, "text", top_n=10).collect()[0]
    assert got["n_terms"] == 4
    assert got["top_term"] == "aa" and got["top_freq"] == 8
    xs = [math.log(r) for r in (1, 2, 3, 4)]
    ys = [math.log(f) for f in (8, 4, 2, 1)]
    m = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    r2 = (m * sxy - sx * sy) ** 2 / (
        (m * sxx - sx * sx) * (m * syy - sy * sy)
    )
    assert got["slope"] == _pytest.approx(slope, abs=1e-8)
    assert got["r_squared"] == _pytest.approx(r2, abs=1e-8)

    # flat head (all tokens equally frequent): dy = 0 -> r2 NULL,
    # slope 0
    flat = zipf_fit(
        spark.createDataFrame([("xx yy zz xx yy zz",)], "text string"),
        "text",
        top_n=10,
    ).collect()[0]
    assert flat["slope"] == _pytest.approx(0.0)
    assert flat["r_squared"] is None

    # single-term corpus: fit undefined
    one = zipf_fit(
        spark.createDataFrame([("solo solo",)], "text string"),
        "text",
        top_n=10,
    ).collect()[0]
    assert one["n_terms"] == 1 and one["slope"] is None

    # top_n caps the head: 3 distinct tokens, top_n=2 keeps ranks 1-2
    cap = zipf_fit(
        spark.createDataFrame(
            [("aa aa aa bb bb cc",)], "text string"
        ),
        "text",
        top_n=2,
    ).collect()[0]
    assert cap["n_terms"] == 2 and cap["top_term"] == "aa"


def test_heaps_fit_hand_cases(spark):
    import math

    import pytest as _pytest

    from riot_graphs_spark.operators.textstats import heaps_fit

    # three docs in doc_id order: doc1 "aa bb" (n=2, V=2),
    # doc2 "aa cc" (n=4, V=3), doc3 "dd dd" (n=6, V=4)
    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa cc"), (3, "dd dd")],
        "doc_id bigint, text string",
    )
    got = heaps_fit(docs).collect()[0]
    assert (got["n_docs"], got["total_tokens"], got["vocab_size"]) == (
        3, 6, 4,
    )
    xs = [math.log(n) for n in (2, 4, 6)]
    ys = [math.log(v) for v in (2, 3, 4)]
    m = 3
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert got["beta"] == _pytest.approx(beta, abs=1e-8)
    # sub-linear growth: 0 < beta < 1
    assert 0 < got["beta"] < 1

    # fully duplicated corpus: V flat after doc 1 -> beta near 0
    dup = spark.createDataFrame(
        [(i, "same tokens here") for i in range(1, 6)],
        "doc_id bigint, text string",
    )
    flat = heaps_fit(dup).collect()[0]
    assert flat["vocab_size"] == 3
    assert abs(flat["beta"]) < 0.05

    # single doc: one point, no slope
    one = heaps_fit(
        spark.createDataFrame([(1, "x y")], "doc_id bigint, text string")
    ).collect()[0]
    assert one["beta"] is None


def test_vocab_jaccard_matrix_hand_case(spark):
    import pytest as _pytest

    from riot_graphs_spark.operators.textstats import (
        vocab_jaccard_matrix,
    )

    docs = spark.createDataFrame(
        [
            ("A", "x y z"),
            ("A", "x y"),       # repeats don't inflate the vocab set
            ("B", "y z w"),
            ("C", "q"),
        ],
        "source string, text string",
    )
    got = {
        (r["group_a"], r["group_b"]): r
        for r in vocab_jaccard_matrix(docs).collect()
    }
    assert len(got) == 3
    ab = got[("A", "B")]
    assert (ab["vocab_a"], ab["vocab_b"], ab["intersection"]) == (3, 3, 2)
    assert ab["jaccard"] == _pytest.approx(0.5)
    # disjoint pairs still appear, at 0
    assert got[("A", "C")]["jaccard"] == 0.0
    assert got[("B", "C")]["intersection"] == 0
