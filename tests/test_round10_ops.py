"""Edge-case unit tests for the round-10 operators — the semantics the
oracle-parity sweep can't pin (it only sees the fixture corpus): NULL
band gates, degenerate-scale fallbacks, zero-token documents, constant
features, boundary pins.  Hand-computed expectations throughout.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------- survival

def test_km_bands_null_while_s1_and_after_zero_pin(spark):
    from riot_graphs_spark.operators.funnel import km_bands

    # t=1: censor only (S stays 1 -> bands NULL); t=2: one of three
    # at-risk churns (0 < S < 1 -> bands real); t=3: everyone left
    # churns (d = n -> S pinned 0, bands NULL).
    df = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 1), (3, 1)], "duration int, event int"
    )
    rows = {r.t: r for r in km_bands(df).collect()}
    assert rows[1].survival == 1.0
    assert rows[1].ci_lo is None and rows[1].ci_hi is None
    assert rows[1].se == 0.0
    assert 0 < rows[2].survival < 1
    assert rows[2].ci_lo is not None and rows[2].ci_hi is not None
    assert 0 < rows[2].ci_lo < rows[2].survival < rows[2].ci_hi < 1
    assert rows[3].survival == 0.0
    assert rows[3].ci_lo is None and rows[3].ci_hi is None


def test_exponential_hazard_ratio_hand_case(spark):
    from riot_graphs_spark.operators.funnel import exponential_hazard_ratio

    # arm a: 2 events / 10 person-days; arm b: 1 event / 10 -> HR 0.5
    df = spark.createDataFrame(
        [("a", 5, 1), ("a", 5, 1), ("b", 4, 1), ("b", 6, 0)],
        "group string, duration int, event int",
    )
    r = exponential_hazard_ratio(df).collect()[0]
    assert (r.events_a, r.time_a, r.events_b, r.time_b) == (2, 10, 1, 10)
    assert r.hr == pytest.approx(0.5)
    assert r.hr_lo < 0.5 < r.hr_hi


# ------------------------------------------------------------ ADVICE fixes

def test_textrank_zero_token_docs_do_not_crash(spark):
    from riot_graphs_spark.operators.ranking import textrank_keywords

    docs = spark.createDataFrame(
        [("",), ("!!! ???",), ("中文文本",),
         ("spark joins spark windows spark joins windows joins",)],
        "text string",
    )
    out = textrank_keywords(docs, top_k=5, min_pair_count=1).collect()
    assert {r.token for r in out} <= {"spark", "joins", "windows"}
    assert len(out) >= 1


def test_huber_zero_mad_keeps_median(spark):
    from riot_graphs_spark.operators.profile import huber_location

    # over half the mass on 10 -> lower MAD 0; the gate must keep mu at
    # the median, NOT drift to the plain mean (12.25)
    df = spark.createDataFrame(
        [(10.0,)] * 6 + [(19.0,)] * 4, "v double"
    )
    r = huber_location(df, "v").collect()[0]
    assert r.mad_low == 0.0
    assert r.huber_mu == r.median_low == 10.0
    assert r.mean == pytest.approx(13.6)


def test_mahalanobis_constant_feature_contributes_zero(spark):
    from riot_graphs_spark.operators.profile import mahalanobis_diag_outliers

    # f2 constant: with the old NULL-poisoning every d2 was NULL; now
    # the outlier on f1 must surface with a real distance
    rows = [(i, v, 7) for i, v in enumerate([10, 10, 10, 10, 100])]
    df = spark.createDataFrame(rows, "id long, f1 long, f2 long")
    out = mahalanobis_diag_outliers(df, "id", ["f1", "f2"], top_k=1)
    r = out.collect()[0]
    assert r.id == 4 and r.d2 is not None and r.d2 > 1


# ------------------------------------------------------------- time series

def test_bollinger_null_until_full_window_and_breach(spark):
    from riot_graphs_spark.operators.timeseries import bollinger_bands

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    vals = [10.0, 10.0, 50.0]
    df = spark.createDataFrame(
        [Row(ts=base + dt.timedelta(days=i), value=v)
         for i, v in enumerate(vals)],
    )
    out = {r.bucket.day: r for r in
           bollinger_bands(df, window=2, k=1.0).collect()}
    assert out[1].mid is None and out[1].breach_hi is None
    assert out[2].mid == 10.0 and out[2].band_hi == 10.0
    # day 3: window (10, 50): mid 30, std 20 -> hi 50; 50 > 50 is False
    assert out[3].mid == 30.0 and not out[3].breach_hi


def test_turning_points_monotone_series(spark):
    from riot_graphs_spark.operators.timeseries import turning_points_test

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [Row(ts=base + dt.timedelta(days=i), value=float(i))
         for i in range(12)],
    )
    r = turning_points_test(df).collect()[0]
    assert r.turning_points == 0
    assert r.z < 0 and r.nonrandom  # far fewer than 2(n-2)/3


def test_bartels_monotone_rvn(spark):
    from riot_graphs_spark.operators.timeseries import bartels_rank_test

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    n = 12
    df = spark.createDataFrame(
        [Row(ts=base + dt.timedelta(days=i), value=float(i))
         for i in range(n)],
    )
    r = bartels_rank_test(df).collect()[0]
    # monotone ranks: NM = n-1, denominator n(n^2-1)/12
    assert r.rvn == pytest.approx((n - 1) / (n * (n * n - 1) / 12.0))
    assert r.z < 0 and r.nonrandom


def test_sprt_crosses_h1_on_high_rate(spark):
    from riot_graphs_spark.operators.evaluation import sprt_daily

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(6):
        for i in range(100):
            rows.append(
                Row(ts=base + dt.timedelta(days=d), hit=(i % 2 == 0))
            )
    df = spark.createDataFrame(rows)
    out = sorted(
        sprt_daily(df, "ts", F.col("hit")).collect(),
        key=lambda r: r.day,
    )
    # 50% >> p1=25%: LLR climbs, H1 accepted exactly once (first cross)
    assert out[-1].decision == "accept_h1"
    assert sum(r.crossed for r in out) == 1
    # llr is an exact literal-weighted sum
    k, n = out[0].k_cum, out[0].n_cum
    expect = k * math.log(0.25 / 0.2) + (n - k) * math.log(0.75 / 0.8)
    assert out[0].llr == pytest.approx(expect, abs=1e-9)


def test_chow_detects_slope_break(spark):
    from riot_graphs_spark.operators.timeseries import chow_test

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # flat-with-jitter then steep: pooled line fits badly, each segment
    # fits nearly perfectly (exact-zero split SSR would zero the F
    # denominator and NULL the statistic by design — jitter keeps it
    # finite)
    vals = [10.0 + (0.1 if i % 2 else -0.1) for i in range(10)] + [
        10.0 + 5 * i + (0.1 if i % 2 else -0.1) for i in range(1, 11)
    ]
    df = spark.createDataFrame(
        [Row(ts=base + dt.timedelta(days=i), value=v)
         for i, v in enumerate(vals)],
    )
    r = chow_test(df).collect()[0]
    assert r.n_buckets == 20
    assert r.ssr_split < r.ssr_pooled / 100
    assert r.f_stat > 100


def test_interarrival_cv_metronomic_user(spark):
    from riot_graphs_spark.operators.timeseries import interarrival_cv_profile

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(user_id=1, ts=base + dt.timedelta(seconds=60 * i))
        for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    r = interarrival_cv_profile(df).collect()[0]
    assert r.n_users == 1
    assert r.mean_cv == 0.0 and r.bursty_share == 0.0


# ---------------------------------------------------------------- A/B stats

def test_cohens_d_hand_case(spark):
    from riot_graphs_spark.operators.evaluation import cohens_d

    df = spark.createDataFrame(
        [(True, 10.0), (True, 12.0), (False, 8.0), (False, 10.0)],
        "f boolean, v double",
    )
    r = cohens_d(df, "v", F.col("f")).collect()[0]
    # means 11 vs 9, pooled sd = sqrt((2+2)/2) = sqrt(2)
    assert r.mean_true == 11.0 and r.mean_false == 9.0
    assert r.pooled_sd == pytest.approx(math.sqrt(2.0))
    assert r.cohens_d == pytest.approx(2.0 / math.sqrt(2.0))
    assert abs(r.hedges_g) < abs(r.cohens_d)


def test_ratio_metric_delta_identical_arms(spark):
    from riot_graphs_spark.operators.evaluation import ratio_metric_delta

    rows = []
    for u in range(20):
        for _ in range(3):
            rows.append(Row(user_id=u, value=2.0))
    df = spark.createDataFrame(rows)
    r = ratio_metric_delta(
        df, "user_id", F.col("value"), F.lit(1.0)
    ).collect()[0]
    assert r.ratio_a == r.ratio_b == 2.0
    assert r.diff == 0.0 and not r.significant


def test_overdispersion_constant_counts(spark):
    from riot_graphs_spark.operators.evaluation import count_overdispersion

    rows = [Row(user_id=u) for u in range(10) for _ in range(5)]
    df = spark.createDataFrame(rows)
    r = count_overdispersion(df, "user_id").collect()[0]
    assert (r.n_units, r.n_events, r.mean) == (10, 50, 5.0)
    assert r.variance == 0.0 and r.dispersion == 0.0
    assert not r.overdispersed


def test_jonckheere_increasing_groups(spark):
    from riot_graphs_spark.operators.evaluation import jonckheere_terpstra

    rows = (
        [Row(g="1", v=float(i)) for i in range(10)]
        + [Row(g="2", v=float(i + 20)) for i in range(10)]
        + [Row(g="3", v=float(i + 40)) for i in range(10)]
    )
    df = spark.createDataFrame(rows)
    r = jonckheere_terpstra(df, "v", "g", ["1", "2", "3"]).collect()[0]
    # perfectly separated: every cross-pair counts -> 2J = 2 * 3 * 100
    assert r.j2 == 600
    assert r.trend == "increasing" and r.z > 3


def test_mood_median_shifted_groups(spark):
    from riot_graphs_spark.operators.evaluation import mood_median_test

    rows = [Row(g="a", v=float(i)) for i in range(20)] + [
        Row(g="b", v=float(i + 100)) for i in range(20)
    ]
    df = spark.createDataFrame(rows)
    r = mood_median_test(df, "v", "g").collect()[0]
    # all of b above the pooled median, none of a -> maximal chi2 = n
    assert r.k == 2 and r.chi2 == pytest.approx(40.0)
    assert r.p_approx < 0.001


# ------------------------------------------------------------- embeddings

def test_int8_snr_constant_vector_null(spark):
    from riot_graphs_spark.operators.similarity import int8_quantization_snr

    df = spark.createDataFrame(
        [Row(embedding=[1.0, 1.0, 1.0, 1.0])],
    )
    r = int8_quantization_snr(df).collect()[0]
    # constant grid quantizes exactly: mse 0, variance 0 -> snr NULL
    assert r.mse == 0.0 and r.variance == 0.0 and r.snr is None


def test_norm_outliers_flags_zero_vector(spark):
    from riot_graphs_spark.operators.similarity import norm_outliers

    rows = [Row(vec_id=i, embedding=[1.0, 1.0]) for i in range(9)]
    rows.append(Row(vec_id=99, embedding=[0.0, 0.0]))
    df = spark.createDataFrame(rows)
    top = norm_outliers(df, top_k=1).collect()[0]
    assert top.vec_id == 99 and top.norm == 0.0 and top.z < 0


def test_participation_ratio_identity_cov(spark):
    from riot_graphs_spark.operators.similarity import participation_ratio

    # two orthogonal +/- patterns: cov is diagonal with equal entries
    # -> PR = d = 2 (effective_dim_share 1)
    rows = [
        Row(vec_id=0, embedding=[1.0, 1.0]),
        Row(vec_id=1, embedding=[-1.0, 1.0]),
        Row(vec_id=2, embedding=[1.0, -1.0]),
        Row(vec_id=3, embedding=[-1.0, -1.0]),
    ]
    r = participation_ratio(spark.createDataFrame(rows)).collect()[0]
    assert r.n_dims == 2
    assert r.participation_ratio == pytest.approx(2.0)
    assert r.effective_dim_share == pytest.approx(1.0)


# ------------------------------------------------------------ text/corpus

def test_lang_script_mismatch_flags_latin_zh(spark):
    from riot_graphs_spark.operators.textstats import lang_script_mismatch

    df = spark.createDataFrame(
        [("zh", "this is latin text"), ("zh", "中文中文中文"),
         ("en", "plain english"), ("en", "中文中文中文中文")],
        "lang string, text string",
    )
    rows = {r.lang: r for r in lang_script_mismatch(df).collect()}
    assert rows["zh"].mismatch_docs == 1  # the latin 'zh' doc
    assert rows["en"].mismatch_docs == 1  # the CJK 'en' doc
    assert rows["zh"].latin_expected is False
    assert rows["en"].latin_expected is True


def test_completeness_profile_counts(spark):
    from riot_graphs_spark.operators.profile import completeness_profile

    df = spark.createDataFrame(
        [(1, "x"), (2, ""), (3, None), (None, "  ")],
        "id long, s string",
    )
    rows = {r.column: r for r in
            completeness_profile(df, ["id", "s"], ["s"]).collect()}
    assert rows["id"].nulls == 1 and rows["id"].empties is None
    assert rows["s"].nulls == 1 and rows["s"].empties == 2
    assert rows["s"].null_share == pytest.approx(0.25)


def test_hapax_share_hand_case(spark):
    from riot_graphs_spark.operators.textstats import hapax_share

    df = spark.createDataFrame(
        [("s1", "alpha alpha beta"), ("s1", "gamma")],
        "source string, text string",
    )
    r = hapax_share(df).collect()[0]
    # vocab {alpha, beta, gamma}; beta+gamma are hapax
    assert (r.vocab, r.hapax) == (3, 2)
    assert r.hapax_share == pytest.approx(2 / 3)


def test_token_yield_best_decile_first(spark, sf_dir):
    from riot_graphs_spark.operators.textstats import token_yield_by_quality

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = sorted(
        token_yield_by_quality(docs).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    assert rows[-1].cum_token_share == pytest.approx(1.0)
    shares = [r.cum_token_share for r in rows]
    assert shares == sorted(shares)  # cumulative is monotone


def test_lsh_band_stats_pair_identity(spark, sf_dir):
    from riot_graphs_spark.operators.dedup import lsh_band_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = lsh_band_stats(docs).collect()
    assert {r.band for r in rows} == {0, 1, 2, 3}
    for r in rows:
        # candidate pairs are exactly sum C(s,2) and bounded by C(n,2)
        assert 0 <= r.candidate_pairs <= r.n_docs * (r.n_docs - 1) // 2
        assert r.singleton_buckets <= r.n_buckets
        assert r.max_bucket >= 1
