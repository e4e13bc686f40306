"""Independent verification of the round-11 statistics registrations.

Oracle parity (tests/test_oracle_parity.py) proves Spark and DuckDB
compute the SAME thing; these tests prove it is the RIGHT thing: each
statistic is re-derived from scratch in pure numpy/pandas from the
sf0.001 fixture (no shared SQL/DataFrame code) and compared to the
registered query's output.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_pd():
    return pd.read_parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def docs_pd():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _run(spark, name):
    from riot_graphs_spark.plans.driver_queries import QUERIES

    return QUERIES[name](spark, SF).collect()


def _daily(events_pd):
    ev = events_pd.dropna(subset=["value"])
    d = ev.assign(day=ev["ts"].dt.floor("D")).groupby("day")["value"]
    # mirror the 9-dp row quantization before the exact sum
    return d.apply(lambda s: float(np.sum(np.round(s, 9)))).sort_index()


def test_welch_anova_matches_numpy(spark, events_pd):
    ev = events_pd.dropna(subset=["value", "event_type"])
    groups = [g.values for _, g in ev.groupby("event_type")["value"]]
    n = np.array([len(g) for g in groups], float)
    m = np.array([g.mean() for g in groups])
    v = np.array([g.var(ddof=1) for g in groups])
    w = n / v
    sw = w.sum()
    grand = (w * m).sum() / sw
    k = len(groups)
    num = ((w * (m - grand) ** 2).sum()) / (k - 1)
    lam = (((1 - w / sw) ** 2) / (n - 1)).sum()
    f_stat = num / (1 + 2 * (k - 2) / (k**2 - 1) * lam)
    df2 = (k**2 - 1) / (3 * lam)
    row = _run(spark, "welch_anova_value_event")[0]
    assert row.k == k and row.n_rows == int(n.sum())
    assert row.welch_f == pytest.approx(f_stat, rel=1e-6)
    assert row.df2 == pytest.approx(df2, rel=1e-6)


def test_odds_ratio_matches_hand_counts(spark, events_pd):
    ev = events_pd.dropna(subset=["ts", "event_type"])
    wknd = ev["ts"].dt.dayofweek >= 5
    hit = ev["event_type"] == "purchase"
    a = int((wknd & hit).sum())
    b = int((wknd & ~hit).sum())
    c = int((~wknd & hit).sum())
    d = int((~wknd & ~hit).sum())
    row = _run(spark, "odds_ratio_weekend_purchase")[0]
    assert (row.n11, row.n10, row.n01, row.n00) == (a, b, c, d)
    orr = a * d / (b * c)
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert row.odds_ratio == pytest.approx(orr, rel=1e-6)
    assert row.ci_lo == pytest.approx(
        math.exp(math.log(orr) - 1.959963985 * se), rel=1e-6
    )


def test_theils_u_matches_entropy_identities(spark, docs_pd):
    d = docs_pd.copy()
    a = d["lang"].fillna("\x00null")
    b = d["source"].fillna("\x00null")
    n = len(d)

    def h(series):
        p = series.value_counts().values / n
        return float(-(p * np.log(p)).sum())

    joint = pd.crosstab(a, b).values.flatten()
    joint = joint[joint > 0] / n
    hj = float(-(joint * np.log(joint)).sum())
    mi = h(a) + h(b) - hj
    row = _run(spark, "theils_u_lang_source")[0]
    assert row.n == n
    assert row.u_lang_given_source == pytest.approx(mi / h(a), abs=1e-6)
    assert row.u_source_given_lang == pytest.approx(mi / h(b), abs=1e-6)


def test_gk_lambda_matches_modal_counts(spark, docs_pd):
    d = docs_pd.copy()
    a = d["lang"].fillna("\x00null")
    b = d["source"].fillna("\x00null")
    ct = pd.crosstab(a, b)
    n = ct.values.sum()
    lam_a_given_b = (ct.max(axis=0).sum() - ct.sum(axis=1).max()) / (
        n - ct.sum(axis=1).max()
    )
    lam_b_given_a = (ct.max(axis=1).sum() - ct.sum(axis=0).max()) / (
        n - ct.sum(axis=0).max()
    )
    row = _run(spark, "gk_lambda_lang_source")[0]
    assert row.lambda_lang_given_source == pytest.approx(
        lam_a_given_b, abs=1e-9
    )
    assert row.lambda_source_given_lang == pytest.approx(
        lam_b_given_a, abs=1e-9
    )


def test_newey_west_and_kpss_match_numpy(spark, events_pd):
    x = _daily(events_pd).values
    t = len(x)
    mu = x.mean()
    dev = x - mu
    gam = [float((dev[: t - l] * dev[l:]).sum()) for l in range(6)]
    lrv_sum = gam[0] + 2 * sum((1 - l / 6) * gam[l] for l in range(1, 6))
    se_hac = math.sqrt(max(lrv_sum / t, 0) / t)
    se_iid = math.sqrt((gam[0] / t) / t)
    row = _run(spark, "newey_west_daily_mean")[0]
    assert row.n_days == t
    assert row.daily_mean == pytest.approx(mu, rel=1e-9)
    assert row.se_iid == pytest.approx(se_iid, rel=1e-6)
    assert row.se_hac == pytest.approx(se_hac, rel=1e-6)

    cs = np.cumsum(dev)
    eta = (cs**2).sum() / t**2 / (lrv_sum / t)
    krow = _run(spark, "ts_kpss_level")[0]
    assert krow.kpss_eta == pytest.approx(eta, rel=1e-6)
    assert krow.reject_level_stationary_5pct == (eta > 0.463)


def test_wilcoxon_and_sign_match_scipy_style(spark, events_pd):
    ev = events_pd.dropna(subset=["value", "user_id"])
    per = (
        ev.assign(wk=ev["ts"].dt.dayofweek >= 5)
        .groupby(["user_id", "wk"])["value"]
        .apply(lambda s: round(float(np.sum(np.round(s, 9))) / len(s), 9))
        .unstack()
    )
    per = per.dropna()
    diffs = np.round(per[True] - per[False], 9)
    diffs = diffs[diffs != 0].values
    n = len(diffs)
    srow = _run(spark, "sign_test_weekend_value")[0]
    npos = int((diffs > 0).sum())
    assert (srow.n, srow.n_pos, srow.n_neg) == (
        n, npos, int((diffs < 0).sum())
    )
    assert srow.z == pytest.approx((npos - n / 2) / math.sqrt(n / 4), abs=1e-6)

    # midranks of |d| with ties
    order = np.abs(diffs)
    ser = pd.Series(order)
    ranks = ser.rank(method="average").values
    wplus = float(ranks[diffs > 0].sum())
    # tie correction
    _, counts = np.unique(order, return_counts=True)
    ties = float((counts**3 - counts).sum())
    z = (wplus - n * (n + 1) / 4) / math.sqrt(
        n * (n + 1) * (2 * n + 1) / 24 - ties / 48
    )
    wrow = _run(spark, "wilcoxon_signed_rank_weekend")[0]
    assert wrow.n == n
    assert wrow.w_plus == pytest.approx(wplus, abs=1e-6)
    assert wrow.z == pytest.approx(z, abs=1e-6)


def test_page_trend_matches_numpy(spark, events_pd):
    ev = events_pd.dropna(subset=["value", "event_type"])
    cell = (
        ev.assign(wd=ev["ts"].dt.dayofweek + 1)
        .groupby(["event_type", "wd"])["value"]
        .apply(lambda s: float(np.sum(np.round(s, 9))) / len(s))
        .unstack()
    )
    cell = cell.dropna()  # complete blocks only
    b = len(cell)
    ranks = cell.rank(axis=1, method="average")
    L = float((ranks * np.arange(1, 8)).values.sum())
    e_l = b * 7 * 64 / 4
    var_l = b * 49 * 8 * 48 / 144
    row = _run(spark, "page_trend_weekday")[0]
    assert row.n_blocks == b
    assert row.page_l == pytest.approx(L, abs=1e-6)
    assert row.z == pytest.approx((L - e_l) / math.sqrt(var_l), abs=1e-6)


def test_durbin_watson_matches_numpy(spark, events_pd):
    x = _daily(events_pd).values
    t = np.arange(1, len(x) + 1, dtype=float)
    b = ((x * t).sum() - t.sum() * x.sum() / len(x)) / (
        (t * t).sum() - t.sum() ** 2 / len(x)
    )
    a = x.mean() - b * t.mean()
    e = x - (a + b * t)
    dw = float(((e[1:] - e[:-1]) ** 2).sum() / (e**2).sum())
    row = _run(spark, "durbin_watson_daily")[0]
    assert row.n_days == len(x)
    assert row.trend_slope == pytest.approx(b, rel=1e-6)
    assert row.durbin_watson == pytest.approx(dw, rel=1e-5)


def test_approx_and_permutation_entropy_match_numpy(spark, events_pd):
    x = _daily(events_pd).values
    t = len(x)
    r = round(0.2 * float(np.std(x, ddof=1)), 9)

    def phi(m):
        vecs = np.array([x[i : i + m] for i in range(t - m + 1)])
        c = [
            (np.max(np.abs(vecs - v), axis=1) <= r).sum()
            for v in vecs
        ]
        return np.mean(np.log(np.array(c) / (t - m + 1)))

    apen = phi(2) - phi(3)
    row = _run(spark, "ts_approx_entropy")[0]
    assert row.n_days == t
    assert row.tolerance_r == pytest.approx(r, abs=1e-9)
    assert row.apen == pytest.approx(apen, abs=1e-6)

    pats = {}
    for i in range(t - 2):
        w = [(x[i + j], j) for j in range(3)]
        key = "".join(str(j) for _, j in sorted(w))
        pats[key] = pats.get(key, 0) + 1
    tot = sum(pats.values())
    h = -sum(c / tot * math.log(c / tot) for c in pats.values())
    prow = _run(spark, "ts_permutation_entropy")[0]
    assert prow.n_windows == tot and prow.n_patterns == len(pats)
    assert prow.h_perm == pytest.approx(h, abs=1e-6)
    assert prow.h_norm == pytest.approx(h / math.log(6), abs=1e-6)


def test_purchase_rate_ratio_matches_hand(spark, events_pd):
    p = events_pd[events_pd["event_type"] == "purchase"]
    split = pd.Timestamp("2024-01-16")
    k1 = int((p["ts"] < split).sum())
    k2 = int((p["ts"] >= split).sum())
    rr = (k2 / 16.0) / (k1 / 15.0)
    z = math.log(rr) / math.sqrt(1 / k1 + 1 / k2)
    row = _run(spark, "purchase_rate_ratio_halves")[0]
    assert (row.k_first, row.k_second) == (k1, k2)
    assert row.rate_ratio == pytest.approx(rr, rel=1e-9)
    assert row.z == pytest.approx(z, rel=1e-6)


def test_qte_deciles_match_numpy_empirical_quantiles(spark, docs_pd):
    d = docs_pd.dropna(subset=["n_chars", "lang"])
    en = np.sort(d[d["lang"] == "en"]["n_chars"].values)
    rest = np.sort(d[d["lang"] != "en"]["n_chars"].values)

    def lower_q(v, p):  # first value with 100*cum >= p*tot
        k = math.ceil(p * len(v) / 100)
        return v[max(0, k - 1)]

    rows = {r.pct: r for r in _run(spark, "qte_doclen_deciles")}
    for p in range(10, 100, 10):
        assert rows[p].q_en == lower_q(en, p), p
        assert rows[p].q_rest == lower_q(rest, p), p
        assert rows[p].qte == rows[p].q_en - rows[p].q_rest
