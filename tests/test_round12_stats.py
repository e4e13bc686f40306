"""Independent verification of the round-12 statistics registrations.

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


@pytest.fixture(scope="module")
def emb_pd():
    return pd.read_parquet(f"{SF}/embeddings.parquet")


def _run(spark, name):
    from riot_graphs_spark.plans.driver_queries import QUERIES

    return QUERIES[name](spark, SF).collect()


def _daily_x(events_pd):
    ev = events_pd.dropna(subset=["value"])
    d = ev.assign(day=ev["ts"].dt.floor("D")).groupby("day")["value"]
    return d.apply(lambda s: float(np.sum(np.round(s, 9)))).sort_index()


def test_gtest_matches_numpy(spark, docs_pd):
    d = docs_pd.dropna(subset=["lang", "source"])
    tab = pd.crosstab(d["lang"], d["source"]).values.astype(float)
    n = tab.sum()
    e = np.outer(tab.sum(1), tab.sum(0)) / n
    mask = tab > 0
    g = 2.0 * (tab[mask] * np.log(tab[mask] / e[mask])).sum()
    row = _run(spark, "gtest_lang_source")[0]
    assert row.n == int(n)
    assert row.dof == (tab.shape[0] - 1) * (tab.shape[1] - 1)
    assert row.g == pytest.approx(g, rel=1e-6)


def _kendall_w_numpy(events_pd):
    ev = events_pd.dropna(subset=["event_type"])
    c = (
        ev.assign(day=ev["ts"].dt.floor("D"))
        .groupby(["day", "event_type"])
        .size()
        .unstack()
    )
    k = c.shape[1]
    c = c.dropna()  # complete blocks only
    ranks = c.rank(axis=1, method="average")
    m = len(c)
    rj = ranks.sum(0).values
    s = ((rj - m * (k + 1) / 2.0) ** 2).sum()
    tt = 0.0
    for _, row in c.iterrows():
        _, t = np.unique(row.values, return_counts=True)
        tt += float((t**3 - t).sum())
    w = 12.0 * s / (m**2 * k * (k**2 - 1) - m * tt)
    return m, k, w


def test_kendall_w_matches_numpy(spark, events_pd):
    m, k, w = _kendall_w_numpy(events_pd)
    row = _run(spark, "kendall_w_event_ranks")[0]
    assert (row.m, row.k) == (m, k)
    assert row.w == pytest.approx(w, rel=1e-6)
    assert row.chi2 == pytest.approx(m * (k - 1) * w, rel=1e-6)


def test_ansari_bradley_matches_numpy(spark, events_pd):
    ev = events_pd.dropna(subset=["value"])
    wk = ev["ts"].dt.dayofweek >= 5
    x = ev["value"].values
    n = len(x)
    order = np.argsort(x, kind="stable")
    ranks = np.empty(n, float)
    # midrank-averaged Ansari scores min(i, N+1-i) over tie blocks
    xs = x[order]
    base = np.minimum(np.arange(1, n + 1), n + 1 - np.arange(1, n + 1))
    scores = np.empty(n, float)
    i = 0
    while i < n:
        j = i
        while j < n and xs[j] == xs[i]:
            j += 1
        scores[i:j] = base[i:j].mean()
        i = j
    a = np.empty(n, float)
    a[order] = scores
    a1 = a[wk.values].sum()
    n1 = int(wk.sum())
    n2 = n - n1
    e = n1 * a.sum() / n
    var = n1 * n2 / (n * n * (n - 1.0)) * (n * (a**2).sum() - a.sum() ** 2)
    row = _run(spark, "ansari_bradley_value_weekend")[0]
    assert (row.n, row.n1, row.n2) == (n, n1, n2)
    assert row.ab == pytest.approx(a1, rel=1e-6)
    assert row.z == pytest.approx((a1 - e) / math.sqrt(var), rel=1e-5)


def _midranks(v):
    s = pd.Series(v)
    return s.rank(method="average").values


def test_brunner_munzel_matches_numpy(spark, docs_pd):
    d = docs_pd.dropna(subset=["n_chars", "lang"])
    x = d.loc[d["lang"] == "en", "n_chars"].values.astype(float)
    y = d.loc[d["lang"] != "en", "n_chars"].values.astype(float)
    n1, n2 = len(x), len(y)
    pooled = np.concatenate([x, y])
    r = _midranks(pooled)
    rx, ry = r[:n1], r[n1:]
    rbx, rby = rx.mean(), ry.mean()
    rxin, ryin = _midranks(x), _midranks(y)
    s1 = ((rx - rxin - rbx + (n1 + 1) / 2.0) ** 2).sum() / (n1 - 1)
    s2 = ((ry - ryin - rby + (n2 + 1) / 2.0) ** 2).sum() / (n2 - 1)
    wbfn = (
        n1 * n2 * (rby - rbx) / (n1 + n2) / math.sqrt(n1 * s1 + n2 * s2)
    )
    p_hat = (rby - (n2 + 1) / 2.0) / n1
    v1, v2 = n1 * s1, n2 * s2
    df = (v1 + v2) ** 2 / (v1**2 / (n1 - 1) + v2**2 / (n2 - 1))
    row = _run(spark, "brunner_munzel_doclen")[0]
    assert (row.n1, row.n2) == (n1, n2)
    assert row.p_hat == pytest.approx(p_hat, rel=1e-6)
    assert row.w_bm == pytest.approx(wbfn, rel=1e-5)
    assert row.df == pytest.approx(df, rel=1e-5)


def test_bws_matches_numpy(spark, docs_pd):
    d = docs_pd.dropna(subset=["n_chars", "lang"])
    x = np.sort(d.loc[d["lang"] == "en", "n_chars"].values.astype(float))
    y = np.sort(d.loc[d["lang"] != "en", "n_chars"].values.astype(float))
    n1, n2 = len(x), len(y)
    pooled = np.concatenate([x, y])
    r = _midranks(pooled)

    def leg(rk, nk, no):
        i = np.arange(1, nk + 1, dtype=float)
        nn = float(nk + no)
        num = (rk - nn / nk * i) ** 2
        den = (i / (nk + 1)) * (1 - i / (nk + 1)) * (no * nn / nk)
        return (num / den).sum() / nk

    # pooled midranks of each group's sorted values: within a tie block
    # the midrank is constant, so sorting x/y first matches any i-order
    rx = np.sort(r[:n1])
    ry = np.sort(r[n1:])
    b = 0.5 * (leg(rx, n1, n2) + leg(ry, n2, n1))
    row = _run(spark, "bws_doclen_en_rest")[0]
    assert (row.n1, row.n2) == (n1, n2)
    assert row.b == pytest.approx(b, rel=1e-5)


def test_quade_matches_numpy(spark, events_pd):
    ev = events_pd.dropna(subset=["event_type"])
    c = (
        ev.assign(day=ev["ts"].dt.floor("D"))
        .groupby(["day", "event_type"])
        .size()
        .unstack()
        .dropna()
    )
    m, k = c.shape
    r = c.rank(axis=1, method="average")
    rng = c.max(1) - c.min(1)
    q = rng.rank(method="average")
    s = q.values[:, None] * (r.values - (k + 1) / 2.0)
    sj = s.sum(0)
    a2 = (s**2).sum()
    b2 = (sj**2).sum() / m
    f = (m - 1) * b2 / (a2 - b2) if a2 != b2 else None
    row = _run(spark, "quade_event_types")[0]
    assert (row.m, row.k) == (m, k)
    assert (row.df1, row.df2) == (k - 1, (m - 1) * (k - 1))
    if f is not None:
        assert row.f == pytest.approx(f, rel=1e-6)


def test_engle_granger_matches_numpy(spark, events_pd):
    ev = events_pd
    d = (
        ev.assign(day=ev["ts"].dt.floor("D"))
        .groupby("day")["event_type"]
        .agg(
            x=lambda s: int((s == "click").sum()),
            y=lambda s: int((s == "purchase").sum()),
        )
        .sort_index()
    )
    x, y = d["x"].values.astype(float), d["y"].values.astype(float)
    n = len(x)
    b = ((n * (x * y).sum() - x.sum() * y.sum())
         / (n * (x * x).sum() - x.sum() ** 2))
    a = (y.sum() - b * x.sum()) / n
    e = y - a - b * x
    el, de = e[:-1], np.diff(e)
    rho = (el * de).sum() / (el * el).sum()
    s2 = ((de - rho * el) ** 2).sum() / (n - 1 - 1)
    t = rho / math.sqrt(s2 / (el * el).sum())
    row = _run(spark, "engle_granger_clicks_purchases")[0]
    assert row.n_days == n
    assert row.beta == pytest.approx(b, rel=1e-6)
    assert row.alpha == pytest.approx(a, rel=1e-6)
    assert row.rho == pytest.approx(rho, rel=1e-5)
    assert row.t_stat == pytest.approx(t, rel=1e-4)


def test_sample_entropy_matches_numpy(spark, events_pd):
    x = _daily_x(events_pd).values
    t = len(x)
    r = round(0.2 * float(np.std(x, ddof=1)), 9)
    v = np.array([x[i : i + 3] for i in range(t - 2)])
    bb = aa = 0
    for i in range(len(v)):
        for j in range(i + 1, len(v)):
            if max(abs(v[i][0] - v[j][0]), abs(v[i][1] - v[j][1])) <= r:
                bb += 1
                if abs(v[i][2] - v[j][2]) <= r:
                    aa += 1
    row = _run(spark, "ts_sample_entropy")[0]
    assert row.n_days == t
    assert (row.n_m_matches, row.n_m1_matches) == (bb, aa)
    if aa and bb:
        assert row.sampen == pytest.approx(-math.log(aa / bb), rel=1e-6)


def test_cusum_squares_matches_numpy(spark, events_pd):
    x = _daily_x(events_pd)
    x2 = np.round(x.values**2, 9)
    cum = np.cumsum(x2) / x2.sum()
    k = np.arange(1, len(x2) + 1) / len(x2)
    gaps = np.abs(cum - k)
    i = int(np.argmax(gaps))  # numpy argmax takes the FIRST max = earliest
    row = _run(spark, "ts_cusum_squares")[0]
    assert row.n_days == len(x2)
    assert row.d_stat == pytest.approx(gaps[i], abs=1e-8)
    assert pd.Timestamp(row.break_day) == x.index[i]


def test_parkinson_matches_numpy(spark, events_pd):
    ev = events_pd.dropna(subset=["value"]).sort_values("ts")
    ev = ev[ev["value"] > 0]
    g = ev.assign(day=ev["ts"].dt.floor("D")).groupby("day")["value"]
    h, low = g.max(), g.min()
    o, c = g.first(), g.last()
    n = len(h)
    park = math.sqrt(
        float((np.log(h / low) ** 2).sum()) / (4 * math.log(2) * n)
    )
    gk = float(
        (
            0.5 * np.log(h / low) ** 2
            - (2 * math.log(2) - 1) * np.log(c / o) ** 2
        ).sum()
    )
    row = _run(spark, "ts_parkinson_volatility")[0]
    assert row.n_days == n
    assert row.parkinson_vol == pytest.approx(park, rel=1e-6)
    if gk >= 0:
        assert row.garman_klass_vol == pytest.approx(
            math.sqrt(gk / n), rel=1e-6
        )


def test_drawdown_matches_numpy(spark, events_pd):
    x = _daily_x(events_pd)
    peak = np.maximum.accumulate(x.values)
    draw = peak - x.values
    i = int(np.argmax(draw))
    row = _run(spark, "ts_drawdown_stats")[0]
    assert row.n_days == len(x)
    # non-vacuity: the daily series must actually decline somewhere
    assert row.max_drawdown > 0
    assert row.max_drawdown == pytest.approx(draw[i], abs=1e-6)
    assert pd.Timestamp(row.trough_day) == x.index[i]
    # r13 rework: the TRUE maximum relative drawdown (max over days of
    # draw/peak), not draw/peak at the absolute-drawdown argmax
    with np.errstate(divide="ignore", invalid="ignore"):
        frac = np.where(peak > 0, draw / peak, np.nan)
    assert row.max_drawdown_frac == pytest.approx(
        np.nanmax(frac), rel=1e-6
    )


def test_cka_matches_numpy(spark, emb_pd):
    m = np.stack(emb_pd.dropna(subset=["embedding"])["embedding"].values)
    m = np.round(m.astype(float) * 1e6) / 1e6  # the exact-integer scaling
    xc = m[:, :32] - m[:, :32].mean(0)
    yc = m[:, 32:] - m[:, 32:].mean(0)
    n = len(m)
    # the query's cov = (n·Sxy − SxSy)/n² = (X_cᵀY_c)/n per entry
    cov_xy = xc.T @ yc / n
    cov_xx = xc.T @ xc / n
    cov_yy = yc.T @ yc / n
    fxy = (cov_xy**2).sum()
    fxx = (cov_xx**2).sum()
    fyy = (cov_yy**2).sum()
    cka = fxy / math.sqrt(fxx * fyy)
    row = _run(spark, "emb_cka_halves")[0]
    assert row.n == n and row.d == 64
    assert row.cka == pytest.approx(cka, rel=1e-4)
    assert row.hsic_xy == pytest.approx(fxy, rel=1e-4)


def test_label_anova_r2_matches_numpy(spark, emb_pd):
    d = emb_pd.dropna(subset=["embedding", "label"])
    m = np.stack(d["embedding"].values).astype(float)
    m = np.round(m * 1e6) / 1e6
    labs = d["label"].values
    rows = {r.dim: r for r in _run(spark, "emb_label_anova_r2")}
    for dim in (0, 17, 63):
        x = m[:, dim]
        grand = x.mean()
        ssb = sum(
            (x[labs == g]).size * (x[labs == g].mean() - grand) ** 2
            for g in np.unique(labs)
        )
        sst = ((x - grand) ** 2).sum()
        assert rows[dim].eta2 == pytest.approx(ssb / sst, rel=1e-5), dim


def test_theil_decomposition_matches_numpy(spark, docs_pd):
    d = docs_pd.dropna(subset=["source", "n_chars"])
    d = d[d["n_chars"] > 0]
    x = d["n_chars"].values.astype(float)
    mu = x.mean()
    # size-share-weighted Theil T = Σ (x/S) ln(x/μ)
    tt = float((x / x.sum() * np.log(x / mu)).sum())
    tb = 0.0
    tw = 0.0
    s = x.sum()
    for g, sub in d.groupby("source")["n_chars"]:
        xs = sub.values.astype(float)
        mg = xs.mean()
        share = xs.sum() / s
        tb += share * math.log(mg / mu)
        tw += share * float(
            (xs / xs.sum() * np.log(xs / mg)).sum()
        )
    row = _run(spark, "theil_decomposition_tokens")[0]
    assert row.n_docs == len(x)
    assert row.theil_total == pytest.approx(tt, rel=1e-6)
    assert row.theil_within == pytest.approx(tw, rel=1e-6)
    assert row.theil_between == pytest.approx(tb, rel=1e-6)
    assert row.theil_within + row.theil_between == pytest.approx(
        row.theil_total, abs=1e-6
    )


def test_boxcox_grid_matches_numpy(spark, docs_pd):
    d = docs_pd.dropna(subset=["n_chars"])
    x = d[d["n_chars"] > 0]["n_chars"].values.astype(float)
    n = len(x)
    best, lls = None, {}
    for lam in (-1.0, -0.5, 0.0, 0.5, 1.0):
        y = np.log(x) if lam == 0.0 else (x**lam - 1) / lam
        var = y.var()  # MLE variance (ddof=0)
        ll = -(n / 2.0) * math.log(var) + (lam - 1) * np.log(x).sum()
        lls[lam] = ll
    best = max(lls, key=lls.get)
    rows = {r["lambda"]: r for r in _run(spark, "boxcox_grid_doclen")}
    for lam, ll in lls.items():
        assert rows[lam].loglik == pytest.approx(ll, rel=1e-6), lam
        assert rows[lam].is_best == (lam == best)


def test_burrows_delta_symmetric_and_zero_self(spark, docs_pd):
    rows = _run(spark, "text_burrows_delta")
    # 5 langs -> 10 unordered pairs, all deltas strictly positive
    assert len(rows) == 10
    assert all(r.delta > 0 for r in rows)
    assert all(r.lang_a < r.lang_b for r in rows)


def test_hash_sampling_is_lehmer(spark, docs_pd):
    d = docs_pd.dropna(subset=["source"])
    h = (d["doc_id"] % 2147483647) * 48271 % 2147483647 * 48271 % 2147483647
    kept = h < 429496729
    got = {r.source: r for r in _run(spark, "sample_hash_fraction")}
    for src, sub in d.groupby("source"):
        hh = (
            (sub["doc_id"] % 2147483647) * 48271 % 2147483647
        ) * 48271 % 2147483647
        assert got[src].n_kept == int((hh < 429496729).sum())
    total_rate = kept.sum() / len(d)
    # the Lehmer hash is uniform: the global keep rate sits near 20%
    assert abs(total_rate - 0.2) < 0.1
