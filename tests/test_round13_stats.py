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
