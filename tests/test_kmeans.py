"""K-means trainer tests (operators/similarity.kmeans_fit/kmeans_assign):
recovers well-separated clusters, deterministic across runs, ties break to
the lower cell id, and the trained cells drive ivf_topk."""

from __future__ import annotations

from riot_graphs_spark.operators.similarity import (
    ivf_topk,
    kmeans_assign,
    kmeans_fit,
)


def _blobs(spark):
    # three tight, well-separated, directionally-distinct blobs in 4-D
    # (no blob at the origin: ivf_topk routes by cosine, undefined for a
    # zero-norm centroid)
    pts = []
    centers = {0: [10.0, 0.0, 0.0, 1.0], 1: [0.0, 10.0, 0.0, 1.0], 2: [0.0, 0.0, 10.0, 1.0]}
    vid = 0
    for b, c in centers.items():
        for dx in (-0.5, 0.0, 0.5):
            for dy in (-0.5, 0.5):
                pts.append((vid, [c[0] + dx, c[1] + dy, c[2] + dx, c[3] + dy], b))
                vid += 1
    return (
        spark.createDataFrame(
            pts, "vec_id long, embedding array<float>, blob int"
        ),
        centers,
    )


def test_kmeans_recovers_separated_blobs_and_is_deterministic(spark):
    df, centers = _blobs(spark)
    c1 = kmeans_fit(df, k=3, max_iter=10)
    c2 = kmeans_fit(df, k=3, max_iter=10)
    assert c1 == c2  # hash-seeded init + exact argmin → reproducible

    assigned = {
        r.vec_id: r.cell for r in kmeans_assign(df, c1).collect()
    }
    # same-blob points must share a cell; different blobs must not
    rows = df.select("vec_id", "blob").collect()
    blob_of = {r.vec_id: r.blob for r in rows}
    cells_by_blob = {}
    for vid, cell in assigned.items():
        cells_by_blob.setdefault(blob_of[vid], set()).add(cell)
    assert all(len(cells) == 1 for cells in cells_by_blob.values())
    assert len({c for s in cells_by_blob.values() for c in s}) == 3
    # each converged centroid sits on a blob mean (tight blobs, mean≈center)
    for cells in cells_by_blob.values():
        (cell,) = cells
        blob = [b for b, s in cells_by_blob.items() if s == {cell}][0]
        assert all(
            abs(a - b) < 1.0 for a, b in zip(c1[cell], centers[blob])
        )


def test_kmeans_assign_tie_breaks_to_lower_cell(spark):
    df = spark.createDataFrame(
        [(1, [5.0, 0.0])], "vec_id long, embedding array<float>"
    )
    # equidistant from both centroids → cell 0 wins
    out = kmeans_assign(df, [[0.0, 0.0], [10.0, 0.0]]).collect()[0]
    assert out.cell == 0 and abs(out.dist2 - 25.0) < 1e-9


def test_kmeans_cells_drive_ivf_topk(spark):
    from pyspark.sql import functions as F

    from riot_graphs_spark.operators.similarity import _nearest_cell

    df, _ = _blobs(spark)
    cents = kmeans_fit(df, k=3, max_iter=10)
    best = _nearest_cell("embedding", cents)
    corpus = df.withColumn("cell", best["cell"])
    queries = corpus.filter(F.col("vec_id").isin(0, 6, 12))
    out = ivf_topk(corpus, queries, k=2, cell_col="cell")
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    blob_of = {r.vec_id: r.blob for r in df.select("vec_id", "blob").collect()}
    # neighbors come from the query's own blob (cell-pruned search)
    for q, nbrs in got.items():
        assert len(nbrs) == 2
        assert all(blob_of[n] == blob_of[q] for n in nbrs)


def test_pairwise_similarity_hist_hand_case(spark):
    import pytest

    from riot_graphs_spark.operators.similarity import (
        pairwise_similarity_hist,
    )

    # keep_mod=1 keeps everything: 4 vectors, 6 pairs with known cosines
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),   # cos(1,2) = 1
            (3, [0.0, 1.0]),   # cos(1,3) = cos(2,3) = 0
            (4, [-1.0, 0.0]),  # cos(1,4) = cos(2,4) = -1; cos(3,4) = 0
        ],
        "vec_id bigint, embedding array<double>",
    )
    rows = {
        r["bin"]: r
        for r in pairwise_similarity_hist(emb, keep_mod=1, nbins=20)
        .collect()
    }
    # cos=-1 -> bin 0 (clamped); cos=0 -> floor(1/0.1)=10; cos=1 -> 19
    assert rows[0]["n"] == 2 and rows[0]["lo"] == -1.0
    assert rows[10]["n"] == 3
    assert rows[19]["n"] == 1
    assert sum(r["n"] for r in rows.values()) == 6
    assert sum(r["share"] for r in rows.values()) == pytest.approx(1.0)
    with pytest.raises(ValueError):
        pairwise_similarity_hist(emb, nbins=0)


def test_embedding_dim_stats_hand_case(spark):
    import pytest

    from riot_graphs_spark.operators.similarity import embedding_dim_stats

    emb = spark.createDataFrame(
        [
            (1, [1.0, 5.0, 0.0]),
            (2, [3.0, 5.0, 0.0]),
            (3, [5.0, 5.0, 0.0]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    rows = {r["dim"]: r for r in embedding_dim_stats(emb).collect()}
    # dim 0: mean 3, var ((1-3)^2+(0)+(2)^2)/3 = 8/3
    assert rows[0]["mean"] == 3.0
    assert rows[0]["std"] == pytest.approx((8 / 3) ** 0.5, abs=1e-9)
    assert (rows[0]["min_x"], rows[0]["max_x"]) == (1.0, 5.0)
    # dim 1: constant -> std exactly 0 (collapsed-dim signal)
    assert rows[1]["mean"] == 5.0 and rows[1]["std"] == 0.0
    # dim 2: all-zero
    assert rows[2]["mean"] == 0.0 and rows[2]["std"] == 0.0
    assert all(r["n"] == 3 for r in rows.values())


def test_silhouette_simplified_hand_cases(spark):
    import pytest as _pytest

    from riot_graphs_spark.operators.similarity import (
        silhouette_simplified,
    )

    cents = [[0.0, 0.0], [10.0, 0.0]]
    rows = [
        # tight around c0: a=1, b=9 or 11 -> s=(b-1)/b
        (1, [1.0, 0.0]),
        (2, [-1.0, 0.0]),
        # exactly on c1: a=0, b=10 -> s=1
        (3, [10.0, 0.0]),
        # midpoint-ish, nearer c1's side: a=4, b=6 -> s=1/3 (cell 1)
        (4, [6.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    got = {
        r["cell"]: r
        for r in silhouette_simplified(df, cents).collect()
    }
    s1 = (9 - 1) / 9.0
    s2 = (11 - 1) / 11.0
    assert got[0]["n"] == 2
    assert got[0]["mean_silhouette"] == _pytest.approx((s1 + s2) / 2)
    assert got[1]["n"] == 2
    assert got[1]["mean_silhouette"] == _pytest.approx(
        (1.0 + (6 - 4) / 6.0) / 2
    )

    # a vector equidistant from identical centroids: a=b=0 -> s=0
    same = silhouette_simplified(
        spark.createDataFrame(
            [(1, [0.0, 0.0])], "vec_id int, embedding array<double>"
        ),
        [[0.0, 0.0], [0.0, 0.0]],
    ).collect()[0]
    assert same["mean_silhouette"] == 0.0

    with _pytest.raises(ValueError):
        silhouette_simplified(df, [[0.0, 0.0]])


def test_davies_bouldin_hand_cases(spark):
    import pytest as _pytest

    from riot_graphs_spark.operators.similarity import davies_bouldin

    cents = [[0.0, 0.0], [10.0, 0.0]]
    rows = [
        (1, [1.0, 0.0]),
        (2, [-1.0, 0.0]),
        (3, [10.0, 0.0]),
        (4, [12.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    got = {r["cell"]: r for r in davies_bouldin(df, cents).collect()}
    # scatters both 1, centroid distance 10 -> R = 0.2 each side
    assert got[0]["n"] == 2 and got[0]["scatter"] == _pytest.approx(1.0)
    assert got[1]["scatter"] == _pytest.approx(1.0)
    assert got[0]["r"] == _pytest.approx(0.2)
    assert got[1]["r"] == _pytest.approx(0.2)

    # three centroids: the worst NEIGHBOUR drives R — cell 0 vs the
    # near cell (d=2) dominates vs the far one (d=10)
    cents3 = [[0.0, 0.0], [2.0, 0.0], [10.0, 0.0]]
    rows3 = [
        (1, [0.5, 0.0]),   # cell 0, scatter .5
        (2, [2.0, 0.0]),   # cell 1, scatter 0
        (3, [10.0, 0.0]),  # cell 2, scatter 0
    ]
    df3 = spark.createDataFrame(
        rows3, "vec_id int, embedding array<double>"
    )
    got3 = {r["cell"]: r for r in davies_bouldin(df3, cents3).collect()}
    assert got3[0]["r"] == _pytest.approx((0.5 + 0.0) / 2.0)
    # cell 2's worst neighbour: (0+0)/8 vs (0+.5)/10 -> 0.05
    assert got3[2]["r"] == _pytest.approx(0.05)

    with _pytest.raises(ValueError):
        davies_bouldin(df, [[0.0, 0.0]])
    with _pytest.raises(ValueError):
        davies_bouldin(df, [[1.0, 0.0], [1.0, 0.0]])


def test_calinski_harabasz_hand_cases(spark):
    import pytest as _pytest

    from riot_graphs_spark.operators.similarity import calinski_harabasz

    cents = [[1.0, 0.0], [11.0, 0.0]]
    rows = [
        (1, [0.0, 0.0]), (2, [2.0, 0.0]),
        (3, [10.0, 0.0]), (4, [12.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    got = calinski_harabasz(df, cents).collect()[0]
    # cell means (1,0)/(11,0), global mean (6,0):
    # SSW = 4, SSB = 100, CH = (100/1)/(4/2) = 50
    assert (got["n"], got["k_cells"]) == (4, 2)
    assert got["ss_within"] == _pytest.approx(4.0)
    assert got["ss_between"] == _pytest.approx(100.0)
    assert got["ch"] == _pytest.approx(50.0)

    # all vectors identical: SSW = 0 -> NULL CH (not a divide crash)
    same = calinski_harabasz(
        spark.createDataFrame(
            [(i, [1.0, 0.0]) for i in range(4)],
            "vec_id int, embedding array<double>",
        ),
        cents,
    ).collect()[0]
    assert same["ch"] is None

    with _pytest.raises(ValueError):
        calinski_harabasz(df, [[0.0, 0.0]])


def test_clustering_label_agreement_hand_cases(spark):
    import pytest as _pytest

    from riot_graphs_spark.operators.similarity import (
        clustering_label_agreement,
    )

    cents = [[0.0, 0.0], [10.0, 0.0]]

    def run(rows):
        df = spark.createDataFrame(
            rows, "vec_id int, embedding array<double>, label string"
        )
        return clustering_label_agreement(df, cents).collect()[0]

    # cells exactly reproduce the labels: purity 1, ARI 1
    perfect = run(
        [
            (1, [0.0, 0.0], "a"),
            (2, [0.1, 0.0], "a"),
            (3, [10.0, 0.0], "b"),
            (4, [10.1, 0.0], "b"),
        ]
    )
    assert (perfect["k_cells"], perfect["k_labels"]) == (2, 2)
    assert perfect["purity"] == 1.0 and perfect["ari"] == 1.0

    # labels split evenly across cells: purity .5, ARI = -0.5 exactly
    # (worse than chance for this table)
    anti = run(
        [
            (1, [0.0, 0.0], "a"),
            (2, [0.1, 0.0], "b"),
            (3, [10.0, 0.0], "a"),
            (4, [10.1, 0.0], "b"),
        ]
    )
    assert anti["purity"] == 0.5
    assert anti["ari"] == _pytest.approx(-0.5)

    # one cell + one label: agreement is all chance -> NULL ARI
    degen = run(
        [(1, [0.0, 0.0], "a"), (2, [0.1, 0.0], "a")]
    )
    assert degen["ari"] is None and degen["purity"] == 1.0


def test_ivf_multiprobe_recall_monotone_and_exhaustive_at_all_cells(spark):
    """probes=2 on 3 blobs must widen (never shrink) the candidate set, and
    probes >= n_cells must reproduce exact brute force (cosine_topk)."""
    from pyspark.sql import functions as F

    from riot_graphs_spark.operators.similarity import cosine_topk

    df, _ = _blobs(spark)
    corpus = df.withColumnRenamed("blob", "cell")
    queries = corpus.filter(F.col("vec_id").isin(0, 6, 12))

    def topk(probes):
        return {
            (r.query_id, r.neighbor_id, r.rank)
            for r in ivf_topk(
                corpus, queries, k=4, cell_col="cell", probes=probes
            ).collect()
        }

    brute = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in cosine_topk(corpus, queries, k=4).collect()
    }
    p1, p2, p3 = topk(1), topk(2), topk(3)
    # probes == n_cells degenerates to exact brute force, rank-for-rank
    assert p3 == brute
    # recall is monotone in probes (vs the brute truth, per query)
    def hits(s):
        return len({(q, n) for q, n, _ in s} & {(q, n) for q, n, _ in brute})
    assert hits(p1) <= hits(p2) <= hits(p3)
    # k=4 from a 6-member single cell: p1 already returns 4 rows per query
    assert len(p1) == 12 and len(p2) == 12


def test_ivf_multiprobe_route_stays_broadcast(spark):
    """Plan pin (r11): the multi-probe routing frame must still ride into
    the corpus join as a BROADCAST — probes must not turn the cell join
    into a shuffle join, or the 100 TB scan-pruning story dies."""
    from pyspark.sql import functions as F

    df, _ = _blobs(spark)
    corpus = df.withColumnRenamed("blob", "cell")
    queries = corpus.filter(F.col("vec_id").isin(0, 6))
    plan = ivf_topk(
        corpus, queries, k=2, cell_col="cell", probes=2
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
