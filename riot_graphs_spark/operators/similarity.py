"""Similarity search over embedding columns (SURVEY §7 step 7).

Two paths:

- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small) query
  set against the corpus, score with pure Catalyst array expressions
  (:mod:`..functions.vectors`), cut with a per-query window. The correctness
  baseline, and the right plan whenever |queries| is broadcastable — at
  100 TB the corpus side streams through executors once, no shuffle of the
  corpus at all; only the (queries × k) result shuffles.
- :func:`lsh_bucketed_topk` — sign-random-projection LSH: bucket vectors by
  the sign pattern of a fixed dimension subset, search only within the
  query's bucket. Trades recall for a corpus-side equi-join — the scale path
  when the query set itself is huge.

Scores are rounded to 6 decimals *before* ranking so the top-k cut is
deterministic across engines and runs (ties broken by vec_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot, l2_norm

#: Cosine from a precomputed-norm pair: one zip_with+fold per pair instead of
#: three (norms are per-*vector*, so they are computed once per side before
#: the join, not once per pair — at |corpus|×|queries| pairs that is the
#: dominant cost).
def _pair_score() -> F.Column:
    return F.round(
        dot(F.col("_cvec"), F.col("_qvec")) / (F.col("_cnorm") * F.col("_qnorm")), 6
    )


def _scored(corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("_cvec"),
        l2_norm(vec_col).alias("_cnorm"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        l2_norm(vec_col).alias("_qnorm"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col("query_id")
    )
    return pairs.withColumn("score", _pair_score())


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k per query vector.

    Output: (query_id, neighbor_id, score) — k rows per query.
    """
    scored = _scored(corpus, queries, id_col, vec_col)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            "score",
            "rank",
        )
    )


def sign_bucket(vec_col: str, dims: int = 8) -> F.Column:
    """Sign-projection bucket key: bit b set iff vec[b] >= 0, over the first
    ``dims`` dimensions. A fixed axis-aligned projection — deterministic and
    oracle-portable (a production variant would use random hyperplanes from a
    broadcast seed matrix; the plan shape is identical)."""
    c = F.col(vec_col)
    bucket = F.lit(0)
    for b in range(dims):
        bucket = bucket + F.when(
            F.element_at(c, b + 1) >= 0, F.lit(1 << b)
        ).otherwise(F.lit(0))
    return bucket.cast("long")


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_dims: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket.

    The corpus⋈queries join becomes an equi-join on the bucket key —
    shuffle-partitioned (or bucketed-table co-located) instead of an
    all-pairs product. Recall < 1 by construction; raise ``bucket_dims``
    ↓bucket size ↑precision, or probe neighboring buckets for recall.
    """
    cb = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("_cvec"),
        l2_norm(vec_col).alias("_cnorm"),
        sign_bucket(vec_col, bucket_dims).alias("_bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        l2_norm(vec_col).alias("_qnorm"),
        sign_bucket(vec_col, bucket_dims).alias("_bucket"),
    )
    pairs = cb.join(qb, on="_bucket").filter(F.col(id_col) != F.col("query_id"))
    scored = pairs.withColumn("score", _pair_score())
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "score", "rank")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    block_col: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_dims: int = 8,
    allow_all_pairs: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, score ≥ threshold).

    The self-join is always BLOCKED: pairwise work is quadratic only within
    a block, never across the corpus. By default the block key is derived
    from the data itself — the :func:`sign_bucket` sign-projection of the
    vector (``bucket_dims`` bits) — so the operator needs no external
    grouping column and the join is an equi-join Spark shuffle-partitions
    (or bucket-co-locates) on the key. Recall < 1 by construction: a
    near-dup pair straddling a sign boundary is missed; lower
    ``bucket_dims`` for recall, raise it for smaller blocks.

    ``block_col`` overrides the key with a caller-supplied column (e.g. an
    IVF cell id, or a fixture label in tests). The unblocked cartesian path
    is a deliberate scale-killer and only runs with an explicit
    ``allow_all_pairs=True`` (small corpora / recall measurement).
    """
    if allow_all_pairs:
        block = None
    elif block_col is not None:
        block = F.col(block_col)
    else:
        block = sign_bucket(vec_col, bucket_dims)
    a = embeddings.select(
        *([] if block is None else [block.alias("_block")]),
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("_cvec"),
        l2_norm(vec_col).alias("_cnorm"),
    )
    b = embeddings.select(
        *([] if block is None else [block.alias("_block")]),
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("_qvec"),
        l2_norm(vec_col).alias("_qnorm"),
    )
    pairs = (
        a.crossJoin(b) if block is None else a.join(b, on="_block")
    ).filter(F.col("vec_a") < F.col("vec_b"))
    scored = pairs.withColumn("score", _pair_score())
    return scored.filter(F.col("score") >= threshold).select(
        "vec_a", "vec_b", "score"
    )


def label_centroids(
    embeddings: DataFrame,
    cell_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cell centroid, relational form (cell, pos, centroid).

    ``posexplode`` + groupBy(cell, pos): fully partial-aggregable — each
    input split pre-sums to (cells × dims) rows before the shuffle, so the
    shuffle is tiny no matter the corpus size. Components are rounded to 6
    decimals and summed in DECIMAL so the mean is exact and order-independent
    (FP sums would hash differently run to run).
    """
    per_dim = embeddings.select(
        F.col(cell_col), F.posexplode(vec_col).alias("pos0", "x")
    ).select(
        cell_col,
        (F.col("pos0") + 1).alias("pos"),  # 1-based, matches SQL subscripts
        F.round(F.col("x").cast("double"), 6).cast("decimal(18,6)").alias("x"),
    )
    # The decimal SUM is exact/order-free; convert to double *before* the
    # divide so both engines do one IEEE division (decimal division rounds
    # at engine-specific scales and would hash-mismatch).
    return per_dim.groupBy(cell_col, "pos").agg(
        (F.sum("x").cast("double") / F.count("*")).alias("centroid")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: route each query to its nearest cell centroid, then
    search only that cell's members — the classic inverted-file index as a
    DataFrame plan.

    Scale shape: centroids are (cells × dims) — always broadcastable; the
    probe is a broadcast join of queries onto a *cell-pruned* slice of the
    corpus (on a cell-partitioned/bucketed table the non-probed cells are
    never read). Recall < 1 with 1 probe; probe the top-p cells for more.
    Routing scores round to 6 decimals before the argmax (tiebreak: cell
    asc) so the route — and therefore the result set — is deterministic.
    """
    cents = label_centroids(corpus, cell_col, vec_col)
    cent_vecs = cents.groupBy(cell_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "centroid"))),
            lambda s: s["centroid"],
        ).alias("_cent")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        l2_norm(vec_col).alias("_qnorm"),
    )
    routed = (
        q.crossJoin(F.broadcast(cent_vecs))
        .withColumn(
            "_route_score",
            F.round(
                dot(F.col("_qvec"), F.col("_cent"))
                / (F.col("_qnorm") * l2_norm(F.col("_cent"))),
                6,
            ),
        )
        .groupBy("query_id", "_qvec", "_qnorm")
        .agg(
            F.min_by(
                F.col(cell_col), F.struct((-F.col("_route_score")).alias("s"), F.col(cell_col))
            ).alias(cell_col)
        )
    )
    cb = corpus.select(
        F.col(cell_col),
        F.col(id_col),
        F.col(vec_col).alias("_cvec"),
        l2_norm(vec_col).alias("_cnorm"),
    )
    pairs = cb.join(F.broadcast(routed), on=cell_col).filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = pairs.withColumn("score", _pair_score())
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "score", "rank")
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector int8 scalar quantization — the memory side of ANN at
    scale: a float32 embedding store shrinks 4× (codes + 2 floats of
    per-vector range), which is what lets a 100 TB corpus' vectors stay
    resident for bucketed search; distance math then runs on dequantized
    codes with bounded error ≤ half a step.

    Per vector (row-local): ``code_i = floor((x_i − min)·254/(max − min)
    + 0.5) − 127`` ∈ [−127, 127]; constant vectors map to code 0. All
    arithmetic is double on exact inputs (no cross-row accumulation), so
    codes are engine-stable. Output is relational —
    ``(id, i: int, code: int, vmin: double, vmax: double)`` with 1-based
    ``i`` — one row per dimension via ``posexplode``; ZERO shuffles.
    """
    mn = F.array_min(vec_col).cast("double")
    mx = F.array_max(vec_col).cast("double")
    base = df.select(
        F.col(id_col),
        F.col(vec_col),
        mn.alias("vmin"),
        mx.alias("vmax"),
        F.posexplode(vec_col).alias("i0", "_x"),
    )
    x = F.col("_x").cast("double")
    code = F.when(F.col("vmax") == F.col("vmin"), F.lit(0)).otherwise(
        (
            F.floor(
                (x - F.col("vmin"))
                * F.lit(254.0)
                / (F.col("vmax") - F.col("vmin"))
                + F.lit(0.5)
            )
            - F.lit(127)
        ).cast("int")
    )
    return base.select(
        id_col,
        (F.col("i0") + 1).cast("int").alias("i"),
        code.alias("code"),
        "vmin",
        "vmax",
    )
