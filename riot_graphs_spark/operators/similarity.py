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

from ..functions.vectors import cosine_similarity


def _scored(corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    pairs = corpus.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col("query_id")
    )
    return pairs.withColumn(
        "score", F.round(cosine_similarity(vec_col, "_qvec"), 6)
    )


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
    cb = corpus.withColumn("_bucket", sign_bucket(vec_col, bucket_dims))
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        sign_bucket(vec_col, bucket_dims).alias("_bucket"),
    )
    pairs = cb.join(qb, on="_bucket").filter(F.col(id_col) != F.col("query_id"))
    scored = pairs.withColumn(
        "score", F.round(cosine_similarity(vec_col, "_qvec"), 6)
    )
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
    block_col: str | None = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, score ≥ threshold).

    ``block_col`` keys the self-join (blocking): pairwise work is quadratic
    only within a block — the same containment trick as LSH buckets. Pass
    ``None`` for exact all-pairs (small corpora only).
    """
    a = embeddings.select(
        *( [F.col(block_col)] if block_col else [] ),
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("_va"),
    )
    b = embeddings.select(
        *( [F.col(block_col)] if block_col else [] ),
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("_vb"),
    )
    pairs = (
        a.join(b, on=block_col) if block_col else a.crossJoin(b)
    ).filter(F.col("vec_a") < F.col("vec_b"))
    scored = pairs.withColumn(
        "score", F.round(cosine_similarity("_va", "_vb"), 6)
    )
    return scored.filter(F.col("score") >= threshold).select(
        "vec_a", "vec_b", "score"
    )
