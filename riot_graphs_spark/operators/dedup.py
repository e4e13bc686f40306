"""Deduplication operators for large-scale corpus curation (SURVEY §7 step 7):
exact (fingerprint groupBy), MinHash+LSH, SimHash, and n-gram Jaccard.

All four are pure DataFrame compositions — shingling and hashing are Catalyst
array/regex expressions (no UDFs), signatures are partial-aggregable ``min``
aggregates, and candidate generation is an equi-join on band buckets. That
shape is what survives 100 TB: the only shuffles are keyed on (doc, hash-idx)
and on band buckets, both salt-able, and no step is quadratic in the corpus —
pairwise work happens only inside LSH buckets.

Hash portability: shingle/token hashes are the first 14 (or 8) hex chars of
md5 interpreted as an integer — identical in Spark (``conv(.., 16, 10)``)
and DuckDB (``('0x' || ..)::BIGINT``), so every stage is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Modulus for the MinHash permutation family (prime > 2^30 × small a).
MINHASH_P = 1_000_000_007
#: Signature length and LSH banding (4 bands × 4 rows).
MINHASH_K = 16
MINHASH_BAND_ROWS = 4


def words(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit("[a-z0-9]+"), 0)


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a document."""
    w = words(text)
    count = F.size(w) - (n - 1)
    idx = F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(w, i, n), " "))
    )


def hash56(s: Column) -> Column:
    """First 56 bits of md5 as a BIGINT — portable to the SQL oracle."""
    return F.conv(F.substring(F.md5(s), 1, 14), 16, 10).cast("long")


def hash32(s: Column) -> Column:
    """First 32 bits of md5 as a BIGINT (fits any engine's int64)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------
def exact_dedup_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact near-normalized dedup: md5 fingerprint of whitespace-normalized
    lowercase text → per-doc canonical id (min id in group) + group size.
    One hash-keyed shuffle; at 100 TB this is the cheapest first pass and
    removes the bulk of crawl duplication before any fuzzy stage.
    """
    from .textstats import fingerprint

    fp = docs.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
    groups = fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("canonical_id"), F.count("*").alias("group_size")
    )
    return fp.join(groups, on="fingerprint").select(
        id_col, "fingerprint", "canonical_id", "group_size"
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------
def _shingle_hashes(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc, shingle-hash h2) rows, h2 already reduced mod MINHASH_P."""
    return docs.select(
        F.col(id_col),
        F.explode(word_shingles(text_col, n)).alias("shingle"),
    ).select(
        id_col, (hash56(F.col("shingle")) % MINHASH_P).alias("h2")
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = MINHASH_K,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature rows (doc, j, minhash) for j in [0, num_hashes).

    Permutation family ``h_j(x) = ((2j+3)·x + 7919j + 13) mod P`` — small
    coefficients so products stay < 2^63 (no overflow on any engine). The
    ``min`` per (doc, j) is partial-aggregable: map-side combine collapses
    each input split to num_hashes values per doc before the shuffle.
    """
    hs = _shingle_hashes(docs, id_col, text_col, shingle_n)
    js = F.explode(F.array(*[F.lit(j) for j in range(num_hashes)])).alias("j")
    perm = (
        (F.lit(2) * F.col("j") + 3) * F.col("h2")
        + F.lit(7919) * F.col("j")
        + 13
    ) % MINHASH_P
    expanded = hs.select(id_col, "h2", js).select(
        id_col, "j", perm.alias("hv")
    )
    return expanded.groupBy(id_col, "j").agg(F.min("hv").alias("minhash"))


def minhash_band_buckets(
    signatures: DataFrame,
    id_col: str = "doc_id",
    band_rows: int = MINHASH_BAND_ROWS,
) -> DataFrame:
    """LSH banding: (doc, band, band_key) where band_key concatenates the
    band's minhashes in j-order (deterministic via array_sort on (j, mh))."""
    banded = signatures.withColumn(
        "band", F.floor(F.col("j") / F.lit(band_rows)).cast("int")
    )
    key = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "minhash"))),
            lambda x: x["minhash"].cast("string"),
        ),
        "-",
    )
    return banded.groupBy(id_col, "band").agg(key.alias("band_key"))


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = MINHASH_K,
    band_rows: int = MINHASH_BAND_ROWS,
    shingle_n: int = 3,
) -> DataFrame:
    """End-to-end MinHash-LSH candidate pairs (doc_a < doc_b), deduplicated
    across bands. The self-join is keyed on (band, band_key) — work is
    quadratic only within a bucket, the property that makes LSH the scale
    path where all-pairs Jaccard is not.
    """
    buckets = minhash_band_buckets(
        minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n),
        id_col,
        band_rows,
    )
    a = buckets.select(
        F.col("band"), F.col("band_key"), F.col(id_col).alias("doc_a")
    )
    b = buckets.select(
        F.col("band"), F.col("band_key"), F.col(id_col).alias("doc_b")
    )
    return (
        a.join(b, on=["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


# --------------------------------------------------------------------------
# n-gram Jaccard (verification stage / small-corpus exact path)
# --------------------------------------------------------------------------
def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing ≥1 shingle.

    The shingle self-join bounds the pair set to co-occurring docs (inverted
    index semantics), so cost is Σ bucket², not corpus² — still the
    verification stage to run *after* LSH at real scale, here also exposed
    directly for oracle checking. Jaccard itself is per-pair scalar math.
    """
    sh = docs.select(
        F.col(id_col), F.explode(word_shingles(text_col, shingle_n)).alias("s")
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    a = sh.select(F.col(id_col).alias("doc_a"), "s")
    b = sh.select(F.col(id_col).alias("doc_b"), "s")
    inter = (
        a.join(b, on="s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    jac = (
        inter.join(F.broadcast(na), on="doc_a")
        .join(F.broadcast(nb), on="doc_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "jaccard"
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
def simhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """Per-doc SimHash over the token multiset: bit b of the signature is set
    iff Σ_tokens (±1 by token-hash bit b) > 0. Computed relationally —
    (doc × token × bit) rows, two partial-aggregable sums — all JVM-side.
    """
    toks = docs.select(
        F.col(id_col), F.explode(words(text_col)).alias("tok")
    ).select(F.col(id_col), hash32(F.col("tok")).alias("h"))
    bit_lits = F.array(
        *[F.struct(F.lit(b).alias("b"), F.lit(1 << b).alias("pow")) for b in range(bits)]
    )
    per_bit = toks.select(
        id_col, "h", F.explode(bit_lits).alias("bp")
    ).select(
        id_col,
        F.col("bp.b").alias("b"),
        F.col("bp.pow").alias("pow"),
        F.when((F.col("h") / F.col("bp.pow")).cast("long") % 2 == 1, 1)
        .otherwise(-1)
        .alias("sign"),
    )
    # NB (h div pow) via cast after exact integer division-by-power-of-two:
    # pow ≤ 2^31 and h < 2^32 → h/pow exact in double; floor via cast.
    bit_sums = per_bit.groupBy(id_col, "b", "pow").agg(
        F.sum("sign").alias("s")
    )
    return bit_sums.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, F.col("pow").cast("long")).otherwise(0)
        ).alias("simhash")
    )
