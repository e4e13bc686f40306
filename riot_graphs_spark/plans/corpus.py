"""Training-corpus selection: the composite pipeline a pretraining data
curation run actually executes — quality scoring + language ID + exact
dedup — composed from the operator library into ONE plan.

Shape: quality stats, language scores, and the fingerprint are all narrow
projections over the same scan; the only shuffle is the fingerprint window
that picks each duplicate group's canonical doc. Filters stay declarative,
so Catalyst pushes the cheap ones (n_chars bounds) into the scan while the
derived ones apply in the same codegen stage — selecting a corpus from
100 TB costs one pass + one hash shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.textstats import fingerprint, predict_lang, quality_score


def select_training_corpus(
    docs: DataFrame,
    lang: str = "en",
    min_quality: float = 0.5,
) -> DataFrame:
    """High-quality, language-matched, deduplicated document selection.

    Keeps docs that (a) score ≥ ``min_quality``, (b) are predicted to be
    ``lang``, and (c) are the canonical (min doc_id) member of their exact
    near-normalized duplicate group.
    """
    scored = quality_score(docs)
    with_lang = predict_lang(scored)
    w = Window.partitionBy("fingerprint")
    with_canon = with_lang.withColumn(
        "fingerprint", fingerprint("text")
    ).withColumn("canonical_id", F.min("doc_id").over(w))
    return (
        with_canon.filter(
            (F.col("quality_score") >= min_quality)
            & (F.col("predicted_lang") == lang)
            & (F.col("doc_id") == F.col("canonical_id"))
        )
        .select("doc_id", "lang", "predicted_lang", "n_tokens", "quality_score")
    )
