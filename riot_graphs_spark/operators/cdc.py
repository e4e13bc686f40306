"""Change-data-capture compaction: fold an append-only change log into the
current table state.

The reference's sink relies on InfluxDB's (measurement, tags, time) point
overwrite for idempotent re-ingestion (SURVEY §2.6 O2, `rg.py:106-117` +
`README.md:22-23`); this module is the general form of that upsert surface —
a keyed change log with inserts/updates/deletes, compacted to
last-writer-wins state. It is also the batch half of a streaming CDC apply:
`foreachBatch(lambda b, _: apply_changelog(b, ...))` over a Debezium-style
feed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changelog(
    df: DataFrame,
    keys: Sequence[str],
    seq: Sequence[str],
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """Last-writer-wins compaction: for each key, keep the change row with
    the highest ``seq`` (a total order — pass a tiebreak column after the
    timestamp to make it one); if that winning row's ``op_col`` equals
    ``delete_op``, the key is a tombstone and is dropped entirely.

    Returns the surviving rows with the original column set.

    Scale posture: ONE partial-aggregable shuffle — ``max_by(struct(*), seq)``
    per key, so executors pre-reduce each key to a single candidate row
    map-side before exchanging (a rank-then-filter window would sort whole
    partitions and keep every change row in shuffle memory; this keeps one
    row per key per mapper). Constant state per key regardless of how many
    times the key changed.
    """
    cols = df.columns
    order_key = F.struct(*[F.col(c) for c in seq])
    row = F.struct(*[F.col(c) for c in cols])
    return (
        df.groupBy(*[F.col(k) for k in keys])
        .agg(F.max_by(row, order_key).alias("_last"))
        .where(F.col(f"_last.{op_col}") != F.lit(delete_op))
        .select(*[F.col(f"_last.{c}").alias(c) for c in cols])
    )
