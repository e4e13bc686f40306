"""Custom stateful streaming operator: continuous size-regression detection
(G5's lag-delta as a stream, reference ``rg.py``'s whole product purpose)
via ``applyInPandasWithState``.

Why a custom operator: ``lag()`` windows need the whole series; a stream
only ever holds the new tail. The state store keeps exactly one value per
(test, board) series — the last seen size — so each micro-batch emits
deltas against history it never re-reads. State is O(#series), not
O(#events): the operator scales with tag cardinality, not stream length.

The batch path (:func:`..operators.timeseries.delta_vs_prev`) and this
operator emit identical rows for identical input order — asserted in
``tests/test_stateful.py``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DELTA_OUTPUT = StructType(
    [
        StructField("test", StringType()),
        StructField("board", StringType()),
        StructField("ts", TimestampType()),
        StructField("text", LongType()),
        StructField("delta", LongType()),
    ]
)

#: One value per series: the last observed size.
DELTA_STATE = StructType([StructField("last_text", LongType())])


def _emit_deltas(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (last_text,) = state.get if state.exists else (None,)
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        prev = pdf["text"].shift(1)
        if last_text is not None:
            prev.iloc[0] = last_text
        out = pd.DataFrame(
            {
                "test": pdf["test"],
                "board": pdf["board"],
                "ts": pdf["ts"],
                "text": pdf["text"],
                "delta": pdf["text"] - prev,
            }
        )
        # nullable Int64 so the first-ever row keeps a NULL delta
        out["delta"] = out["delta"].astype("Int64")
        if len(pdf):
            last_text = int(pdf["text"].iloc[-1])
        yield out
    if last_text is not None:
        state.update((last_text,))


def stream_size_deltas(builds: DataFrame) -> DataFrame:
    """Continuous per-(test, board) size deltas over a streaming frame.

    Each emitted row carries the change vs the previous build of the same
    series, including across micro-batch (and restart) boundaries — the
    state store holds the carry-over, checkpointed with the query.
    """
    return builds.groupBy("test", "board").applyInPandasWithState(
        _emit_deltas,
        outputStructType=DELTA_OUTPUT,
        stateStructType=DELTA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HH_OUTPUT = StructType(
    [
        StructField("bucket", LongType()),
        StructField("token", StringType()),
        StructField("min_count", LongType()),
        StructField("batch_id", LongType()),
    ]
)

#: Misra-Gries summary per hash bucket: parallel token/count arrays.
from pyspark.sql.types import ArrayType  # noqa: E402

HH_STATE = StructType(
    [
        StructField("tokens", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n_batches", LongType()),
    ]
)


def _misra_gries_update(
    summary: dict[str, int], tokens, k: int
) -> dict[str, int]:
    """Classic Misra-Gries: keep ≤ k counters; a full summary decrements
    every counter instead of admitting a new token. Guarantee: any token
    with true frequency > N/(k+1) in the bucket's stream survives, and each
    kept count understates the true count by ≤ N/(k+1)."""
    for t in tokens:
        if t in summary:
            summary[t] += 1
        elif len(summary) < k:
            summary[t] = 1
        else:
            for key in list(summary):
                summary[key] -= 1
                if summary[key] == 0:
                    del summary[key]
    return summary


def make_heavy_hitter_fn(k: int):
    def emit(key, pdfs, state: GroupState):
        if state.exists:
            toks, counts, n_batches = state.get
            summary = dict(zip(toks, counts))
        else:
            summary, n_batches = {}, 0
        for pdf in pdfs:
            summary = _misra_gries_update(summary, pdf["token"].tolist(), k)
        n_batches += 1
        state.update(
            (list(summary), [int(c) for c in summary.values()], n_batches)
        )
        yield pd.DataFrame(
            {
                "bucket": [key[0]] * len(summary),
                "token": list(summary),
                "min_count": [int(c) for c in summary.values()],
                "batch_id": [n_batches] * len(summary),
            }
        )

    return emit


def stream_heavy_hitters(
    token_stream: DataFrame, k: int = 20, n_buckets: int = 64
) -> DataFrame:
    """Continuous heavy-hitter (trending-token) tracking with BOUNDED state:
    tokens hash into ``n_buckets`` groups, each holding a ``k``-counter
    Misra-Gries summary — total state is exactly ``n_buckets × k`` counters
    no matter how many distinct tokens the stream ever carries (a windowed
    count would grow state with vocabulary size; this cannot).

    Per-bucket guarantee (Misra-Gries): any token whose frequency within
    its bucket exceeds ``N_bucket/(k+1)`` is present in the summary, with
    its count understated by at most ``N_bucket/(k+1)``. Buckets shard the
    vocabulary, so global heavy hitters are heavy in their own bucket and
    survive. Read the current top-K by unioning bucket summaries and
    sorting by ``min_count`` — a ``n_buckets × k``-row query-side step.

    Append-mode output: each batch APPENDS a fresh summary snapshot for the
    buckets it touched, tagged with ``batch_id`` — readers take the max
    batch_id per bucket (state rows, not raw events; snapshots also give a
    free trending-over-time history)."""
    from pyspark.sql import functions as F

    bucketed = token_stream.withColumn(
        "bucket", F.pmod(F.xxhash64("token"), F.lit(n_buckets))
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        make_heavy_hitter_fn(k),
        outputStructType=HH_OUTPUT,
        stateStructType=HH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
