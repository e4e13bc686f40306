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
