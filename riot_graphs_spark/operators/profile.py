"""Data profiling: per-column summary statistics in ONE aggregation pass —
the pipeline health check run before/after every large curation stage
(row counts, null rates, cardinalities, value ranges).

Shape: all columns' aggregates go into a single ``agg`` (one scan, one
partial-aggregable reduce to ONE row), then ``stack`` unpivots driver-side
expression-wise — no second scan, no per-column jobs. ``summary()``/
``describe()`` exist but are not oracle-checkable nor schema-stable; this
is, and it handles exact distinct counts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One row per profiled column: non-null count, null count, exact
    distinct count, min/max (as strings — uniform output schema).

    Keep doubles out of ``cols`` when oracle parity matters: float→string
    formatting differs across engines.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(F.col(c))).alias(f"{c}__n_null"),
            F.count_distinct(F.col(c)).alias(f"{c}__n_distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__n_null, {c}__n_distinct, {c}__min, {c}__max"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n, n_null, n_distinct, min_value, max_value)"
        )
    )
