"""J4 — generalized backward as-of join (SURVEY §2.3 J4, §4 item 2).

The reference pairs each nightly build with the last merge commit before the
03:00 anchor by iterating ``git log`` newest-first and taking the first hit
(``riot_graphs/rg.py:61-84``). The general operator — "for each left row, the
most recent right row with the same key at or before the left timestamp" —
has no native Spark SQL primitive, so it is implemented as the classic
union + conditional-last-IGNORE-NULLS plan:

1. tag both inputs and union them on (key, ts);
2. one window per key ordered by (ts, side) carries the latest right-side
   payload forward;
3. keep only left rows.

Cost: ONE shuffle on the key (same as the equi-join that any as-of
implementation needs) plus a per-key sort — no range cross-join, no
pointwise subqueries. Skewed keys are handled by AQE skew-join on the
shuffle; for the 100 TB case the inputs should be bucketed by key so the
shuffle vanishes entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] = (),
    suffix: str = "_asof",
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: latest right row with ``right.ts <= left.ts``
    (``< left.ts`` when ``strict``) per key.

    Returns all left columns plus ``{payload}{suffix}`` columns (NULL when no
    right row precedes — total, never drops left rows).
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = list(right_payload) or [
        c for c in right.columns if c not in (*keys, right_ts)
    ]

    # side: right=0 sorts before left=1 at equal ts for inclusive semantics;
    # flipped when strict so a tied right row is NOT visible to the left row.
    right_tagged = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0 if not strict else 1).alias("_side"),
        F.struct(*[F.col(c) for c in payload]).alias("_payload"),
    )
    left_tagged = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1 if not strict else 0).alias("_side"),
        F.lit(None).cast(right_tagged.schema["_payload"].dataType).alias("_payload"),
    )
    unioned = left_tagged.unionByName(
        right_tagged.select(
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in left.columns
                if c not in keys
            ],
            *keys,
            "_ts",
            "_side",
            "_payload",
        )
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "_carried", F.last("_payload", ignorenulls=True).over(w)
    )
    is_left = F.col("_side") == (1 if not strict else 0)
    out_payload = [
        F.col(f"_carried.{c}").alias(f"{c}{suffix}") for c in payload
    ]
    return carried.filter(is_left).select(*left.columns, *out_payload)
