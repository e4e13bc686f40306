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


def _tagged_union(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    right_side: int,
) -> DataFrame:
    """Shared as-of plumbing: tag and union both inputs on (key, _ts, _side).

    ``right_side`` decides whether a right row at the same timestamp sorts
    before (0) or after (1) the left row — i.e. whether it is visible to a
    window frame anchored at the left row in each direction.
    """
    right_tagged = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(right_side).alias("_side"),
        F.struct(*[F.col(c) for c in payload]).alias("_payload"),
    )
    left_tagged = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1 - right_side).alias("_side"),
        F.lit(None).cast(right_tagged.schema["_payload"].dataType).alias("_payload"),
    )
    return left_tagged.unionByName(
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


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] = (),
    suffix: str = "_asof",
    strict: bool = False,
    right_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Forward as-of join: EARLIEST right row with ``right.ts >= left.ts``
    (``>`` when strict) per key — the mirror of :func:`asof_join`, same
    one-shuffle union + window plan with the frame flipped to
    ``(current row, unbounded following)``.

    ``right_tiebreak``: right-side columns ordering ties at equal ``_ts``
    (pick the smallest) so the result is deterministic when multiple right
    rows share a timestamp.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = list(right_payload) or [
        c for c in right.columns if c not in (*keys, right_ts)
    ]
    tb = list(right_tiebreak)
    # inclusive: right sorts AFTER left at equal ts (visible from the
    # forward frame); strict: right sorts BEFORE left (invisible).
    unioned = _tagged_union(
        left, right, keys, left_ts, right_ts, payload, 1 if not strict else 0
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("_ts"),
            F.col("_side"),
            *[F.col("_payload")[c].asc_nulls_last() for c in tb],
        )
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = unioned.withColumn(
        "_carried", F.first("_payload", ignorenulls=True).over(w)
    )
    is_left = F.col("_side") == (0 if not strict else 1)
    out_payload = [
        F.col(f"_carried.{c}").alias(f"{c}{suffix}") for c in payload
    ]
    return carried.filter(is_left).select(*left.columns, *out_payload)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] = (),
    suffix: str = "_asof",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Nearest as-of join: the right row (same key) whose timestamp is
    CLOSEST to the left row's, in either direction; ties go to the backward
    (earlier) candidate. ``tolerance_seconds`` nulls out matches farther
    than the tolerance (pandas ``merge_asof(direction="nearest")``
    semantics).

    Both directional candidates come from two mirrored window passes over
    ONE union and ONE shuffle — an equal-ts right row is captured by the
    backward pass with distance 0, so the forward frame not seeing it is
    irrelevant.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = list(right_payload) or [
        c for c in right.columns if c not in (*keys, right_ts)
    ]
    unioned = _tagged_union(left, right, keys, left_ts, right_ts, payload, 0)
    order = [F.col("_ts"), F.col("_side")]
    wb = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs = F.when(F.col("_side") == 0, F.struct(F.col("_ts"), F.col("_payload")))
    sec = lambda c: c.cast("timestamp").cast("double")  # noqa: E731  NTZ-safe
    carried = (
        unioned.withColumn("_b", F.last(obs, ignorenulls=True).over(wb))
        .withColumn("_f", F.first(obs, ignorenulls=True).over(wf))
        .filter(F.col("_side") == 1)
    )
    d_b = sec(F.col("_ts")) - sec(F.col("_b._ts"))
    d_f = sec(F.col("_f._ts")) - sec(F.col("_ts"))
    tol = F.lit(tolerance_seconds) if tolerance_seconds is not None else None
    b_ok = F.col("_b").isNotNull() & ((d_b <= tol) if tol is not None else F.lit(True))
    f_ok = F.col("_f").isNotNull() & ((d_f <= tol) if tol is not None else F.lit(True))
    chosen = (
        F.when(b_ok & (~f_ok | (d_b <= d_f)), F.col("_b._payload"))
        .when(f_ok, F.col("_f._payload"))
    )
    picked = carried.withColumn("_chosen", chosen)
    out_payload = [
        F.col(f"_chosen.{c}").alias(f"{c}{suffix}") for c in payload
    ]
    return picked.select(*left.columns, *out_payload)


def asof_join_interpolated(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value: str = "value",
    out: str = "interp_value",
) -> DataFrame:
    """Interpolated series alignment: for each left row, linearly
    interpolate the right series' ``value`` at the left timestamp from the
    bracketing right points — ``pandas.merge_asof`` + interpolate, the
    standard way to align two sensors sampled on different clocks before
    any arithmetic between them.

    Composition of the backward and forward as-of joins (each the
    one-shuffle union+window plan — two shuffles total on the key), then a
    row-local blend: ``pv + (nv − pv)·(lt − pt)/(nt − pt)`` on exact
    epoch-micros; timestamps at/outside the right series' edge take the
    single bracketing value (NULL when the key has no right rows at all).
    Right should be unique per (key, ts) — pre-aggregate ties — so both
    brackets are well-defined.

    Output: all left columns + ``{right_ts}_prev/_next`` + ``out``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    b = asof_join(
        left, right, keys, left_ts, right_ts,
        right_payload=[right_ts, value], suffix="_prev",
    )
    f = asof_join_forward(
        b, right, keys, left_ts, right_ts,
        right_payload=[right_ts, value], suffix="_next",
    )
    pt, pv = F.col(f"{right_ts}_prev"), F.col(f"{value}_prev")
    nt, nv = F.col(f"{right_ts}_next"), F.col(f"{value}_next")
    lt = F.col(left_ts)
    frac = (
        (F.unix_micros(lt) - F.unix_micros(pt)).cast("double")
        / (F.unix_micros(nt) - F.unix_micros(pt)).cast("double")
    )
    interp = (
        F.when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .when(F.unix_micros(nt) == F.unix_micros(pt), pv)
        .otherwise(pv + (nv - pv) * frac)
    )
    return f.withColumn(out, interp).drop(f"{value}_prev", f"{value}_next")
