"""User-journey analytics over an event stream: ordered funnels and cohort
retention. The reference delegates all interactive analytics to
InfluxDB/Grafana (`/root/reference/README.md:25`); funnels/retention are the
event-log analogue of that delegated dashboard surface for the `events`
table (ts, user_id, event_type).

Scale posture: the funnel is ONE shuffle — events are pre-filtered to the
funnel's step types (predicate reaches the scan), hash-partitioned by user,
and each user's (small) step history is folded with an array expression
inside codegen. No self-joins, no per-step passes: a k-step funnel costs the
same single shuffle as a 2-step one. This is the windowFunnel-style
sequential scan, distributed on the user key; the only memory assumption is
that ONE user's step-typed events fit in an array (the same assumption every
sessionization engine makes). Retention is two hash-aggregations co-keyed on
user plus one join that AQE may broadcast when the cohort map is small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    df: DataFrame,
    steps: Sequence[str],
    user: str = "user_id",
    ts: str = "ts",
    step_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel user counts: row ``k`` = number of users who performed
    ``steps[0] .. steps[k-1]`` in that order, each step STRICTLY after the
    previous one (first-touch semantics: step k's timestamp is the earliest
    occurrence after step k-1's chosen timestamp).

    Returns ``(step_idx: long, step: string, users: long)``, one row per
    funnel step.

    Plan shape: filter to the step types (pushed to the scan) → single
    hash-shuffle on ``user`` → ``sort_array(collect_list(...))`` +
    ``aggregate`` fold per user → global conditional-count aggregation.
    """
    n = len(steps)
    if n == 0:
        raise ValueError("funnel needs at least one step")
    steps_arr = F.array(*[F.lit(s) for s in steps])

    relevant = df.filter(F.col(step_col).isin(list(steps))).select(
        F.col(user).alias("u"),
        F.col(ts).alias("t"),
        F.col(step_col).alias("s"),
    )
    history = relevant.groupBy("u").agg(
        F.sort_array(F.collect_list(F.struct("t", "s"))).alias("h")
    )
    # Fold the time-sorted history into the array of reached-step timestamps:
    # an event advances the funnel iff it is the next expected step AND lies
    # strictly after the previous step's chosen time (matches the SQL
    # `min(ts) WHERE ts > prev` formulation exactly, ties included).
    reached = F.aggregate(
        "h",
        F.expr("CAST(array() AS array<timestamp>)"),
        lambda acc, e: F.when(
            (F.size(acc) < F.lit(n))
            & (e["s"] == F.element_at(steps_arr, F.size(acc) + F.lit(1)))
            & ((F.size(acc) == 0) | (e["t"] > F.element_at(acc, -1))),
            F.concat(acc, F.array(e["t"])),
        ).otherwise(acc),
    )
    depths = history.select(F.size(reached).alias("depth"))
    wide = depths.agg(
        *[
            F.sum((F.col("depth") >= k).cast("long")).alias(f"_s{k}")
            for k in range(1, n + 1)
        ]
    )
    stack = ", ".join(
        f"CAST({k} AS BIGINT), '{steps[k - 1]}', _s{k}" for k in range(1, n + 1)
    )
    return wide.select(
        F.expr(f"stack({n}, {stack}) AS (step_idx, step, users)")
    )


def retention_cohorts(
    df: DataFrame,
    cohort_step: str,
    user: str = "user_id",
    ts: str = "ts",
    step_col: str = "event_type",
) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the ISO week of their
    FIRST ``cohort_step`` event; a cohort member is active in week-offset
    ``w`` if they have ANY event in the week ``w`` weeks after their cohort
    week. Activity before the cohort week is dropped (classic retention
    triangle).

    Returns ``(cohort_week: timestamp, week_offset: long,
    active_users: long)`` — the week stays a timestamp (Monday 00:00) so the
    output type matches the event-time columns everywhere else.
    """
    cohort = (
        df.filter(F.col(step_col) == cohort_step)
        .groupBy(F.col(user).alias("u"))
        .agg(F.date_trunc("week", F.min(ts)).alias("cohort_week"))
    )
    activity = df.select(
        F.col(user).alias("u"), F.date_trunc("week", F.col(ts)).alias("activity_week")
    ).distinct()
    joined = activity.join(cohort, "u").filter(
        F.col("activity_week") >= F.col("cohort_week")
    )
    # Both sides are week-truncated, so the day difference is an exact
    # multiple of 7 and the double division is exact.
    return (
        joined.groupBy(
            "cohort_week",
            (F.datediff("activity_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """First-order behavior graph: counts of consecutive (event → next
    event) transitions within each user's timeline, with each source
    event's share of outgoing transitions — the Markov edge list behind
    "what do users do after signup" product questions (the funnel's
    free-form complement: funnels check a FIXED path, this surfaces the
    paths that exist).

    One per-user window (lead on the time-ordered stream; ``tiebreak``
    totalizes equal timestamps) + one partial-aggregable pair count; the
    share divides exact counts per source type — |types|² output rows.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak)
    pairs = (
        events.withColumn("next_type", F.lead(type_col).over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col(type_col).alias("from_type"), "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_src = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        F.col("next_type").alias("to_type"),
        "n",
        (F.col("n") / F.sum("n").over(w_src)).alias("share_of_source"),
    )


def km_survival(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Kaplan-Meier survival curve over right-censored durations — the
    classic user-retention estimator: how long do users stay active,
    counting still-active users as censored (not churned) instead of
    silently biasing the curve down the way a naive lifetime histogram
    does.  Input: one row per subject with ``duration_col`` (integer
    time units) and ``event_col`` (1 = observed churn, 0 = censored).

    ``S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)`` computed as
    ``exp(Σ ln(1 − dᵢ/nᵢ))`` with both the per-step ``ln`` and the final
    ``exp`` quantized through ``decimal(28,12)`` — the cross-engine
    libm-ulp guard (see collocations_pmi) — and the running sum carried
    in exact decimal.  A step where everyone at risk churns
    (``d = n``) pins the curve to 0.0 from there on (ln(0) guard).

    Plan: one groupBy to the per-duration table (≤ distinct durations
    rows — the time axis, bounded and tiny), then windows over THAT
    table only; the subject table is scanned once.  Output per distinct
    duration: ``(t, n_at_risk, n_events, n_censored, survival)``.
    """
    t = F.col(duration_col)
    per_t = df.groupBy(t.alias("t")).agg(
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
        F.sum(
            (F.lit(1) - F.col(event_col).cast("long"))
        ).alias("n_censored"),
        F.count(F.lit(1)).alias("_rows"),
    )
    total = per_t.agg(F.sum("_rows").alias("_total"))
    from pyspark.sql import Window

    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    staged = (
        per_t.crossJoin(F.broadcast(total))
        .withColumn(
            "n_at_risk",
            F.col("_total")
            - F.coalesce(F.sum("_rows").over(w_prev), F.lit(0)),
        )
        .withColumn(
            "_ln",
            F.when(
                F.col("n_events") < F.col("n_at_risk"),
                F.log(
                    F.lit(1.0)
                    - F.col("n_events") / F.col("n_at_risk")
                ).cast("decimal(28,12)"),
            ),
        )
        .withColumn(
            "_zero",
            F.max(
                (F.col("n_events") == F.col("n_at_risk")).cast("int")
            ).over(w_cum),
        )
        .withColumn("_cum", F.sum("_ln").over(w_cum))
    )
    survival = (
        F.when(F.col("_zero") == 1, F.lit(0.0))
        .otherwise(
            F.exp(F.col("_cum").cast("double"))
            .cast("decimal(28,12)")
            .cast("double")
        )
    )
    return staged.select(
        "t",
        "n_at_risk",
        "n_events",
        "n_censored",
        survival.alias("survival"),
    )
