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

from pyspark.sql import DataFrame, Window
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


def km_bands(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    z: float = 1.959963984540054,
) -> DataFrame:
    """Kaplan-Meier curve WITH uncertainty: Greenwood standard error and
    log-log 95% confidence bands — the "is this retention drop real or
    five users of noise" companion :func:`km_survival`'s point estimate
    can't answer.

        G(t)  = Σ_{tᵢ≤t} dᵢ / (nᵢ·(nᵢ−dᵢ))      (Greenwood cumulative)
        se(t) = S(t)·√G(t)                         (Greenwood SE)
        band  = S(t)^exp(± z·√G(t) / ln S(t))      (log-log transform)

    The log-log form keeps both bands inside (0, 1) by construction —
    the plain ``S ± z·se`` Wald band leaks past 1 near the start and
    below 0 in the tail, exactly where retention curves are read.
    Bands are NULL while S = 1 (no events yet — the transform is
    undefined at ln S = 0) and at/after the S = 0 pin.

    Same single-scan plan as :func:`km_survival`: one groupBy to the
    per-duration table, windows over the bounded time axis only.  Every
    transcendental (ln, exp, √) is quantized through decimal(28,12)
    before reuse and the running sums ride exact decimal — the
    cross-engine libm-ulp guard — so curve, SE and bands are
    engine-identical.

    Output per distinct duration: ``(t, n_at_risk, n_events,
    n_censored, survival, se double, ci_lo double, ci_hi double)``.
    """
    from pyspark.sql import Window

    dec = "decimal(28,12)"
    t = F.col(duration_col)
    per_t = df.groupBy(t.alias("t")).agg(
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
        F.sum(
            (F.lit(1) - F.col(event_col).cast("long"))
        ).alias("n_censored"),
        F.count(F.lit(1)).alias("_rows"),
    )
    total = per_t.agg(F.sum("_rows").alias("_total"))
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    nat = F.col("n_at_risk").cast("double")
    d = F.col("n_events").cast("double")
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
                F.log(F.lit(1.0) - d / nat).cast(dec),
            ),
        )
        .withColumn(
            "_g",
            F.when(
                F.col("n_events") < F.col("n_at_risk"),
                (d / (nat * (nat - d))).cast(dec),
            ).otherwise(F.lit(0).cast(dec)),
        )
        .withColumn(
            "_zero",
            F.max(
                (F.col("n_events") == F.col("n_at_risk")).cast("int")
            ).over(w_cum),
        )
        .withColumn("_cum", F.sum("_ln").over(w_cum))
        .withColumn("_cumg", F.sum("_g").over(w_cum))
    )
    lns = F.col("_cum").cast("double")
    surv = (
        F.when(F.col("_zero") == 1, F.lit(0.0))
        .otherwise(F.exp(lns).cast(dec).cast("double"))
    )
    sqrtg = F.sqrt(F.col("_cumg").cast("double")).cast(dec).cast("double")
    live = (F.col("_zero") == 0) & (lns < 0)
    delta = F.when(
        live, (F.lit(z) * sqrtg / -lns).cast(dec).cast("double")
    )
    e_lo = F.exp(delta).cast(dec).cast("double")
    e_hi = F.exp(-delta).cast(dec).cast("double")
    ci_lo = F.exp(e_lo * lns).cast(dec).cast("double")
    ci_hi = F.exp(e_hi * lns).cast(dec).cast("double")
    return staged.select(
        "t",
        "n_at_risk",
        "n_events",
        "n_censored",
        surv.alias("survival"),
        F.round(surv * sqrtg, 9).alias("se"),
        F.round(ci_lo, 9).alias("ci_lo"),
        F.round(ci_hi, 9).alias("ci_hi"),
    )


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    z_crit: float = 1.959963984540054,
) -> DataFrame:
    """Log-rank test between two survival curves — the significance
    verdict :func:`km_survival` can't give: two retention curves that
    LOOK apart need "is the churn hazard actually different between
    the arms", censoring respected (a t-test on durations treats a
    censored user as churned — the classic survival mistake).

    At each distinct event time t with d_t ≥ 1 total events, arm a's
    observed events d_at compare against the hypergeometric
    expectation under equal hazards:

        E_at = d_t·n_at/n_t
        V_t  = d_t·(n_at/n_t)(1−n_at/n_t)(n_t−d_t)/(n_t−1)
        Z    = (Σd_at − ΣE_at) / √(ΣV_t)

    One unit-level (duration, group) reduction; at-risk counts are
    suffix sums on the per-arm TIME axis (distinct durations, never
    unit-sized); per-time E/V terms quantize to decimal(28,12) before
    the sums, so the statistic is engine-identical.  Exactly two arms
    (ascending; arm a is the tested one) — any other count NULLs the
    verdict.  Z < 0 means arm a churns LESS than expected (better
    retention).

    Output: one row — ``(group_a string, group_b string, n_a bigint,
    n_b bigint, events_a bigint, events_b bigint, expected_a double,
    z double, significant boolean)``.
    """
    from pyspark.sql import Window

    keep = (
        F.col(duration_col).isNotNull()
        & F.col(event_col).isNotNull()
        & F.col(group_col).isNotNull()
    )
    base = df.filter(keep).select(
        F.col(group_col).cast("string").alias("_g"),
        F.col(duration_col).cast("long").alias("_t"),
        F.when(F.col(event_col).cast("boolean"), 1)
        .otherwise(0)
        .alias("_e"),
    )
    arms = (
        base.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("_e").alias("_ev"))
        .withColumn("_rk", F.row_number().over(Window.orderBy("_g")))
        .withColumn(
            "_narms", F.count(F.lit(1)).over(Window.partitionBy())
        )
    )
    per_tg = (
        base.join(F.broadcast(arms.select("_g", "_rk")), "_g")
        .groupBy("_t", "_rk")
        .agg(F.sum("_e").alias("_d"), F.count(F.lit(1)).alias("_c"))
    )
    # full (distinct time x arm) grid: an arm with no unit at time t
    # still has an at-risk count there — suffix sums over a sparse
    # per-arm axis would silently drop it from n_t
    grid = (
        per_tg.select("_t")
        .distinct()
        .crossJoin(F.broadcast(arms.select("_rk")))
    )
    per_tg = grid.join(per_tg, ["_t", "_rk"], "left").select(
        "_t",
        "_rk",
        F.coalesce("_d", F.lit(0)).alias("_d"),
        F.coalesce("_c", F.lit(0)).alias("_c"),
    )
    w_before = (
        Window.partitionBy("_rk")
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    w_arm = Window.partitionBy("_rk")
    risky = per_tg.select(
        "_t",
        "_rk",
        "_d",
        (
            F.sum("_c").over(w_arm)
            - F.coalesce(F.sum("_c").over(w_before), F.lit(0))
        ).alias("_nat"),
    )
    per_t = risky.groupBy("_t").agg(
        F.sum(F.when(F.col("_rk") == 1, F.col("_d")).otherwise(0))
        .alias("_d1"),
        F.sum("_d").alias("_dt"),
        F.sum(F.when(F.col("_rk") == 1, F.col("_nat")).otherwise(0))
        .alias("_n1"),
        F.sum("_nat").alias("_nt"),
    ).filter(F.col("_dt") >= 1)
    p1 = F.col("_n1").cast("double") / F.col("_nt").cast("double")
    dt = F.col("_dt").cast("double")
    nt = F.col("_nt").cast("double")
    e1 = (dt * p1).cast("decimal(28,12)")
    v = F.when(
        F.col("_nt") > 1,
        (dt * p1 * (1 - p1) * (nt - dt) / (nt - 1)).cast(
            "decimal(28,12)"
        ),
    ).otherwise(F.lit(0).cast("decimal(28,12)"))
    sums = per_t.agg(
        F.sum("_d1").alias("_o1"),
        F.sum(e1).alias("_e1"),
        F.sum(v).alias("_v"),
    )
    ga = arms.filter(F.col("_rk") == 1).select(
        F.col("_g").alias("group_a"),
        F.col("_n").alias("n_a"),
        F.col("_ev").alias("events_a"),
        "_narms",
    )
    gb = arms.filter(F.col("_rk") == 2).select(
        F.col("_g").alias("group_b"),
        F.col("_n").alias("n_b"),
        F.col("_ev").alias("events_b"),
    )
    out = ga.crossJoin(F.broadcast(gb)).crossJoin(F.broadcast(sums))
    two = F.col("_narms") == 2
    z = F.when(
        two & (F.col("_v").cast("double") > 0),
        (F.col("_o1").cast("double") - F.col("_e1").cast("double"))
        / F.sqrt(F.col("_v").cast("double")),
    )
    return out.select(
        F.when(two, F.col("group_a")).alias("group_a"),
        F.when(two, F.col("group_b")).alias("group_b"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("events_a").cast("long").alias("events_a"),
        F.col("events_b").cast("long").alias("events_b"),
        F.round(
            F.when(two, F.col("_e1").cast("double")), 9
        ).alias("expected_a"),
        F.round(z, 9).alias("z"),
        F.coalesce(
            F.abs(z) > F.lit(z_crit), F.lit(False)
        ).alias("significant"),
    )


def nelson_aalen_hazard(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Nelson–Aalen cumulative hazard over right-censored durations —
    the rate view beside :func:`km_survival`'s probability view: H(t)
    plots the ACCUMULATED churn pressure, its slope is the hazard rate
    (where the curve steepens is when users leave), and log-H vs log-t
    linearity is the standard Weibull-shape diagnostic none of the
    survival probabilities expose directly.

        H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ            (cumulative hazard)
        Var  = Σ_{tᵢ≤t} dᵢ/nᵢ²           (Poisson-type variance)
        S̃(t) = exp(−H(t))                (Fleming–Harrington survival)

    Same single-scan plan as KM: one groupBy to the per-duration table,
    windows over the time axis only.  Per-step increments quantize to
    decimal(28,12) before the running sums (exact, order-independent);
    the one ``exp`` goes through the same decimal cut as KM's — the
    cross-engine libm guard.

    Output per distinct duration: ``(t, n_at_risk bigint, n_events
    bigint, hazard double, cum_hazard double, var_cum_hazard double,
    fh_survival double)``.
    """
    from pyspark.sql import Window

    t = F.col(duration_col)
    per_t = df.groupBy(t.alias("t")).agg(
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
        F.count(F.lit(1)).alias("_rows"),
    )
    total = per_t.agg(F.sum("_rows").alias("_total"))
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    nat = F.col("n_at_risk").cast("double")
    d = F.col("n_events").cast("double")
    staged = (
        per_t.crossJoin(F.broadcast(total))
        .withColumn(
            "n_at_risk",
            F.col("_total")
            - F.coalesce(F.sum("_rows").over(w_prev), F.lit(0)),
        )
        .withColumn("_h", (d / nat).cast("decimal(28,12)"))
        .withColumn("_v", (d / (nat * nat)).cast("decimal(28,12)"))
        .withColumn("_cumh", F.sum("_h").over(w_cum))
        .withColumn("_cumv", F.sum("_v").over(w_cum))
    )
    fh = (
        F.exp(-F.col("_cumh").cast("double"))
        .cast("decimal(28,12)")
        .cast("double")
    )
    return staged.select(
        F.col("t").cast("long").alias("t"),
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.col("n_events").cast("long").alias("n_events"),
        F.round(F.col("_h").cast("double"), 9).alias("hazard"),
        F.round(F.col("_cumh").cast("double"), 9).alias("cum_hazard"),
        F.round(F.col("_cumv").cast("double"), 9).alias(
            "var_cum_hazard"
        ),
        F.round(fh, 9).alias("fh_survival"),
    )


def survival_summary(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    horizon: int | None = None,
) -> DataFrame:
    """Median survival time and RMST — the two SCALARS a
    :func:`km_survival` curve gets asked for in every review: "when has
    half the cohort churned" (median = first t where S(t) ≤ 0.5, NULL
    if the curve never crosses — most users survive the horizon) and
    "how many retained days does a signup buy within H" (RMST = ∫₀ᴴ
    S(t)dt — the area under the curve, robust where the median is
    undefined and the mean is uncomputable under censoring).

    RMST integrates the step function exactly: S is constant between
    event times, so the area is Σ S(tᵢ)·(min(tᵢ₊₁, H) − tᵢ) plus the
    S=1 segment before the first time.  ``horizon`` defaults to the
    largest observed duration.  Composes :func:`km_survival` — the
    windows run on its time-axis output only; the final reduction is
    one row.

    Output: one row — ``(n bigint, n_events bigint, horizon bigint,
    median_survival bigint, rmst double)``.
    """
    from pyspark.sql import Window

    curve = km_survival(df, duration_col, event_col)
    if horizon is None:
        hz = curve.agg(F.max("t").alias("_h"))
    else:
        one = curve.limit(1).select(
            F.lit(int(horizon)).alias("_h")
        )
        hz = one
    w_next = Window.orderBy("t")
    staged = (
        curve.crossJoin(F.broadcast(hz))
        .withColumn("_tnext", F.lead("t", 1).over(w_next))
        .withColumn("_first", F.min("t").over(Window.partitionBy()))
    )
    # segment [t_i, min(t_{i+1}, H)) carries S(t_i); clip to horizon
    seg_end = F.least(
        F.coalesce(F.col("_tnext").cast("double"), F.col("_h").cast("double")),
        F.col("_h").cast("double"),
    )
    seg_len = F.greatest(
        seg_end - F.col("t").cast("double"), F.lit(0.0)
    )
    area = (F.col("survival") * seg_len).cast("decimal(28,12)")
    # the S=1 stretch from 0 to the first event time (clipped)
    head = F.least(
        F.col("_first").cast("double"), F.col("_h").cast("double")
    )
    return staged.agg(
        F.sum(F.col("n_events") + F.col("n_censored"))
        .cast("long")
        .alias("n"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.max("_h").cast("long").alias("horizon"),
        F.min(
            F.when(F.col("survival") <= 0.5, F.col("t"))
        ).cast("long").alias("median_survival"),
        F.round(
            F.max(head)
            + F.coalesce(F.sum(area), F.lit(0).cast("decimal(28,12)"))
            .cast("double"),
            9,
        ).alias("rmst"),
    )


def transition_probs(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """First-order transition probabilities of the behavior chain —
    the (``_f``, ``_t``, ``_p``) table :func:`markov_stationary` and
    :func:`markov_entropy_rate` iterate over: consecutive event-type
    pairs per user reduce to exact integer counts (the one corpus-scale
    stage), one rational p per cell.  Exposed so compositions pay the
    pair reduction ONCE (localCheckpoint at the call site)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak)
    pairs = (
        df.filter(F.col(type_col).isNotNull())
        .select(
            F.col(type_col).alias("_f"),
            F.lead(type_col).over(w).alias("_t"),
        )
        .filter(F.col("_t").isNotNull())
        .groupBy("_f", "_t")
        .agg(F.count(F.lit(1)).alias("_n"))
        # Read by both the row-total agg and the probability join — the
        # barrier keeps the fact-sized lead-window pair reduce at one
        # run (r13-opt).
        .localCheckpoint(eager=False)
    )
    rowtot = pairs.groupBy("_f").agg(F.sum("_n").alias("_tot"))
    return pairs.join(rowtot, "_f").select(
        "_f",
        "_t",
        (
            F.col("_n").cast("double") / F.col("_tot").cast("double")
        ).alias("_p"),
    )


def markov_stationary(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
    iterations: int = 25,
    transitions: DataFrame | None = None,
) -> DataFrame:
    """Stationary distribution of the first-order behavior Markov chain
    — "where does a user's session END UP spending its time" — the
    long-run summary :func:`event_transitions`' one-step shares can't
    give (a state can be a rare destination of every step yet dominate
    the stationary mass through self-loops).

    The transition matrix estimates from consecutive event-type pairs
    per user (the :func:`event_transitions` reduction, exact integer
    counts → one rational p_ij per cell); the stationary vector runs
    *iterations* synchronous power steps v ← vᵀP **inside the engine**
    as chained k-row joins — no driver-side linear algebra, no collect.
    Every step quantizes each product to 9 dp and sums in decimal, so
    the whole trajectory is engine-identical (the DuckDB oracle unrolls
    the same 25 steps as chained CTEs and matches bit-for-bit).  States
    are the observed FROM-types (a sink-only type would absorb leaked
    mass invisibly; none exists in practice and the docstring is the
    contract).

    k-row × k-row joins × 25: the plan is deep but microscopic; the one
    corpus-scale operation is the pair reduction.  Output: one row per
    state — ``(event_type string, stationary_prob double)``.
    """
    if transitions is not None:
        # caller-shared (_f, _t, _p) table (one corpus pair-reduction
        # serves both the stationary vector and e.g. the entropy terms)
        p = transitions
    else:
        p = transition_probs(
            df, user_col=user_col, ts_col=ts_col,
            type_col=type_col, tiebreak=tiebreak,
        ).localCheckpoint()
    # The iteration state is k values (k = observed event types — bounded
    # and corpus-scale-free), so the 25 synchronous power steps run as
    # ARRAY expressions over ONE row instead of 25 chained k-row
    # join+agg+join stages (r13-opt: the join form paid ~50 tiny Spark
    # stages of pure scheduling/planning overhead per query; the one
    # corpus-scale stage — the pair reduction — is unchanged).  The
    # arithmetic is bit-identical: per step and target state, each term
    # quantizes to round(v_f · p_ft, 9)::decimal(28,9) and the terms sum
    # in exact decimal(38,9) (order-free), exactly what the k-row
    # join+``F.sum`` produced; a state drops out of the map exactly when
    # the old groupBy produced no row for it (no incoming mass).
    dec9 = "decimal(28,9)"
    # Accumulator stays at (28,9), NOT (38,9): adding two decimals whose
    # combined integral digits would need precision 39 trips Spark's
    # allowPrecisionLoss scale reduction (result decimal(38,8) — the 9th
    # decimal digit silently truncates).  (28,9)+(28,9) → (29,9) exact,
    # cast back to (28,9) exact for |v| ≤ 1 — bit-identical to the old
    # F.sum over decimal(28,9) for these magnitudes.
    acc9 = "decimal(28,9)"
    one = p.agg(
        F.array_sort(F.collect_set("_f")).alias("_states"),
        F.collect_list(F.struct("_f", "_t", "_p")).alias("_cells"),
    ).select(
        "_states",
        # per-state incoming cell lists (targets outside the FROM-state
        # set are dropped, as the old states join did)
        F.transform(
            "_states",
            lambda s: F.filter("_cells", lambda c: c["_t"] == s),
        ).alias("_inc"),
    )
    # The whole 25-step trajectory runs as ONE ArrayAggregate fold over
    # sequence(1, iterations): the accumulator is a materialized VALUE
    # between steps (never an inlined expression), so there is no
    # CollapseProject tree blowup and no per-step re-evaluation — one
    # projection, one task.  Absent-state bookkeeping: the old k-row
    # groupBy emitted NO row for a state with no incoming mass, and the
    # absence propagates; here values carry absent-as-exact-zero (an
    # absent source state provably holds exact decimal 0, so its terms
    # are round(0·p, 9) = 0 and the decimal sums are unchanged) while a
    # parallel boolean mask map tracks row existence for the final
    # filter.
    v0 = F.map_from_arrays(
        "_states",
        F.transform(
            "_states",
            lambda _s: F.round(
                F.lit(1.0) / F.size("_states").cast("double"), 9
            ).cast(dec9).cast(acc9),
        ),
    )
    m0 = F.map_from_arrays(
        "_states", F.transform("_states", lambda _s: F.lit(True))
    )
    zero = F.struct(v0.alias("v"), m0.alias("m"))

    def _step(acc, _i):
        vals = F.transform(
            "_inc",
            lambda cs: F.aggregate(
                cs,
                F.lit(0).cast(acc9),
                lambda a, c: (
                    a
                    + F.round(
                        F.element_at(acc["v"], c["_f"]).cast("double")
                        * c["_p"],
                        9,
                    ).cast(dec9)
                ).cast(acc9),
            ),
        )
        masks = F.transform(
            "_inc",
            lambda cs: F.aggregate(
                cs,
                F.lit(False),
                lambda a, c: a | F.element_at(acc["m"], c["_f"]),
            ),
        )
        return F.struct(
            F.map_from_arrays("_states", vals).alias("v"),
            F.map_from_arrays("_states", masks).alias("m"),
        )

    final = (
        F.aggregate(
            F.sequence(F.lit(1), F.lit(iterations)),
            zero,
            _step,
            lambda acc: F.map_filter(
                acc["v"], lambda s, _vv: F.element_at(acc["m"], s)
            ),
        )
        if iterations >= 1
        else F.map_filter(v0, lambda _s, _vv: F.lit(True))
    )
    return one.select(
        F.explode(final).alias("event_type", "_val")
    ).select(
        "event_type",
        F.round(F.col("_val").cast("double"), 9).alias("stationary_prob"),
    )


def attribution_time_decay(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    convert_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    half_life_days: float = 3.0,
    window_days: int = 7,
) -> DataFrame:
    """Time-decay multi-touch attribution — the honest middle between
    :func:`~..plans.driver_queries.attribution_last_touch` (100% to the
    final touch) and linear (everything equal): each touch inside the
    lookback window before a user's FIRST conversion earns
    exp-decayed credit with the given half-life, normalized per
    conversion so every conversion distributes exactly 1.0.

        w = 0.5^(Δdays / half_life),   credit = w / Σ_touches w

    Δ comes from exact epoch-second integers; weights round to 9 dp
    before the per-conversion normalization and the per-type decimal
    sums, so credits are engine-identical.  Two user-keyed reductions
    + one broadcast-joined window filter — no fact×fact blowup (the
    conversion table is users-sized).

    Output: one row per touch type — ``(event_type string, conversions
    bigint, touches bigint, credit double)``.
    """
    conv = (
        df.filter(F.col(type_col) == convert_type)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_cts"))
    )
    touches = df.filter(F.col(type_col).isin(*touch_types)).select(
        user_col, F.col(type_col).alias("_ty"), F.col(ts_col).alias("_ts")
    )
    joined = touches.join(conv, user_col).filter(
        (F.col("_ts") < F.col("_cts"))
        & (
            F.unix_timestamp("_cts") - F.unix_timestamp("_ts")
            <= window_days * 86400
        )
    )
    ddays = (
        F.unix_timestamp("_cts") - F.unix_timestamp("_ts")
    ).cast("double") / F.lit(86400.0)
    w = F.round(
        F.pow(F.lit(0.5), ddays / F.lit(float(half_life_days))), 9
    )
    wsum = Window.partitionBy(user_col)
    credited = joined.select(
        user_col, "_ty", w.alias("_w")
    ).withColumn(
        "_share",
        F.round(
            F.col("_w")
            / F.sum(F.col("_w").cast("decimal(28,9)"))
            .over(wsum)
            .cast("double"),
            9,
        ),
    )
    agg = credited.groupBy("_ty").agg(
        F.count_distinct(F.col(user_col)).alias("conversions"),
        F.count(F.lit(1)).alias("touches"),
        F.sum(F.col("_share").cast("decimal(28,9)")).alias("_credit"),
    )
    return agg.select(
        F.col("_ty").alias("event_type"),
        F.col("conversions").cast("long").alias("conversions"),
        F.col("touches").cast("long").alias("touches"),
        F.round(F.col("_credit").cast("double"), 9).alias("credit"),
    )


def markov_entropy_rate(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
    iterations: int = 25,
) -> DataFrame:
    """Entropy rate of the behavior Markov chain — "how predictable is
    the NEXT event given the current one", the single-number sequel to
    :func:`markov_stationary`: H = −Σ_s π_s Σ_t p_st·ln p_st weights
    each state's next-step uncertainty by its long-run occupancy, so a
    rarely-visited chaotic state can't dominate the readout.

    π comes from :func:`markov_stationary` (25 decimal-carried power
    steps — engine-identical); the per-edge terms π_s·p_st·ln(p_st)
    are 9-dp-quantized into a decimal sum over the k² transition cells
    (k = event types — tiny).  Perplexity = e^H is the "effective
    branching factor" reading.

    Output: one row — ``(n_states bigint, entropy_nats double,
    entropy_bits double, perplexity double)``.
    """
    p = transition_probs(
        df, user_col=user_col, ts_col=ts_col,
        type_col=type_col, tiebreak=tiebreak,
    ).localCheckpoint()
    pi = markov_stationary(
        df,
        user_col=user_col,
        ts_col=ts_col,
        type_col=type_col,
        tiebreak=tiebreak,
        iterations=iterations,
        transitions=p,
    )
    terms = p.join(
        F.broadcast(pi), p["_f"] == pi["event_type"]
    ).select(
        F.round(
            F.col("stationary_prob") * F.col("_p") * F.log("_p"), 9
        )
        .cast("decimal(28,9)")
        .alias("_h")
    )
    agg = terms.crossJoin(
        F.broadcast(pi.agg(F.count(F.lit(1)).alias("_k")))
    ).groupBy().agg(
        F.max("_k").alias("_k"),
        F.sum("_h").alias("_s"),
    )
    h = -F.col("_s").cast("double")
    return agg.select(
        F.col("_k").cast("long").alias("n_states"),
        F.round(h, 9).alias("entropy_nats"),
        F.round(h / F.lit(0.6931471805599453), 9).alias("entropy_bits"),
        F.round(F.exp(h), 9).alias("perplexity"),
    )


def event_pmi_pairs(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Pointwise mutual information between event-type pairs
    co-occurring within the same (user, day) unit — "which behaviors
    actually travel together" beyond raw co-occurrence counts (PMI
    discounts the popular types that co-occur with everything):

        PMI(x,y) = ln( P(x,y) / (P(x)·P(y)) ),
        NPMI = PMI / −ln P(x,y)   ∈ [−1, 1]

    with probabilities = unit-presence counts / N units.  Presence
    sets reduce fact-sized; the pair fan-out is per-unit k²/2 (k =
    event types, tiny).  Exact integer counts; one IEEE ln per pair.

    Output: one row per unordered pair — ``(type_a, type_b, n_both
    bigint, n_a bigint, n_b bigint, pmi double, npmi double)``.
    """
    units = (
        df.filter(
            F.col(user_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(type_col).isNotNull()
        )
        .select(
            F.col(user_col).alias("_u"),
            F.to_date(ts_col).alias("_d"),
            F.col(type_col).alias("_ty"),
        )
        .distinct()
    )
    units = units.localCheckpoint(eager=False)
    n_units = units.select("_u", "_d").distinct().agg(
        F.count(F.lit(1)).alias("_nu")
    )
    singles = units.groupBy("_ty").agg(F.count(F.lit(1)).alias("_nx"))
    a = units.select("_u", "_d", F.col("_ty").alias("_ta"))
    b = units.select("_u", "_d", F.col("_ty").alias("_tb"))
    both = (
        a.join(b, ["_u", "_d"])
        .filter(F.col("_ta") < F.col("_tb"))
        .groupBy("_ta", "_tb")
        .agg(F.count(F.lit(1)).alias("_nb"))
    )
    j = (
        both.join(
            F.broadcast(singles.select(F.col("_ty"), F.col("_nx"))),
            both["_ta"] == F.col("_ty"),
        )
        .drop("_ty")
        .withColumnRenamed("_nx", "_na")
        .join(
            F.broadcast(
                singles.select(F.col("_ty"), F.col("_nx").alias("_nyy"))
            ),
            both["_tb"] == F.col("_ty"),
        )
        .drop("_ty")
        .crossJoin(F.broadcast(n_units))
    )
    pxy = F.col("_nb").cast("double") / F.col("_nu").cast("double")
    px = F.col("_na").cast("double") / F.col("_nu").cast("double")
    py = F.col("_nyy").cast("double") / F.col("_nu").cast("double")
    pmi = F.log(pxy / (px * py))
    npmi = F.try_divide(pmi, -F.log(pxy))
    return j.select(
        F.col("_ta").alias("type_a"),
        F.col("_tb").alias("type_b"),
        F.col("_nb").cast("long").alias("n_both"),
        F.col("_na").cast("long").alias("n_a"),
        F.col("_nyy").cast("long").alias("n_b"),
        F.round(pmi, 9).alias("pmi"),
        F.round(npmi, 9).alias("npmi"),
    )


def exponential_hazard_ratio(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    group_col: str = "group",
    z: float = 1.959963984540054,
) -> DataFrame:
    """Hazard ratio between two arms under the exponential (constant-
    hazard) model — the one-number effect size :func:`logrank_test`'s
    significance verdict doesn't give: each arm's hazard is the MLE
    events/person-time, and

        HR = (d₁/T₁) / (d₀/T₀),   se(ln HR) = √(1/d₁ + 1/d₀)
        CI = exp(ln HR ± z·se)

    — the standard epidemiology readout, valid whenever the KM curves
    look roughly exponential (pair with :func:`nelson_aalen_hazard`'s
    log-H-vs-log-t diagnostic).  Censoring is handled exactly as the
    likelihood says: censored units contribute person-time but no
    event.

    One scan reduces per-arm exact integer (events, person-time) sums
    (``decimal(38,0)``); ln/exp quantize through decimal(28,12) (the
    libm guard).  Exactly two arms (ascending by name; arm b is the
    numerator/tested arm); any other count NULLs the verdict.  Zero
    events in either arm NULLs HR via ``try_divide``.

    Output: one row — ``(group_a string, group_b string, events_a
    bigint, time_a bigint, events_b bigint, time_b bigint, rate_a
    double, rate_b double, hr double, hr_lo double, hr_hi double)``.
    """
    from pyspark.sql import Window

    dec = "decimal(28,12)"
    keep = (
        F.col(duration_col).isNotNull()
        & F.col(event_col).isNotNull()
        & F.col(group_col).isNotNull()
    )
    arms = (
        df.filter(keep)
        .groupBy(F.col(group_col).cast("string").alias("_g"))
        .agg(
            F.sum(F.col(event_col).cast("long")).alias("_d"),
            F.sum(F.col(duration_col).cast("long")).alias("_t"),
        )
        .withColumn("_rk", F.row_number().over(Window.orderBy("_g")))
        .withColumn("_narms", F.count(F.lit(1)).over(Window.partitionBy()))
    )
    a = arms.filter(F.col("_rk") == 1).select(
        F.col("_g").alias("group_a"),
        F.col("_d").alias("_da"),
        F.col("_t").alias("_ta"),
        "_narms",
    )
    b = arms.filter(F.col("_rk") == 2).select(
        F.col("_g").alias("group_b"),
        F.col("_d").alias("_db"),
        F.col("_t").alias("_tb"),
    )
    out = a.crossJoin(F.broadcast(b))
    two = F.col("_narms") == 2
    ra = F.try_divide(
        F.col("_da").cast("double"), F.col("_ta").cast("double")
    )
    rb = F.try_divide(
        F.col("_db").cast("double"), F.col("_tb").cast("double")
    )
    hr = F.when(two, F.try_divide(rb, ra))
    lnhr = F.log(hr).cast(dec).cast("double")
    se = F.when(
        (F.col("_da") > 0) & (F.col("_db") > 0),
        F.sqrt(
            F.lit(1.0) / F.col("_da").cast("double")
            + F.lit(1.0) / F.col("_db").cast("double")
        ),
    ).cast(dec).cast("double")
    lo = F.exp(lnhr - F.lit(float(z)) * se).cast(dec).cast("double")
    hi = F.exp(lnhr + F.lit(float(z)) * se).cast(dec).cast("double")
    return out.select(
        F.when(two, F.col("group_a")).alias("group_a"),
        F.when(two, F.col("group_b")).alias("group_b"),
        F.col("_da").cast("long").alias("events_a"),
        F.col("_ta").cast("long").alias("time_a"),
        F.col("_db").cast("long").alias("events_b"),
        F.col("_tb").cast("long").alias("time_b"),
        F.round(ra, 9).alias("rate_a"),
        F.round(rb, 9).alias("rate_b"),
        F.round(hr, 9).alias("hr"),
        F.round(lo, 9).alias("hr_lo"),
        F.round(hi, 9).alias("hr_hi"),
    )
