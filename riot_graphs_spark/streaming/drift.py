"""Per-ingest drift monitoring: PSI of every arriving micro-batch against a
recorded baseline snapshot, appended to a monitor table.

The operational loop the reference's nightly cron implies (each ingest run
should answer "does today's data look like the corpus I calibrated on?",
``/root/reference/rg.py:269-285`` nightly deltas) composed from the batch
drift operators:

1. calibrate ONCE: :func:`record_baseline` computes the baseline's fixed
   equi-depth bin edges (``profile.equi_depth_edges`` — equal mass per bin
   maximizes PSI sensitivity) and its bin counts, and stores both;
2. monitor FOREVER: :func:`drift_monitor_writer` wraps a ``foreachBatch``
   sink that bins each micro-batch and scores its counts against the
   stored baseline (``profile.psi_from_counts``), appending one row per
   (batch, group) to the monitor table — the dashboard reads that table,
   never the raw stream.

Scale: the baseline table is (groups × bins) rows — broadcast-sized
forever; each batch pays one count aggregate over ITSELF (O(batch)), and
the monitor table grows one row per group per batch.  Alert thresholds are
the standard PSI bands (0.1 drifting / 0.25 shifted).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def record_baseline(
    baseline: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    nbuckets: int,
    group_cols: Sequence[str] = (),
    recorded_at: str | None = None,
) -> DataFrame:
    """The calibration artifact: per (group, bin) counts of the baseline
    snapshot under the FIXED clamp bins — write this table beside the bin
    spec; every later batch is scored against it without re-reading the
    baseline.  (Derive ``lo``/``hi``/``nbuckets`` from
    ``profile.equi_depth_edges`` output when choosing bins, or pass known
    physical bounds.)

    Pass ``recorded_at`` (an ISO timestamp string — explicit, never
    implicit wall-clock, so re-runs are reproducible) to stamp the
    artifact with WHEN it was calibrated: a baseline recorded before an
    upstream shift silently degrades into scoring drift against drift,
    and the stamp is what lets the monitor flag its own staleness
    (:func:`drift_monitor_writer` ``max_age_sec``).

    Output: ``(*group_cols, bin int, n bigint[, recorded_at timestamp])``.
    """
    if nbuckets < 1 or not hi > lo:
        raise ValueError("need nbuckets >= 1 and hi > lo")
    width = (hi - lo) / nbuckets
    x = F.col(value_col)
    keep = x.isNotNull()
    for g in group_cols:
        keep = keep & F.col(g).isNotNull()
    b = F.greatest(
        F.lit(0),
        F.least(F.lit(nbuckets - 1), F.floor((x - F.lit(lo)) / F.lit(width))),
    ).cast("int")
    out = (
        baseline.filter(keep)
        .groupBy(*group_cols, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if recorded_at is not None:
        out = out.withColumn(
            "recorded_at", F.lit(recorded_at).cast("timestamp")
        )
    return out


def record_baseline_cdf(
    baseline: DataFrame,
    value_col: str,
    nbins: int,
    group_cols: Sequence[str] = (),
    recorded_at: str | None = None,
) -> DataFrame:
    """The KS calibration artifact: the baseline's empirical CDF sampled
    at its own equi-depth edges — per (group, edge value), the EXACT
    cumulative count at that edge plus the group total.  PSI's bin-count
    artifact (:func:`record_baseline`) can't feed KS: KS needs the VALUE
    axis, and fixed-width bins quantize it; the equi-depth edges keep the
    CDF error bounded by 1/nbins everywhere mass actually sits.

    Edges are the first distinct values to reach each new 1/nbins CDF
    level (≤ nbins rows per group, fewer under heavy ties; the max value
    is always recorded, so both CDFs end at exactly 1).  Scoring a batch
    against this step-restricted CDF (:func:`drift_monitor_writer`)
    yields a D within 1/nbins of the full two-sample D — the standard
    quantile-sketch bound; size ``nbins`` to the alarm resolution needed.

    Plan: one (group, value) count groupBy (the only corpus-sized
    shuffle) + cumulative/lag windows over the distinct-value axis.
    NULL values / group keys excluded.

    ``recorded_at`` (ISO timestamp string, explicit — see
    :func:`record_baseline`) stamps the artifact with its calibration
    time for the monitor's staleness flag.

    Output: ``(*group_cols, _v <value type>, cum bigint, n bigint
    [, recorded_at timestamp])``.
    """
    if nbins < 1:
        raise ValueError("need nbins >= 1")
    gcols = list(group_cols)
    keep = F.col(value_col).isNotNull()
    for g in gcols:
        keep = keep & F.col(g).isNotNull()
    counts = (
        baseline.filter(keep)
        .groupBy(*gcols, F.col(value_col).alias("_v"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    w_cum = (
        Window.partitionBy(*gcols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    w_lag = Window.partitionBy(*gcols).orderBy("_v")
    c = (
        counts.withColumn("_cum", F.sum("_n").over(w_cum))
        .withColumn("_tot", F.sum("_n").over(w_tot))
    )
    lvl = F.floor(
        F.lit(nbins) * F.col("_cum") / F.col("_tot").cast("double")
    )
    c = c.withColumn("_lvl", lvl).withColumn(
        "_prev", F.coalesce(F.lag("_lvl").over(w_lag), F.lit(0))
    )
    out = c.filter(F.col("_lvl") > F.col("_prev")).select(
        *gcols,
        "_v",
        F.col("_cum").alias("cum"),
        F.col("_tot").alias("n"),
    )
    if recorded_at is not None:
        out = out.withColumn(
            "recorded_at", F.lit(recorded_at).cast("timestamp")
        )
    return out


def ks_against_baseline_cdf(
    baseline_cdf: DataFrame,
    batch_df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Score a batch's values against a stored :func:`record_baseline_cdf`
    artifact: reconstruct the baseline as per-edge count INCREMENTS
    (cum − lag(cum) — exact integers, never re-inflated rows), outer-join
    the batch's per-value counts on the value axis, and run
    ``profile.ks_from_counts``.  Cost: O(edges + batch-distinct) join
    rows per group.  Output: ``(*group_cols, n_a, n_b, ks_d)`` —
    ``n_a`` = baseline rows, ``n_b`` = batch rows; a group absent from
    the baseline gets NULL ``ks_d`` (no CDF to compare).
    """
    from ..operators.profile import ks_from_counts

    gcols = list(group_cols)
    w_lag = Window.partitionBy(*gcols).orderBy("_v")
    base = baseline_cdf.select(
        *gcols,
        "_v",
        (
            F.col("cum") - F.coalesce(F.lag("cum").over(w_lag), F.lit(0))
        ).alias("_na"),
    )
    keep = F.col(value_col).isNotNull()
    for g in gcols:
        keep = keep & F.col(g).isNotNull()
    batch = (
        batch_df.filter(keep)
        .groupBy(*gcols, F.col(value_col).alias("_v"))
        .agg(F.count(F.lit(1)).alias("_nb"))
    )
    joined = base.join(batch, [*gcols, "_v"], "full_outer").fillna(
        0, ["_na", "_nb"]
    )
    return ks_from_counts(joined, gcols)


def drift_monitor_writer(
    baseline_counts: DataFrame,
    monitor_path: str,
    value_col: str,
    lo: float,
    hi: float,
    nbuckets: int,
    group_cols: Sequence[str] = (),
    baseline_cdf: DataFrame | None = None,
    max_age_sec: float | None = None,
):
    """Return a ``foreachBatch`` function: bins each micro-batch under the
    SAME fixed clamp bins, scores its counts against the recorded baseline
    counts with :func:`..operators.profile.psi_from_counts`, and appends
    ``(batch_id, *group_cols, n_a, n_b, psi[, ks_d])`` to ``monitor_path``
    (``n_a`` = baseline rows, ``n_b`` = batch rows).

    When ``baseline_cdf`` (a stored :func:`record_baseline_cdf` artifact)
    is supplied, each row also carries ``ks_d`` — the bin-free
    cross-check: PSI with fixed bins is blind to a shift WITHIN a bin;
    KS against the recorded CDF edges sees it (to within the artifact's
    1/nbins resolution).  Alert on either.

    The stored baselines are consumed AS COUNTS — never re-read from raw
    data nor re-inflated to rows, so a billion-row calibration set costs
    the monitor (groups × bins + groups × edges) join rows per batch.
    Idempotency note: a replayed batch re-appends its monitor rows;
    readers take the last row per (batch_id, group) or dedup on write
    with the usual partition-overwrite sink.

    Staleness guard: when the baseline artifact carries a
    ``recorded_at`` stamp (:func:`record_baseline` ``recorded_at=…``),
    every monitor row also carries ``baseline_recorded_at`` — a
    calibration recorded BEFORE an upstream shift silently degrades into
    scoring drift against drift, and the stamp is the audit trail.  Pass
    ``max_age_sec`` to additionally emit ``baseline_stale`` (scoring
    wall-clock minus the stamp exceeds the age budget) so the dashboard
    alerts on "this monitor needs re-calibration" as loudly as on drift
    itself.  ``max_age_sec`` without a stamped baseline is a
    configuration error and raises immediately.
    """
    from ..operators.profile import psi_from_counts

    gcols = list(group_cols)
    recorded_at = None
    if "recorded_at" in baseline_counts.columns:
        # constant by construction; one bounded driver read at setup
        recorded_at = baseline_counts.agg(
            F.min("recorded_at")
        ).collect()[0][0]
        baseline_counts = baseline_counts.drop("recorded_at")
    elif max_age_sec is not None:
        raise ValueError(
            "max_age_sec needs a baseline recorded with recorded_at=…"
        )
    base = baseline_counts.withColumnRenamed("n", "_na")

    def _score(batch_df: DataFrame, epoch_id: int) -> None:
        batch_counts = record_baseline(
            batch_df, value_col, lo, hi, nbuckets, gcols
        ).withColumnRenamed("n", "_nb")
        joined = base.join(
            batch_counts, [*gcols, "bin"], "full_outer"
        ).fillna(0, ["_na", "_nb"])
        report = psi_from_counts(joined, gcols)
        if baseline_cdf is not None:
            ks = ks_against_baseline_cdf(
                baseline_cdf, batch_df, value_col, gcols
            ).select(*gcols, "ks_d")
            report = (
                report.join(ks, gcols, "full_outer")
                if gcols
                else report.crossJoin(F.broadcast(ks))
            )
        report = report.withColumn("batch_id", F.lit(int(epoch_id)))
        if recorded_at is not None:
            stamp = F.lit(recorded_at).cast("timestamp")
            report = report.withColumn("baseline_recorded_at", stamp)
            if max_age_sec is not None:
                age = (
                    F.unix_timestamp(F.current_timestamp())
                    - F.unix_timestamp(stamp)
                ).cast("double")
                report = report.withColumn(
                    "baseline_stale", age > F.lit(float(max_age_sec))
                )
        report.write.mode("append").parquet(monitor_path)

    return _score


def record_baseline_mean(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    recorded_at=None,
) -> DataFrame:
    """The Page–Hinkley calibration artifact: per-group baseline MEAN
    (exact decimal sum / count) plus row count — the μ₀ the cumulative
    detector drifts against.  Store it next to the count/CDF artifacts;
    pass ``recorded_at`` for the staleness trail."""
    gcols = list(group_cols)
    agg = df.filter(F.col(value_col).isNotNull()).groupBy(*gcols).agg(
        (
            F.sum(F.col(value_col).cast("decimal(28,12)")).cast(
                "double"
            )
            / F.count(F.lit(1)).cast("double")
        ).alias("mu0"),
        F.count(F.lit(1)).alias("n"),
    )
    if recorded_at is not None:
        agg = agg.withColumn(
            "recorded_at", F.lit(recorded_at).cast("timestamp")
        )
    return agg


def ph_monitor_writer(
    baseline_mean: DataFrame,
    monitor_path: str,
    value_col: str,
    delta: float,
    lam: float,
    group_cols: Sequence[str] = (),
):
    """Return a ``foreachBatch`` function running a Page–Hinkley
    CUMULATIVE mean-shift detector beside the per-batch PSI/KS of
    :func:`drift_monitor_writer`: PSI/KS score each batch in isolation,
    so a slow creep that never moves one batch far enough stays
    invisible — PH accumulates it.

    Over the sequence of BATCH MEANS x̄_b (one observation per
    micro-batch, per group):

        U_b = U_{b−1} + (x̄_b − μ₀ − δ)        (δ = tolerated drift)
        alarm when U_b − min_{i≤b} U_i > λ

    State is exactly (U, min U) per group — O(groups), carried IN the
    monitor table itself: each batch reads the latest state row per
    group with ``batch_id < epoch`` (so a REPLAYED epoch recomputes
    from the same predecessor instead of double-applying — exactly-once
    state under at-least-once foreachBatch), then appends
    ``(batch_id, *group_cols, n_b, batch_mean, ph_u, ph_min,
    ph_alarm)``.  The state read is a bounded monitor-table scan (rows =
    batches × groups; compact/TTL the monitor like any sink).
    """
    gcols = list(group_cols)
    base = baseline_mean.select(
        *gcols, F.col("mu0").alias("_mu0")
    )

    def _score(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        means = (
            batch_df.filter(F.col(value_col).isNotNull())
            .groupBy(*gcols)
            .agg(
                (
                    F.sum(
                        F.col(value_col).cast("decimal(28,12)")
                    ).cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).alias("batch_mean"),
                F.count(F.lit(1)).alias("n_b"),
            )
        )
        # Only a missing/empty monitor path (the first batch) may reset
        # Page-Hinkley state to zero; any OTHER read failure must propagate
        # and fail the batch — silently resetting cumulative state would
        # suppress exactly the slow-creep alarm the detector exists for.
        try:
            prior = spark.read.parquet(monitor_path).filter(
                F.col("batch_id") < F.lit(int(epoch_id))
            )
            w = Window.partitionBy(*gcols).orderBy(
                F.col("batch_id").desc()
            ) if gcols else Window.orderBy(F.col("batch_id").desc())
            state = (
                prior.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") == 1)
                .select(
                    *gcols,
                    F.col("ph_u").alias("_u0"),
                    F.col("ph_min").alias("_m0"),
                )
            )
        except AnalysisException:
            state = None
        joined = means.join(F.broadcast(base), gcols) if gcols else (
            means.crossJoin(F.broadcast(base))
        )
        if state is not None:
            joined = (
                joined.join(F.broadcast(state), gcols, "left")
                if gcols
                else joined.crossJoin(F.broadcast(state))
            )
        else:
            joined = joined.withColumn("_u0", F.lit(None)).withColumn(
                "_m0", F.lit(None)
            )
        u = (
            F.coalesce(F.col("_u0"), F.lit(0.0))
            + (F.col("batch_mean") - F.col("_mu0") - F.lit(delta))
        )
        mn = F.least(F.coalesce(F.col("_m0"), F.lit(0.0)), u)
        out = joined.select(
            F.lit(int(epoch_id)).alias("batch_id"),
            *gcols,
            "n_b",
            F.round("batch_mean", 9).alias("batch_mean"),
            F.round(u, 9).alias("ph_u"),
            F.round(mn, 9).alias("ph_min"),
            ((u - mn) > F.lit(lam)).alias("ph_alarm"),
        )
        out.write.mode("append").parquet(monitor_path)

    return _score
