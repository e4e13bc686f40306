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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def record_baseline(
    baseline: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    nbuckets: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """The calibration artifact: per (group, bin) counts of the baseline
    snapshot under the FIXED clamp bins — write this table beside the bin
    spec; every later batch is scored against it without re-reading the
    baseline.  (Derive ``lo``/``hi``/``nbuckets`` from
    ``profile.equi_depth_edges`` output when choosing bins, or pass known
    physical bounds.)

    Output: ``(*group_cols, bin int, n bigint)``.
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
    return (
        baseline.filter(keep)
        .groupBy(*group_cols, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def drift_monitor_writer(
    baseline_counts: DataFrame,
    monitor_path: str,
    value_col: str,
    lo: float,
    hi: float,
    nbuckets: int,
    group_cols: Sequence[str] = (),
):
    """Return a ``foreachBatch`` function: bins each micro-batch under the
    SAME fixed clamp bins, scores its counts against the recorded baseline
    counts with :func:`..operators.profile.psi_from_counts`, and appends
    ``(batch_id, *group_cols, n_a, n_b, psi)`` to ``monitor_path``
    (``n_a`` = baseline rows, ``n_b`` = batch rows).

    The stored baseline is consumed AS COUNTS — never re-read from raw
    data nor re-inflated to rows, so a billion-row calibration set costs
    the monitor (groups × bins) join rows per batch.  Idempotency note: a
    replayed batch re-appends its monitor rows; readers take the last row
    per (batch_id, group) or dedup on write with the usual
    partition-overwrite sink.
    """
    from ..operators.profile import psi_from_counts

    gcols = list(group_cols)
    base = baseline_counts.withColumnRenamed("n", "_na")

    def _score(batch_df: DataFrame, epoch_id: int) -> None:
        batch_counts = record_baseline(
            batch_df, value_col, lo, hi, nbuckets, gcols
        ).withColumnRenamed("n", "_nb")
        joined = base.join(
            batch_counts, [*gcols, "bin"], "full_outer"
        ).fillna(0, ["_na", "_nb"])
        report = psi_from_counts(joined, gcols).withColumn(
            "batch_id", F.lit(int(epoch_id))
        )
        report.write.mode("append").parquet(monitor_path)

    return _score
