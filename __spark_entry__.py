"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in :mod:`riot_graphs_spark.plans.driver_queries`; this
module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from riot_graphs_spark.plans import driver_queries  # noqa: E402
from riot_graphs_spark.session import apply_runtime_confs  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7 step 2) on sf0.001: per event_type, the last
    event value of each 03:00-anchored day and its day-over-day delta."""
    apply_runtime_confs(spark)
    return driver_queries.flagship_daily_delta(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        name: _wrap(fn) for name, fn in driver_queries.queries().items()
    }


def _wrap(fn):
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        apply_runtime_confs(spark)
        return fn(spark, sf_dir)

    return runner


def oracle_sql() -> dict[str, str]:
    return driver_queries.oracle_sql()
