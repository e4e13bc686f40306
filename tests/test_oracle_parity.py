"""Every queries() entry with an oracle must match DuckDB exactly at the test
scale factor — the local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from riot_graphs_spark.plans.driver_queries import oracle_sql, queries

from .oracle_utils import compare_frames, duck_connection

NAMES = sorted(queries().keys())


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    fn = queries()[name]
    sql = oracle_sql().get(name)
    sdf = fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if sql is None:
        assert len(spark_pdf) >= 0  # rows-only check (driver's weaker gate)
        return
    oracle_pdf = duck.execute(sql).df()
    compare_frames(spark_pdf, oracle_pdf, name)
