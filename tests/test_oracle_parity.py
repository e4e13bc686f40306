"""Every queries() entry with an oracle must match DuckDB exactly at the test
scale factor — the local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from riot_graphs_spark.plans.driver_queries import oracle_sql, queries

from .oracle_utils import (
    assert_hash_compatible_types,
    compare_frames,
    duck_connection,
)

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
    if sql is not None:
        # Schema-class gate first: the driver's value-hash distinguishes
        # int/float/decimal/date/timestamp classes that the local value
        # comparator normalizes away (r02/r03 red-row class).
        assert_hash_compatible_types(sdf, duck, sql, name)
    spark_pdf = sdf.toPandas()
    if sql is None:
        assert len(spark_pdf) >= 0  # rows-only check (driver's weaker gate)
        return
    oracle_pdf = duck.execute(sql).df()
    compare_frames(spark_pdf, oracle_pdf, name)


# ---------------------------------------------------------------------------
# Regression: the type-class gate must red-flag exactly the oracle patterns
# that produced the r02/r03 driver hash-mismatch rows, and tolerate the
# differences the driver provably normalizes (green rows r01-r03).
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "spark_expr,duck_expr",
    [
        # HUGEINT window/plain sum vs Spark BIGINT (pack_sequences r02,
        # corpus_chunks_packed + dq_referential_integrity r03)
        ("CAST(sum(o_custkey) AS BIGINT) AS v", "sum(o_custkey) AS v"),
        # DuckDB ceil/floor(DOUBLE)->DOUBLE vs Spark ceil->BIGINT
        ("ceil(o_totalprice) AS v", "ceil(o_totalprice::DOUBLE) AS v"),
        # DuckDB sign->TINYINT vs Spark signum->DOUBLE
        ("signum(o_totalprice) AS v", "sign(o_totalprice::DOUBLE) AS v"),
        # DuckDB date_trunc('day')->DATE vs Spark date_trunc->TIMESTAMP
        (
            "date_trunc('day', o_orderdate) AS v",
            "date_trunc('day', o_orderdate::TIMESTAMP) AS v",
        ),
    ],
)
def test_hash_class_gate_flags_red_patterns(spark, sf_dir, duck, spark_expr, duck_expr):
    from .oracle_utils import assert_hash_compatible_types

    sdf = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(spark_expr)
    with pytest.raises(AssertionError, match="hash would diverge|class mismatch"):
        assert_hash_compatible_types(
            sdf, duck, f"SELECT {duck_expr} FROM orders", "red_pattern"
        )


@pytest.mark.parametrize(
    "spark_expr,duck_expr",
    [
        # int width collapse (month->int32 vs BIGINT): green throughout
        ("month(o_orderdate) AS v", "month(o_orderdate)::BIGINT AS v"),
        # decimal vs double collapse (hist_order_totalprice green r02)
        ("CAST(o_totalprice AS DOUBLE) AS v", "o_totalprice::DECIMAL(17,1) AS v"),
        # tz-aware vs naive timestamp: green throughout
        (
            "date_trunc('day', o_orderdate) AS v",
            "date_trunc('day', o_orderdate::TIMESTAMP)::TIMESTAMP AS v",
        ),
    ],
)
def test_hash_class_gate_allows_green_patterns(spark, sf_dir, duck, spark_expr, duck_expr):
    from .oracle_utils import assert_hash_compatible_types

    sdf = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(spark_expr)
    assert_hash_compatible_types(
        sdf, duck, f"SELECT {duck_expr} FROM orders", "green_pattern"
    )
