"""SQL-surface tests (SURVEY §7 step 1): every table registers as a temp
view, so the whole query surface is reachable from ``spark.sql`` — the
DataFrame operators and hand-written SQL agree."""

from __future__ import annotations

from pyspark.sql import functions as F

from riot_graphs_spark.sources.tables import register_tables


def test_register_tables_exposes_views(spark, sf_dir):
    tables = register_tables(spark, sf_dir)
    assert set(tables) == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    assert spark.sql("SELECT count(*) AS n FROM lineitem").collect()[0].n > 0


def test_sql_matches_dataframe_agg(spark, sf_dir):
    register_tables(spark, sf_dir)
    via_sql = spark.sql(
        """
        SELECT date_trunc('hour', ts) AS bucket, event_type, count(*) AS n
        FROM events GROUP BY 1, 2
        """
    )
    from riot_graphs_spark.operators.timeseries import time_bucket_agg

    via_df = time_bucket_agg(
        spark.table("events"),
        ts="ts",
        unit="hour",
        dims=["event_type"],
        aggs=[F.count("*").alias("n")],
    )
    assert via_sql.exceptAll(via_df).count() == 0
    assert via_df.exceptAll(via_sql).count() == 0


def test_sql_broadcast_join_hint(spark, sf_dir):
    register_tables(spark, sf_dir)
    df = spark.sql(
        """
        SELECT /*+ BROADCAST(c) */ c.c_mktsegment, count(*) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
        """
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan
    assert df.count() > 0
