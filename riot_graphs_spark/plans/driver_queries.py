"""Driver-facing query registry: one entry per implemented operator from
SURVEY.md §2, each with a DuckDB-runnable oracle SQL equivalent.

Conventions that make the driver's order-insensitive value-hash comparison
deterministic (BASELINE.md correctness gate):

- Cross-row floating-point reductions are computed in DECIMAL (exact, order
  independent) and cast to double at the end; per-row double arithmetic is
  bit-deterministic IEEE and left alone.
- Every computed column is aliased identically in the Spark plan and the SQL.
- Timestamp outputs are cast to microsecond precision on the DuckDB side
  (the raw ``events.ts`` view is TIMESTAMP_NS there).
- Any top-1 pick carries a unique-id tiebreak so ties cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import anchored_day, html_pr_anchor
from ..operators.asof import asof_join
from ..operators.explode import parse_props
from ..operators.joins import delta_new_rows, enrich
from ..operators.timeseries import (
    delta_vs_prev,
    distinct_tags,
    gap_fill_forward,
    last_per_bucket,
    time_bucket_agg,
    time_range,
    top1_by_time,
)
from ..sources.tables import load_table
from .flagship import daily_last_value_delta

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


#: Exact decimal cast used before any cross-row sum of a money-like double.
DEC = "decimal(18,2)"


# --------------------------------------------------------------------------
# Flagship (SURVEY §7 step 2): A1 last-of-anchored-day + G5 delta
# --------------------------------------------------------------------------
@_q(
    "flagship_daily_delta",
    """
    WITH ranked AS (
      SELECT (date_trunc('day', ts - INTERVAL 3 HOUR) + INTERVAL 3 HOUR)::TIMESTAMP AS day,
             event_type, event_id, value,
             row_number() OVER (
               PARTITION BY date_trunc('day', ts - INTERVAL 3 HOUR), event_type
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ), last AS (
      SELECT day, event_type, event_id AS last_event_id, value AS last_value
      FROM ranked WHERE rn = 1
    )
    SELECT day, event_type, last_event_id, last_value,
           last_value - lag(last_value) OVER (PARTITION BY event_type ORDER BY day) AS delta
    FROM last
    """,
)
def flagship_daily_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_last_value_delta(_t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# P1 — nested-document explosion / JSON parsing (reference rg.py:269-285)
# --------------------------------------------------------------------------
@_q(
    "p1_json_props",
    """
    SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
    FROM events
    """,
)
def p1_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parse_props(_t(spark, sf_dir, "events")).select("event_id", "k")


# --------------------------------------------------------------------------
# P2/P3/P4 — derived columns, casts, null defaults (rg.py:279, 295-299)
# --------------------------------------------------------------------------
@_q(
    "p2_derived_revenue",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           CAST(l_quantity AS BIGINT) AS qty,
           COALESCE(NULLIF(l_returnflag, 'N'), 'NONE') AS flag
    FROM lineitem
    """,
)
def p2_derived_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("revenue"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("NONE")).alias("flag"),
    )


# --------------------------------------------------------------------------
# P5 — total regex extraction (rg.py:78,146; hardened per SURVEY §7 step 5)
# --------------------------------------------------------------------------
@_q(
    "p5_regex_extract",
    """
    SELECT o_orderkey,
           CAST(NULLIF(regexp_extract(o_orderpriority, '(\\d+)', 1), '') AS BIGINT)
             AS priority_num,
           regexp_extract(o_orderstatus, '([A-Z])', 1) AS status_letter
    FROM orders
    """,
)
def p5_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.nullif(F.regexp_extract("o_orderpriority", r"(\d+)", 1), F.lit(""))
        .cast("long")
        .alias("priority_num"),
        F.regexp_extract("o_orderstatus", "([A-Z])", 1).alias("status_letter"),
    )


# --------------------------------------------------------------------------
# P9/G2 — time-range scan (rg.py:200-205; partition-prunable at scale)
# --------------------------------------------------------------------------
@_q(
    "p9_time_range",
    """
    SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
    """,
)
def p9_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return time_range(ev, "ts", "2024-01-10 00:00:00", "2024-01-20 00:00:00").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


# --------------------------------------------------------------------------
# P12 — HTML annotation formatting (rg.py:338-344)
# --------------------------------------------------------------------------
@_q(
    "p12_html_anchor",
    """
    SELECT event_id,
           printf('<a target="_blank" href="https://github.com/%s/pull/%d">#%d</a>',
                  'RIOT-OS/RIOT', event_id, event_id) AS event_link
    FROM events WHERE event_type = 'error'
    """,
)
def p12_html_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    return ev.select(
        "event_id", html_pr_anchor(F.col("event_id")).alias("event_link")
    )


# --------------------------------------------------------------------------
# A1 — last-per-bucket via partial-aggregable max_by (rg.py:52-84)
# --------------------------------------------------------------------------
@_q(
    "a1_last_of_day",
    """
    SELECT bucket, user_id, event_id, event_type, value FROM (
      SELECT date_trunc('day', ts)::TIMESTAMP AS bucket, user_id,
             event_id, event_type, value,
             row_number() OVER (
               PARTITION BY date_trunc('day', ts), user_id
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def a1_last_of_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return last_per_bucket(
        ev,
        ts="ts",
        dims=["user_id"],
        payload=["event_id", "event_type", "value"],
        tiebreak="event_id",
    )


# --------------------------------------------------------------------------
# A2/S9 — global top-1 by time (rg.py:130-131) — TakeOrderedAndProject
# --------------------------------------------------------------------------
@_q(
    "a2_newest_event",
    """
    SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 1
    """,
)
def a2_newest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return top1_by_time(ev, ts="ts", tiebreak="event_id").select(
        "event_id", "ts", "user_id", "event_type"
    )


# --------------------------------------------------------------------------
# G1 — time-bucketed multi-agg per tag (InfluxQL GROUP BY time(), SURVEY §2.4)
# --------------------------------------------------------------------------
@_q(
    "g1_hourly_agg",
    f"""
    SELECT date_trunc('hour', ts)::TIMESTAMP AS bucket, event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS {DEC})) AS DOUBLE) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value,
           CAST(sum(CAST(value AS {DEC})) AS DOUBLE) / count(*) AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def g1_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    sum_dec = F.sum(F.col("value").cast(DEC))
    return time_bucket_agg(
        ev,
        ts="ts",
        unit="hour",
        dims=["event_type"],
        aggs=[
            F.count("*").alias("n"),
            sum_dec.cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            (sum_dec.cast("double") / F.count("*")).alias("avg_value"),
        ],
    )


# --------------------------------------------------------------------------
# G3 — gap fill / forward fill (Grafana fill(previous), SURVEY §4 item 1)
# --------------------------------------------------------------------------
@_q(
    "g3_gap_fill",
    f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts)::TIMESTAMP AS bucket, event_type,
             CAST(sum(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT min(bucket) AS lo, max(bucket) AS hi FROM hourly
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM bounds
    ), grid AS (
      SELECT s.bucket, t.event_type
      FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM hourly) t
    )
    SELECT g.bucket, g.event_type,
           last_value(h.sum_value IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value
    FROM grid g LEFT JOIN hourly h ON g.bucket = h.bucket AND g.event_type = h.event_type
    """,
)
def g3_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = time_bucket_agg(
        ev,
        ts="ts",
        unit="hour",
        dims=["event_type"],
        aggs=[F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value")],
    )
    return gap_fill_forward(
        hourly,
        ts="bucket",
        dims=["event_type"],
        values=["sum_value"],
        step="INTERVAL 1 HOUR",
    )


# --------------------------------------------------------------------------
# G4 — percentiles (InfluxQL percentile(), SURVEY §2.4 G4)
# --------------------------------------------------------------------------
@_q(
    "g4_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95
    FROM events GROUP BY event_type
    """,
)
def g4_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
    )


# --------------------------------------------------------------------------
# G5 — lag delta per series (size-regression signal, SURVEY §2.4 G5)
# --------------------------------------------------------------------------
@_q(
    "g5_daily_delta",
    f"""
    WITH daily AS (
      SELECT date_trunc('day', ts)::TIMESTAMP AS day, event_type,
             CAST(sum(CAST(value AS {DEC})) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2
    )
    SELECT day, event_type, total,
           total - lag(total) OVER (PARTITION BY event_type ORDER BY day) AS delta
    FROM daily
    """,
)
def g5_daily_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = time_bucket_agg(
        ev,
        ts="ts",
        unit="day",
        dims=["event_type"],
        aggs=[F.sum(F.col("value").cast(DEC)).cast("double").alias("total")],
        bucket_name="day",
    )
    return delta_vs_prev(daily, dims=["event_type"], ts="day", value="total", out="delta")


# --------------------------------------------------------------------------
# G7 — distinct tag values (Grafana template variables)
# --------------------------------------------------------------------------
@_q(
    "g7_distinct_tags",
    "SELECT DISTINCT event_type FROM events",
)
def g7_distinct_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distinct_tags(_t(spark, sf_dir, "events"), "event_type")


# --------------------------------------------------------------------------
# J1 — large fact⋈fact equi-join + aggregation
# --------------------------------------------------------------------------
@_q(
    "j1_lineitem_orders",
    f"""
    SELECT o.o_orderpriority,
           count(*) AS n_lines,
           CAST(sum(CAST(l.l_extendedprice AS {DEC}) * (1 - CAST(l.l_discount AS {DEC})))
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def j1_lineitem_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC))
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        F.sum(rev).cast("double").alias("revenue"),
    )


# --------------------------------------------------------------------------
# J2 — broadcast dimension-chain enrichment (rg.py:356-362 at scale)
# --------------------------------------------------------------------------
@_q(
    "j2_orders_by_region",
    f"""
    SELECT r.r_name,
           count(*) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS {DEC})) AS DOUBLE) AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def j2_orders_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return joined.groupBy("r_name").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
    )


# --------------------------------------------------------------------------
# J3 — left-anti delta detection (rg.py:129-143)
# --------------------------------------------------------------------------
@_q(
    "j3_delta_new_orders",
    """
    SELECT o_orderkey, o_orderstatus FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM orders s WHERE s.o_orderkey % 7 = 0 AND s.o_orderkey = o.o_orderkey
    )
    """,
)
def j3_delta_new_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    stored = o.filter(F.col("o_orderkey") % 7 == 0)
    return delta_new_rows(o, stored, key="o_orderkey").select(
        "o_orderkey", "o_orderstatus"
    )


# --------------------------------------------------------------------------
# J4 — backward as-of join (rg.py:61-84 generalized; SURVEY §4 item 2)
# --------------------------------------------------------------------------
@_q(
    "j4_asof_purchase_signup",
    """
    SELECT p.event_id, p.user_id, p.ts::TIMESTAMP AS ts,
           s.ts::TIMESTAMP AS ts_asof, s.event_id AS event_id_asof
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def j4_asof_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", "event_id"
    )
    return asof_join(
        purchases,
        signups,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["ts", "event_id"],
    )


# --------------------------------------------------------------------------
# O2 — idempotent dedup on the upsert key (InfluxDB point-overwrite, SURVEY §2.6)
# --------------------------------------------------------------------------
@_q(
    "o2_dedup_latest",
    """
    SELECT user_id, event_type, event_id, ts::TIMESTAMP AS ts, value FROM (
      SELECT user_id, event_type, event_id, ts, value,
             row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def o2_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    order = F.struct(F.col("ts"), F.col("event_id"))
    picked = F.max_by(F.struct("event_id", "ts", "value"), order).alias("_p")
    return ev.groupBy("user_id", "event_type").agg(picked).select(
        "user_id",
        "event_type",
        F.col("_p.event_id").alias("event_id"),
        F.col("_p.ts").alias("ts"),
        F.col("_p.value").alias("value"),
    )


# --------------------------------------------------------------------------
# O3 — 03:00-anchored day windows (rg.py:61-68)
# --------------------------------------------------------------------------
@_q(
    "o3_anchored_day",
    f"""
    SELECT (date_trunc('day', ts - INTERVAL 3 HOUR) + INTERVAL 3 HOUR)::TIMESTAMP AS day,
           count(*) AS n,
           CAST(sum(CAST(value AS {DEC})) AS DOUBLE) AS total
    FROM events GROUP BY 1
    """,
)
def o3_anchored_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(anchored_day("ts").alias("day")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total"),
    )


def queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
