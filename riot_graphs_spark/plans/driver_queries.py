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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import anchored_day, html_pr_anchor
from ..operators.asof import asof_join
from ..operators.evaluation import Z95
from ..operators.explode import parse_props
from ..operators.joins import delta_new_rows, enrich
from ..operators.timeseries import (
    delta_vs_prev,
    distinct_tags,
    gap_fill_forward,
    gap_fill_linear,
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
# G3 variant — fill(linear): interpolated gap fill (SURVEY §2.4 G3)
# --------------------------------------------------------------------------
@_q(
    "g3_gap_fill_linear",
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
    ), j AS (
      SELECT g.bucket, g.event_type, h.sum_value,
             last_value(h.sum_value IGNORE NULLS) OVER wb AS prev_v,
             last_value(CASE WHEN h.sum_value IS NOT NULL
                             THEN epoch(g.bucket) END IGNORE NULLS)
               OVER wb AS prev_t,
             first_value(h.sum_value IGNORE NULLS) OVER wf AS next_v,
             first_value(CASE WHEN h.sum_value IS NOT NULL
                              THEN epoch(g.bucket) END IGNORE NULLS)
               OVER wf AS next_t
      FROM grid g
      LEFT JOIN hourly h ON g.bucket = h.bucket AND g.event_type = h.event_type
      WINDOW
        wb AS (PARTITION BY g.event_type ORDER BY g.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wf AS (PARTITION BY g.event_type ORDER BY g.bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT bucket, event_type,
           CASE WHEN sum_value IS NOT NULL THEN sum_value
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                THEN prev_v + (next_v - prev_v)
                     * ((epoch(bucket) - prev_t) / (next_t - prev_t))
           END AS sum_value
    FROM j
    """,
)
def g3_gap_fill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grafana ``fill(linear)``: same hourly grid as ``g3_gap_fill`` but
    missing buckets are linearly interpolated between the neighboring
    observed points (edges stay NULL). The interpolation arithmetic is
    written identically on both engines (same double expression tree), so
    the hashes match bit-for-bit."""
    ev = _t(spark, sf_dir, "events")
    hourly = time_bucket_agg(
        ev,
        ts="ts",
        unit="hour",
        dims=["event_type"],
        aggs=[F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value")],
    )
    return gap_fill_linear(
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
# J4 variant — forward as-of join (first purchase after each signup)
# --------------------------------------------------------------------------
@_q(
    "j4_asof_next_purchase",
    """
    SELECT s.event_id, s.user_id, s.ts::TIMESTAMP AS ts,
           p.ts::TIMESTAMP AS ts_asof, p.event_id AS event_id_asof
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON s.user_id = p.user_id AND s.ts <= p.ts
    """,
)
def j4_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each signup paired with the user's EARLIEST purchase
    at or after it (time-to-conversion building block). Mirror of
    ``j4_asof_purchase_signup`` using ``asof_join_forward``."""
    from ..operators.asof import asof_join_forward

    ev = _t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    return asof_join_forward(
        signups,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["ts", "event_id"],
        right_tiebreak=["event_id"],
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


# ==========================================================================
# Extension surface (SURVEY §7 step 7): dedup, similarity, text analysis
# ==========================================================================

#: Shared DuckDB CTE fragments so oracle SQL stays in lockstep with the
#: Spark operators (same tokenizer regex, same md5-prefix hashing).
_DUCK_WORDS = "regexp_extract_all(lower(text), '[a-z0-9]+')"
_DUCK_SHINGLES = (
    "list_distinct([array_to_string(words[i:i+2], ' ') "
    "for i in range(1, len(words) - 1)])"
)
#: Shingle hash = composition of per-word md5-32 hashes
#: (h_i·B² + h_{i+1}·B + h_{i+2}) mod P with B=40009 — identical arithmetic
#: to operators.dedup.composed_shingle_hashes (no shingle strings built).
_DUCK_MINHASH = f"""
    docs AS (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents),
    wh AS (SELECT doc_id,
                  list_transform(words,
                    w -> ('0x' || substr(md5(w), 1, 8))::BIGINT) AS hw
           FROM docs),
    sh AS (SELECT doc_id,
                  unnest(list_distinct([
                    (hw[i]*1600720081 % 1000000007
                     + hw[i+1]*40009 % 1000000007
                     + hw[i+2]) % 1000000007
                    for i in range(1, len(hw) - 1)])) AS h2
           FROM wh),
    ex AS (SELECT doc_id, j, ((2*j+3)*h2 + 7919*j + 13) % 1000000007 AS hv
           FROM sh, (SELECT unnest(range(0, 16)) AS j)),
    sig AS (SELECT doc_id, j, min(hv) AS minhash FROM ex GROUP BY doc_id, j)
"""


@_q(
    "dedup_exact_groups",
    """
    WITH fp AS (
      SELECT doc_id,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
      FROM documents
    ), groups AS (
      SELECT fingerprint, min(doc_id) AS canonical_id, count(*) AS group_size
      FROM fp GROUP BY fingerprint
    )
    SELECT fp.doc_id, fp.fingerprint, g.canonical_id, g.group_size
    FROM fp JOIN groups g USING (fingerprint)
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import exact_dedup_groups

    return exact_dedup_groups(_t(spark, sf_dir, "documents"))


@_q(
    "dedup_minhash_signatures",
    f"WITH {_DUCK_MINHASH} SELECT doc_id, j, minhash FROM sig",
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_signatures

    return minhash_signatures(_t(spark, sf_dir, "documents")).select(
        "doc_id", F.col("j").cast("long").alias("j"), "minhash"
    )


@_q(
    "dedup_minhash_lsh",
    f"""
    WITH {_DUCK_MINHASH},
    bands AS (
      SELECT doc_id, j // 4 AS band,
             string_agg(minhash::VARCHAR, '-' ORDER BY j) AS band_key
      FROM sig GROUP BY doc_id, j // 4
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"))


@_q(
    "dedup_ngram_jaccard",
    f"""
    WITH docs AS (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents),
    sh AS (SELECT doc_id, unnest({_DUCK_SHINGLES}) AS s FROM docs),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           inter::DOUBLE / (sa.n + sb.n - inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= 0.8
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.8
    )


@_q(
    "dedup_simhash",
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents
    ), hs AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks
    ), bits AS (
      SELECT doc_id, b, (1::BIGINT << b) AS pow,
             CASE WHEN (h // (1::BIGINT << b)) % 2 = 1 THEN 1 ELSE -1 END AS sign
      FROM hs, (SELECT unnest(range(0, 32)) AS b)
    ), sums AS (
      SELECT doc_id, b, pow, sum(sign) AS s FROM bits GROUP BY doc_id, b, pow
    )
    SELECT doc_id,
           (sum(CASE WHEN s > 0 THEN pow ELSE 0 END))::BIGINT AS simhash
    FROM sums GROUP BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import simhash_signatures

    return simhash_signatures(_t(spark, sf_dir, "documents"))


@_q(
    "dedup_simhash_pairs",
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents
    ), hs AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks
    ), bits AS (
      SELECT doc_id, b, (1::BIGINT << b) AS pow,
             CASE WHEN (h // (1::BIGINT << b)) % 2 = 1 THEN 1 ELSE -1 END AS sign
      FROM hs, (SELECT unnest(range(0, 32)) AS b)
    ), sums AS (
      SELECT doc_id, b, pow, sum(sign) AS s FROM bits GROUP BY doc_id, b, pow
    ), sig AS (
      SELECT doc_id, (sum(CASE WHEN s > 0 THEN pow ELSE 0 END))::BIGINT AS simhash
      FROM sums GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS key
      FROM sig, (SELECT unnest(range(0, 4)) AS band)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sa, b.simhash AS sb
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, bit_count(xor(sa, sb))::INT AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming ≤ 3
    (operators.dedup.simhash_hamming_pairs): pigeonhole banding makes the
    candidate set a band-key equi-join with 100% recall at the radius —
    the verify step that completes the SimHash dedup path."""
    from ..operators.dedup import simhash_hamming_pairs

    return simhash_hamming_pairs(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Text analysis (language ID, quality, token counts)
# --------------------------------------------------------------------------
def _duck_stoplist(wordlist) -> str:
    return "[" + ", ".join(f"'{w}'" for w in wordlist) + "]"


def _langid_fold() -> tuple[str, str]:
    """(score_cols, best_lang) SQL fragments replicating
    textstats.predict_lang: per-language profile-hit counts over a ``toks``
    column, then the argmax fold (earliest lang wins ties)."""
    from ..operators.textstats import LANG_PROFILES

    langs = sorted(LANG_PROFILES)
    score_cols = ",\n           ".join(
        f"len(list_filter(toks, t -> list_contains({_duck_stoplist(LANG_PROFILES[lang])}, t)))"
        f" AS score_{lang}"
        for lang in langs
    )
    best_lang, best_score = f"'{langs[0]}'", f"score_{langs[0]}"
    for lang in langs[1:]:
        best_lang = (
            f"CASE WHEN score_{lang} > {best_score} THEN '{lang}' ELSE {best_lang} END"
        )
        best_score = (
            f"CASE WHEN score_{lang} > {best_score} THEN score_{lang} ELSE {best_score} END"
        )
    return score_cols, best_lang


def _langid_oracle() -> str:
    score_cols, best_lang = _langid_fold()
    return f"""
    WITH toks_t AS (
      SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ), scored AS (
      SELECT doc_id, lang,
           {score_cols}
      FROM toks_t
    )
    SELECT doc_id, lang, score_de, score_en, score_es, score_fr, score_zh,
           {best_lang} AS predicted_lang
    FROM scored
    """


@_q("text_lang_id", _langid_oracle())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import predict_lang

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return predict_lang(docs).drop("text")


@_q(
    "text_quality_scores",
    f"""
    WITH t AS (
      SELECT doc_id, text, {_DUCK_WORDS.replace("text", "text")} AS toks
      FROM documents
    ), stats AS (
      SELECT doc_id,
             len(toks)::BIGINT AS n_tokens,
             CASE WHEN len(toks) > 0
                  THEN (list_sum(list_transform(toks, t -> len(t))))::DOUBLE / len(toks)
             END AS avg_token_len,
             CASE WHEN len(text) > 0
                  THEN len(regexp_extract_all(text, '[.,!?;:]'))::DOUBLE / len(text)
                  ELSE 0.0 END AS punct_ratio,
             CASE WHEN len(toks) > 0
                  THEN len(list_filter(toks, t -> list_contains(
                       {_duck_stoplist(("the", "a", "an", "and", "or", "of", "to", "in", "is", "it"))}, t)))::DOUBLE
                       / len(toks)
                  ELSE 0.0 END AS stopword_ratio
      FROM t
    )
    SELECT doc_id, n_tokens, avg_token_len, punct_ratio, stopword_ratio,
           greatest(
             (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.5 ELSE 0.0 END)
             + least(stopword_ratio * 2, 0.3)
             - least(punct_ratio * 5, 0.2),
             0.0) AS quality_score
    FROM stats
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import quality_score

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_score(docs).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "avg_token_len",
        "punct_ratio",
        "stopword_ratio",
        "quality_score",
    )


@_q(
    "text_token_count",
    """
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))::BIGINT
             AS n_bpe_pieces
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import token_count

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").cast("long").alias("n_tokens"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0
            )
        )
        .cast("long")
        .alias("n_bpe_pieces"),
    )


# --------------------------------------------------------------------------
# Similarity search over embeddings
# --------------------------------------------------------------------------
_DUCK_COSINE = (
    "round(list_dot_product(c.embedding::DOUBLE[], q.qv::DOUBLE[]) / "
    "(sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))), 6)"
)


@_q(
    "ann_cosine_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
    pairs AS (
      SELECT q.query_id, c.vec_id, {_DUCK_COSINE} AS score
      FROM embeddings c, q WHERE c.vec_id != q.query_id
    ), ranked AS (
      SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
      FROM pairs
    )
    SELECT query_id, vec_id AS neighbor_id, score, rank::INTEGER AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@_q(
    "ann_lsh_topk",
    f"""
    WITH b AS (
      SELECT vec_id, embedding,
             (list_sum(list_transform(range(0, 8),
                i -> CASE WHEN embedding[i+1] >= 0 THEN (1 << i) ELSE 0 END)))::BIGINT
               AS bucket
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id < 10
    ), pairs AS (
      SELECT q.query_id, c.vec_id, {_DUCK_COSINE} AS score
      FROM b c JOIN q ON c.bucket = q.bucket AND c.vec_id != q.query_id
    ), ranked AS (
      SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
      FROM pairs
    )
    SELECT query_id, vec_id AS neighbor_id, score, rank::INTEGER AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_bucketed_topk

    emb = _t(spark, sf_dir, "embeddings")
    return lsh_bucketed_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


_DUCK_COSINE_EMB = _DUCK_COSINE.replace("q.qv", "q.embedding")

#: Data-derived blocking key for the embedding near-dup self-join — the
#: DuckDB twin of operators.similarity.sign_bucket(vec, dims=4). 4 bits
#: (not the operator's default 8) so the sf0.01 fixture yields a non-trivial
#: in-bucket pair set for the hash gate.
_DUCK_SIGN_BUCKET4 = (
    "(list_sum(list_transform(range(0, 4), "
    "i -> CASE WHEN embedding[i+1] >= 0 THEN (1 << i) ELSE 0 END)))::BIGINT"
)

#: Shared near-dup pair CTE body: sign-bucket-blocked self-join, cosine ≥ 0.35
#: (the fixture's vectors are near-orthogonal random points — 0.35 marks the
#: fat tail while keeping the pair graph shallow: at 0.3 the weak extra edges
#: chain components to diameter ~13, and the min-label CC pays one round per
#: hop of diameter; real corpora use 0.9+ with the same plan shape).
_DUCK_NEARDUP_PAIRS = f"""b AS (
      SELECT vec_id, embedding, {_DUCK_SIGN_BUCKET4} AS bucket FROM embeddings
    ), pairs AS (
      SELECT c.vec_id AS vec_a, q.vec_id AS vec_b, {_DUCK_COSINE_EMB} AS score
      FROM b c JOIN b q ON c.bucket = q.bucket AND c.vec_id < q.vec_id
      WHERE {_DUCK_COSINE_EMB} >= 0.35
    )"""

#: Spark-side twin of _DUCK_NEARDUP_PAIRS.
def _neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_neardup_pairs

    return embedding_neardup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.35, bucket_dims=4
    )


@_q(
    "embed_neardup_pairs",
    f"""
    WITH {_DUCK_NEARDUP_PAIRS}
    SELECT vec_a, vec_b, score FROM pairs
    """,
)
def embed_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs blocked on the data-derived sign bucket (no
    external label/grouping column needed): the self-join is an equi-join
    on sign_bucket(embedding), never a cartesian product."""
    return _neardup_pairs(spark, sf_dir)


@_q(
    "embed_neardup_clusters",
    f"""
    WITH RECURSIVE {_DUCK_NEARDUP_PAIRS}, edges AS (
      SELECT vec_a AS a, vec_b AS b FROM pairs
      UNION SELECT vec_b, vec_a FROM pairs
    ), lp(id, comp) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, least(lp.comp, e.a)
      FROM lp JOIN edges e ON lp.id = e.b
    )
    SELECT id, min(comp) AS component_id FROM lp GROUP BY id
    """,
)
def embed_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup families: sign-bucket-blocked cosine pairs →
    connected components — the same min-label propagation that collapses
    text duplicate chains (dedup_cc_clusters) composed over the embedding
    similarity operator instead of MinHash. Transitive closure matters:
    A≈B, B≈C keeps only one of three even when A≉C directly."""
    from ..operators.dedup import connected_components

    pairs = _neardup_pairs(spark, sf_dir).select("vec_a", "vec_b")
    return connected_components(pairs, src="vec_a", dst="vec_b")


# --------------------------------------------------------------------------
# O6 — session & sliding windows (SURVEY §2.6 O6 extension surface)
# --------------------------------------------------------------------------
@_q(
    "o6_session_windows",
    f"""
    WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, value FROM events),
    m AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT *, sum(new_sess) OVER (
        PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM m
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id,
           count(*) AS n_events,
           CAST(sum(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
    FROM s GROUP BY user_id, sid
    """,
)
def o6_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import session_windows

    ev = _t(spark, sf_dir, "events")
    return session_windows(
        ev,
        ts="ts",
        dims=["user_id"],
        gap="30 minutes",
        aggs=[
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        ],
    )


@_q(
    "o6_sliding_window",
    f"""
    WITH expanded AS (
      SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                     date_trunc('hour', ts)])::TIMESTAMP AS window_start,
             event_type, value
      FROM events
    )
    SELECT window_start, window_start + INTERVAL 2 HOUR AS window_end,
           event_type, count(*) AS n,
           CAST(sum(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
    FROM expanded GROUP BY 1, 2, 3
    """,
)
def o6_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import sliding_window_agg

    ev = _t(spark, sf_dir, "events")
    return sliding_window_agg(
        ev,
        ts="ts",
        duration="2 hours",
        slide="1 hour",
        dims=["event_type"],
        aggs=[
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        ],
    )


# --------------------------------------------------------------------------
# G1 first/last per bucket — InfluxQL first()/last(), via max_by/min_by
# (partial-aggregable: one shuffle, no ranked window; SURVEY §4 item 3)
# --------------------------------------------------------------------------
@_q(
    "g1_first_last",
    """
    WITH ranked AS (
      SELECT date_trunc('hour', ts)::TIMESTAMP AS bucket, event_type, value,
             row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                                ORDER BY ts ASC,  event_id ASC)  AS rn_first,
             row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_last
      FROM events
    )
    SELECT bucket, event_type,
           max(CASE WHEN rn_first = 1 THEN value END) AS first_value,
           max(CASE WHEN rn_last  = 1 THEN value END) AS last_value
    FROM ranked GROUP BY bucket, event_type
    """,
)
def g1_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    order = F.struct("ts", "event_id")
    return time_bucket_agg(
        ev,
        ts="ts",
        unit="hour",
        dims=["event_type"],
        aggs=[
            F.min_by("value", order).alias("first_value"),
            F.max_by("value", order).alias("last_value"),
        ],
    )


# --------------------------------------------------------------------------
# P13 — greedy word wrap (reference rg.py:364-366), Catalyst fold form
# --------------------------------------------------------------------------
@_q(
    "p13_wrap",
    """
    SELECT p_partkey,
           replace(
             list_reduce(
               list_concat([''], regexp_split_to_array(trim(p_name), '\\s+')),
               (acc, w) -> CASE
                 WHEN acc = '' THEN w
                 WHEN length(str_split(acc, chr(10))[-1]) + length(w) + 1 <= 12
                   THEN acc || ' ' || w
                 ELSE acc || chr(10) || w END),
             chr(10), '<br>') AS wrapped
    FROM part
    """,
)
def p13_wrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalars import greedy_wrap

    return _t(spark, sf_dir, "part").select(
        "p_partkey", greedy_wrap("p_name", width=12).alias("wrapped")
    )


# --------------------------------------------------------------------------
# P6 — ISO-8601+offset timestamp parse (reference rg.py:220): round-trip
# through a formatted string with a non-UTC offset; compared as epoch-micros
# (tz-independent on both engines).
# --------------------------------------------------------------------------
@_q(
    "p6_parse_offset",
    """
    SELECT event_id,
           epoch_us(strptime(strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') || ' +0200',
                             '%Y-%m-%d %H:%M:%S %z')) AS parsed_us
    FROM events
    """,
)
def p6_parse_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalars import parse_iso_offset

    ev = _t(spark, sf_dir, "events")
    formatted = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), F.lit(" +0200")
    )
    return ev.select(
        "event_id", F.unix_micros(parse_iso_offset(formatted)).alias("parsed_us")
    )


# --------------------------------------------------------------------------
# Multimodal (SURVEY §7 step 7): binary payload + metadata, mapInPandas
# decode plumbing; metadata columns stay oracle-checkable.
# --------------------------------------------------------------------------
@_q(
    "mm_image_features",
    """
    SELECT doc_id AS media_id,
           ['image','audio','video'][(doc_id % 3 + 1)::INT] AS media_type,
           octet_length(encode(substr(text, 1, 16)))::BIGINT AS n_bytes
    FROM documents
    """,
)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import extract_image_features, media_from_documents

    media = media_from_documents(_t(spark, sf_dir, "documents"))
    return extract_image_features(media).select("media_id", "media_type", "n_bytes")


@_q(
    "mm_resize_plan",
    """
    WITH m AS (
      SELECT doc_id AS media_id, (32 + doc_id % 97)::INT AS w,
             (32 + doc_id % 61)::INT AS h
      FROM documents
    )
    SELECT media_id, w AS orig_width, h AS orig_height,
           (CASE WHEN w * 48 <= 64 * h
                 THEN greatest(1, (w * 48) // h) ELSE 64 END)::INT
             AS out_width,
           (CASE WHEN w * 48 <= 64 * h
                 THEN 48 ELSE greatest(1, (h * 64) // w) END)::INT
             AS out_height,
           ((CASE WHEN w * 48 <= 64 * h
                  THEN greatest(1, (w * 48) // h) ELSE 64 END)
            * (CASE WHEN w * 48 <= 64 * h
                    THEN 48 ELSE greatest(1, (h * 64) // w) END)
            * 3)::BIGINT AS n_bytes_out
    FROM m
    """,
)
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch image resize (operators.multimodal.resize_images): mapInPandas
    Arrow-batched aspect-fit into a 64×48 box — the pixel resample is a
    documented stub, the integer fit arithmetic and the batch plumbing are
    real and oracle-checked on the metadata columns."""
    from ..operators.multimodal import media_from_documents, resize_images

    media = media_from_documents(_t(spark, sf_dir, "documents"))
    return resize_images(media, box_w=64, box_h=48).select(
        "media_id", "orig_width", "orig_height",
        "out_width", "out_height", "n_bytes_out",
    )


@_q(
    "mm_frame_sample",
    """
    SELECT doc_id AS media_id,
           unnest(range(0, n_chars + 1, 1000)) AS frame_offset_ms
    FROM documents WHERE doc_id % 3 = 2
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import frame_sample_plan, media_from_documents

    media = media_from_documents(_t(spark, sf_dir, "documents"))
    return frame_sample_plan(media, every_ms=1000)


# --------------------------------------------------------------------------
# G6 — Grafana annotations query: events-in-range + formatted title/text
# (reference rg.py:331-348; combines G2 range filter + P12 anchor + P13 wrap)
# --------------------------------------------------------------------------
@_q(
    "g6_annotations",
    """
    SELECT event_id, ts::TIMESTAMP AS ts,
           printf('<a target="_blank" href="https://github.com/%s/pull/%d">#%d</a>',
                  'RIOT-OS/RIOT', event_id, event_id) AS title,
           replace(
             list_reduce(
               list_concat([''], regexp_split_to_array(trim(event_type || ' by user ' || user_id), '\\s+')),
               (acc, w) -> CASE
                 WHEN acc = '' THEN w
                 WHEN length(str_split(acc, chr(10))[-1]) + length(w) + 1 <= 12
                   THEN acc || ' ' || w
                 ELSE acc || chr(10) || w END),
             chr(10), '<br>') AS description
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
      AND event_type = 'error'
    """,
)
def g6_annotations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalars import greedy_wrap
    from ..operators.timeseries import annotations

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    return annotations(
        ev,
        ts="ts",
        start="2024-01-10 00:00:00",
        end="2024-01-20 00:00:00",
        projection=[
            F.col("event_id"),
            F.col("ts"),
            html_pr_anchor(F.col("event_id")).alias("title"),
            greedy_wrap(
                F.concat(F.col("event_type"), F.lit(" by user "), F.col("user_id")),
                width=12,
            ).alias("description"),
        ],
    )


# --------------------------------------------------------------------------
# P7 — RFC-2822 Last-Modified parse (reference rg.py:101, bug-corrected):
# round-trip through a formatted header string, compared as epoch-micros.
# --------------------------------------------------------------------------
@_q(
    "p7_parse_rfc2822",
    """
    SELECT event_id,
           epoch_us(strptime(strftime(ts::TIMESTAMP, '%a, %d %b %Y %H:%M:%S') || ' GMT',
                             '%a, %d %b %Y %H:%M:%S %Z')) AS parsed_us
    FROM events
    """,
)
def p7_parse_rfc2822(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalars import parse_rfc2822

    ev = _t(spark, sf_dir, "events")
    header = F.concat(
        F.date_format("ts", "EEE, dd MMM yyyy HH:mm:ss"), F.lit(" GMT")
    )
    return ev.select(
        "event_id", F.unix_micros(parse_rfc2822(header)).alias("parsed_us")
    )


# --------------------------------------------------------------------------
# Text: rolling-hash fingerprint + corpus vocabulary profile
# --------------------------------------------------------------------------
@_q(
    "text_rolling_fingerprint",
    """
    SELECT doc_id,
           list_reduce(
             list_concat([0::BIGINT],
               list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
                              t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
    FROM documents
    """,
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import rolling_fingerprint

    return _t(spark, sf_dir, "documents").select(
        "doc_id", rolling_fingerprint("text").alias("fingerprint")
    )


@_q(
    "text_top_terms",
    """
    WITH tok AS (
      SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents
    ), cnt AS (
      SELECT lang, tok, count(*) AS n FROM tok GROUP BY 1, 2
    )
    SELECT lang, tok, n, rank FROM (
      SELECT lang, tok, n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok ASC) AS rank
      FROM cnt
    ) WHERE rank <= 5
    """,
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import top_terms_per_group

    return top_terms_per_group(_t(spark, sf_dir, "documents"), "lang", "text", k=5)


# --------------------------------------------------------------------------
# IVF similarity: per-cell centroids + route-then-search ANN
# --------------------------------------------------------------------------
_DUCK_CENTROIDS = """
    cents AS (
      SELECT label, pos,
             CAST(sum(CAST(round(embedding[pos]::DOUBLE, 6) AS DECIMAL(18,6)))
                  AS DOUBLE) / count(*) AS centroid
      FROM embeddings, (SELECT unnest(range(1, 65)) AS pos) p
      GROUP BY label, pos
    )
"""


@_q(
    "emb_label_centroids",
    f"WITH {_DUCK_CENTROIDS} SELECT label, pos::BIGINT AS pos, centroid FROM cents",
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import label_centroids

    return label_centroids(_t(spark, sf_dir, "embeddings")).select(
        "label", F.col("pos").cast("long").alias("pos"), "centroid"
    )


@_q(
    "ann_ivf_topk",
    f"""
    WITH {_DUCK_CENTROIDS},
    cent_arr AS (
      SELECT label, list(centroid ORDER BY pos) AS cvec FROM cents GROUP BY label
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
    routed AS (
      SELECT query_id, qv, label FROM (
        SELECT q.query_id, q.qv, c.label,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 round(list_dot_product(q.qv::DOUBLE[], c.cvec) /
                   (sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])) *
                    sqrt(list_dot_product(c.cvec, c.cvec))), 6) DESC,
                 c.label ASC) AS rn
        FROM q CROSS JOIN cent_arr c
      ) WHERE rn = 1
    ),
    pairs AS (
      SELECT r.query_id, e.vec_id, {_DUCK_COSINE.replace("q.qv", "r.qv").replace("c.embedding", "e.embedding")} AS score
      FROM embeddings e JOIN routed r ON e.label = r.label AND e.vec_id != r.query_id
    )
    SELECT query_id, vec_id AS neighbor_id, score, rank::INTEGER AS rank FROM (
      SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
      FROM pairs
    ) WHERE rank <= 5
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@_q(
    "ann_ivf_multiprobe",
    f"""
    WITH {_DUCK_CENTROIDS},
    cent_arr AS (
      SELECT label, list(centroid ORDER BY pos) AS cvec FROM cents GROUP BY label
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
    routed AS (
      SELECT query_id, qv, label FROM (
        SELECT q.query_id, q.qv, c.label,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 round(list_dot_product(q.qv::DOUBLE[], c.cvec) /
                   (sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])) *
                    sqrt(list_dot_product(c.cvec, c.cvec))), 6) DESC,
                 c.label ASC) AS rn
        FROM q CROSS JOIN cent_arr c
      ) WHERE rn <= 2
    ),
    pairs AS (
      SELECT r.query_id, e.vec_id, {_DUCK_COSINE.replace("q.qv", "r.qv").replace("c.embedding", "e.embedding")} AS score
      FROM embeddings e JOIN routed r ON e.label = r.label AND e.vec_id != r.query_id
    )
    SELECT query_id, vec_id AS neighbor_id, score, rank::INTEGER AS rank FROM (
      SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
      FROM pairs
    ) WHERE rank <= 5
    """,
)
def ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-probe IVF ANN — same route-then-search plan as ann_ivf_topk but
    each query scans its TWO nearest cells (operators.similarity.ivf_topk
    probes=2). The probed union is exact SQL (cells are disjoint), so unlike
    the recall report this variant is fully oracle-paired. The corpus-side
    plan is identical to 1-probe — only the broadcast routing frame grows by
    p — which is exactly why probes is the cheap recall knob at 100 TB."""
    from ..operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, probes=2)


# --------------------------------------------------------------------------
# Skew-resistant join (salting) — result must equal the plain join
# --------------------------------------------------------------------------
@_q(
    "j_salted_skew",
    f"""
    SELECT l.l_orderkey, l.l_linenumber, o.o_custkey,
           l.l_extendedprice * (1 - l.l_discount) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def j_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import salted_join

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    return salted_join(li, orders, on="l_orderkey", salt_buckets=8).select(
        "l_orderkey",
        "l_linenumber",
        "o_custkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


# --------------------------------------------------------------------------
# TPC-H Q1-style pricing rollup — the canonical partial-aggregable scan-agg
# --------------------------------------------------------------------------
@_q(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS {DEC})) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
             AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(3,2)))
                    * (1 + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE)
             AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-06-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2024-06-01 00:00:00")
    )
    # All money math in the decimal domain: the raw doubles are 2-decimal
    # values, so the casts are unambiguous and every product/sum is EXACT —
    # per-row double rounding (even round-then-cast) diverges between
    # engines at the last ulp and fails the value-hash gate.
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc_price = price * (F.lit(1) - F.col("l_discount").cast("decimal(3,2)"))
    charge = disc_price * (F.lit(1) + F.col("l_tax").cast("decimal(3,2)"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        F.count("*").alias("count_order"),
    )


# --------------------------------------------------------------------------
# Composite: training-corpus selection (quality + lang-ID + exact dedup in
# ONE plan — the end-to-end curation pipeline, plans/corpus.py)
# --------------------------------------------------------------------------
def _corpus_oracle() -> str:
    score_cols, best_lang = _langid_fold()
    stoplist = _duck_stoplist(
        ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    )
    return f"""
    WITH base AS (
      SELECT doc_id, lang, text,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ), scored AS (
      SELECT doc_id, lang, text, toks,
           {score_cols}
      FROM base
    ), stats AS (
      SELECT *,
             len(toks)::BIGINT AS n_tokens,
             CASE WHEN len(text) > 0
                  THEN len(regexp_extract_all(text, '[.,!?;:]'))::DOUBLE / len(text)
                  ELSE 0.0 END AS punct_ratio,
             CASE WHEN len(toks) > 0
                  THEN len(list_filter(toks, tk -> list_contains({stoplist}, tk)))::DOUBLE
                       / len(toks)
                  ELSE 0.0 END AS stopword_ratio
      FROM scored
    ), qq AS (
      SELECT *,
             greatest(
               (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.5 ELSE 0.0 END)
               + least(stopword_ratio * 2, 0.3)
               - least(punct_ratio * 5, 0.2), 0.0) AS quality_score,
             {best_lang} AS predicted_lang,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
      FROM stats
    ), canon AS (
      SELECT *, min(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id FROM qq
    )
    SELECT doc_id, lang, predicted_lang, n_tokens, quality_score
    FROM canon
    WHERE quality_score >= 0.5 AND predicted_lang = 'en' AND doc_id = canonical_id
    """


@_q("corpus_select", _corpus_oracle())
def corpus_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .corpus import select_training_corpus

    return select_training_corpus(
        _t(spark, sf_dir, "documents"), lang="en", min_quality=0.5
    )


# --------------------------------------------------------------------------
# Grouping sets / rollup — multi-level dashboard totals in one pass
# --------------------------------------------------------------------------
@_q(
    "g1_rollup_totals",
    f"""
    SELECT event_type, user_id % 10 AS user_bucket,
           count(*) AS n,
           CAST(sum(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY ROLLUP (event_type, user_id % 10)
    """,
)
def g1_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(type, user-bucket), per-type, and grand totals in ONE pass —
    ``rollup`` plans as a single expand+aggregate (partial-aggregable), not
    three queries; the Grafana multi-panel totals idiom."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("user_bucket", F.col("user_id") % 10)
        .rollup("event_type", "user_bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# Data profiling — per-column stats in one pass (pipeline health checks)
# --------------------------------------------------------------------------
_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


def _profile_oracle() -> str:
    parts = [
        f"""
        SELECT '{c}' AS "column", count({c}) AS n,
               count(*) - count({c}) AS n_null,
               count(DISTINCT {c}) AS n_distinct,
               min({c})::VARCHAR AS min_value,
               max({c})::VARCHAR AS max_value
        FROM orders
        """
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts)


@_q("profile_orders", _profile_oracle())
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile_columns

    # exact=True: the DuckDB oracle computes count(DISTINCT ...); the
    # 100-TB default is the approx (HLL++) path, tested separately.
    return profile_columns(_t(spark, sf_dir, "orders"), list(_PROFILE_COLS), exact=True)


# --------------------------------------------------------------------------
# Corpus curation: PII redaction, contamination, sampling, mixing, packing
# --------------------------------------------------------------------------
#: Deterministic PII injected into the synthetic docs so the redaction
#: regexes are genuinely exercised (the fixture text contains none).
_PII_SUFFIX_SPARK = (
    "concat(text, ' reach u', cast(doc_id as string), "
    "'@mail.example.com ip 10.0.', cast(doc_id % 256 as string), "
    "'.7 ssn 123-45-6789 tel 555-867-5309')"
)
_PII_SUFFIX_DUCK = (
    "text || ' reach u' || doc_id::VARCHAR || "
    "'@mail.example.com ip 10.0.' || (doc_id % 256)::VARCHAR || "
    "'.7 ssn 123-45-6789 tel 555-867-5309'"
)


def _pii_oracle() -> str:
    from ..operators.curation import PII_PATTERNS

    # Sequential semantics: each rule counts matches in (and rewrites) the
    # output of the previous rule — identical to operators.curation.redact_pii.
    sql = f"WITH s0 AS (SELECT doc_id, {_PII_SUFFIX_DUCK} AS t0 FROM documents)"
    for i, (pat, tag) in enumerate(PII_PATTERNS):
        # DuckDB single-quoted strings are backslash-literal — pass the
        # regex through untouched, only SQL-escape quotes.
        esc = pat.replace("'", "''")
        carry = "".join(f"c{j}, " for j in range(i))
        sql += f""",
    s{i + 1} AS (
      SELECT doc_id, {carry}
             regexp_replace(t{i}, '{esc}', '{tag}', 'g') AS t{i + 1},
             len(regexp_extract_all(t{i}, '{esc}', 0)) AS c{i}
      FROM s{i})"""
    n = len(PII_PATTERNS)
    total = " + ".join(f"c{i}" for i in range(n))
    return (
        sql
        + f" SELECT doc_id, t{n} AS clean_text, ({total})::BIGINT AS n_redacted"
        f" FROM s{n}"
    )


@_q("pii_redact", _pii_oracle())
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import redact_pii

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PII_SUFFIX_SPARK).alias("dirty")
    )
    clean, n = redact_pii("dirty")
    return docs.select(
        "doc_id", clean.alias("clean_text"), n.alias("n_redacted")
    )


@_q(
    "contamination_check",
    f"""
    WITH docs AS (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents),
    grams AS (SELECT doc_id, unnest({_DUCK_SHINGLES}) AS g FROM docs),
    ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
    tr AS (SELECT doc_id, g FROM grams WHERE doc_id % 97 != 0),
    shared AS (
      SELECT tr.doc_id, count(*) AS n_shared_ngrams
      FROM tr JOIN ev USING (g) GROUP BY tr.doc_id
    )
    SELECT d.doc_id,
           coalesce(s.n_shared_ngrams, 0) AS n_shared_ngrams,
           coalesce(s.n_shared_ngrams, 0) >= 5 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 97 != 0) d
    LEFT JOIN shared s USING (doc_id)
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import contamination_check as check

    docs = _t(spark, sf_dir, "documents")
    return check(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
        threshold=5,
    )


@_q(
    "cap_per_source",
    """
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 14))::BIGINT,
                        doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 15
    """,
)
def cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import cap_per_group

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return cap_per_group(docs, k=15)


_SAMPLE_RATES = {"en": 150, "de": 400, "es": 400, "fr": 400, "zh": 400}


@_q(
    "sample_stratified",
    f"""
    SELECT doc_id, lang, source,
           ('0x' || substr(md5(doc_id::VARCHAR), 1, 14))::BIGINT % 1000
             AS sample_bucket
    FROM documents
    WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 14))::BIGINT % 1000
          < CASE lang {" ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_SAMPLE_RATES.items()))} ELSE 0 END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import stratified_hash_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return stratified_hash_sample(docs, _SAMPLE_RATES)


@_q(
    "mixture_weights",
    """
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang)
    SELECT lang, n,
           n::DOUBLE / sum(n) OVER () AS actual_share,
           1.0 / count(*) OVER () AS target_share,
           (1.0 / count(*) OVER ()) / (n::DOUBLE / sum(n) OVER ()) AS weight
    FROM c
    """,
)
def mixture_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import mixture_weights

    return mixture_weights(_t(spark, sf_dir, "documents"))


@_q(
    "pack_sequences",
    f"""
    WITH t AS (
      SELECT lang, doc_id, len({_DUCK_WORDS})::BIGINT AS n_tokens
      FROM documents
    ), w AS (
      -- sum(BIGINT) OVER is HUGEINT in DuckDB; pin every leg to BIGINT so
      -- the driver's value-hash sees int64 on both engines.
      SELECT *, coalesce(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS before
      FROM t
    )
    SELECT lang, doc_id, n_tokens,
           (before // 512)::BIGINT AS pack_id,
           (before % 512)::BIGINT AS pack_offset
    FROM w
    """,
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import pack_sequences
    from ..operators.textstats import token_count

    docs = _t(spark, sf_dir, "documents").select(
        "lang", "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    return pack_sequences(docs, budget=512, token_col="n_tokens")


@_q(
    "token_fertility_by_lang",
    f"""
    WITH d AS (
      SELECT lang, len({_DUCK_WORDS})::BIGINT AS n_tok,
             length(text)::BIGINT AS n_chars
      FROM documents
    )
    SELECT lang, count(*)::BIGINT AS n_docs,
           sum(n_tok)::BIGINT AS total_tokens,
           sum(n_chars)::BIGINT AS total_chars,
           round(sum(n_chars)::DOUBLE / sum(n_tok), 6) AS chars_per_token,
           median(n_tok)::DOUBLE AS median_tokens
    FROM d GROUP BY lang
    """,
)
def token_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility report: chars-per-token and token-count medians
    per language — the table that says which strata eat the training
    budget (high-fertility languages cost more tokens per char). One
    partial-aggregable shuffle."""
    from ..operators.textstats import token_count

    d = _t(spark, sf_dir, "documents").select(
        "lang",
        token_count("text").cast("long").alias("n_tok"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("n_tok"), 6
        ).alias("chars_per_token"),
        F.median("n_tok").alias("median_tokens"),
    )


@_q(
    "pack_utilization",
    f"""
    WITH t AS (
      SELECT lang, doc_id, len({_DUCK_WORDS})::BIGINT AS n_tokens
      FROM documents
    ), w AS (
      SELECT *, coalesce(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS before
      FROM t
    )
    SELECT lang, (max(before // 512) + 1)::BIGINT AS n_packs,
           sum(n_tokens)::BIGINT AS total_tokens,
           round(sum(n_tokens)::DOUBLE / ((max(before // 512) + 1) * 512), 6)
             AS utilization
    FROM w GROUP BY lang
    """,
)
def pack_utilization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pack efficiency: packs used and token utilization per
    stratum (tokens ÷ pack capacity) — the budget check run after
    pack_sequences before a training export."""
    from ..operators.curation import pack_sequences
    from ..operators.textstats import token_count

    docs = _t(spark, sf_dir, "documents").select(
        "lang", "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    packed = pack_sequences(docs, budget=512, token_col="n_tokens")
    return packed.groupBy("lang").agg(
        (F.max("pack_id") + 1).cast("long").alias("n_packs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(
            F.sum("n_tokens").cast("double")
            / ((F.max("pack_id") + 1) * 512),
            6,
        ).alias("utilization"),
    )


# --------------------------------------------------------------------------
# Q3-style shipping priority: 3-way join + agg + deterministic top-k.
# Exercises Catalyst join reordering + AQE broadcast of the filtered
# customer dim; revenue sums in the decimal domain (see q1 note).
# --------------------------------------------------------------------------
_Q3_CUT = "1998-06-01 00:00:00"


@_q(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           (sum((l_extendedprice::DECIMAL(12,2)) *
                (1 - l_discount::DECIMAL(3,2))))::DOUBLE AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '{_Q3_CUT}'
      AND l_shipdate > TIMESTAMP '{_Q3_CUT}'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_CUT)
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_CUT)
    )
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Snapshot diff, pivot, decile binning — table-health / reshaping surface
# --------------------------------------------------------------------------
#: Deterministic synthetic churn over orders: %11 keys exist only in the
#: new snapshot (added), %13 only in the old (removed), %17 get a value
#: edit (changed). Non-multiples of all three are unchanged and dropped.
_OLD_ORDERS_SPARK = lambda df: df.filter(F.col("o_orderkey") % 11 != 0)  # noqa: E731
_NEW_ORDERS_SPARK = lambda df: df.filter(F.col("o_orderkey") % 13 != 0).withColumn(  # noqa: E731
    "o_orderpriority",
    F.when(F.col("o_orderkey") % 17 == 0, F.lit("X-CHANGED")).otherwise(
        F.col("o_orderpriority")
    ),
)


@_q(
    "snapshot_diff_orders",
    """
    WITH old AS (SELECT * FROM orders WHERE o_orderkey % 11 != 0),
    new AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
             CASE WHEN o_orderkey % 17 = 0 THEN 'X-CHANGED'
                  ELSE o_orderpriority END AS o_orderpriority
      FROM orders WHERE o_orderkey % 13 != 0
    )
    SELECT * FROM (
      SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             CASE WHEN o.o_orderkey IS NULL THEN 'added'
                  WHEN n.o_orderkey IS NULL THEN 'removed'
                  WHEN o.o_custkey IS DISTINCT FROM n.o_custkey
                    OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                    OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                    OR o.o_orderdate IS DISTINCT FROM n.o_orderdate
                    OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
                  THEN 'changed' END AS status
      FROM old o FULL JOIN new n ON o.o_orderkey = n.o_orderkey
    ) WHERE status IS NOT NULL
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import snapshot_diff

    orders = _t(spark, sf_dir, "orders")
    return snapshot_diff(
        _OLD_ORDERS_SPARK(orders), _NEW_ORDERS_SPARK(orders), ["o_orderkey"]
    )


_PIVOT_LANGS = ("de", "en", "es", "fr", "zh")


@_q(
    "pivot_source_lang",
    f"""
    SELECT source,
           {", ".join(f"count(*) FILTER (lang = '{l}') AS {l}" for l in _PIVOT_LANGS)}
    FROM documents GROUP BY source
    """,
)
def pivot_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    wide = (
        docs.groupBy("source")
        .pivot("lang", list(_PIVOT_LANGS))
        .agg(F.count(F.lit(1)))
    )
    # pivot yields NULL for absent (source, lang) combos; counts mean 0
    return wide.select(
        "source",
        *[F.coalesce(F.col(l), F.lit(0)).alias(l) for l in _PIVOT_LANGS],
    )


def _deciles_oracle() -> str:
    quality = ORACLES["text_quality_scores"]
    return f"""
    WITH q AS ({quality})
    SELECT d.lang, q.doc_id,
           ntile(10) OVER (
             PARTITION BY d.lang ORDER BY q.quality_score, q.doc_id
           ) AS decile
    FROM q JOIN documents d USING (doc_id)
    """


@_q("quality_deciles", _deciles_oracle())
def quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import quality_score

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    scored = quality_score(docs)
    return scored.select(
        "lang",
        "doc_id",
        F.ntile(10)
        .over(
            Window.partitionBy("lang").orderBy(
                F.col("quality_score"), F.col("doc_id")
            )
        )
        .alias("decile"),
    )


# --------------------------------------------------------------------------
# J5: banded range join — no equi-key, interval-overlap semantics
# --------------------------------------------------------------------------
@_q(
    "j5_range_join_ship_week",
    """
    WITH iv AS (SELECT * FROM orders WHERE o_orderkey % 100 = 0),
    m AS (
      SELECT o.o_orderkey, count(*) AS n
      FROM iv o JOIN lineitem l
        ON l.l_shipdate >= o.o_orderdate
       AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
      GROUP BY o.o_orderkey
    )
    SELECT o.o_orderkey, coalesce(m.n, 0) AS n_ship_in_week
    FROM iv o LEFT JOIN m USING (o_orderkey)
    """,
)
def j5_range_join_ship_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many lineitems (any order's) shipped inside each order's first
    week — a pure interval×point join with no join key. The banded plan
    hash-joins on the 7-day band instead of nested-loop comparing all
    orders × all lineitems."""
    from ..operators.rangejoin import interval_point_join

    # sparse interval set: the matched-pair cardinality is
    # |intervals| x (points per window), so the interval side of an
    # interval-overlap report should be a dimension-sized selection
    iv_orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 100 == 0
    )
    orders = iv_orders.select(
        "o_orderkey",
        F.col("o_orderdate").alias("w_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("w_end"),
    )
    li = _t(spark, sf_dir, "lineitem").select("l_shipdate")
    matched = interval_point_join(
        orders, li, "w_start", "w_end", "l_shipdate", band_seconds=7 * 86400
    )
    counts = matched.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        iv_orders.select("o_orderkey")
        .join(counts, "o_orderkey", "left")
        .select(
            "o_orderkey", F.coalesce("n", F.lit(0)).alias("n_ship_in_week")
        )
    )


# Registered WITHOUT an oracle (rows-only driver check): sketches are
# engine-specific approximations — Spark's HLL++ and DuckDB's approx_*
# legitimately disagree. The exact twins (profile_orders, g4_percentiles,
# g7_distinct_tags) carry the hash-checked semantics; this entry is the
# 100 TB scale path where exact distinct/quantiles stop being affordable.
# Output shape: the quantile array is posexploded to one scalar row per
# (l_returnflag, quantile) so every column is a sortable scalar — the
# driver canonicalizer (pandas sort_values) cannot hash array cells.
@_q("sketch_stats")
def sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("nd_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("nd_parts"),
        F.percentile_approx(
            "l_extendedprice", [0.5, 0.95, 0.99], 10000
        ).alias("price_quantiles"),
    )
    return agg.select(
        "l_returnflag",
        "nd_orders",
        "nd_parts",
        F.posexplode("price_quantiles").alias("quantile_pos", "price_value"),
    ).select(
        "l_returnflag",
        F.element_at(
            F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)),
            F.col("quantile_pos") + 1,
        ).alias("quantile"),
        "nd_orders",
        "nd_parts",
        "price_value",
    )


# --------------------------------------------------------------------------
# TPC-H-family analytics: the delegated "Grafana dashboard over a star
# schema" surface at its most join/agg-heavy. These are the scale-posture
# showcases: dimension pruning before fact joins, pushed-down scans, and
# partial aggregation everywhere.
# --------------------------------------------------------------------------
@_q(
    "q5_regional_revenue",
    """
    SELECT n_name,
           (sum((l_extendedprice::DECIMAL(12,2)) *
                (1 - l_discount::DECIMAL(3,2))))::DOUBLE AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier share
    the nation, restricted to one region and one order year.

    Scale plan: the region filter is applied to the 25-row nation dim
    FIRST and broadcast into customer and supplier, so both are pruned to
    1/5 of their rows before touching the facts; the only big shuffles are
    lineitem⋈orders and the custkey join. The final groupBy key is 5-ary —
    pure partial aggregation."""
    asia = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(asia), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(asia.select("n_nationkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_nationkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@_q(
    "q6_forecast_revenue",
    """
    SELECT (sum((l_extendedprice::DECIMAL(12,2)) *
                (l_discount::DECIMAL(3,2))))::DOUBLE AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-table filtered aggregate. The entire query is
    a scan — every predicate (shipdate range, discount band, quantity cap)
    must reach the parquet reader as a pushed filter, and the aggregate is
    one partial-aggregable reduce to a single row. At 100 TB this is the
    pattern where pushdown + row-group statistics skip most of the I/O;
    a plan-shape test asserts the filters land scan-side."""
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * F.col(
        "l_discount"
    ).cast("decimal(3,2)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_q(
    "q18_large_orders",
    """
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           sum(l_quantity) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose orders exceed a total-quantity
    threshold. The HAVING subquery becomes a partial-aggregable pre-agg on
    lineitem whose tiny survivor set (~0.1% of orders) is broadcast as a
    semi-join filter into both facts — orders and lineitem are pruned
    before the expensive joins, not after."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 300)
        .select("l_orderkey")
    )
    orders = _t(spark, sf_dir, "orders").join(
        F.broadcast(big),
        F.col("o_orderkey") == F.col("l_orderkey"),
        "left_semi",
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(
            F.broadcast(big.select(F.col("l_orderkey").alias("_bk"))),
            F.col("l_orderkey") == F.col("_bk"),
            "left_semi",
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(F.sum("l_quantity").alias("total_qty"))
    )


@_q(
    "corr_max_acctbal_per_nation",
    """
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer c
    WHERE c_acctbal = (SELECT max(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def corr_max_acctbal_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL surface: the customer(s)
    holding each nation's maximum balance. Catalyst's
    ``RewriteCorrelatedScalarSubquery`` turns the per-row subquery into one
    aggregate + join — no nested-loop re-execution — which is the rewrite
    the reference leaned on InfluxQL/Grafana to never need. Exercises that
    our engine's tables are reachable from ``spark.sql`` (SURVEY §7 step 1),
    not just the DataFrame API."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("corr_customer")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM corr_customer c
        WHERE c_acctbal = (SELECT max(c2.c_acctbal) FROM corr_customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


# --------------------------------------------------------------------------
# §2.5 set operations — EXCEPT / INTERSECT (the reference has none; the
# snapshot-diff operator covers keyed diffs, this covers set semantics)
# --------------------------------------------------------------------------
@_q(
    "setop_order_returns",
    """
    WITH open_o AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'),
    ret AS (SELECT DISTINCT l_orderkey AS o_orderkey FROM lineitem
            WHERE l_returnflag = 'R')
    SELECT 'open_no_return' AS bucket, o_orderkey
    FROM (SELECT * FROM open_o EXCEPT SELECT * FROM ret)
    UNION ALL
    SELECT 'open_returned' AS bucket, o_orderkey
    FROM (SELECT * FROM open_o INTERSECT SELECT * FROM ret)
    """,
)
def setop_order_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation surface: open orders split into those with vs without
    a returned lineitem, via EXCEPT / INTERSECT / UNION ALL. Both set ops
    plan as a single hash aggregate over the shuffle key (no sort), and the
    branches share the two scans via plan reuse."""
    open_o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey")
    )
    ret = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
    )
    no_ret = open_o.subtract(ret)  # EXCEPT (distinct) semantics
    with_ret = open_o.intersect(ret)
    return no_ret.select(
        F.lit("open_no_return").alias("bucket"), "o_orderkey"
    ).unionAll(
        with_ret.select(F.lit("open_returned").alias("bucket"), "o_orderkey")
    )


# --------------------------------------------------------------------------
# Fixed-bound histogram (Grafana histogram panel, delegated in reference)
# --------------------------------------------------------------------------
@_q(
    "hist_order_totalprice",
    """
    WITH b AS (
      SELECT greatest(0, least(19,
               floor((o_totalprice - 0.0) / 25000.0)))::INTEGER AS bucket,
             o_totalprice
      FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT bucket,
           0.0 + bucket * 25000.0 AS edge_lo,
           0.0 + (bucket + 1) * 25000.0 AS edge_hi,
           count(*) AS n,
           min(o_totalprice) AS bucket_min,
           max(o_totalprice) AS bucket_max
    FROM b GROUP BY bucket
    """,
)
def hist_order_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bucket equi-width histogram of order totals on fixed [0, 500k)
    bounds — one scan, one ≤20-ary partial-aggregable shuffle."""
    from ..operators.profile import fixed_histogram

    return fixed_histogram(
        _t(spark, sf_dir, "orders"), "o_totalprice", 0.0, 500_000.0, 20
    )


# --------------------------------------------------------------------------
# Duplicate-cluster assignment: connected components over near-dup pairs.
# The oracle closes the same pair graph with a recursive CTE.
# --------------------------------------------------------------------------
@_q(
    "dedup_cc_clusters",
    f"""
    WITH RECURSIVE {_DUCK_MINHASH},
    bands AS (
      SELECT doc_id, j // 4 AS band,
             string_agg(minhash::VARCHAR, '-' ORDER BY j) AS band_key
      FROM sig GROUP BY doc_id, j // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    shin AS (SELECT doc_id, {_DUCK_SHINGLES} AS s FROM docs),
    ver AS (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(sa.s, sb.s))::DOUBLE /
               (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))
               AS jaccard
      FROM cand c
      JOIN shin sa ON sa.doc_id = c.doc_a
      JOIN shin sb ON sb.doc_id = c.doc_b
    ),
    pairs AS (SELECT doc_a, doc_b FROM ver WHERE jaccard >= 0.8),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
    )
    SELECT id, min(r) AS component_id FROM reach GROUP BY id
    """,
)
def dedup_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters via the full scale pipeline: MinHash-LSH candidate
    pairs → row-local exact-Jaccard verification (≥0.8) → connected
    components by min-label propagation. Keeping one doc per component_id
    is the "collapse duplicate families" step — pairwise dedup alone
    under-removes chains (A~B, B~C but not A~C). No stage is quadratic in
    the corpus: candidates come from band-bucket joins, verification costs
    |candidates|, and propagation shuffles only the (tiny) edge list.
    Iterative with a per-round action, which is why the oracle is a
    recursive CTE rather than plain SQL."""
    from ..operators.dedup import (
        connected_components,
        jaccard_verify_pairs,
        minhash_lsh_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(docs)
    verified = jaccard_verify_pairs(docs, cand, threshold=0.8)
    return connected_components(verified)


@_q(
    "dedup_cluster_size_hist",
    f"""
    WITH RECURSIVE {_DUCK_MINHASH},
    bands AS (
      SELECT doc_id, j // 4 AS band,
             string_agg(minhash::VARCHAR, '-' ORDER BY j) AS band_key
      FROM sig GROUP BY doc_id, j // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    shin AS (SELECT doc_id, {_DUCK_SHINGLES} AS s FROM docs),
    ver AS (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(sa.s, sb.s))::DOUBLE /
               (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))
               AS jaccard
      FROM cand c
      JOIN shin sa ON sa.doc_id = c.doc_a
      JOIN shin sb ON sb.doc_id = c.doc_b
    ),
    pairs AS (SELECT doc_a, doc_b FROM ver WHERE jaccard >= 0.8),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
    ),
    comp AS (SELECT id, min(r) AS component_id FROM reach GROUP BY id),
    sizes AS (SELECT component_id, count(*)::BIGINT AS cluster_size
              FROM comp GROUP BY component_id)
    SELECT cluster_size, count(*)::BIGINT AS n_clusters,
           (cluster_size * count(*))::BIGINT AS n_docs,
           ((cluster_size - 1) * count(*))::BIGINT AS n_removable
    FROM sizes GROUP BY cluster_size
    """,
)
def dedup_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup governance histogram: how many near-dup families exist at each
    size, and how many docs keep-one-per-cluster would remove — the
    before/after budget a dedup run reports. Two partial-aggregable
    groupBys over the (tiny) component assignment; a fat tail here is the
    boilerplate-chaining warning `dedup_graph_degrees` drills into."""
    from ..operators.dedup import (
        connected_components,
        jaccard_verify_pairs,
        minhash_lsh_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    comp = connected_components(
        jaccard_verify_pairs(docs, minhash_lsh_pairs(docs), threshold=0.8)
    )
    sizes = comp.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).alias("n_docs"),
        ((F.col("cluster_size") - 1) * F.count(F.lit(1))).alias("n_removable"),
    )


@_q(
    "dedup_cc_clusters_star",
    # identical oracle body to dedup_cc_clusters: the two operators must
    # agree with the recursive-CTE transitive closure, and with each other
    f"""
    WITH RECURSIVE {_DUCK_MINHASH},
    bands AS (
      SELECT doc_id, j // 4 AS band,
             string_agg(minhash::VARCHAR, '-' ORDER BY j) AS band_key
      FROM sig GROUP BY doc_id, j // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    shin AS (SELECT doc_id, {_DUCK_SHINGLES} AS s FROM docs),
    ver AS (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(sa.s, sb.s))::DOUBLE /
               (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))
               AS jaccard
      FROM cand c
      JOIN shin sa ON sa.doc_id = c.doc_a
      JOIN shin sb ON sb.doc_id = c.doc_b
    ),
    pairs AS (SELECT doc_a, doc_b FROM ver WHERE jaccard >= 0.8),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
    )
    SELECT id, min(r) AS component_id FROM reach GROUP BY id
    """,
)
def dedup_cc_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same pipeline as dedup_cc_clusters with the billion-edge clustering
    path: large-star/small-star contraction (dedup.connected_components_star)
    instead of min-label propagation — O(log² n) rounds on deep components
    vs O(diameter). Both operators are property-tested equal on random
    graphs; this entry pins the star variant to the external oracle too."""
    from ..operators.dedup import (
        connected_components_star,
        jaccard_verify_pairs,
        minhash_lsh_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(docs)
    verified = jaccard_verify_pairs(docs, cand, threshold=0.8)
    return connected_components_star(verified)


# Rows-only (no SQL oracle): EWMA is a genuinely sequential recursion
# (e_t depends on e_{t-1}); the closed-form SQL rewrite overflows float64
# on long series, so there is no faithful ANSI-SQL twin. Semantics are
# unit-tested against the hand recursion (test_graph_and_hist).
@_q("ts_ewma")
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL exponential_moving_average(value, 0.3) per event_type via
    grouped applyInPandas — the one sequential-per-series operator
    (operators.timeseries.ewma)."""
    from ..operators.timeseries import ewma

    ev = _t(spark, sf_dir, "events")
    return ewma(
        ev, dims=["event_type"], ts="ts", value="value", alpha=0.3,
        tiebreak="event_id",
    )


def _ewma_window_oracle(alpha: str = "0.3", k: int = 8) -> str:
    """Unrolled SQL twin of operators.timeseries.ewma_window: k lag()
    columns, 12dp DECIMAL weights, decimal accumulators, one final
    float64 ratio — byte-identical arithmetic to the Spark plan."""
    from decimal import Decimal

    a = Decimal(alpha)
    q = Decimal("1.000000000000")
    ws = [((a * (1 - a) ** i) * q).quantize(q) for i in range(k)]
    lag_cols = ",\n             ".join(
        f"lag(value, {i}) OVER w AS x{i}" for i in range(1, k)
    )
    xs = ["value"] + [f"x{i}" for i in range(1, k)]
    num = " + ".join(
        f"(CASE WHEN {x} IS NOT NULL THEN {x}::DECIMAL(18,6) "
        f"ELSE 0::DECIMAL(18,6) END) * {w}::DECIMAL(14,12)"
        for x, w in zip(xs, ws)
    )
    den = " + ".join(
        f"(CASE WHEN {x} IS NOT NULL THEN {w}::DECIMAL(14,12) "
        f"ELSE 0::DECIMAL(14,12) END)"
        for x, w in zip(xs, ws)
    )
    return f"""
    WITH lagged AS (
      SELECT event_type, ts::TIMESTAMP AS ts, event_id, value,
             {lag_cols}
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_type, ts, event_id, value,
           round(CAST(({num}) AS DOUBLE) / CAST(({den}) AS DOUBLE), 6)
             AS ewma_w
    FROM lagged
    """


@_q("ts_ewma_window", _ewma_window_oracle())
def ts_ewma_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-term truncated EWMA (α=0.3) per event_type — the hash-checkable
    closed form of ts_ewma (operators.timeseries.ewma_window): lag-window
    weighted sum in decimal, whole-stage codegen, one shuffle on the
    series key."""
    from ..operators.timeseries import ewma_window

    ev = _t(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    return ewma_window(
        ev, dims=["event_type"], ts="ts", value="value", alpha=0.3, k=8,
        tiebreak="event_id",
    )


# Rows-only (no SQL oracle): recall compares our own two ANN variants —
# the brute-force side already carries the hash-checked semantics
# (ann_cosine_topk); this entry reports how much the IVF approximation
# gives up AT EACH PROBE COUNT p ∈ {1, 2, 4} — the recall-vs-scan-cost
# curve is the tuning loop a 100 TB deployment actually runs.  (The
# probed result set itself IS exact SQL — ann_ivf_multiprobe carries the
# hash-checked semantics of the p=2 route.)
@_q("ann_recall_ivf")
def ann_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of IVF ANN vs exact brute force, per (probes, query vector):
    join each probe level's top-k set against the brute-force top-k on
    (query_id, neighbor_id) and count survivors. Each level is one
    broadcastable join — both sides are (queries × k) rows; the brute side
    is computed once and reused across levels."""
    from ..operators.similarity import cosine_topk, ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50)
    brute = cosine_topk(emb, q, k=5).select("query_id", "neighbor_id")
    out = None
    for p in (1, 2, 4):
        approx = ivf_topk(emb, q, k=5, probes=p).select(
            "query_id", "neighbor_id"
        )
        hits = (
            brute.join(approx, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
        level = (
            brute.select("query_id")
            .distinct()
            .join(hits, "query_id", "left")
            .select(
                F.lit(p).alias("probes"),
                "query_id",
                F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                (F.coalesce("n_hits", F.lit(0)) / F.lit(5.0)).alias(
                    "recall_at_5"
                ),
            )
        )
        out = level if out is None else out.unionByName(level)
    return out


@_q(
    "boilerplate_removal",
    """
    WITH d AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, chr(10)),
                                        x -> trim(x)),
                         x -> x <> '') AS ls
      FROM documents
    ), l AS (
      SELECT doc_id, unnest(range(1, len(ls) + 1)) AS pos, unnest(ls) AS line
      FROM d
    ), freq AS (
      SELECT line FROM (
        SELECT line, count(DISTINCT doc_id) AS nd FROM l GROUP BY line
      ) WHERE nd >= 2
    ), k AS (
      SELECT doc_id, pos, line FROM l WHERE line NOT IN (SELECT line FROM freq)
    ), r AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
             count(*) AS n_kept
      FROM k GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(r.clean_text, '') AS clean_text,
           len(d.ls) - coalesce(r.n_kept, 0) AS n_removed
    FROM d LEFT JOIN r USING (doc_id)
    """,
)
def boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document boilerplate line removal (min_docs=2). The
    driver's documents are single-line so this sweep checks the pass-
    through path end-to-end; the crafted multi-line fixtures in
    test_curation exercise actual removal, ordering, and the all-removed
    edge (operators.curation.remove_boilerplate_lines)."""
    from ..operators.curation import remove_boilerplate_lines

    return remove_boilerplate_lines(
        _t(spark, sf_dir, "documents"), min_docs=2
    )


@_q(
    "mm_audio_windows",
    """
    SELECT doc_id AS media_id,
           unnest(range(0, n_chars + 1, 250)) AS window_start_ms
    FROM documents WHERE doc_id % 3 = 1
    """,
)
def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing plumbing, oracle-checked on the Spark-owned part
    (which windows exist per media row); the RMS values from the stub
    decoder are unit-tested, not oracled — a real codec would replace them
    (operators.multimodal.audio_window_features)."""
    from ..operators.multimodal import audio_window_features, media_from_documents

    media = media_from_documents(_t(spark, sf_dir, "documents"))
    return audio_window_features(media).select("media_id", "window_start_ms")


# --------------------------------------------------------------------------
# Gopher-style repetition & quality-rule signals (Rae et al. 2021 §A1.1) —
# the standard pretraining-corpus filters beyond the length/punct/stopword
# scores already in text_quality_scores.
# --------------------------------------------------------------------------
@_q(
    "text_repetition",
    f"""
    WITH docs AS (
      SELECT doc_id, text, {_DUCK_WORDS} AS words FROM documents
    ), ln AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, chr(10)),
                                        l -> trim(l)),
                         l -> l <> '') AS ls
      FROM docs
    ), base AS (
      SELECT doc_id,
             CASE WHEN len(ls) > 0
                  THEN (len(ls) - len(list_distinct(ls)))::DOUBLE / len(ls)
                  ELSE 0.0 END AS dup_line_frac
      FROM ln
    ), grams AS (
      SELECT doc_id,
             unnest([array_to_string(words[i:i+1], ' ')
                     for i in range(1, len(words))]) AS gram
      FROM docs
    ), gc AS (
      SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY 1, 2
    ), tg AS (
      SELECT doc_id, max(cnt)::DOUBLE / sum(cnt)::DOUBLE AS top_frac
      FROM gc GROUP BY 1
    )
    SELECT b.doc_id, b.dup_line_frac,
           coalesce(tg.top_frac, 0.0) AS top_bigram_frac
    FROM base b LEFT JOIN tg USING (doc_id)
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signals: duplicate-line fraction (row-local) and
    top-2-gram token coverage (two partial-aggregable groupBys over counts,
    never text). operators.textstats.repetition_stats."""
    from ..operators.textstats import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"))


@_q(
    "text_gopher_flags",
    f"""
    WITH docs AS (
      SELECT doc_id, text, {_DUCK_WORDS} AS words,
             list_filter(list_transform(string_split(text, chr(10)),
                                        l -> trim(l)),
                         l -> l <> '') AS ls
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(words) AS n_words,
             CASE WHEN len(words) > 0
                  THEN list_sum(list_transform(words, w -> length(w)))::DOUBLE
                       / len(words)
                  ELSE 0.0 END AS mean_word_len,
             CASE WHEN len(words) > 0
                  THEN len(regexp_extract_all(text, '#|\\.\\.\\.'))::DOUBLE
                       / len(words)
                  ELSE 0.0 END AS symbol_word_ratio,
             CASE WHEN len(ls) > 0
                  THEN len(list_filter(ls,
                         l -> regexp_matches(l, '^[-*•]')))::DOUBLE / len(ls)
                  ELSE 0.0 END AS bullet_line_frac,
             CASE WHEN len(ls) > 0
                  THEN len(list_filter(ls,
                         l -> regexp_matches(l, '\\.\\.\\.$')))::DOUBLE
                       / len(ls)
                  ELSE 0.0 END AS ellipsis_line_frac,
             CASE WHEN len(words) > 0
                  THEN len(list_filter(words,
                         w -> regexp_matches(w, '[a-z]')))::DOUBLE
                       / len(words)
                  ELSE 0.0 END AS alpha_word_frac
      FROM docs
    )
    SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
           bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
           (n_words >= 10 AND mean_word_len >= 3 AND mean_word_len <= 10
            AND symbol_word_ratio < 0.1 AND bullet_line_frac < 0.9
            AND ellipsis_line_frac < 0.3 AND alpha_word_frac > 0.8)
             AS gopher_keep
    FROM m
    """,
)
def text_gopher_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule flags — all row-local Catalyst expressions in one
    projection (operators.textstats.gopher_quality_flags); the composite
    keep/drop boolean is the filter a corpus build applies before dedup."""
    from ..operators.textstats import gopher_quality_flags

    return gopher_quality_flags(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "mean_word_len",
        "symbol_word_ratio",
        "bullet_line_frac",
        "ellipsis_line_frac",
        "alpha_word_frac",
        "gopher_keep",
    )


# --------------------------------------------------------------------------
# TPC-H shapes Q4/Q10/Q14/Q19/Q22 adapted to the driver tables — each picked
# for a distinct physical-plan property at scale: existence semi-join,
# top-k after multi-join agg, broadcast conditional-agg ratio, disjunctive
# predicate pushdown, anti-join + scalar subquery.
# --------------------------------------------------------------------------
@_q(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — priority counts of orders with at least one
    late-shipping line. The EXISTS is a left-semi join: the lineitem side is
    projected to (l_orderkey, l_shipdate) before the shuffle, and the semi
    join short-circuits per key — no lineitem row survives past the match.
    The date filter prunes orders before the join."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (
        F.col("l_orderkey") == F.col("o_orderkey")
    ) & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@_q(
    "q10_returned_customers",
    """
    SELECT c_custkey, c_name, n_name, c_acctbal,
           (sum((l_extendedprice::DECIMAL(12,2)) *
                (1 - l_discount::DECIMAL(3,2))))::DOUBLE AS revenue
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — top returned-revenue customers for a half-year.
    Join order: facts filtered first (date range on orders, returnflag on
    lineitem), fact⋈fact on orderkey, then the customer and (broadcast)
    nation dims. Top-20 via TakeOrderedAndProject with custkey tiebreak."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "c_acctbal", "revenue")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@_q(
    "q14_promo_revenue",
    """
    SELECT 100.0
      * (sum(CASE WHEN p_type = 'PROMO'
                  THEN (l_extendedprice::DECIMAL(12,2)) *
                       (1 - l_discount::DECIMAL(3,2))
                  ELSE 0::DECIMAL(12,2) END))::DOUBLE
      / (sum((l_extendedprice::DECIMAL(12,2)) *
             (1 - l_discount::DECIMAL(3,2))))::DOUBLE AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — promo share of one month's revenue. part is the
    broadcast side; the month filter reaches the lineitem scan; both
    conditional and total sums ride one aggregation (single pass, map-side
    partials, one row out)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(revenue).cast("double")
            ).alias("promo_revenue")
        )
    )


@_q(
    "q19_disjunctive",
    """
    SELECT (sum((l_extendedprice::DECIMAL(12,2)) *
                (1 - l_discount::DECIMAL(3,2))))::DOUBLE AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 5 AND 20
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 40
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — disjunctive brand/size/quantity predicates. The
    OR branches mix join-side columns, so the disjunction can only be
    evaluated post-join — but Catalyst derives the implied single-side
    prefilters (brand ∈ {...} on part, quantity ∈ [min,max] on lineitem)
    and pushes those to the scans; part stays broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 15)
    ) | (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(5, 20)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#20")
        & F.col("p_size").between(20, 40)
        & F.col("l_quantity").between(20, 50)
    )
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@_q(
    "q7_nation_volume",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           year(l_shipdate) AS ship_year,
           (sum((l_extendedprice::DECIMAL(12,2)) *
                (1 - l_discount::DECIMAL(3,2))))::DOUBLE AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY cn.n_name, sn.n_name, year(l_shipdate)
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — cross-border shipping volume by (customer nation,
    supplier nation, year). Two fact joins (orders, supplier enrich via
    broadcast-able supplier dim) and two broadcast nation lookups; the
    inequality filter runs post-join on two broadcast-resolved strings.
    Aggregation is partial-aggregable on a 3-part key."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = nation.select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("_cnk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("_snk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@_q(
    "q16_supplier_counts",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_size IN (1, 14, 23, 45)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — distinct-supplier counts per part group, excluding
    a blacklisted supplier set. The NOT IN is a broadcast left-anti join on
    the key column; count(DISTINCT) expands to the standard two-phase
    (dedupe on full key, then count) aggregate, both phases partial-
    aggregable. The p_size IN-list pushes to the part scan."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size").isin(1, 14, 23, 45))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@_q(
    "q2_min_cost_supplier",
    """
    WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal AS min_acctbal
    FROM part
    JOIN supply ON l_partkey = p_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_size <= 5
      AND s_acctbal = (
        SELECT min(s2.s_acctbal) FROM supply sp2
        JOIN supplier s2 ON s2.s_suppkey = sp2.l_suppkey
        WHERE sp2.l_partkey = p_partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — per part, the supplier with the minimum account
    balance among the suppliers observed shipping it (the testdata has no
    partsupp table, so the supply relation is derived as the distinct
    (part, supplier) pairs of lineitem; SURVEY §2.3 J-family). The
    correlated MIN subquery is decorrelated by hand: one distinct on the
    pair key, a broadcast supplier enrich, then a per-part MIN window on
    the already-shuffled pair partitioning — no self-join, no second
    shuffle. The part filter prunes before the window via broadcast
    semi-join so the window only ranks surviving parts."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    supply = li.distinct()
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 5)
        .select("p_partkey", "p_brand")
    )
    w = Window.partitionBy("l_partkey")
    return (
        supply.join(
            F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("_min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("_min_bal"))
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            F.col("s_acctbal").alias("min_acctbal"),
        )
    )


@_q(
    "q8_market_share",
    """
    SELECT year(o_orderdate) AS order_year,
           ((sum(CASE WHEN sn.n_name = 'NATION_7'
                      THEN (l_extendedprice::DECIMAL(12,2)) *
                           (1 - l_discount::DECIMAL(3,2))
                      ELSE 0 END))::DOUBLE
            / (sum((l_extendedprice::DECIMAL(12,2)) *
                   (1 - l_discount::DECIMAL(3,2))))::DOUBLE) AS mkt_share
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region ON cn.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE r_name = 'EUROPE'
    GROUP BY year(o_orderdate)
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — one nation's share of a region's yearly revenue.
    The region filter folds into the broadcast nation⋈region dim before it
    touches a fact, so customers outside EUROPE are dropped at the first
    join. Both sums share one aggregation (conditional numerator); the
    ratio is computed on the exact DECIMAL sums cast to double, keeping the
    division bit-identical across engines regardless of row order."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cn = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("_cnk"))
    sn = nation.select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("_sname")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("_cnk"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("_snk"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("_sname") == "NATION_7", revenue).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.sum(revenue).cast("double")
            ).alias("mkt_share")
        )
    )


@_q(
    "q9_product_profit",
    """
    SELECT sn.n_name AS nation, year(o_orderdate) AS order_year,
           (sum((l_extendedprice::DECIMAL(12,2)) *
                (1 - l_discount::DECIMAL(3,2))
                - (p_retailprice::DECIMAL(12,2)) *
                  (l_quantity::DECIMAL(12,2)) *
                  (0.10::DECIMAL(3,2))))::DOUBLE AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY sn.n_name, year(o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — profit per supplier nation and order year for a
    part-name family. No partsupp in the testdata, so unit cost is proxied
    as 10% of p_retailprice (shape-preserving: revenue minus a
    part-dependent cost joined in from the part dim). The part name LIKE
    prunes ~90% of lineitem through a broadcast join before the orders
    shuffle; the whole cost expression stays in exact DECIMAL until the
    final cast."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey", "p_retailprice")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("nation")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    ) - F.col("p_retailprice").cast("decimal(12,2)") * F.col(
        "l_quantity"
    ).cast("decimal(12,2)") * F.lit(0.10).cast("decimal(3,2)")
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("_snk"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("order_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@_q(
    "q11_part_value_share",
    """
    WITH pv AS (
      SELECT l_partkey,
             sum((l_extendedprice::DECIMAL(12,2)) *
                 (1 - l_discount::DECIMAL(3,2))) AS value
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, value::DOUBLE AS part_value
    FROM pv
    WHERE value::DOUBLE > (SELECT (sum(value))::DOUBLE * (0.0008::DOUBLE)
                           FROM pv)
    """,
)
def q11_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — parts whose revenue exceeds a fraction of total
    revenue (derived from lineitem; the testdata has no partsupp). The
    scalar subquery over the same aggregate becomes: aggregate once, reduce
    the single-row total, broadcast it back as a cross join — the per-part
    aggregate is computed exactly once, not once per comparison. Threshold
    and operand are compared as doubles cast from the exact DECIMAL sums so
    the boundary is engine-independent."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    value = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )
    pv = li.groupBy("l_partkey").agg(F.sum(value).alias("value"))
    total = pv.agg(
        (F.sum("value").cast("double") * F.lit(0.0008)).alias("_thresh")
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value").cast("double") > F.col("_thresh"))
        .select(
            "l_partkey", F.col("value").cast("double").alias("part_value")
        )
    )


@_q(
    "q12_late_shipments",
    """
    SELECT l_linestatus,
           count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_linestatus
    """,
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — priority mix of late shipments (no
    l_receiptdate/l_shipmode in the testdata, so lateness is ship-vs-order
    date and the pivot class is l_linestatus). The join is a plain
    co-partitioned equi-join on orderkey; the cross-table date predicate
    cannot push below the join and correctly filters post-join. Conditional
    counts are one pass, both partial-aggregable."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~high, F.lit(1))).alias("low_line_count"),
        )
    )


@_q(
    "q13_customer_distribution",
    """
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — distribution of per-customer order counts,
    including zero-order customers (the left outer join's whole point).
    The join-side filter moves onto the orders scan (equivalent for a
    left-outer extra condition); the double aggregation shuffles once on
    custkey and once on the tiny count domain."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .select("o_custkey", "o_orderkey")
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@_q(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum((l_extendedprice::DECIMAL(12,2)) *
                 (1 - l_discount::DECIMAL(3,2))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue::DOUBLE AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — supplier(s) with the maximum quarterly revenue.
    The view-plus-scalar-max becomes: one partial-aggregable revenue
    aggregate, a single-row max reduced from it, broadcast back as a cross
    join, and an exact DECIMAL equality (ties all surface, as in the spec).
    The date range pushes to the lineitem scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(revenue).alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("_max"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("_max"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@_q(
    "q17_small_qty_revenue",
    """
    SELECT (sum(l_extendedprice::DECIMAL(12,2)))::DOUBLE / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — revenue from small-quantity orders of one brand,
    with a per-part average-quantity correlated subquery. Decorrelation:
    restrict lineitem to the brand's parts first (a part-attribute filter,
    so the per-part average over the restricted set is identical to the
    correlated average over all of lineitem), aggregate the per-part
    half-averages (bounded by the brand's part count → broadcast), and
    filter the same restricted set against them. The brand filter reaches
    lineitem as a broadcast join ~100× smaller than a shuffle."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    bparts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    lib = li.join(
        F.broadcast(bparts), F.col("l_partkey") == F.col("p_partkey")
    )
    stats = lib.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.avg("l_quantity") * F.lit(0.5)).alias("_half_avg")
    )
    return (
        lib.join(F.broadcast(stats), F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_half_avg"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast(
                    "double"
                )
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@_q(
    "q20_excess_suppliers",
    """
    WITH qty AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier
    JOIN qty ON l_suppkey = s_suppkey
    JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE '%red%' AND sq > 50
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — suppliers who shipped an excess quantity of a
    part-name family in one year (availqty proxied by shipped quantity;
    no partsupp in the testdata). Date range pushes to the scan; the
    (part, supplier) aggregate is partial-aggregable; the name filter comes
    in as a broadcast semi-join; the survivor supplier set is deduped on
    the key alone before the broadcast name lookup."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    redparts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 50)
        .join(
            F.broadcast(redparts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .select("l_suppkey")
        .distinct()
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
    )


@_q(
    "q21_waiting_suppliers",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — suppliers who were the only late shipper on
    multi-supplier finished orders (lateness is ship-vs-order date here).
    The EXISTS / NOT EXISTS pair decorrelates into one per-order aggregate:
    n_supp = distinct suppliers on the order, n_late = distinct suppliers
    that shipped late; a late line l1 qualifies iff n_supp > 1 and
    n_late = 1. Everything is keyed on l_orderkey — the orders join, the
    per-order aggregate, and the join back all reuse one hash
    partitioning, so the two correlated subqueries cost one extra
    exchange, not two self-joins of lineitem."""
    ords = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 90 DAYS"
    )
    li_f = li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
    stats = li_f.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.count_distinct("l_suppkey").alias("_n_supp"),
        F.count_distinct(F.when(late, F.col("l_suppkey"))).alias("_n_late"),
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        li_f.filter(late)
        .join(stats, F.col("l_orderkey") == F.col("_ok"))
        .filter((F.col("_n_supp") > 1) & (F.col("_n_late") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@_q(
    "q22_idle_customers",
    """
    WITH threshold AS (
      SELECT (sum(c_acctbal::DECIMAL(18,6)))::DOUBLE / count(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment, count(*) AS numcust,
           (sum(c_acctbal::DECIMAL(18,6)))::DOUBLE AS totacctbal
    FROM customer, threshold
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — well-funded customers who never ordered: scalar
    subquery (global average, exact decimal sum / count so the threshold is
    bit-identical across engines) + left-anti join against orders projected
    to its key column. Both aggregates are partial-aggregable; the anti
    join's build side carries one long per order."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
                / F.count("*")
            ).alias("avg_bal")
        )
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# InfluxQL transform/selector functions the reference delegates to InfluxDB
# (SURVEY §2.4 "delegated Grafana/InfluxQL surface") — moving_average,
# cumulative_sum, derivative, elapsed, integral, spread/stddev/median, mode,
# top(N). Each is a library operator in operators.timeseries.
# --------------------------------------------------------------------------
@_q(
    "ts_moving_average",
    """
    WITH ordered AS (
      SELECT event_type, ts::TIMESTAMP AS ts, event_id, value,
             CAST(sum(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) / 4 AS moving_avg,
             row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, ts, event_id, value, moving_avg
    FROM ordered WHERE rn >= 4
    """,
)
def ts_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL moving_average(value, 4) per event_type. DECIMAL windowed sum
    so DuckDB's sliding-frame accumulator and Spark's agree exactly."""
    from ..operators.timeseries import moving_average

    ev = _t(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    return moving_average(
        ev, dims=["event_type"], ts="ts", value="value", n=4,
        tiebreak="event_id",
    )


@_q(
    "ts_cumulative_sum",
    """
    SELECT event_type, ts::TIMESTAMP AS ts, event_id,
           CAST(sum(CAST(value AS DECIMAL(28,6))) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS cum_sum
    FROM events
    """,
)
def ts_cumulative_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL cumulative_sum(value) per event_type — running DECIMAL total
    cast to double at the edge."""
    from ..operators.timeseries import cumulative_sum

    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value")
    return cumulative_sum(
        ev, dims=["event_type"], ts="ts", value="value", tiebreak="event_id"
    ).drop("value")


@_q(
    "ts_derivative_rate",
    """
    WITH d AS (
      SELECT event_type, ts::TIMESTAMP AS ts, event_id,
             (value - lag(value) OVER w)
               / (epoch(ts::TIMESTAMP) - lag(epoch(ts::TIMESTAMP)) OVER w)
               * 3600.0 AS rate
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_type, ts, event_id, rate FROM d WHERE rate >= 0
    """,
)
def ts_derivative_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL non_negative_derivative(value, 1h) per event_type — per-hour
    rate between consecutive points; counter resets (negative rates) and
    each series' first point are dropped, as InfluxQL does."""
    from ..operators.timeseries import derivative

    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value")
    return derivative(
        ev, dims=["event_type"], ts="ts", value="value",
        unit_seconds=3600.0, non_negative=True, tiebreak="event_id",
    ).drop("value")


@_q(
    "ts_elapsed",
    """
    WITH d AS (
      SELECT event_type, ts::TIMESTAMP AS ts, event_id,
             epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS elapsed_us
      FROM events
    )
    SELECT event_type, ts, event_id, elapsed_us FROM d
    WHERE elapsed_us IS NOT NULL
    """,
)
def ts_elapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL elapsed(value) per event_type — integer microseconds between
    consecutive points (exact epoch-micros arithmetic, no FP)."""
    from ..operators.timeseries import elapsed

    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "event_id")
    return elapsed(ev, dims=["event_type"], ts="ts", tiebreak="event_id")


@_q(
    "ts_integral_daily",
    """
    WITH a AS (
      SELECT date_trunc('day', ts)::TIMESTAMP AS bucket, event_type,
             (epoch(ts::TIMESTAMP) - lag(epoch(ts::TIMESTAMP)) OVER w)
               * (value + lag(value) OVER w) / 2.0 AS area
      FROM events
      WINDOW w AS (PARTITION BY event_type, date_trunc('day', ts)
                   ORDER BY ts, event_id)
    )
    SELECT bucket, event_type,
           CAST(sum(CAST(area AS DECIMAL(28,6))) AS DOUBLE) AS integral
    FROM a GROUP BY bucket, event_type
    """,
)
def ts_integral_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL integral(value, 1s) GROUP BY time(1d), event_type —
    trapezoidal area under each series per day. Per-pair area is plain
    double arithmetic; the cross-row sum of areas rides DECIMAL."""
    from ..operators.timeseries import integral_per_bucket

    ev = _t(spark, sf_dir, "events")
    return integral_per_bucket(
        ev, dims=["event_type"], ts="ts", value="value", unit="day",
        tiebreak="event_id",
    )


@_q(
    "ts_time_weighted_avg",
    """
    WITH a AS (
      SELECT date_trunc('day', ts)::TIMESTAMP AS bucket, event_type, value,
             epoch(ts::TIMESTAMP) - lag(epoch(ts::TIMESTAMP)) OVER w AS dt,
             (epoch(ts::TIMESTAMP) - lag(epoch(ts::TIMESTAMP)) OVER w)
               * (value + lag(value) OVER w) / 2.0 AS area,
             row_number() OVER (
               PARTITION BY event_type, date_trunc('day', ts)
               ORDER BY ts DESC, event_id DESC) AS rn_last
      FROM events
      WINDOW w AS (PARTITION BY event_type, date_trunc('day', ts)
                   ORDER BY ts, event_id)
    )
    SELECT bucket, event_type,
           CASE WHEN CAST(sum(CAST(dt AS DECIMAL(28,6))) AS DOUBLE) > 0
                THEN CAST(sum(CAST(area AS DECIMAL(28,6))) AS DOUBLE)
                     / CAST(sum(CAST(dt AS DECIMAL(28,6))) AS DOUBLE)
                ELSE max(CASE WHEN rn_last = 1 THEN value END) END AS twa
    FROM a GROUP BY bucket, event_type
    """,
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted daily average per event_type — the honest mean for
    irregular sampling (plain avg over-weights bursts). Trapezoid integral
    over covered seconds, DECIMAL sums; single-point buckets fall back to
    the point's value."""
    from ..operators.timeseries import time_weighted_avg_per_bucket

    ev = _t(spark, sf_dir, "events")
    return time_weighted_avg_per_bucket(
        ev, dims=["event_type"], ts="ts", value="value", unit="day",
        tiebreak="event_id",
    )


@_q(
    "ts_spread_stats",
    """
    SELECT date_trunc('day', ts)::TIMESTAMP AS bucket, event_type,
           max(value) - min(value) AS spread,
           median(value) AS median_value,
           CASE WHEN count(*) > 1 THEN sqrt(
             (CAST(sum(CAST(value AS DECIMAL(18,6))
                       * CAST(value AS DECIMAL(18,6))) AS DOUBLE)
              - CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                * CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*))
             / (count(*) - 1)) END AS stddev_value,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def ts_spread_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL spread / median / stddev per day bucket and event_type. The
    stddev is reconstructed from exact DECIMAL Σx and Σx² so both engines
    compute bit-identical doubles regardless of merge order."""
    from ..operators.timeseries import spread_stats

    ev = _t(spark, sf_dir, "events")
    return spread_stats(ev, dims=["event_type"], ts="ts", value="value", unit="day")


@_q(
    "ts_mode_value",
    """
    WITH counted AS (
      SELECT event_type, CAST(floor(value) AS BIGINT) AS v, count(*) AS cnt
      FROM events GROUP BY 1, 2
    ), ranked AS (
      SELECT event_type, v,
             row_number() OVER (
               PARTITION BY event_type ORDER BY cnt DESC, v DESC) AS rn
      FROM counted
    )
    SELECT event_type, v AS mode_value FROM ranked WHERE rn = 1
    """,
)
def ts_mode_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL mode(field) per event_type over the floored value (doubles
    are near-unique, so mode is computed over a discretized field, as a
    dashboard would; floor, not cast — DuckDB rounds double→int casts while
    Spark truncates). Deterministic tie-break toward the larger value via
    max_by on (count, value) — built-in mode() promises no tie order."""
    from ..operators.timeseries import mode_per_series

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.floor("value").alias("v")
    )
    return mode_per_series(ev, dims=["event_type"], value="v")


@_q(
    "ts_top3_per_type",
    """
    WITH ranked AS (
      SELECT event_type, event_id, value,
             row_number() OVER (
               PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
      FROM events
    )
    SELECT event_type, event_id, value FROM ranked WHERE rn <= 3
    """,
)
def ts_top3_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL top(value, 3) per event_type — ranked window with event_id
    tiebreak so equal values cannot flip the driver's hash."""
    from ..operators.timeseries import top_n_per_series

    ev = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    return top_n_per_series(
        ev, dims=["event_type"], value="value", n=3, tiebreak="event_id"
    )


# --------------------------------------------------------------------------
# User-journey analytics: ordered funnel + cohort retention (delegated
# dashboard surface, operators/funnel.py)
# --------------------------------------------------------------------------
@_q(
    "funnel_signup_purchase",
    """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY e.user_id
    ), s4 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s3 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY e.user_id
    )
    SELECT CAST(1 AS BIGINT) AS step_idx, 'signup' AS step,
           (SELECT count(*) FROM s1) AS users
    UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
    UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
    UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4)
    """,
)
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 4-step funnel (signup → view → click → purchase, each step
    strictly after the previous, first-touch): users reaching each depth.
    ONE shuffle regardless of step count — the per-user fold replaces the
    oracle's k chained join+min passes (operators.funnel.funnel_counts)."""
    from ..operators.funnel import funnel_counts

    return funnel_counts(
        _t(spark, sf_dir, "events"),
        steps=("signup", "view", "click", "purchase"),
    )


@_q(
    "retention_weekly",
    """
    WITH cohort AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
      FROM events
    )
    SELECT CAST(c.cohort_week AS TIMESTAMP) AS cohort_week,
           CAST(date_diff('day', c.cohort_week, a.activity_week) / 7 AS BIGINT)
             AS week_offset,
           count(*) AS active_users
    FROM activity a JOIN cohort c USING (user_id)
    WHERE a.activity_week >= c.cohort_week
    GROUP BY 1, 2
    """,
)
def retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention triangle: cohort = ISO week of first signup;
    active = any event in the offset week. Two user-keyed aggregations plus
    one join (AQE broadcasts the cohort map when small)
    (operators.funnel.retention_cohorts)."""
    from ..operators.funnel import retention_cohorts

    return retention_cohorts(_t(spark, sf_dir, "events"), cohort_step="signup")


# --------------------------------------------------------------------------
# Context-window chunking (training-sequence candidates, curation surface)
# --------------------------------------------------------------------------
@_q(
    "chunk_documents",
    """
    SELECT doc_id,
           CAST((s - 1) // 40 AS BIGINT) AS chunk_id,
           CAST(s AS BIGINT) AS chunk_start,
           substring(text, CAST(s AS INT), 64) AS chunk_text
    FROM (
      SELECT doc_id, text,
             unnest(range(1, greatest(1, len(text)) + 1, 40)) AS s
      FROM documents
    )
    """,
)
def chunk_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width character chunking with overlap (64-char chunks, 24-char
    overlap → stride 40): per-row sequence+explode+substring, zero shuffles
    (operators.curation.chunk_documents)."""
    from ..operators.curation import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_chars=64, overlap=24
    )


# --------------------------------------------------------------------------
# Trend fit + anomaly detection (regression-drift surface, the product's
# whole point generalized: a drifting slope IS a size regression)
# --------------------------------------------------------------------------
@_q(
    "ts_trend_fit",
    """
    WITH base AS (
      SELECT event_type,
             (epoch_us(ts::TIMESTAMP) - 1704067200000000) // 1000000 AS x,
             CAST(value AS DECIMAL(18,2)) AS y
      FROM events
    ), sums AS (
      -- exact (int128/decimal) sums; the closed-form DIFFERENCES are also
      -- formed exactly before the double cast, mirroring trend_fit's
      -- cancellation-safe decimal arithmetic
      SELECT event_type, count(*) AS n,
             sum(x) AS sx, sum(x*x) AS sxx,
             sum(CAST(x AS DECIMAL(20,0)) * y) AS sxy,
             sum(y) AS sy
      FROM base GROUP BY event_type
    ), cf AS (
      SELECT event_type, n,
             CAST(n * sxy - sx * sy AS DOUBLE) AS num,
             CAST(n * sxx - sx * sx AS DOUBLE) AS den,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      FROM sums
    )
    SELECT event_type, n, num / den AS slope_per_sec,
           (syd - (num / den) * sxd) / CAST(n AS DOUBLE) AS intercept
    FROM cf
    """,
)
def ts_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series least-squares slope/intercept of value vs time from exact
    sufficient statistics (operators.timeseries.trend_fit): DECIMAL Σx/Σx²
    (no int64 overflow on long spans) and exact closed-form differences (no
    catastrophic cancellation); only the final ratio runs in double —
    bit-identical across engines, unlike regr_slope."""
    from ..operators.timeseries import trend_fit

    ev = _t(spark, sf_dir, "events")
    return trend_fit(
        ev, dims=["event_type"], ts="ts", value="value",
        anchor_epoch_us=1_704_067_200_000_000,
    )


@_q(
    "ts_zscore_anomalies",
    """
    WITH w AS (
      SELECT event_type, event_id, ts::TIMESTAMP AS ts, value,
             count(*) OVER win AS n_prev,
             CAST(sum(CAST(value AS DECIMAL(18,2))) OVER win AS DOUBLE) AS sx,
             CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                  OVER win AS DOUBLE) AS sxx
      FROM events
      WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, event_id, ts, value,
           (value - sx / 100.0)
             / sqrt((sxx - sx * sx / 100.0) / 99.0) AS zscore,
           abs((value - sx / 100.0)
             / sqrt((sxx - sx * sx / 100.0) / 99.0)) > 3.0 AS is_anomaly
    FROM w WHERE n_prev = 100
    """,
)
def ts_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly z-score vs the trailing-100 window of the series (exclusive),
    sample stddev from exact DECIMAL Σx/Σx² — sliding-window double sums
    are engine-specific (segment trees vs running sums), exact sums are not
    (operators.timeseries.zscore_anomalies)."""
    from ..operators.timeseries import zscore_anomalies

    ev = _t(spark, sf_dir, "events").select("event_type", "event_id", "ts", "value")
    return zscore_anomalies(
        ev, dims=["event_type"], ts="ts", value="value",
        trailing=100, threshold=3.0, tiebreak="event_id",
    )


# Rows-only (no SQL oracle): Holt's smoothing is a sequential two-state
# recursion per series (level_t and trend_t each depend on t−1); like
# ts_ewma there is no faithful ANSI-SQL twin. The recursion is unit-tested
# against a hand rollout (test_graph_and_hist).
@_q("ts_holt_forecast")
def ts_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL holt_winters(3, 0): 3-step-ahead Holt level+trend forecast
    per event_type (operators.timeseries.holt_forecast)."""
    from ..operators.timeseries import holt_forecast

    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "value", "event_id")
    return holt_forecast(
        ev, dims=["event_type"], ts="ts", value="value",
        alpha=0.3, beta=0.1, horizon=3, tiebreak="event_id",
    )


# Rows-only (no SQL oracle): the seasonal (S>0) Holt-Winters form — same
# sequential recursion as ts_holt_forecast plus S seasonal states per
# series, so equally non-SQL-expressible. Hand-rollout parity plus a
# phase-tracking InfluxQL-shim test cover the semantics
# (test_graph_and_hist / test_influxql). The series is pre-bucketed to a
# regular daily grid (mean per day) exactly like InfluxQL's
# holt_winters(mean(value), N, S) ... GROUP BY time(1d), with a 7-day
# weekly season — the reference's nightly-CI build sizes are
# weekly-seasonal, and its README delegates forecasting to
# Grafana/InfluxQL (/root/reference/README.md:25).
@_q("ts_holt_winters_seasonal")
def ts_holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL holt_winters(mean(value), 7, 7) over GROUP BY time(1d),
    event_type: one-week forecast with weekly additive seasonality."""
    from ..operators.timeseries import holt_forecast

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.avg("value").alias("daily_mean"))
    fc = holt_forecast(
        daily, dims=["event_type"], ts="day", value="daily_mean",
        alpha=0.3, beta=0.1, gamma=0.2, season_length=7, horizon=7,
    )
    return fc.select(
        "event_type", "step",
        F.col("forecast_ts").alias("day"),
        F.round("forecast", 6).alias("forecast"),
    )


# --------------------------------------------------------------------------
# M4 downsampling (dashboard rendering at scale: ≤4 points per pixel column)
# --------------------------------------------------------------------------
@_q(
    "ts_m4_downsample",
    """
    WITH pts AS (
      SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS bucket,
             ts::TIMESTAMP AS ts, value, event_id
      FROM events
    ), r AS (
      SELECT *,
        row_number() OVER (PARTITION BY event_type, bucket
                           ORDER BY ts, event_id) AS rf,
        row_number() OVER (PARTITION BY event_type, bucket
                           ORDER BY ts DESC, event_id DESC) AS rl,
        row_number() OVER (PARTITION BY event_type, bucket
                           ORDER BY value, ts, event_id) AS rmin,
        row_number() OVER (PARTITION BY event_type, bucket
                           ORDER BY value DESC, ts DESC, event_id DESC) AS rmax
      FROM pts
    )
    SELECT DISTINCT event_type, bucket, ts, value
    FROM r WHERE 1 IN (rf, rl, rmin, rmax)
    """,
)
def ts_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 chart downsampling: first/last/min/max point per (event_type, day)
    — one partial-aggregable shuffle, output bounded by buckets×dims×4
    (operators.timeseries.m4_downsample)."""
    from ..operators.timeseries import m4_downsample

    ev = _t(spark, sf_dir, "events")
    return m4_downsample(
        ev, dims=["event_type"], ts="ts", value="value",
        unit="day", tiebreak="event_id",
    )


# --------------------------------------------------------------------------
# Data-quality expectation gate (one-pass Deequ-style verdict report)
# --------------------------------------------------------------------------
@_q(
    "dq_orders_expectations",
    """
    WITH m AS (
      SELECT
        CAST(avg(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
          AS completeness,
        CAST(count(DISTINCT o_orderkey) AS DOUBLE) / CAST(count(*) AS DOUBLE)
          AS uniq_ratio,
        CAST(min(o_totalprice) AS DOUBLE) AS min_price,
        CAST(avg(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)
             AS DOUBLE) AS status_domain,
        CAST(count(*) AS DOUBLE) AS n_rows
      FROM orders
    )
    SELECT 'custkey_complete' AS check_name, completeness AS metric,
           0.99 AS low, CAST(NULL AS DOUBLE) AS high,
           completeness >= 0.99 AS passed FROM m
    UNION ALL
    SELECT 'orderkey_unique', uniq_ratio, 1.0, 1.0,
           uniq_ratio >= 1.0 AND uniq_ratio <= 1.0 FROM m
    UNION ALL
    SELECT 'totalprice_positive', min_price, 0.0, CAST(NULL AS DOUBLE),
           min_price >= 0.0 FROM m
    UNION ALL
    SELECT 'status_in_domain', status_domain, 1.0, 1.0,
           status_domain >= 1.0 AND status_domain <= 1.0 FROM m
    UNION ALL
    SELECT 'nonempty', n_rows, 1.0, CAST(NULL AS DOUBLE), n_rows >= 1.0 FROM m
    """,
)
def dq_orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-expectation quality gate over orders evaluated in ONE scan/agg
    pass (operators.profile.expectation_report): completeness, key
    uniqueness, value range, domain membership, non-emptiness."""
    from ..operators.profile import expectation_report

    o = _t(spark, sf_dir, "orders")
    return expectation_report(
        o,
        [
            ("custkey_complete",
             F.avg(F.col("o_custkey").isNotNull().cast("int")), 0.99, None),
            ("orderkey_unique",
             F.count_distinct("o_orderkey").cast("double")
             / F.count(F.lit(1)).cast("double"), 1.0, 1.0),
            ("totalprice_positive", F.min("o_totalprice"), 0.0, None),
            ("status_in_domain",
             F.avg(F.col("o_orderstatus").isin("O", "F", "P").cast("int")),
             1.0, 1.0),
            ("nonempty", F.count(F.lit(1)), 1.0, None),
        ],
    )


# --------------------------------------------------------------------------
# CDC change-log compaction (general form of the InfluxDB point-upsert O2)
# --------------------------------------------------------------------------
@_q(
    "cdc_latest_state",
    """
    WITH ranked AS (
      SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value, props,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT event_id, ts, user_id, event_type, value, props
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-writer-wins CDC compaction of the events stream keyed by user:
    one max_by shuffle, tombstone keys (last op = 'error') dropped
    (operators.cdc.apply_changelog)."""
    from ..operators.cdc import apply_changelog

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    return apply_changelog(
        ev, keys=["user_id"], seq=["ts", "event_id"],
        op_col="event_type", delete_op="error",
    )


# --------------------------------------------------------------------------
# SCD2 validity-interval history (point-in-time form of the change log)
# --------------------------------------------------------------------------
@_q(
    "scd2_user_history",
    """
    WITH c AS (
      SELECT user_id, event_id, event_type, value, ts::TIMESTAMP AS ts
      FROM events
    ), iv AS (
      SELECT *,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM c
    )
    SELECT user_id, event_id, event_type, value,
           ts AS valid_from, valid_to, valid_to IS NULL AS is_current
    FROM iv WHERE event_type <> 'error'
    """,
)
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history per user from the events change log: validity
    intervals via one lead() window, deletes ('error') close intervals but
    emit no row (operators.cdc.scd2_history)."""
    from ..operators.cdc import scd2_history

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", "ts"
    )
    return scd2_history(
        ev, keys=["user_id"], seq=["ts", "event_id"],
        op_col="event_type", attrs=["event_id", "event_type", "value"],
        delete_op="error",
    )


# --------------------------------------------------------------------------
# G3 variant — fill(0): constant gap fill, the cheapest fill mode
# --------------------------------------------------------------------------
@_q(
    "g3_gap_fill_zero",
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
    SELECT g.bucket, g.event_type, coalesce(h.sum_value, 0.0) AS sum_value
    FROM grid g LEFT JOIN hourly h
      ON g.bucket = h.bucket AND g.event_type = h.event_type
    """,
)
def g3_gap_fill_zero(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grafana fill(0): regular grid with constant fill — no window, just a
    coalesce after the spine join (operators.timeseries.gap_fill_value)."""
    from ..operators.timeseries import gap_fill_value

    ev = _t(spark, sf_dir, "events")
    hourly = time_bucket_agg(
        ev,
        ts="ts",
        unit="hour",
        dims=["event_type"],
        aggs=[F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value")],
    )
    return gap_fill_value(
        hourly,
        ts="bucket",
        dims=["event_type"],
        values=["sum_value"],
        step="INTERVAL 1 HOUR",
        fill=0,
    )


# --------------------------------------------------------------------------
# Edit-distance fuzzy pairs (character-level dedup measure)
# --------------------------------------------------------------------------
@_q(
    "fuzzy_edit_pairs",
    """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.text, b.text) AS INT) AS edit_distance
    FROM documents a JOIN documents b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
     AND abs(a.n_chars - b.n_chars) <= 10
    WHERE levenshtein(a.text, b.text) <= 10
    """,
)
def fuzzy_edit_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein-verified near-duplicate pairs under (lang, length-bucket)
    blocking with thresholded early-exit distance
    (operators.dedup.edit_distance_pairs)."""
    from ..operators.dedup import edit_distance_pairs

    return edit_distance_pairs(
        _t(spark, sf_dir, "documents"),
        block_cols=["lang"], band=10, max_distance=10,
    )


# --------------------------------------------------------------------------
# Winnowing repeated-span detection (substring-level corpus dedup)
# --------------------------------------------------------------------------
@_q(
    "repeated_spans",
    """
    WITH grams AS (
      SELECT doc_id, text, greatest(1, len(text) - 20 + 1) AS ng,
             unnest(range(1, greatest(1, len(text) - 20 + 1) + 1)) AS i
      FROM documents
    ), hashed AS (
      SELECT doc_id, i, ng,
             ('0x' || substr(md5(substr(text, CAST(i AS INT), 20)), 1, 14))::BIGINT AS h
      FROM grams
    ), wins AS (
      SELECT doc_id, i, ng,
             min(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp
      FROM hashed
    ), sel AS (
      SELECT DISTINCT doc_id, fp AS fingerprint
      FROM wins WHERE i <= greatest(1, ng - 8 + 1)
    ), rep AS (
      SELECT fingerprint, count(*) AS n_docs
      FROM sel GROUP BY 1 HAVING count(*) >= 2
    )
    SELECT s.fingerprint, r.n_docs, s.doc_id
    FROM sel s JOIN rep r USING (fingerprint)
    """,
)
def repeated_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (k=20, w=8) repeated-span detector: fingerprints shared by
    ≥2 documents — any common substring of ≥27 chars is guaranteed caught
    (operators.dedup.repeated_spans). Fingerprinting is row-local; the only
    shuffle is the fingerprint count."""
    from ..operators.dedup import repeated_spans

    return repeated_spans(
        _t(spark, sf_dir, "documents"), k=20, w=8, min_docs=2
    )


# --------------------------------------------------------------------------
# InfluxQL sample(f, N) selector — deterministic hash-ordered sampling
# --------------------------------------------------------------------------
@_q(
    "ts_sample_per_type",
    """
    WITH ranked AS (
      SELECT event_id, ts::TIMESTAMP AS ts, event_type, value,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
      FROM events
    )
    SELECT event_id, ts, event_type, value FROM ranked WHERE rn <= 10
    """,
)
def ts_sample_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL sample(value, 10) per event_type: deterministic md5-ordered
    sample (operators.timeseries.sample_per_series)."""
    from ..operators.timeseries import sample_per_series

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    return sample_per_series(
        ev, dims=["event_type"], n=10, key_cols=["event_id"]
    )


# --------------------------------------------------------------------------
# Token-distribution drift between corpus halves (mixture monitoring)
# --------------------------------------------------------------------------
@_q(
    "text_token_drift",
    """
    WITH ta AS (
      SELECT t.tok AS token, count(*) AS n_a
      FROM documents, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(tok)
      WHERE doc_id % 2 = 0 GROUP BY 1
    ), tb AS (
      SELECT t.tok AS token, count(*) AS n_b
      FROM documents, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(tok)
      WHERE doc_id % 2 = 1 GROUP BY 1
    ), j AS (
      SELECT coalesce(ta.token, tb.token) AS token,
             coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
      FROM ta FULL OUTER JOIN tb ON ta.token = tb.token
    ), tot AS (
      SELECT sum(n_a) AS tot_a, sum(n_b) AS tot_b FROM j
    ), scored AS (
      SELECT token, n_a, n_b,
             0.5 * (CASE WHEN n_a > 0 THEN
                 (CAST(n_a AS DOUBLE)/CAST(tot_a AS DOUBLE))
                 * ln((CAST(n_a AS DOUBLE)/CAST(tot_a AS DOUBLE))
                      / ((CAST(n_a AS DOUBLE)/CAST(tot_a AS DOUBLE)
                          + CAST(n_b AS DOUBLE)/CAST(tot_b AS DOUBLE)) / 2.0))
                 ELSE 0.0 END)
             + 0.5 * (CASE WHEN n_b > 0 THEN
                 (CAST(n_b AS DOUBLE)/CAST(tot_b AS DOUBLE))
                 * ln((CAST(n_b AS DOUBLE)/CAST(tot_b AS DOUBLE))
                      / ((CAST(n_a AS DOUBLE)/CAST(tot_a AS DOUBLE)
                          + CAST(n_b AS DOUBLE)/CAST(tot_b AS DOUBLE)) / 2.0))
                 ELSE 0.0 END) AS js_contribution
      FROM j, tot
    )
    SELECT token, n_a, n_b, js_contribution,
           CAST(row_number() OVER (ORDER BY js_contribution DESC, token)
                AS INT) AS drift_rank
    FROM scored
    QUALIFY drift_rank <= 20
    """,
)
def text_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens by Jensen-Shannon divergence contribution between the
    even- and odd-doc_id halves of the corpus — the vocabulary-drift monitor
    (operators.textstats.token_drift). Per-row doubles on exact counts only;
    no cross-row FP accumulation."""
    from ..operators.textstats import token_drift

    docs = _t(spark, sf_dir, "documents")
    return token_drift(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        top_k=20,
    )


# --------------------------------------------------------------------------
# MAD robust anomalies (complement of the mean/stddev z-score G19)
# --------------------------------------------------------------------------
@_q(
    "ts_mad_anomalies",
    """
    WITH med AS (
      SELECT event_type, median(value) AS m FROM events GROUP BY 1
    ), wm AS (
      SELECT e.event_id, e.ts::TIMESTAMP AS ts, e.event_type, e.value, med.m
      FROM events e JOIN med USING (event_type)
    ), mad AS (
      SELECT event_type, median(abs(value - m)) AS d FROM wm GROUP BY 1
    )
    SELECT wm.event_id, wm.ts, wm.event_type, wm.value,
           CASE WHEN mad.d > 0
                THEN 0.6745 * (wm.value - wm.m) / mad.d END AS robust_z,
           abs(CASE WHEN mad.d > 0
                THEN 0.6745 * (wm.value - wm.m) / mad.d END) > 3.5 AS is_anomaly
    FROM wm JOIN mad USING (event_type)
    """,
)
def ts_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modified z-score (median/MAD) anomaly flags per event_type — robust
    to the fat tails that inflate a stddev
    (operators.timeseries.mad_anomalies). Medians are order statistics, so
    both engines agree bitwise."""
    from ..operators.timeseries import mad_anomalies

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    return mad_anomalies(ev, dims=["event_type"], value="value", threshold=3.5)


# --------------------------------------------------------------------------
# Deterministic weighted sampling (Efraimidis–Spirakis A-ES)
# --------------------------------------------------------------------------
@_q(
    "sample_weighted",
    """
    WITH w AS (
      SELECT doc_id, lang, source, n_chars,
             ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT
                 + 1.0) / 72057594037927936.0)
               / CAST(n_chars AS DOUBLE) AS sample_score
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    SELECT doc_id, lang, source, n_chars
    FROM (
      SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY sample_score DESC, doc_id) AS rn
      FROM w
    ) WHERE rn <= 30
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30 docs per lang sampled with probability scaling with n_chars —
    deterministic A-ES weighted sampling without replacement
    (operators.curation.weighted_sample_per_group)."""
    from ..operators.curation import weighted_sample_per_group

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    # sample_score is dropped from the compared projection: the selected
    # ROWS are ulp-stable (ties break on doc_id) but Java's and libm's ln
    # differ in the last bit on some inputs.
    return weighted_sample_per_group(
        docs, group_cols=["lang"], n=30,
        weight_col="n_chars", key_cols=["doc_id"],
    ).drop("sample_score")


# --------------------------------------------------------------------------
# RSI (Cutler) — the last InfluxQL technical-analysis transform
# --------------------------------------------------------------------------
@_q(
    "ts_rsi",
    """
    WITH ch AS (
      SELECT event_type, event_id, ts::TIMESTAMP AS ts, value,
             CAST(coalesce(greatest(value - lag(value) OVER w, 0.0), 0.0)
                  AS DECIMAL(18,6)) AS g,
             CAST(coalesce(greatest(lag(value) OVER w - value, 0.0), 0.0)
                  AS DECIMAL(18,6)) AS l,
             row_number() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ), cum AS (
      SELECT *,
             CAST(sum(g) OVER wc AS DECIMAL(38,6)) AS cg,
             CAST(sum(l) OVER wc AS DECIMAL(38,6)) AS cl
      FROM ch
      WINDOW wc AS (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), trail AS (
      SELECT event_type, event_id, ts, value, rn,
             CAST(cg - coalesce(lag(cg, 14) OVER wt, CAST(0 AS DECIMAL(38,6)))
                  AS DOUBLE) AS sg,
             CAST(cl - coalesce(lag(cl, 14) OVER wt, CAST(0 AS DECIMAL(38,6)))
                  AS DOUBLE) AS sl
      FROM cum
      WINDOW wt AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_type, event_id, ts, value,
           CASE WHEN sl = 0.0 THEN 100.0
                ELSE 100.0 - 100.0 / (1.0 + sg / sl) END AS rsi
    FROM trail WHERE rn > 14
    """,
)
def ts_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-period Cutler RSI per event_type over the events stream
    (operators.timeseries.rsi): trailing gain/loss sums as exact running-sum
    differences, O(n) per series."""
    from ..operators.timeseries import rsi

    ev = _t(spark, sf_dir, "events").select(
        "event_type", "event_id", "ts", "value"
    )
    return rsi(ev, dims=["event_type"], ts="ts", value="value",
               n=14, tiebreak="event_id")


# --------------------------------------------------------------------------
# Embedding int8 scalar quantization (memory path for vector search)
# --------------------------------------------------------------------------
@_q(
    "emb_quantize_int8",
    """
    WITH base AS (
      SELECT vec_id, embedding,
             CAST(list_min(embedding) AS DOUBLE) AS vmin,
             CAST(list_max(embedding) AS DOUBLE) AS vmax
      FROM embeddings
    )
    SELECT vec_id, CAST(i AS INT) AS i,
           CAST(CASE WHEN vmax = vmin THEN 0
                ELSE floor((CAST(embedding[CAST(i AS INT)] AS DOUBLE) - vmin)
                           * 254.0 / (vmax - vmin) + 0.5) - 127
           END AS INT) AS code,
           vmin, vmax
    FROM base, unnest(range(1, len(embedding) + 1)) AS t(i)
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding store, relational output
    (operators.similarity.quantize_embeddings) — row-local, zero shuffles."""
    from ..operators.similarity import quantize_embeddings

    return quantize_embeddings(_t(spark, sf_dir, "embeddings"))


# --------------------------------------------------------------------------
# End-to-end training-sequence manifest: chunk → tokenize → pack
# --------------------------------------------------------------------------
@_q(
    "corpus_chunks_packed",
    """
    WITH chunks AS (
      SELECT doc_id,
             CAST((s - 1) // 64 AS BIGINT) AS chunk_id,
             substring(text, CAST(s AS INT), 64) AS chunk_text
      FROM (
        SELECT doc_id, text,
               unnest(range(1, greatest(1, len(text)) + 1, 64)) AS s
        FROM documents
      )
    ), tok AS (
      SELECT d.lang, c.doc_id * 100000 + c.chunk_id AS seq_key,
             len(regexp_extract_all(lower(c.chunk_text), '[a-z0-9]+'))::BIGINT
               AS n_tokens
      FROM chunks c JOIN documents d USING (doc_id)
    ), w AS (
      SELECT *, coalesce(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY seq_key
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      FROM tok
    )
    SELECT lang, seq_key, n_tokens,
           (before // 128)::BIGINT AS pack_id,
           (before % 128)::BIGINT AS pack_offset
    FROM w
    """,
)
def corpus_chunks_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full documents→training-sequences path in one plan: 64-char
    chunking (zero-shuffle explode), per-chunk token counts (row-local
    regex), then 128-token pack assignment (one integer window shuffle per
    lang) — curation.chunk_documents ∘ textstats.token_count ∘
    curation.pack_sequences."""
    from ..operators.curation import chunk_documents, pack_sequences
    from ..operators.textstats import token_count

    docs = _t(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_chars=64, overlap=0)
    tok = (
        chunks.join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "lang",
            (F.col("doc_id") * 100000 + F.col("chunk_id")).alias("seq_key"),
            token_count("chunk_text").cast("long").alias("n_tokens"),
        )
    )
    return pack_sequences(
        tok, budget=128, token_col="n_tokens",
        part_col="lang", order_col="seq_key",
    )


# --------------------------------------------------------------------------
# Recursive CTE through the SQL surface (Spark 4 WITH RECURSIVE)
# --------------------------------------------------------------------------
@_q(
    "cc_recursive_sql",
    f"""
    WITH RECURSIVE {_DUCK_NEARDUP_PAIRS}, edges AS (
      SELECT vec_a AS a, vec_b AS b FROM pairs
      UNION ALL SELECT vec_b, vec_a FROM pairs
    ), nodes AS (
      SELECT DISTINCT a AS id FROM edges
    ), reach(id, r, d) AS (
      SELECT id, id, 0 FROM nodes
      UNION ALL
      SELECT reach.id, e.b, reach.d + 1
      FROM reach JOIN edges e ON reach.r = e.a
      WHERE reach.d < 6
    )
    SELECT id AS vec_id, min(r) AS component_id FROM reach GROUP BY id
    """,
)
def cc_recursive_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster labels via a depth-bounded WITH RECURSIVE reachability
    closure in Spark SQL (Spark 4 recursive CTEs) over the oracle-matched
    near-dup edge set — the SQL-surface twin of
    operators.dedup.connected_components. UNION ALL recursion (Spark does
    not support distinct-UNION recursion yet) with a depth guard; the final
    min-label aggregate absorbs duplicate paths. Unbounded-diameter graphs
    belong to the iterative operator; both sides here compute the identical
    bounded semantics."""
    pairs = _neardup_pairs(spark, sf_dir).select("vec_a", "vec_b")
    pairs.createOrReplaceTempView("cc_pairs")
    return spark.sql(
        """
        WITH RECURSIVE edges AS (
          SELECT vec_a AS a, vec_b AS b FROM cc_pairs
          UNION ALL SELECT vec_b, vec_a FROM cc_pairs
        ), nodes AS (
          SELECT DISTINCT a AS id FROM edges
        ), reach(id, r, d) AS (
          SELECT id, id, 0 FROM nodes
          UNION ALL
          SELECT reach.id, e.b, reach.d + 1
          FROM reach JOIN edges e ON reach.r = e.a
          WHERE reach.d < 6
        )
        SELECT id AS vec_id, min(r) AS component_id FROM reach GROUP BY id
        """
    )


# --------------------------------------------------------------------------
# Interpolated as-of alignment (merge_asof + interpolate)
# --------------------------------------------------------------------------
@_q(
    "j4_asof_interpolated",
    """
    WITH l AS (
      SELECT user_id, event_id, ts::TIMESTAMP AS ts
      FROM events WHERE event_type = 'signup'
    ), r AS (
      SELECT user_id, ts::TIMESTAMP AS ts, avg(value) AS value
      FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ), prev AS (
      SELECT l.user_id, l.event_id, l.ts,
             r.ts AS ts_prev, r.value AS v_prev
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts >= r.ts
    ), nxt AS (
      SELECT p.*, r.ts AS ts_next, r.value AS v_next
      FROM prev p ASOF LEFT JOIN r
        ON p.user_id = r.user_id AND p.ts <= r.ts
    )
    SELECT user_id, event_id, ts, ts_prev, ts_next,
           CASE WHEN v_prev IS NULL THEN v_next
                WHEN v_next IS NULL THEN v_prev
                WHEN epoch_us(ts_next) = epoch_us(ts_prev) THEN v_prev
                ELSE v_prev + (v_next - v_prev)
                     * (CAST(epoch_us(ts) - epoch_us(ts_prev) AS DOUBLE)
                        / CAST(epoch_us(ts_next) - epoch_us(ts_prev) AS DOUBLE))
           END AS interp_value
    FROM nxt
    """,
)
def j4_asof_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each signup aligned to the linearly-interpolated 'view' value of its
    user at signup time (operators.asof.asof_join_interpolated); DuckDB's
    native ASOF JOIN is the oracle for both brackets."""
    from ..operators.asof import asof_join_interpolated

    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "event_id", "ts"
    )
    right = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.avg("value").alias("value"))
    )
    return asof_join_interpolated(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        value="value", out="interp_value",
    )


# --------------------------------------------------------------------------
# Grafana timeshift compare + top-N-with-Other legend rollup
# --------------------------------------------------------------------------
@_q(
    "ts_day_over_day",
    f"""
    WITH daily AS (
      SELECT date_trunc('day', ts)::TIMESTAMP AS bucket, event_type,
             sum(CAST(value AS {DEC})) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT c.event_type, c.bucket,
           CAST(c.v AS DOUBLE) AS value,
           CAST(p.v AS DOUBLE) AS prev_value,
           CAST(c.v AS DOUBLE) - CAST(p.v AS DOUBLE) AS abs_change,
           CASE WHEN CAST(p.v AS DOUBLE) <> 0
                THEN (CAST(c.v AS DOUBLE) - CAST(p.v AS DOUBLE))
                     / CAST(p.v AS DOUBLE) END AS pct_change
    FROM daily c LEFT JOIN daily p
      ON c.event_type = p.event_type
     AND c.bucket = p.bucket + INTERVAL 1 DAY
    """,
)
def ts_day_over_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timeshift comparison: daily sums per event_type vs the prior day
    (operators.timeseries.period_over_period) — self-equi-join, exact
    DECIMAL values until the final double projection."""
    from ..operators.timeseries import period_over_period, time_bucket_agg

    ev = _t(spark, sf_dir, "events")
    daily = time_bucket_agg(
        ev, ts="ts", unit="day", dims=["event_type"],
        aggs=[F.sum(F.col("value").cast(DEC)).alias("v")],
    )
    return period_over_period(
        daily, bucket="bucket", dims=["event_type"], value="v",
        period="INTERVAL 1 DAY",
    ).withColumnRenamed("v", "value")


@_q(
    "ts_top2_with_other",
    f"""
    WITH daily AS (
      SELECT date_trunc('day', ts)::TIMESTAMP AS bucket, event_type,
             sum(CAST(value AS {DEC})) AS v
      FROM events GROUP BY 1, 2
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY bucket
                                   ORDER BY v DESC, event_type) AS rn
      FROM daily
    )
    SELECT bucket,
           CASE WHEN rn <= 2 THEN event_type ELSE 'Other' END AS event_type,
           CAST(sum(v) AS DOUBLE) AS v
    FROM ranked GROUP BY 1, 2
    """,
)
def ts_top2_with_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day top-2 event types by summed value with the rest collapsed
    into 'Other' (operators.timeseries.top_n_with_other); the Other sum
    stays DECIMAL so it is exact under any accumulation order."""
    from ..operators.timeseries import time_bucket_agg, top_n_with_other

    ev = _t(spark, sf_dir, "events")
    daily = time_bucket_agg(
        ev, ts="ts", unit="day", dims=["event_type"],
        aggs=[F.sum(F.col("value").cast(DEC)).alias("v")],
    )
    return top_n_with_other(
        daily, bucket="bucket", series="event_type", value="v", n=2
    ).withColumn("v", F.col("v").cast("double"))


# --------------------------------------------------------------------------
# Distinct users per day (exact, oracle) + HLL sketch rollup (scale path)
# --------------------------------------------------------------------------
@_q(
    "ts_daily_unique_users",
    """
    SELECT date_trunc('day', ts)::TIMESTAMP AS bucket, event_type,
           count(DISTINCT user_id) AS unique_users
    FROM events GROUP BY 1, 2
    """,
)
def ts_daily_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DAU per event_type — the hash-checked twin of the sketch
    rollup (count_distinct is partial-aggregable via two-phase expand)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("bucket"), "event_type"
    ).agg(F.count_distinct("user_id").alias("unique_users"))


# Rows-only (no SQL oracle): DataSketches HLL estimates are engine-specific;
# the exact twin ts_daily_unique_users carries the hash-checked semantics,
# and a unit test bounds the estimate error against the exact count.
@_q("dau_wau_sketch_rollup")
def dau_wau_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly uniques from MERGED daily HLL sketches per event_type — the
    pre-aggregated sketch path that answers any coarser window without
    re-scanning raw rows (operators.timeseries.distinct_sketch_rollup)."""
    from ..operators.timeseries import distinct_sketch_rollup

    ev = _t(spark, sf_dir, "events")
    return distinct_sketch_rollup(
        ev, ts="ts", fine_unit="day", coarse_unit="week",
        dims=["event_type"], key="user_id",
    )


# --------------------------------------------------------------------------
# Last-touch attribution (as-of composition, product-analytics staple)
# --------------------------------------------------------------------------
@_q(
    "attribution_last_touch",
    """
    WITH p AS (
      SELECT user_id, event_id, ts::TIMESTAMP AS ts, value
      FROM events WHERE event_type = 'purchase'
    ), v AS (
      SELECT user_id, event_id, ts::TIMESTAMP AS ts
      FROM events WHERE event_type = 'view'
    ), j AS (
      SELECT p.user_id, p.event_id, p.ts, p.value,
             v.event_id AS touch_event_id, v.ts AS touch_ts
      FROM p ASOF LEFT JOIN v
        ON p.user_id = v.user_id AND p.ts >= v.ts
    )
    SELECT user_id, event_id, ts, value,
           CASE WHEN touch_ts >= ts - INTERVAL 7 DAY
                THEN touch_event_id END AS touch_event_id,
           CASE WHEN touch_ts >= ts - INTERVAL 7 DAY
                THEN touch_ts END AS touch_ts,
           touch_ts IS NOT NULL AND touch_ts >= ts - INTERVAL 7 DAY
             AS attributed
    FROM j
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase attributed to the user's most recent 'view' within a
    7-day lookback — backward as-of join + recency filter, the last-touch
    attribution staple. Purchases with no qualifying touch stay (NULL touch,
    attributed=false) — totals must reconcile. NOTE on ties: DuckDB's ASOF
    picks an arbitrary row among equal touch_ts; our as-of breaks ties
    deterministically — the fixture has no (user, ts) view ties, and the
    tie rule is unit-tested on the operator instead."""
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("v_event_id"), "ts"
    )
    j = asof_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["v_event_id", "ts"], suffix="_t",
    )
    in_window = F.col("ts_t") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")
    return j.select(
        "user_id", "event_id", "ts", "value",
        F.when(in_window, F.col("v_event_id_t")).alias("touch_event_id"),
        F.when(in_window, F.col("ts_t")).alias("touch_ts"),
        F.coalesce(in_window, F.lit(False)).alias("attributed"),
    )


# --------------------------------------------------------------------------
# OHLC candles (first/max/min/last as columns; M4's roles, candle form)
# --------------------------------------------------------------------------
@_q(
    "ts_ohlc_daily",
    """
    WITH ranked AS (
      SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS bucket, value,
             row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rf,
             row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rl
      FROM events
    )
    SELECT event_type, bucket,
           max(CASE WHEN rf = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rl = 1 THEN value END) AS close,
           count(*) AS n
    FROM ranked GROUP BY 1, 2
    """,
)
def ts_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candles per event_type
    (operators.timeseries.ohlc_candles) — single partial-aggregable
    shuffle, first/last picked by min_by/max_by on (ts, event_id)."""
    from ..operators.timeseries import ohlc_candles

    ev = _t(spark, sf_dir, "events")
    return ohlc_candles(
        ev, dims=["event_type"], ts="ts", value="value",
        unit="day", tiebreak="event_id",
    )


# --------------------------------------------------------------------------
# Chande Momentum Oscillator (shares RSI's trailing gain/loss core)
# --------------------------------------------------------------------------
@_q(
    "ts_cmo",
    """
    WITH ch AS (
      SELECT event_type, event_id, ts::TIMESTAMP AS ts, value,
             CAST(coalesce(greatest(value - lag(value) OVER w, 0.0), 0.0)
                  AS DECIMAL(18,6)) AS g,
             CAST(coalesce(greatest(lag(value) OVER w - value, 0.0), 0.0)
                  AS DECIMAL(18,6)) AS l,
             row_number() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ), cum AS (
      SELECT *,
             CAST(sum(g) OVER wc AS DECIMAL(38,6)) AS cg,
             CAST(sum(l) OVER wc AS DECIMAL(38,6)) AS cl
      FROM ch
      WINDOW wc AS (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), trail AS (
      SELECT event_type, event_id, ts, value, rn,
             CAST(cg - coalesce(lag(cg, 14) OVER wt, CAST(0 AS DECIMAL(38,6)))
                  AS DOUBLE) AS sg,
             CAST(cl - coalesce(lag(cl, 14) OVER wt, CAST(0 AS DECIMAL(38,6)))
                  AS DOUBLE) AS sl
      FROM cum
      WINDOW wt AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_type, event_id, ts, value,
           CASE WHEN sg + sl = 0.0 THEN 0.0
                ELSE 100.0 * (sg - sl) / (sg + sl) END AS cmo
    FROM trail WHERE rn > 14
    """,
)
def ts_cmo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-period Chande Momentum Oscillator per event_type
    (operators.timeseries.chande_momentum)."""
    from ..operators.timeseries import chande_momentum

    ev = _t(spark, sf_dir, "events").select(
        "event_type", "event_id", "ts", "value"
    )
    return chande_momentum(
        ev, dims=["event_type"], ts="ts", value="value",
        n=14, tiebreak="event_id",
    )


# --------------------------------------------------------------------------
# Percentile bands per time bucket (G4 under GROUP BY time)
# --------------------------------------------------------------------------
@_q(
    "ts_percentile_bands",
    """
    SELECT date_trunc('day', ts)::TIMESTAMP AS bucket, event_type,
           round(quantile_cont(value, 0.10), 6) AS p10,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.90), 6) AS p90
    FROM events GROUP BY 1, 2
    """,
)
def ts_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p10/p50/p90 bands per event_type — InfluxQL ``percentile``
    under ``GROUP BY time``; exact interpolated percentiles (order
    statistics → engine-stable), rounded to 6 places for the hash."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("bucket"), "event_type"
    ).agg(
        F.round(F.percentile("value", F.lit(0.10)), 6).alias("p10"),
        F.round(F.percentile("value", F.lit(0.50)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.90)), 6).alias("p90"),
    )


# --------------------------------------------------------------------------
# Referential-integrity audit (orphan foreign keys across the star schema)
# --------------------------------------------------------------------------
@_q(
    "dq_referential_integrity",
    """
    SELECT 'orders.o_custkey->customer' AS relationship,
           count(*) AS n_child_rows,
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_orphans
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders', count(*),
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'customer.c_nationkey->nation', count(*),
           CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-FK audit across three star-schema relationships: one row per
    relationship with child-row and orphan counts; the gate is
    n_orphans == 0. Each check is a left join on KEY COLUMNS ONLY (both
    sides pruned to one column before the exchange) + conditional count.
    Join strategy is left to AQE: dim parents (nation, customer) broadcast,
    fact-sized parents (orders under lineitem) shuffle — an unconditional
    broadcast hint would be wrong at scale for the fact case."""
    def check(rel: str, child: DataFrame, ck: str, parent: DataFrame, pk: str):
        j = child.select(F.col(ck)).join(
            parent.select(F.col(pk)),
            on=child[ck] == parent[pk],
            how="left",
        )
        return j.agg(
            F.lit(rel).alias("relationship"),
            F.count(F.lit(1)).alias("n_child_rows"),
            F.sum(F.col(pk).isNull().cast("long")).alias("n_orphans"),
        )

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    return (
        check("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey")
        .unionByName(
            check("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey")
        )
        .unionByName(
            check("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey")
        )
    )


# --------------------------------------------------------------------------
# InfluxQL math transforms (IEEE-exact subset; libm-dependent ones excluded)
# --------------------------------------------------------------------------
@_q(
    "ts_math_transforms",
    """
    SELECT event_id,
           abs(value) AS abs_v,
           ceil(value)::BIGINT AS ceil_v,
           floor(value)::BIGINT AS floor_v,
           sqrt(abs(value)) AS sqrt_abs_v,
           sign(value)::DOUBLE AS sign_v,
           greatest(value, 0.0) AS clamp_lo,
           least(value, 100.0) AS clamp_hi
    FROM events
    """,
)
def ts_math_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL scalar math transforms as plain Catalyst expressions —
    row-local, whole-stage-codegen, pushdown-transparent. Only the
    IEEE-754-exact subset is oracle-hashed (abs/ceil/floor/sqrt/sign/
    greatest/least are correctly-rounded by spec); ln/exp/pow/sin differ
    between Java's and libm's last ulp and are exercised via token_drift's
    ln instead."""
    ev = _t(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.abs(v).alias("abs_v"),
        F.ceil(v).alias("ceil_v"),
        F.floor(v).alias("floor_v"),
        F.sqrt(F.abs(v)).alias("sqrt_abs_v"),
        F.signum(v).alias("sign_v"),
        F.greatest(v, F.lit(0.0)).alias("clamp_lo"),
        F.least(v, F.lit(100.0)).alias("clamp_hi"),
    )


# --------------------------------------------------------------------------
# InfluxQL difference / non_negative_difference (named G5 variants)
# --------------------------------------------------------------------------
@_q(
    "ts_difference",
    """
    WITH d AS (
      SELECT event_type, event_id, ts::TIMESTAMP AS ts, value,
             value - lag(value) OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) AS difference
      FROM events
    )
    SELECT event_type, event_id, ts, value, difference,
           CASE WHEN difference >= 0 THEN difference END
             AS non_negative_difference
    FROM d
    """,
)
def ts_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL difference() and non_negative_difference() per event_type —
    lag deltas (G5's named transform form); negative deltas are NULLed in
    the non-negative column, first point of each series has no delta."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events").select(
        "event_type", "event_id", "ts", "value"
    )
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    diff = F.col("value") - F.lag("value").over(w)
    return ev.withColumn("difference", diff).withColumn(
        "non_negative_difference",
        F.when(F.col("difference") >= 0, F.col("difference")),
    )


# --------------------------------------------------------------------------
# Heatmap panel: time bucket × value bin counts (Grafana heatmap)
# --------------------------------------------------------------------------
@_q(
    "ts_heatmap",
    """
    SELECT date_trunc('day', ts)::TIMESTAMP AS bucket,
           CAST(floor(value / 10.0) AS BIGINT) * 10 AS bin_lo,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grafana heatmap panel: count of points per (day, 10-unit value bin)
    — one partial-aggregable groupBy on the two derived keys; output is
    bounded by buckets × bins regardless of input size."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("bucket"),
        (F.floor(F.col("value") / 10.0).cast("long") * 10).alias("bin_lo"),
    ).agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# Deterministic train/val/test split (contamination-safe corpus splitting)
# --------------------------------------------------------------------------
@_q(
    "split_train_val_test",
    """
    WITH u AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5('split' || chr(31) || CAST(doc_id AS VARCHAR)),
                             1, 14))::BIGINT / 72057594037927936.0 AS uu
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN uu < 0.8 THEN 'train'
                WHEN uu < 0.9 THEN 'val'
                ELSE 'test' END AS split
    FROM u
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 deterministic corpus split keyed on doc_id hash — membership
    never moves across reruns or corpus growth, preventing silent train/test
    contamination (operators.curation.train_val_test_split). Row-local,
    zero shuffles."""
    from ..operators.curation import train_val_test_split

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return train_val_test_split(
        docs, key_cols=["doc_id"], val_frac=0.1, test_frac=0.1
    )


# --------------------------------------------------------------------------
# Daily session metrics (sessionize → rollup; gaps-and-islands oracle)
# --------------------------------------------------------------------------
@_q(
    "sessions_daily",
    """
    WITH e AS (
      SELECT user_id, ts::TIMESTAMP AS ts FROM events
    ), f AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS ns
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), g AS (
      SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS sid
      FROM f
    ), s AS (
      SELECT user_id, sid, min(ts) AS first_ts, max(ts) AS last_ts,
             count(*) AS n_events
      FROM g GROUP BY 1, 2
    )
    SELECT date_trunc('day', first_ts)::TIMESTAMP AS bucket,
           count(*) AS n_sessions,
           CAST(sum(epoch_us(last_ts) - epoch_us(first_ts)) AS DOUBLE)
             / count(*) AS avg_duration_us,
           CAST(sum(n_events) AS DOUBLE) / count(*) AS avg_events
    FROM s GROUP BY 1
    """,
)
def sessions_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily session metrics: sessionize per user at a 30-minute gap
    (timeseries.session_windows — a new session starts when the inter-event
    gap is ≥ gap, matching the oracle's gaps-and-islands form), then roll
    up sessions per day of first event with exact-integer duration sums
    divided once at the end."""
    from ..operators.timeseries import session_windows

    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    s = session_windows(
        ev, ts="ts", dims=["user_id"], gap="30 minutes",
        aggs=[
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
        ],
    )
    return s.groupBy(
        F.date_trunc("day", F.col("first_ts")).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        (
            F.sum(
                F.unix_micros("last_ts") - F.unix_micros("first_ts")
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_duration_us"),
        (
            F.sum("n_events").cast("double") / F.count(F.lit(1))
        ).alias("avg_events"),
    )


# --------------------------------------------------------------------------
# Missing-bucket heartbeat detector (O4 warn-and-skip, queryable form)
# --------------------------------------------------------------------------
@_q(
    "ts_missing_buckets",
    """
    WITH h AS (
      SELECT date_trunc('hour', ts)::TIMESTAMP AS bucket, event_type
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT min(bucket) AS lo, max(bucket) AS hi FROM h
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM bounds
    ), grid AS (
      -- per-series lower bound: onboarding gap is not a missed heartbeat
      SELECT s.bucket, t.event_type
      FROM spine s
      CROSS JOIN (SELECT event_type, min(bucket) AS series_lo
                  FROM h GROUP BY 1) t
      WHERE s.bucket >= t.series_lo
    )
    SELECT g.bucket, g.event_type
    FROM grid g LEFT JOIN h
      ON g.bucket = h.bucket AND g.event_type = h.event_type
    WHERE h.bucket IS NULL
    """,
)
def ts_missing_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours in which an event_type reported nothing — the reference's
    missing-day warning (rg.py:83-84) as a query
    (operators.timeseries.missing_buckets): spine × series grid LEFT ANTI
    observed, output gap-sized."""
    from ..operators.timeseries import missing_buckets

    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return missing_buckets(
        hourly.select("bucket", "event_type"),
        ts="bucket", dims=["event_type"], step="INTERVAL 1 HOUR",
    )


# --------------------------------------------------------------------------
# Corpus ranking & LM scoring (operators/ranking.py): BM25, TF-IDF
# keywords, CCNet-style unigram-LM cross-entropy quality signal
# --------------------------------------------------------------------------
_BM25_TERMS = ("spark", "join", "window")
_DUCK_TOK = (
    "SELECT doc_id, t.tok AS token FROM documents, "
    "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(tok)"
)


@_q(
    "rank_bm25",
    f"""
    WITH tok AS ({_DUCK_TOK}),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs,
                     sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, token, count(*) AS tf FROM tok
      WHERE token IN ('spark', 'join', 'window') GROUP BY 1, 2
    ),
    dft AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    per AS (
      SELECT tf.doc_id,
             CAST(ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
                  * (CAST(tf AS DOUBLE) * (1.2 + 1))
                    / (CAST(tf AS DOUBLE)
                       + 1.2 * (1 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
                  AS DECIMAL(28,12)) AS s
      FROM tf JOIN dft USING (token) JOIN dl USING (doc_id)
      CROSS JOIN stats
    )
    SELECT doc_id, CAST(count(*) AS INT) AS n_matched_terms,
           CAST(sum(s) AS DOUBLE) AS score
    FROM per GROUP BY 1
    """,
)
def rank_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 of every document against a fixed query-term bag
    (operators.ranking.bm25_scores): exact tf/df/dl one-pass aggregates,
    per-row double scoring, decimal-carried per-doc sum."""
    from ..operators.ranking import bm25_scores

    return bm25_scores(_t(spark, sf_dir, "documents"), list(_BM25_TERMS))


@_q(
    "text_tfidf_terms",
    f"""
    WITH tok AS ({_DUCK_TOK}),
    tok3 AS (SELECT * FROM tok WHERE length(token) >= 3),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok3 GROUP BY 1, 2),
    dft AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token AS term, tf.tf, dft.df,
             CAST(CAST(CAST(tf AS DOUBLE)
               * ln(CAST(n_docs AS DOUBLE) / df) AS DECIMAL(28,12))
               AS DOUBLE) AS tfidf
      FROM tf JOIN dft USING (token) CROSS JOIN nd
    )
    SELECT doc_id, term, tf, df, tfidf,
           CAST(row_number() OVER (PARTITION BY doc_id
                ORDER BY tfidf DESC, term) AS INT) AS term_rank
    FROM scored QUALIFY term_rank <= 3
    """,
)
def text_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF keywords (operators.ranking.tfidf_top_terms)
    — the topic labeler for balanced sampling; deterministic tie-break on
    the term itself."""
    from ..operators.ranking import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), top_k=3)


@_q(
    "text_lm_cross_entropy",
    f"""
    WITH tok AS ({_DUCK_TOK}),
    model AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
    consts AS (SELECT sum(c) AS t_total, count(*) AS v_size FROM model),
    scored AS (
      SELECT tok.doc_id,
             CAST(ln((coalesce(model.c, 0)::DOUBLE + 0.5)
                     / (CAST(t_total AS DOUBLE) + 0.5 * v_size))
                  AS DECIMAL(28,12)) AS lp
      FROM tok LEFT JOIN model USING (token) CROSS JOIN consts
    ),
    per AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             -CAST(sum(lp) AS DOUBLE) / count(*) AS cross_entropy
      FROM scored GROUP BY 1
    )
    SELECT d.doc_id, coalesce(per.n_tokens, 0) AS n_tokens,
           per.cross_entropy
    FROM (SELECT doc_id FROM documents) d LEFT JOIN per USING (doc_id)
    """,
)
def text_lm_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality signal: per-doc cross-entropy (nats/token) under
    an add-0.5-smoothed unigram model fit on the corpus itself
    (operators.ranking.unigram_lm_cross_entropy). Filter/bucket on it the
    way CCNet buckets by reference-LM perplexity."""
    from ..operators.ranking import unigram_lm_cross_entropy

    return unigram_lm_cross_entropy(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Cluster canonicalization: the end-to-end dedup pipeline's last step —
# LSH candidates → Jaccard verify → connected components → keep the best
# doc per component (score = n_chars; ties → lowest id).
# --------------------------------------------------------------------------
@_q(
    "dedup_keep_best",
    f"""
    WITH RECURSIVE {_DUCK_MINHASH},
    bands AS (
      SELECT doc_id, j // 4 AS band,
             string_agg(minhash::VARCHAR, '-' ORDER BY j) AS band_key
      FROM sig GROUP BY doc_id, j // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    shin AS (SELECT doc_id, {_DUCK_SHINGLES} AS s FROM docs),
    ver AS (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(sa.s, sb.s))::DOUBLE /
               (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))
               AS jaccard
      FROM cand c
      JOIN shin sa ON sa.doc_id = c.doc_a
      JOIN shin sb ON sb.doc_id = c.doc_b
    ),
    pairs AS (SELECT doc_a, doc_b FROM ver WHERE jaccard >= 0.8),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
    ),
    comp AS (SELECT id, min(r) AS component_id FROM reach GROUP BY id),
    labeled AS (
      SELECT d.doc_id, d.n_chars,
             coalesce(c.component_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    )
    SELECT doc_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS n_members,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY n_chars DESC, doc_id) = 1 AS kept
    FROM labeled
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduplicated-corpus selection (operators.dedup.keep_best_per_cluster):
    every doc labeled with its near-dup cluster, member count, and whether
    it is the kept representative (highest n_chars, ties → lowest id).
    ``filter(kept)`` IS the deduplicated corpus; the full table is the
    removal audit. max_by per cluster — no corpus-wide rank window."""
    from ..operators.dedup import (
        connected_components,
        jaccard_verify_pairs,
        keep_best_per_cluster,
        minhash_lsh_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(docs)
    verified = jaccard_verify_pairs(docs, cand, threshold=0.8)
    clusters = connected_components(verified).withColumnRenamed("id", "doc_id")
    return keep_best_per_cluster(docs, clusters, score_col="n_chars")


# --------------------------------------------------------------------------
# Text normalization (C4-style pre-pass). The fixture text is already
# clean, so deterministic HTML/entity noise is injected in BOTH engines
# (the _PII_SUFFIX pattern) — the correctness row then verifies actual
# stripping, not a pass-through.
# --------------------------------------------------------------------------
_HTML_NOISE_SPARK = (
    "concat('<div class=\"x\"><!-- note -->', text, "
    "' &amp; tail&nbsp;<script>var x=1;</script> “q”')"
)


@_q(
    "text_normalize",
    """
    WITH noisy AS (
      SELECT doc_id,
             concat('<div class="x"><!-- note -->', text,
                    ' &amp; tail&nbsp;<script>var x=1;</script> “q”')
               AS text
      FROM documents
    ), cleaned AS (
      SELECT doc_id, text,
        trim(regexp_replace(
          translate(
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(regexp_replace(regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(text, '<!--.*?-->', ' ', 'g'),
                  '(?i)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
                '<[^>]{0,256}>', ' ', 'g'),
            '&nbsp;', ' ', 'g'), '&amp;', '&', 'g'), '&lt;', '<', 'g'),
            '&gt;', '>', 'g'), '&quot;', '"', 'g'), '&#39;', '''', 'g'),
            '&apos;', '''', 'g'),
            '‘’“”–— …',
            '''''""--  '),
          '[ \\t\\r\\n\\f]+', ' ', 'g')) AS text_clean
      FROM noisy
    )
    SELECT doc_id, text_clean,
           CAST(coalesce(length(text), 0)
                - coalesce(length(text_clean), 0) AS INT) AS n_removed_chars
    FROM cleaned
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style normalization (operators.textstats.normalize_text): strip
    HTML tags/comments/script bodies, decode common entities, ASCII-fold
    unicode punctuation, collapse whitespace — zero shuffles, portable
    regex subset. Noise injected deterministically so the check is
    non-vacuous."""
    from ..operators.textstats import normalize_text

    noisy = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_HTML_NOISE_SPARK).alias("text")
    )
    return normalize_text(noisy).select(
        "doc_id", "text_clean", "n_removed_chars"
    )


# Rows-only (no SQL oracle): Lloyd's k-means is an iterative driver-side
# loop (like connected_components); there is no plain-SQL twin. The fit is
# deterministic (farthest-point init) and unit-tested on separable blobs
# (tests/test_kmeans.py); this entry runs the full train→assign→profile
# pipeline the IVF index build uses on unlabeled corpora.
@_q("emb_kmeans_cells")
def emb_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means-trained IVF cells over the embeddings table
    (operators.similarity.kmeans_fit/kmeans_assign): per-cell member count
    and mean squared distance — the index-balance profile that decides
    whether k/probe settings are right before building the inverted file."""
    from ..operators.similarity import kmeans_assign, kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    cents = kmeans_fit(emb, k=8, max_iter=5)
    return (
        kmeans_assign(emb, cents)
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.col("dist2").cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_dist2"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic shard shuffle (training-data export layout)
# --------------------------------------------------------------------------
@_q(
    "corpus_shards",
    """
    WITH h AS (
      SELECT doc_id, source,
             ('0x' || substr(md5('shard' || chr(31) || CAST(doc_id AS VARCHAR)),
                             1, 14))::BIGINT % 8 AS shard,
             ('0x' || substr(md5('shard.pos' || chr(31) || CAST(doc_id AS VARCHAR)),
                             1, 14))::BIGINT AS _ord
      FROM documents
    )
    SELECT doc_id, source, shard,
           (row_number() OVER (PARTITION BY shard ORDER BY _ord, doc_id) - 1)
             AS shard_pos
    FROM h
    """,
)
def corpus_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding for the training data loader
    (operators.curation.shard_corpus): md5-keyed shard assignment and an
    uncorrelated within-shard pseudo-random order — per-shard row_number
    windows, never a global ORDER BY."""
    from ..operators.curation import shard_corpus

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return shard_corpus(docs, n_shards=8).select(
        "doc_id", "source", F.col("shard").cast("long").alias("shard"),
        "shard_pos",
    )


# --------------------------------------------------------------------------
# Incremental (batch-vs-corpus) near-dup filter
# --------------------------------------------------------------------------
@_q(
    "dedup_incremental_novel",
    f"""
    WITH {_DUCK_MINHASH},
    bands AS (
      SELECT doc_id, j // 4 AS band,
             string_agg(minhash::VARCHAR, '-' ORDER BY j) AS band_key
      FROM sig GROUP BY doc_id, j // 4
    ),
    newdoc AS (
      SELECT doc_id FROM documents WHERE source IN ('src0', 'src1')
    ),
    dup AS (
      SELECT DISTINCT nb.doc_id
      FROM bands nb
      JOIN newdoc USING (doc_id)
      JOIN bands ob ON nb.band = ob.band AND nb.band_key = ob.band_key
      JOIN documents od
        ON ob.doc_id = od.doc_id AND od.source NOT IN ('src0', 'src1')
    )
    SELECT d.doc_id, d.source, d.lang
    FROM documents d JOIN newdoc USING (doc_id)
    WHERE d.doc_id NOT IN (SELECT doc_id FROM dup)
    """,
)
def dedup_incremental_novel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest incremental dedup (operators.dedup.incremental_novel_docs):
    batch docs (source src0/src1) that share NO MinHash LSH band with the
    existing corpus (every other source) — the O(batch), never O(corpus²),
    steady-state path. Band-bucket semi-join, no pair expansion."""
    from ..operators.dedup import incremental_novel_docs

    docs = _t(spark, sf_dir, "documents")
    is_new = F.col("source").isin("src0", "src1")
    return incremental_novel_docs(
        docs.filter(is_new), docs.filter(~is_new)
    ).select("doc_id", "source", "lang")


# --------------------------------------------------------------------------
# Dataset card (release-manifest statistics)
# --------------------------------------------------------------------------
@_q(
    "dataset_card",
    """
    WITH a AS (
      SELECT lang, source, count(*)::BIGINT AS n_docs,
             sum(n_chars)::BIGINT AS total_chars,
             sum(len(regexp_extract_all(lower(text), '[a-z0-9]+')))::BIGINT
               AS total_tokens
      FROM documents GROUP BY lang, source
    )
    SELECT lang, source, n_docs, total_chars, total_tokens,
           n_docs / (sum(n_docs) OVER ()) AS pct_docs,
           total_tokens / (sum(total_tokens) OVER ()) AS pct_tokens
    FROM a
    """,
)
def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card manifest (operators.profile.dataset_card): per
    (lang, source) stratum the doc/char/token totals and corpus shares —
    the mixture audit a training run publishes with its data. One
    partial-aggregable shuffle; shares from a strata-sized window."""
    from ..operators.profile import dataset_card as _card

    return _card(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# InfluxQL compatibility shim (SURVEY §2.4 G1-G7 delegated surface)
# --------------------------------------------------------------------------
@_q(
    "influxql_hourly_mean",
    """
    SELECT date_trunc('hour', ts::TIMESTAMP) AS time, event_type,
           sum(CAST(value AS DECIMAL(27,6)))::DOUBLE / count(value)
             AS mean_value,
           count(value)::BIGINT AS n,
           max(value) AS max_value
    FROM events
    WHERE ts::TIMESTAMP >= '2024-01-02 00:00:00'
      AND ts::TIMESTAMP <  '2024-01-09 00:00:00'
    GROUP BY 1, 2
    """,
)
def influxql_hourly_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A Grafana dashboard panel query run VERBATIM through the InfluxQL
    shim (functions.influxql): epoch-aligned time(1h) buckets per tag with
    decimal-accumulated mean — the reference's dashboards keep working
    word-for-word on the Spark engine."""
    from ..functions.influxql import influxql

    events = _t(spark, sf_dir, "events")
    return influxql(
        lambda _m: events,
        "SELECT mean(value) AS mean_value, count(value) AS n, "
        "max(value) AS max_value FROM events "
        "WHERE time >= '2024-01-02 00:00:00' AND time < '2024-01-09 00:00:00' "
        "GROUP BY time(1h), event_type",
    )


@_q(
    "influxql_daily_derivative",
    """
    WITH b AS (
      SELECT date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS time, event_type,
             sum(CAST(value AS DECIMAL(27,6)))::DOUBLE AS s
      FROM events GROUP BY 1, 2
    ), d AS (
      SELECT time, event_type,
             ((s - lag(s) OVER w) * 86400.0)
               / (epoch(time) - epoch(lag(time) OVER w)) AS deriv
      FROM b WINDOW w AS (PARTITION BY event_type ORDER BY time)
    )
    SELECT time, event_type, deriv FROM d WHERE deriv IS NOT NULL
    """,
)
def influxql_daily_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CI size-regression panel itself, through the InfluxQL shim:
    derivative(sum(value), 1d) per tag — value delta over ACTUAL time delta
    (gap-robust), scaled to per-day units, first bucket omitted."""
    from ..functions.influxql import influxql

    events = _t(spark, sf_dir, "events")
    return influxql(
        lambda _m: events,
        "SELECT derivative(sum(value), 1d) AS deriv FROM events "
        "GROUP BY time(1d), event_type",
    )


@_q(
    "influxql_cumulative_sum",
    """
    WITH b AS (
      SELECT date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS time, event_type,
             sum(CAST(value AS DECIMAL(27,6)))::DOUBLE AS s
      FROM events GROUP BY 1, 2
    )
    SELECT time, event_type,
           CAST(sum(CAST(s AS DECIMAL(28,6))) OVER (
             PARTITION BY event_type ORDER BY time
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS cs
    FROM b
    """,
)
def influxql_cumulative_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``cumulative_sum(sum(value))`` through the shim — running
    total of daily bucket sums per tag (the 'total bytes flashed to date'
    dashboard panel). DECIMAL at both hops keeps the hash engine-stable."""
    from ..functions.influxql import influxql

    events = _t(spark, sf_dir, "events")
    return influxql(
        lambda _m: events,
        "SELECT cumulative_sum(sum(value)) AS cs FROM events "
        "GROUP BY time(1d), event_type",
    )


@_q(
    "influxql_difference",
    """
    WITH b AS (
      SELECT date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS time, event_type,
             count(value)::BIGINT AS n
      FROM events GROUP BY 1, 2
    ), d AS (
      SELECT time, event_type,
             n - lag(n) OVER (PARTITION BY event_type ORDER BY time) AS d
      FROM b
    )
    SELECT time, event_type, d FROM d WHERE d IS NOT NULL
    """,
)
def influxql_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``difference(count(value))`` through the shim — bucket-over-
    bucket delta per tag, first bucket omitted (InfluxDB emits nothing for
    it). Pure integer arithmetic."""
    from ..functions.influxql import influxql

    events = _t(spark, sf_dir, "events")
    return influxql(
        lambda _m: events,
        "SELECT difference(count(value)) AS d FROM events "
        "GROUP BY time(1d), event_type",
    )


@_q(
    "influxql_stddev_daily",
    """
    SELECT date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS time, event_type,
           round(CASE WHEN count(value) > 1 THEN sqrt(
             (CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE)
              - CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                * CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value))
             / (count(value) - 1)) END, 6) AS sd
    FROM events GROUP BY 1, 2
    """,
)
def influxql_stddev_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``stddev(value)`` through the shim, per day and tag —
    sample stddev from exact DECIMAL (Σx, Σx²) so the distributed merge
    order can't perturb bits; rounded 6dp on both sides (the final sqrt is
    pure double and engines may differ in the last ulp)."""
    from ..functions.influxql import influxql

    events = _t(spark, sf_dir, "events")
    out = influxql(
        lambda _m: events,
        "SELECT stddev(value) AS sd FROM events GROUP BY time(1d), event_type",
    )
    return out.withColumn("sd", F.round("sd", 6))


@_q(
    "influxql_tz_day",
    """
    SELECT TIMESTAMP '1970-01-01'
             + (((epoch_us(ts::TIMESTAMP) // 1000000 + 19800) // 86400)
                * 86400 - 19800) * INTERVAL 1 SECOND AS time,
           count(value)::BIGINT AS n
    FROM events
    GROUP BY 1
    """,
)
def influxql_tz_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY time(1d) tz('+05:30')`` — day buckets anchored to the
    zone's local midnight (18:30 UTC), the Grafana timezone-shifted
    dashboard case VERDICT r02 flagged. Fixed-offset zone so the oracle is
    pure integer epoch arithmetic."""
    from ..functions.influxql import influxql

    events = _t(spark, sf_dir, "events")
    return influxql(
        lambda _m: events,
        "SELECT count(value) AS n FROM events GROUP BY time(1d) tz('+05:30')",
    )


@_q(
    "influxql_count_distinct",
    """
    SELECT date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS time,
           count(DISTINCT user_id)::BIGINT AS n
    FROM events GROUP BY 1
    """,
)
def influxql_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``count(distinct(user_id))`` per day through the shim —
    the daily-active-users dashboard panel."""
    from ..functions.influxql import influxql

    events = _t(spark, sf_dir, "events")
    return influxql(
        lambda _m: events,
        "SELECT count(distinct(user_id)) AS n FROM events GROUP BY time(1d)",
    )


@_q(
    "influxql_mode",
    """
    WITH c AS (
      SELECT date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS time, event_type,
             value, count(*) AS cnt
      FROM events GROUP BY 1, 2, 3
    )
    SELECT time, event_type, value AS mode FROM c
    QUALIFY row_number() OVER (PARTITION BY time, event_type
                               ORDER BY cnt DESC, value ASC) = 1
    """,
)
def influxql_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``mode(value)`` per day and tag — two partial-aggregable
    groupBys (count per value, then argmax), InfluxDB's lowest-value tie
    rule."""
    from ..functions.influxql import influxql

    events = _t(spark, sf_dir, "events")
    return influxql(
        lambda _m: events,
        "SELECT mode(value) FROM events GROUP BY time(1d), event_type",
    )


@_q(
    "influxql_field_math",
    """
    SELECT date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS time, event_type,
           (sum(CAST(value AS DECIMAL(27,6)))::DOUBLE / count(value)) * 8
             AS bits
    FROM events
    WHERE value > 100
    GROUP BY 1, 2
    """,
)
def influxql_field_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field arithmetic through the shim — ``mean(value) * 8`` with a
    numeric WHERE on the field (the Grafana bytes→bits unit conversion
    every network dashboard carries)."""
    from ..functions.influxql import influxql

    events = _t(spark, sf_dir, "events")
    return influxql(
        lambda _m: events,
        "SELECT mean(value) * 8 AS bits FROM events WHERE value > 100 "
        "GROUP BY time(1d), event_type",
    )


@_q(
    "influxql_subquery",
    """
    WITH h AS (
      SELECT date_trunc('hour', ts::TIMESTAMP) AS time, event_type,
             max(value) AS mx
      FROM events GROUP BY 1, 2
    )
    SELECT date_trunc('day', time)::TIMESTAMP AS time, event_type,
           sum(CAST(mx AS DECIMAL(27,6)))::DOUBLE / count(mx) AS m
    FROM h GROUP BY 1, 2
    """,
)
def influxql_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL subquery (``FROM (SELECT …)``) — daily mean of hourly
    maxima, the canonical Grafana two-stage rollup panel. The inner query
    compiles recursively; the outer reads its bucketed output."""
    from ..functions.influxql import influxql

    events = _t(spark, sf_dir, "events")
    return influxql(
        lambda _m: events,
        "SELECT mean(mx) AS m FROM "
        "(SELECT max(value) AS mx FROM events GROUP BY time(1h), event_type) "
        "GROUP BY time(1d), event_type",
    )


@_q(
    "influxql_fill_linear",
    """
    WITH src AS (
      SELECT ts::TIMESTAMP AS ts, value FROM events
      WHERE value > 280
        AND ts::TIMESTAMP >= '2024-01-02 00:00:00'
        AND ts::TIMESTAMP <= '2024-01-09 00:00:00'
    ), b AS (
      SELECT date_trunc('hour', ts) AS time,
             sum(CAST(value AS DECIMAL(27,6)))::DOUBLE / count(value) AS m
      FROM src GROUP BY 1
    ), spine AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-02 00:00:00',
                                    TIMESTAMP '2024-01-09 00:00:00',
                                    INTERVAL 1 HOUR)) AS time
    ), j AS (
      SELECT s.time, b.m,
             last_value(b.m IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN b.m IS NOT NULL THEN epoch(s.time) END
                        IGNORE NULLS) OVER wb AS pt,
             first_value(b.m IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN b.m IS NOT NULL THEN epoch(s.time) END
                         IGNORE NULLS) OVER wf AS nt
      FROM spine s LEFT JOIN b USING (time)
      WINDOW wb AS (ORDER BY s.time
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (ORDER BY s.time
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT time,
           CASE WHEN m IS NOT NULL THEN m
                WHEN pv IS NOT NULL AND nv IS NOT NULL
                THEN pv + (nv - pv) * (epoch(time) - pt) / (nt - pt)
           END AS m
    FROM j
    """,
)
def influxql_fill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxDB ``fill(linear)`` through the shim over a sparse series
    (rare high-value events): interior gaps interpolate between the
    neighboring observed buckets, leading/trailing gaps stay null. The
    interpolation double-expression tree is written identically on both
    engines so the hash matches bit-for-bit."""
    from ..functions.influxql import influxql

    sparse = _t(spark, sf_dir, "events").filter(F.col("value") > 280)
    return influxql(
        lambda _m: sparse,
        "SELECT mean(value) AS m FROM events "
        "WHERE time >= '2024-01-02 00:00:00' AND time <= '2024-01-09 00:00:00' "
        "GROUP BY time(1h) fill(linear)",
    )


@_q(
    "influxql_top_points",
    """
    WITH s AS (
      SELECT event_type, ts::TIMESTAMP AS ts, max(value) AS value
      FROM events GROUP BY 1, 2
    ), r AS (
      SELECT ts AS time, event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, ts) AS rn
      FROM s
    )
    SELECT time, event_type, value AS top FROM r WHERE rn <= 3
    """,
)
def influxql_top_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``top(value, 3)`` per tag — a row SELECTOR: the 3 extreme
    POINTS with their own timestamps, not one row per group. Fed a series
    deduplicated on (tag, ts) so the (value, ts) ordering is total and the
    pick deterministic on every engine."""
    from ..functions.influxql import influxql

    series = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", "ts")
        .agg(F.max("value").alias("value"))
    )
    return influxql(
        lambda _m: series,
        "SELECT top(value, 3) FROM events GROUP BY event_type",
    )


@_q(
    "influxql_elapsed",
    """
    WITH s AS (
      SELECT event_type, ts::TIMESTAMP AS ts
      FROM events GROUP BY 1, 2
    ), d AS (
      SELECT ts AS time, event_type,
             (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY event_type ORDER BY ts)) * 1000 AS dns
      FROM s
    )
    SELECT time, event_type, dns // 1000000000 AS elapsed
    FROM d WHERE dns IS NOT NULL
    """,
)
def influxql_elapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``elapsed(value, 1s)`` per tag through the shim — integer
    seconds between consecutive points (ns-space integer div, exact).
    Deduplicated on (tag, ts) so the lag order is total."""
    from ..functions.influxql import influxql

    series = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", "ts")
        .agg(F.max("value").alias("value"))
    )
    return influxql(
        lambda _m: series,
        "SELECT elapsed(value, 1s) FROM events GROUP BY event_type",
    )


# --------------------------------------------------------------------------
# BPE tokenizer-training pair counts
# --------------------------------------------------------------------------
@_q(
    "bpe_pair_counts",
    """
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM documents
    ), wf AS (
      SELECT w, count(*) AS f FROM toks GROUP BY w
    ), pairs AS (
      SELECT substr(w, i::INT, 2) AS pair, f
      FROM wf, unnest(range(1, length(w))) AS t(i)
      WHERE length(w) >= 2
    )
    SELECT pair, sum(f)::BIGINT AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair ASC LIMIT 50
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training pair statistics
    (operators.textstats.bpe_pair_counts): adjacent-char-pair frequencies
    weighted by the word-frequency table — corpus-scale tokenizer training's
    inner reduction, vocab-sized after the first shuffle."""
    from ..operators.textstats import bpe_pair_counts as _bpe

    return _bpe(_t(spark, sf_dir, "documents"))


# Rows-only (no SQL oracle): BPE training is an iterative argmax loop like
# k-means/CC; deterministic (lexicographic tie-break) and property-tested
# against a reference Python BPE (tests/test_curation.py).
@_q("bpe_train_merges")
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training over the documents corpus
    (operators.textstats.bpe_train): corpus → word-frequency table once,
    then vocab-sized merge rounds; returns the learned rules in order."""
    from ..operators.textstats import bpe_train

    merges = bpe_train(_t(spark, sf_dir, "documents"), n_merges=8)
    return spark.createDataFrame(
        [(i, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "merge_rank long, left string, right string, merged string",
    )


# Rows-only (no SQL oracle): unigram-LM training is the same iterative
# class as bpe_train (fixed-iteration hard EM with deterministic Viterbi
# tie-breaks and a deterministic prune order); parity-tested against an
# independent reference Python trainer (tests/test_textstats.py).
@_q("unigram_train_pieces")
def unigram_train_pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SentencePiece-style unigram tokenizer training over the documents
    corpus (operators.textstats.unigram_train): corpus → word-frequency
    table once, substring-seeded candidates, hard-EM Viterbi iterations
    over the vocab table, deterministic count-ordered prune — the second
    trainer of the tokenizer family (train/apply for both BPE and
    unigram).  Probabilities round to 9 dp for a stable readout."""
    from ..operators.textstats import unigram_train

    pieces = unigram_train(
        _t(spark, sf_dir, "documents"),
        vocab_size=48, n_iter=2, max_piece_len=4, seed_candidates=150,
    )
    return spark.createDataFrame(
        [(i, p, round(pr, 9)) for i, (p, pr) in enumerate(pieces)],
        "piece_rank long, piece string, prob double",
    )


@_q(
    "dedup_graph_degrees",
    f"""
    WITH {_DUCK_MINHASH},
    bands AS (
      SELECT doc_id, j // 4 AS band,
             string_agg(minhash::VARCHAR, '-' ORDER BY j) AS band_key
      FROM sig GROUP BY doc_id, j // 4
    ), p AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ), nodes AS (
      SELECT doc_a AS id FROM p UNION ALL SELECT doc_b FROM p
    )
    SELECT id, count(*)::BIGINT AS degree FROM nodes GROUP BY id
    """,
)
def dedup_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup graph degree profile (operators.dedup.dup_graph_degree_stats
    over the MinHash LSH pairs): the boilerplate-chaining early warning a
    dedup run checks before trusting its connected components."""
    from ..operators.dedup import dup_graph_degree_stats, minhash_lsh_pairs

    return dup_graph_degree_stats(
        minhash_lsh_pairs(_t(spark, sf_dir, "documents"))
    )


@_q(
    "repeated_span_ranges",
    """
    WITH grams AS (
      SELECT doc_id, text,
             unnest(range(1, greatest(1, len(text) - 20 + 1) + 1)) AS i
      FROM documents
    ), hashed AS (
      SELECT doc_id, i,
             ('0x' || substr(md5(substr(text, CAST(i AS INT), 20)), 1, 14))::BIGINT AS h
      FROM grams
    ), docs_h AS (
      SELECT doc_id, list(h ORDER BY i) AS hs FROM hashed GROUP BY doc_id
    ), wins AS (
      SELECT doc_id, unnest([
               {'fp': list_min(hs[j:j+7]),
                'pos': j - 1 + list_position(hs[j:j+7], list_min(hs[j:j+7]))}
               for j in range(1, greatest(1, len(hs) - 8 + 1) + 1)]) AS s
      FROM docs_h
    ), fpp AS (
      SELECT DISTINCT doc_id, s.fp AS fingerprint, s.pos AS pos FROM wins
    ), ranked AS (
      SELECT *, dense_rank() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS dr
      FROM fpp
    ), withn AS (
      SELECT *, max(dr) OVER (PARTITION BY fingerprint) AS n_docs FROM ranked
    ), rep AS (
      SELECT DISTINCT doc_id, pos AS strt, pos + 20 AS en
      FROM withn WHERE n_docs >= 2
    ), isl AS (
      SELECT doc_id, strt, en,
             CASE WHEN max(en) OVER w IS NULL OR strt > max(en) OVER w
                  THEN 1 ELSE 0 END AS f
      FROM rep
      WINDOW w AS (PARTITION BY doc_id ORDER BY strt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), grp AS (
      SELECT *, sum(f) OVER (PARTITION BY doc_id ORDER BY strt
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS island
      FROM isl
    )
    SELECT doc_id, min(strt)::BIGINT AS span_start, max(en)::BIGINT AS span_end,
           count(*)::BIGINT AS n_grams
    FROM grp GROUP BY doc_id, island
    """,
)
def repeated_span_ranges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup ranges (operators.dedup.repeated_span_ranges): the
    merged character intervals of cross-document repeated spans — detection
    (repeated_spans) turned into actionable substring removal."""
    from ..operators.dedup import repeated_span_ranges

    return repeated_span_ranges(_t(spark, sf_dir, "documents"))


@_q(
    "emb_assign_fixed_cells",
    """
    WITH cents AS (
      SELECT j::INT AS j,
             list_transform(range(0, 64),
               i -> CASE WHEN i % 4 = j THEN 1.0 ELSE 0.0 END) AS c
      FROM (SELECT unnest(range(0, 4)) AS j)
    ), scored AS (
      SELECT e.vec_id, cents.j AS cell,
             round(list_sum(list_transform(range(0, 64),
               i -> (e.embedding[i+1]::DOUBLE - cents.c[i+1])
                    * (e.embedding[i+1]::DOUBLE - cents.c[i+1]))), 6) AS dist2
      FROM embeddings e CROSS JOIN cents
    )
    SELECT vec_id, cell::BIGINT AS cell, dist2
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cell) = 1
    """,
)
def emb_assign_fixed_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell ASSIGNMENT oracle-paired in isolation (the trainer's
    iterative loop is rows-only, but the assignment kernel — broadcast
    centroid literals, row-local argmin with the (dist2, cell) tie rule —
    is exactly checkable): four fixed axis-pattern centroids, every vector
    to its nearest cell."""
    from ..operators.similarity import kmeans_assign

    cents = [
        [1.0 if i % 4 == j else 0.0 for i in range(64)] for j in range(4)
    ]
    return kmeans_assign(_t(spark, sf_dir, "embeddings"), cents).select(
        "vec_id", F.col("cell").cast("long").alias("cell"), "dist2"
    )


@_q(
    "lsh_recall_vs_exact",
    f"""
    WITH documents AS (
      SELECT * FROM main.documents
      WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 14))::BIGINT % 1000 < 500
    ),
    {_DUCK_MINHASH},
    bands AS (
      SELECT doc_id, j // 4 AS band,
             string_agg(minhash::VARCHAR, '-' ORDER BY j) AS band_key
      FROM sig GROUP BY doc_id, j // 4
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ), shex AS (
      SELECT doc_id, unnest({_DUCK_SHINGLES}) AS s
      FROM (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents)
    ), sizes AS (SELECT doc_id, count(*) AS n FROM shex GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM shex a JOIN shex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), truth AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= 0.8
    )
    SELECT (SELECT count(*) FROM truth)::BIGINT AS n_truth,
           (SELECT count(*) FROM cand)::BIGINT AS n_candidates,
           (SELECT count(*) FROM truth JOIN cand USING (doc_a, doc_b))::BIGINT
             AS n_hit,
           CASE WHEN (SELECT count(*) FROM truth) = 0 THEN 1.0
                ELSE (SELECT count(*) FROM truth JOIN cand USING (doc_a, doc_b))::DOUBLE
                     / (SELECT count(*) FROM truth) END AS recall
    """,
)
def lsh_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measure, don't guess: recall of the MinHash LSH candidate set against
    exact n-gram Jaccard ≥ 0.8 ground truth — the banding-parameter
    validation a dedup run performs on a sample before trusting LSH at
    corpus scale.

    PRODUCTION CONTRACT: the exact all-shingle side is quadratic in the
    candidate-document mass and must NEVER run on a full corpus — so the
    sampling lives INSIDE this query: a deterministic md5 keep-half
    (``hash56(doc_id) % 1000 < 500``) restricts BOTH sides to the same
    subcorpus before any pair generation. Same sample on every run and
    engine (no RNG); at 100 TB, tighten the per-mille rate, never remove
    the gate."""
    from ..operators.dedup import hash56, minhash_lsh_pairs, ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents").filter(
        hash56(F.col("doc_id").cast("string")) % 1000 < 500
    )
    truth = ngram_jaccard_pairs(docs, threshold=0.8).select("doc_a", "doc_b")
    cand = minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    hit = truth.join(cand, ["doc_a", "doc_b"], "left_semi")
    n_truth = truth.count()
    return spark.createDataFrame(
        [(n_truth, cand.count(), hit.count())],
        "n_truth long, n_candidates long, n_hit long",
    ).select(
        "n_truth", "n_candidates", "n_hit",
        F.when(F.col("n_truth") == 0, F.lit(1.0))
        .otherwise(F.col("n_hit").cast("double") / F.col("n_truth"))
        .alias("recall"),
    )


@_q(
    "ann_quantized_rescore",
    """
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id < 10
    ), base AS (
      SELECT vec_id, embedding, list_min(embedding)::DOUBLE AS vmin,
             list_max(embedding)::DOUBLE AS vmax
      FROM embeddings
    ), deq AS (
      SELECT vec_id, list_transform(embedding, x ->
               CASE WHEN vmax = vmin THEN vmin
                    ELSE vmin + (floor((x::DOUBLE - vmin) * 254.0
                                       / (vmax - vmin) + 0.5) - 127 + 127)
                         * ((vmax - vmin) / 254.0) END) AS dv
      FROM base
    ), approx AS (
      SELECT q.query_id, d.vec_id AS neighbor_id,
             round(list_dot_product(d.dv, q.qv::DOUBLE[])
                   / (sqrt(list_dot_product(d.dv, d.dv))
                      * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))),
                   6) AS ascore
      FROM deq d CROSS JOIN q WHERE d.vec_id != q.query_id
    ), cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY ascore DESC, neighbor_id) AS rn
        FROM approx)
      WHERE rn <= 15
    ), resc AS (
      SELECT c.query_id, c.neighbor_id,
             round(list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])
                   / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                            e.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))),
                   6) AS score
      FROM cand c
      JOIN embeddings e ON e.vec_id = c.neighbor_id
      JOIN q ON q.query_id = c.query_id
    )
    SELECT query_id, neighbor_id, score, rank FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rank
      FROM resc)
    WHERE rank <= 5
    """,
)
def ann_quantized_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN (operators.similarity.quantized_rescore_topk): int8
    approximate scan keeps 3k candidates per query, exact float cosine
    re-ranks only those — the 4×-smaller-store memory-bandwidth pattern
    that keeps brute-force viable at corpus scale."""
    from ..operators.similarity import quantized_rescore_topk

    emb = _t(spark, sf_dir, "embeddings")
    return quantized_rescore_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, rescore_factor=3
    )


@_q(
    "j6_interval_overlap",
    """
    WITH iv AS (
      SELECT l_suppkey, l_orderkey, l_linenumber,
             l_shipdate::TIMESTAMP AS ship_start,
             l_shipdate::TIMESTAMP
               + ((l_quantity::INT % 14) + 1) * INTERVAL 1 DAY AS ship_end
      FROM lineitem
    )
    SELECT a.l_suppkey, count(*)::BIGINT AS n_overlapping_pairs
    FROM iv a JOIN iv b
      ON a.l_suppkey = b.l_suppkey
     AND (a.l_orderkey, a.l_linenumber) < (b.l_orderkey, b.l_linenumber)
     AND a.ship_start <= b.ship_end
     AND b.ship_start <= a.ship_end
    GROUP BY 1
    """,
)
def j6_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join
    (operators.rangejoin.interval_overlap_join): per supplier, how many
    pairs of its shipments were in transit simultaneously — banded
    self-join with first-shared-band dedup, never a nested loop. Transit
    spans are synthesized deterministically (1-14 days from quantity; the
    fixture has no receipt date). The oracle is the naive quadratic form
    (fine at sf0.01; the banded plan is the scale path)."""
    from ..operators.rangejoin import interval_overlap_join

    ship = F.col("l_shipdate").cast("timestamp")
    dur_days = (F.col("l_quantity").cast("int") % 14 + 1).cast("long")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        ship.alias("ship_start"),
        F.timestamp_seconds(
            F.unix_timestamp(ship) + dur_days * 86400
        ).alias("ship_end"),
    )
    pairs = interval_overlap_join(
        li, li, "ship_start", "ship_end", on=["l_suppkey"]
    )
    ordered = F.struct(F.col("l_orderkey"), F.col("l_linenumber")) < F.struct(
        F.col("l_orderkey_b"), F.col("l_linenumber_b")
    )
    return (
        pairs.filter(ordered)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_overlapping_pairs"))
    )


@_q(
    "skew_profile_custkey",
    """
    WITH c AS (
      SELECT o_custkey, count(*)::BIGINT AS n FROM orders GROUP BY 1
    ), r AS (
      SELECT o_custkey, n,
             row_number() OVER (ORDER BY n ASC, o_custkey ASC) AS r_asc,
             row_number() OVER (ORDER BY n DESC, o_custkey ASC) AS rank
      FROM c
    ), g AS (
      SELECT o_custkey, n, rank,
             sum(n) OVER () AS total,
             count(*) OVER () AS k,
             sum(n * r_asc) OVER () AS weighted,
             sum(n) OVER (ORDER BY n DESC, o_custkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM r
    )
    SELECT o_custkey, n,
           round(n / total, 6) AS share,
           round(cum / total, 6) AS cum_share,
           rank::INT AS rank,
           round((2.0 * weighted) / (k * total) - (k + 1.0) / k, 6) AS gini
    FROM g WHERE rank <= 20
    """,
)
def skew_profile_custkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic (operators.profile.key_skew_profile): top
    customers by order count with shares, running concentration, and the
    distribution's Gini — read this before picking salting / AQE-skew
    thresholds for a 100 TB join on the key."""
    from ..operators.profile import key_skew_profile

    return key_skew_profile(_t(spark, sf_dir, "orders"), "o_custkey", top_n=20)


@_q(
    "emb_outliers_fixed",
    """
    WITH cents AS (
      SELECT j::INT AS j,
             list_transform(range(0, 64),
               i -> CASE WHEN i % 4 = j THEN 1.0 ELSE 0.0 END) AS c
      FROM (SELECT unnest(range(0, 4)) AS j)
    ), scored AS (
      SELECT e.vec_id, cents.j AS cell,
             round(list_sum(list_transform(range(0, 64),
               i -> (e.embedding[i+1]::DOUBLE - cents.c[i+1])
                    * (e.embedding[i+1]::DOUBLE - cents.c[i+1]))), 6) AS dist2
      FROM embeddings e CROSS JOIN cents
    ), best AS (
      SELECT vec_id, cell, dist2 FROM scored
      QUALIFY row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cell) = 1
    ), stats AS (
      SELECT cell, count(*)::BIGINT AS _n,
             CAST(sum(CAST(dist2 AS DECIMAL(18,6))) AS DOUBLE) AS _sx,
             CAST(sum(CAST(dist2 AS DECIMAL(18,6))
                      * CAST(dist2 AS DECIMAL(18,6))) AS DOUBLE) AS _sxx
      FROM best GROUP BY cell
    )
    SELECT b.vec_id, b.cell::INT AS cell, b.dist2,
           CASE WHEN _n > 1 THEN
             round((b.dist2 - _sx / _n)
                   / sqrt((_sxx - _sx * _sx / _n) / (_n - 1)), 6) END AS z,
           coalesce(CASE WHEN _n > 1 THEN
             round((b.dist2 - _sx / _n)
                   / sqrt((_sxx - _sx * _sx / _n) / (_n - 1)), 6) > 2.0 END,
             false) AS is_outlier
    FROM best b JOIN stats USING (cell)
    """,
)
def emb_outliers_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier gate (operators.similarity.
    embedding_outliers): distance-to-nearest-centroid z-score per cell over
    fixed axis centroids — the corpus-QA pass that catches corrupt or
    degenerate embeddings before dedup/ANN consume them."""
    from ..operators.similarity import embedding_outliers

    cents = [
        [1.0 if i % 4 == j else 0.0 for i in range(64)] for j in range(4)
    ]
    return embedding_outliers(
        _t(spark, sf_dir, "embeddings"), cents, z_threshold=2.0
    ).select(
        "vec_id", F.col("cell").cast("int").alias("cell"),
        "dist2", "z", "is_outlier",
    )


@_q(
    "emb_random_projection",
    """
    WITH proj AS (
      SELECT r, list_transform(range(0, 64),
               i -> (((r*13 + i*7) % 11) - 5) / 5.0) AS p
      FROM (SELECT unnest(range(0, 8)) AS r)
    )
    SELECT e.vec_id, (proj.r + 1)::INT AS r,
           round(list_sum(list_transform(range(0, 64),
             i -> e.embedding[i+1]::DOUBLE * proj.p[i+1])), 6) AS value
    FROM embeddings e CROSS JOIN proj
    """,
)
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL-style random projection (operators.similarity.random_projection):
    64-dim embeddings onto 8 fixed directions — zero-shuffle row-local
    dots, the preprocessing that shrinks vectors before LSH/clustering at
    corpus scale. Directions are integer-derived rationals so both engines
    materialize identical doubles."""
    from ..operators.similarity import random_projection

    proj = [
        [((r * 13 + i * 7) % 11 - 5) / 5.0 for i in range(64)]
        for r in range(8)
    ]
    return random_projection(_t(spark, sf_dir, "embeddings"), proj)


#: Fixed PQ codebooks for oracle pairing (the trainer is iterative —
#: rows-only by design, like the IVF k-means; the ENCODE and ADC-search
#: kernels are exactly checkable against fixed books): m=4 subspaces of 16
#: dims, ks=8 codes, centroid[j][c][i] = ((c·7 + i·3 + j·5) mod 13 − 6)/12
#: — integer-derived rationals both engines materialize identically.
_PQ_BOOKS = [
    [
        [((c * 7 + i * 3 + j * 5) % 13 - 6) / 12.0 for i in range(16)]
        for c in range(8)
    ]
    for j in range(4)
]

_PQ_CENTS_SQL = """
    cents AS (
      SELECT j, c,
             list_transform(range(0, 16),
               i -> (((c*7 + i*3 + j*5) % 13) - 6) / 12.0) AS cent
      FROM (SELECT unnest(range(0, 4)) AS j),
           (SELECT unnest(range(0, 8)) AS c)
    ), scored AS (
      SELECT e.vec_id, cents.j, cents.c,
             round(list_sum(list_transform(range(0, 16),
               i -> (e.embedding[cents.j*16 + i + 1]::DOUBLE - cents.cent[i+1])
                  * (e.embedding[cents.j*16 + i + 1]::DOUBLE - cents.cent[i+1])
             )), 6) AS dist2
      FROM embeddings e CROSS JOIN cents
    )"""


@_q(
    "chunk_sentences",
    r"""
    WITH pun AS (
      -- the synthetic corpus has no punctuation; sentencify it
      -- deterministically (period after every 8th word) so the packing
      -- path is non-vacuous
      SELECT doc_id,
             regexp_replace(text, '((\w+ ){7}\w+) ', '\1. ', 'g') AS text
      FROM documents
    ), raw AS (
      SELECT doc_id,
             list_filter(list_transform(
               regexp_extract_all(text, '[^.!?]+[.!?]*'), x -> trim(x)),
               x -> x != '') AS sents
      FROM pun
    ), flat AS (
      SELECT doc_id,
             unnest([{'idx': i, 's': sents[i]}
                     for i in range(1, len(sents) + 1)]) AS u
      FROM raw
    ), asg AS (
      SELECT doc_id, u.idx AS idx, u.s AS sentence,
             coalesce(sum(length(u.s)) OVER (
               PARTITION BY doc_id ORDER BY u.idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS before
      FROM flat
    )
    SELECT doc_id, (before // 200)::BIGINT AS chunk_id,
           string_agg(sentence, ' ' ORDER BY idx) AS chunk_text,
           count(*)::BIGINT AS n_sentences,
           sum(length(sentence))::BIGINT AS n_chars
    FROM asg GROUP BY doc_id, (before // 200)
    """,
)
def chunk_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-aligned chunking (operators.curation.chunk_by_sentences):
    RAG/context chunks that never cut mid-sentence — sentences stream into
    a 200-char running budget, same pack semantics as pack_sequences. The
    corpus is deterministically sentencified first (period every 8th word:
    the synthetic docs carry no punctuation) so multi-chunk packing is
    actually exercised."""
    from ..operators.curation import chunk_by_sentences

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace("text", r"((\w+ ){7}\w+) ", "$1. ").alias("text"),
    )
    return chunk_by_sentences(docs, max_chars=200)


@_q(
    "pq_assign_fixed",
    f"""
    WITH {_PQ_CENTS_SQL}
    SELECT vec_id, j::INT AS sub, c::INT AS code, dist2
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY vec_id, j
                               ORDER BY dist2, c) = 1
    """,
)
def pq_assign_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ENCODE kernel (operators.similarity.pq_codes) oracle-paired in
    isolation: per-subspace nearest-centroid codes over fixed codebooks —
    row-local argmin (6-dp, ties → lower code), zero shuffles; the write
    path of a PQ index build."""
    from ..operators.similarity import pq_codes

    return pq_codes(_t(spark, sf_dir, "embeddings"), _PQ_BOOKS)


@_q(
    "ann_pq_topk",
    f"""
    WITH {_PQ_CENTS_SQL}, codes AS (
      SELECT vec_id, j, c AS code FROM scored
      QUALIFY row_number() OVER (PARTITION BY vec_id, j
                                 ORDER BY dist2, c) = 1
    ), q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id < 10
    ), lut AS (
      SELECT q.query_id, cents.j, cents.c,
             CAST(round(round(list_sum(list_transform(range(0, 16),
               i -> (q.qv[cents.j*16 + i + 1]::DOUBLE - cents.cent[i+1])
                  * (q.qv[cents.j*16 + i + 1]::DOUBLE - cents.cent[i+1])
             )), 6) * 1000000) AS BIGINT) AS d2u
      FROM q CROSS JOIN cents
    ), adist AS (
      SELECT l.query_id, cd.vec_id AS neighbor_id,
             sum(l.d2u) / 1000000.0 AS adist
      FROM codes cd JOIN lut l ON l.j = cd.j AND l.c = cd.code
      WHERE cd.vec_id != l.query_id
      GROUP BY 1, 2
    ), cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY adist ASC, neighbor_id) AS rn
        FROM adist)
      WHERE rn <= 15
    ), resc AS (
      SELECT c.query_id, c.neighbor_id,
             round(list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])
                   / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                            e.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))),
                   6) AS score
      FROM cand c
      JOIN embeddings e ON e.vec_id = c.neighbor_id
      JOIN q ON q.query_id = c.query_id
    )
    SELECT query_id, neighbor_id, score, rank FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rank
      FROM resc)
    WHERE rank <= 5
    """,
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage PQ ANN (operators.similarity.pq_topk) over fixed
    codebooks: ADC scan reads m ints per corpus vector via the per-query
    lookup table (integer micro-unit sums — engine-exact), keeps 3k
    candidates, exact float cosine re-ranks only those. The codes-not-
    floats scan is the memory-bandwidth rung below int8 rescore."""
    from ..operators.similarity import pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return pq_topk(
        emb, emb.filter(F.col("vec_id") < 10), _PQ_BOOKS, k=5, rescore_factor=3
    )


@_q(
    "ts_weekly_profile",
    """
    SELECT event_type, dayofweek(ts::TIMESTAMP) AS dow,
           hour(ts::TIMESTAMP) AS hour,
           count(*)::BIGINT AS n,
           sum(CAST(value AS DECIMAL(27,6)))::DOUBLE / count(value)
             AS mean_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def ts_weekly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonal profile (operators.timeseries.weekly_profile): the
    per-(series, dow, hour) baseline a dashboard overlays and an anomaly
    detector subtracts."""
    from ..operators.timeseries import weekly_profile

    ev = _t(spark, sf_dir, "events")
    return weekly_profile(ev, dims=["event_type"], ts="ts", value="value").select(
        "event_type", F.col("dow").cast("long").alias("dow"),
        F.col("hour").cast("long").alias("hour"), "n", "mean_value",
    )


@_q(
    "dedup_report_by_source",
    f"""
    WITH {_DUCK_MINHASH},
    bands AS (
      SELECT doc_id, j // 4 AS band,
             string_agg(minhash::VARCHAR, '-' ORDER BY j) AS band_key
      FROM sig GROUP BY doc_id, j // 4
    ), lsh_docs AS (
      SELECT DISTINCT a.doc_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id <> b.doc_id
    ), fp AS (
      SELECT doc_id, source,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS f
      FROM documents
    ), canon AS (
      SELECT doc_id, source,
             min(doc_id) OVER (PARTITION BY f) AS canonical_id
      FROM fp
    )
    SELECT c.source,
           count(*)::BIGINT AS n_docs,
           count(*) FILTER (c.doc_id <> c.canonical_id)::BIGINT AS n_exact_dup,
           count(l.doc_id)::BIGINT AS n_near_candidates
    FROM canon c LEFT JOIN lsh_docs l ON l.doc_id = c.doc_id
    GROUP BY c.source
    """,
)
def dedup_report_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup governance report: per source, how many docs are exact
    duplicates (non-canonical members of a fingerprint group) and how many
    collide in any MinHash band — the per-domain duplication profile that
    decides which crawl sources need cleaning first."""
    from ..operators.dedup import exact_dedup_groups, minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    canon = exact_dedup_groups(docs).select("doc_id", "canonical_id")
    pairs = minhash_lsh_pairs(docs)
    lsh_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        docs.select("doc_id", "source")
        .join(canon, "doc_id")
        .join(lsh_docs, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("doc_id") != F.col("canonical_id"), 1).otherwise(0)
            ).alias("n_exact_dup"),
            F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias(
                "n_near_candidates"
            ),
        )
    )


@_q(
    "ts_seasonal_anomalies",
    """
    WITH k AS (
      SELECT event_type, ts::TIMESTAMP AS ts, value,
             dayofweek(ts::TIMESTAMP) AS dow, hour(ts::TIMESTAMP) AS hour
      FROM events
    ), prof AS (
      SELECT event_type, dow, hour,
             sum(CAST(value AS DECIMAL(27,6)))::DOUBLE / count(value) AS m
      FROM k GROUP BY 1, 2, 3
    ), wb AS (
      SELECT k.event_type, k.ts, k.value, k.value - prof.m AS residual
      FROM k JOIN prof USING (event_type, dow, hour)
    ), mom AS (
      SELECT event_type, count(*) AS n,
             sum(CAST(residual AS DECIMAL(18,6)))::DOUBLE AS sr,
             sum(CAST(residual AS DECIMAL(18,6))
                 * CAST(residual AS DECIMAL(18,6)))::DOUBLE AS srr
      FROM wb GROUP BY 1
    )
    SELECT event_type, ts, value, residual, residual_sd,
           (abs(residual) > 3.0 * residual_sd AND residual_sd > 0)
             AS is_anomaly
    FROM (
      SELECT wb.event_type, wb.ts, wb.value, wb.residual,
             round(sqrt(greatest((srr - sr * sr / n) / n, 0.0)), 6)
               AS residual_sd
      FROM wb JOIN mom USING (event_type))
    """,
)
def ts_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomalies
    (operators.timeseries.seasonal_residual_anomalies): residual vs the
    weekly (dow, hour) baseline, flagged beyond 3 per-series residual
    sigmas — the detector that does not cry wolf every weekend."""
    from ..operators.timeseries import seasonal_residual_anomalies

    ev = _t(spark, sf_dir, "events")
    out = seasonal_residual_anomalies(
        ev, dims=["event_type"], ts="ts", value="value"
    )
    # hash-gate determinism: the raw sd's final double expression differs
    # by 1 ulp across engines (re-association); round it and re-derive the
    # flag from the rounded value on both sides
    sd_r = F.round(F.col("residual_sd"), 6)
    return out.select(
        "event_type", "ts", "value", "residual",
        sd_r.alias("residual_sd"),
        ((F.abs(F.col("residual")) > 3.0 * sd_r) & (sd_r > 0)).alias(
            "is_anomaly"
        ),
    )


@_q(
    "event_transitions",
    """
    WITH nxt AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    ), pairs AS (
      SELECT from_type, to_type, count(*)::BIGINT AS n
      FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           n / (sum(n) OVER (PARTITION BY from_type)) AS share_of_source
    FROM pairs
    """,
)
def event_transitions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order user-behavior transition graph
    (operators.funnel.event_transitions): consecutive event-type pairs per
    user with per-source shares — the free-form complement of the fixed
    funnel."""
    from ..operators.funnel import event_transitions

    return event_transitions(_t(spark, sf_dir, "events"))


@_q(
    "customer_rfm",
    """
    WITH cust AS (
      SELECT o_custkey AS custkey,
             date_diff('day', max(o_orderdate), DATE '1998-12-31')::BIGINT
               AS recency_days,
             count(*)::BIGINT AS frequency,
             sum(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE AS monetary
      FROM orders GROUP BY 1
    )
    SELECT custkey, recency_days, frequency, monetary,
           ntile(5) OVER (ORDER BY recency_days DESC, custkey) AS r_score,
           ntile(5) OVER (ORDER BY frequency ASC, custkey) AS f_score,
           ntile(5) OVER (ORDER BY monetary ASC, custkey) AS m_score
    FROM cust
    """,
)
def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over orders: recency vs the dataset's
    fixed anchor date (no hidden clock), frequency, decimal-exact monetary,
    and ntile(5) scores with custkey tie-breaks so quintile edges are
    deterministic. Higher score = better on every axis.

    Scale note: the three ntile windows are GLOBAL sorts of the
    customer-level aggregate (not the fact table) — fine to |customers|;
    at extreme cardinality swap ntile for bucketing on approx quantiles.
    """
    orders = _t(spark, sf_dir, "orders")
    cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit("1998-12-31").cast("date"), F.max("o_orderdate")
        ).cast("long").alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("monetary"),
    )
    w_r = Window.orderBy(F.desc("recency_days"), F.asc("custkey"))
    w_f = Window.orderBy(F.asc("frequency"), F.asc("custkey"))
    w_m = Window.orderBy(F.asc("monetary"), F.asc("custkey"))
    return cust.select(
        "custkey", "recency_days", "frequency", "monetary",
        F.ntile(5).over(w_r).alias("r_score"),
        F.ntile(5).over(w_f).alias("f_score"),
        F.ntile(5).over(w_m).alias("m_score"),
    )


@_q(
    "basket_part_pairs",
    """
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*)::BIGINT AS n_orders
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, n_orders FROM pairs WHERE n_orders >= 2
    """,
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing together in ≥ 2
    orders. The self-join is keyed on l_orderkey, so pair expansion is
    bounded by the largest single order (≤ 7 lines in TPC-H — C(7,2)=21
    pairs), never the corpus: the same in-bucket-only pair discipline as
    LSH."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


@_q(
    "bm25_search_topk",
    f"""
    WITH tok AS ({_DUCK_TOK}),
    q AS (
      SELECT doc_id AS query_id,
             array_to_string(
               (regexp_extract_all(lower(text), '[a-z0-9]+'))[1:5], ' ') AS qt
      FROM documents WHERE doc_id < 3
    ),
    qtok AS (
      SELECT DISTINCT query_id, t.tok AS token
      FROM q, unnest(regexp_extract_all(lower(qt), '[a-z0-9]+')) AS t(tok)
    ),
    vocab AS (SELECT DISTINCT token FROM qtok),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs,
                     sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM tok JOIN vocab USING (token) GROUP BY 1, 2
    ),
    dft AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    per AS (
      SELECT qtok.query_id, tf.doc_id,
             CAST(ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
                  * (CAST(tf AS DOUBLE) * (1.2 + 1))
                    / (CAST(tf AS DOUBLE)
                       + 1.2 * (1 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
                  AS DECIMAL(28,12)) AS s
      FROM tf JOIN dft USING (token) JOIN dl USING (doc_id)
      CROSS JOIN stats JOIN qtok USING (token)
    ),
    scored AS (
      SELECT query_id, doc_id, CAST(count(*) AS INT) AS n_matched_terms,
             CAST(sum(s) AS DOUBLE) AS score
      FROM per GROUP BY 1, 2
    )
    SELECT query_id, doc_id, n_matched_terms, score,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT)
             AS rank
    FROM scored QUALIFY rank <= 5
    """,
)
def bm25_search_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-query BM25 retrieval (operators.ranking.bm25_search_topk):
    top-5 docs for each of three query rows (first five words of docs 0-2
    — deterministic fixture queries). Shared df/dl/avgdl, broadcast query
    vocabulary, per-query window cut."""
    from ..operators.dedup import words
    from ..operators.ranking import bm25_search_topk

    docs = _t(spark, sf_dir, "documents")
    queries = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(words(F.col("text")), 1, 5), " ").alias(
            "query_text"
        ),
    )
    return bm25_search_topk(docs, queries, k=5)


@_q(
    "semdedup_keep_best",
    f"""
    WITH RECURSIVE {_DUCK_NEARDUP_PAIRS}, edges AS (
      SELECT vec_a AS a, vec_b AS b FROM pairs
      UNION SELECT vec_b, vec_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
    ),
    comp AS (SELECT id, min(r) AS component_id FROM reach GROUP BY id),
    labeled AS (
      SELECT d.doc_id, d.n_chars,
             coalesce(c.component_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    )
    SELECT doc_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS n_members,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY n_chars DESC, doc_id) = 1 AS kept
    FROM labeled
    """,
)
def semdedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup proper (Abbas et al. 2023's shape): SEMANTIC near-dup
    clusters from the embedding space (sign-bucket-blocked cosine pairs →
    connected components, vec_id ≡ doc_id in the fixture) canonicalized by
    TEXT quality (keep the longest member) — embedding clusters decide WHO
    is duplicated, document features decide WHO survives. Same
    keep_best_per_cluster reduction as the MinHash path."""
    from ..operators.dedup import connected_components, keep_best_per_cluster

    pairs = _neardup_pairs(spark, sf_dir).select("vec_a", "vec_b")
    clusters = connected_components(pairs, src="vec_a", dst="vec_b")
    docs = _t(spark, sf_dir, "documents")
    return keep_best_per_cluster(
        docs, clusters.withColumnRenamed("id", "doc_id"), score_col="n_chars"
    )


@_q(
    "pareto_parts",
    """
    WITH pr AS (
      SELECT l_partkey AS partkey,
             sum((l_extendedprice::DECIMAL(12,2))
                 * (1 - l_discount::DECIMAL(3,2))) AS revenue
      FROM lineitem GROUP BY 1
    ), ranked AS (
      SELECT partkey, revenue,
             sum(revenue) OVER (ORDER BY revenue DESC, partkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_rev,
             sum(revenue) OVER () AS tot_rev
      FROM pr
    )
    SELECT partkey, revenue::DOUBLE AS revenue,
           cum_rev::DOUBLE / tot_rev::DOUBLE AS cum_share,
           CASE WHEN cum_rev::DOUBLE / tot_rev::DOUBLE <= 0.8 THEN 'A'
                WHEN cum_rev::DOUBLE / tot_rev::DOUBLE <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
)
def pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC revenue analysis: parts ranked by discounted revenue with
    cumulative share and A/B/C class (80/95 cuts) — the concentration
    profile behind assortment decisions. The running share is DECIMAL-exact
    until the final division.

    Scale note: the cumulative window is a global ORDER over the PART
    AGGREGATE (|parts| rows), never the fact table — same discipline as
    customer_rfm's ntiles.
    """
    li = _t(spark, sf_dir, "lineitem")
    # factor-wise decimal casts (price/discount are exact at 2dp) — the
    # double PRODUCT cast to decimal rounds engine-specifically at ties
    pr = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (1 - F.col("l_discount").cast("decimal(3,2)"))
        ).alias("_rev")
    )
    w_run = Window.orderBy(F.desc("_rev"), F.asc("partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum_share = (
        F.sum("_rev").over(w_run).cast("double")
        / F.sum("_rev").over(w_all).cast("double")
    )
    return pr.select(
        "partkey",
        F.col("_rev").cast("double").alias("revenue"),
        cum_share.alias("cum_share"),
    ).withColumn(
        "abc_class",
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C"),
    )


def _langid_confusion_oracle() -> str:
    score_cols, best_lang = _langid_fold()
    return f"""
    WITH toks_t AS (
      SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ), scored AS (
      SELECT doc_id, lang, {score_cols} FROM toks_t
    ), pred AS (
      SELECT lang, {best_lang} AS predicted_lang FROM scored
    ), cm AS (
      SELECT lang, predicted_lang, count(*)::BIGINT AS n
      FROM pred GROUP BY 1, 2
    )
    SELECT lang, predicted_lang, n,
           n / (sum(n) OVER (PARTITION BY lang)) AS row_share
    FROM cm
    """


@_q("lang_id_confusion", _langid_confusion_oracle())
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-audit confusion matrix for the language-ID heuristic: labeled
    ``lang`` vs ``predicted_lang`` counts with per-true-label shares — the
    quality gate you run on an operator that GATES data before trusting it
    to curate a corpus (diagonal share = per-language recall)."""
    from pyspark.sql import Window

    from ..operators.textstats import predict_lang

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    cm = (
        predict_lang(docs)
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang")
    return cm.select(
        "lang", "predicted_lang", "n",
        (F.col("n") / F.sum("n").over(w)).alias("row_share"),
    )


@_q(
    "supplier_scorecard",
    """
    SELECT l_suppkey AS suppkey,
           count(*)::BIGINT AS n_lines,
           sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END)::BIGINT AS n_late,
           sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END) / count(*) AS late_rate,
           sum((l_extendedprice::DECIMAL(12,2))
               * (1 - l_discount::DECIMAL(3,2)))::DOUBLE AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier operational scorecard: line volume, late-shipment count
    and rate (ship > order + 60 days — Q12's lateness emulation as a
    continuous per-supplier metric), and decimal-exact discounted revenue.
    One fact⋈fact equi-join + one partial-aggregable shuffle to
    |suppliers| rows."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    late = F.when(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60), 1
    ).otherwise(0)
    return joined.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(late).alias("n_late"),
        (F.sum(late) / F.count(F.lit(1))).alias("late_rate"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (1 - F.col("l_discount").cast("decimal(3,2)"))
        ).cast("double").alias("revenue"),
    )


@_q(
    "decontaminated_corpus",
    f"""
    WITH docs AS (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents),
    grams AS (SELECT doc_id, unnest({_DUCK_SHINGLES}) AS g FROM docs),
    ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
    tr AS (SELECT doc_id, g FROM grams WHERE doc_id % 97 != 0),
    shared AS (
      SELECT tr.doc_id, count(*) AS n_shared_ngrams
      FROM tr JOIN ev USING (g) GROUP BY tr.doc_id
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    LEFT JOIN shared s USING (doc_id)
    WHERE d.doc_id % 97 != 0 AND coalesce(s.n_shared_ngrams, 0) < 5
    """,
)
def decontaminated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL step contamination_check exists for: the training corpus
    with every doc sharing ≥ 5 word-3-grams with the benchmark set (doc_id
    % 97 fixture eval split) dropped — broadcast eval n-grams, one corpus
    scan, survivors only."""
    from ..operators.curation import contamination_check as check

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    flags = check(
        train, docs.filter(F.col("doc_id") % 97 == 0), threshold=5
    ).filter(~F.col("contaminated")).select("doc_id")
    return train.select("doc_id", "lang", "source", "n_chars").join(
        flags, "doc_id", "left_semi"
    )


# --------------------------------------------------------------------------
# Round-4 additions (DEFER_TO_NEXT_WINDOW: registered last so the r04 driver
# window still covers the older pending tail; they head the r05 window)
# --------------------------------------------------------------------------
@_q(
    "dq_winsorize_events",
    """
    WITH b AS (
      SELECT event_type,
             round(quantile_cont(value, 0.01), 6) AS p_lo,
             round(quantile_cont(value, 0.99), 6) AS p_hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           least(greatest(e.value, b.p_lo), b.p_hi) AS winsorized,
           (e.value < b.p_lo OR e.value > b.p_hi) AS clipped
    FROM events e JOIN b ON e.event_type IS NOT DISTINCT FROM b.event_type
    """,
)
def dq_winsorize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type [p01, p99] winsorization of the event metric
    (operators.profile.winsorize): one percentile pass to a #types-row
    bounds table, broadcast back, row-local clamp — outlier treatment
    without dropping rows."""
    from ..operators.profile import winsorize

    ev = _t(spark, sf_dir, "events")
    return winsorize(ev).select(
        "event_id", "event_type", "value", "winsorized", "clipped"
    )


@_q(
    "mixture_temperature",
    """
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    s AS (
      SELECT lang, n, n::DOUBLE / sum(n) OVER () AS share,
             CAST(pow(n::DOUBLE / sum(n) OVER (), 0.5) AS DECIMAL(27,12))
               AS raised
      FROM c
    )
    SELECT lang, n, round(share, 6) AS share,
           round(raised::DOUBLE / (sum(raised) OVER ())::DOUBLE, 6)
             AS sample_share,
           round(round(raised::DOUBLE / (sum(raised) OVER ())::DOUBLE, 6)
                 / round(share, 6), 6) AS boost
    FROM s
    """,
)
def mixture_temperature_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-T=2 mixture reweighting over langs
    (operators.curation.temperature_mixture): sampling share ∝ share^(1/T),
    the multilingual-LM low-resource boost. One groupBy; windows run over
    the 5-row aggregate; the ^(1/2) leg is sqrt (correctly-rounded IEEE,
    engine-stable) and the normalization sum goes through DECIMAL."""
    from ..operators.curation import temperature_mixture

    return temperature_mixture(_t(spark, sf_dir, "documents"))


@_q(
    "emb_l2_normalize",
    """
    WITH b AS (
      SELECT vec_id, embedding,
             round(sqrt(list_sum(list_transform(embedding,
                     x -> x::DOUBLE * x::DOUBLE))), 6) AS nrm
      FROM embeddings
    )
    SELECT vec_id, i::INT AS i,
           CASE WHEN nrm = 0.0 THEN 0.0
                ELSE round(embedding[i]::DOUBLE / nrm, 6) END AS u,
           nrm
    FROM b, (SELECT unnest(range(1, 65)) AS i)
    """,
)
def emb_l2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-normalized embedding store, relational output
    (operators.similarity.l2_normalize): row-local double fold for the norm
    + posexplode — zero shuffles; downstream cosine becomes a plain dot."""
    from ..operators.similarity import l2_normalize

    return l2_normalize(_t(spark, sf_dir, "embeddings"))


@_q("mm_phash_pairs")  # rows-only by design: the DCT has no SQL twin; the
# hash math is unit-tested (orthonormal basis, recall-vs-brute-force) and
# the banding layer is the SAME hamming_banded_pairs the hash-green
# dedup_simhash_pairs runs through.
def mm_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs over the fixture media table: 64-bit
    perceptual hash (REAL 32×32 DCT-II + median threshold over the
    documented stub luma decode, operators.multimodal.phash_images) +
    pigeonhole-banded Hamming join (dedup.hamming_banded_pairs) — the image
    half of corpus dedup, never all-pairs.

    Radius 7 with 8 bands is deliberate band-arithmetic: bands must divide
    64 and exceed the radius, and 8 bands give 8-BIT keys (256 values) —
    radius 8 would force 16 bands of 4-bit keys (16 values), whose huge
    buckets cost ~3× in pair expansion (measured at sf0.1)."""
    from ..operators.multimodal import media_from_documents, phash_near_dup_pairs

    media = media_from_documents(_t(spark, sf_dir, "documents"))
    return phash_near_dup_pairs(media, max_hamming=7, bands=8)


@_q(
    "dedup_containment_pairs",
    f"""
    WITH docs AS (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents),
    sh AS (SELECT doc_id, unnest({_DUCK_SHINGLES}) AS s FROM docs),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           inter::DOUBLE / least(sa.n, sb.n) AS containment,
           CASE WHEN sa.n <= sb.n THEN doc_a ELSE doc_b END AS contained
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE inter::DOUBLE / least(sa.n, sb.n) >= 0.6
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment ≥ 0.6 (operators.dedup.
    ngram_containment_pairs): |A∩B| / min(|A|,|B|) with the contained
    (smaller-set) doc named — catches quotation/subset duplication whose
    Jaccard is structurally tiny. Same inverted-index join bound as the
    Jaccard verifier."""
    from ..operators.dedup import ngram_containment_pairs

    return ngram_containment_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.6
    )


@_q(
    "ccnet_perplexity_buckets",
    f"""
    WITH tok AS ({_DUCK_TOK}),
    model AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
    consts AS (SELECT sum(c) AS t_total, count(*) AS v_size FROM model),
    scored AS (
      SELECT tok.doc_id,
             CAST(ln((coalesce(model.c, 0)::DOUBLE + 0.5)
                     / (CAST(t_total AS DOUBLE) + 0.5 * v_size))
                  AS DECIMAL(28,12)) AS lp
      FROM tok LEFT JOIN model USING (token) CROSS JOIN consts
    ),
    per AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             -CAST(sum(lp) AS DOUBLE) / count(*) AS cross_entropy
      FROM scored GROUP BY 1
    ),
    j AS (
      SELECT d.doc_id, d.lang, coalesce(per.n_tokens, 0) AS n_tokens,
             per.cross_entropy
      FROM documents d LEFT JOIN per USING (doc_id)
    ),
    b AS (
      SELECT *, ntile(3) OVER (PARTITION BY lang
               ORDER BY cross_entropy ASC NULLS LAST, doc_id ASC)
               AS ppl_bucket
      FROM j
    )
    SELECT doc_id, lang, n_tokens, cross_entropy, ppl_bucket::INT AS ppl_bucket,
           CASE ppl_bucket WHEN 1 THEN 'head' WHEN 3 THEN 'tail'
                ELSE 'middle' END AS bucket_name,
           ppl_bucket < 3 AS keep
    FROM b
    """,
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity split per language
    (operators.ranking.perplexity_buckets): unigram-LM cross-entropy
    n-tiles with deterministic (score, id, NULLS LAST) ordering; ``keep``
    is the CCNet head+middle training set."""
    from ..operators.ranking import perplexity_buckets

    return perplexity_buckets(_t(spark, sf_dir, "documents"))


@_q("mm_audio_neardup")  # rows-only by design: FFT band energies have no
# SQL twin; the fingerprint math is unit-tested (determinism, exact-dup,
# recall-vs-brute-force) and the banding layer is the shared
# hamming_banded_pairs the hash-green dedup_simhash_pairs runs through.
def mm_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate pairs over the fixture media table: 32-bit
    chromaprint-style acoustic fingerprint (REAL framed-FFT band-energy
    double-deltas over the documented stub PCM decode,
    operators.multimodal.audio_fingerprints) + pigeonhole Hamming banding —
    with the text (SimHash), image (pHash) and audio paths, every modality
    has a banded near-dup route and none is all-pairs.

    The fixture's shared 16-byte payload is too short for a spectral
    fingerprint (2-sample frames ⇒ 4 distinct fingerprints over the whole
    corpus ⇒ quadratic pair output); the audio path derives 256-byte
    payloads from the same documents, and carries the max_bucket_size
    boilerplate guard production pair generation always runs with."""
    from ..operators.multimodal import audio_near_dup_pairs

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.substring("text", 1, 256), "UTF-8").alias("payload"),
        F.lit("audio").alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.col("n_chars").alias("duration_ms"),
    )
    return audio_near_dup_pairs(
        media, max_hamming=3, bands=4, max_bucket_size=200
    )


@_q(
    "text_bigram_lm",
    """
    WITH bg AS (
      SELECT doc_id, g[1] AS a, g[2] AS b
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(words)),
                      i -> [words[i], words[i+1]])) AS g
        FROM (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS words
              FROM documents)
      )
    ),
    model AS (SELECT a, b, count(*) AS c2 FROM bg GROUP BY 1, 2),
    ctx AS (SELECT a, count(*) AS c1 FROM bg GROUP BY 1),
    vocab AS (
      SELECT count(DISTINCT t.tok) AS v_size
      FROM documents, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
           AS t(tok)
    ),
    scored AS (
      SELECT bg.doc_id,
             CAST(ln((coalesce(model.c2, 0)::DOUBLE + 0.5)
                     / (coalesce(ctx.c1, 0)::DOUBLE + 0.5 * v_size))
                  AS DECIMAL(28,12)) AS lp
      FROM bg
      LEFT JOIN model USING (a, b)
      LEFT JOIN ctx USING (a)
      CROSS JOIN vocab
    ),
    per AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             -CAST(sum(lp) AS DOUBLE) / count(*) AS cross_entropy
      FROM scored GROUP BY 1
    )
    SELECT d.doc_id, coalesce(per.n_bigrams, 0) AS n_bigrams,
           per.cross_entropy
    FROM (SELECT doc_id FROM documents) d LEFT JOIN per USING (doc_id)
    """,
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM cross-entropy per document
    (operators.ranking.bigram_lm_cross_entropy) — the order-sensitive
    quality signal the unigram model can't provide: shuffled-word soup and
    fluent prose have identical unigram scores but very different bigram
    ones. Add-0.5 smoothing, model = observed-pair groupBy (never V²)."""
    from ..operators.ranking import bigram_lm_cross_entropy

    return bigram_lm_cross_entropy(_t(spark, sf_dir, "documents"))


@_q(
    "freq_heavy_hitters",
    f"""
    WITH tok AS ({_DUCK_TOK}),
    tot AS (SELECT count(*) AS n FROM tok),
    c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1)
    SELECT token, CAST(cnt AS BIGINT) AS cnt,
           cnt::DOUBLE / n AS share
    FROM c, tot
    WHERE cnt > n * 0.033
    """,
)
def freq_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent-items over the corpus token stream
    (operators.profile.heavy_hitters): batched Misra-Gries candidates per
    partition + exact broadcast-semi-join recount — equals ``GROUP BY
    HAVING cnt > N*min_share`` without ever shuffling the full distinct-key
    set. min_share 0.033 splits the fixture vocabulary mid-distribution
    at every SF (17/18/20 of 31 words pass at sf0.001/0.01/0.1), so the
    strict-threshold edge is exercised."""
    from ..operators.profile import heavy_hitters
    from ..operators.textstats import tokens

    toks = _t(spark, sf_dir, "documents").select(
        F.explode(tokens("text")).alias("token")
    )
    return heavy_hitters(toks, key_col="token", min_share=0.033)


@_q(
    "freq_heavy_hitters_grouped",
    """
    WITH tok AS (
      SELECT source, t.tok AS token FROM documents,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(tok)
    ),
    tot AS (SELECT source, count(*) AS n FROM tok GROUP BY 1),
    c AS (SELECT source, token, count(*) AS cnt FROM tok GROUP BY 1, 2)
    SELECT c.source, token, CAST(cnt AS BIGINT) AS cnt,
           cnt::DOUBLE / n AS share
    FROM c JOIN tot ON c.source = tot.source
    WHERE cnt > n * 0.033
    """,
)
def freq_heavy_hitters_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source trending tokens (operators.profile.heavy_hitters_grouped):
    the windowed/grouped Misra-Gries + exact-recount form — the batch twin
    of streaming.stateful.stream_heavy_hitters, whose per-bucket MG state
    this operator reproduces over a static corpus. Exactly equals GROUP BY
    source, token HAVING cnt > N_source*0.033 without shuffling the full
    distinct (source, token) set — phase 1 is a zero-shuffle map-side
    summary, phase 2 shuffles only candidate rows."""
    from ..operators.profile import heavy_hitters_grouped
    from ..operators.textstats import tokens

    toks = _t(spark, sf_dir, "documents").select(
        "source", F.explode(tokens("text")).alias("token")
    )
    return heavy_hitters_grouped(
        toks, key_col="token", group_col="source", min_share=0.033
    )


@_q(
    "dedup_paragraph_hashes",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
      FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(range(0, len(ts))) AS p, unnest(ts) AS token
      FROM toks
    ),
    blk AS (
      SELECT doc_id, p // 10 AS blk_id,
             md5(string_agg(token, ' ' ORDER BY p)) AS uh
      FROM tok GROUP BY 1, 2 HAVING count(*) = 10
    ),
    xdoc AS (SELECT uh, count(DISTINCT doc_id) AS nd FROM blk GROUP BY 1)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_units,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_units,
           sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)
             AS dup_rate
    FROM blk JOIN xdoc USING (uh)
    GROUP BY doc_id
    """,
)
def dedup_paragraph_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-level (ExactSubstr-style) dedup report: non-overlapping
    10-token blocks as the paragraph proxy (the fixture corpus is
    single-line), md5 per block, per-doc rate of blocks shared with other
    documents (operators.dedup.paragraph_dedup_stats). Complements
    winnowing: winnowing localizes overlapping repeated SPANS, this rates
    whole documents by repeated-unit mass with one explode + two keyed
    aggregations — the cheap pass Lee et al. pair with MinHash."""
    from ..operators.dedup import paragraph_dedup_stats

    return paragraph_dedup_stats(
        _t(spark, sf_dir, "documents"), block_tokens=10
    )


@_q(
    "corpus_global_index",
    """
    WITH k AS (
      SELECT doc_id,
             ('0x' || substr(md5('gidx' || chr(31)
                 || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT AS h
      FROM documents
    )
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT)
             AS global_pos
    FROM k
    """,
)
def corpus_global_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global contiguous 0-based corpus position in deterministic
    pseudo-random order (operators.curation.global_index) — the
    DataFrame-native zipWithIndex: md5-range bucketing + per-bucket count
    offsets + per-bucket rank, never a single-reducer global ORDER BY
    window. Bit-equal to ``row_number() OVER (ORDER BY h, doc_id) - 1``."""
    from ..operators.curation import global_index

    return global_index(_t(spark, sf_dir, "documents"))


#: Deterministic URL fixture for the URL-curation query: documents carry no
#: URL column, so one is derived in-query (varied schemes / www / mixed
#: case / default port / tracking params / fragments / trailing slashes;
#: even doc_ids collapse onto site0.com so the over-cap flag is
#: non-vacuous). The oracle builds the IDENTICAL string.
_DUCK_URL_RAW = """
    SELECT doc_id,
      (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'HTTPS://' END)
      || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
      || (CASE WHEN doc_id % 2 = 0 THEN 'Site0'
               ELSE 'Site' || CAST(doc_id % 7 AS VARCHAR) END)
      || '.'
      || (CASE WHEN doc_id % 2 = 0 THEN 'com'
               ELSE CASE doc_id % 5 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                    WHEN 2 THEN 'co.uk' WHEN 3 THEN 'io' ELSE 'net' END
          END)
      || (CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END)
      || '/docs/' || source || '/p' || CAST(doc_id % 13 AS VARCHAR)
      || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
      || (CASE WHEN doc_id % 6 = 0
               THEN '?utm_source=feed&page=' || CAST(doc_id % 3 AS VARCHAR)
               WHEN doc_id % 6 = 1
               THEN '?page=' || CAST(doc_id % 3 AS VARCHAR)
                    || '&utm_campaign=x'
               WHEN doc_id % 6 = 2 THEN '?gclid=abc' ELSE '' END)
      || (CASE WHEN doc_id % 8 = 0 THEN '#section' ELSE '' END) AS url
    FROM documents
"""


def _url_fixture(docs: DataFrame) -> DataFrame:
    """Spark twin of ``_DUCK_URL_RAW`` (same derived raw-URL strings)."""
    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    url = F.concat(
        F.when(i % 2 == 0, "http://").otherwise("HTTPS://"),
        F.when(i % 3 == 0, "www.").otherwise(""),
        F.when(i % 2 == 0, F.lit("Site0")).otherwise(
            F.concat(F.lit("Site"), s(i % 7))
        ),
        F.lit("."),
        F.when(i % 2 == 0, F.lit("com")).otherwise(
            F.when(i % 5 == 0, "com")
            .when(i % 5 == 1, "org")
            .when(i % 5 == 2, "co.uk")
            .when(i % 5 == 3, "io")
            .otherwise("net")
        ),
        F.when(i % 11 == 0, ":443").otherwise(""),
        F.concat(F.lit("/docs/"), F.col("source"), F.lit("/p"), s(i % 13)),
        F.when(i % 4 == 0, "/").otherwise(""),
        F.when(i % 6 == 0, F.concat(F.lit("?utm_source=feed&page="), s(i % 3)))
        .when(
            i % 6 == 1,
            F.concat(F.lit("?page="), s(i % 3), F.lit("&utm_campaign=x")),
        )
        .when(i % 6 == 2, F.lit("?gclid=abc"))
        .otherwise(""),
        F.when(i % 8 == 0, "#section").otherwise(""),
    )
    return docs.select("doc_id", url.alias("url"))


@_q(
    "url_dedup_domains",
    f"""
    WITH raw AS ({_DUCK_URL_RAW}),
    n1 AS (
      SELECT regexp_replace(regexp_replace(regexp_replace(
               lower(url), '#.*$', ''), '^http://', 'https://'),
               '^https://www\\.', 'https://') AS u
      FROM raw
    ),
    n2 AS (
      SELECT regexp_replace(regexp_replace(u,
               '^(https://[^/:]+):443/', '\\1/'),
               '^(https://[^/:]+):443$', '\\1') AS u
      FROM n1
    ),
    n3 AS (
      SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace(u,
               '[?&](utm_[a-z0-9]+|fbclid|gclid|ref)=[^&#]*', '', 'g'),
               '^([^?&]*)&', '\\1?'), '[?&]+$', ''), '/+$', '') AS u
      FROM n2
    ),
    dom AS (
      SELECT u, regexp_extract(u, '^https://([^/:?#]+)', 1) AS host
      FROM n3
    ),
    d2 AS (
      SELECT u,
        CASE WHEN coalesce(regexp_extract(host,
               '([^.]+\\.(?:co|com|org|net|ac|gov)\\.(?:uk|au|jp|br|in))$',
               1), '') <> ''
             THEN regexp_extract(host,
               '([^.]+\\.(?:co|com|org|net|ac|gov)\\.(?:uk|au|jp|br|in))$',
               1)
             WHEN coalesce(regexp_extract(host, '([^.]+\\.[^.]+)$', 1), '')
                  <> ''
             THEN regexp_extract(host, '([^.]+\\.[^.]+)$', 1)
             ELSE host END AS domain
      FROM dom
    ),
    agg AS (
      SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT u) AS BIGINT) AS n_urls
      FROM d2 GROUP BY 1
    ),
    tot AS (SELECT sum(n_docs) AS total FROM agg)
    SELECT domain, n_docs, n_urls,
           1.0 - n_urls::DOUBLE / n_docs AS dup_ratio,
           n_docs::DOUBLE / total AS share,
           n_docs::DOUBLE / total > 0.25 AS over_cap
    FROM agg, tot
    """,
)
def url_dedup_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain URL-dedup curation report (operators.curation.
    url_domain_report over functions.scalars.normalize_url /
    registered_domain): normalized-URL duplicate mass, corpus share and
    the over-representation cap flag per registrable domain — the crawl
    curation step beside text dedup. URL fixture derived in-query (see
    ``_DUCK_URL_RAW``); even doc_ids collapse onto one domain so
    ``over_cap`` exercises both branches."""
    from ..operators.curation import url_domain_report

    return url_domain_report(
        _url_fixture(_t(spark, sf_dir, "documents")), cap_share=0.25
    )


@_q(
    "ngram_leakage_report",
    f"""
    WITH ev AS (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents
                WHERE doc_id % 97 = 0),
    tr AS (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents
           WHERE doc_id % 97 <> 0),
    evg AS (SELECT DISTINCT doc_id, g
            FROM (SELECT doc_id, unnest({_DUCK_SHINGLES}) AS g FROM ev)),
    trp AS (SELECT DISTINCT g
            FROM (SELECT unnest({_DUCK_SHINGLES}) AS g FROM tr)
            WHERE g IN (SELECT g FROM evg)),
    per AS (
      SELECT evg.doc_id,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(count(trp.g) AS BIGINT) AS n_leaked
      FROM evg LEFT JOIN trp USING (g)
      GROUP BY 1
    )
    SELECT e.doc_id,
           coalesce(n_grams, 0) AS n_grams,
           coalesce(n_leaked, 0) AS n_leaked,
           coalesce(n_leaked::DOUBLE / n_grams, 0.0) AS leak_frac,
           coalesce(n_leaked::DOUBLE / n_grams >= 0.5, FALSE) AS leaked
    FROM (SELECT doc_id FROM ev) e LEFT JOIN per USING (doc_id)
    """,
)
def ngram_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-side benchmark-leakage rate (operators.curation.
    eval_leakage_report): per eval doc (deterministic ``doc_id % 97 = 0``
    holdout), the fraction of its distinct word 3-grams present anywhere
    in the train split. Train is scanned once, never shuffled; every
    shuffle is bounded by the eval gram count."""
    from ..operators.curation import eval_leakage_report

    docs = _t(spark, sf_dir, "documents")
    return eval_leakage_report(
        docs.where(F.col("doc_id") % 97 != 0),
        docs.where(F.col("doc_id") % 97 == 0),
        threshold=0.5,
    )


@_q(
    "emb_matryoshka_recall",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
    fullp AS (
      SELECT q.query_id, c.vec_id,
             round(list_dot_product(c.cv, q.qv)
                   / (sqrt(list_dot_product(c.cv, c.cv))
                      * sqrt(list_dot_product(q.qv, q.qv))), 6) AS score
      FROM c, q WHERE c.vec_id != q.query_id
    ),
    fullr AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id, row_number() OVER (
          PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rk
        FROM fullp) WHERE rk <= 5
    ),
    tp AS (
      SELECT q.query_id, c.vec_id,
             round(list_dot_product(c.cv[1:16], q.qv[1:16])
                   / (sqrt(list_dot_product(c.cv[1:16], c.cv[1:16]))
                      * sqrt(list_dot_product(q.qv[1:16], q.qv[1:16]))), 6)
               AS score
      FROM c, q WHERE c.vec_id != q.query_id
    ),
    tr AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id, row_number() OVER (
          PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rk
        FROM tp) WHERE rk <= 5
    )
    SELECT f.query_id, CAST(count(t.vec_id) AS BIGINT) AS n_hits,
           count(t.vec_id)::DOUBLE / 5 AS recall
    FROM fullr f LEFT JOIN tr t
      ON f.query_id = t.query_id AND f.vec_id = t.vec_id
    GROUP BY 1
    """,
)
def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-dimension (Matryoshka) retrieval quality
    (operators.similarity.matryoshka_recall): recall@5 of 16-of-64-dim
    truncated cosine top-k vs full-dim exact top-k, per query — both
    sides deterministic brute force, so the eval is oracle-exact (unlike
    the rows-only ``ann_recall_ivf``, whose IVF side has no SQL twin)."""
    from ..operators.similarity import matryoshka_recall

    emb = _t(spark, sf_dir, "embeddings")
    return matryoshka_recall(
        emb, emb.filter(F.col("vec_id") < 10), k=5, m_dims=16
    )


def _pagerank_oracle(iters: int = 3) -> str:
    """Loop-UNROLLED PageRank oracle: the fixed-iteration operator is
    bit-deterministic (decimal-carried neighbor sums), so its SQL twin is
    ``iters`` chained CTEs — the same trick cc_recursive_sql uses, but
    with arithmetic state instead of label propagation. The teleport term
    is written ``(CAST(1 AS DOUBLE) - 0.85)`` so DuckDB folds it in
    IEEE double exactly like Catalyst (decimal ``0.15`` would differ at
    1 ulp); the final ``round(…, 10)`` absorbs that class of noise
    anyway."""
    sql = """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pe AS (SELECT a.l_partkey AS s, b.l_partkey AS d
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
    und AS (SELECT s, d FROM pe UNION ALL SELECT d AS s, s AS d FROM pe),
    deg AS (SELECT s, count(*) AS od FROM und GROUP BY 1),
    nodes AS (SELECT DISTINCT s AS node FROM und),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    p0 AS (SELECT node, CAST(1 AS DOUBLE) / n AS pr FROM nodes, nn)"""
    for i in range(iters):
        sql += f""",
    a{i + 1} AS (
      SELECT und.d AS node,
             CAST(sum(CAST(p{i}.pr / deg.od AS DECIMAL(28,12)))
                  AS DOUBLE) AS acc
      FROM und JOIN p{i} ON p{i}.node = und.s JOIN deg ON deg.s = und.s
      GROUP BY 1
    ),
    p{i + 1} AS (
      SELECT nodes.node,
             (CAST(1 AS DOUBLE) - 0.85) / n
               + 0.85 * coalesce(a{i + 1}.acc, 0) AS pr
      FROM nodes CROSS JOIN nn LEFT JOIN a{i + 1} USING (node)
    )"""
    sql += f"""
    SELECT node AS part, round(pr, 10) AS pr FROM p{iters}"""
    return sql


@_q("graph_pagerank_parts", _pagerank_oracle(3))
def graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 fixed iterations, damping 0.85) over the undirected
    DENOISED part co-occurrence graph (pairs bought together in >= 2
    orders — exactly ``basket_part_pairs``' support filter; single-order
    pairs are coincidence, and at sf0.1 the filter is also 335x fewer
    edges) (operators.graph.pagerank): which parts sit at the center of
    the bought-together network. Per iteration: one node-keyed join + one
    destination-keyed decimal-carried sum — 2 exchanges, no driver-side
    graph state. Scores rounded to 10 dp (teleport-constant folding
    noise)."""
    from ..operators.graph import pagerank

    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("src", "dst")
    )
    pr = pagerank(
        edges, iterations=3, damping=0.85, undirected=True,
        broadcast_scores=True,  # 1 double per part: executor-memory-sized
        dedup_edges=False,  # pairs above are distinct with src < dst
        checkpoint=False,  # 3 iterations: keep one pipelined plan
    )
    return pr.select(
        F.col("node").alias("part"), F.round("pr", 10).alias("pr")
    )


@_q(
    "ts_level_shift",
    """
    WITH base AS (
      SELECT event_type, ts::TIMESTAMP AS ts, event_id,
             CAST(sum(CAST(value AS DECIMAL(28,6))) OVER wl AS DOUBLE) / 6
               AS left_mean,
             CAST(sum(CAST(value AS DECIMAL(28,6))) OVER wr AS DOUBLE) / 6
               AS right_mean,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
      WINDOW wl AS (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING),
             wr AS (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING)
    ),
    ranked AS (
      SELECT event_type, ts, event_id, left_mean, right_mean,
             right_mean - left_mean AS shift,
             row_number() OVER (PARTITION BY event_type
               ORDER BY abs(right_mean - left_mean) DESC, ts, event_id)
               AS rank
      FROM base WHERE rn > 6 AND rn <= n - 5
    )
    SELECT event_type, ts, event_id, left_mean, right_mean, shift,
           rank::INT AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def ts_level_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 level-shift (changepoint) candidates per event_type
    (operators.timeseries.level_shift): largest |mean of next 6 − mean of
    prior 6| contrasts at full-window points — threshold-free CUSUM-class
    change detection. One Exchange: both frame sums and the rank share
    the series partitioning."""
    from ..operators.timeseries import level_shift

    ev = _t(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    return level_shift(
        ev, dims=["event_type"], ts="ts", value="value", w=6, k=5
    )


@_q(
    "text_collocations_pmi",
    """
    WITH bg AS (
      SELECT doc_id, g[1] AS a, g[2] AS b
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(words)),
                      i -> [words[i], words[i+1]])) AS g
        FROM (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS words
              FROM documents)
      )
    ),
    pair AS (SELECT a, b, count(*) AS c2 FROM bg GROUP BY 1, 2),
    uni AS (SELECT t.tok AS w, count(*) AS c1
            FROM documents,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                   AS t(tok)
            GROUP BY 1),
    tots AS (SELECT (SELECT sum(c2) FROM pair)::DOUBLE AS nb,
                    (SELECT sum(c1) FROM uni)::DOUBLE AS nu),
    scored AS (
      SELECT a, b, c2,
             CAST(CAST(ln((c2::DOUBLE / nb)
                  / ((ua.c1::DOUBLE / nu) * (ub.c1::DOUBLE / nu)))
               AS DECIMAL(28,12)) AS DOUBLE) AS pmi
      FROM pair
      JOIN uni ua ON ua.w = pair.a
      JOIN uni ub ON ub.w = pair.b
      CROSS JOIN tots
      WHERE c2 >= 10
    )
    SELECT a, b, CAST(c2 AS BIGINT) AS pair_count, pmi, rank::INT AS rank
    FROM (SELECT *, row_number() OVER (ORDER BY pmi DESC, a, b) AS rank
          FROM scored)
    WHERE rank <= 20
    """,
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PMI collocations over adjacent word pairs (operators.
    ranking.collocations_pmi) — the phrase/merge-candidate extractor next
    to BPE training. PMI quantized through decimal(28,12) before ranking
    (libm-ln-drift-proof); pair/unigram tables vocab-bounded."""
    from ..operators.ranking import collocations_pmi

    return collocations_pmi(
        _t(spark, sf_dir, "documents"), min_count=10, k=20
    )


@_q(
    "graph_triangle_profile",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (SELECT a.l_partkey AS s, b.l_partkey AS d
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
    und AS (SELECT s, d FROM e UNION ALL SELECT d AS s, s AS d FROM e),
    deg AS (SELECT s AS node, count(*) AS deg FROM und GROUP BY 1),
    tri AS (
      SELECT e1.s AS a, e1.d AS b, e2.d AS c
      FROM e e1 JOIN e e2 ON e1.s = e2.s AND e1.d < e2.d
      JOIN e e3 ON e3.s = e1.d AND e3.d = e2.d
    ),
    pn AS (
      SELECT node, count(*) AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY 1
    )
    SELECT deg.node, CAST(deg.deg AS BIGINT) AS degree,
           CAST(coalesce(pn.n_triangles, 0) AS BIGINT) AS n_triangles,
           CASE WHEN deg.deg > 1
                THEN CAST(2 AS DOUBLE) * coalesce(pn.n_triangles, 0)
                     / (deg.deg * (deg.deg - 1))
                ELSE CAST(0 AS DOUBLE) END AS clustering
    FROM deg LEFT JOIN pn USING (node)
    """,
)
def graph_triangle_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over the
    >=2-support part co-occurrence graph (operators.graph.
    triangle_counts): degree-ordered edge orientation bounds every wedge
    join at O(sqrt(m)) out-neighbors — the triangle set is
    orientation-invariant, so the oracle counts the same triangles with
    plain id ordering."""
    from ..operators.graph import triangle_counts

    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("src", "dst")
    )
    return triangle_counts(edges)


@_q(
    "dedup_sorted_neighborhood",
    """
    WITH k AS (
      SELECT doc_id,
             substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                    1, 24) AS k
      FROM documents
    ),
    p AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY k, doc_id) - 1 AS pos
      FROM k
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(b.pos - a.pos AS BIGINT) AS gap
    FROM p a JOIN p b ON b.pos - a.pos BETWEEN 1 AND 2
    """,
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood (SNM) candidate pairs, window 3, keyed on the
    first 24 alphanumeric chars of the lowercased text (operators.dedup.
    sorted_neighborhood_pairs): the prefix-similarity blocking pass that
    complements MinHash/SimHash. Rank assignment is range-exchange +
    per-partition counters + broadcast offsets — boundary-invariant, so
    it equals the oracle's global ORDER BY row number."""
    from ..operators.dedup import sorted_neighborhood_pairs

    docs = _t(spark, sf_dir, "documents")
    key = F.substring(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", ""), 1, 24
    )
    return sorted_neighborhood_pairs(docs, key, w=3)


def _hits_oracle(iters: int = 2) -> str:
    """Loop-unrolled HITS oracle (same determinism contract as
    ``_pagerank_oracle``): decimal-carried sums + decimal-carried L1
    totals, double divisions — every half-step is one raw-score CTE, one
    1-row total CTE, one normalize CTE."""
    sql = """
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS s, l.l_partkey AS d
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    h0 AS (SELECT DISTINCT s AS node, CAST(1 AS DOUBLE) AS h FROM e)"""
    for i in range(iters):
        sql += f""",
    a{i + 1}r AS (
      SELECT e.d AS node,
             CAST(sum(CAST(h AS DECIMAL(28,12))) AS DOUBLE) AS a
      FROM e JOIN h{i} ON h{i}.node = e.s GROUP BY 1
    ),
    a{i + 1}t AS (SELECT CAST(sum(CAST(a AS DECIMAL(28,12))) AS DOUBLE)
                    AS t FROM a{i + 1}r),
    a{i + 1} AS (SELECT node, a / t AS a FROM a{i + 1}r, a{i + 1}t),
    h{i + 1}r AS (
      SELECT e.s AS node,
             CAST(sum(CAST(a AS DECIMAL(28,12))) AS DOUBLE) AS h
      FROM e JOIN a{i + 1} ON a{i + 1}.node = e.d GROUP BY 1
    ),
    h{i + 1}t AS (SELECT CAST(sum(CAST(h AS DECIMAL(28,12))) AS DOUBLE)
                    AS t FROM h{i + 1}r),
    h{i + 1} AS (SELECT node, h / t AS h FROM h{i + 1}r, h{i + 1}t)"""
    sql += f"""
    SELECT node, 'hub' AS kind, h AS score FROM h{iters}
    UNION ALL
    SELECT node, 'auth' AS kind, a AS score FROM a{iters}"""
    return sql


@_q("graph_hits_bipartite", _hits_oracle(2))
def graph_hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (2 fixed iterations, L1-normalized) over
    the directed bipartite customer→part purchase graph (operators.graph.
    hits): authoritative parts = endorsed by broad-basket customers,
    mutually reinforcing — the counterpart ranking to PageRank's
    undirected centrality. Oracle = unrolled CTE chain."""
    from ..operators.graph import hits

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            F.col("l_partkey").alias("dst"),
        )
        .distinct()
    )
    return hits(edges, iterations=2, broadcast_scores=True)


@_q(
    "item_item_similarity",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT l_partkey, count(*) AS n_ord FROM li GROUP BY 1),
    co AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS cooc
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    sym AS (
      SELECT part_a, part_b, cooc FROM co
      UNION ALL
      SELECT part_b AS part_a, part_a AS part_b, cooc FROM co
    ),
    scored AS (
      SELECT part_a, part_b, CAST(cooc AS BIGINT) AS cooc,
             cooc / (sqrt(CAST(na.n_ord AS DOUBLE))
                     * sqrt(CAST(nb.n_ord AS DOUBLE))) AS cosine
      FROM sym
      JOIN n na ON na.l_partkey = part_a
      JOIN n nb ON nb.l_partkey = part_b
    )
    SELECT part_a, part_b, cooc, cosine, rank::INT AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY part_a
            ORDER BY cosine DESC, part_b) AS rank FROM scored)
    WHERE rank <= 5
    """,
)
def item_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item binary-cosine similarity over order baskets — the
    classic co-occurrence candidate generator for "bought together"
    recommendations: ``sim(a,b) = cooc / sqrt(n_a·n_b)`` on ≥2-support
    pairs, top-5 neighbors per item. Pair expansion is order-bounded
    (same discipline as basket_part_pairs); per-item top-k is a
    WindowGroupLimit cut. Integer inputs → bit-identical doubles."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = li.groupBy(F.col("l_partkey")).agg(
        F.count(F.lit(1)).alias("n_ord")
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    co = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("cooc"))
        .filter(F.col("cooc") >= 2)
    )
    sym = co.unionByName(
        co.select(
            F.col("part_b").alias("part_a"),
            F.col("part_a").alias("part_b"),
            "cooc",
        )
    )
    na = n.select(F.col("l_partkey").alias("part_a"), F.col("n_ord").alias("_na"))
    nb = n.select(F.col("l_partkey").alias("part_b"), F.col("n_ord").alias("_nb"))
    scored = (
        sym.join(na, "part_a")
        .join(nb, "part_b")
        .select(
            "part_a",
            "part_b",
            "cooc",
            (
                F.col("cooc")
                / (
                    F.sqrt(F.col("_na").cast("double"))
                    * F.sqrt(F.col("_nb").cast("double"))
                )
            ).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("part_a").orderBy(
        F.col("cosine").desc(), F.col("part_b").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
    )


@_q(
    "hybrid_search_rrf",
    f"""
    WITH tok AS ({_DUCK_TOK}),
    q AS (
      SELECT doc_id AS query_id,
             array_to_string(
               (regexp_extract_all(lower(text), '[a-z0-9]+'))[1:5], ' ') AS qt
      FROM documents WHERE doc_id < 3
    ),
    qtok AS (
      SELECT DISTINCT query_id, t.tok AS token
      FROM q, unnest(regexp_extract_all(lower(qt), '[a-z0-9]+')) AS t(tok)
    ),
    vocab AS (SELECT DISTINCT token FROM qtok),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs,
                     sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM tok JOIN vocab USING (token) GROUP BY 1, 2
    ),
    dft AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    per AS (
      SELECT qtok.query_id, tf.doc_id,
             CAST(ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
                  * (CAST(tf AS DOUBLE) * (1.2 + 1))
                    / (CAST(tf AS DOUBLE)
                       + 1.2 * (1 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
                  AS DECIMAL(28,12)) AS s
      FROM tf JOIN dft USING (token) JOIN dl USING (doc_id)
      CROSS JOIN stats JOIN qtok USING (token)
    ),
    bm AS (
      SELECT query_id, doc_id,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY CAST(sum(s) AS DOUBLE) DESC, doc_id) AS INT) AS rank
      FROM per GROUP BY query_id, doc_id
      QUALIFY rank <= 10
    ),
    eq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < 3),
    dp AS (
      SELECT eq.query_id, c.vec_id AS doc_id, {_DUCK_COSINE.replace("q.qv", "eq.qv")} AS score
      FROM embeddings c, eq WHERE c.vec_id != eq.query_id
    ),
    dn AS (
      SELECT query_id, doc_id,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id ASC) AS INT) AS rank
      FROM dp QUALIFY rank <= 10
    ),
    fused AS (
      SELECT query_id, doc_id,
             coalesce(CAST(1 AS DOUBLE) / (60 + bm.rank),
                      CAST(0 AS DOUBLE))
             + coalesce(CAST(1 AS DOUBLE) / (60 + dn.rank),
                        CAST(0 AS DOUBLE)) AS rrf_score,
             (bm.rank IS NOT NULL)::INT + (dn.rank IS NOT NULL)::INT
               AS n_lists
      FROM bm FULL OUTER JOIN dn USING (query_id, doc_id)
    )
    SELECT query_id, doc_id, rrf_score, n_lists, rank::INT AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY rrf_score DESC, doc_id ASC) AS rank FROM fused)
    WHERE rank <= 10
    """,
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-10 ⊕ dense-cosine top-10 fused by
    reciprocal rank (operators.ranking.rrf_fuse) for the three fixture
    queries (doc_ids < 3; ``embeddings.vec_id`` is the fixture's doc id,
    so each query has both a text and a vector form) — the standard
    modern search stack in one plan. Fusion joins are (queries×k)-sized;
    rank reciprocals are exact double constants."""
    from ..operators.dedup import words
    from ..operators.ranking import bm25_search_topk, rrf_fuse
    from ..operators.similarity import cosine_topk

    docs = _t(spark, sf_dir, "documents")
    queries_df = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(words(F.col("text")), 1, 5), " ").alias(
            "query_text"
        ),
    )
    bm = bm25_search_topk(docs, queries_df, k=10).select(
        "query_id", "doc_id", "rank"
    )
    emb = _t(spark, sf_dir, "embeddings")
    dense = cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=10).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([bm, dense], k_const=60, top_k=10)


def _label_prop_oracle(iters: int = 2) -> str:
    """Unrolled label-propagation oracle over the sign-bucket near-dup
    graph: per iteration one labeled-message CTE, one per-node mode CTE
    (count desc, label asc tie-break), one clamped state update."""
    sql = f"""
    WITH {_DUCK_NEARDUP_PAIRS},
    und AS (SELECT vec_a AS s, vec_b AS d FROM pairs
            UNION ALL SELECT vec_b AS s, vec_a AS d FROM pairs),
    nodes AS (SELECT DISTINCT s AS node FROM und),
    seeds AS (SELECT vec_id AS node, label FROM embeddings
              WHERE vec_id % 3 = 0),
    s0 AS (SELECT nodes.node, seeds.label,
                  seeds.label IS NOT NULL AS is_seed
           FROM nodes LEFT JOIN seeds USING (node))"""
    for i in range(iters):
        sql += f""",
    m{i + 1} AS (
      SELECT und.d AS node, s{i}.label, count(*) AS c
      FROM und JOIN s{i} ON s{i}.node = und.s
      WHERE s{i}.label IS NOT NULL
      GROUP BY 1, 2
    ),
    md{i + 1} AS (
      SELECT node, label AS new FROM (
        SELECT node, label, row_number() OVER (
          PARTITION BY node ORDER BY c DESC, label ASC) AS rn
        FROM m{i + 1})
      WHERE rn = 1
    ),
    s{i + 1} AS (
      SELECT s{i}.node,
             CASE WHEN s{i}.is_seed THEN s{i}.label
                  ELSE coalesce(md{i + 1}.new, s{i}.label) END AS label,
             s{i}.is_seed
      FROM s{i} LEFT JOIN md{i + 1} USING (node)
    )"""
    sql += f"""
    SELECT node, label, is_seed FROM s{iters}"""
    return sql


@_q("graph_label_propagation", _label_prop_oracle(2))
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation (2 clamped iterations) over the
    sign-bucket embedding near-dup graph, seeded with every third
    vector's label (operators.graph.label_propagation): weak supervision
    spreading across similarity clusters. Oracle = unrolled CTE chain
    (integer counts + smallest-label tie-break ⇒ engine-exact)."""
    from ..operators.graph import label_propagation
    from ..operators.similarity import embedding_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    edges = embedding_neardup_pairs(
        emb, threshold=0.35, bucket_dims=4
    ).select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"))
    seeds = emb.filter(F.col("vec_id") % 3 == 0).select(
        F.col("vec_id").alias("node"), "label"
    )
    return label_propagation(
        edges, seeds, iterations=2, id_col="node", label_col="label"
    )


def _k_core_oracle(k: int = 2, rounds: int = 2) -> str:
    """Unrolled fixed-round k-core peel (both engines run the SAME round
    count whether or not the peel converged — that is what keeps the
    data-dependent fixpoint oracle-pairable)."""
    sql = """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pe AS (SELECT a.l_partkey AS s, b.l_partkey AS d
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
    l0 AS (SELECT s, d FROM pe UNION ALL SELECT d AS s, s AS d FROM pe),
    d0 AS (SELECT s, count(*) AS degree FROM l0 GROUP BY 1)"""
    for i in range(rounds):
        sql += f""",
    a{i} AS (SELECT s FROM d{i} WHERE degree >= {k}),
    l{i + 1} AS (SELECT l.s, l.d FROM l{i} l
                 JOIN a{i} x ON x.s = l.s JOIN a{i} y ON y.s = l.d),
    d{i + 1} AS (SELECT s, count(*) AS degree FROM l{i + 1} GROUP BY 1)"""
    sql += f"""
    SELECT s AS node, CAST(degree AS BIGINT) AS degree
    FROM d{rounds} WHERE degree >= {k}"""
    return sql


@_q("graph_k_core", _k_core_oracle(2, 2))
def graph_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-round 2-core peel of the >=2-support part co-occurrence graph
    (operators.graph.k_core_peel): drop degree-<2 stragglers, recompute
    degrees on the survivors, drop again — the dense-cohesion filter
    upstream of community analyses. Fixed rounds keep the data-dependent
    fixpoint oracle-exact."""
    from ..operators.graph import k_core_peel

    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("src", "dst")
    )
    return k_core_peel(edges, k=2, rounds=2)


@_q(
    "path_top_sequences",
    """
    WITH s AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             array_to_string(
               (array_agg(event_type ORDER BY ts, event_id))[1:4], '>')
               AS path
      FROM events GROUP BY 1, 2
    ),
    c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
          FROM s GROUP BY 1)
    SELECT path, n_sessions, rank::INT AS rank
    FROM (SELECT *, row_number() OVER (
            ORDER BY n_sessions DESC, path) AS rank FROM c)
    WHERE rank <= 20
    """,
)
def path_top_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session journey paths — the product-analytics "what do
    users do first" query: per (user, day) session, the first four
    event types in time order joined as a path string, counted and
    ranked. One groupBy with an ordered in-group fold (sort_array over
    (ts, id, type) structs — deterministic total order), one path-keyed
    partial-agg count, one top-k window over the path vocabulary (tiny:
    ≤ |event_types|⁴)."""
    ev = _t(spark, sf_dir, "events")
    path = F.array_join(
        F.slice(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct("ts", "event_id", "event_type")
                    )
                ),
                lambda r: r["event_type"],
            ),
            1,
            4,
        ),
        ">",
    )
    s = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(path.alias("path"))
    c = s.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_sessions").desc(), F.col("path").asc())
    return (
        c.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 20)
    )


@_q(
    "retention_km_curve",
    """
    WITH per_u AS (
      SELECT user_id,
             CASE WHEN min(ts) FILTER (WHERE event_type = 'error'
                         AND event_id % 5 = 0) IS NOT NULL
                  THEN date_diff('day', min(ts)::DATE,
                         min(ts) FILTER (WHERE event_type = 'error'
                           AND event_id % 5 = 0)::DATE)
                  ELSE date_diff('day', min(ts)::DATE,
                         (SELECT max(ts)::DATE FROM events)) END AS duration,
             CASE WHEN min(ts) FILTER (WHERE event_type = 'error'
                         AND event_id % 5 = 0) IS NOT NULL
                  THEN 1 ELSE 0 END AS event
      FROM events GROUP BY 1
    ),
    per_t AS (
      SELECT duration AS t, sum(event) AS n_events,
             sum(1 - event) AS n_censored, count(*) AS rows_
      FROM per_u GROUP BY 1
    ),
    tot AS (SELECT sum(rows_) AS total FROM per_t),
    staged AS (
      SELECT t, n_events, n_censored,
             total - coalesce(sum(rows_) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_at_risk
      FROM per_t, tot
    ),
    s2 AS (
      SELECT t, CAST(n_at_risk AS BIGINT) AS n_at_risk,
             CAST(n_events AS BIGINT) AS n_events,
             CAST(n_censored AS BIGINT) AS n_censored,
             CASE WHEN n_events < n_at_risk
                  THEN CAST(ln(CAST(1 AS DOUBLE)
                         - CAST(n_events AS DOUBLE) / n_at_risk)
                       AS DECIMAL(28,12)) END AS lnv,
             CASE WHEN n_events = n_at_risk THEN 1 ELSE 0 END AS zf
      FROM staged
    ),
    s3 AS (
      SELECT t, n_at_risk, n_events, n_censored,
             max(zf) OVER wc AS zero, sum(lnv) OVER wc AS cum
      FROM s2
      WINDOW wc AS (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT t, n_at_risk, n_events, n_censored,
           CASE WHEN zero = 1 THEN CAST(0 AS DOUBLE)
                ELSE CAST(CAST(exp(CAST(cum AS DOUBLE))
                       AS DECIMAL(28,12)) AS DOUBLE) END AS survival
    FROM s3
    """,
)
def retention_km_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-churn curve (operators.funnel.km_survival):
    churn = the user's first qualifying error event (a deterministic
    20% error subsample, ``event_id % 5 = 0`` — the fixture's stand-in
    for a churn signal); users who never hit one are right-CENSORED at
    the observation end instead of biasing the curve (133 observed / 17
    censored at sf0.01). ln/exp quantized through decimal(28,12) (libm
    guard), running sum exact decimal; windows run over the
    distinct-duration time axis only."""
    from ..operators.funnel import km_survival

    ev = _t(spark, sf_dir, "events")
    obs_end = ev.agg(F.max(F.to_date("ts")).alias("_end"))
    churn_ts = F.min(
        F.when(
            (F.col("event_type") == "error")
            & (F.col("event_id") % 5 == 0),
            F.col("ts"),
        )
    )
    per_u = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("_first"),
            F.to_date(churn_ts).alias("_churn"),
        )
        .crossJoin(F.broadcast(obs_end))
        .select(
            F.when(
                F.col("_churn").isNotNull(),
                F.datediff("_churn", "_first"),
            )
            .otherwise(F.datediff("_end", "_first"))
            .alias("duration"),
            F.col("_churn").isNotNull().cast("int").alias("event"),
        )
    )
    return km_survival(per_u)


@_q(
    "funnel_time_to_convert",
    """
    WITH su AS (
      SELECT user_id, min(ts) AS su FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ),
    pu AS (
      SELECT su.user_id,
             (epoch_us(min(e.ts)) - epoch_us(su.su))
               / CAST(3600000000 AS DOUBLE) AS hours
      FROM su JOIN events e
        ON e.user_id = su.user_id AND e.event_type = 'purchase'
           AND e.ts >= su.su
      GROUP BY su.user_id, su.su
    )
    SELECT CAST((SELECT count(*) FROM su) AS BIGINT) AS n_signup,
           CAST(count(*) AS BIGINT) AS n_converted,
           count(*)::DOUBLE / (SELECT count(*) FROM su) AS conv_rate,
           round(quantile_cont(hours, 0.5), 6) AS p50_hours,
           round(quantile_cont(hours, 0.9), 6) AS p90_hours
    FROM pu
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: per user, hours from first
    signup to the first purchase AT OR AFTER it; one summary row with
    the conversion rate and exact interpolated p50/p90 latency — the
    funnel metric beside `funnel_signup_purchase`'s step counts. Two
    user-keyed aggregates + one summary reduce; hours derived from
    microsecond integers so the doubles are engine-exact."""
    ev = _t(spark, sf_dir, "events")
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("_su"))
    )
    pu = (
        su.join(
            ev.where(F.col("event_type") == "purchase").select(
                "user_id", F.col("ts").alias("_pt")
            ),
            "user_id",
        )
        .where(F.col("_pt") >= F.col("_su"))
        .groupBy("user_id", "_su")
        .agg(F.min("_pt").alias("_pu"))
        .select(
            (
                (F.unix_micros("_pu") - F.unix_micros("_su"))
                / F.lit(3600000000).cast("double")
            ).alias("hours")
        )
    )
    n_signup = su.agg(F.count(F.lit(1)).alias("n_signup"))
    return (
        pu.agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.round(F.percentile("hours", F.lit(0.5)), 6).alias("p50_hours"),
            F.round(F.percentile("hours", F.lit(0.9)), 6).alias("p90_hours"),
        )
        .crossJoin(F.broadcast(n_signup))
        .select(
            "n_signup",
            "n_converted",
            (F.col("n_converted") / F.col("n_signup")).alias("conv_rate"),
            "p50_hours",
            "p90_hours",
        )
    )


@_q(
    "minhash_estimate_error",
    f"""
    WITH {_DUCK_MINHASH},
    bands AS (
      SELECT doc_id, j // 4 AS band,
             string_agg(minhash::VARCHAR, '-' ORDER BY j) AS band_key
      FROM sig GROUP BY doc_id, j // 4
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT p.doc_a, p.doc_b,
             CAST(sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END)
                  AS DOUBLE) / 16 AS est_jaccard
      FROM pairs p
      JOIN sig sa ON sa.doc_id = p.doc_a
      JOIN sig sb ON sb.doc_id = p.doc_b AND sb.j = sa.j
      GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT p.doc_a, p.doc_b, count(*) AS inter
      FROM pairs p
      JOIN sh a ON a.doc_id = p.doc_a
      JOIN sh b ON b.doc_id = p.doc_b AND b.h2 = a.h2
      GROUP BY 1, 2
    )
    SELECT est.doc_a, est.doc_b, est.est_jaccard,
           coalesce(inter.inter, 0)::DOUBLE
             / (na.n + nb.n - coalesce(inter.inter, 0)) AS exact_jaccard,
           abs(est.est_jaccard - coalesce(inter.inter, 0)::DOUBLE
             / (na.n + nb.n - coalesce(inter.inter, 0))) AS abs_err
    FROM est
    LEFT JOIN inter ON inter.doc_a = est.doc_a AND inter.doc_b = est.doc_b
    JOIN sizes na ON na.doc_id = est.doc_a
    JOIN sizes nb ON nb.doc_id = est.doc_b
    """,
)
def minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration over LSH candidate pairs
    (operators.dedup.minhash_estimate_calibration): signature-estimated
    Jaccard vs exact Jaccard of the same hashed-shingle sets, per pair —
    the `num_hashes`-adequacy check beside `lsh_recall_vs_exact`'s
    banding-recall check."""
    from ..operators.dedup import minhash_estimate_calibration

    return minhash_estimate_calibration(_t(spark, sf_dir, "documents"))


@_q(
    "url_exact_dedup_groups",
    f"""
    WITH raw AS ({_DUCK_URL_RAW}),
    n1 AS (
      SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
               lower(url), '#.*$', ''), '^http://', 'https://'),
               '^https://www\\.', 'https://') AS u
      FROM raw
    ),
    n2 AS (
      SELECT doc_id, regexp_replace(regexp_replace(u,
               '^(https://[^/:]+):443/', '\\1/'),
               '^(https://[^/:]+):443$', '\\1') AS u
      FROM n1
    ),
    n3 AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(u,
               '[?&](utm_[a-z0-9]+|fbclid|gclid|ref)=[^&#]*', '', 'g'),
               '^([^?&]*)&', '\\1?'), '[?&]+$', ''), '/+$', '') AS u
      FROM n2
    ),
    groups AS (
      SELECT u, min(doc_id) AS canonical_id,
             CAST(count(*) AS BIGINT) AS group_size
      FROM n3 GROUP BY 1
    )
    SELECT n3.doc_id, n3.u AS url_norm, g.canonical_id, g.group_size
    FROM n3 JOIN groups g USING (u)
    WHERE g.group_size >= 2
    """,
)
def url_exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level exact dedup groups — `dedup_exact_groups`' discipline
    keyed on the CANONICAL URL instead of text (functions.scalars.
    normalize_url over the derived URL fixture): members of every
    normalized-URL collision group with the min-id canonical, restricted
    to real duplicate groups. One partial-agg groupBy on the normalized
    key; the normalization itself is the row-local regex chain."""
    from ..functions.scalars import normalize_url

    keyed = _url_fixture(_t(spark, sf_dir, "documents")).select(
        "doc_id", normalize_url(F.col("url")).alias("url_norm")
    )
    groups = keyed.groupBy("url_norm").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        keyed.join(groups, "url_norm")
        .where(F.col("group_size") >= 2)
        .select("doc_id", "url_norm", "canonical_id", "group_size")
    )


@_q(
    "rollup_incremental_weekly",
    """
    SELECT date_trunc('week', ts)::TIMESTAMP AS bucket, event_type,
           count(*)::BIGINT AS n_rows,
           CAST(sum(value::DECIMAL(28,6)) AS DOUBLE) AS sum_value,
           min(value) AS min_value, max(value) AS max_value,
           CAST(sum(value::DECIMAL(28,6)) AS DOUBLE) / count(*)
             AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def rollup_incremental_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance
    (operators/rollup.py): day-grain partial states merged to week grain
    WITHOUT touching the fact table again. The oracle aggregates the fact
    directly — hash-equality of the two proves the states are genuinely
    mergeable (decimal-carried sums make merge order irrelevant), which is
    the invariant that lets a 100 TB deployment answer weekly/monthly
    panels from a partial table one row per (day, series) and never rescan
    history. Replay idempotency of the maintenance step is unit-tested
    (upsert_partials)."""
    from ..operators.rollup import daily_partials, merge_to_grain

    ev = _t(spark, sf_dir, "events")
    daily = daily_partials(ev, dims=["event_type"], ts="ts", value="value")
    wk = merge_to_grain(daily, dims=["event_type"], grain="week")
    return wk.select(
        "bucket", "event_type", "n_rows",
        F.col("sum_value").cast("double").alias("sum_value"),
        "min_value", "max_value", "avg_value",
    )


@_q(
    "cube_order_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority)::BIGINT AS gid,
           count(*)::BIGINT AS n,
           CAST(sum(o_totalprice::DECIMAL(18,2)) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation with grouping_id — all four grouping sets (detail,
    two marginals, grand total) in ONE pass: Spark expands the cube inside
    a single partial-aggregable Expand+HashAggregate, so the fact is
    scanned once however many subtotal levels a dashboard wants (vs one
    query per level through the reference's Grafana panels). grouping_id
    disambiguates a genuine NULL group value from an aggregated-out
    column; both engines follow the SQL-standard bitmask (first cube
    column = MSB)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "total")
    )


@_q(
    "emb_knn_label_eval",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv, label AS q_label
      FROM embeddings
      WHERE ('0x' || substr(md5('knn' || CAST(vec_id AS VARCHAR)), 1, 2))::BIGINT % 20 = 0
    ),
    pairs AS (
      SELECT q.query_id, c.vec_id, c.label AS n_label, {{cos}} AS score
      FROM embeddings c, q WHERE c.vec_id != q.query_id
    ),
    ranked AS (
      SELECT query_id, n_label,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id ASC) AS rank
      FROM pairs
    ),
    votes AS (
      SELECT query_id, n_label, count(*) AS cnt
      FROM ranked WHERE rank <= 5 GROUP BY 1, 2
    ),
    pred AS (
      SELECT query_id, n_label AS pred FROM (
        SELECT query_id, n_label,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cnt DESC, n_label ASC) AS rn
        FROM votes
      ) WHERE rn = 1
    )
    SELECT q_label AS label, count(*)::BIGINT AS n_eval,
           CAST(sum(CASE WHEN pred = q_label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           sum(CASE WHEN pred = q_label THEN 1 ELSE 0 END)::DOUBLE / count(*)
             AS accuracy
    FROM pred JOIN q USING (query_id)
    GROUP BY 1
    """.replace("{cos}", _DUCK_COSINE),
)
def emb_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out kNN label accuracy — the standard embedding-quality
    probe (does the space cluster by label?) a pipeline runs before
    trusting embeddings for dedup/retrieval. Per sampled query vector:
    top-5 cosine neighbors over the full corpus (self excluded), majority
    label with a (count desc, label asc) deterministic tie-break, compared
    to the query's own label; reported per label.

    Scale posture: the exact LOO scan carries its deterministic md5 sample
    bound (~5% of vectors) INSIDE the query — same discipline as
    lsh_recall_vs_exact, so it can never run all-pairs over a full corpus;
    the production path for bigger evals swaps the brute-force neighbor
    stage for the IVF/PQ operators and keeps the vote/accuracy tail."""
    from ..operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    sample = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("knn"), F.col("vec_id").cast("string"))),
                1, 2,
            ),
            16, 10,
        ).cast("long") % 20 == 0
    )
    qs = emb.filter(sample)
    top = cosine_topk(emb, qs, k=5)
    votes = (
        top.join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("n_label"),
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "n_label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pred = votes.groupBy("query_id").agg(
        F.min_by(
            "n_label", F.struct((-F.col("cnt")).alias("nc"), F.col("n_label"))
        ).alias("pred")
    )
    qlab = qs.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    return (
        pred.join(qlab, "query_id")
        .groupBy(F.col("q_label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum((F.col("pred") == F.col("q_label")).cast("long")).alias(
                "n_correct"
            ),
        )
        .withColumn(
            "accuracy",
            F.col("n_correct").cast("double") / F.col("n_eval").cast("double"),
        )
    )


@_q(
    "dedup_cross_source_matrix",
    """
    WITH toks AS (
      SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
      FROM documents
    ),
    tok AS (
      SELECT doc_id, source, unnest(range(0, len(ts))) AS p, unnest(ts) AS token
      FROM toks
    ),
    blk AS (
      SELECT source, doc_id, p // 10 AS b,
             md5(string_agg(token, ' ' ORDER BY p)) AS uh
      FROM tok GROUP BY 1, 2, 3 HAVING count(*) = 10
    ),
    fp AS (SELECT DISTINCT source, uh FROM blk)
    SELECT a.source AS source_a, b.source AS source_b,
           count(*)::BIGINT AS n_shared_units
    FROM fp a JOIN fp b ON a.uh = b.uh AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix
    (operators.dedup.cross_source_overlap): distinct 10-token content units
    shared between each pair of sources — which crawls/dumps re-host each
    other's text, i.e. where per-source mixture weights double-count mass.
    One scan to the distinct (source, unit-hash) set, unit-keyed self-join
    bounded by |sources| fan-out, #sources²-bounded output."""
    from ..operators.dedup import cross_source_overlap

    return cross_source_overlap(
        _t(spark, sf_dir, "documents"), group_col="source", block_tokens=10
    )


def _corr_matrix_oracle(cols: tuple[str, ...]) -> str:
    """Unrolled SQL twin of profile.correlation_matrix: exact decimal
    moments cast to double, identical IEEE arithmetic for r.

    DECIMAL(19,6) operands, not (18,6): DuckDB stores width ≤ 18 in int64
    and its decimal multiply overflows the RAW int64 instead of promoting
    (observed: 68423.46 × 68423.46 at scale 6); width 19 forces int128
    storage and an exact (38,12) product — same exact values as Spark's
    (18,6)→(37,12) arithmetic."""
    d = {c: f"({c}::DECIMAL(19,6))" for c in cols}
    moments = ["count(*)::DOUBLE AS n"]
    for i, c in enumerate(cols):
        moments.append(f"CAST(sum({d[c]}) AS DOUBLE) AS s{i}")
        moments.append(f"CAST(sum({d[c]}*{d[c]}) AS DOUBLE) AS ss{i}")
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            moments.append(
                f"CAST(sum({d[cols[i]]}*{d[cols[j]]}) AS DOUBLE) AS p{i}_{j}"
            )
    sel = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            sel.append(
                f"SELECT '{cols[i]}' AS col_a, '{cols[j]}' AS col_b, "
                f"round((n*p{i}_{j} - s{i}*s{j}) / "
                f"sqrt((n*ss{i} - s{i}*s{i})*(n*ss{j} - s{j}*s{j})), 9) AS r "
                "FROM s"
            )
    return (
        "WITH s AS (SELECT "
        + ", ".join(moments)
        + " FROM lineitem) "
        + " UNION ALL ".join(sel)
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@_q("profile_correlations", _corr_matrix_oracle(_CORR_COLS))
def profile_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix over the lineitem measure columns in one
    aggregation pass (operators.profile.correlation_matrix) — the
    feature-redundancy screen of a profiling stage. All O(k²) moments ride
    a single scan's partial aggregate; exact decimal sums make r
    engine-identical."""
    from ..operators.profile import correlation_matrix

    return correlation_matrix(
        _t(spark, sf_dir, "lineitem"), list(_CORR_COLS)
    )


@_q(
    "assoc_lang_source",
    """
    WITH j AS (
      SELECT coalesce(lang, chr(0) || 'null') AS a,
             coalesce(source, chr(0) || 'null') AS b,
             count(*)::DOUBLE AS o
      FROM documents GROUP BY 1, 2
    ),
    ra AS (SELECT a, sum(o) AS ra FROM j GROUP BY 1),
    cb AS (SELECT b, sum(o) AS cb FROM j GROUP BY 1),
    tot AS (SELECT sum(o) AS n, count(DISTINCT a) AS r,
                   count(DISTINCT b) AS c FROM j),
    cells AS (
      -- full level grid: zero cells still contribute (0-E)^2/E
      SELECT CAST((coalesce(o, 0) - ra*cb/n)*(coalesce(o, 0) - ra*cb/n)
                  / (ra*cb/n) AS DECIMAL(28,12)) AS term, n, r, c
      FROM ra CROSS JOIN cb
      LEFT JOIN j ON j.a = ra.a AND j.b = cb.b
      CROSS JOIN tot
    ),
    agg AS (
      SELECT CAST(sum(term) AS DOUBLE) AS chi2,
             first(n) AS n, first(r) AS r, first(c) AS c
      FROM cells
    )
    SELECT 'lang' AS col_a, 'source' AS col_b, CAST(n AS BIGINT) AS n,
           CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
           round(chi2, 6) AS chi2,
           round(sqrt(chi2 / (n * (least(r, c) - 1))), 9) AS cramers_v
    FROM agg
    """,
)
def assoc_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared / Cramér's V association between lang and source
    (operators.profile.categorical_association) — the categorical
    companion to the Pearson matrix: is one crawl feeding one language?
    One corpus-sized groupBy; cell terms decimal-quantized so the
    statistic is summation-order-independent."""
    from ..operators.profile import categorical_association

    return categorical_association(
        _t(spark, sf_dir, "documents"), "lang", "source"
    )


@_q(
    "rollup_incremental_percentiles",
    """
    WITH h AS (
      SELECT date_trunc('week', ts)::TIMESTAMP AS bucket, event_type,
             CAST(greatest(0, least(49, floor((value - 0.0) / 10.0)))
               AS INT) AS bin,
             count(*) AS n
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2, 3
    ),
    c AS (
      SELECT bucket, event_type, bin,
             0.0 + CAST(bin AS DOUBLE) * 10.0 AS edge_lo, n,
             sum(n) OVER (PARTITION BY bucket, event_type ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(n) OVER (PARTITION BY bucket, event_type) AS tot
      FROM h
    )
    SELECT bucket, event_type, CAST(max(tot) AS BIGINT) AS n_rows,
           min(CASE WHEN cum * 100 >= 50 * tot THEN edge_lo END) AS p50,
           min(CASE WHEN cum * 100 >= 95 * tot THEN edge_lo END) AS p95,
           min(CASE WHEN cum * 100 >= 99 * tot THEN edge_lo END) AS p99
    FROM c GROUP BY 1, 2
    """,
)
def rollup_incremental_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mergeable PERCENTILE state for the incremental-rollup family
    (operators/rollup.py histogram_partials/merge_histogram_to_grain/
    histogram_percentiles): day-grain fixed-boundary histogram states
    merged to week grain, p50/p95/p99 derived at read — the one aggregate
    rollup_incremental_weekly could not carry (quantiles are not
    mergeable; BIN COUNTS are).  The oracle computes the weekly histogram
    percentile DIRECTLY from the fact: hash equality proves day→week
    state merge is exact (integer bin counts add), so a week-grain p95
    dashboard panel never rescans the fact table.  Percentile rank uses
    the integer comparison 100·cum >= q·total — no floating-point rank
    anywhere; resolution is one bin (width 10 over [0, 500))."""
    from ..operators.rollup import (
        histogram_partials,
        histogram_percentiles,
        merge_histogram_to_grain,
    )

    ev = _t(spark, sf_dir, "events")
    daily = histogram_partials(
        ev, dims=["event_type"], ts="ts", value="value",
        lo=0.0, hi=500.0, nbuckets=50, grain="day",
    )
    weekly = merge_histogram_to_grain(daily, dims=["event_type"], grain="week")
    return histogram_percentiles(
        weekly, dims=["event_type"], percentiles=(50, 95, 99)
    )


# Rows-only (no SQL oracle — pre-declared sketch class, same as
# distinct_sketch_rollup/dau_wau_sketch_rollup): anchor estimates come from
# percentile_approx's GK sketch, which is engine-specific; the exact twins
# (g4_percentiles, rollup_incremental_percentiles) carry the hash-checked
# percentile semantics, and test_shard_and_incremental bounds this sketch's
# error against the exact weekly answer (≤ 5%).
@_q("rollup_quantile_sketch")
def rollup_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-adaptive mergeable PERCENTILE state — the quantile analogue of
    the DAU→WAU HLL path (operators.rollup.quantile_sketch_partials/
    quantile_sketch_percentiles): per-(day, event_type) 64-anchor
    equi-weight sketches merged to week grain and read as p50/p95/p99,
    without re-scanning values and without the a-priori [lo, hi) spec the
    fixed-histogram rollup needs.  State is k doubles per (day, tag)
    regardless of raw volume (percentile_approx = bounded-memory GK);
    the weekly read windows over ≤ 7 × 64 state rows per group."""
    from ..operators.rollup import (
        quantile_sketch_partials,
        quantile_sketch_percentiles,
    )

    ev = _t(spark, sf_dir, "events")
    daily = quantile_sketch_partials(
        ev, dims=["event_type"], ts="ts", value="value", grain="day", k=64
    )
    return quantile_sketch_percentiles(
        daily, dims=["event_type"], grain="week", percentiles=(50, 95, 99)
    )


#: Snapshot split instant for the drift monitors: first vs second half of
#: the fixture's January-2024 event window (same range at every SF).
_DRIFT_SPLIT = "2024-01-16 00:00:00"


@_q(
    "psi_value_drift",
    f"""
    WITH e AS (
      SELECT event_type,
             CAST(greatest(0, least(49, floor((value - 0.0) / 10.0)))
               AS INT) AS bin,
             CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 1 ELSE 0
               END AS ia
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    spine AS (
      SELECT event_type, CAST(unnest(range(0, 50)) AS INT) AS bin
      FROM (SELECT DISTINCT event_type FROM e)
    ),
    ca AS (SELECT event_type, bin, count(*) AS na FROM e WHERE ia = 1
           GROUP BY 1, 2),
    cb AS (SELECT event_type, bin, count(*) AS nb FROM e WHERE ia = 0
           GROUP BY 1, 2),
    t AS (
      SELECT s.event_type, s.bin,
             CAST(coalesce(na, 0) AS DOUBLE) AS na,
             CAST(coalesce(nb, 0) AS DOUBLE) AS nb,
             CAST(sum(coalesce(na, 0)) OVER (PARTITION BY s.event_type)
               AS DOUBLE) AS ta,
             CAST(sum(coalesce(nb, 0)) OVER (PARTITION BY s.event_type)
               AS DOUBLE) AS tb
      FROM spine s
      LEFT JOIN ca USING (event_type, bin)
      LEFT JOIN cb USING (event_type, bin)
    ),
    terms AS (
      SELECT event_type, ta, tb,
             CAST((greatest(na / ta, 1e-6) - greatest(nb / tb, 1e-6))
                  * ln(greatest(na / ta, 1e-6) / greatest(nb / tb, 1e-6))
               AS DECIMAL(28,12)) AS term
      FROM t
    )
    SELECT event_type, CAST(max(ta) AS BIGINT) AS n_a,
           CAST(max(tb) AS BIGINT) AS n_b,
           round(CAST(sum(term) AS DOUBLE), 9) AS psi
    FROM terms GROUP BY 1
    """,
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event_type between the first and
    second half of the event window (operators.profile.psi_report) — the
    numeric companion to text_token_drift's JS divergence and the
    standard "did the corpus distribution shift between dumps" monitor a
    training-data pipeline runs per ingest (the reference's nightly
    build-size deltas are this exact question, rg.py:269-285).  Fixed
    bins [0, 500)/50 supplied with the baseline (never re-derived from
    the data), zero shares clamped to 1e-6 over the FULL bin grid
    (identical shares => PSI exactly 0 whatever the sample sizes),
    decimal-quantized ln terms.  One tagged-union count groupBy; the
    grid is |groups|·50 rows — never fact-sized."""
    from ..operators.profile import psi_report

    ev = _t(spark, sf_dir, "events")
    split = F.to_timestamp(F.lit(_DRIFT_SPLIT))
    return psi_report(
        ev.filter(F.col("ts") < split),
        ev.filter(F.col("ts") >= split),
        value_col="value", lo=0.0, hi=500.0, nbuckets=50,
        group_cols=["event_type"],
    )


@_q(
    "ks_value_drift",
    f"""
    WITH e AS (
      SELECT event_type, value AS v,
             CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 1 ELSE 0
               END AS ia
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    c AS (
      SELECT event_type, v, sum(ia) AS na, sum(1 - ia) AS nb
      FROM e GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type,
             sum(na) OVER (PARTITION BY event_type ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS ca,
             sum(nb) OVER (PARTITION BY event_type ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cb,
             sum(na) OVER (PARTITION BY event_type) AS ta,
             sum(nb) OVER (PARTITION BY event_type) AS tb
      FROM c
    )
    SELECT event_type, CAST(max(ta) AS BIGINT) AS n_a,
           CAST(max(tb) AS BIGINT) AS n_b,
           round(max(abs(CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE)
                         - CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))), 9)
             AS ks_d
    FROM w GROUP BY 1
    """,
)
def ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift per event_type between the
    same snapshot halves as psi_value_drift
    (operators.profile.ks_two_sample) — the bin-free cross-check: PSI
    quantizes to the baseline's fixed bins, KS sees any shift of the raw
    empirical CDFs.  Exact integer counts, per-row IEEE CDF difference,
    order-free max — no quantization needed anywhere.  One tagged-union
    count groupBy; windows run over the distinct-value axis only."""
    from ..operators.profile import ks_two_sample

    ev = _t(spark, sf_dir, "events")
    split = F.to_timestamp(F.lit(_DRIFT_SPLIT))
    return ks_two_sample(
        ev.filter(F.col("ts") < split),
        ev.filter(F.col("ts") >= split),
        value_col="value", group_cols=["event_type"],
    )


@_q(
    "mi_lang_source",
    """
    WITH j AS (
      SELECT coalesce(lang, chr(0) || 'null') AS a,
             coalesce(source, chr(0) || 'null') AS b,
             count(*) AS o
      FROM documents GROUP BY 1, 2
    ),
    ra AS (SELECT a, sum(o) AS ma FROM j GROUP BY 1),
    cb AS (SELECT b, sum(o) AS mb FROM j GROUP BY 1),
    tot AS (SELECT sum(o) AS n FROM j),
    ha AS (
      SELECT CAST(sum(CAST(-(CAST(ma AS DOUBLE) / CAST(n AS DOUBLE))
                           * ln(CAST(ma AS DOUBLE) / CAST(n AS DOUBLE))
                      AS DECIMAL(28,12))) AS DOUBLE) AS h
      FROM ra CROSS JOIN tot
    ),
    hb AS (
      SELECT CAST(sum(CAST(-(CAST(mb AS DOUBLE) / CAST(n AS DOUBLE))
                           * ln(CAST(mb AS DOUBLE) / CAST(n AS DOUBLE))
                      AS DECIMAL(28,12))) AS DOUBLE) AS h
      FROM cb CROSS JOIN tot
    ),
    mi AS (
      SELECT CAST(sum(CAST((CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
                  * ln(CAST(n AS DOUBLE) * CAST(o AS DOUBLE)
                       / (CAST(ma AS DOUBLE) * CAST(mb AS DOUBLE)))
                 AS DECIMAL(28,12))) AS DOUBLE) AS mi,
             first(n) AS n
      FROM j JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot
    )
    SELECT 'lang' AS col_a, 'source' AS col_b, CAST(n AS BIGINT) AS n,
           round(mi, 9) AS mi,
           round(mi / nullif(sqrt(ha.h * hb.h), 0), 9) AS nmi
    FROM mi CROSS JOIN ha CROSS JOIN hb
    """,
)
def mi_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information / NMI between lang and source
    (operators.profile.categorical_mutual_information) — the
    information-theoretic companion to assoc_lang_source: chi² answers
    "associated at all?", MI answers "how many nats does knowing the
    source save about the language" — the number a mixture designer
    reads before collapsing two stratification keys into one.  Observed
    cells only (empty cells contribute exactly 0, unlike chi² — no level
    grid), decimal-quantized log terms; one corpus-sized groupBy,
    broadcast marginals."""
    from ..operators.profile import categorical_mutual_information

    return categorical_mutual_information(
        _t(spark, sf_dir, "documents"), "lang", "source"
    )


@_q(
    "freq_trending_daily_users",
    """
    WITH e AS (
      SELECT date_trunc('day', ts)::TIMESTAMP AS bucket,
             CAST(user_id AS VARCHAR) AS user_id
      FROM events WHERE user_id IS NOT NULL
    ),
    tot AS (SELECT bucket, count(*) AS n FROM e GROUP BY 1),
    c AS (SELECT bucket, user_id, count(*) AS cnt FROM e GROUP BY 1, 2)
    SELECT c.bucket, c.user_id, CAST(cnt AS BIGINT) AS cnt,
           CAST(cnt AS DOUBLE) / n AS share
    FROM c JOIN tot ON c.bucket = tot.bucket
    WHERE cnt > n * 0.01
    """,
)
def freq_trending_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WINDOWED heavy hitters: per day bucket, every user whose
    event count exceeds 1% of that day's events
    (operators.profile.heavy_hitters_grouped with the day bucket as the
    group key) — the batch twin of streaming.stateful.stream_heavy_
    hitters' windowed trending surface, completing the family:
    freq_heavy_hitters is global, freq_heavy_hitters_grouped is
    per-source, this is per-time-window.  Same two-phase guarantee:
    phase 1 is a zero-shuffle per-(partition, day) Misra-Gries summary,
    phase 2 shuffles only candidate rows for the exact per-day recount —
    exactly GROUP BY day, user HAVING cnt > N_day·0.01 without shuffling
    the full (day, user) set."""
    from ..operators.profile import heavy_hitters_grouped

    ev = _t(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("bucket"), "user_id"
    )
    return heavy_hitters_grouped(
        ev, key_col="user_id", group_col="bucket", min_share=0.01
    )


@_q(
    "emb_centroid_drift",
    """
    WITH u AS (
      SELECT label, pos,
             CAST(round(embedding[pos]::DOUBLE, 6) AS DECIMAL(18,6)) AS x,
             CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END AS ia
      FROM embeddings, (SELECT unnest(range(1, 65)) AS pos) p
    ),
    per AS (
      SELECT label, pos,
             CAST(sum(CASE WHEN ia = 1 THEN x END) AS DOUBLE)
               / CAST(sum(ia) AS DOUBLE) AS ca,
             CAST(sum(CASE WHEN ia = 0 THEN x END) AS DOUBLE)
               / CAST(sum(1 - ia) AS DOUBLE) AS cb,
             sum(ia) AS na, sum(1 - ia) AS nb
      FROM u GROUP BY 1, 2
    ),
    t AS (
      SELECT label, na, nb,
             CAST(ca * cb AS DECIMAL(28,12)) AS dot_t,
             CAST(ca * ca AS DECIMAL(28,12)) AS a2_t,
             CAST(cb * cb AS DECIMAL(28,12)) AS b2_t,
             CAST((ca - cb) * (ca - cb) AS DECIMAL(28,12)) AS d2_t
      FROM per
    )
    SELECT label, CAST(max(na) AS BIGINT) AS n_a,
           CAST(max(nb) AS BIGINT) AS n_b,
           round(CAST(sum(dot_t) AS DOUBLE)
                 / sqrt(CAST(sum(a2_t) AS DOUBLE)
                        * CAST(sum(b2_t) AS DOUBLE)), 9)
             AS centroid_cosine,
           round(sqrt(CAST(sum(d2_t) AS DOUBLE)), 9) AS centroid_l2_shift
    FROM t GROUP BY 1
    """,
)
def emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid drift between two deterministic
    snapshot halves (operators.similarity.centroid_drift) — the
    embedding-modality drift monitor beside psi_value_drift (numeric) and
    text_token_drift (vocabulary): centroid cosine ~1 and small L2 shift
    mean the space is stable enough to reuse cached neighbors and
    similarity thresholds across the refresh.  One tagged-union
    posexplode into a single (label, dim) partial-aggregable groupBy;
    all drift math runs on that (labels × 64)-row state table with
    decimal-quantized per-dim products."""
    from ..operators.similarity import centroid_drift

    emb = _t(spark, sf_dir, "embeddings")
    return centroid_drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
    )


def _equi_depth_oracle(k: int) -> str:
    mins = ", ".join(
        f"min(CASE WHEN cum * {k} >= {j} * tot THEN v END) AS e{j}"
        for j in range(1, k)
    )
    case = " ".join(f"WHEN {j} THEN e{j}" for j in range(1, k))
    return f"""
    WITH c AS (
      SELECT event_type, value AS v, count(*) AS n
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, v,
             sum(n) OVER (PARTITION BY event_type ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(n) OVER (PARTITION BY event_type) AS tot
      FROM c
    ),
    wide AS (
      SELECT event_type, CAST(max(tot) AS BIGINT) AS n_rows, {mins}
      FROM w GROUP BY 1
    )
    SELECT event_type, CAST(j AS INT) AS edge_idx,
           CASE j {case} END AS edge, n_rows
    FROM wide, (SELECT unnest(range(1, {k})) AS j)
    """


@_q("equi_depth_value_edges", _equi_depth_oracle(10))
def equi_depth_value_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth decile edges of the event value per event_type
    (operators.profile.equi_depth_edges) — how psi_value_drift's fixed
    bins get CHOSEN: compute the j/k quantile edges on the baseline
    snapshot once (equal mass per bin maximizes PSI sensitivity), record
    them, monitor later snapshots against those bounds.  The nearest-rank
    pick uses the all-integer comparison k·cum >= j·n — engine-exact,
    like the histogram-rollup percentile reads.  One (group, value) count
    groupBy; windows run over the distinct-value axis only."""
    from ..operators.profile import equi_depth_edges

    return equi_depth_edges(
        _t(spark, sf_dir, "events"), value_col="value", k=10,
        group_cols=["event_type"],
    )


@_q(
    "mixture_ipf_weights",
    """
    WITH j AS (
      SELECT coalesce(lang, chr(0) || 'null') AS r,
             coalesce(source, chr(0) || 'null') AS c, count(*) AS n
      FROM documents GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(sum(n) AS DOUBLE) AS nt,
             CAST(count(DISTINCT r) AS DOUBLE) AS L,
             CAST(count(DISTINCT c) AS DOUBLE) AS S
      FROM j
    ),
    s0 AS (SELECT r, c, n, nt, L, S, 1.0 AS w FROM j CROSS JOIN tot),
    i1r AS (
      SELECT *, w * ((nt / L)
               / CAST(sum(CAST(n * w AS DECIMAL(28,12)))
                      OVER (PARTITION BY r) AS DOUBLE)) AS w1
      FROM s0
    ),
    i1c AS (
      SELECT *, w1 * ((nt / S)
                / CAST(sum(CAST(n * w1 AS DECIMAL(28,12)))
                       OVER (PARTITION BY c) AS DOUBLE)) AS w2
      FROM i1r
    ),
    i2r AS (
      SELECT *, w2 * ((nt / L)
                / CAST(sum(CAST(n * w2 AS DECIMAL(28,12)))
                       OVER (PARTITION BY r) AS DOUBLE)) AS w3
      FROM i1c
    ),
    i2c AS (
      SELECT *, w3 * ((nt / S)
                / CAST(sum(CAST(n * w3 AS DECIMAL(28,12)))
                       OVER (PARTITION BY c) AS DOUBLE)) AS w4
      FROM i2r
    )
    SELECT r AS lang, c AS source, CAST(n AS BIGINT) AS n,
           round(w4, 9) AS weight
    FROM i2c
    """,
)
def mixture_ipf_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D mixture raking (operators.curation.ipf_mixture_weights): IPF
    sampling weights over the lang×source contingency table toward
    UNIFORM shares on BOTH margins at once — mixture_weights balances one
    key; this is what a mixture designer runs when the corpus is skewed
    in language AND crawl simultaneously (fixing one margin un-fixes the
    other; IPF alternates it away).  Two fixed iterations == the unrolled
    4-window oracle, the fixed-iteration determinism contract shared with
    the graph operators; each iteration is two windows over the
    97-observed-cells table, never the corpus."""
    from ..operators.curation import ipf_mixture_weights

    return ipf_mixture_weights(
        _t(spark, sf_dir, "documents"), row_col="lang", col_col="source",
        iterations=2,
    )


@_q(
    "ks_uniform_fit",
    """
    WITH c AS (
      SELECT event_type, value AS v, count(*) AS n
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, v, n,
             sum(n) OVER (PARTITION BY event_type ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(n) OVER (PARTITION BY event_type) AS tot
      FROM c
    ),
    g AS (
      SELECT event_type, tot,
             greatest(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)
                      - greatest(0.0, least(1.0, (v - 0.0) / 500.0)),
                      greatest(0.0, least(1.0, (v - 0.0) / 500.0))
                      - CAST(cum - n AS DOUBLE) / CAST(tot AS DOUBLE))
               AS gap
      FROM w
    )
    SELECT event_type, CAST(max(tot) AS BIGINT) AS n,
           round(max(gap), 9) AS ks_d
    FROM g GROUP BY 1
    """,
)
def ks_uniform_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sample KS goodness-of-fit of the event value against uniform
    on [0, 500) per event_type (operators.profile.ks_goodness_of_fit) —
    the single-snapshot companion to ks_value_drift: instead of comparing
    two snapshots, test one against a KNOWN reference (the synthetic-data
    / sampling-key-uniformity sanity check; the fixture's value column is
    heavily right-skewed, so this reads far from 0 by design).  Both
    one-sided step gaps at every observed point; exact integer counts,
    order-free max — no quantization anywhere."""
    from ..operators.profile import ks_goodness_of_fit

    return ks_goodness_of_fit(
        _t(spark, sf_dir, "events"), value_col="value", lo=0.0, hi=500.0,
        group_cols=["event_type"],
    )


@_q(
    "quality_quantile_normalized",
    """
    WITH c AS (
      SELECT source, n_chars AS v, count(*) AS n
      FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL
      GROUP BY 1, 2
    ),
    w AS (
      SELECT source, v,
             CAST(sum(n) OVER (PARTITION BY source ORDER BY v
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               / CAST(sum(n) OVER (PARTITION BY source) AS DOUBLE) AS q
      FROM c
    ),
    p0 AS (SELECT v, sum(n) AS n FROM c GROUP BY 1),
    p AS (
      SELECT v AS vp,
             CAST(sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS DOUBLE)
               / CAST(sum(n) OVER () AS DOUBLE) AS qp
      FROM p0
    ),
    m AS (
      SELECT source, v,
             (SELECT min(vp) FROM p WHERE p.qp >= w.q) AS v_qn
      FROM w
    )
    SELECT d.doc_id, d.source, d.n_chars, m.v_qn AS n_chars_qn
    FROM documents d
    LEFT JOIN m ON d.source = m.source AND d.n_chars = m.v
    """,
)
def quality_quantile_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of the document length signal
    (operators.curation.quantile_normalize): each doc's n_chars replaced
    by the POOLED distribution's value at the doc's within-source
    quantile — per-source score calibration, the pass that makes one
    global quality threshold meaningful across heterogeneous crawls
    (equal within-source ranks get equal calibrated values by
    construction).  Exact integer-count quantiles; the pooled lookup is a
    forward as-of on the quantile axis (the J4 machinery on a non-time
    axis); rows map back through one (source, value)-keyed join."""
    from ..operators.curation import quantile_normalize

    docs = _t(spark, sf_dir, "documents")
    return quantile_normalize(docs, "n_chars", ["source"]).select(
        "doc_id", "source", "n_chars", "n_chars_qn"
    )


# --------------------------------------------------------------------------
# Round 7 — evaluation layer (operators/evaluation.py + profile.py κ/ρ):
# grades the quality classifier and the retrieval stack the way
# ann_recall_ivf grades the ANN index.
# --------------------------------------------------------------------------
def _quality_label_pairs(
    spark: SparkSession, sf_dir: str, checkpoint: bool = False
) -> DataFrame:
    """(doc_id, quality_score, gopher_keep): the classifier score paired
    with its Gopher-rule pseudo-label — the shared input of the round-7
    evaluation queries.  Pass ``checkpoint=True`` when the caller scans
    the pairs more than once (the narrow 3-column projection is far
    cheaper to materialize than re-running two text-heavy scans)."""
    from ..operators.textstats import gopher_quality_flags, quality_score

    docs = _t(spark, sf_dir, "documents")
    scored = quality_score(docs.select("doc_id", "text")).select(
        "doc_id", "quality_score"
    )
    flags = gopher_quality_flags(docs).select("doc_id", "gopher_keep")
    pairs = scored.join(flags, "doc_id")
    return pairs.localCheckpoint() if checkpoint else pairs


def _pairs_cte() -> str:
    """Shared oracle CTEs: p(doc_id, s double, y int) — quality_score
    paired with the gopher_keep pseudo-label."""
    return f"""
    q AS ({ORACLES["text_quality_scores"]}),
    g AS ({ORACLES["text_gopher_flags"]}),
    p AS (
      SELECT q.doc_id, q.quality_score AS s,
             CASE WHEN g.gopher_keep THEN 1 ELSE 0 END AS y
      FROM q JOIN g USING (doc_id)
    )"""


@_q(
    "quality_auc_report",
    f"""
    WITH {_pairs_cte()},
    bins AS (
      SELECT CAST(greatest(0, least(9, floor((s - 0.0) / 0.1))) AS INT)
               AS bin,
             count(*) AS n,
             round(CAST(sum(CAST(s AS DECIMAL(28,12))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE), 9) AS mean_score,
             round(CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE), 9)
               AS pos_rate
      FROM p GROUP BY 1
    ),
    c AS (SELECT s, sum(y) AS np, count(*) AS nt FROM p GROUP BY 1),
    r AS (
      SELECT np, nt,
             sum(nt) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) - nt AS cb
      FROM c
    ),
    a AS (
      SELECT CAST(sum(np) AS BIGINT) AS n_pos,
             CAST(sum(nt) - sum(np) AS BIGINT) AS n_neg,
             sum(CAST(np * (2 * cb + nt + 1) AS DECIMAL(38,0))) AS s2
      FROM r
    )
    SELECT bin, CAST(n AS BIGINT) AS n, mean_score, pos_rate,
           n_pos, n_neg,
           round(CAST(s2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)
                   AS DOUBLE)
                 / CAST(2 * n_pos * n_neg AS DOUBLE), 9) AS auc
    FROM bins CROSS JOIN a
    """,
)
def quality_auc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier evaluation report: 10-bin reliability table plus
    the rank-sum ROC-AUC of quality_score against the Gopher-rule
    pseudo-label (operators.evaluation.roc_auc + calibration_bins) — the
    one standard LLM-curation measurement the engine lacked: it grades
    the quality_score operator the way ann_recall_ivf grades IVF.  AUC is
    counts-based over the distinct-score axis with exact average-rank
    ties (integer arithmetic up to the final division); calibration sums
    decimal-quantized scores.  One scan each for score and label, a
    contingency-sized reduction, and a broadcast 1-row cross join."""
    from ..operators.evaluation import calibration_bins, roc_auc

    pairs = _quality_label_pairs(spark, sf_dir, checkpoint=True)
    bins = calibration_bins(pairs, "quality_score", "gopher_keep")
    auc = roc_auc(pairs, "quality_score", "gopher_keep")
    return bins.crossJoin(F.broadcast(auc))


@_q(
    "kappa_lang_agreement",
    f"""
    WITH pl AS ({ORACLES["text_lang_id"]}),
    j AS (
      SELECT predicted_lang AS a, lang AS b, count(*) AS o
      FROM pl WHERE predicted_lang IS NOT NULL AND lang IS NOT NULL
      GROUP BY 1, 2
    ),
    obs AS (
      SELECT sum(o) AS n,
             sum(CASE WHEN a = b THEN o ELSE 0 END) AS diag
      FROM j
    ),
    ma AS (SELECT a, sum(o) AS ma FROM j GROUP BY 1),
    mb AS (SELECT b, sum(o) AS mb FROM j GROUP BY 1),
    pe AS (
      SELECT coalesce(sum(CAST(ma AS DECIMAL(38,0)) * mb),
                      CAST(0 AS DECIMAL(38,0))) AS pe_num
      FROM ma JOIN mb ON ma.a = mb.b
    )
    SELECT 'predicted_lang' AS col_a, 'lang' AS col_b,
           CAST(n AS BIGINT) AS n,
           round(CAST(diag AS DOUBLE) / CAST(n AS DOUBLE), 9) AS po,
           round(CAST(pe_num AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 9) AS pe,
           round((CAST(diag AS DOUBLE) / CAST(n AS DOUBLE)
                  - CAST(pe_num AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                 / (1.0 - CAST(pe_num AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 9) AS kappa
    FROM obs CROSS JOIN pe
    """,
)
def kappa_lang_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ between the n-gram language-ID prediction and the stored
    lang column (operators.profile.cohen_kappa) — chance-corrected
    agreement, the labeled-data QA companion to lang_id_confusion (which
    materializes the matrix) and mi_lang_source (which scores shared
    information): raw accuracy flatters a predictor on a skewed label
    mix; κ subtracts what marginal chance alone would agree on.  Exact
    integer confusion counts and marginal products (decimal38), two
    divisions at the end; one fact-sized confusion groupBy, levels-sized
    marginal join."""
    from ..operators.profile import cohen_kappa
    from ..operators.textstats import predict_lang

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return cohen_kappa(predict_lang(docs), "predicted_lang", "lang")


@_q(
    "spearman_quality_length",
    f"""
    WITH q AS ({ORACLES["text_quality_scores"]}),
    p AS (
      SELECT d.lang, q.quality_score AS x, d.n_chars AS y
      FROM q JOIN documents d USING (doc_id)
      WHERE q.quality_score IS NOT NULL AND d.n_chars IS NOT NULL
        AND d.lang IS NOT NULL
    ),
    cx AS (SELECT lang, x, count(*) AS t FROM p GROUP BY 1, 2),
    rx AS (
      SELECT lang, x,
             2 * (sum(t) OVER (PARTITION BY lang ORDER BY x
                               ROWS UNBOUNDED PRECEDING) - t) + t + 1 AS rx
      FROM cx
    ),
    cy AS (SELECT lang, y, count(*) AS t FROM p GROUP BY 1, 2),
    ry AS (
      SELECT lang, y,
             2 * (sum(t) OVER (PARTITION BY lang ORDER BY y
                               ROWS UNBOUNDED PRECEDING) - t) + t + 1 AS ry
      FROM cy
    ),
    rr AS (
      SELECT p.lang, rx.rx, ry.ry
      FROM p JOIN rx USING (lang, x) JOIN ry USING (lang, y)
    ),
    m AS (
      SELECT lang, count(*) AS n,
             sum(CAST(rx AS DECIMAL(38,0))) AS sx,
             sum(CAST(ry AS DECIMAL(38,0))) AS sy,
             sum(CAST(rx AS DECIMAL(38,0)) * rx) AS sxx,
             sum(CAST(ry AS DECIMAL(38,0)) * ry) AS syy,
             sum(CAST(rx AS DECIMAL(38,0)) * ry) AS sxy
      FROM rr GROUP BY 1
    )
    SELECT lang, CAST(n AS BIGINT) AS n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9)
             AS rho
    FROM m
    """,
)
def spearman_quality_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Spearman rank correlation between quality_score and
    raw document length (operators.profile.spearman_correlation) — the
    monotonic-association screen profile_correlations can't do (Pearson
    sees lines; a quality score vs a size column is exactly where the
    relation is monotonic-but-curved, and where one must ask whether the
    "quality" signal is just length in disguise).  Tied values share
    average ranks; doubled ranks are exact integers, moments ride
    decimal(38,0); rank maps come from counts + distinct-axis windows —
    no global per-row ORDER BY anywhere."""
    from ..operators.profile import spearman_correlation
    from ..operators.textstats import quality_score

    docs = _t(spark, sf_dir, "documents")
    scored = quality_score(docs.select("doc_id", "text")).select(
        "doc_id", "quality_score"
    )
    joined = scored.join(docs.select("doc_id", "lang", "n_chars"), "doc_id")
    return spearman_correlation(
        joined, "quality_score", "n_chars", ["lang"]
    )


_PR_THRESHOLDS = (0.0, 0.2, 0.4, 0.5, 0.6, 0.8)


@_q(
    "eval_pr_thresholds",
    f"""
    WITH {_pairs_cte()},
    t AS (
      SELECT unnest([{", ".join(repr(t) for t in _PR_THRESHOLDS)}])
               AS threshold
    ),
    a AS (
      SELECT threshold,
             sum(CASE WHEN s >= threshold AND y = 1 THEN 1 ELSE 0 END)
               AS tp,
             sum(CASE WHEN s >= threshold AND y = 0 THEN 1 ELSE 0 END)
               AS fp,
             sum(CASE WHEN s < threshold AND y = 1 THEN 1 ELSE 0 END)
               AS fn
      FROM p CROSS JOIN t GROUP BY 1
    )
    SELECT threshold, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           CASE WHEN tp + fp = 0 THEN NULL
                ELSE round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 9)
             END AS precision,
           CASE WHEN tp + fn = 0 THEN NULL
                ELSE round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 9)
             END AS recall,
           CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
                ELSE round(CAST(2 * tp AS DOUBLE)
                           / CAST(2 * tp + fp + fn AS DOUBLE), 9)
             END AS f1
    FROM a
    """,
)
def eval_pr_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 of the quality classifier against the Gopher
    pseudo-label at six fixed decision thresholds
    (operators.evaluation.pr_at_thresholds) — the operating-point table a
    corpus-filter cutoff is chosen from.  All thresholds ride ONE scan as
    conditional integer aggregates (no per-threshold job), then the
    single result row explodes into six — the oracle's thresholds×rows
    cross join is the semantic twin, not the plan."""
    from ..operators.evaluation import pr_at_thresholds

    pairs = _quality_label_pairs(spark, sf_dir)
    return pr_at_thresholds(
        pairs, "quality_score", "gopher_keep", _PR_THRESHOLDS
    )


@_q(
    "lift_quality_deciles",
    f"""
    WITH {_pairs_cte()},
    c AS (SELECT s, sum(y) AS np, count(*) AS nt FROM p GROUP BY 1),
    w AS (
      SELECT np, nt,
             sum(nt) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING) AS c,
             sum(nt) OVER () AS n,
             sum(np) OVER () AS pp
      FROM c
    ),
    b AS (
      SELECT CAST(ceil((10 * c) / CAST(n AS DOUBLE)) AS INT) AS bucket,
             sum(nt) AS n, sum(np) AS n_pos,
             max(w.n) AS tot, max(pp) AS pos_tot
      FROM w GROUP BY 1
    )
    SELECT bucket, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
           round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 9) AS pos_rate,
           round(CAST(sum(n_pos) OVER (ORDER BY bucket
                                       ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / CAST(pos_tot AS DOUBLE), 9) AS cum_capture,
           round((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(pos_tot AS DOUBLE) / CAST(tot AS DOUBLE)), 9)
             AS lift
    FROM b
    """,
)
def lift_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table of the quality score against the
    Gopher pseudo-label (operators.evaluation.lift_table, 10 buckets) —
    "the top decile of the score holds X% of the keepers", the sentence a
    curation budget is decided on.  Buckets cut on the DISTINCT-SCORE
    axis (a tie group lands whole in ceil(10·cum/n) — deterministic with
    no per-row tiebreak and NO global row ranking, so nothing funnels
    through one partition); integer counts end-to-end."""
    from ..operators.evaluation import lift_table

    pairs = _quality_label_pairs(spark, sf_dir)
    return lift_table(pairs, "quality_score", "gopher_keep", 10)


def _bm25_run_and_qrels(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Shared retrieval-eval fixture: the BM25 top-5 run over the three
    deterministic fixture queries, plus term-overlap graded judgments
    (rel = distinct query tokens the doc contains)."""
    from ..operators.dedup import words
    from ..operators.ranking import bm25_search_topk

    docs = _t(spark, sf_dir, "documents")
    queries_df = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(words(F.col("text")), 1, 5), " ").alias(
            "query_text"
        ),
    )
    run = bm25_search_topk(docs, queries_df, k=5)
    qtok = queries_df.select(
        "query_id",
        F.explode(F.array_distinct(words(F.col("query_text")))).alias(
            "token"
        ),
    ).distinct()
    dtok = docs.select(
        "doc_id", F.explode(F.array_distinct(words(F.col("text")))).alias(
            "token"
        )
    )
    qrels = (
        dtok.join(F.broadcast(qtok), "token")
        .groupBy("query_id", "doc_id")
        .agg(F.count_distinct("token").alias("rel"))
    )
    return run, qrels



@_q(
    "ndcg_search_eval",
    f"""
    WITH run AS ({ORACLES["bm25_search_topk"]}),
    tok AS ({_DUCK_TOK}),
    q AS (
      SELECT doc_id AS query_id,
             array_to_string(
               (regexp_extract_all(lower(text), '[a-z0-9]+'))[1:5], ' ')
               AS qt
      FROM documents WHERE doc_id < 3
    ),
    qtok AS (
      SELECT DISTINCT query_id, t.tok AS token
      FROM q, unnest(regexp_extract_all(lower(qt), '[a-z0-9]+')) AS t(tok)
    ),
    qrels AS (
      SELECT qtok.query_id, dt.doc_id,
             count(DISTINCT dt.token) AS rel
      FROM (SELECT DISTINCT doc_id, token FROM tok) dt
      JOIN qtok USING (token)
      GROUP BY 1, 2
    ),
    dcg AS (
      SELECT run.query_id,
             CAST(sum(CAST((pow(2, coalesce(rel, 0)) - 1)
                           / log2(CAST(rank + 1 AS DOUBLE))
                        AS DECIMAL(28,12))) AS DOUBLE) AS dcg
      FROM run LEFT JOIN qrels USING (query_id, doc_id)
      WHERE rank <= 5 GROUP BY 1
    ),
    ideal AS (
      SELECT query_id, rel,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rel DESC, doc_id) AS ir
      FROM qrels
    ),
    idcg AS (
      SELECT query_id,
             CAST(sum(CAST((pow(2, rel) - 1)
                           / log2(CAST(ir + 1 AS DOUBLE))
                        AS DECIMAL(28,12))) AS DOUBLE) AS idcg
      FROM ideal WHERE ir <= 5 GROUP BY 1
    )
    SELECT dcg.query_id, round(dcg.dcg, 9) AS dcg,
           round(coalesce(idcg.idcg, 0.0), 9) AS idcg,
           CASE WHEN coalesce(idcg.idcg, 0.0) = 0.0 THEN NULL
                ELSE round(dcg.dcg / idcg.idcg, 9) END AS ndcg
    FROM dcg LEFT JOIN idcg USING (query_id)
    """,
)
def ndcg_search_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 of the BM25 run against graded term-overlap relevance
    (operators.evaluation.ndcg_at_k): rel(query, doc) = how many of the
    query's distinct tokens the doc contains — an independent lexical
    grade that rewards ordering multi-term matches first.  This grades
    the ranking stack the way ann_recall_ivf grades the ANN index.
    Gains 2^rel − 1 are exact ints; per-rank discounts quantize to
    decimal(28,12) before the per-query sums; the ideal ordering ranks
    judgments inside per-QUERY windows with a doc_id tiebreak.  The
    qrels join is broadcast (3 fixture queries × matched docs)."""
    from ..operators.evaluation import ndcg_at_k

    run, qrels = _bm25_run_and_qrels(spark, sf_dir)
    return ndcg_at_k(run, qrels, k=5).orderBy("query_id")


@_q(
    "keep_rate_wilson_ci",
    f"""
    WITH g AS ({ORACLES["text_gopher_flags"]}),
    p AS (
      SELECT d.lang, CASE WHEN g.gopher_keep THEN 1 ELSE 0 END AS y
      FROM g JOIN documents d USING (doc_id)
      WHERE d.lang IS NOT NULL AND g.gopher_keep IS NOT NULL
    ),
    a AS (SELECT lang, count(*) AS n, sum(y) AS k FROM p GROUP BY 1)
    SELECT lang, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
           round(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 9) AS rate,
           round(greatest(
             (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
              + {Z95 * Z95!r} / (2.0 * CAST(n AS DOUBLE)))
             / (1.0 + {Z95 * Z95!r} / CAST(n AS DOUBLE))
             - {Z95!r} * sqrt(
                 CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                 * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                 / CAST(n AS DOUBLE)
                 + {Z95 * Z95!r}
                   / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
               / (1.0 + {Z95 * Z95!r} / CAST(n AS DOUBLE)),
             0.0), 9) AS ci_lo,
           round(least(
             (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
              + {Z95 * Z95!r} / (2.0 * CAST(n AS DOUBLE)))
             / (1.0 + {Z95 * Z95!r} / CAST(n AS DOUBLE))
             + {Z95!r} * sqrt(
                 CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                 * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                 / CAST(n AS DOUBLE)
                 + {Z95 * Z95!r}
                   / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
               / (1.0 + {Z95 * Z95!r} / CAST(n AS DOUBLE)),
             1.0), 9) AS ci_hi
    FROM a
    """,
)
def keep_rate_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Gopher keep-rate with 95% Wilson score intervals
    (operators.evaluation.proportion_wilson_ci) — the error bar a
    keep-rate dashboard needs before comparing languages with very
    different corpus sizes (the naive normal interval collapses at rates
    near 0/1 and small n; Wilson stays inside [0,1]).  Exact integer
    counts, one closed-form IEEE expression per group (sqrt is
    correctly-rounded — deterministic across engines; the z² literal is
    Python-computed once and inlined identically in both plans)."""
    from ..operators.evaluation import proportion_wilson_ci
    from ..operators.textstats import gopher_quality_flags

    docs = _t(spark, sf_dir, "documents")
    flags = gopher_quality_flags(docs).select("doc_id", "gopher_keep")
    joined = flags.join(docs.select("doc_id", "lang"), "doc_id")
    return proportion_wilson_ci(joined, "gopher_keep", ["lang"])


@_q(
    "quality_calibration_summary",
    f"""
    WITH {_pairs_cte()},
    bins AS (
      SELECT CAST(greatest(0, least(9, floor((s - 0.0) / 0.1))) AS INT)
               AS b,
             count(*) AS nb,
             sum(CAST(s AS DECIMAL(28,12))) AS ss,
             sum(y) AS pos,
             sum(CAST((s - CAST(y AS DOUBLE)) * (s - CAST(y AS DOUBLE))
                   AS DECIMAL(28,12))) AS sq
      FROM p GROUP BY 1
    ),
    t AS (
      SELECT nb, sq, sum(nb) OVER () AS tot,
             abs(CAST(pos AS DOUBLE) / CAST(nb AS DOUBLE)
                 - CAST(ss AS DOUBLE) / CAST(nb AS DOUBLE)) AS gap
      FROM bins
    )
    SELECT CAST(max(tot) AS BIGINT) AS n,
           round(CAST(sum(sq) AS DOUBLE) / CAST(max(tot) AS DOUBLE), 9)
             AS brier,
           round(CAST(sum(CAST((CAST(nb AS DOUBLE) / CAST(tot AS DOUBLE))
                               * gap AS DECIMAL(28,12))) AS DOUBLE), 9)
             AS ece,
           round(max(gap), 9) AS mce
    FROM t
    """,
)
def quality_calibration_summary(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Single-row calibration grade of the quality classifier: Brier
    score plus expected/maximum calibration error over the same fixed
    bins as quality_auc_report's reliability table
    (operators.evaluation.calibration_summary) — AUC measures ranking,
    this measures whether the score VALUES mean what they say (the
    number one reads before using the score as a probability-like
    sampling weight).  One scan: per-bin counts, quantized score sums,
    and quantized per-row (s−y)² ride a single groupBy."""
    from ..operators.evaluation import calibration_summary

    pairs = _quality_label_pairs(spark, sf_dir)
    return calibration_summary(pairs, "quality_score", "gopher_keep")


@_q(
    "quality_auc_by_lang",
    f"""
    WITH q AS ({ORACLES["text_quality_scores"]}),
    g AS ({ORACLES["text_gopher_flags"]}),
    p AS (
      SELECT d.lang, q.quality_score AS s,
             CASE WHEN g.gopher_keep THEN 1 ELSE 0 END AS y
      FROM q JOIN g USING (doc_id) JOIN documents d USING (doc_id)
      WHERE d.lang IS NOT NULL
    ),
    c AS (SELECT lang, s, sum(y) AS np, count(*) AS nt FROM p
          GROUP BY 1, 2),
    r AS (
      SELECT lang, np, nt,
             sum(nt) OVER (PARTITION BY lang ORDER BY s
                           ROWS UNBOUNDED PRECEDING) - nt AS cb
      FROM c
    ),
    a AS (
      SELECT lang, CAST(sum(np) AS BIGINT) AS n_pos,
             CAST(sum(nt) - sum(np) AS BIGINT) AS n_neg,
             sum(CAST(np * (2 * cb + nt + 1) AS DECIMAL(38,0))) AS s2
      FROM r GROUP BY 1
    )
    SELECT lang, n_pos, n_neg,
           CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
                ELSE round(CAST(s2 - CAST(n_pos AS DECIMAL(38,0))
                                     * (n_pos + 1) AS DOUBLE)
                           / CAST(2 * n_pos * n_neg AS DOUBLE), 9)
             END AS auc
    FROM a
    """,
)
def quality_auc_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language ROC-AUC of the quality classifier
    (operators.evaluation.roc_auc grouped) — the fairness slice of
    quality_auc_report: a score that ranks English well and Chinese at
    chance filters the corpus with a language bias the global AUC hides.
    Same counts-based rank-sum machinery, windows partitioned per lang."""
    from ..operators.evaluation import roc_auc

    docs = _t(spark, sf_dir, "documents")
    pairs = _quality_label_pairs(spark, sf_dir).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    return roc_auc(pairs, "quality_score", "gopher_keep", ["lang"])


_BOOT_B = 40
_BOOT_CASE = " ".join(
    f"WHEN h < {t} THEN {k}"
    for k, t in enumerate(
        (26508507426831584, 53017014853663168, 66271268567078960,
         70689353138217560, 71793874281002208, 72014778509559136)
    )
)


@_q(
    "quality_mean_bootstrap_ci",
    f"""
    WITH q AS ({ORACLES["text_quality_scores"]}),
    base AS (
      SELECT CAST(doc_id AS VARCHAR) AS id, quality_score AS v
      FROM q WHERE quality_score IS NOT NULL
    ),
    rep AS (
      SELECT id, v, r
      FROM base CROSS JOIN (SELECT unnest(range(1, {_BOOT_B + 1})) AS r)
    ),
    wt AS (
      SELECT r, v, CASE {_BOOT_CASE} ELSE 6 END AS w
      FROM (
        SELECT r, v,
               ('0x' || substr(md5(id || chr(31) || r::VARCHAR), 1, 14))
                 ::BIGINT AS h
        FROM rep
      )
    ),
    m AS (
      SELECT CAST(
               CASE WHEN sum(w) = 0 THEN NULL
                    ELSE CAST(sum(CAST(v * w AS DECIMAL(28,12))) AS DOUBLE)
                         / CAST(sum(w) AS DOUBLE) END
               AS DECIMAL(28,12)) AS m
      FROM wt GROUP BY r
    ),
    boot AS (
      SELECT count(*) AS bn, sum(m) AS sm,
             sum(CAST(CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
                   AS DECIMAL(38,12))) AS smm
      FROM m WHERE m IS NOT NULL
    ),
    obs AS (
      SELECT count(*) AS n,
             round(CAST(sum(CAST(v AS DECIMAL(28,12))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE), 9) AS mean
      FROM base
    )
    SELECT CAST(n AS BIGINT) AS n, mean,
           round(sqrt(greatest(
             (CAST(bn AS DOUBLE) * CAST(smm AS DOUBLE)
              - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
             / (CAST(bn AS DOUBLE) * (CAST(bn AS DOUBLE) - 1.0)),
             0.0)), 9) AS se_boot,
           round(mean - {Z95!r} * sqrt(greatest(
             (CAST(bn AS DOUBLE) * CAST(smm AS DOUBLE)
              - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
             / (CAST(bn AS DOUBLE) * (CAST(bn AS DOUBLE) - 1.0)),
             0.0)), 9) AS ci_lo,
           round(mean + {Z95!r} * sqrt(greatest(
             (CAST(bn AS DOUBLE) * CAST(smm AS DOUBLE)
              - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
             / (CAST(bn AS DOUBLE) * (CAST(bn AS DOUBLE) - 1.0)),
             0.0)), 9) AS ci_hi
    FROM obs CROSS JOIN boot
    """,
)
def quality_mean_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error bar on the corpus mean quality score via the DETERMINISTIC
    Poisson bootstrap (operators.evaluation.bootstrap_mean_ci, B=40) —
    the scalable bootstrap: replicate membership is a row-local
    Poisson(1) draw from md5(doc, replicate) against Python-precomputed
    CDF thresholds, so both engines (and any two cluster runs) draw
    bit-identical replicates and the CI itself is hash-checkable.  The
    ×B scan inflation is the explicit cost knob; everything reduces
    through partial-aggregable decimal sums — this is how ANY corpus
    statistic gets an error bar at 100 TB without a resampling shuffle."""
    from ..operators.evaluation import bootstrap_mean_ci
    from ..operators.textstats import quality_score

    docs = _t(spark, sf_dir, "documents")
    scored = quality_score(docs.select("doc_id", "text")).select(
        "doc_id", "quality_score"
    )
    return bootstrap_mean_ci(scored, "quality_score", "doc_id", b=_BOOT_B)


@_q(
    "lang_id_class_report",
    f"""
    WITH pl AS ({ORACLES["text_lang_id"]}),
    j AS (
      SELECT lang AS t, predicted_lang AS p, count(*) AS o
      FROM pl WHERE lang IS NOT NULL AND predicted_lang IS NOT NULL
      GROUP BY 1, 2
    ),
    rm AS (SELECT t, sum(o) AS support FROM j GROUP BY 1),
    cm AS (SELECT p, sum(o) AS pred FROM j GROUP BY 1),
    dg AS (SELECT t AS label, o AS tp FROM j WHERE t = p),
    lb AS (SELECT t AS label FROM rm UNION SELECT p FROM cm),
    f AS (
      SELECT lb.label,
             coalesce(support, 0) AS support,
             coalesce(tp, 0) AS tp,
             coalesce(pred, 0) - coalesce(tp, 0) AS fp,
             coalesce(support, 0) - coalesce(tp, 0) AS fn
      FROM lb LEFT JOIN rm ON lb.label = rm.t
              LEFT JOIN cm ON lb.label = cm.p
              LEFT JOIN dg USING (label)
    )
    SELECT label, CAST(support AS BIGINT) AS support,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           CASE WHEN tp + fp = 0 THEN NULL
                ELSE round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 9)
             END AS precision,
           CASE WHEN tp + fn = 0 THEN NULL
                ELSE round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 9)
             END AS recall,
           CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
                ELSE round(CAST(2 * tp AS DOUBLE)
                           / CAST(2 * tp + fp + fn AS DOUBLE), 9)
             END AS f1
    FROM f
    """,
)
def lang_id_class_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 of the n-gram language ID against
    the stored lang (operators.evaluation.classification_report) — the
    per-class view κ averages away: kappa_lang_agreement says "better
    than chance overall", this says WHICH language the predictor misses
    (the per-stratum QA a mixture built on predicted lang needs).  Exact
    integer confusion counts; one fact-sized groupBy, levels-axis
    broadcast joins."""
    from ..operators.evaluation import classification_report
    from ..operators.textstats import predict_lang

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return classification_report(predict_lang(docs), "lang", "predicted_lang")


@_q(
    "retrieval_recall_mrr",
    f"""
    WITH run AS ({ORACLES["bm25_search_topk"]}),
    tok AS ({_DUCK_TOK}),
    q AS (
      SELECT doc_id AS query_id,
             array_to_string(
               (regexp_extract_all(lower(text), '[a-z0-9]+'))[1:5], ' ')
               AS qt
      FROM documents WHERE doc_id < 3
    ),
    qtok AS (
      SELECT DISTINCT query_id, t.tok AS token
      FROM q, unnest(regexp_extract_all(lower(qt), '[a-z0-9]+')) AS t(tok)
    ),
    qrels AS (
      SELECT qtok.query_id, dt.doc_id,
             count(DISTINCT dt.token) AS rel
      FROM (SELECT DISTINCT doc_id, token FROM tok) dt
      JOIN qtok USING (token)
      GROUP BY 1, 2
    ),
    rel AS (SELECT query_id, doc_id, (rel >= 2) AS is_rel FROM qrels),
    tot AS (SELECT query_id, count(*) AS n_rel FROM rel WHERE is_rel
            GROUP BY 1),
    per AS (
      SELECT run.query_id,
             sum(CASE WHEN coalesce(is_rel, false) THEN 1 ELSE 0 END)
               AS hits,
             min(CASE WHEN coalesce(is_rel, false) THEN rank END)
               AS first
      FROM run LEFT JOIN rel USING (query_id, doc_id)
      WHERE rank <= 5 GROUP BY 1
    )
    SELECT per.query_id,
           CAST(coalesce(n_rel, 0) AS BIGINT) AS n_rel,
           CAST(hits AS BIGINT) AS hits,
           CASE WHEN coalesce(n_rel, 0) = 0 THEN NULL
                ELSE round(CAST(hits AS DOUBLE) / CAST(n_rel AS DOUBLE), 9)
             END AS recall,
           round(coalesce(1.0 / CAST(first AS DOUBLE), 0.0), 9) AS rr
    FROM per LEFT JOIN tot USING (query_id)
    """,
)
def retrieval_recall_mrr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 and reciprocal rank of the BM25 run against the same
    term-overlap judgments as ndcg_search_eval, relevant = rel ≥ 2
    (operators.evaluation.retrieval_recall_mrr) — the binary-relevance
    companions: NDCG grades the whole ordering, recall@k answers "did
    the 5-cut keep the multi-term matches", RR answers "how deep is the
    first one".  n_rel counts ALL relevant judgments (the honest recall
    denominator), not just retrieved ones."""
    from ..operators.evaluation import retrieval_recall_mrr

    run, qrels = _bm25_run_and_qrels(spark, sf_dir)
    return retrieval_recall_mrr(run, qrels, k=5, rel_threshold=2).orderBy(
        "query_id"
    )


@_q(
    "ts_autocorrelation",
    """
    WITH e AS (
      SELECT event_type, ts, event_id, value
      FROM events WHERE value IS NOT NULL
    ),
    m AS (
      SELECT event_type,
             CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS mu
      FROM e GROUP BY 1
    ),
    x AS (
      SELECT e.event_type,
             CAST(value AS DOUBLE) - mu AS xc,
             lag(CAST(value AS DOUBLE) - mu, 1) OVER w AS l1,
             lag(CAST(value AS DOUBLE) - mu, 2) OVER w AS l2,
             lag(CAST(value AS DOUBLE) - mu, 3) OVER w AS l3
      FROM e JOIN m USING (event_type)
      WINDOW w AS (PARTITION BY e.event_type ORDER BY ts, event_id)
    ),
    a AS (
      SELECT event_type,
             sum(CAST(xc * xc AS DECIMAL(28,12))) AS den,
             sum(CAST(xc * l1 AS DECIMAL(28,12))) AS n1, count(l1) AS c1,
             sum(CAST(xc * l2 AS DECIMAL(28,12))) AS n2, count(l2) AS c2,
             sum(CAST(xc * l3 AS DECIMAL(28,12))) AS n3, count(l3) AS c3
      FROM x GROUP BY 1
    )
    SELECT event_type, lag, n_pairs,
           CASE WHEN CAST(den AS DOUBLE) = 0.0 THEN NULL
                ELSE round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 9)
             END AS acf
    FROM (
      SELECT event_type, 1 AS lag, CAST(c1 AS BIGINT) AS n_pairs,
             n1 AS num, den FROM a
      UNION ALL
      SELECT event_type, 2, CAST(c2 AS BIGINT), n2, den FROM a
      UNION ALL
      SELECT event_type, 3, CAST(c3 AS BIGINT), n3, den FROM a
    )
    """,
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series autocorrelation at lags 1-3
    (operators.timeseries.autocorrelation) — the seasonality/memory
    detector read before choosing a Holt-Winters season length or gap
    horizon.  Exact decimal mean, decimal-quantized centered products;
    all lags ride ONE per-series window sort (one Exchange), numerators
    and the shared full-series denominator reduce in one aggregate."""
    from ..operators.timeseries import autocorrelation

    ev = _t(spark, sf_dir, "events")
    return autocorrelation(
        ev, ["event_type"], "ts", "value", max_lag=3, tiebreak="event_id"
    )


#: Benford expected shares — Python-computed once, inlined identically in
#: both engines.
import math as _math  # noqa: E402

_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {_math.log10(1 + 1 / d)!r}" for d in range(1, 10)
)


@_q(
    "benford_totalprice",
    f"""
    WITH s AS (
      SELECT CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0, 0) AS BIGINT)
               AS h
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    c AS (
      SELECT CAST(substr(CAST(h AS VARCHAR), 1, 1) AS INT) AS digit,
             count(*) AS n
      FROM s WHERE h > 0 GROUP BY 1
    ),
    t AS (
      SELECT digit, n,
             CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS share,
             CASE digit {_BENFORD_CASE} ELSE 0.0 END AS expected
      FROM c
    )
    SELECT digit, CAST(n AS BIGINT) AS n, round(share, 9) AS share,
           round(expected, 9) AS expected,
           round(abs(share - expected), 9) AS abs_dev
    FROM t
    """,
)
def benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of the order-amount column
    (operators.profile.benford_first_digit) — the fabricated-/synthetic-
    data smell test: organic multi-scale amounts follow log10(1+1/d);
    generated or truncated data usually doesn't.  (The fixture data is
    synthetic, so the DEVIATION columns are the interesting output —
    exactly what the audit is for.)  Digit extraction is string-over-
    exact-integer (never log10-bucketing a double); one 9-ary count
    groupBy."""
    from ..operators.profile import benford_first_digit

    return benford_first_digit(
        _t(spark, sf_dir, "orders"), "o_totalprice", decimals=2
    )


@_q(
    "source_gini",
    """
    WITH c AS (
      SELECT source AS g, count(*) AS x FROM documents
      WHERE source IS NOT NULL GROUP BY 1
    ),
    r AS (SELECT x, row_number() OVER (ORDER BY x, g) AS i FROM c),
    a AS (
      SELECT count(*) AS n_groups, sum(x) AS total,
             sum(CAST(i AS DECIMAL(38,0)) * x) AS iw
      FROM r
    )
    SELECT CAST(n_groups AS BIGINT) AS n_groups,
           CAST(total AS BIGINT) AS total,
           round(2.0 * CAST(iw AS DOUBLE)
                 / (CAST(n_groups AS DOUBLE) * CAST(total AS DOUBLE))
                 - (CAST(n_groups AS DOUBLE) + 1.0)
                   / CAST(n_groups AS DOUBLE), 9) AS gini
    FROM a
    """,
)
def source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document mass across sources
    (operators.profile.concentration_gini) — the one-number corpus-
    balance reading (0 = every source equal, →1 = one source is the
    corpus) tracked release-over-release beside mixture_weights.  Integer
    counts and ranks; the rank window runs over the |sources| axis, never
    fact-sized."""
    from ..operators.profile import concentration_gini

    return concentration_gini(_t(spark, sf_dir, "documents"), "source")


@_q(
    "text_lexical_diversity",
    """
    WITH t AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, len(toks)::BIGINT AS n_tokens,
             len(list_distinct(toks))::BIGINT AS n_types,
             len(list_filter(list_distinct(toks),
                 u -> len(list_filter(toks, w -> w = u)) = 1))::BIGINT
               AS n_hapax
      FROM t
    )
    SELECT doc_id, n_tokens, n_types, n_hapax,
           CASE WHEN n_tokens = 0 THEN NULL
                ELSE round(CAST(n_types AS DOUBLE)
                           / CAST(n_tokens AS DOUBLE), 9) END AS ttr,
           CASE WHEN n_types = 0 THEN NULL
                ELSE round(CAST(n_hapax AS DOUBLE)
                           / CAST(n_types AS DOUBLE), 9) END AS hapax_ratio
    FROM s
    """,
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document type-token ratio and hapax ratio
    (operators.textstats.lexical_diversity) — the vocabulary-richness
    quality axis: spun/template text passes the line-level repetition
    gate yet shows abnormally low TTR; keyboard-mash noise shows TTR ≈ 1.
    Entirely row-local array functions — the zero-shuffle corpus-scan
    plan class."""
    from ..operators.textstats import lexical_diversity

    return lexical_diversity(_t(spark, sf_dir, "documents"))


@_q(
    "ts_cross_correlation",
    """
    WITH s AS (
      SELECT date_trunc('hour', ts)::TIMESTAMP AS bucket,
             CASE WHEN count(CASE WHEN event_type = 'click' THEN 1 END) = 0
                  THEN NULL
                  ELSE CAST(sum(CASE WHEN event_type = 'click'
                                THEN CAST(value AS DECIMAL(28,6)) END)
                         AS DOUBLE)
                       / CAST(count(CASE WHEN event_type = 'click' THEN 1
                                    END) AS DOUBLE) END AS a,
             CASE WHEN count(CASE WHEN event_type = 'error' THEN 1 END) = 0
                  THEN NULL
                  ELSE CAST(sum(CASE WHEN event_type = 'error'
                                THEN CAST(value AS DECIMAL(28,6)) END)
                         AS DOUBLE)
                       / CAST(count(CASE WHEN event_type = 'error' THEN 1
                                    END) AS DOUBLE) END AS b
      FROM events WHERE value IS NOT NULL
        AND event_type IN ('click', 'error')
      GROUP BY 1
    ),
    base AS (SELECT * FROM s WHERE a IS NOT NULL AND b IS NOT NULL),
    stat AS (
      SELECT CAST(sum(CAST(a AS DECIMAL(28,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS ma,
             CAST(sum(CAST(b AS DECIMAL(28,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS mb
      FROM base
    ),
    x AS (
      SELECT a - ma AS ac, b - mb AS bc,
             lead(b - mb, 1) OVER w AS bp1, lag(b - mb, 1) OVER w AS bm1,
             lead(b - mb, 2) OVER w AS bp2, lag(b - mb, 2) OVER w AS bm2,
             lead(b - mb, 3) OVER w AS bp3, lag(b - mb, 3) OVER w AS bm3
      FROM base CROSS JOIN stat
      WINDOW w AS (ORDER BY bucket)
    ),
    agg AS (
      SELECT sum(CAST(ac * ac AS DECIMAL(28,12))) AS da,
             sum(CAST(bc * bc AS DECIMAL(28,12))) AS db,
             sum(CAST(ac * bc AS DECIMAL(28,12))) AS n0, count(bc) AS c0,
             sum(CAST(ac * bp1 AS DECIMAL(28,12))) AS np1,
             count(bp1) AS cp1,
             sum(CAST(ac * bm1 AS DECIMAL(28,12))) AS nm1,
             count(bm1) AS cm1,
             sum(CAST(ac * bp2 AS DECIMAL(28,12))) AS np2,
             count(bp2) AS cp2,
             sum(CAST(ac * bm2 AS DECIMAL(28,12))) AS nm2,
             count(bm2) AS cm2,
             sum(CAST(ac * bp3 AS DECIMAL(28,12))) AS np3,
             count(bp3) AS cp3,
             sum(CAST(ac * bm3 AS DECIMAL(28,12))) AS nm3,
             count(bm3) AS cm3
      FROM x
    )
    SELECT lag, n_pairs,
           round(CAST(num AS DOUBLE)
                 / sqrt(CAST(da AS DOUBLE) * CAST(db AS DOUBLE)), 9) AS ccf
    FROM (
      SELECT -3 AS lag, CAST(cm3 AS BIGINT) AS n_pairs, nm3 AS num,
             da, db FROM agg
      UNION ALL SELECT -2, CAST(cm2 AS BIGINT), nm2, da, db FROM agg
      UNION ALL SELECT -1, CAST(cm1 AS BIGINT), nm1, da, db FROM agg
      UNION ALL SELECT 0, CAST(c0 AS BIGINT), n0, da, db FROM agg
      UNION ALL SELECT 1, CAST(cp1 AS BIGINT), np1, da, db FROM agg
      UNION ALL SELECT 2, CAST(cp2 AS BIGINT), np2, da, db FROM agg
      UNION ALL SELECT 3, CAST(cp3 AS BIGINT), np3, da, db FROM agg
    )
    """,
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation between the hourly click and error series at
    lags −3..+3 (operators.timeseries.cross_correlation) — the lead/lag
    screen: a peak off lag 0 says one signal FOLLOWS the other by that
    many hours.  Both series come from ONE conditional-aggregate bucket
    groupBy (never two scans); the CCF machinery then runs over the
    bucket axis — hours-in-range rows, never fact-sized, however large
    the corpus."""
    from ..operators.timeseries import cross_correlation

    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin("click", "error")
    )

    def side(t: str, out: str):
        cond = F.col("event_type") == t
        return F.try_divide(
            F.sum(F.when(cond, F.col("value").cast("decimal(28,6)")))
            .cast("double"),
            F.count(F.when(cond, F.lit(1))).cast("double"),
        ).alias(out)

    series = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(side("click", "a"), side("error", "b"))
    return cross_correlation(series, "bucket", "a", "b", max_lag=3)


@_q(
    "ts_seasonal_decompose",
    """
    WITH s AS (
      SELECT event_type, date_trunc('hour', ts)::TIMESTAMP AS bucket,
             CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS value
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    t AS (
      SELECT *,
             CASE WHEN count(*) OVER wf = 25
                  THEN CAST(sum(CAST(value AS DECIMAL(28,6))) OVER wf
                         AS DOUBLE) / 25.0 END AS trend,
             CAST((row_number() OVER w - 1) % 24 AS INT) AS season_idx
      FROM s
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket),
             wf AS (PARTITION BY event_type ORDER BY bucket
                    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    m AS (
      SELECT event_type, season_idx,
             CAST(sum(CAST(value - trend AS DECIMAL(28,12))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS s_raw
      FROM t WHERE trend IS NOT NULL GROUP BY 1, 2
    ),
    m2 AS (
      SELECT event_type, season_idx,
             round(s_raw
                   - CAST(sum(CAST(s_raw AS DECIMAL(28,12)))
                       OVER (PARTITION BY event_type) AS DOUBLE)
                     / CAST(count(*) OVER (PARTITION BY event_type)
                         AS DOUBLE), 9) AS seasonal
      FROM m
    )
    SELECT t.event_type, bucket, value, season_idx,
           round(trend, 9) AS trend, seasonal,
           round(value - trend - seasonal, 9) AS resid
    FROM t LEFT JOIN m2 USING (event_type, season_idx)
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the hourly per-type series
    with a daily period (operators.timeseries.seasonal_decompose,
    period=24): value = trend (25-point centered MA, NULL at edges)
    + seasonal (re-centered per-hour-of-day mean of the detrended
    series) + resid — the full decomposition behind
    ts_seasonal_anomalies' residual flags.  One window sort per series
    over the BUCKET axis (never fact-sized after the hourly aggregate);
    the seasonal map is a broadcast (types × 24) join."""
    from ..operators.timeseries import seasonal_decompose

    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    series = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("value")
    )
    return seasonal_decompose(series, ["event_type"], "bucket", "value", 24)


@_q(
    "ab_purchase_rate_test",
    f"""
    WITH u AS (
      SELECT CAST(user_id % 2 AS VARCHAR) AS v,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    per AS (SELECT v, count(*) AS n, sum(y) AS k FROM u GROUP BY 1),
    p AS (
      SELECT a.v AS variant_a, a.n AS n_a, a.k AS k_a,
             b.v AS variant_b, b.n AS n_b, b.k AS k_b
      FROM per a JOIN per b ON a.v < b.v
    ),
    zc AS (
      SELECT *,
             CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
             CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
             (CAST(k_a AS DOUBLE) + CAST(k_b AS DOUBLE))
               / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pool
      FROM p
    ),
    zz AS (
      SELECT *,
             CASE WHEN sqrt(pool * (1.0 - pool)
                            * (1.0 / CAST(n_a AS DOUBLE)
                               + 1.0 / CAST(n_b AS DOUBLE))) = 0.0
                  THEN NULL
                  ELSE (pa - pb)
                       / sqrt(pool * (1.0 - pool)
                              * (1.0 / CAST(n_a AS DOUBLE)
                                 + 1.0 / CAST(n_b AS DOUBLE))) END AS zr
      FROM zc
    )
    SELECT variant_a, variant_b,
           CAST(n_a AS BIGINT) AS n_a, CAST(k_a AS BIGINT) AS k_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(k_b AS BIGINT) AS k_b,
           round(pa, 9) AS rate_a, round(pb, 9) AS rate_b,
           round(pa - pb, 9) AS diff, round(zr, 9) AS z,
           abs(zr) > {Z95!r} AS significant
    FROM zz
    """,
)
def ab_purchase_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test of user-level purchase conversion between
    the two hash-split experiment arms (user_id parity — the
    deterministic assignment a real experiment uses;
    operators.evaluation.ab_proportion_test) — the "did the new
    filter/prompt/mixture move conversion" readout beside
    keep_rate_wilson_ci's per-group error bars.  Unit of analysis is the
    USER (one max-flag row per user — never event-level pseudo-
    replication); exact counts, one closed-form IEEE expression per
    variant pair, |variants|-sized broadcast pair join."""
    from ..operators.evaluation import ab_proportion_test

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select(
        (F.col("user_id") % 2).cast("string").alias("variant"),
        "converted",
    )
    return ab_proportion_test(users, "variant", "converted")


@_q(
    "freq_boilerplate_trigrams",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ),
    tri AS (
      SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
      FROM toks, unnest(range(1, greatest(len(t) - 1, 1))) AS u(i)
      WHERE len(t) >= 3 AND i <= len(t) - 2
    ),
    tot AS (SELECT count(*) AS n FROM tri),
    c AS (SELECT g, count(*) AS cnt FROM tri GROUP BY 1)
    SELECT g AS key, CAST(cnt AS BIGINT) AS cnt,
           cnt::DOUBLE / n AS share
    FROM c, tot
    WHERE cnt > n * 0.0002
    """,
)
def freq_boilerplate_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide frequent word-trigrams — the boilerplate-template
    detector (a trigram carried by thousands of documents is a nav bar,
    cookie banner, or license header, not content; its doc set is the
    removal candidate list for boilerplate_removal).  Composes
    textstats.ngram_list (counting-form n-grams) into profile.
    heavy_hitters: per-partition Misra-Gries candidates capped at
    ~1/min_share counters + exact broadcast recount — exactly GROUP BY
    trigram HAVING share > s with memory O(capacity), never a
    full-vocabulary groupBy over the n-gram explosion."""
    from ..operators.profile import heavy_hitters
    from ..operators.textstats import ngram_list

    docs = _t(spark, sf_dir, "documents")
    tri = docs.select(
        F.explode(ngram_list(F.col("text"), 3)).alias("key")
    )
    return heavy_hitters(tri, key_col="key", min_share=0.0002)


@_q(
    "quality_auc_bootstrap_ci",
    f"""
    WITH {_pairs_cte()},
    rep AS (
      SELECT CAST(doc_id AS VARCHAR) AS id, s, y, r
      FROM p CROSS JOIN (SELECT unnest(range(1, {_BOOT_B + 1})) AS r)
    ),
    wt AS (
      SELECT r, s, y, CASE {_BOOT_CASE} ELSE 6 END AS w
      FROM (
        SELECT r, s, y,
               ('0x' || substr(md5(id || chr(31) || r::VARCHAR), 1, 14))
                 ::BIGINT AS h
        FROM rep
      )
    ),
    counts AS (
      SELECT r, s, sum(w * y) AS np, sum(w) AS nt
      FROM wt GROUP BY 1, 2 HAVING sum(w) > 0
    ),
    cum AS (
      SELECT r, np, nt,
             sum(nt) OVER (PARTITION BY r ORDER BY s
                           ROWS UNBOUNDED PRECEDING) - nt AS cb
      FROM counts
    ),
    per AS (
      SELECT r, sum(np) AS pos, sum(nt) - sum(np) AS neg,
             sum(CAST(np * (2 * cb + nt + 1) AS DECIMAL(38,0))) AS s2
      FROM cum GROUP BY 1
    ),
    aucs AS (
      SELECT CAST(
               CASE WHEN pos = 0 OR neg = 0 THEN NULL
                    ELSE CAST(s2 - CAST(pos AS DECIMAL(38,0)) * (pos + 1)
                           AS DOUBLE)
                         / CAST(2 * pos * neg AS DOUBLE) END
               AS DECIMAL(28,12)) AS a
      FROM per
    ),
    boot AS (
      SELECT count(*) AS bn, sum(a) AS sa,
             sum(CAST(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
                   AS DECIMAL(38,12))) AS saa
      FROM aucs WHERE a IS NOT NULL
    ),
    oc AS (SELECT s, sum(y) AS np, count(*) AS nt FROM p GROUP BY 1),
    orr AS (
      SELECT np, nt,
             sum(nt) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) - nt AS cb
      FROM oc
    ),
    oa AS (
      SELECT CAST(sum(np) AS BIGINT) AS n_pos,
             CAST(sum(nt) - sum(np) AS BIGINT) AS n_neg,
             round(CAST(sum(CAST(np * (2 * cb + nt + 1) AS DECIMAL(38,0)))
                        - CAST(sum(np) AS DECIMAL(38,0)) * (sum(np) + 1)
                     AS DOUBLE)
                   / CAST(2 * sum(np) * (sum(nt) - sum(np)) AS DOUBLE), 9)
               AS auc
      FROM orr
    )
    SELECT n_pos, n_neg, auc,
           round(sqrt(greatest(
             (CAST(bn AS DOUBLE) * CAST(saa AS DOUBLE)
              - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
             / (CAST(bn AS DOUBLE) * (CAST(bn AS DOUBLE) - 1.0)),
             0.0)), 9) AS se_boot,
           round(auc - {Z95!r} * sqrt(greatest(
             (CAST(bn AS DOUBLE) * CAST(saa AS DOUBLE)
              - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
             / (CAST(bn AS DOUBLE) * (CAST(bn AS DOUBLE) - 1.0)),
             0.0)), 9) AS ci_lo,
           round(auc + {Z95!r} * sqrt(greatest(
             (CAST(bn AS DOUBLE) * CAST(saa AS DOUBLE)
              - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
             / (CAST(bn AS DOUBLE) * (CAST(bn AS DOUBLE) - 1.0)),
             0.0)), 9) AS ci_hi
    FROM oa CROSS JOIN boot
    """,
)
def quality_auc_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval on the quality classifier's AUC
    (operators.evaluation.roc_auc_bootstrap_ci, B=40) — "is 0.74 vs
    0.71 a real ranking improvement or resample noise", the question a
    filter-model comparison actually asks.  The deterministic Poisson
    replicate weights are integer MULTIPLICITIES, so they slot directly
    into the rank-sum identity: each replicate's AUC is the exact
    tie-aware statistic of its weighted multiset.  Per-replicate windows
    run over the distinct-score axis partitioned by replicate; moments
    of the quantized replicate AUCs ride exact decimals."""
    from ..operators.evaluation import roc_auc_bootstrap_ci

    pairs = _quality_label_pairs(spark, sf_dir, checkpoint=True)
    return roc_auc_bootstrap_ci(
        pairs, "quality_score", "gopher_keep", "doc_id", b=_BOOT_B
    )


_DELTA_AUC_SE = f"""sqrt(greatest(
             (CAST(bn AS DOUBLE) * CAST(sdd AS DOUBLE)
              - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
             / (CAST(bn AS DOUBLE) * (CAST(bn AS DOUBLE) - 1.0)),
             0.0))"""

_OBS_AUC = """
      SELECT round(CAST(sum(CAST(np * (2 * cb + nt + 1) AS DECIMAL(38,0)))
                        - CAST(sum(np) AS DECIMAL(38,0)) * (sum(np) + 1)
                     AS DOUBLE)
                   / CAST(2 * sum(np) * (sum(nt) - sum(np)) AS DOUBLE), 9)
"""


@_q(
    "quality_delta_auc_paired",
    f"""
    WITH q AS ({ORACLES["text_quality_scores"]}),
    g AS ({ORACLES["text_gopher_flags"]}),
    p AS (
      SELECT CAST(q.doc_id AS VARCHAR) AS id, q.quality_score AS sa,
             q.stopword_ratio AS sb,
             CASE WHEN g.gopher_keep THEN 1 ELSE 0 END AS y
      FROM q JOIN g USING (doc_id)
      WHERE q.quality_score IS NOT NULL AND q.stopword_ratio IS NOT NULL
    ),
    rep AS (
      SELECT id, sa, sb, y, r
      FROM p CROSS JOIN (SELECT unnest(range(1, {_BOOT_B + 1})) AS r)
    ),
    wt AS (
      SELECT r, sa, sb, y, CASE {_BOOT_CASE} ELSE 6 END AS w
      FROM (
        SELECT r, sa, sb, y,
               ('0x' || substr(md5(id || chr(31) || r::VARCHAR), 1, 14))
                 ::BIGINT AS h
        FROM rep
      )
    ),
    stacked AS (
      SELECT r, 0 AS k, sa AS s, y, w FROM wt
      UNION ALL
      SELECT r, 1 AS k, sb AS s, y, w FROM wt
    ),
    counts AS (
      SELECT r, k, s, sum(w * y) AS np, sum(w) AS nt
      FROM stacked GROUP BY 1, 2, 3 HAVING sum(w) > 0
    ),
    cum AS (
      SELECT r, k, np, nt,
             sum(nt) OVER (PARTITION BY r, k ORDER BY s
                           ROWS UNBOUNDED PRECEDING) - nt AS cb
      FROM counts
    ),
    per AS (
      SELECT r,
             sum(CASE WHEN k = 0 THEN np END) AS pos,
             sum(CASE WHEN k = 0 THEN nt END) AS tot,
             sum(CASE WHEN k = 0
                      THEN CAST(np * (2 * cb + nt + 1) AS DECIMAL(38,0))
                 END) AS s2a,
             sum(CASE WHEN k = 1
                      THEN CAST(np * (2 * cb + nt + 1) AS DECIMAL(38,0))
                 END) AS s2b
      FROM cum GROUP BY 1
    ),
    deltas AS (
      SELECT (CAST(CASE WHEN pos = 0 OR tot - pos = 0 THEN NULL
                        ELSE CAST(s2a - CAST(pos AS DECIMAL(38,0)) * (pos + 1)
                               AS DOUBLE)
                             / CAST(2 * pos * (tot - pos) AS DOUBLE) END
                AS DECIMAL(28,12))
            - CAST(CASE WHEN pos = 0 OR tot - pos = 0 THEN NULL
                        ELSE CAST(s2b - CAST(pos AS DECIMAL(38,0)) * (pos + 1)
                               AS DOUBLE)
                             / CAST(2 * pos * (tot - pos) AS DOUBLE) END
                AS DECIMAL(28,12))) AS d
      FROM per
    ),
    boot AS (
      SELECT count(*) AS bn, sum(d) AS sd,
             sum(CAST(CAST(d AS DOUBLE) * CAST(d AS DOUBLE)
                   AS DECIMAL(38,12))) AS sdd
      FROM deltas WHERE d IS NOT NULL
    ),
    oca AS (SELECT sa AS s, sum(y) AS np, count(*) AS nt FROM p GROUP BY 1),
    ora AS (
      SELECT np, nt,
             sum(nt) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) - nt AS cb
      FROM oca
    ),
    oaa AS ({_OBS_AUC} AS auc_a FROM ora),
    ocb AS (SELECT sb AS s, sum(y) AS np, count(*) AS nt FROM p GROUP BY 1),
    orb AS (
      SELECT np, nt,
             sum(nt) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) - nt AS cb
      FROM ocb
    ),
    oab AS ({_OBS_AUC} AS auc_b FROM orb)
    SELECT auc_a, auc_b, round(auc_a - auc_b, 9) AS d_auc,
           round({_DELTA_AUC_SE}, 9) AS se_boot,
           round(round(auc_a - auc_b, 9) - {Z95!r} * {_DELTA_AUC_SE}, 9)
             AS ci_lo,
           round(round(auc_a - auc_b, 9) + {Z95!r} * {_DELTA_AUC_SE}, 9)
             AS ci_hi,
           abs(round(auc_a - auc_b, 9)) > {Z95!r} * {_DELTA_AUC_SE}
             AS significant
    FROM oaa CROSS JOIN oab CROSS JOIN boot
    """,
)
def quality_delta_auc_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAIRED bootstrap on the AUC difference of two quality scorers
    graded on the same documents (operators.evaluation.
    delta_auc_paired_bootstrap, B=40): the composite quality score
    (champion) vs the bare stopword ratio (challenger), each against the
    Gopher-rule pseudo-label.  One Poisson weight per (doc, replicate)
    applied to BOTH scores makes the replicate noise cancel inside each
    Δ — the decisive test two separate CIs can't give, because the
    scorers share the documents and their resampling noise is
    correlated.  Single corpus scan: the row fans onto a 2-ary scorer
    axis before the (replicate, scorer, score) count groupBy."""
    from ..operators.evaluation import delta_auc_paired_bootstrap

    pairs = _quality_label_pairs2(spark, sf_dir)
    return delta_auc_paired_bootstrap(
        pairs,
        "quality_score",
        "stopword_ratio",
        "gopher_keep",
        "doc_id",
        b=_BOOT_B,
    )


def _quality_label_pairs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, quality_score, stopword_ratio, gopher_keep): BOTH quality
    scorers paired with the Gopher pseudo-label — the paired-comparison
    input (champion composite score vs challenger stopword ratio)."""
    from ..operators.textstats import gopher_quality_flags, quality_score

    docs = _t(spark, sf_dir, "documents")
    scored = quality_score(docs.select("doc_id", "text")).select(
        "doc_id", "quality_score", "stopword_ratio"
    )
    flags = gopher_quality_flags(docs).select("doc_id", "gopher_keep")
    return scored.join(flags, "doc_id").localCheckpoint()


@_q(
    "quality_mean_ci_by_source",
    f"""
    WITH q AS ({ORACLES["text_quality_scores"]}),
    base AS (
      SELECT CAST(q.doc_id AS VARCHAR) AS id, d.source AS g,
             q.quality_score AS v
      FROM q JOIN documents d ON q.doc_id = d.doc_id
      WHERE q.quality_score IS NOT NULL AND d.source IS NOT NULL
    ),
    rep AS (
      SELECT id, g, v, r
      FROM base CROSS JOIN (SELECT unnest(range(1, {_BOOT_B + 1})) AS r)
    ),
    wt AS (
      SELECT g, r, v, CASE {_BOOT_CASE} ELSE 6 END AS w
      FROM (
        SELECT g, r, v,
               ('0x' || substr(md5(id || chr(31) || r::VARCHAR), 1, 14))
                 ::BIGINT AS h
        FROM rep
      )
    ),
    m AS (
      SELECT g, CAST(
               CASE WHEN sum(w) = 0 THEN NULL
                    ELSE CAST(sum(CAST(v * w AS DECIMAL(28,12))) AS DOUBLE)
                         / CAST(sum(w) AS DOUBLE) END
               AS DECIMAL(28,12)) AS m
      FROM wt GROUP BY g, r
    ),
    boot AS (
      SELECT g, count(*) AS bn, sum(m) AS sm,
             sum(CAST(CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
                   AS DECIMAL(38,12))) AS smm
      FROM m WHERE m IS NOT NULL GROUP BY g
    ),
    obs AS (
      SELECT g, count(*) AS n,
             round(CAST(sum(CAST(v AS DECIMAL(28,12))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE), 9) AS mean
      FROM base GROUP BY g
    )
    SELECT obs.g AS source, CAST(n AS BIGINT) AS n, mean,
           round(sqrt(greatest(
             (CAST(bn AS DOUBLE) * CAST(smm AS DOUBLE)
              - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
             / (CAST(bn AS DOUBLE) * (CAST(bn AS DOUBLE) - 1.0)),
             0.0)), 9) AS se_boot,
           round(mean - {Z95!r} * sqrt(greatest(
             (CAST(bn AS DOUBLE) * CAST(smm AS DOUBLE)
              - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
             / (CAST(bn AS DOUBLE) * (CAST(bn AS DOUBLE) - 1.0)),
             0.0)), 9) AS ci_lo,
           round(mean + {Z95!r} * sqrt(greatest(
             (CAST(bn AS DOUBLE) * CAST(smm AS DOUBLE)
              - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
             / (CAST(bn AS DOUBLE) * (CAST(bn AS DOUBLE) - 1.0)),
             0.0)), 9) AS ci_hi
    FROM obs JOIN boot ON obs.g = boot.g
    """,
)
def quality_mean_ci_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source bootstrap CI on the mean quality score
    (operators.evaluation.bootstrap_mean_ci with group_cols=[source],
    B=40) — the stratified error bar a corpus dashboard shows beside the
    per-source means: "is wiki's 0.51 really above web's 0.44, or are
    the strata too thin to say?"  Replicate membership stays the same
    row-local md5 Poisson draw per (doc, replicate) whatever the group,
    so the plan is the global bootstrap with the source key prepended to
    every groupBy; the boot side is |sources|·B rows, broadcast into the
    final join."""
    from ..operators.evaluation import bootstrap_mean_ci
    from ..operators.textstats import quality_score

    docs = _t(spark, sf_dir, "documents")
    scored = quality_score(docs.select("doc_id", "source", "text")).select(
        "doc_id", "source", "quality_score"
    )
    return bootstrap_mean_ci(
        scored, "quality_score", "doc_id", b=_BOOT_B,
        group_cols=["source"],
    )


def _manifest_oracle() -> str:
    """The corpus-build manifest's DuckDB twin: every stage re-derived in
    SQL — corpus_select's quality/lang/exact-dedup CTE, the MinHash-LSH +
    recursive-CC keep-best restricted to the selected docs, the n-gram
    decontamination gate, and the mixture/pack/shard bookkeeping."""
    mh = _DUCK_MINHASH.replace(
        "FROM documents)", "FROM documents JOIN sel USING (doc_id))"
    )
    return f"""
    WITH RECURSIVE sel AS ({ORACLES["corpus_select"]}),
    {mh},
    bands AS (
      SELECT doc_id, j // 4 AS band,
             string_agg(minhash::VARCHAR, '-' ORDER BY j) AS band_key
      FROM sig GROUP BY doc_id, j // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    shin AS (SELECT doc_id, {_DUCK_SHINGLES} AS s FROM docs),
    ver AS (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(sa.s, sb.s))::DOUBLE /
               (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))
               AS jaccard
      FROM cand c
      JOIN shin sa ON sa.doc_id = c.doc_a
      JOIN shin sb ON sb.doc_id = c.doc_b
    ),
    pairs AS (SELECT doc_a, doc_b FROM ver WHERE jaccard >= 0.8),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
    ),
    comp AS (SELECT id, min(r) AS component_id FROM reach GROUP BY id),
    labeled AS (
      SELECT d.doc_id, d.n_chars,
             coalesce(c.component_id, d.doc_id) AS cluster_id
      FROM documents d JOIN sel USING (doc_id)
      LEFT JOIN comp c ON c.id = d.doc_id
    ),
    keptq AS (
      SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (
          PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rn
        FROM labeled
      ) WHERE rn = 1
    ),
    tgrams AS (
      SELECT doc_id, unnest(s) AS g FROM shin JOIN keptq USING (doc_id)
    ),
    evg AS (
      SELECT DISTINCT g FROM (
        SELECT unnest({_DUCK_SHINGLES}) AS g FROM (
          SELECT {_DUCK_WORDS} AS words FROM documents WHERE doc_id % 97 = 0
        )
      )
    ),
    shared AS (
      SELECT t.doc_id, count(*) AS ns
      FROM tgrams t JOIN evg USING (g) GROUP BY 1
    ),
    cleanq AS (
      SELECT k.doc_id FROM keptq k LEFT JOIN shared s USING (doc_id)
      WHERE coalesce(s.ns, 0) < 5
    ),
    clean AS (
      SELECT c.doc_id, d.lang, d.source, sel.n_tokens
      FROM cleanq c JOIN documents d USING (doc_id) JOIN sel USING (doc_id)
    ),
    mix AS (SELECT source, count(*) AS n FROM clean GROUP BY source),
    mixw AS (
      SELECT source, n,
             round((1.0 / count(*) OVER ())
                   / (n::DOUBLE / sum(n) OVER ()), 9) AS weight
      FROM mix
    ),
    pk AS (
      SELECT lang, doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS before
      FROM clean
    ),
    pks AS (
      SELECT count(DISTINCT (lang, before // 512))::BIGINT AS n_rows,
             sum(n_tokens)::BIGINT AS total_tokens
      FROM pk
    ),
    shq AS (
      SELECT ('0x' || substr(md5('shard' || chr(31)
                                 || CAST(doc_id AS VARCHAR)),
                             1, 14))::BIGINT % 8 AS shard,
             n_tokens
      FROM clean
    ),
    shs AS (
      SELECT shard, count(*)::BIGINT AS n_rows,
             sum(n_tokens)::BIGINT AS total_tokens
      FROM shq GROUP BY shard
    )
    SELECT '1_selected' AS stage, NULL::VARCHAR AS part,
           count(*)::BIGINT AS n_rows, sum(n_tokens)::BIGINT AS total_tokens,
           NULL::DOUBLE AS weight
    FROM sel
    UNION ALL
    SELECT '2_neardup_kept', NULL, count(*)::BIGINT,
           sum(sel.n_tokens)::BIGINT, NULL
    FROM keptq JOIN sel USING (doc_id)
    UNION ALL
    SELECT '3_decontaminated', NULL, count(*)::BIGINT,
           sum(n_tokens)::BIGINT, NULL
    FROM clean
    UNION ALL
    SELECT '4_mixture', source, n::BIGINT, NULL::BIGINT, weight FROM mixw
    UNION ALL
    SELECT '5_packed', NULL, n_rows, total_tokens, NULL FROM pks
    UNION ALL
    SELECT '6_shard', shard::VARCHAR, n_rows, total_tokens, NULL FROM shs
    """


@_q("corpus_build_manifest", _manifest_oracle())
def corpus_build_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-build manifest: the deterministic curation chain
    a pretraining run actually ships — corpus_select (quality + lang-ID +
    exact dedup) → MinHash-LSH near-dup keep-best → n-gram
    decontamination → mixture weights → sequence packing → deterministic
    shards — composed from the shelf stages into ONE query emitting the
    audit artifact: per-stage row/token counts plus the per-shard
    manifest.  Every stage is individually oracle-green; this composition
    is the interface-drift canary between them.

    Scan budget: TWO full corpus scans (the select pass, and the text
    join-back for the near-dup/decontamination stages) plus the filtered
    eval-split read — each intermediate doc set localCheckpoints (the r7
    pattern), so the six stage aggregates reuse materialized narrow
    projections instead of re-running the text-heavy upstream.

    Output: ``(stage string, part string, n_rows bigint, total_tokens
    bigint, weight double)`` — part = source for mixture rows, shard id
    for shard rows, NULL for whole-corpus stages."""
    from ..operators.curation import (
        contamination_check,
        mixture_weights,
        pack_sequences,
        shard_corpus,
    )
    from ..operators.dedup import (
        connected_components,
        jaccard_verify_pairs,
        keep_best_per_cluster,
        minhash_lsh_pairs,
    )
    from .corpus import select_training_corpus

    docs = _t(spark, sf_dir, "documents")
    sel = (
        select_training_corpus(docs, lang="en", min_quality=0.5)
        .select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"))
        .localCheckpoint()
    )
    sel_docs = docs.join(sel.select("doc_id"), "doc_id").localCheckpoint()

    cand = minhash_lsh_pairs(sel_docs)
    verified = jaccard_verify_pairs(sel_docs, cand, threshold=0.8)
    clusters = connected_components(verified).withColumnRenamed(
        "id", "doc_id"
    )
    kept_ids = (
        keep_best_per_cluster(sel_docs, clusters, score_col="n_chars")
        .filter("kept")
        .select("doc_id")
        .localCheckpoint()
    )
    kept_docs = sel_docs.join(kept_ids, "doc_id")

    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    clean_ids = (
        contamination_check(kept_docs, eval_docs, threshold=5)
        .filter(~F.col("contaminated"))
        .select("doc_id")
    )
    clean = (
        kept_docs.select("doc_id", "lang", "source")
        .join(clean_ids, "doc_id")
        .join(sel, "doc_id")
        .localCheckpoint()
    )

    def _stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_tokens").alias("total_tokens"),
        ).select(
            F.lit(name).alias("stage"),
            F.lit(None).cast("string").alias("part"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            F.lit(None).cast("double").alias("weight"),
        )

    s1 = _stage("1_selected", sel)
    s2 = _stage("2_neardup_kept", kept_ids.join(sel, "doc_id"))
    s3 = _stage("3_decontaminated", clean)
    s4 = mixture_weights(clean, strata_col="source").select(
        F.lit("4_mixture").alias("stage"),
        F.col("source").alias("part"),
        F.col("n").cast("long").alias("n_rows"),
        F.lit(None).cast("long").alias("total_tokens"),
        F.round("weight", 9).alias("weight"),
    )
    packed = pack_sequences(
        clean.select("lang", "doc_id", "n_tokens"), budget=512,
        token_col="n_tokens",
    )
    s5 = packed.agg(
        F.count_distinct(F.col("lang"), F.col("pack_id")).alias("n_rows"),
        F.sum("n_tokens").alias("total_tokens"),
    ).select(
        F.lit("5_packed").alias("stage"),
        F.lit(None).cast("string").alias("part"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.lit(None).cast("double").alias("weight"),
    )
    s6 = (
        shard_corpus(clean.select("doc_id", "n_tokens"), n_shards=8)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .select(
            F.lit("6_shard").alias("stage"),
            F.col("shard").cast("string").alias("part"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            F.lit(None).cast("double").alias("weight"),
        )
    )
    return s1.unionByName(s2).unionByName(s3).unionByName(s4).unionByName(
        s5
    ).unionByName(s6)


@_q(
    "mcnemar_langid_vs_majority",
    f"""
    WITH pl AS ({ORACLES["text_lang_id"]}),
    fl AS (
      SELECT (predicted_lang = lang) AS ca, (lang = 'en') AS cb FROM pl
    ),
    agg AS (
      SELECT count(*)::BIGINT AS n,
             sum((ca AND cb)::BIGINT)::BIGINT AS n_both_right,
             sum((NOT ca AND NOT cb)::BIGINT)::BIGINT AS n_both_wrong,
             sum((NOT ca AND cb)::BIGINT)::BIGINT AS n01,
             sum((ca AND NOT cb)::BIGINT)::BIGINT AS n10,
             sum(ca::BIGINT)::BIGINT AS sca,
             sum(cb::BIGINT)::BIGINT AS scb
      FROM fl
    ),
    st AS (
      SELECT *,
             CASE WHEN n01 + n10 = 0 THEN NULL
                  ELSE greatest(abs(n01 - n10) - 1, 0)::DOUBLE
                       * greatest(abs(n01 - n10) - 1, 0)::DOUBLE
                       / (n01 + n10)::DOUBLE END AS chi2_raw
      FROM agg
    )
    SELECT n, n_both_right, n_both_wrong, n01, n10,
           round(sca::DOUBLE / n::DOUBLE, 9) AS acc_a,
           round(scb::DOUBLE / n::DOUBLE, 9) AS acc_b,
           round(chi2_raw, 9) AS chi2,
           coalesce(chi2_raw > 3.841458820694124, FALSE) AS significant
    FROM st
    """,
)
def mcnemar_langid_vs_majority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test (operators.evaluation.mcnemar_test): did the
    stopword-profile lang-ID beat the majority-class baseline (predict
    'en' always) on per-doc correctness against the stored lang?  Both
    classifiers are graded on the SAME documents, so their accuracies
    are correlated and separate error bars overstate uncertainty;
    McNemar reads only the discordant cells — the categorical sibling of
    quality_delta_auc_paired.  Four conditional integer counts in one
    partial-aggregable scan."""
    from ..operators.evaluation import mcnemar_test
    from ..operators.textstats import predict_lang

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    flags = predict_lang(docs).select(
        (F.col("predicted_lang") == F.col("lang")).alias("ca"),
        (F.col("lang") == F.lit("en")).alias("cb"),
    )
    return mcnemar_test(flags, "ca", "cb")


@_q(
    "js_source_lang_divergence",
    """
    WITH j AS (
      SELECT source AS g, lang AS k, count(*) AS o
      FROM documents
      WHERE source IS NOT NULL AND lang IS NOT NULL
      GROUP BY 1, 2
    ),
    gs AS (SELECT g, sum(o)::BIGINT AS ng FROM j GROUP BY 1),
    ks AS (SELECT k, sum(o)::BIGINT AS nk FROM j GROUP BY 1),
    tt AS (SELECT sum(o)::BIGINT AS n FROM j),
    cells AS (
      SELECT gs.g, ks.k, gs.ng, ks.nk, tt.n, coalesce(j.o, 0)::BIGINT AS o
      FROM gs CROSS JOIN ks
      LEFT JOIN j ON j.g = gs.g AND j.k = ks.k
      CROSS JOIN tt
    ),
    terms AS (
      SELECT g, ng,
             CASE WHEN o > 0 THEN CAST(
               (o::DOUBLE / ng::DOUBLE)
               * ln((o::DOUBLE / ng::DOUBLE)
                    / (((o::DOUBLE / ng::DOUBLE)
                        + (nk::DOUBLE / n::DOUBLE)) / 2.0))
               AS DECIMAL(28,12)) ELSE CAST(0 AS DECIMAL(28,12)) END AS pt,
             CAST((nk::DOUBLE / n::DOUBLE)
                  * ln((nk::DOUBLE / n::DOUBLE)
                       / (((o::DOUBLE / ng::DOUBLE)
                           + (nk::DOUBLE / n::DOUBLE)) / 2.0))
               AS DECIMAL(28,12)) AS qt
      FROM cells
    ),
    agg AS (
      SELECT g, max(ng) AS nrows, sum(pt) AS sp, sum(qt) AS sq
      FROM terms GROUP BY 1
    )
    SELECT g AS source, nrows::BIGINT AS n,
           round((sp::DOUBLE + sq::DOUBLE) / 2.0 / 0.6931471805599453, 9)
             AS jsd_bits
    FROM agg
    """,
)
def js_source_lang_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Jensen–Shannon divergence (bits) between the source's
    language distribution and the corpus-wide one
    (operators.profile.js_divergence_by_group) — the "which crawl skews
    the mixture" report beside mixture_weights: symmetric, finite by
    construction, bounded [0,1], so sources and releases compare on one
    axis.  One (source, lang) count groupBy; the cell grid crosses two
    broadcast marginal tables, never fact-sized."""
    from ..operators.profile import js_divergence_by_group

    docs = _t(spark, sf_dir, "documents")
    return js_divergence_by_group(docs, key_col="lang", group_col="source")


_BOOT_SE = """sqrt(greatest(
             (CAST(bn AS DOUBLE) * CAST(smm AS DOUBLE)
              - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
             / (CAST(bn AS DOUBLE) * (CAST(bn AS DOUBLE) - 1.0)),
             0.0))"""


@_q(
    "doclen_median_bootstrap_ci",
    f"""
    WITH base AS (
      SELECT CAST(doc_id AS VARCHAR) AS id, n_chars::DOUBLE AS v
      FROM documents WHERE n_chars IS NOT NULL
    ),
    rep AS (
      SELECT id, v, r
      FROM base CROSS JOIN (SELECT unnest(range(1, {_BOOT_B + 1})) AS r)
    ),
    wt AS (
      SELECT r, v, CASE {_BOOT_CASE} ELSE 6 END AS w
      FROM (
        SELECT r, v,
               ('0x' || substr(md5(id || chr(31) || r::VARCHAR), 1, 14))
                 ::BIGINT AS h
        FROM rep
      )
    ),
    counts AS (
      SELECT r, v, sum(w) AS nw FROM wt GROUP BY 1, 2 HAVING sum(w) > 0
    ),
    cum AS (
      SELECT r, v,
             sum(nw) OVER (PARTITION BY r ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cum,
             sum(nw) OVER (PARTITION BY r) AS tot
      FROM counts
    ),
    medr AS (
      SELECT CAST(min(v) AS DECIMAL(28,12)) AS m
      FROM cum WHERE 2 * cum >= tot GROUP BY r
    ),
    boot AS (
      SELECT count(*) AS bn, sum(m) AS sm,
             sum(CAST(CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
                   AS DECIMAL(38,12))) AS smm
      FROM medr
    ),
    oc AS (SELECT v, count(*) AS nw FROM base GROUP BY 1),
    ocum AS (
      SELECT v,
             sum(nw) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
             sum(nw) OVER () AS tot
      FROM oc
    ),
    obs AS (
      SELECT max(tot)::BIGINT AS n, round(CAST(min(v) AS DOUBLE), 9)
               AS median
      FROM ocum WHERE 2 * cum >= tot
    )
    SELECT n, median,
           round({_BOOT_SE}, 9) AS se_boot,
           round(median - {Z95!r} * {_BOOT_SE}, 9) AS ci_lo,
           round(median + {Z95!r} * {_BOOT_SE}, 9) AS ci_hi
    FROM obs CROSS JOIN boot
    """,
)
def doclen_median_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap CI on the MEDIAN document length
    (operators.evaluation.bootstrap_median_ci, B=40) — the robust-
    location error bar: doc length is heavy-tailed, so the mean CI is
    tail-driven while the median tracks the bulk.  Replicate weights are
    the same deterministic md5-Poisson multiplicities as the mean/AUC
    bootstraps; each replicate's median is a pure-integer weighted lower
    median over the distinct-length axis partitioned by replicate."""
    from ..operators.evaluation import bootstrap_median_ci

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("double").alias("len_chars")
    )
    return bootstrap_median_ci(docs, "len_chars", "doc_id", b=_BOOT_B)


@_q(
    "vocab_coverage_curve",
    f"""
    WITH t AS (
      SELECT unnest({_DUCK_WORDS}) AS tok FROM documents
    ),
    c AS (SELECT tok, count(*) AS n FROM t GROUP BY 1),
    r AS (
      SELECT n,
             row_number() OVER (ORDER BY n DESC, tok ASC) AS k,
             sum(n) OVER (ORDER BY n DESC, tok ASC
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(n) OVER () AS tot,
             count(*) OVER () AS vocab
      FROM c
    ),
    agg AS (
      SELECT max(vocab)::BIGINT AS vocab_size,
             max(tot)::BIGINT AS total_tokens,
             min(CASE WHEN 100 * cum >= 50 * tot THEN k END)::BIGINT AS k50,
             min(CASE WHEN 100 * cum >= 75 * tot THEN k END)::BIGINT AS k75,
             min(CASE WHEN 100 * cum >= 90 * tot THEN k END)::BIGINT AS k90,
             min(CASE WHEN 100 * cum >= 99 * tot THEN k END)::BIGINT AS k99
      FROM r
    )
    SELECT 50 AS coverage_pct, k50 AS k_types, vocab_size, total_tokens
    FROM agg
    UNION ALL
    SELECT 75, k75, vocab_size, total_tokens FROM agg
    UNION ALL
    SELECT 90, k90, vocab_size, total_tokens FROM agg
    UNION ALL
    SELECT 99, k99, vocab_size, total_tokens FROM agg
    """,
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve (operators.textstats.vocabulary_coverage):
    distinct token types, most-frequent-first, needed to cover 50/75/90/
    99% of the corpus's token mass — the tokenizer-vocab-size / stopword
    budget table.  Exact rational threshold tests (100·cum ≥ p·total),
    frequency ties broken by token text; windows run over the VOCAB
    axis, never the corpus."""
    from ..operators.textstats import vocabulary_coverage

    docs = _t(spark, sf_dir, "documents")
    return vocabulary_coverage(docs, percents=(50, 75, 90, 99))


@_q(
    "mixture_ess_uniform",
    """
    WITH c AS (
      SELECT lang, count(*) AS ns FROM documents
      WHERE lang IS NOT NULL GROUP BY 1
    ),
    w AS (
      SELECT ns, sum(ns) OVER () AS n,
             (1.0 / count(*) OVER ())
             / (ns::DOUBLE / (sum(ns) OVER ())::DOUBLE) AS ws
      FROM c
    ),
    q AS (
      SELECT max(n)::BIGINT AS n, count(*)::BIGINT AS n_strata,
             sum(CAST(ns::DOUBLE * ws AS DECIMAL(28,12))) AS tw,
             sum(CAST(ns::DOUBLE * ws * ws AS DECIMAL(28,12))) AS tww
      FROM w
    )
    SELECT n, n_strata,
           round(tw::DOUBLE * tw::DOUBLE / tww::DOUBLE, 9) AS ess,
           round(tw::DOUBLE * tw::DOUBLE / tww::DOUBLE / n::DOUBLE, 9)
             AS ess_ratio
    FROM q
    """,
)
def mixture_ess_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective sample size of the uniform-target lang remix
    (operators.curation.mixture_effective_sample_size) — the cost
    readout beside mixture_weights: ess_ratio is the fraction of the
    corpus's statistical power the reweighting keeps; a low ratio says
    upsample (or temper) instead of hard-reweighting.  One count
    groupBy; everything else runs on the |strata|-row table."""
    from ..operators.curation import mixture_effective_sample_size

    docs = _t(spark, sf_dir, "documents")
    return mixture_effective_sample_size(docs, strata_col="lang")


_PERM_B = 200


@_q(
    "perm_test_user_value",
    f"""
    WITH u AS (
      SELECT CAST(user_id AS VARCHAR) AS id,
             CAST(user_id % 2 AS VARCHAR) AS g,
             CAST(sum(CAST(value AS DECIMAL(28,12))) AS DOUBLE) / count(*)
               AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
      GROUP BY user_id
    ),
    arms AS (
      SELECT g, count(*) AS n, sum(CAST(v AS DECIMAL(28,12))) AS s
      FROM u GROUP BY 1
    ),
    aa AS (SELECT n AS n_a, s AS sa FROM arms WHERE g = '0'),
    bb AS (SELECT n AS n_b, s AS sb FROM arms WHERE g = '1'),
    obs AS (
      SELECT n_a, n_b,
             round(CAST(sa AS DOUBLE) / n_a, 9) AS mean_a,
             round(CAST(sb AS DOUBLE) / n_b, 9) AS mean_b,
             CAST(CAST(sa AS DOUBLE) / n_a - CAST(sb AS DOUBLE) / n_b
               AS DECIMAL(28,12)) AS dobs
      FROM aa CROSS JOIN bb
    ),
    rep AS (
      SELECT id, v, r
      FROM u CROSS JOIN (SELECT unnest(range(1, {_PERM_B + 1})) AS r)
    ),
    relab AS (
      SELECT r, v,
             ('0x' || substr(md5(id || chr(31) || r::VARCHAR), 1, 14))
               ::BIGINT % 2 AS arm
      FROM rep
    ),
    per AS (
      SELECT r,
             sum(CASE WHEN arm = 0 THEN CAST(v AS DECIMAL(28,12)) END)
               AS s0,
             sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
             sum(CASE WHEN arm = 1 THEN CAST(v AS DECIMAL(28,12)) END)
               AS s1,
             sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1
      FROM relab GROUP BY 1
    ),
    deltas AS (
      SELECT CASE WHEN n0 = 0 OR n1 = 0 THEN NULL
                  ELSE CAST(CAST(s0 AS DOUBLE) / n0
                            - CAST(s1 AS DOUBLE) / n1
                         AS DECIMAL(28,12)) END AS d
      FROM per
    ),
    tail AS (
      SELECT sum(CASE WHEN abs(d) >= abs(obs.dobs) THEN 1 ELSE 0 END)
               ::BIGINT AS n_ge
      FROM deltas CROSS JOIN obs WHERE d IS NOT NULL
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           mean_a, mean_b,
           round(CAST(dobs AS DOUBLE), 9) AS d_obs,
           {_PERM_B} AS b, n_ge,
           round((1 + n_ge)::DOUBLE / {_PERM_B + 1}.0, 9) AS p_value
    FROM obs CROSS JOIN tail
    """,
)
def perm_test_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic randomization test on the per-user mean event value
    between the parity arms (operators.evaluation.randomization_mean_test,
    B=200) — the continuous-metric companion to ab_purchase_rate_test:
    no pooled-variance formula, just re-drawn md5 label assignments and
    the rank of the observed difference among them.  Unit of analysis is
    the USER (pre-aggregated mean per user); replicate deltas and the
    observed delta compare as exact decimals so the tail count is
    hash-stable."""
    from ..operators.evaluation import randomization_mean_test

    ev = _t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    users = ev.groupBy("user_id").agg(
        (
            F.sum(F.col("value").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("v")
    ).select(
        "user_id",
        (F.col("user_id") % 2).cast("string").alias("arm"),
        "v",
    )
    return randomization_mean_test(
        users, "v", "arm", "user_id", b=_PERM_B
    )


@_q(
    "text_readability",
    f"""
    WITH t AS (
      SELECT doc_id, text, {_DUCK_WORDS} AS toks FROM documents
    ), s AS (
      SELECT doc_id,
             len(toks)::BIGINT AS n_words,
             greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
               AS n_sentences,
             CASE WHEN len(toks) > 0
                  THEN list_sum(list_transform(toks,
                       w -> greatest(1,
                            len(regexp_extract_all(w, '[aeiouy]+')))))
                  ELSE 0 END::BIGINT AS n_syllables
      FROM t
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CASE WHEN n_words > 0 THEN
             round(206.835
                   - 1.015 * (n_words::DOUBLE / n_sentences::DOUBLE)
                   - 84.6 * (n_syllables::DOUBLE / n_words::DOUBLE), 6)
           END AS flesch
    FROM s
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document
    (operators.textstats.readability_scores) — the sentence-complexity
    quality axis the length/stopword composite doesn't see; regex
    structure counts (sentence runs, vowel-group syllables), row-local
    and shuffle-free."""
    from ..operators.textstats import readability_scores

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return readability_scores(docs)


@_q(
    "contamination_rate_by_source",
    f"""
    WITH docs AS (SELECT doc_id, {_DUCK_WORDS} AS words FROM documents),
    grams AS (SELECT doc_id, unnest({_DUCK_SHINGLES}) AS g FROM docs),
    ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
    tr AS (SELECT doc_id, g FROM grams WHERE doc_id % 97 != 0),
    shared AS (
      SELECT tr.doc_id, count(*) AS ns
      FROM tr JOIN ev USING (g) GROUP BY 1
    )
    SELECT d.source, count(*)::BIGINT AS n_train,
           sum(CASE WHEN coalesce(s.ns, 0) >= 5 THEN 1 ELSE 0 END)::BIGINT
             AS n_contaminated,
           round(sum(CASE WHEN coalesce(s.ns, 0) >= 5 THEN 1 ELSE 0 END)
                   ::DOUBLE / count(*)::DOUBLE, 9) AS rate
    FROM documents d LEFT JOIN shared s USING (doc_id)
    WHERE d.doc_id % 97 != 0
    GROUP BY d.source
    """,
)
def contamination_rate_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source benchmark-contamination audit — which crawl leaks the
    eval split (operators.curation.contamination_check aggregated per
    source): the provenance question the boolean removal step
    (decontaminated_corpus) answers doc-by-doc, reported at the level a
    source-inclusion decision is made.  Broadcast eval n-grams, one
    train-side scan, one count groupBy per source."""
    from ..operators.curation import contamination_check

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    flags = contamination_check(
        train, docs.filter(F.col("doc_id") % 97 == 0), threshold=5
    ).select("doc_id", "contaminated")
    return (
        train.select("doc_id", "source")
        .join(flags, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum(
                F.when(F.col("contaminated"), 1).otherwise(0)
            ).cast("long").alias("n_contaminated"),
            F.round(
                F.sum(F.when(F.col("contaminated"), 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("rate"),
        )
    )


def _lang_mix_oracle() -> str:
    from ..operators.textstats import LANG_PROFILES

    langs = sorted(LANG_PROFILES)
    score_cols, best_lang = _langid_fold()
    tot = " + ".join(f"score_{lang}" for lang in langs)
    top = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    ent = " + ".join(
        f"(CASE WHEN score_{lang} > 0 THEN -((score_{lang}::DOUBLE / tot)"
        f" * ln(score_{lang}::DOUBLE / tot)) ELSE 0.0 END)"
        for lang in langs
    )
    return f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_WORDS} AS toks FROM documents
    ), scored AS (
      SELECT doc_id,
           {score_cols}
      FROM t
    ), s2 AS (
      SELECT doc_id, ({tot})::BIGINT AS tot, ({top})::BIGINT AS top,
             {best_lang} AS predicted_lang,
             score_de, score_en, score_es, score_fr, score_zh
      FROM scored
    )
    SELECT doc_id, tot AS n_profile_hits, predicted_lang,
           CASE WHEN tot > 0
                THEN round(top::DOUBLE / tot::DOUBLE, 9) END AS top_share,
           CASE WHEN tot > 0
                THEN round(({ent}) / 0.6931471805599453, 9) END
             AS mix_entropy_bits
    FROM s2
    """


@_q("lang_mix_entropy", _lang_mix_oracle())
def lang_mix_entropy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document language-mix entropy
    (operators.textstats.lang_mix_entropy) — the code-switching /
    template-noise detector: entropy of the normalized per-language
    stopword-profile hits (0 = confidently one language, log2|langs| =
    perfectly mixed; zero-hit docs NULL).  Row-local, zero shuffles."""
    from ..operators.textstats import lang_mix_entropy

    docs = _t(spark, sf_dir, "documents")
    return lang_mix_entropy(docs)


@_q(
    "vocab_entropy_by_source",
    f"""
    WITH c AS (
      SELECT source AS g, tok, count(*) AS n
      FROM (
        SELECT source, unnest({_DUCK_WORDS}) AS tok
        FROM documents WHERE source IS NOT NULL
      )
      GROUP BY 1, 2
    ),
    w AS (
      SELECT g, n, sum(n) OVER (PARTITION BY g) AS tot FROM c
    ),
    agg AS (
      SELECT g, max(tot)::BIGINT AS n_tokens, count(*)::BIGINT
               AS vocab_size,
             sum(CAST(-((n::DOUBLE / tot::DOUBLE)
                        * ln(n::DOUBLE / tot::DOUBLE))
                   AS DECIMAL(28,12))) AS h
      FROM w GROUP BY 1
    )
    SELECT g AS source, n_tokens, vocab_size,
           round(h::DOUBLE / 0.6931471805599453, 9) AS entropy_bits,
           round((h::DOUBLE / 0.6931471805599453)
                 / (ln(vocab_size::DOUBLE) / 0.6931471805599453), 9)
             AS norm_entropy
    FROM agg
    """,
)
def vocab_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram vocabulary entropy
    (operators.textstats.vocab_entropy_by_group) — corpus-level lexical
    diversity: a template-dominated crawl shows low entropy even when
    its individual docs pass per-doc diversity checks.  One explode→
    (source, token) count groupBy; per-source sums over the vocab
    axis."""
    from ..operators.textstats import vocab_entropy_by_group

    docs = _t(spark, sf_dir, "documents")
    return vocab_entropy_by_group(docs, group_col="source")


@_q(
    "split_dup_leakage",
    """
    WITH d AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 5 = 0
    ),
    fp AS (
      SELECT doc_id,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
               AS fingerprint,
             CASE WHEN ('0x' || substr(md5('split' || chr(31)
                          || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT
                       / 72057594037927936.0 < 0.8 THEN 'train'
                  WHEN ('0x' || substr(md5('split' || chr(31)
                          || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT
                       / 72057594037927936.0 < 0.9 THEN 'val'
                  ELSE 'test' END AS split
      FROM d
    ),
    per AS (
      SELECT fingerprint, split, count(*) AS ns
      FROM fp GROUP BY 1, 2
    ),
    grp AS (
      SELECT fingerprint, sum(ns) AS n, count(*) AS n_splits,
             sum(ns * (ns - 1) // 2) AS within_pairs
      FROM per GROUP BY 1 HAVING sum(ns) > 1
    )
    SELECT count(*)::BIGINT AS n_dup_groups,
           sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END)::BIGINT
             AS n_straddling_groups,
           round(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*)::DOUBLE, 9) AS group_straddle_rate,
           sum(n * (n - 1) // 2)::BIGINT AS n_dup_pairs,
           sum(n * (n - 1) // 2 - within_pairs)::BIGINT
             AS n_straddling_pairs,
           round(sum(n * (n - 1) // 2 - within_pairs)::DOUBLE
                 / sum(n * (n - 1) // 2)::DOUBLE, 9)
             AS pair_straddle_rate
    FROM grp
    """,
)
def split_dup_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-hygiene audit: do exact-duplicate clusters straddle the
    80/10/10 hash split?  A doc-keyed split puts near-identical docs in
    train AND test — memorization leaks the eval (the reason production
    splits key on CLUSTER, not doc).  Composes exact_dedup_groups with
    train_val_test_split and counts, per duplicate group, how many
    member pairs cross a split boundary (C(n,2) − Σ_s C(n_s,2) — exact
    integers on the groups axis).  One fingerprint groupBy; everything
    after runs on the (group, split) table.  The fixture corpus has no
    exact duplicates, so a deterministic copy of every 5th doc is
    injected under a shifted id in BOTH engines — the check audits real
    straddling clusters, not a vacuous empty set."""
    from ..operators.curation import train_val_test_split
    from ..operators.dedup import exact_dedup_groups

    base = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # the fixture has no exact duplicates — inject a deterministic copy
    # of every 5th doc under a shifted id (both engines identically) so
    # the audit is non-vacuous
    docs = base.unionByName(
        base.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 10000000).alias("doc_id"), "text"
        )
    )
    fp = exact_dedup_groups(docs).select("doc_id", "fingerprint")
    split = train_val_test_split(
        docs.select("doc_id"), key_cols=["doc_id"],
        val_frac=0.1, test_frac=0.1,
    )
    per = (
        fp.join(split, "doc_id")
        .groupBy("fingerprint", "split")
        .agg(F.count(F.lit(1)).alias("_ns"))
    )
    ns = F.col("_ns")
    grp = (
        per.groupBy("fingerprint")
        .agg(
            F.sum("_ns").alias("_n"),
            F.count(F.lit(1)).alias("_n_splits"),
            F.sum((ns * (ns - F.lit(1))) / F.lit(2)).cast("long").alias(
                "_within"
            ),
        )
        .filter(F.col("_n") > 1)
    )
    n = F.col("_n")
    pairs = ((n * (n - F.lit(1))) / F.lit(2)).cast("long")
    straddle = (F.col("_n_splits") > 1).cast("int")
    return grp.agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_groups"),
        F.sum(straddle).cast("long").alias("n_straddling_groups"),
        F.round(
            F.sum(straddle).cast("double") / F.count(F.lit(1)).cast("double"),
            9,
        ).alias("group_straddle_rate"),
        F.sum(pairs).cast("long").alias("n_dup_pairs"),
        (F.sum(pairs) - F.sum("_within")).cast("long").alias(
            "n_straddling_pairs"
        ),
        F.round(
            (F.sum(pairs) - F.sum("_within")).cast("double")
            / F.sum(pairs).cast("double"),
            9,
        ).alias("pair_straddle_rate"),
    )


@_q(
    "emb_similarity_hist",
    """
    WITH s AS (
      SELECT vec_id AS id, embedding AS v
      FROM embeddings
      WHERE ('0x' || substr(md5('simhist' || chr(31)
               || CAST(vec_id AS VARCHAR)), 1, 14))::BIGINT % 8 = 0
    ),
    pairs AS (
      SELECT round(list_dot_product(a.v::DOUBLE[], b.v::DOUBLE[]) /
                   (sqrt(list_dot_product(a.v::DOUBLE[], a.v::DOUBLE[])) *
                    sqrt(list_dot_product(b.v::DOUBLE[], b.v::DOUBLE[]))),
                   6) AS cos
      FROM s a JOIN s b ON a.id < b.id
    ),
    c AS (
      SELECT CAST(greatest(0, least(19, floor((cos + 1.0) / 0.1))) AS INT)
               AS bin,
             count(*) AS n
      FROM pairs GROUP BY 1
    )
    SELECT bin, round(-1.0 + bin * 0.1, 6) AS lo, n::BIGINT AS n,
           round(n::DOUBLE / (sum(n) OVER ())::DOUBLE, 9) AS share
    FROM c
    """,
)
def emb_similarity_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine histogram on a deterministic 1-in-8 md5 sample of
    the embeddings (operators.similarity.pairwise_similarity_hist) — the
    embedding-space health profile that settles dedup/ANN threshold
    choices: collapsed encoders pile mass near 1, healthy spaces keep a
    thin high-cosine tail.  Quadratic pair cost is bounded inside the
    query by the sample (the lsh_recall_vs_exact convention); the
    full-corpus path is the LSH/IVF operators."""
    from ..operators.similarity import pairwise_similarity_hist

    emb = _t(spark, sf_dir, "embeddings")
    return pairwise_similarity_hist(emb, keep_mod=8, nbins=20)


@_q(
    "quality_hist_calibration",
    f"""
    WITH {_pairs_cte()},
    binned AS (
      SELECT CAST(greatest(0, least(9, floor((s - 0.0) / 0.1))) AS INT)
               AS b,
             s, y::DOUBLE AS y
      FROM p
    ),
    rates AS (
      SELECT b, sum(y)::DOUBLE / count(*)::DOUBLE AS rate
      FROM binned GROUP BY 1
    ),
    j AS (SELECT s, y, rate FROM binned JOIN rates USING (b)),
    agg AS (
      SELECT count(*) AS n,
             sum(CAST((s - y) * (s - y) AS DECIMAL(28,12))) AS sb0,
             sum(CAST((rate - y) * (rate - y) AS DECIMAL(28,12))) AS sb1
      FROM j
    )
    SELECT n::BIGINT AS n, 10 AS nbins,
           round(sb0::DOUBLE / n::DOUBLE, 9) AS brier_before,
           round(sb1::DOUBLE / n::DOUBLE, 9) AS brier_after,
           round(sb0::DOUBLE / n::DOUBLE - sb1::DOUBLE / n::DOUBLE, 9)
             AS reliability
    FROM agg
    """,
)
def quality_hist_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-binning calibration of the quality score against the
    Gopher pseudo-label (operators.evaluation.histogram_calibration_report)
    — the simplest trainable calibrator, reported as before/after Brier:
    the drop IS the reliability term of the Brier decomposition, i.e.
    how much of the score's error a monotone-ish remap recovers vs
    irreducible ranking error.  Fixed clamp bins, exact-integer bin
    rates, decimal-quantized squared errors, bin map broadcast back."""
    from ..operators.evaluation import histogram_calibration_report

    pairs = _quality_label_pairs(spark, sf_dir, checkpoint=True)
    return histogram_calibration_report(
        pairs, "quality_score", "gopher_keep", nbins=10
    )


@_q(
    "integrity_checksum_orders",
    """
    WITH canon AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             ('0x' || substr(md5(
               coalesce(o_orderkey::VARCHAR, chr(0) || 'null') || chr(31)
               || coalesce(o_custkey::VARCHAR, chr(0) || 'null') || chr(31)
               || coalesce(o_orderstatus, chr(0) || 'null') || chr(31)
               || coalesce((o_totalprice::DECIMAL(12,2))::VARCHAR,
                           chr(0) || 'null') || chr(31)
               || coalesce(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                           chr(0) || 'null')
             ), 1, 14))::BIGINT AS h
      FROM orders
    )
    SELECT month, count(*)::BIGINT AS n_rows,
           sum(CAST(h AS DECIMAL(38,0)))::VARCHAR AS checksum
    FROM canon GROUP BY month
    """,
)
def integrity_checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-month order-free content checksum of the orders table
    (operators.profile.table_checksum) — the integrity handshake for
    exports/replication/engine migrations: two systems agree on the
    table iff every month agrees on (n_rows, checksum), no sort, no row
    shipping.  Row canonicalization is explicit (fixed-scale decimal for
    the money column, explicit timestamp format) because default
    renderings differ between engines; the checksum is a commutative
    decimal(38,0) sum of 56-bit md5 row hashes."""
    from ..operators.profile import table_checksum

    o = _t(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_orderkey").cast("string").alias("k1"),
        F.col("o_custkey").cast("string").alias("k2"),
        F.col("o_orderstatus").alias("k3"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias(
            "k4"
        ),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("k5"),
    )
    out = table_checksum(
        o, cols=["k1", "k2", "k3", "k4", "k5"], partition_cols=["month"]
    )
    # the decimal(38,0) checksum exceeds double precision; DuckDB's
    # pandas bridge renders wide decimals as float64, so the PAIR
    # compares it as a string (exact in both engines)
    return out.select(
        "month", "n_rows", F.col("checksum").cast("string").alias("checksum")
    )


@_q(
    "cdc_chunk_dedup_report",
    f"""
    WITH d AS (
      SELECT doc_id, {_DUCK_WORDS} AS toks FROM documents
      WHERE len({_DUCK_WORDS}) > 0
    ),
    h AS (
      SELECT doc_id, toks,
             list_transform(toks,
               tk -> ('0x' || substr(md5(tk), 1, 8))::BIGINT) AS hs,
             len(toks) AS n
      FROM d
    ),
    c AS (
      SELECT doc_id, toks, n,
             [i for i in range(8, n + 1)
              if list_reduce(hs[i-7:i],
                   (a, x) -> (a * 31 + x) % 1000000007) % 16 = 0] AS cuts
      FROM h
    ),
    b AS (
      SELECT doc_id, toks,
             list_concat(list_concat([0], cuts), [n]) AS bounds
      FROM c
    ),
    ch AS (
      SELECT doc_id,
             md5(array_to_string(toks[ck.s:ck.s + ck.l - 1], ' '))
               AS chunk_hash,
             ck.l AS n_toks
      FROM (
        SELECT doc_id, toks,
               unnest([{{s: bounds[j] + 1, l: bounds[j+1] - bounds[j]}}
                       for j in range(1, len(bounds))]) AS ck
        FROM b
      ) WHERE ck.l > 0
    ),
    per AS (
      SELECT chunk_hash, count(*) AS n,
             count(DISTINCT doc_id) AS nd,
             sum(n_toks)::BIGINT AS tk
      FROM ch GROUP BY 1
    )
    SELECT (SELECT count(*) FROM d)::BIGINT AS n_docs,
           sum(n)::BIGINT AS n_chunks,
           count(*)::BIGINT AS n_distinct_chunks,
           sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::BIGINT
             AS n_multi_doc_chunks,
           (sum(n) - count(*))::BIGINT AS n_redundant_chunks,
           round(count(*)::DOUBLE / sum(n)::DOUBLE, 9) AS dedup_ratio,
           round(sum(tk)::DOUBLE / sum(n)::DOUBLE, 9) AS avg_chunk_tokens
    FROM per
    """,
)
def cdc_chunk_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup report
    (operators.dedup.content_defined_chunks, w=8, divisor=16): cut
    chunks where the rolling token-hash ≡ 0 mod 16 (boundaries follow
    content, so shared spans inside otherwise-different docs chunk
    identically — the partial-overlap dedup MinHash/fingerprints can't
    see), then grade the corpus: how many chunks, how many distinct,
    how many shared across docs, the storage dedup ratio.  Row-local
    chunking; ONE chunk-hash groupBy is the only corpus-sized
    shuffle."""
    from ..operators.dedup import content_defined_chunks

    docs = _t(spark, sf_dir, "documents")
    ch = content_defined_chunks(docs, w=8, divisor=16)
    per = ch.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("_n"),
        F.count_distinct("doc_id").alias("_nd"),
        F.sum("n_toks").alias("_tk"),
    )
    nd = ch.agg(F.count_distinct("doc_id").alias("n_docs"))
    return per.agg(
        F.sum("_n").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chunks"),
        F.sum(F.when(F.col("_nd") > 1, 1).otherwise(0)).cast("long").alias(
            "n_multi_doc_chunks"
        ),
        (F.sum("_n") - F.count(F.lit(1))).cast("long").alias(
            "n_redundant_chunks"
        ),
        F.round(
            F.count(F.lit(1)).cast("double") / F.sum("_n").cast("double"), 9
        ).alias("dedup_ratio"),
        F.round(
            F.sum("_tk").cast("double") / F.sum("_n").cast("double"), 9
        ).alias("avg_chunk_tokens"),
    ).crossJoin(F.broadcast(nd)).select(
        F.col("n_docs").cast("long").alias("n_docs"),
        "n_chunks",
        "n_distinct_chunks",
        "n_multi_doc_chunks",
        "n_redundant_chunks",
        "dedup_ratio",
        "avg_chunk_tokens",
    )


@_q(
    "emb_dim_stats",
    """
    WITH e AS (
      SELECT unnest(range(0, len(embedding))) AS dim,
             unnest(embedding)::DOUBLE AS x
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    agg AS (
      SELECT dim, count(*) AS n,
             sum(CAST(x AS DECIMAL(28,12))) AS sx,
             sum(CAST(x * x AS DECIMAL(28,12))) AS sxx,
             min(x) AS mn, max(x) AS mx
      FROM e GROUP BY 1
    )
    SELECT dim::INT AS dim, n::BIGINT AS n,
           round(sx::DOUBLE / n::DOUBLE, 9) AS mean,
           round(sqrt(greatest(
             (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
             / (n::DOUBLE * n::DOUBLE), 0.0)), 9) AS std,
           round(mn, 9) AS min_x, round(mx, 9) AS max_x
    FROM agg
    """,
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics
    (operators.similarity.embedding_dim_stats) — the collapsed-dim /
    anisotropy detector beside emb_similarity_hist's pair view: ~zero
    variance = wasted index width, |mean| >> std = one axis dominating
    every cosine.  One posexplode → dim groupBy, partial-aggregable,
    |dims|-row output."""
    from ..operators.similarity import embedding_dim_stats

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_dim_stats(emb)


@_q(
    "privacy_k_anonymity",
    """
    WITH combos AS (
      SELECT coalesce(lang, chr(0) || 'null') AS q0,
             coalesce(source, chr(0) || 'null') AS q1,
             coalesce((n_chars // 500)::VARCHAR, chr(0) || 'null') AS q2,
             count(*) AS n
      FROM documents GROUP BY 1, 2, 3
    )
    SELECT 5 AS k,
           sum(n)::BIGINT AS n_rows,
           count(*)::BIGINT AS n_combos,
           sum(CASE WHEN n < 5 THEN 1 ELSE 0 END)::BIGINT
             AS n_combos_below_k,
           sum(CASE WHEN n < 5 THEN n ELSE 0 END)::BIGINT
             AS n_rows_below_k,
           round(sum(CASE WHEN n < 5 THEN n ELSE 0 END)::DOUBLE
                 / sum(n)::DOUBLE, 9) AS share_rows_below_k,
           min(n)::BIGINT AS min_combo_size
    FROM combos
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the corpus over the (lang, source,
    500-char length band) quasi-identifier combination
    (operators.profile.k_anonymity_report, k=5) — the re-identification
    risk table a privacy review reads before release: combos shared by
    fewer than k docs are linkable even with direct identifiers
    redacted.  One combo groupBy; summary on the combos axis."""
    from ..operators.profile import k_anonymity_report

    docs = _t(spark, sf_dir, "documents").select(
        "lang",
        "source",
        (F.col("n_chars") / F.lit(500)).cast("long").alias("len_band"),
    )
    return k_anonymity_report(
        docs, quasi_cols=["lang", "source", "len_band"], k=5
    )


_BLOCKLIST = ("customer", "deadlock", "xylophone")


def _blocklist_oracle() -> str:
    import re as _re

    parts = []
    for t in sorted(_BLOCKLIST):
        pat = "(?i)\\b" + _re.escape(t) + "\\b"
        parts.append(f"""
        SELECT '{t}' AS term,
               sum(CASE WHEN len(regexp_extract_all(text, '{pat}')) > 0
                        THEN 1 ELSE 0 END)::BIGINT AS n_docs,
               sum(len(regexp_extract_all(text, '{pat}')))::BIGINT AS n_hits
        FROM documents WHERE text IS NOT NULL
        """)
    return " UNION ALL ".join(parts)


@_q("blocklist_screen_report", _blocklist_oracle())
def blocklist_screen_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist screening (operators.textstats.blocklist_screen): per
    banned term, documents matched and total hits — the compliance sweep
    a corpus release runs (the fixture list mixes frequent terms with a
    guaranteed-absent one, because the audit must show zero-hit terms
    WERE screened).  Word-bounded case-insensitive regex; one scan, all
    terms as unrolled conditional aggregates, zero shuffles."""
    from ..operators.textstats import blocklist_screen

    docs = _t(spark, sf_dir, "documents")
    return blocklist_screen(docs, terms=list(_BLOCKLIST))


@_q(
    "cdc_chunk_neardup_pairs",
    f"""
    WITH d AS (
      SELECT doc_id, {_DUCK_WORDS} AS toks FROM documents
      WHERE len({_DUCK_WORDS}) > 0
    ),
    h AS (
      SELECT doc_id, toks,
             list_transform(toks,
               tk -> ('0x' || substr(md5(tk), 1, 8))::BIGINT) AS hs,
             len(toks) AS n
      FROM d
    ),
    c AS (
      SELECT doc_id, toks, n,
             [i for i in range(8, n + 1)
              if list_reduce(hs[i-7:i],
                   (a, x) -> (a * 31 + x) % 1000000007) % 16 = 0] AS cuts
      FROM h
    ),
    b AS (
      SELECT doc_id, toks,
             list_concat(list_concat([0], cuts), [n]) AS bounds
      FROM c
    ),
    ch AS (
      SELECT doc_id,
             md5(array_to_string(toks[ck.s:ck.s + ck.l - 1], ' '))
               AS chunk_hash,
             ck.l AS n_toks
      FROM (
        SELECT doc_id, toks,
               unnest([{{s: bounds[j] + 1, l: bounds[j+1] - bounds[j]}}
                       for j in range(1, len(bounds))]) AS ck
        FROM b
      ) WHERE ck.l > 0
    ),
    capped AS (
      SELECT * FROM ch
      WHERE chunk_hash IN (
        SELECT chunk_hash FROM ch GROUP BY 1 HAVING count(*) <= 1000
      )
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
             count(*) AS n_shared_chunks,
             sum(a.n_toks)::BIGINT AS shared_tokens
      FROM capped a
      JOIN capped b2
        ON a.chunk_hash = b2.chunk_hash AND a.doc_id < b2.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_shared_chunks::BIGINT AS n_shared_chunks,
           shared_tokens
    FROM pairs WHERE n_shared_chunks >= 2
    """,
)
def cdc_chunk_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by shared content-defined chunks
    (operators.dedup.chunk_overlap_pairs, min_shared=2) — the
    partial-overlap pairing channel: syndicated paragraphs / stitched
    templates share chunk identities even when whole-doc MinHash
    under-scores the pair.  LSH discipline: pairs form inside
    chunk-identity buckets only, corpus-wide boilerplate buckets capped
    out before pairing."""
    from ..operators.dedup import chunk_overlap_pairs

    docs = _t(spark, sf_dir, "documents")
    return chunk_overlap_pairs(docs, min_shared=2, max_bucket_size=1000)


def _rbo_oracle(k: int = 10, p: float = 0.9) -> str:
    weights = {
        m: sum(p ** (d - 1) / d for d in range(m, k + 1))
        for m in range(1, k + 1)
    }
    case = " ".join(
        f"WHEN {m} THEN {weights[m]!r}" for m in range(1, k + 1)
    )
    return f"""
    WITH tok AS ({_DUCK_TOK}),
    q AS (
      SELECT doc_id AS query_id,
             array_to_string(
               (regexp_extract_all(lower(text), '[a-z0-9]+'))[1:5], ' ') AS qt
      FROM documents WHERE doc_id < 3
    ),
    qtok AS (
      SELECT DISTINCT query_id, t.tok AS token
      FROM q, unnest(regexp_extract_all(lower(qt), '[a-z0-9]+')) AS t(tok)
    ),
    vocab AS (SELECT DISTINCT token FROM qtok),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs,
                     sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM tok JOIN vocab USING (token) GROUP BY 1, 2
    ),
    dft AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    per AS (
      SELECT qtok.query_id, tf.doc_id,
             CAST(ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
                  * (CAST(tf AS DOUBLE) * (1.2 + 1))
                    / (CAST(tf AS DOUBLE)
                       + 1.2 * (1 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
                  AS DECIMAL(28,12)) AS s
      FROM tf JOIN dft USING (token) JOIN dl USING (doc_id)
      CROSS JOIN stats JOIN qtok USING (token)
    ),
    bm AS (
      SELECT query_id, doc_id,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY CAST(sum(s) AS DOUBLE) DESC, doc_id) AS INT) AS rank
      FROM per GROUP BY query_id, doc_id
      QUALIFY rank <= {k}
    ),
    eq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < 3),
    dp AS (
      SELECT eq.query_id, c.vec_id AS doc_id,
             {_DUCK_COSINE.replace("q.qv", "eq.qv")} AS score
      FROM embeddings c, eq WHERE c.vec_id != eq.query_id
    ),
    dn AS (
      SELECT query_id, doc_id,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id ASC) AS INT) AS rank
      FROM dp QUALIFY rank <= {k}
    ),
    fscore AS (
      SELECT query_id, doc_id,
             coalesce(1.0 / (60 + bm.rank), 0.0)
             + coalesce(1.0 / (60 + dn.rank), 0.0) AS rrf
      FROM bm FULL OUTER JOIN dn USING (query_id, doc_id)
    ),
    fused AS (
      SELECT query_id, doc_id,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY rrf DESC, doc_id ASC) AS INT) AS rank
      FROM fscore
      QUALIFY rank <= {k}
    ),
    matched AS (
      SELECT bm.query_id,
             CAST(CASE greatest(bm.rank, fused.rank) {case} END
               AS DECIMAL(28,12)) AS w
      FROM bm JOIN fused USING (query_id, doc_id)
    ),
    spine AS (
      SELECT DISTINCT query_id FROM bm
      INTERSECT
      SELECT DISTINCT query_id FROM fused
    ),
    scored AS (
      SELECT query_id, count(*) AS nc, sum(w) AS sw
      FROM matched GROUP BY query_id
    )
    SELECT s.query_id, coalesce(nc, 0)::BIGINT AS n_common,
           round(coalesce(nc, 0)::DOUBLE / {float(k)!r}, 9) AS overlap_at_k,
           round(coalesce(sw::DOUBLE, 0.0) * {(1.0 - p)!r}, 9) AS rbo
    FROM spine s LEFT JOIN scored USING (query_id)
    """


@_q("search_rbo_lexical_vs_dense", _rbo_oracle())
def search_rbo_lexical_vs_dense(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rank-biased overlap between the BM25 top-10 and the RRF-FUSED
    top-10 (operators.ranking.rank_biased_overlap, p=0.9) — "how much
    did adding the dense list change what the user sees": RBO near the
    truncation ceiling = fusion kept the lexical ordering, low RBO =
    the dense signal rewrote the page (here the dense and lexical lists
    are disjoint on the fixture, so fusion interleaves and RBO sits in
    between; a query with NOTHING in common still emits its 0 row —
    disagreement is the finding).  One (query, doc) equi-join +
    per-query literal-weight sums."""
    from ..operators.dedup import words
    from ..operators.ranking import (
        bm25_search_topk,
        rank_biased_overlap,
        rrf_fuse,
    )
    from ..operators.similarity import cosine_topk

    docs = _t(spark, sf_dir, "documents")
    queries_df = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(words(F.col("text")), 1, 5), " ").alias(
            "query_text"
        ),
    )
    bm = bm25_search_topk(docs, queries_df, k=10).select(
        "query_id", "doc_id", "rank"
    )
    emb = _t(spark, sf_dir, "embeddings")
    dense = cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=10).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    fused = rrf_fuse([bm, dense], k_const=60, top_k=10).select(
        "query_id", "doc_id", "rank"
    )
    return rank_biased_overlap(bm, fused, k=10, p=0.9)


@_q(
    "ab_simpsons_check",
    """
    WITH u0 AS (
      SELECT user_id, CAST(user_id % 2 AS VARCHAR) AS v,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y,
             count(*) AS ne
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      GROUP BY user_id
    ),
    u AS (
      SELECT v, y,
             'q' || ntile(5) OVER (ORDER BY ne, user_id)::VARCHAR AS s
      FROM u0
    ),
    per AS (SELECT s, v, count(*) AS n, sum(y) AS k FROM u GROUP BY 1, 2),
    pooled AS (
      SELECT chr(0) || 'pooled' AS s, v, sum(n) AS n, sum(k) AS k
      FROM per GROUP BY 2
    ),
    unioned AS (SELECT * FROM per UNION ALL SELECT * FROM pooled),
    wide AS (
      SELECT s AS stratum,
             coalesce(sum(CASE WHEN v = '0' THEN n END), 0)::BIGINT AS n_a,
             coalesce(sum(CASE WHEN v = '0' THEN k END), 0)::BIGINT AS k_a,
             coalesce(sum(CASE WHEN v = '1' THEN n END), 0)::BIGINT AS n_b,
             coalesce(sum(CASE WHEN v = '1' THEN k END), 0)::BIGINT AS k_b
      FROM unioned GROUP BY 1
    ),
    scored AS (
      SELECT stratum, n_a, k_a, n_b, k_b,
             round(CASE WHEN n_a > 0 THEN k_a::DOUBLE / n_a END, 9)
               AS rate_a,
             round(CASE WHEN n_b > 0 THEN k_b::DOUBLE / n_b END, 9)
               AS rate_b,
             round((CASE WHEN n_a > 0 THEN k_a::DOUBLE / n_a END)
                   - (CASE WHEN n_b > 0 THEN k_b::DOUBLE / n_b END), 9)
               AS diff
      FROM wide
    )
    SELECT *,
           (sign(diff) = (SELECT sign(diff) FROM scored
                          WHERE stratum = chr(0) || 'pooled')
            OR sign(diff) = 0) AS agrees_with_pooled
    FROM scored
    """,
)
def ab_simpsons_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox check for the purchase A/B read
    (operators.evaluation.simpsons_check): the pooled conversion
    difference beside per-stratum differences (stratum = the user's
    activity QUINTILE — the engagement cohort that classically
    confounds conversion reads; quintiles, not fixed count cutoffs,
    stay meaningful across scale factors), with a sign-agreement flag
    per stratum.  The pooled read flips whenever arm assignment
    correlates with a metric-driving stratum — the aggregation trap a
    stratified table catches before the postmortem does.  Unit of
    analysis is the user; one (stratum, arm) groupBy, strata-axis
    arithmetic after."""
    from ..operators.evaluation import simpsons_check

    ev = _t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
        F.count(F.lit(1)).alias("ne"),
    )
    # activity QUINTILE, not a fixed count cutoff: per-user volumes grow
    # with SF, a scale-free stratum doesn't; the ntile window runs over
    # the USERS axis (bounded) with a deterministic (ne, user_id) order
    users = per_user.select(
        (F.col("user_id") % 2).cast("string").alias("variant"),
        "converted",
        F.concat(
            F.lit("q"),
            F.ntile(5)
            .over(Window.orderBy("ne", "user_id"))
            .cast("string"),
        ).alias("cohort"),
    )
    return simpsons_check(users, "variant", "converted", "cohort")


@_q(
    "ts_mann_kendall",
    f"""
    WITH b AS (
      SELECT event_type, date_trunc('day', ts) AS bk,
             CAST(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                  / count(*) AS DECIMAL(28,6)) AS m
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
        AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    p AS (
      SELECT a.event_type,
             sum(sign(b2.m::DOUBLE - a.m::DOUBLE))::BIGINT AS s
      FROM b a JOIN b b2
        ON a.event_type = b2.event_type AND a.bk < b2.bk
      GROUP BY 1
    ),
    t AS (
      SELECT event_type, sum(t)::BIGINT AS n_buckets,
             sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie_poly
      FROM (SELECT event_type, m, count(*) AS t FROM b GROUP BY 1, 2)
      GROUP BY 1
    ),
    j AS (
      SELECT p.event_type, n_buckets, s,
             (n_buckets * (n_buckets - 1) * (2 * n_buckets + 5)
              - tie_poly)::DOUBLE / 18.0 AS var_s
      FROM p JOIN t USING (event_type)
    )
    SELECT event_type, n_buckets, s, round(var_s, 9) AS var_s,
           round(CASE WHEN n_buckets >= 2 AND var_s > 0
                      THEN (s::DOUBLE - sign(s::DOUBLE)) / sqrt(var_s)
                 END, 9) AS z,
           CASE WHEN (CASE WHEN n_buckets >= 2 AND var_s > 0
                           THEN (s::DOUBLE - sign(s::DOUBLE)) / sqrt(var_s)
                      END) > {Z95!r} THEN 'increasing'
                WHEN (CASE WHEN n_buckets >= 2 AND var_s > 0
                           THEN (s::DOUBLE - sign(s::DOUBLE)) / sqrt(var_s)
                      END) < -{Z95!r} THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM j
    """,
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test per event type over daily
    bucket means (operators.timeseries.mann_kendall_trend) — the
    non-parametric companion to ts_trend_fit's least-squares slope: one
    spike can't buy a trend, no linearity assumed.  The O(n²) pair sum
    runs on the BUCKET axis (days per series — bounded), after one
    partial-aggregable bucket reduction of the facts; tie-corrected
    variance, continuity-corrected z."""
    from ..operators.timeseries import mann_kendall_trend

    ev = _t(spark, sf_dir, "events")
    return mann_kendall_trend(
        ev, ts="ts", value="value", dims=["event_type"], unit="day"
    )


@_q(
    "ts_seasonal_strength",
    f"""
    WITH d AS ({{DECOMP}}),
    f AS (
      SELECT event_type, resid,
             trend + resid AS deseas,
             seasonal + resid AS detr
      FROM d WHERE trend IS NOT NULL
    ),
    agg AS (
      SELECT event_type, count(*) AS n,
             sum(CAST(resid AS DECIMAL(28,12))) AS sr,
             sum(CAST(resid * resid AS DECIMAL(28,12))) AS qr,
             sum(CAST(deseas AS DECIMAL(28,12))) AS sd,
             sum(CAST(deseas * deseas AS DECIMAL(28,12))) AS qd,
             sum(CAST(detr AS DECIMAL(28,12))) AS st,
             sum(CAST(detr * detr AS DECIMAL(28,12))) AS qt
      FROM f GROUP BY 1
    )
    SELECT event_type, n::BIGINT AS n_buckets,
           round(greatest(0.0, 1.0 -
             ((n::DOUBLE * qr::DOUBLE - sr::DOUBLE * sr::DOUBLE)
              / (n::DOUBLE * n::DOUBLE))
             / ((n::DOUBLE * qd::DOUBLE - sd::DOUBLE * sd::DOUBLE)
                / (n::DOUBLE * n::DOUBLE))), 9) AS trend_strength,
           round(greatest(0.0, 1.0 -
             ((n::DOUBLE * qr::DOUBLE - sr::DOUBLE * sr::DOUBLE)
              / (n::DOUBLE * n::DOUBLE))
             / ((n::DOUBLE * qt::DOUBLE - st::DOUBLE * st::DOUBLE)
                / (n::DOUBLE * n::DOUBLE))), 9) AS seasonal_strength
    FROM agg
    """.replace("{DECOMP}", ORACLES["ts_seasonal_decompose"]),
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend/seasonal strength per event type
    (operators.timeseries.seasonal_strength over the hourly series,
    period=24) — the Hyndman feature pair: "is this metric actually
    seasonal, and how much is trend", the numbers that choose between
    Holt, Holt-Winters, and a flat threshold.  Variances over the
    full-trend-window buckets only; one per-series moment aggregate on
    the bucket axis after the decomposition."""
    from ..operators.timeseries import seasonal_strength

    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    series = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("value")
    )
    return seasonal_strength(series, ["event_type"], "bucket", "value", 24)


@_q(
    "ts_theil_sen",
    """
    WITH b AS (
      SELECT event_type, date_trunc('day', ts) AS bk,
             CAST(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                  / count(*) AS DECIMAL(28,6)) AS m
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
        AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    nb AS (SELECT event_type, count(*)::BIGINT AS n_buckets FROM b
           GROUP BY 1),
    p AS (
      SELECT a.event_type,
             round((b2.m::DOUBLE - a.m::DOUBLE)
                   / date_diff('day', a.bk, b2.bk)::DOUBLE, 9) AS s
      FROM b a JOIN b b2
        ON a.event_type = b2.event_type AND a.bk < b2.bk
    ),
    c AS (SELECT event_type, s, count(*) AS n FROM p GROUP BY 1, 2),
    cum AS (
      SELECT event_type, s,
             sum(n) OVER (PARTITION BY event_type ORDER BY s
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(n) OVER (PARTITION BY event_type) AS tot
      FROM c
    ),
    med AS (
      SELECT event_type, max(tot)::BIGINT AS n_pairs,
             min(s) AS sen_slope
      FROM cum WHERE 2 * cum >= tot GROUP BY 1
    )
    SELECT event_type, n_buckets, n_pairs, sen_slope
    FROM med JOIN nb USING (event_type)
    """,
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen slope per event type over daily bucket means
    (operators.timeseries.theil_sen_slope) — the robust trend MAGNITUDE
    beside ts_mann_kendall's direction verdict: the median of all
    pairwise slopes, immune to the spikes least-squares chases.  Pair
    set and median windows live on the bucket/distinct-slope axes only;
    lower weighted median, pure integer comparisons."""
    from ..operators.timeseries import theil_sen_slope

    ev = _t(spark, sf_dir, "events")
    return theil_sen_slope(
        ev, ts="ts", value="value", dims=["event_type"], unit="day"
    )


_CUSUM_B = 60


@_q(
    "ts_cusum_changepoint",
    f"""
    WITH b AS (
      SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS bk,
             CAST(CAST(CAST(sum(CAST(value AS DECIMAL(28,6)))
                            AS DOUBLE) / count(*)
                       AS DECIMAL(28,6)) * 1000000 AS BIGINT) AS m6
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
        AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, bk, m6,
             count(*) OVER (PARTITION BY event_type) AS n,
             sum(m6) OVER (PARTITION BY event_type) AS tot,
             sum(m6) OVER (PARTITION BY event_type ORDER BY bk
                           ROWS UNBOUNDED PRECEDING) AS cum,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY bk) AS i
      FROM b
    ),
    dev AS (
      SELECT *, n * cum - i * tot AS t6 FROM s WHERE n >= 2
    ),
    obs AS (
      SELECT event_type, n, bk AS cp_bucket, tmax - tmin AS range6,
             cum AS cum_cp, i AS i_cp, tot
      FROM (
        SELECT *,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY abs(t6) DESC, bk ASC) AS rk,
               max(t6) OVER (PARTITION BY event_type) AS tmax,
               min(t6) OVER (PARTITION BY event_type) AS tmin
        FROM dev
      ) WHERE rk = 1
    ),
    rep AS (
      SELECT event_type, bk, m6, n, tot, r
      FROM dev
      CROSS JOIN (SELECT unnest(range(1, {_CUSUM_B + 1})) AS r)
    ),
    pdev AS (
      SELECT event_type, r,
             n * sum(m6) OVER w - (row_number() OVER w) * tot AS pt6
      FROM rep
      WINDOW w AS (
        PARTITION BY event_type, r
        ORDER BY md5(event_type || chr(31)
                     || strftime(bk, '%Y-%m-%d %H:%M:%S')
                     || chr(31) || r::VARCHAR)
        ROWS UNBOUNDED PRECEDING
      )
    ),
    ranges AS (
      SELECT event_type, r, max(pt6) - min(pt6) AS pr6
      FROM pdev GROUP BY 1, 2
    ),
    tail AS (
      SELECT ranges.event_type,
             sum(CASE WHEN pr6 >= range6 THEN 1 ELSE 0 END)::BIGINT
               AS n_ge
      FROM ranges JOIN obs USING (event_type)
      GROUP BY 1
    )
    SELECT obs.event_type, n::BIGINT AS n_buckets, cp_bucket,
           round((range6::DOUBLE) / (n * 1000000.0), 9) AS cusum_range,
           round(cum_cp::DOUBLE / (i_cp * 1000000.0), 9) AS mean_before,
           round(CASE WHEN i_cp = n THEN NULL
                      ELSE (tot - cum_cp)::DOUBLE
                           / ((n - i_cp) * 1000000.0) END, 9)
             AS mean_after,
           round(CASE WHEN i_cp = n THEN NULL
                      ELSE (tot - cum_cp)::DOUBLE
                           / ((n - i_cp) * 1000000.0) END
                 - cum_cp::DOUBLE / (i_cp * 1000000.0), 9) AS shift,
           n_ge,
           round((1 + n_ge)::DOUBLE / {_CUSUM_B + 1}.0, 9) AS p_value,
           (1 + n_ge)::DOUBLE / {_CUSUM_B + 1}.0 <= 0.05 AS significant
    FROM obs JOIN tail ON obs.event_type = tail.event_type
    """,
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift changepoint per event type over daily bucket
    means (operators.timeseries.cusum_changepoint, B=60) — localizes a
    level break to its bucket, sizes the before/after means, and grades
    it with a deterministic md5 permutation test on the CUSUM range.
    Integer-exact end-to-end (means ×10⁶, Tᵢ = n·cumᵢ − i·tot); windows
    and the ×B explode live on the bucket axis only."""
    from ..operators.timeseries import cusum_changepoint

    ev = _t(spark, sf_dir, "events")
    return cusum_changepoint(
        ev, ts="ts", value="value", dims=["event_type"], unit="day",
        b=_CUSUM_B,
    )


@_q(
    "mw_doclen_sources",
    """
    WITH base AS (
      SELECT source AS g, CAST(n_chars AS DOUBLE) AS v
      FROM documents
      WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL
    ),
    arms AS (
      SELECT g, n,
             row_number() OVER (ORDER BY g) AS rk,
             count(*) OVER () AS narms
      FROM (SELECT g, count(*) AS n FROM base GROUP BY 1)
    ),
    vc AS (
      SELECT v,
             sum(CASE WHEN rk = 1 THEN c ELSE 0 END)::BIGINT AS ca,
             sum(CASE WHEN rk = 2 THEN c ELSE 0 END)::BIGINT AS cb
      FROM (SELECT v, g, count(*) AS c FROM base GROUP BY 1, 2)
      JOIN arms USING (g)
      GROUP BY 1
    ),
    st AS (
      SELECT sum(ca * (2 * blt + cb)) AS u2a,
             sum(t * t * t - t) AS tie
      FROM (
        SELECT ca, cb,
               coalesce(sum(cb) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS blt,
               ca + cb AS t
        FROM vc
      )
    ),
    wide AS (
      SELECT a.g AS group_a, b.g AS group_b,
             a.n AS n_a, b.n AS n_b, a.narms AS narms,
             st.u2a AS u2a, st.tie AS tie
      FROM (SELECT * FROM arms WHERE rk = 1) a
      CROSS JOIN (SELECT * FROM arms WHERE rk = 2) b
      CROSS JOIN st
    ),
    calc AS (
      SELECT *,
             n_a::DOUBLE AS na, n_b::DOUBLE AS nb,
             n_a::DOUBLE + n_b::DOUBLE AS n,
             u2a::DOUBLE / 2.0 AS ua,
             n_a::DOUBLE * n_b::DOUBLE / 12.0
               * ((n_a::DOUBLE + n_b::DOUBLE + 1)
                  - tie::DOUBLE
                    / ((n_a + n_b)::DOUBLE * (n_a + n_b - 1)::DOUBLE))
               AS var_u
      FROM wide
    ),
    z AS (
      SELECT *,
             CASE WHEN narms = 2 AND var_u > 0 THEN
               ((u2a::DOUBLE - na * nb) / 2.0
                - 0.5 * sign((u2a - n_a * n_b)::DOUBLE))
               / sqrt(var_u) END AS zz
      FROM calc
    )
    SELECT CASE WHEN narms = 2 THEN group_a END AS group_a,
           CASE WHEN narms = 2 THEN group_b END AS group_b,
           n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
           round(CASE WHEN narms = 2 THEN ua END, 9) AS u_a,
           round(CASE WHEN narms = 2 THEN na * nb - ua END, 9) AS u_b,
           round(CASE WHEN narms = 2
                 THEN 2.0 * ua / (na * nb) - 1.0 END, 9)
             AS rank_biserial,
           round(zz, 9) AS z,
           coalesce(abs(zz) > 1.959963984540054, false) AS significant
    FROM z
    """,
)
def mw_doclen_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test on document length between two
    sources (operators.evaluation.mann_whitney_u) — the non-parametric
    "is src1 shipping longer docs than src0" verdict with tie-corrected
    variance, continuity-corrected z, and the rank-biserial effect size;
    counts-based over the distinct-length axis, integer-exact
    comparisons throughout."""
    from ..operators.evaluation import mann_whitney_u

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
        & F.col("n_chars").isNotNull()
    )
    return mann_whitney_u(docs, "n_chars", "source")


@_q(
    "welch_value_click_purchase",
    """
    WITH base AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS v
      FROM events
      WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
    ),
    arms AS (
      SELECT g, n, s, q,
             row_number() OVER (ORDER BY g) AS rk,
             count(*) OVER () AS narms
      FROM (
        SELECT g, count(*) AS n,
               sum(CAST(v AS DECIMAL(28,12))) AS s,
               sum(CAST(v * v AS DECIMAL(28,12))) AS q
        FROM base GROUP BY 1
      )
    ),
    wide AS (
      SELECT a.g AS group_a, b.g AS group_b,
             a.n AS n_a, b.n AS n_b, a.narms,
             a.s AS sa, a.q AS qa, b.s AS sb, b.q AS qb
      FROM (SELECT * FROM arms WHERE rk = 1) a
      CROSS JOIN (SELECT * FROM arms WHERE rk = 2) b
    ),
    calc AS (
      SELECT *,
             n_a::DOUBLE AS na, n_b::DOUBLE AS nb,
             sa::DOUBLE / n_a AS m1, sb::DOUBLE / n_b AS m2,
             (qa::DOUBLE - n_a * (sa::DOUBLE / n_a)
                               * (sa::DOUBLE / n_a)) / (n_a - 1) AS v1,
             (qb::DOUBLE - n_b * (sb::DOUBLE / n_b)
                               * (sb::DOUBLE / n_b)) / (n_b - 1) AS v2
      FROM wide
    ),
    calc2 AS (
      SELECT *,
             v1 / na + v2 / nb AS se2,
             ((na - 1) * v1 + (nb - 1) * v2) / (na + nb - 2) AS pooled,
             narms = 2 AND n_a >= 2 AND n_b >= 2 AS ok
      FROM calc
    )
    SELECT CASE WHEN ok THEN group_a END AS group_a,
           CASE WHEN ok THEN group_b END AS group_b,
           n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
           round(CASE WHEN ok THEN m1 END, 9) AS mean_a,
           round(CASE WHEN ok THEN m2 END, 9) AS mean_b,
           round(CASE WHEN ok THEN v1 END, 9) AS var_a,
           round(CASE WHEN ok THEN v2 END, 9) AS var_b,
           round(CASE WHEN ok AND se2 > 0
                 THEN (m1 - m2) / sqrt(se2) END, 9) AS t,
           round(CASE WHEN ok AND se2 > 0
                 THEN se2 * se2
                      / ((v1 / na) * (v1 / na) / (na - 1)
                         + (v2 / nb) * (v2 / nb) / (nb - 1)) END, 9)
             AS df,
           round(CASE WHEN ok AND pooled > 0
                 THEN (m1 - m2) / sqrt(pooled) END, 9) AS cohens_d,
           coalesce(abs(CASE WHEN ok AND se2 > 0
                        THEN (m1 - m2) / sqrt(se2) END)
                    > 1.959963984540054, false) AS significant
    FROM calc2
    """,
)
def welch_value_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-test with Cohen's d on event value between
    click and purchase events (operators.evaluation.welch_t_test) — the
    parametric mean comparison beside mw_doclen_sources' rank verdict:
    unequal variances allowed, Welch–Satterthwaite df, effect size in
    pooled-sd units.  One partial-aggregable groupBy carries exact
    decimal n/Σx/Σx² per arm; normal-approx significance at this df."""
    from ..operators.evaluation import welch_t_test

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
        & F.col("value").isNotNull()
    )
    return welch_t_test(ev, "value", "event_type")


@_q(
    "anova_value_event_types",
    """
    WITH g AS (
      SELECT event_type AS gg, count(*) AS n,
             sum(CAST(value AS DECIMAL(28,12))) AS s,
             sum(CAST(value * value AS DECIMAL(28,12))) AS q
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1
    ),
    agg AS (
      SELECT sum(n) AS nn, count(*) AS k, sum(s) AS ss, sum(q) AS qq,
             sum(CAST(s::DOUBLE * s::DOUBLE / n::DOUBLE
                      AS DECIMAL(28,12))) AS sq_over_n
      FROM g
    ),
    calc AS (
      SELECT nn, k,
             CAST(round(sq_over_n, 6)
                  - round(CAST(ss::DOUBLE * ss::DOUBLE / nn::DOUBLE
                               AS DECIMAL(28,12)), 6)
                  AS DOUBLE) AS ssb,
             CAST(round(qq, 6) - round(sq_over_n, 6) AS DOUBLE)
               AS ssw,
             k >= 2 AND nn > k AS ok
      FROM agg
    )
    SELECT nn::BIGINT AS n, k::BIGINT AS k,
           (k - 1)::BIGINT AS df1, (nn - k)::BIGINT AS df2,
           round(CASE WHEN ok THEN ssb END, 9) AS ss_between,
           round(CASE WHEN ok THEN ssw END, 9) AS ss_within,
           round(CASE WHEN ok AND ssw > 0
                 THEN (ssb / (k::DOUBLE - 1))
                      / (ssw / (nn::DOUBLE - k::DOUBLE)) END, 9) AS f,
           round(CASE WHEN ok AND ssb + ssw != 0
                 THEN ssb / (ssb + ssw) END, 9) AS eta_squared
    FROM calc
    """,
)
def anova_value_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA on event value across all event types
    (operators.evaluation.anova_oneway) — the omnibus "does ANY type
    differ" gate before pairwise welch_value_click_purchase-style
    comparisons; F + η² from one partial-aggregable groupBy with
    per-group decimal-quantized s²/n terms."""
    from ..operators.evaluation import anova_oneway

    ev = _t(spark, sf_dir, "events")
    return anova_oneway(ev, "value", "event_type")


@_q(
    "kw_doclen_by_lang",
    """
    WITH base AS (
      SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v
      FROM documents
      WHERE lang IS NOT NULL AND n_chars IS NOT NULL
    ),
    vc AS (SELECT v, g, count(*) AS c FROM base GROUP BY 1, 2),
    tv AS (SELECT v, sum(c) AS t FROM vc GROUP BY 1),
    lv AS (
      SELECT v, t,
             coalesce(sum(t) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS l
      FROM tv
    ),
    ranks AS (
      SELECT g, sum(c) AS n, sum(c * (2 * l + t + 1)) AS r2
      FROM vc JOIN lv USING (v) GROUP BY 1
    ),
    ties AS (SELECT sum(t * t * t - t) AS tie FROM tv),
    agg AS (
      SELECT sum(n) AS nn, count(*) AS k,
             sum(CAST(r2::DOUBLE * r2::DOUBLE / (4.0 * n::DOUBLE)
                      AS DECIMAL(28,12))) AS r2n
      FROM ranks
    ),
    calc AS (
      SELECT nn, k, tie,
             12.0 / (nn::DOUBLE * (nn::DOUBLE + 1)) * r2n::DOUBLE
               - 3.0 * (nn::DOUBLE + 1) AS h,
             1.0 - tie::DOUBLE
               / (nn::DOUBLE * nn::DOUBLE * nn::DOUBLE - nn::DOUBLE)
               AS corr,
             k >= 2 AND nn > k AS ok
      FROM agg CROSS JOIN ties
    )
    SELECT nn::BIGINT AS n, k::BIGINT AS k, (k - 1)::BIGINT AS dof,
           round(CASE WHEN ok THEN h END, 9) AS h,
           round(CASE WHEN ok AND corr > 0 THEN h / corr END, 9)
             AS h_tie_corrected,
           round(CASE WHEN ok AND nn::DOUBLE - k::DOUBLE != 0
                 THEN (h - k::DOUBLE + 1) / (nn::DOUBLE - k::DOUBLE)
                 END, 9) AS epsilon_squared
    FROM calc
    """,
)
def kw_doclen_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H on document length across languages
    (operators.evaluation.kruskal_wallis) — the rank-based omnibus
    beside anova_value_event_types' parametric F: does ANY language ship
    longer docs, outlier-proof.  Counts-based midranks over the
    distinct-length axis (2·R_g exact int64), tie-corrected, ε² effect
    size."""
    from ..operators.evaluation import kruskal_wallis

    docs = _t(spark, sf_dir, "documents")
    return kruskal_wallis(docs, "n_chars", "lang")


@_q(
    "vocab_zipf_fit",
    """
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
        AS tok
      FROM documents
    ),
    cnt AS (SELECT tok, count(*) AS n FROM tok GROUP BY 1),
    head AS (
      SELECT tok, n FROM cnt ORDER BY n DESC, tok ASC LIMIT 1000
    ),
    xy AS (
      SELECT tok, n,
             ln((row_number() OVER (ORDER BY n DESC, tok ASC))::DOUBLE)
               AS x,
             ln(n::DOUBLE) AS y
      FROM head
    ),
    agg AS (
      SELECT count(*) AS m,
             sum(CAST(x AS DECIMAL(28,12))) AS sx,
             sum(CAST(y AS DECIMAL(28,12))) AS sy,
             sum(CAST(x * y AS DECIMAL(28,12))) AS sxy,
             sum(CAST(x * x AS DECIMAL(28,12))) AS sxx,
             sum(CAST(y * y AS DECIMAL(28,12))) AS syy
      FROM xy
    ),
    top AS (
      SELECT tok AS top_term, n AS top_freq
      FROM head ORDER BY n DESC, tok ASC LIMIT 1
    ),
    calc AS (
      SELECT m, top_term, top_freq,
             m::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS dx,
             m::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS dy,
             m::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS cov,
             sx::DOUBLE AS sxd, sy::DOUBLE AS syd
      FROM agg CROSS JOIN top
    )
    SELECT m::BIGINT AS n_terms, top_term, top_freq::BIGINT AS top_freq,
           round(CASE WHEN m >= 2 AND dx > 0 THEN cov / dx END, 9)
             AS slope,
           round(CASE WHEN m >= 2 AND dx > 0
                 THEN (syd - (cov / dx) * sxd) / m::DOUBLE END, 9)
             AS intercept,
           round(CASE WHEN m >= 2 AND dx > 0 AND dy > 0
                 THEN cov * cov / (dx * dy) END, 9) AS r_squared
    FROM calc
    """,
)
def vocab_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank–frequency fit over the top-1000 vocabulary head
    (operators.textstats.zipf_fit) — the one-row "is this natural
    language" corpus audit: log-log least squares slope ≈ −1 and r²
    near 1 for organic text; boilerplate floods flatten the head and
    token soups break linearity.  One token-count reduction, TopK head
    (never a full vocab sort), decimal-quantized regression sums."""
    from ..operators.textstats import zipf_fit

    return zipf_fit(_t(spark, sf_dir, "documents"), "text", top_n=1000)


@_q(
    "ts_forecast_backtest",
    """
    WITH b AS (
      SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS bk,
             CAST(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                  / count(*) AS DECIMAL(28,6)) AS m
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
        AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, m,
             row_number() OVER w AS i,
             count(*) OVER (PARTITION BY event_type) AS n,
             lag(m, 1) OVER w AS lag1,
             lag(m, 7) OVER w AS lagp
      FROM b
      WINDOW w AS (PARTITION BY event_type ORDER BY bk)
    ),
    r2 AS (SELECT *, n - 7 AS cut FROM r),
    tr AS (
      SELECT event_type,
             sum(CASE WHEN i <= cut THEN abs(m - lag1) END) AS sd,
             sum(CASE WHEN i <= cut AND lag1 IS NOT NULL
                 THEN 1 ELSE 0 END) AS nd
      FROM r2 WHERE cut >= 1 GROUP BY 1
    ),
    lastv AS (
      SELECT event_type, m AS lastm FROM r2
      WHERE cut >= 1 AND i = cut
    ),
    te AS (
      SELECT r2.event_type, r2.m, r2.lagp, tr.sd, tr.nd, lastv.lastm
      FROM r2
      JOIN tr ON r2.event_type = tr.event_type
      JOIN lastv ON r2.event_type = lastv.event_type
      WHERE r2.i > r2.cut
    ),
    naive AS (
      SELECT event_type, 'naive' AS method,
             sum(CASE WHEN lastm IS NOT NULL THEN 1 ELSE 0 END) AS h,
             sum(CASE WHEN lastm IS NOT NULL
                 THEN abs(m - lastm) END) AS sae,
             sum(CASE WHEN lastm IS NOT NULL
                 THEN CAST((m - lastm)::DOUBLE * (m - lastm)::DOUBLE
                      AS DECIMAL(28,12)) END) AS sse,
             count(CASE WHEN lastm IS NOT NULL AND m != 0
                   THEN 1 END) AS nape,
             sum(CASE WHEN lastm IS NOT NULL AND m != 0
                 THEN CAST(abs(m - lastm)::DOUBLE / abs(m::DOUBLE)
                      AS DECIMAL(28,12)) END) AS sape,
             max(sd) AS sd, max(nd) AS nd
      FROM te GROUP BY 1
    ),
    snaive AS (
      SELECT event_type, 'seasonal_naive' AS method,
             sum(CASE WHEN lagp IS NOT NULL THEN 1 ELSE 0 END) AS h,
             sum(CASE WHEN lagp IS NOT NULL
                 THEN abs(m - lagp) END) AS sae,
             sum(CASE WHEN lagp IS NOT NULL
                 THEN CAST((m - lagp)::DOUBLE * (m - lagp)::DOUBLE
                      AS DECIMAL(28,12)) END) AS sse,
             count(CASE WHEN lagp IS NOT NULL AND m != 0
                   THEN 1 END) AS nape,
             sum(CASE WHEN lagp IS NOT NULL AND m != 0
                 THEN CAST(abs(m - lagp)::DOUBLE / abs(m::DOUBLE)
                      AS DECIMAL(28,12)) END) AS sape,
             max(sd) AS sd, max(nd) AS nd
      FROM te GROUP BY 1
    ),
    u AS (SELECT * FROM naive UNION ALL SELECT * FROM snaive)
    SELECT event_type, method, h::BIGINT AS h, nape::BIGINT AS n_mape,
           round(sae::DOUBLE / h, 9) AS mae,
           round(sqrt(sse::DOUBLE / h), 9) AS rmse,
           round(CASE WHEN nape > 0
                 THEN sape::DOUBLE / nape END, 9) AS mape,
           round(CASE WHEN nd > 0 AND sd IS NOT NULL
                 THEN (sae::DOUBLE / h)
                      / (sd::DOUBLE / nd::DOUBLE) END, 9) AS mase
    FROM u WHERE h >= 1
    """,
)
def ts_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holdout backtest of naive and seasonal-naive forecasters per
    event type (operators.timeseries.forecast_backtest, daily buckets,
    period=7, holdout=7) — MAE/RMSE/MAPE on the last week plus MASE
    against in-sample naive: the baseline any Holt/Holt–Winters
    adoption must beat.  One corpus reduction; windows and metric
    aggregates on the bucket axis per series."""
    from ..operators.timeseries import forecast_backtest

    ev = _t(spark, sf_dir, "events")
    return forecast_backtest(
        ev, ts="ts", value="value", dims=["event_type"], unit="day",
        period=7, holdout=7,
    )


@_q(
    "pairwise_welch_event_types",
    """
    WITH g AS (
      SELECT event_type AS gg, count(*) AS n,
             sum(CAST(value AS DECIMAL(28,12))) AS s,
             sum(CAST(value * value AS DECIMAL(28,12))) AS q
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1
    ),
    pairs AS (
      SELECT a.gg AS group_a, b.gg AS group_b,
             a.n AS n_a, b.n AS n_b,
             a.s AS sa, a.q AS qa, b.s AS sb, b.q AS qb,
             count(*) OVER () AS m_pairs
      FROM g a JOIN g b ON a.gg < b.gg
    ),
    calc AS (
      SELECT *,
             n_a::DOUBLE AS na, n_b::DOUBLE AS nb,
             sa::DOUBLE / n_a AS m1, sb::DOUBLE / n_b AS m2,
             CASE WHEN n_a >= 2 THEN
               (qa::DOUBLE - n_a * (sa::DOUBLE / n_a)
                                 * (sa::DOUBLE / n_a)) / (n_a - 1)
             END AS v1,
             CASE WHEN n_b >= 2 THEN
               (qb::DOUBLE - n_b * (sb::DOUBLE / n_b)
                                 * (sb::DOUBLE / n_b)) / (n_b - 1)
             END AS v2,
             n_a >= 2 AND n_b >= 2 AS ok
      FROM pairs
    ),
    calc2 AS (
      SELECT *,
             v1 / na + v2 / nb AS se2,
             ((na - 1) * v1 + (nb - 1) * v2) / (na + nb - 2) AS pooled
      FROM calc
    ),
    tt AS (
      SELECT *,
             CASE WHEN ok AND se2 > 0
                  THEN (m1 - m2) / sqrt(se2) END AS t
      FROM calc2
    ),
    pv AS (
      SELECT *,
             (1.0 / (1.0 + 0.3275911 * (abs(t) / sqrt(2.0)))) AS u
      FROM tt
    ),
    pp AS (
      SELECT *,
             u * (0.254829592 + u * (-0.284496736 + u * (1.421413741
               + u * (-1.453152027 + u * 1.061405429))))
               * exp(-(abs(t) / sqrt(2.0)) * (abs(t) / sqrt(2.0)))
               AS p
      FROM pv
    )
    SELECT group_a, group_b, n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
           round(CASE WHEN ok THEN m1 END, 9) AS mean_a,
           round(CASE WHEN ok THEN m2 END, 9) AS mean_b,
           round(t, 9) AS t,
           round(CASE WHEN ok AND se2 > 0
                 THEN se2 * se2
                      / ((v1 / na) * (v1 / na) / (na - 1)
                         + (v2 / nb) * (v2 / nb) / (nb - 1)) END, 9)
             AS df,
           round(CASE WHEN ok AND pooled > 0
                 THEN (m1 - m2) / sqrt(pooled) END, 9) AS cohens_d,
           round(p, 9) AS p_approx,
           m_pairs::BIGINT AS m_pairs,
           coalesce(p < 0.05, false) AS significant_raw,
           coalesce(p < 0.05 / m_pairs::DOUBLE, false)
             AS significant_bonferroni
    FROM pp
    """,
)
def pairwise_welch_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All C(5,2) pairwise Welch comparisons of event value between
    event types with Bonferroni control
    (operators.evaluation.pairwise_welch) — the post-hoc step after
    anova_value_event_types' omnibus: which type pairs differ, p_approx
    via the Abramowitz–Stegun erfc polynomial (identical literals both
    engines), raw vs α/m flags side by side."""
    from ..operators.evaluation import pairwise_welch

    ev = _t(spark, sf_dir, "events")
    return pairwise_welch(ev, "value", "event_type")


@_q(
    "emb_silhouette_fixed_cells",
    """
    WITH cents AS (
      SELECT j::INT AS j,
             list_transform(range(0, 64),
               i -> CASE WHEN i % 4 = j THEN 1.0 ELSE 0.0 END) AS c
      FROM (SELECT unnest(range(0, 4)) AS j)
    ), scored AS (
      SELECT e.vec_id, cents.j AS cell,
             round(list_sum(list_transform(range(0, 64),
               i -> (e.embedding[i+1]::DOUBLE - cents.c[i+1])
                    * (e.embedding[i+1]::DOUBLE - cents.c[i+1]))), 6)
               AS dist2
      FROM embeddings e CROSS JOIN cents
    ), own AS (
      SELECT vec_id, cell AS own_cell, dist2 AS a2
      FROM scored
      QUALIFY row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cell) = 1
    ), nb AS (
      SELECT s.vec_id, min(s.dist2) AS b2
      FROM scored s JOIN own o
        ON s.vec_id = o.vec_id AND s.cell != o.own_cell
      GROUP BY 1
    ), sil AS (
      SELECT o.own_cell AS cell,
             CAST(CASE WHEN greatest(sqrt(a2), sqrt(b2)) > 0
                  THEN (sqrt(b2) - sqrt(a2))
                       / greatest(sqrt(a2), sqrt(b2))
                  ELSE 0.0 END AS DECIMAL(28,12)) AS s
      FROM own o JOIN nb USING (vec_id)
    )
    SELECT cell::BIGINT AS cell, count(*)::BIGINT AS n,
           round(sum(s)::DOUBLE / count(*), 9) AS mean_silhouette
    FROM sil GROUP BY 1
    """,
)
def emb_silhouette_fixed_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette per cell over the four fixed axis-pattern
    centroids (operators.similarity.silhouette_simplified) — the
    clustering-quality number beside emb_assign_fixed_cells' assignment
    kernel: a = own-centroid distance, b = nearest-other, s = (b−a)/
    max(a,b).  Zero-shuffle scoring (broadcast centroid literals, staged
    distance array), one per-cell partial aggregate."""
    from ..operators.similarity import silhouette_simplified

    cents = [
        [1.0 if i % 4 == j else 0.0 for i in range(64)] for j in range(4)
    ]
    return silhouette_simplified(_t(spark, sf_dir, "embeddings"), cents)


_ZA = 1.959963984540054
_ZB = 0.8416212335729143


@_q(
    "ab_power_mde",
    f"""
    WITH u AS (
      SELECT CAST(user_id % 2 AS VARCHAR) AS v,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS y
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    per AS (SELECT v, count(*) AS n, sum(y) AS k FROM u GROUP BY 1),
    p AS (
      SELECT a.v AS variant_a, a.n AS n_a, a.k AS k_a,
             b.v AS variant_b, b.n AS n_b, b.k AS k_b
      FROM per a JOIN per b ON a.v < b.v
    ),
    c AS (
      SELECT *,
             k_a::DOUBLE / n_a::DOUBLE AS pa,
             k_b::DOUBLE / n_b::DOUBLE AS pb,
             (k_a + k_b)::DOUBLE / (n_a + n_b)::DOUBLE AS pool
      FROM p
    ),
    c2 AS (
      SELECT *,
             pool * (1.0 - pool) AS var,
             sqrt(pool * (1.0 - pool)
                  * (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE)) AS se,
             pa - pb AS d
      FROM c
    ),
    c3 AS (
      SELECT *, abs(d) / se - {_ZA!r} AS uu FROM c2
    ),
    c4 AS (
      SELECT *,
             (1.0 / (1.0 + 0.3275911 * (abs(uu) / sqrt(2.0)))) AS w
      FROM c3
    ),
    c5 AS (
      SELECT *,
             w * (0.254829592 + w * (-0.284496736 + w * (1.421413741
               + w * (-1.453152027 + w * 1.061405429))))
               * exp(-(abs(uu) / sqrt(2.0)) * (abs(uu) / sqrt(2.0)))
               AS e
      FROM c4
    )
    SELECT variant_a, variant_b,
           n_a::BIGINT AS n_a, k_a::BIGINT AS k_a,
           n_b::BIGINT AS n_b, k_b::BIGINT AS k_b,
           round(pa, 9) AS rate_a, round(pb, 9) AS rate_b,
           round(d, 9) AS diff, round(pool, 9) AS pooled,
           round(CASE WHEN se > 0
                 THEN {_ZA + _ZB!r} * se END, 9) AS mde_abs,
           round(CASE WHEN se > 0 AND pool != 0
                 THEN {_ZA + _ZB!r} * se / pool END, 9) AS mde_rel,
           round(CASE WHEN se > 0 AND d != 0 THEN
                 CASE WHEN uu >= 0 THEN 1.0 - e / 2.0
                      ELSE e / 2.0 END END, 9) AS posthoc_power,
           CASE WHEN var > 0 AND d != 0
                THEN ceil({(_ZA + _ZB) ** 2!r} * 2.0 * var
                          / (d * d))::BIGINT END
             AS n_per_arm_required
    FROM c5
    """,
)
def ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power / minimum-detectable-effect readout for the user-parity
    purchase experiment (operators.evaluation.proportion_power_mde) —
    the companion ab_purchase_rate_test can't give when not-significant:
    the absolute/relative MDE this sample could see, the post-hoc power
    at the observed difference (A–S Φ, identical literals both
    engines), and the per-arm n a conclusive rerun needs."""
    from ..operators.evaluation import proportion_power_mde

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select(
        (F.col("user_id") % 2).cast("string").alias("variant"),
        "converted",
    )
    return proportion_power_mde(users, "variant", "converted")


@_q(
    "pairwise_welch_bh_fdr",
    """
    WITH g AS (
      SELECT event_type AS gg, count(*) AS n,
             sum(CAST(value AS DECIMAL(28,12))) AS s,
             sum(CAST(value * value AS DECIMAL(28,12))) AS q
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1
    ),
    pairs AS (
      SELECT a.gg AS group_a, b.gg AS group_b,
             a.n AS n_a, b.n AS n_b,
             a.s AS sa, a.q AS qa, b.s AS sb, b.q AS qb
      FROM g a JOIN g b ON a.gg < b.gg
    ),
    calc AS (
      SELECT *,
             n_a::DOUBLE AS na, n_b::DOUBLE AS nb,
             sa::DOUBLE / n_a AS m1, sb::DOUBLE / n_b AS m2,
             CASE WHEN n_a >= 2 THEN
               (qa::DOUBLE - n_a * (sa::DOUBLE / n_a)
                                 * (sa::DOUBLE / n_a)) / (n_a - 1)
             END AS v1,
             CASE WHEN n_b >= 2 THEN
               (qb::DOUBLE - n_b * (sb::DOUBLE / n_b)
                                 * (sb::DOUBLE / n_b)) / (n_b - 1)
             END AS v2,
             n_a >= 2 AND n_b >= 2 AS ok
      FROM pairs
    ),
    tt AS (
      SELECT *,
             CASE WHEN ok AND v1 / na + v2 / nb > 0
                  THEN (m1 - m2) / sqrt(v1 / na + v2 / nb) END AS t
      FROM calc
    ),
    pv AS (
      SELECT *,
             (1.0 / (1.0 + 0.3275911 * (abs(t) / sqrt(2.0)))) AS u
      FROM tt
    ),
    sel AS (
      SELECT group_a, group_b,
             round(u * (0.254829592 + u * (-0.284496736
               + u * (1.421413741
               + u * (-1.453152027 + u * 1.061405429))))
               * exp(-(abs(t) / sqrt(2.0)) * (abs(t) / sqrt(2.0))), 9)
               AS p9
      FROM pv
    ),
    bh AS (
      SELECT *,
             row_number() OVER (ORDER BY p9 ASC NULLS LAST,
                                group_a, group_b) AS i,
             count(p9) OVER () AS m
      FROM sel
    ),
    qr AS (
      SELECT *, CASE WHEN p9 IS NOT NULL
                     THEN m::DOUBLE * p9 / i END AS qraw
      FROM bh
    ),
    qq AS (
      SELECT *,
             least(min(qraw) OVER (ORDER BY p9 ASC NULLS LAST,
                     group_a, group_b
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
                   1.0) AS q
      FROM qr
    )
    SELECT group_a, group_b, p9 AS p_approx,
           CASE WHEN p9 IS NOT NULL THEN i END::BIGINT AS rank_p,
           m::BIGINT AS m,
           round(CASE WHEN p9 IS NOT NULL THEN q END, 9) AS q_value,
           coalesce(CASE WHEN p9 IS NOT NULL THEN q END <= 0.05,
                    false) AS significant_bh
    FROM qq
    """,
)
def pairwise_welch_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR over the pairwise Welch p's
    (operators.evaluation.bh_adjust composing pairwise_welch) — the
    step-up q-values that replace Bonferroni when the comparison list
    grows: controls false-DISCOVERY rate instead of strangling power.
    Sort/suffix-min windows on the 10-pair hypotheses axis only."""
    from ..operators.evaluation import bh_adjust, pairwise_welch

    ev = _t(spark, sf_dir, "events")
    pw = pairwise_welch(ev, "value", "event_type").select(
        "group_a", "group_b", "p_approx"
    )
    return bh_adjust(pw, "p_approx", ["group_a", "group_b"])


@_q(
    "emb_davies_bouldin_fixed",
    """
    WITH cents AS (
      SELECT j::INT AS j,
             list_transform(range(0, 64),
               i -> CASE WHEN i % 4 = j THEN 1.0 ELSE 0.0 END) AS c
      FROM (SELECT unnest(range(0, 4)) AS j)
    ), scored AS (
      SELECT e.vec_id, cents.j AS cell,
             round(list_sum(list_transform(range(0, 64),
               i -> (e.embedding[i+1]::DOUBLE - cents.c[i+1])
                    * (e.embedding[i+1]::DOUBLE - cents.c[i+1]))), 6)
               AS dist2
      FROM embeddings e CROSS JOIN cents
    ), own AS (
      SELECT vec_id, cell, dist2 FROM scored
      QUALIFY row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cell) = 1
    ), sc AS (
      SELECT cell, count(*) AS n,
             sum(CAST(sqrt(dist2) AS DECIMAL(28,12)))::DOUBLE
               / count(*) AS s
      FROM own GROUP BY 1
    ), cd AS (
      SELECT a.j AS cell, b.j AS other,
             sqrt(round(list_sum(list_transform(range(0, 64),
               i -> (a.c[i+1] - b.c[i+1]) * (a.c[i+1] - b.c[i+1]))),
               6)) AS d
      FROM cents a JOIN cents b ON a.j != b.j
    )
    SELECT sc.cell::BIGINT AS cell, max(sc.n)::BIGINT AS n,
           round(max(sc.s), 9) AS scatter,
           round(max((sc.s + so.s) / cd.d), 9) AS r
    FROM sc
    JOIN cd ON sc.cell = cd.cell
    JOIN sc so ON so.cell = cd.other
    GROUP BY 1
    """,
)
def emb_davies_bouldin_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies–Bouldin per-cell ratios over the four fixed axis-pattern
    centroids (operators.similarity.davies_bouldin) — the k-chooser
    lens beside emb_silhouette_fixed_cells: worst-neighbour (sᵢ+sⱼ)/dᵢⱼ
    per cell, DB index = avg(r).  Zero-shuffle assignment scan + one
    per-cell aggregate; centroid distances are data-free literals."""
    from ..operators.similarity import davies_bouldin

    cents = [
        [1.0 if i % 4 == j else 0.0 for i in range(64)] for j in range(4)
    ]
    return davies_bouldin(_t(spark, sf_dir, "embeddings"), cents)


@_q(
    "levene_doclen_by_lang",
    """
    WITH base AS (
      SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v
      FROM documents
      WHERE lang IS NOT NULL AND n_chars IS NOT NULL
    ),
    vc AS (SELECT g, v, count(*) AS c FROM base GROUP BY 1, 2),
    med AS (
      SELECT g, min(v) AS med
      FROM (
        SELECT g, v,
               sum(c) OVER (PARTITION BY g ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(c) OVER (PARTITION BY g) AS tot
        FROM vc
      ) WHERE 2 * cum >= tot GROUP BY 1
    ),
    z AS (
      SELECT base.g AS gg, abs(base.v - med.med) AS zv
      FROM base JOIN med ON base.g = med.g
    ),
    grp AS (
      SELECT gg, count(*) AS n,
             sum(CAST(zv AS DECIMAL(28,12))) AS s,
             sum(CAST(zv * zv AS DECIMAL(28,12))) AS q
      FROM z GROUP BY 1
    ),
    agg AS (
      SELECT sum(n) AS nn, count(*) AS k, sum(s) AS ss, sum(q) AS qq,
             sum(CAST(s::DOUBLE * s::DOUBLE / n::DOUBLE
                      AS DECIMAL(28,12))) AS sq_over_n
      FROM grp
    ),
    calc AS (
      SELECT nn, k,
             CAST(round(sq_over_n, 6)
                  - round(CAST(ss::DOUBLE * ss::DOUBLE / nn::DOUBLE
                               AS DECIMAL(28,12)), 6)
                  AS DOUBLE) AS ssb,
             CAST(round(qq, 6) - round(sq_over_n, 6) AS DOUBLE)
               AS ssw,
             k >= 2 AND nn > k AS ok
      FROM agg
    )
    SELECT nn::BIGINT AS n, k::BIGINT AS k,
           (k - 1)::BIGINT AS df1, (nn - k)::BIGINT AS df2,
           round(CASE WHEN ok AND ssw > 0
                 THEN (ssb / (k::DOUBLE - 1))
                      / (ssw / (nn::DOUBLE - k::DOUBLE)) END, 9) AS w,
           round(CASE WHEN ok AND ssb + ssw != 0
                 THEN ssb / (ssb + ssw) END, 9) AS eta_squared
    FROM calc
    """,
)
def levene_doclen_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe variance-homogeneity test on document length
    across languages (operators.evaluation.levene_brown_forsythe) — the
    assumption check beside kw_doclen_by_lang / the pooled-variance
    family: are the SPREADS equal, asked via robust median-centered
    deviations (lower weighted median, integer comparisons)."""
    from ..operators.evaluation import levene_brown_forsythe

    docs = _t(spark, sf_dir, "documents")
    return levene_brown_forsythe(docs, "n_chars", "lang")


@_q(
    "ts_dominant_period",
    """
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts)::TIMESTAMP AS bk,
             CAST(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                  / count(*) AS DECIMAL(28,6)) AS m
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
        AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, m,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY bk) AS i,
             count(*) OVER (PARTITION BY event_type) AS n,
             m::DOUBLE
               - (sum(m) OVER (PARTITION BY event_type))::DOUBLE
                 / (count(*) OVER (PARTITION BY event_type))::DOUBLE
               AS d
      FROM b
    ),
    g AS (
      SELECT event_type, i, n, d, unnest(range(2, 49)) AS p
      FROM idx WHERE n >= 4
    ),
    per AS (
      SELECT event_type, p,
             sum(CAST(d * cos(6.283185307179586 * i::DOUBLE
                              / p::DOUBLE) AS DECIMAL(28,12))) AS c,
             sum(CAST(d * sin(6.283185307179586 * i::DOUBLE
                              / p::DOUBLE) AS DECIMAL(28,12))) AS s,
             max(n) AS n
      FROM g GROUP BY 1, 2
    ),
    pw AS (
      SELECT event_type, p,
             round((c::DOUBLE * c::DOUBLE + s::DOUBLE * s::DOUBLE)
                   / (n::DOUBLE * n::DOUBLE), 9) AS power
      FROM per
    )
    SELECT event_type, p::BIGINT AS period, power, rank::BIGINT AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY event_type
                ORDER BY power DESC, p ASC) AS rank
      FROM pw
    ) WHERE rank <= 3
    """,
)
def ts_dominant_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-period detection per event type over hourly buckets
    (operators.timeseries.dominant_period, candidates 2..48, top 3) —
    the periodogram scan that tells ts_seasonal_decompose /
    Holt–Winters WHICH period to use instead of assuming 24.  One
    corpus reduction; the projection grid is buckets × 47 candidates on
    the bucket axis, per-term products decimal-quantized."""
    from ..operators.timeseries import dominant_period

    ev = _t(spark, sf_dir, "events")
    return dominant_period(
        ev, ts="ts", value="value", dims=["event_type"], unit="hour",
        max_period=48, top_k=3,
    )


@_q(
    "join_audit_lineitem_orders",
    """
    WITH lc AS (
      SELECT l_orderkey AS k, count(*) AS cl FROM lineitem
      WHERE l_orderkey IS NOT NULL GROUP BY 1
    ),
    rc AS (
      SELECT o_orderkey AS k, count(*) AS cr FROM orders
      WHERE o_orderkey IS NOT NULL GROUP BY 1
    ),
    merged AS (SELECT * FROM lc FULL OUTER JOIN rc USING (k))
    SELECT coalesce(sum(cl), 0)::BIGINT AS n_left,
           coalesce(sum(cr), 0)::BIGINT AS n_right,
           count(cl)::BIGINT AS keys_left,
           count(cr)::BIGINT AS keys_right,
           sum(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL
               THEN 1 ELSE 0 END)::BIGINT AS keys_shared,
           sum(CASE WHEN cr IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS keys_left_only,
           sum(CASE WHEN cl IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS keys_right_only,
           coalesce(sum(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL
               THEN cl * cr END), 0)::BIGINT AS join_rows,
           coalesce(max(cl), 0)::BIGINT AS max_fanout_left,
           coalesce(max(cr), 0)::BIGINT AS max_fanout_right,
           coalesce(max(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL
               THEN cl * cr END), 0)::BIGINT AS max_key_product
    FROM merged
    """,
)
def join_audit_lineitem_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality audit of the flagship fact⋈fact pair
    (operators.profile.join_cardinality_audit on lineitem.l_orderkey ×
    orders.o_orderkey) — exact output rows, key overlap per side, and
    the worst single-key fanout (the straggler/salting candidate),
    priced at two key-count aggregates instead of the shuffle itself."""
    from ..operators.profile import join_cardinality_audit

    return join_cardinality_audit(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        "l_orderkey",
        "o_orderkey",
    )


@_q(
    "ts_rolling_corr_click_view",
    """
    WITH piv AS (
      SELECT date_trunc('day', ts)::TIMESTAMP AS bk,
             max(CASE WHEN event_type = 'click' THEN m END) AS x,
             max(CASE WHEN event_type = 'view' THEN m END) AS y
      FROM (
        SELECT event_type, date_trunc('day', ts) AS ts,
               CAST(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                    / count(*) AS DECIMAL(28,6)) AS m
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
          AND event_type IN ('click', 'view')
        GROUP BY 1, 2
      )
      GROUP BY 1
    ),
    j AS (SELECT * FROM piv WHERE x IS NOT NULL AND y IS NOT NULL),
    rolled AS (
      SELECT bk,
             count(*) OVER w AS n,
             round(sum(x) OVER w, 6) AS sx,
             round(sum(y) OVER w, 6) AS sy,
             round(sum(CAST(x::DOUBLE * y::DOUBLE AS DECIMAL(28,12)))
                   OVER w, 6) AS sxy,
             round(sum(CAST(x::DOUBLE * x::DOUBLE AS DECIMAL(28,12)))
                   OVER w, 6) AS sxx,
             round(sum(CAST(y::DOUBLE * y::DOUBLE AS DECIMAL(28,12)))
                   OVER w, 6) AS syy
      FROM j
      WINDOW w AS (ORDER BY bk ROWS BETWEEN 6 PRECEDING
                   AND CURRENT ROW)
    ),
    calc AS (
      SELECT bk, n,
             n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS num,
             n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS dx,
             n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS dy
      FROM rolled WHERE n = 7
    )
    SELECT bk AS bucket, n::BIGINT AS n_window,
           round(CASE WHEN dx > 0 AND dy > 0
                 THEN num / sqrt(dx * dy) END, 9) AS corr
    FROM calc
    """,
)
def ts_rolling_corr_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day Pearson correlation between the click and view
    daily mean-value series (operators.timeseries.rolling_correlation)
    — the time-resolved companion to ts_cross_correlation's one global
    number: shows WHEN two coupled metrics decoupled.  One pivoted
    bucket reduction; rolling sums on the merged bucket axis,
    round-6 decimal cuts before the double arithmetic."""
    from ..operators.timeseries import rolling_correlation

    ev = _t(spark, sf_dir, "events")
    return rolling_correlation(
        ev, ts="ts", value="value", series_col="event_type",
        series_a="click", series_b="view", unit="day", window=7,
    )


@_q(
    "trend_conversion_by_activity",
    """
    WITH u0 AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS y,
             count(*) AS ne
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      GROUP BY user_id
    ),
    u AS (
      SELECT y, ntile(5) OVER (ORDER BY ne, user_id) AS w FROM u0
    ),
    lv AS (
      SELECT w, count(*) AS n, sum(y) AS r FROM u GROUP BY 1
    ),
    agg AS (
      SELECT sum(n) AS nn, sum(r) AS rr, count(*) AS k,
             sum(w * n) AS swn, sum(w * r) AS swr,
             sum(w * w * n) AS sw2n
      FROM lv
    ),
    calc AS (
      SELECT nn, rr, k,
             nn::DOUBLE * swr::DOUBLE - rr::DOUBLE * swn::DOUBLE AS t,
             rr::DOUBLE * (nn::DOUBLE - rr::DOUBLE) AS a,
             nn::DOUBLE * sw2n::DOUBLE
               - swn::DOUBLE * swn::DOUBLE AS b
      FROM agg
    ),
    zz AS (
      SELECT *,
             CASE WHEN k >= 2 AND a > 0 AND b > 0
                  THEN t * sqrt(nn::DOUBLE) / sqrt(a * b) END AS z
      FROM calc
    )
    SELECT nn::BIGINT AS n, rr::BIGINT AS n_pos, k::BIGINT AS k_levels,
           round(z, 9) AS z,
           CASE WHEN z > 1.959963984540054 THEN 'increasing'
                WHEN z < -1.959963984540054 THEN 'decreasing'
                ELSE 'none' END AS direction,
           coalesce(abs(z) > 1.959963984540054, false) AS significant
    FROM zz
    """,
)
def trend_conversion_by_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage trend test: does purchase conversion RISE with
    user activity quintile (operators.evaluation.cochran_armitage_trend
    over ntile(5) activity scores) — one directed degree of freedom
    where a chi-square omnibus wastes k−1; the dose-response readout of
    the engagement funnel."""
    from ..operators.evaluation import cochran_armitage_trend

    ev = _t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
        F.count(F.lit(1)).alias("ne"),
    )
    scored = users.select(
        "converted",
        F.ntile(5)
        .over(Window.orderBy("ne", "user_id"))
        .alias("quintile"),
    )
    return cochran_armitage_trend(scored, "converted", "quintile")


@_q(
    "logrank_churn_by_parity",
    """
    WITH per_u AS (
      SELECT CAST(user_id % 2 AS VARCHAR) AS g,
             CASE WHEN min(ts) FILTER (WHERE event_type = 'error'
                         AND event_id % 5 = 0) IS NOT NULL
                  THEN date_diff('day', min(ts)::DATE,
                         min(ts) FILTER (WHERE event_type = 'error'
                           AND event_id % 5 = 0)::DATE)
                  ELSE date_diff('day', min(ts)::DATE,
                         (SELECT max(ts)::DATE FROM events)) END AS t,
             CASE WHEN min(ts) FILTER (WHERE event_type = 'error'
                         AND event_id % 5 = 0) IS NOT NULL
                  THEN 1 ELSE 0 END AS e
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    arms AS (
      SELECT g, n, ev,
             row_number() OVER (ORDER BY g) AS rk,
             count(*) OVER () AS narms
      FROM (SELECT g, count(*) AS n, sum(e) AS ev FROM per_u
            GROUP BY 1)
    ),
    ptg AS (
      SELECT t, g, sum(e) AS d, count(*) AS c FROM per_u GROUP BY 1, 2
    ),
    grid AS (
      SELECT ts.t, a.g, a.rk
      FROM (SELECT DISTINCT t FROM ptg) ts CROSS JOIN arms a
    ),
    filled AS (
      SELECT grid.t, grid.rk,
             coalesce(ptg.d, 0) AS d, coalesce(ptg.c, 0) AS c
      FROM grid LEFT JOIN ptg
        ON grid.t = ptg.t AND grid.g = ptg.g
    ),
    risky AS (
      SELECT t, rk, d,
             sum(c) OVER (PARTITION BY rk)
               - coalesce(sum(c) OVER (PARTITION BY rk ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS nat
      FROM filled
    ),
    per_t AS (
      SELECT t,
             sum(CASE WHEN rk = 1 THEN d ELSE 0 END) AS d1,
             sum(d) AS dt,
             sum(CASE WHEN rk = 1 THEN nat ELSE 0 END) AS n1,
             sum(nat) AS nt
      FROM risky GROUP BY 1 HAVING sum(d) >= 1
    ),
    terms AS (
      SELECT d1,
             CAST(dt::DOUBLE * (n1::DOUBLE / nt::DOUBLE)
                  AS DECIMAL(28,12)) AS e1,
             CASE WHEN nt > 1 THEN
               CAST(dt::DOUBLE * (n1::DOUBLE / nt::DOUBLE)
                    * (1 - n1::DOUBLE / nt::DOUBLE)
                    * (nt::DOUBLE - dt::DOUBLE) / (nt::DOUBLE - 1)
                    AS DECIMAL(28,12))
             ELSE CAST(0 AS DECIMAL(28,12)) END AS v
      FROM per_t
    ),
    sums AS (
      SELECT sum(d1) AS o1, sum(e1) AS e1, sum(v) AS v FROM terms
    ),
    wide AS (
      SELECT a.g AS group_a, b.g AS group_b,
             a.n AS n_a, b.n AS n_b,
             a.ev AS events_a, b.ev AS events_b, a.narms,
             sums.o1, sums.e1, sums.v
      FROM (SELECT * FROM arms WHERE rk = 1) a
      CROSS JOIN (SELECT * FROM arms WHERE rk = 2) b
      CROSS JOIN sums
    )
    SELECT CASE WHEN narms = 2 THEN group_a END AS group_a,
           CASE WHEN narms = 2 THEN group_b END AS group_b,
           n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
           events_a::BIGINT AS events_a, events_b::BIGINT AS events_b,
           round(CASE WHEN narms = 2 THEN e1::DOUBLE END, 9)
             AS expected_a,
           round(CASE WHEN narms = 2 AND v::DOUBLE > 0
                 THEN (o1::DOUBLE - e1::DOUBLE) / sqrt(v::DOUBLE)
                 END, 9) AS z,
           coalesce(abs(CASE WHEN narms = 2 AND v::DOUBLE > 0
                        THEN (o1::DOUBLE - e1::DOUBLE)
                             / sqrt(v::DOUBLE) END)
                    > 1.959963984540054, false) AS significant
    FROM wide
    """,
)
def logrank_churn_by_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test between the two user-parity arms' churn curves
    (operators.funnel.logrank_test over the same churn definition as
    retention_km_curve: first error event with event_id%5=0, censored
    at the corpus horizon) — the significance verdict two KM curves
    can't give, censoring respected.  Unit-level reduction; at-risk
    suffix sums on the full (time × arm) grid."""
    from ..operators.funnel import logrank_test

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    horizon = ev.agg(F.max(F.to_date("ts")).alias("h"))
    churn_ts = F.min(
        F.when(
            (F.col("event_type") == "error")
            & (F.col("event_id") % 5 == 0),
            F.col("ts"),
        )
    )
    per_u = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("_first"),
            F.to_date(churn_ts).alias("_churn"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            (F.col("user_id") % 2).cast("string").alias("arm"),
            F.when(
                F.col("_churn").isNotNull(),
                F.datediff("_churn", "_first"),
            )
            .otherwise(F.datediff("h", "_first"))
            .alias("duration"),
            F.when(F.col("_churn").isNotNull(), 1)
            .otherwise(0)
            .alias("churned"),
        )
    )
    return logrank_test(per_u, "duration", "churned", "arm")


@_q(
    "vocab_heaps_fit",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
               AS tok
      FROM documents
    ),
    per_doc AS (
      SELECT doc_id, count(*) AS nt FROM toks GROUP BY 1
    ),
    firsts AS (
      SELECT doc_id, count(*) AS nv
      FROM (SELECT tok, min(doc_id) AS doc_id FROM toks GROUP BY 1)
      GROUP BY 1
    ),
    walk AS (
      SELECT p.doc_id,
             sum(p.nt) OVER w AS n,
             sum(coalesce(f.nv, 0)) OVER w AS v
      FROM per_doc p LEFT JOIN firsts f USING (doc_id)
      WINDOW w AS (ORDER BY p.doc_id ROWS UNBOUNDED PRECEDING)
    ),
    xy AS (
      SELECT ln(n::DOUBLE) AS x, ln(v::DOUBLE) AS y, n, v
      FROM walk WHERE n > 0 AND v > 0
    ),
    agg AS (
      SELECT count(*) AS m, max(n) AS total_tokens,
             max(v) AS vocab_size,
             sum(CAST(x AS DECIMAL(28,12))) AS sx,
             sum(CAST(y AS DECIMAL(28,12))) AS sy,
             sum(CAST(x * y AS DECIMAL(28,12))) AS sxy,
             sum(CAST(x * x AS DECIMAL(28,12))) AS sxx,
             sum(CAST(y * y AS DECIMAL(28,12))) AS syy
      FROM xy
    ),
    calc AS (
      SELECT m, total_tokens, vocab_size,
             m::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS dx,
             m::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS dy,
             m::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS cov,
             sx::DOUBLE AS sxd, sy::DOUBLE AS syd
      FROM agg
    )
    SELECT m::BIGINT AS n_docs, total_tokens::BIGINT AS total_tokens,
           vocab_size::BIGINT AS vocab_size,
           round(CASE WHEN m >= 2 AND dx > 0 THEN cov / dx END, 9)
             AS beta,
           round(CASE WHEN m >= 2 AND dx > 0
                 THEN (syd - (cov / dx) * sxd) / m::DOUBLE END, 9)
             AS log_k,
           round(CASE WHEN m >= 2 AND dx > 0 AND dy > 0
                 THEN cov * cov / (dx * dy) END, 9) AS r_squared
    FROM calc
    """,
)
def vocab_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps' law vocabulary-growth fit over the documents corpus
    (operators.textstats.heaps_fit) — β ≈ 0.4–0.6 organic, near 0 =
    duplication/template flood, near 1 = OCR noise/ids-in-text; the
    corpus-level novelty tripwire beside vocab_zipf_fit's frequency
    head.  One token→first-doc reduction; cumulative walk on the doc
    axis; decimal-quantized regression sums."""
    from ..operators.textstats import heaps_fit

    return heaps_fit(_t(spark, sf_dir, "documents"))


@_q(
    "emb_calinski_harabasz_fixed",
    """
    WITH cents AS (
      SELECT j::INT AS j,
             list_transform(range(0, 64),
               i -> CASE WHEN i % 4 = j THEN 1.0 ELSE 0.0 END) AS c
      FROM (SELECT unnest(range(0, 4)) AS j)
    ), scored AS (
      SELECT e.vec_id, e.embedding, cents.j AS cell,
             round(list_sum(list_transform(range(0, 64),
               i -> (e.embedding[i+1]::DOUBLE - cents.c[i+1])
                    * (e.embedding[i+1]::DOUBLE - cents.c[i+1]))), 6)
               AS dist2
      FROM embeddings e CROSS JOIN cents
    ), own AS (
      SELECT vec_id, embedding, cell FROM scored
      QUALIFY row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cell) = 1
    ), sumsq AS (
      SELECT count(*) AS nn,
             sum(CAST(list_sum(list_transform(embedding,
               x -> x::DOUBLE * x::DOUBLE)) AS DECIMAL(28,12))) AS ssq
      FROM own
    ), per_dim AS (
      SELECT cell, p,
             sum(CAST(x AS DECIMAL(28,12))) AS s, count(*) AS c
      FROM (
        SELECT cell, unnest(range(1, 65)) AS p,
               embedding[unnest(range(1, 65))]::DOUBLE AS x
        FROM own
      )
      GROUP BY 1, 2
    ), nm2 AS (
      SELECT sum(CAST(s::DOUBLE * s::DOUBLE / c::DOUBLE
                      AS DECIMAL(28,12))) AS nm2,
             count(DISTINCT cell) AS k
      FROM per_dim
    ), gm AS (
      SELECT sum(CAST(ts::DOUBLE * ts::DOUBLE / tc::DOUBLE
                      AS DECIMAL(28,12))) AS gm2
      FROM (SELECT p, sum(s) AS ts, sum(c) AS tc FROM per_dim
            GROUP BY 1)
    ), calc AS (
      SELECT nn, k,
             CAST(round(ssq, 6) - round(nm2, 6) AS DOUBLE) AS ssw,
             CAST(round(nm2, 6) - round(gm2, 6) AS DOUBLE) AS ssb,
             k >= 2 AND nn > k AS ok
      FROM sumsq CROSS JOIN nm2 CROSS JOIN gm
    )
    SELECT nn::BIGINT AS n, k::BIGINT AS k_cells,
           round(CASE WHEN ok THEN ssb END, 9) AS ss_between,
           round(CASE WHEN ok THEN ssw END, 9) AS ss_within,
           round(CASE WHEN ok AND ssw > 0
                 THEN (ssb / (k::DOUBLE - 1))
                      / (ssw / (nn::DOUBLE - k::DOUBLE)) END, 9) AS ch
    FROM calc
    """,
)
def emb_calinski_harabasz_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calinski–Harabasz variance-ratio index over the four fixed
    axis-pattern cells (operators.similarity.calinski_harabasz) — the
    elbow-plot k-chooser completing the silhouette / Davies–Bouldin
    triad; cluster centers are the DATA means of each assigned cell,
    one scan + dims-axis arithmetic, round-6 decimal cuts on the three
    moment totals."""
    from ..operators.similarity import calinski_harabasz

    cents = [
        [1.0 if i % 4 == j else 0.0 for i in range(64)] for j in range(4)
    ]
    return calinski_harabasz(_t(spark, sf_dir, "embeddings"), cents)


@_q(
    "kappa_weighted_length_deciles",
    """
    WITH scored AS (
      SELECT ntile(10) OVER (ORDER BY n_chars, doc_id) AS a,
             ntile(10) OVER (
               ORDER BY length(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g'))
                 - length(replace(regexp_replace(lower(text),
                     '[^a-z0-9]+', ' ', 'g'), ' ', '')),
               doc_id) AS b
      FROM documents
      WHERE n_chars IS NOT NULL AND text IS NOT NULL
    ),
    joint AS (SELECT a, b, count(*) AS o FROM scored GROUP BY 1, 2),
    obs AS (
      SELECT sum(o) AS n,
             coalesce(sum(CAST((a - b) * (a - b) * o
                              AS DECIMAL(38,0))), 0) AS onum
      FROM joint
    ),
    ma AS (SELECT a, sum(o) AS cma FROM joint GROUP BY 1),
    mb AS (SELECT b, sum(o) AS cmb FROM joint GROUP BY 1),
    grid AS (
      SELECT coalesce(sum(CAST((a - b) * (a - b)
               * CAST(cma AS DECIMAL(38,0)) * cmb
               AS DECIMAL(38,0))), 0) AS enum_
      FROM ma CROSS JOIN mb
    )
    SELECT 'n_chars_decile' AS col_a, 'token_proxy_decile' AS col_b,
           n::BIGINT AS n,
           round(CASE WHEN enum_::DOUBLE != 0
                 THEN 1.0 - n::DOUBLE * onum::DOUBLE / enum_::DOUBLE
                 END, 9) AS kappa_w
    FROM obs CROSS JOIN grid
    """,
)
def kappa_weighted_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadratic-weighted Cohen's κ between two ordinal "length raters"
    — the char-count decile vs a whitespace-token-count-proxy decile of
    each document (operators.profile.weighted_kappa, Fleiss–Cohen
    quadratic weights) — near-miss decile disagreements cost (i−j)², so
    two measures of the same construct score the high agreement plain κ
    would throw away.  One confusion groupBy; the expected term covers
    the full level grid."""
    from ..operators.profile import weighted_kappa

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("text").isNotNull()
    )
    # token-count proxy: spaces left after collapsing non-alnum runs —
    # a second, independent "length rater" on a deliberately different
    # measurement path than n_chars
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
    tok_proxy = F.length(norm) - F.length(
        F.replace(norm, F.lit(" "), F.lit(""))
    )
    scored = docs.select(
        F.ntile(10)
        .over(Window.orderBy("n_chars", "doc_id"))
        .alias("chars_decile"),
        F.ntile(10)
        .over(Window.orderBy(tok_proxy, F.col("doc_id")))
        .alias("tokens_decile"),
    )
    return weighted_kappa(
        scored, "chars_decile", "tokens_decile", power=2
    ).select(
        F.lit("n_chars_decile").alias("col_a"),
        F.lit("token_proxy_decile").alias("col_b"),
        "n",
        "kappa_w",
    )


@_q(
    "keep_rate_eb_shrunk_by_source",
    f"""
    WITH g AS ({ORACLES["text_gopher_flags"]}),
    p AS (
      SELECT d.source AS grp,
             CASE WHEN gk.gopher_keep THEN 1 ELSE 0 END AS y
      FROM g gk JOIN documents d USING (doc_id)
      WHERE d.source IS NOT NULL AND gk.gopher_keep IS NOT NULL
    ),
    per AS (SELECT grp, count(*) AS n, sum(y) AS k FROM p GROUP BY 1),
    prior AS (
      SELECT count(*) AS m,
             sum(CAST(k::DOUBLE / n::DOUBLE AS DECIMAL(28,12))) AS sp,
             sum(CAST((k::DOUBLE / n::DOUBLE)
                      * (k::DOUBLE / n::DOUBLE)
                      AS DECIMAL(28,12))) AS sp2
      FROM per
    ),
    fit AS (
      SELECT m, sp::DOUBLE / m::DOUBLE AS mu,
             CASE WHEN m >= 2 THEN
               (sp2::DOUBLE - m::DOUBLE
                 * (sp::DOUBLE / m::DOUBLE)
                 * (sp::DOUBLE / m::DOUBLE)) / (m::DOUBLE - 1)
             END AS var
      FROM prior
    ),
    ab AS (
      SELECT CASE WHEN m >= 2 AND var > 0
                  AND var < mu * (1 - mu) AND mu > 0 AND mu < 1
                  THEN mu * (mu * (1 - mu) / var - 1) END AS alpha,
             CASE WHEN m >= 2 AND var > 0
                  AND var < mu * (1 - mu) AND mu > 0 AND mu < 1
                  THEN (1 - mu) * (mu * (1 - mu) / var - 1) END
               AS beta
      FROM fit
    )
    SELECT grp AS "group", n::BIGINT AS n, k::BIGINT AS k,
           round(k::DOUBLE / n::DOUBLE, 9) AS rate_raw,
           round((k::DOUBLE + alpha)
                 / (n::DOUBLE + alpha + beta), 9) AS rate_shrunk,
           round(alpha, 9) AS alpha, round(beta, 9) AS beta
    FROM per CROSS JOIN ab
    """,
)
def keep_rate_eb_shrunk_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Empirical-Bayes shrunk per-source Gopher keep-rates
    (operators.evaluation.eb_shrunk_rates) — the leaderboard fix beside
    keep_rate_wilson_ci's error bars: a 3-doc source at 100% stops
    outranking a 10k-doc source at 92% once every rate shrinks toward
    the method-of-moments beta prior by its own evidence."""
    from ..operators.evaluation import eb_shrunk_rates
    from ..operators.textstats import gopher_quality_flags

    docs = _t(spark, sf_dir, "documents")
    flags = gopher_quality_flags(docs).select("doc_id", "gopher_keep")
    joined = flags.join(docs.select("doc_id", "source"), "doc_id")
    return eb_shrunk_rates(joined, "gopher_keep", "source")


@_q(
    "vocab_jaccard_sources",
    """
    WITH vocab AS (
      SELECT DISTINCT source AS g,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
               AS tok
      FROM documents
      WHERE source IS NOT NULL AND text IS NOT NULL
    ),
    sizes AS (SELECT g, count(*) AS v FROM vocab GROUP BY 1),
    inter AS (
      SELECT a.g AS group_a, b.g AS group_b, count(*) AS i
      FROM vocab a JOIN vocab b
        ON a.tok = b.tok AND a.g < b.g
      GROUP BY 1, 2
    ),
    grid AS (
      SELECT sa.g AS group_a, sb.g AS group_b,
             sa.v AS vocab_a, sb.v AS vocab_b,
             coalesce(inter.i, 0) AS i
      FROM sizes sa
      JOIN sizes sb ON sa.g < sb.g
      LEFT JOIN inter
        ON inter.group_a = sa.g AND inter.group_b = sb.g
    )
    SELECT group_a, group_b,
           vocab_a::BIGINT AS vocab_a, vocab_b::BIGINT AS vocab_b,
           i::BIGINT AS intersection,
           round(CASE WHEN vocab_a + vocab_b - i != 0
                 THEN i::DOUBLE / (vocab_a + vocab_b - i)::DOUBLE
                 END, 9) AS jaccard
    FROM grid
    """,
)
def vocab_jaccard_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between the 20 sources
    (operators.textstats.vocab_jaccard_matrix) — the cross-source
    redundancy map document-level dedup can't see: two crawls sharing
    no duplicate docs but the same vocabulary mark where near-dup
    thresholds tighten and mixture weights double-count.  One distinct
    (source, token) reduction; token-axis self-join with C(G,2)-bounded
    per-token fanout."""
    from ..operators.textstats import vocab_jaccard_matrix

    return vocab_jaccard_matrix(_t(spark, sf_dir, "documents"))


@_q(
    "retention_na_hazard",
    """
    WITH per_u AS (
      SELECT user_id,
             CASE WHEN min(ts) FILTER (WHERE event_type = 'error'
                         AND event_id % 5 = 0) IS NOT NULL
                  THEN date_diff('day', min(ts)::DATE,
                         min(ts) FILTER (WHERE event_type = 'error'
                           AND event_id % 5 = 0)::DATE)
                  ELSE date_diff('day', min(ts)::DATE,
                         (SELECT max(ts)::DATE FROM events)) END AS t,
             CASE WHEN min(ts) FILTER (WHERE event_type = 'error'
                         AND event_id % 5 = 0) IS NOT NULL
                  THEN 1 ELSE 0 END AS e
      FROM events GROUP BY 1
    ),
    per_t AS (
      SELECT t, sum(e) AS d, count(*) AS rows_ FROM per_u GROUP BY 1
    ),
    tot AS (SELECT sum(rows_) AS total FROM per_t),
    staged AS (
      SELECT t, d,
             total - coalesce(sum(rows_) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS nat
      FROM per_t, tot
    ),
    inc AS (
      SELECT t, d, nat,
             CAST(d::DOUBLE / nat::DOUBLE AS DECIMAL(28,12)) AS h,
             CAST(d::DOUBLE / (nat::DOUBLE * nat::DOUBLE)
                  AS DECIMAL(28,12)) AS v
      FROM staged
    ),
    cum AS (
      SELECT t, nat, d, h,
             sum(h) OVER w AS cumh, sum(v) OVER w AS cumv
      FROM inc
      WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)
    )
    SELECT t::BIGINT AS t, nat::BIGINT AS n_at_risk,
           d::BIGINT AS n_events,
           round(h::DOUBLE, 9) AS hazard,
           round(cumh::DOUBLE, 9) AS cum_hazard,
           round(cumv::DOUBLE, 9) AS var_cum_hazard,
           round(CAST(CAST(exp(-(cumh::DOUBLE)) AS DECIMAL(28,12))
                 AS DOUBLE), 9) AS fh_survival
    FROM cum
    """,
)
def retention_na_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative churn hazard over the same censored
    durations as retention_km_curve
    (operators.funnel.nelson_aalen_hazard) — the rate view beside KM's
    probability view: where H(t) steepens is when users leave, and
    log-H linearity is the Weibull-shape diagnostic.  One per-duration
    reduction; time-axis windows only."""
    from ..operators.funnel import nelson_aalen_hazard

    ev = _t(spark, sf_dir, "events")
    horizon = ev.agg(F.max(F.to_date("ts")).alias("h"))
    churn_ts = F.min(
        F.when(
            (F.col("event_type") == "error")
            & (F.col("event_id") % 5 == 0),
            F.col("ts"),
        )
    )
    per_u = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("_first"),
            F.to_date(churn_ts).alias("_churn"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("_churn").isNotNull(),
                F.datediff("_churn", "_first"),
            )
            .otherwise(F.datediff("h", "_first"))
            .alias("duration"),
            F.when(F.col("_churn").isNotNull(), 1)
            .otherwise(0)
            .alias("event"),
        )
    )
    return nelson_aalen_hazard(per_u, "duration", "event")


@_q(
    "ts_interarrival_expfit",
    """
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER w AS dt
      FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    g AS (SELECT event_type, dt FROM gaps WHERE dt IS NOT NULL),
    vc AS (
      SELECT event_type, dt, count(*) AS c FROM g GROUP BY 1, 2
    ),
    staged AS (
      SELECT event_type, dt, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY dt
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS n,
             sum(dt * c) OVER (PARTITION BY event_type) AS s
      FROM vc
    ),
    dev AS (
      SELECT event_type, n, s,
             CAST(cum::DOUBLE / n::DOUBLE
               - (1.0 - exp(-(1000000.0 * n::DOUBLE / s::DOUBLE)
                            * (dt::DOUBLE / 1000000.0)))
               AS DECIMAL(28,12)) AS hi,
             CAST((1.0 - exp(-(1000000.0 * n::DOUBLE / s::DOUBLE)
                             * (dt::DOUBLE / 1000000.0)))
               - (cum - c)::DOUBLE / n::DOUBLE
               AS DECIMAL(28,12)) AS lo
      FROM staged
    ),
    per AS (
      SELECT event_type, max(n) AS ng, max(s) AS sg,
             greatest(max(abs(hi)), max(abs(lo))) AS d
      FROM dev GROUP BY 1
    )
    SELECT event_type, ng::BIGINT AS n_gaps,
           round(sg::DOUBLE / 1000000.0 / ng::DOUBLE, 9) AS mean_gap_s,
           round(1000000.0 * ng::DOUBLE / sg::DOUBLE, 9) AS rate_per_s,
           round(d::DOUBLE, 9) AS d_stat,
           d::DOUBLE > 1.3581 / sqrt(ng::DOUBLE)
             AS reject_exponential
    FROM per
    """,
)
def ts_interarrival_expfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival exponential fit + KS goodness-of-fit per event
    type (operators.timeseries.interarrival_expfit) — the "is this
    stream Poisson" capacity check: λ from microsecond-exact gaps, the
    worst CDF gap against Exponential(λ) on the distinct-gap axis;
    reject marks bursty/batched traffic where Poisson sizing lies."""
    from ..operators.timeseries import interarrival_expfit

    ev = _t(spark, sf_dir, "events")
    return interarrival_expfit(
        ev, ts="ts", dims=["event_type"], tiebreak="event_id"
    )


@_q(
    "retention_survival_summary",
    f"""
    WITH curve AS ({ORACLES["retention_km_curve"]}),
    hz AS (SELECT max(t) AS h FROM curve),
    staged AS (
      SELECT c.*, hz.h,
             lead(t) OVER (ORDER BY t) AS tnext,
             min(t) OVER () AS first_t
      FROM curve c CROSS JOIN hz
    ),
    seg AS (
      SELECT *,
             CAST(survival * greatest(
               least(coalesce(tnext::DOUBLE, h::DOUBLE), h::DOUBLE)
                 - t::DOUBLE, 0.0) AS DECIMAL(28,12)) AS area,
             least(first_t::DOUBLE, h::DOUBLE) AS head
      FROM staged
    )
    SELECT sum(n_events + n_censored)::BIGINT AS n,
           sum(n_events)::BIGINT AS n_events,
           max(h)::BIGINT AS horizon,
           min(CASE WHEN survival <= 0.5 THEN t END)::BIGINT
             AS median_survival,
           round(max(head)
                 + coalesce(sum(area),
                            CAST(0 AS DECIMAL(28,12)))::DOUBLE, 9)
             AS rmst
    FROM seg
    """,
)
def retention_survival_summary(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Median survival and restricted mean survival time over the KM
    churn curve (operators.funnel.survival_summary, default horizon =
    max observed duration) — the two scalars every retention review
    asks the curve for: when half the cohort has churned (NULL while
    most survive), and how many retained days a signup buys within the
    horizon (exact step-function integral, censoring-safe)."""
    from ..operators.funnel import survival_summary

    ev = _t(spark, sf_dir, "events")
    horizon_df = ev.agg(F.max(F.to_date("ts")).alias("h"))
    churn_ts = F.min(
        F.when(
            (F.col("event_type") == "error")
            & (F.col("event_id") % 5 == 0),
            F.col("ts"),
        )
    )
    per_u = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("_first"),
            F.to_date(churn_ts).alias("_churn"),
        )
        .crossJoin(F.broadcast(horizon_df))
        .select(
            F.when(
                F.col("_churn").isNotNull(),
                F.datediff("_churn", "_first"),
            )
            .otherwise(F.datediff("h", "_first"))
            .alias("duration"),
            F.when(F.col("_churn").isNotNull(), 1)
            .otherwise(0)
            .alias("event"),
        )
    )
    return survival_summary(per_u, "duration", "event")


@_q(
    "emb_cells_vs_labels_ari",
    """
    WITH cents AS (
      SELECT j::INT AS j,
             list_transform(range(0, 64),
               i -> CASE WHEN i % 4 = j THEN 1.0 ELSE 0.0 END) AS c
      FROM (SELECT unnest(range(0, 4)) AS j)
    ), scored AS (
      SELECT e.vec_id, e.label, cents.j AS cell,
             round(list_sum(list_transform(range(0, 64),
               i -> (e.embedding[i+1]::DOUBLE - cents.c[i+1])
                    * (e.embedding[i+1]::DOUBLE - cents.c[i+1]))), 6)
               AS dist2
      FROM embeddings e CROSS JOIN cents
      WHERE e.label IS NOT NULL
    ), own AS (
      SELECT vec_id, CAST(label AS VARCHAR) AS lab, cell FROM scored
      QUALIFY row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cell) = 1
    ), joint AS (
      SELECT cell, lab, count(*) AS n FROM own GROUP BY 1, 2
    ), cells AS (SELECT cell, sum(n) AS a FROM joint GROUP BY 1),
    labs AS (SELECT lab, sum(n) AS b FROM joint GROUP BY 1),
    maj AS (
      SELECT sum(m) AS pur FROM (
        SELECT cell, max(n) AS m FROM joint GROUP BY 1)
    ),
    s AS (
      SELECT (SELECT sum(n) FROM joint) AS nn,
             (SELECT sum(CAST(n * (n - 1) / 2 AS DECIMAL(38,0)))
              FROM joint) AS sij,
             (SELECT count(*) FROM cells) AS k_cells,
             (SELECT sum(CAST(a * (a - 1) / 2 AS DECIMAL(38,0)))
              FROM cells) AS sa,
             (SELECT count(*) FROM labs) AS k_labels,
             (SELECT sum(CAST(b * (b - 1) / 2 AS DECIMAL(38,0)))
              FROM labs) AS sb,
             (SELECT pur FROM maj) AS pur
    ),
    calc AS (
      SELECT *,
             sa::DOUBLE * sb::DOUBLE
               / ((nn * (nn - 1) / 2)::DOUBLE) AS e,
             (sa::DOUBLE + sb::DOUBLE) / 2.0 AS mx
      FROM s
    )
    SELECT nn::BIGINT AS n, k_cells::BIGINT AS k_cells,
           k_labels::BIGINT AS k_labels,
           round(pur::DOUBLE / nn::DOUBLE, 9) AS purity,
           round(CASE WHEN mx - e != 0
                 THEN (sij::DOUBLE - e) / (mx - e) END, 9) AS ari
    FROM calc
    """,
)
def emb_cells_vs_labels_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External clustering validation: weighted purity and exact
    pair-counting Adjusted Rand Index between the four fixed cells and
    the embeddings' stored labels
    (operators.similarity.clustering_label_agreement) — the judge the
    internal silhouette/DB/CH triad can't be when ground truth exists;
    integer combinatorics end-to-end."""
    from ..operators.similarity import clustering_label_agreement

    cents = [
        [1.0 if i % 4 == j else 0.0 for i in range(64)] for j in range(4)
    ]
    return clustering_label_agreement(
        _t(spark, sf_dir, "embeddings"), cents
    )


# --------------------------------------------------------------------------
# Round 9 — classical-statistics widening: independence / normality /
# concordance / robust effect sizes / regression inference
# --------------------------------------------------------------------------
#: Shared A–S erfc polynomial tail (uu must be defined in the enclosing
#: CTE): w-substitution + Horner literals, identical to
#: operators.evaluation._norm_p_two_sided.
_AS_POLY = """
             (1.0 / (1.0 + 0.3275911 * (abs(uu) / sqrt(2.0)))) AS w
"""
_AS_E = """
             w * (0.254829592 + w * (-0.284496736 + w * (1.421413741
               + w * (-1.453152027 + w * 1.061405429))))
               * exp(-(abs(uu) / sqrt(2.0)) * (abs(uu) / sqrt(2.0)))
               AS e
"""


@_q(
    "chi2_lang_source",
    f"""
    WITH cells AS (
      SELECT lang AS a, source AS b, count(*) AS o
      FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
      GROUP BY 1, 2
    ),
    rows_ AS (SELECT a, sum(o) AS r FROM cells GROUP BY 1),
    cols_ AS (SELECT b, sum(o) AS c FROM cells GROUP BY 1),
    tot AS (SELECT sum(o) AS n, count(DISTINCT a) AS nr,
                   count(DISTINCT b) AS nc FROM cells),
    terms AS (
      SELECT n, nr, nc,
             CAST((o::HUGEINT * n::HUGEINT - r::HUGEINT * c::HUGEINT)::DOUBLE
                  * (o::HUGEINT * n::HUGEINT - r::HUGEINT * c::HUGEINT)::DOUBLE
                  / (r::HUGEINT * c::HUGEINT * n::HUGEINT)::DOUBLE
                  AS DECIMAL(28,12)) AS t
      FROM cells JOIN rows_ USING (a) JOIN cols_ USING (b) CROSS JOIN tot
    ),
    agg AS (
      SELECT max(n) AS n, max(nr) AS r, max(nc) AS c,
             sum(t)::DOUBLE AS chi2
      FROM terms
    ),
    zc AS (
      SELECT *, ((r - 1) * (c - 1))::DOUBLE AS k FROM agg
    ),
    z1 AS (
      SELECT *,
             (cbrt(chi2 / k) - (1.0 - 2.0 / (9.0 * k)))
               / sqrt(2.0 / (9.0 * k)) AS uu
      FROM zc
    ),
    z2 AS (SELECT *, {_AS_POLY.strip()} FROM z1),
    z3 AS (SELECT *, {_AS_E.strip()} FROM z2)
    SELECT n::BIGINT AS n, r::BIGINT AS r, c::BIGINT AS c,
           ((r - 1) * (c - 1))::BIGINT AS dof,
           round(CASE WHEN k > 0 THEN chi2 END, 9) AS chi2,
           round(CASE WHEN k > 0 THEN
             sqrt(chi2 / (n::DOUBLE * least(r - 1, c - 1)::DOUBLE)) END, 9)
             AS cramers_v,
           round(CASE WHEN k > 0 THEN
             CASE WHEN uu >= 0 THEN e / 2.0 ELSE 1.0 - e / 2.0 END END, 9)
             AS p_approx
    FROM z3
    """,
)
def chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of the documents' lang × source
    contingency table (operators.evaluation.chi2_independence) — the
    omnibus "is language composition source-dependent" screen with
    Cramér's V effect size and Wilson–Hilferty closed-form p.  Per-cell
    terms form from exact integers ((O·N − R·C)²/(R·C·N)); marginals
    derive from the cells-axis aggregate, never a second corpus scan."""
    from ..operators.evaluation import chi2_independence

    return chi2_independence(
        _t(spark, sf_dir, "documents"), "lang", "source"
    )


@_q(
    "jarque_bera_value",
    """
    WITH s AS (
      SELECT event_type AS g, round(value * 100.0, 0)::BIGINT AS sv
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    sums AS (
      SELECT g, count(*) AS n, sum(sv)::HUGEINT AS t FROM s GROUP BY 1
    ),
    u AS (
      SELECT s.g, sums.n,
             (sums.n::HUGEINT * sv::HUGEINT - t)::DOUBLE
               / (sums.n::DOUBLE * 100.0) AS u
      FROM s JOIN sums USING (g)
    ),
    m AS (
      SELECT g, max(n) AS n,
             sum(CAST(u * u AS DECIMAL(38,12)))::DOUBLE / max(n) AS m2,
             sum(CAST(u * u * u AS DECIMAL(38,12)))::DOUBLE / max(n) AS m3,
             sum(CAST(u * u * u * u AS DECIMAL(38,12)))::DOUBLE / max(n)
               AS m4
      FROM u GROUP BY g
    ),
    jb AS (
      SELECT g, n, m3 / pow(m2, 1.5) AS sk, m4 / (m2 * m2) - 3.0 AS kx,
             (n >= 8 AND m2 > 0) AS ok
      FROM m
    )
    SELECT g AS "group", n::BIGINT AS n,
           round(CASE WHEN ok THEN sk END, 9) AS skewness,
           round(CASE WHEN ok THEN kx END, 9) AS ex_kurtosis,
           round(CASE WHEN ok THEN
             n / 6.0 * (sk * sk + kx * kx / 4.0) END, 9) AS jb,
           round(CASE WHEN ok THEN
             exp(-(n / 6.0 * (sk * sk + kx * kx / 4.0)) / 2.0) END, 9)
             AS p_value
    FROM jb
    """,
)
def jarque_bera_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality test of the event value column per type
    (operators.evaluation.jarque_bera) — the closed-form-p χ²(2)
    skewness+kurtosis gate run before trusting any t/F machinery on the
    metric.  Central moments ride exact integers (d = n·s − Σs per row,
    no per-row double→decimal cast); heavy-tailed synthetic values
    reject hard, which is the point."""
    from ..operators.evaluation import jarque_bera

    return jarque_bera(_t(spark, sf_dir, "events"), "value", "event_type")


@_q(
    "kendall_tau_len_tokens",
    """
    WITH base AS (
      SELECT n_chars::DOUBLE AS x,
             len(regexp_extract_all(lower(text), '[a-z0-9]+'))::DOUBLE AS y
      FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL
    ),
    ext AS (SELECT min(x) AS xlo, max(x) AS xhi,
                   min(y) AS ylo, max(y) AS yhi FROM base),
    binned AS (
      SELECT CASE WHEN xhi > xlo THEN
               least(19, floor((x - xlo) / ((xhi - xlo) / 20.0))::INT)
             ELSE 0 END AS bx,
             CASE WHEN yhi > ylo THEN
               least(19, floor((y - ylo) / ((yhi - ylo) / 20.0))::INT)
             ELSE 0 END AS by_
      FROM base CROSS JOIN ext
    ),
    cells AS (SELECT bx, by_, count(*) AS n FROM binned GROUP BY 1, 2),
    orient AS (
      SELECT sign((c2.bx - c1.bx)::DOUBLE) * sign((c2.by_ - c1.by_)::DOUBLE)
               AS sg,
             c1.n::HUGEINT * c2.n::HUGEINT AS w
      FROM cells c1 CROSS JOIN cells c2
      WHERE c1.bx != c2.bx OR c1.by_ != c2.by_
    ),
    cd AS (
      SELECT (sum(CASE WHEN sg > 0 THEN w ELSE 0 END) / 2)::HUGEINT AS conc,
             (sum(CASE WHEN sg < 0 THEN w ELSE 0 END) / 2)::HUGEINT AS disc
      FROM orient
    ),
    xt AS (
      SELECT sum(t * (t - 1) // 2)::HUGEINT AS nx, sum(t)::HUGEINT AS ntot
      FROM (SELECT sum(n)::HUGEINT AS t FROM cells GROUP BY bx)
    ),
    yt AS (
      SELECT sum(t * (t - 1) // 2)::HUGEINT AS ny
      FROM (SELECT sum(n)::HUGEINT AS t FROM cells GROUP BY by_)
    ),
    f AS (SELECT * FROM cd CROSS JOIN xt CROSS JOIN yt)
    SELECT ntot::BIGINT AS n, CAST(20 AS BIGINT) AS bins,
           conc::BIGINT AS concordant, disc::BIGINT AS discordant,
           round(CASE WHEN (ntot * (ntot - 1) // 2 - nx) > 0
                       AND (ntot * (ntot - 1) // 2 - ny) > 0 THEN
             (conc - disc)::DOUBLE
             / (sqrt((ntot * (ntot - 1) // 2 - nx)::DOUBLE)
                * sqrt((ntot * (ntot - 1) // 2 - ny)::DOUBLE)) END, 9)
             AS tau_b
    FROM f
    """,
)
def kendall_tau_len_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b concordance between document char length and token
    count on a 20×20 equal-width binned grid
    (operators.evaluation.kendall_tau_binned) — P(concordant) −
    P(discordant) with tie corrections, all pair orientation counting on
    the ≤400-cell aggregate (broadcast), never the corpus."""
    from ..operators.evaluation import kendall_tau_binned
    from ..operators.textstats import token_count

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("n_chars").isNotNull() & F.col("text").isNotNull())
        .select(
            F.col("n_chars").alias("x"),
            token_count("text").alias("y"),
        )
    )
    return kendall_tau_binned(docs, "x", "y", bins=20)


@_q(
    "cliffs_delta_doclen",
    """
    WITH base AS (
      SELECT source AS g, n_chars::DOUBLE AS v FROM documents
      WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL
    ),
    arms AS (
      SELECT g, n, row_number() OVER (ORDER BY g) AS rk,
             count(*) OVER () AS narms
      FROM (SELECT g, count(*) AS n FROM base GROUP BY 1)
    ),
    vc AS (
      SELECT v,
             sum(CASE WHEN rk = 1 THEN c ELSE 0 END)::BIGINT AS ca,
             sum(CASE WHEN rk = 2 THEN c ELSE 0 END)::BIGINT AS cb
      FROM (SELECT v, g, count(*) AS c FROM base GROUP BY 1, 2)
      JOIN arms USING (g) GROUP BY v
    ),
    cum AS (
      SELECT ca, cb,
             coalesce(sum(cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS blt,
             sum(cb) OVER () - cb
               - coalesce(sum(cb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS bgt
      FROM vc
    ),
    num AS (
      SELECT sum(ca::HUGEINT * (blt - bgt)::HUGEINT) AS num FROM cum
    ),
    ga AS (SELECT g AS group_a, n AS n_a, narms FROM arms WHERE rk = 1),
    gb AS (SELECT g AS group_b, n AS n_b FROM arms WHERE rk = 2),
    d AS (
      SELECT group_a, group_b, n_a, n_b, narms,
             num::DOUBLE / (n_a::DOUBLE * n_b::DOUBLE) AS delta
      FROM ga CROSS JOIN gb CROSS JOIN num
    )
    SELECT CASE WHEN narms = 2 THEN group_a END AS group_a,
           CASE WHEN narms = 2 THEN group_b END AS group_b,
           n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
           round(CASE WHEN narms = 2 THEN delta END, 9) AS delta,
           round(CASE WHEN narms = 2 THEN abs(delta) END, 9) AS abs_delta,
           CASE WHEN narms = 2 THEN
             CASE WHEN abs(delta) < 0.147 THEN 'negligible'
                  WHEN abs(delta) < 0.33 THEN 'small'
                  WHEN abs(delta) < 0.474 THEN 'medium'
                  ELSE 'large' END END AS magnitude
    FROM d
    """,
)
def cliffs_delta_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta ordinal effect size of document length between
    sources src0 and src1 (operators.evaluation.cliffs_delta) — the
    n-free magnitude beside mw_doclen_sources' z verdict, counts-based
    over the distinct-length axis with exact integer terms."""
    from ..operators.evaluation import cliffs_delta

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    return cliffs_delta(docs, "n_chars", "source")


@_q(
    "hl_shift_doclen",
    """
    WITH base AS (
      SELECT source AS g, n_chars::DOUBLE AS v FROM documents
      WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL
    ),
    arms AS (
      SELECT g, n, row_number() OVER (ORDER BY g) AS rk,
             count(*) OVER () AS narms
      FROM (SELECT g, count(*) AS n FROM base GROUP BY 1)
    ),
    va AS (SELECT v AS va, count(*) AS ca FROM base
           JOIN arms USING (g) WHERE rk = 1 GROUP BY 1),
    vb AS (SELECT v AS vb, count(*) AS cb FROM base
           JOIN arms USING (g) WHERE rk = 2 GROUP BY 1),
    diffs AS (
      SELECT va - vb AS d, sum(ca::HUGEINT * cb::HUGEINT) AS w
      FROM va CROSS JOIN vb GROUP BY 1
    ),
    med AS (
      SELECT max(tot)::BIGINT AS np, min(d) AS hl
      FROM (
        SELECT d, sum(w) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                 AS cum,
               sum(w) OVER () AS tot
        FROM diffs
      ) WHERE 2 * cum >= tot
    ),
    ga AS (SELECT g AS group_a, n AS n_a, narms FROM arms WHERE rk = 1),
    gb AS (SELECT g AS group_b, n AS n_b FROM arms WHERE rk = 2)
    SELECT CASE WHEN narms = 2 THEN group_a END AS group_a,
           CASE WHEN narms = 2 THEN group_b END AS group_b,
           n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
           np AS n_pairs,
           round(CASE WHEN narms = 2 THEN hl END, 9) AS hl_shift
    FROM ga CROSS JOIN gb CROSS JOIN med
    """,
)
def hl_shift_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann location-shift estimate of document length between
    sources src0 and src1 (operators.evaluation.hodges_lehmann_shift) —
    the robust "by how much" beside Cliff's delta's "how often": lower
    weighted median of all pairwise differences over the distinct-value
    axes with multiplicities."""
    from ..operators.evaluation import hodges_lehmann_shift

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    return hodges_lehmann_shift(docs, "n_chars", "source")


@_q(
    "importance_weighted_doclen",
    """
    WITH base AS (
      SELECT n_chars::DOUBLE AS v,
             1000.0 / (100.0 + n_chars::DOUBLE) AS w
      FROM documents WHERE n_chars IS NOT NULL
    ),
    agg AS (
      SELECT count(*) AS n,
             sum(CAST(w AS DECIMAL(38,12)))::DOUBLE AS sw,
             sum(CAST(w * w AS DECIMAL(38,12)))::DOUBLE AS sw2,
             sum(CAST(w * v AS DECIMAL(38,12)))::DOUBLE AS swv
      FROM base
    )
    SELECT n::BIGINT AS n, round(sw, 9) AS sum_w,
           round(CASE WHEN sw != 0 THEN swv / sw END, 9) AS snis_mean,
           round(CASE WHEN sw2 != 0 THEN sw * sw / sw2 END, 9) AS ess,
           round(CASE WHEN sw2 != 0 THEN sw * sw / sw2 / n END, 9)
             AS ess_ratio
    FROM agg
    """,
)
def importance_weighted_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-normalized importance-sampling mean of document length under
    a short-doc-tilted proposal w = 1000/(100+len)
    (operators.evaluation.snis_mean) — "what would mean length be if I
    sampled by THESE weights", with the ESS honesty meter that says how
    many effective docs back the estimate.  One scan, rational weights
    (engine-identical IEEE)."""
    from ..operators.evaluation import snis_mean

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    w = F.lit(1000.0) / (F.lit(100.0) + F.col("n_chars").cast("double"))
    return snis_mean(docs.withColumn("_w", w), "n_chars", "_w")


@_q(
    "partial_corr_price_qty_disc",
    """
    WITH s AS (
      SELECT round(l_extendedprice * 100.0, 0)::BIGINT AS x,
             round(l_quantity * 100.0, 0)::BIGINT AS y,
             round(l_discount * 100.0, 0)::BIGINT AS z
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        AND l_discount IS NOT NULL
    ),
    agg AS (
      SELECT count(*)::HUGEINT AS n,
             sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
             sum(z::HUGEINT) AS sz,
             sum(x::HUGEINT * x::HUGEINT) AS sxx,
             sum(y::HUGEINT * y::HUGEINT) AS syy,
             sum(z::HUGEINT * z::HUGEINT) AS szz,
             sum(x::HUGEINT * y::HUGEINT) AS sxy,
             sum(x::HUGEINT * z::HUGEINT) AS sxz,
             sum(y::HUGEINT * z::HUGEINT) AS syz
      FROM s
    ),
    r AS (
      SELECT n,
             (n * sxy - sx * sy)::DOUBLE
               / (sqrt((n * sxx - sx * sx)::DOUBLE)
                  * sqrt((n * syy - sy * sy)::DOUBLE)) AS rxy,
             (n * sxz - sx * sz)::DOUBLE
               / (sqrt((n * sxx - sx * sx)::DOUBLE)
                  * sqrt((n * szz - sz * sz)::DOUBLE)) AS rxz,
             (n * syz - sy * sz)::DOUBLE
               / (sqrt((n * syy - sy * sy)::DOUBLE)
                  * sqrt((n * szz - sz * sz)::DOUBLE)) AS ryz
      FROM agg
    )
    SELECT n::BIGINT AS n,
           round(rxy, 9) AS r_xy, round(rxz, 9) AS r_xz,
           round(ryz, 9) AS r_yz,
           round((rxy - rxz * ryz)
                 / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 9)
             AS r_xy_given_z
    FROM r
    """,
)
def partial_corr_price_qty_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlation of extended price and quantity
    controlling for discount (operators.profile.partial_correlation) —
    the confounder screen over exact scaled-integer moment sums; one
    lineitem scan, one aggregate row, engine-identical through the last
    division."""
    from ..operators.profile import partial_correlation

    return partial_correlation(
        _t(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        "l_quantity",
        "l_discount",
    )


@_q(
    "ols_tokens_chars",
    f"""
    WITH s AS (
      SELECT round(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                   * 100.0, 0)::BIGINT AS x,
             round(n_chars * 100.0, 0)::BIGINT AS y
      FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL
    ),
    agg AS (
      SELECT count(*)::HUGEINT AS n,
             sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
             sum(x::HUGEINT * x::HUGEINT) AS sxx,
             sum(y::HUGEINT * y::HUGEINT) AS syy,
             sum(x::HUGEINT * y::HUGEINT) AS sxy
      FROM s
    ),
    cf AS (
      SELECT n::DOUBLE AS nd,
             (n * sxx - sx * sx)::DOUBLE AS cxx,
             (n * syy - sy * sy)::DOUBLE AS cyy,
             (n * sxy - sx * sy)::DOUBLE AS cxy,
             sx::DOUBLE AS sxd, sy::DOUBLE AS syd, n
      FROM agg
    ),
    fit AS (
      SELECT nd, n, cxx, cyy, cxy,
             CASE WHEN cxx != 0 THEN cxy / cxx END AS slope,
             (syd / nd - (CASE WHEN cxx != 0 THEN cxy / cxx END)
                * sxd / nd) / 100.0 AS intercept,
             CASE WHEN cxx != 0 THEN
               (cyy - cxy * cxy / cxx) / (nd * 100.0 * 100.0) END AS sse
      FROM cf
    ),
    inf AS (
      SELECT *,
             CASE WHEN n > 2 AND cxx != 0 AND sse IS NOT NULL THEN
               sqrt((sse / (nd - 2))
                    / (cxx / (nd * 100.0 * 100.0))) END AS se
      FROM fit
    ),
    tst AS (
      SELECT *, CASE WHEN se != 0 THEN slope / se END AS t FROM inf
    ),
    e1 AS (SELECT *, abs(t) AS uu FROM tst),
    e2 AS (SELECT *, {_AS_POLY.strip()} FROM e1),
    e3 AS (SELECT *, {_AS_E.strip()} FROM e2)
    SELECT n::BIGINT AS n,
           round(slope, 9) AS slope,
           round(intercept, 9) AS intercept,
           round(CASE WHEN cxx != 0 AND cyy != 0
                 THEN cxy * cxy / (cxx * cyy) END, 9) AS r2,
           round(se, 9) AS se_slope,
           round(t, 9) AS t,
           round(e, 9) AS p_approx
    FROM e3
    """,
)
def ols_tokens_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple OLS of document char length on token count WITH inference
    (operators.profile.ols_inference): slope, intercept, R², the
    slope's standard error, t, and the large-n normal p — the "slope
    with an error bar" trend_fit never reports.  Exact scaled-integer
    moment sums; documents tokenize once."""
    from ..operators.profile import ols_inference
    from ..operators.textstats import token_count

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("n_chars").isNotNull())
        .select(
            token_count("text").alias("x"), F.col("n_chars").alias("y")
        )
    )
    return ols_inference(docs, "x", "y")


# --------------------------------------------------------------------------
# Round 9 — statistical time-series tests over daily/hourly bucket means
# --------------------------------------------------------------------------
#: Shared daily bucket-mean CTE (the operators.timeseries._bucket_means
#: twin — decimal(28,6)-quantized means, the ts_theil_sen convention).
_DUCK_DAYMEANS = """
      SELECT event_type AS g, date_trunc('day', ts) AS bk,
             CAST(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                  / count(*) AS DECIMAL(28,6)) AS m
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
        AND event_type IS NOT NULL
      GROUP BY 1, 2
"""


@_q(
    "ts_runs_test",
    f"""
    WITH b AS ({_DUCK_DAYMEANS}),
    mc AS (SELECT g, m AS v, count(*) AS c FROM b GROUP BY 1, 2),
    med AS (
      SELECT g, min(v) AS med FROM (
        SELECT g, v,
               sum(c) OVER (PARTITION BY g ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(c) OVER (PARTITION BY g) AS tot
        FROM mc
      ) WHERE 2 * cum >= tot GROUP BY 1
    ),
    signed AS (
      SELECT b.g, bk, (m > med)::INT AS s
      FROM b JOIN med ON b.g = med.g WHERE m != med
    ),
    marked AS (
      SELECT g, s,
             CASE WHEN lag(s) OVER (PARTITION BY g ORDER BY bk) IS NULL
                    OR lag(s) OVER (PARTITION BY g ORDER BY bk) != s
                  THEN 1 ELSE 0 END AS nw
      FROM signed
    ),
    agg AS (
      SELECT g, count(*) AS nb, sum(s)::BIGINT AS n1,
             (count(*) - sum(s))::BIGINT AS n2, sum(nw)::BIGINT AS runs
      FROM marked GROUP BY 1
    ),
    zc AS (
      SELECT *,
             n1::DOUBLE AS d1, n2::DOUBLE AS d2,
             (n1 + n2)::DOUBLE AS dn,
             (n1 > 0 AND n2 > 0 AND n1 + n2 > 1) AS ok
      FROM agg
    ),
    z1 AS (
      SELECT *,
             CASE WHEN ok AND
               (2.0*d1*d2*(2.0*d1*d2 - dn) / (dn*dn*(dn - 1))) > 0
             THEN (runs::DOUBLE - (2.0*d1*d2/dn + 1))
                  / sqrt(2.0*d1*d2*(2.0*d1*d2 - dn) / (dn*dn*(dn - 1)))
             END AS uu
      FROM zc
    ),
    z2 AS (SELECT *,
             (1.0 / (1.0 + 0.3275911 * (abs(uu) / sqrt(2.0)))) AS w
           FROM z1),
    z3 AS (SELECT *,
             w * (0.254829592 + w * (-0.284496736 + w * (1.421413741
               + w * (-1.453152027 + w * 1.061405429))))
               * exp(-(abs(uu) / sqrt(2.0)) * (abs(uu) / sqrt(2.0)))
               AS e
           FROM z2)
    SELECT g AS event_type, nb::BIGINT AS n_buckets,
           n1 AS n_above, n2 AS n_below, runs,
           round(uu, 9) AS z, round(e, 9) AS p_approx,
           coalesce(abs(uu) > 1.959963984540054, false) AS significant
    FROM z3
    """,
)
def ts_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test of randomness per event type over daily
    bucket means (operators.timeseries.runs_test) — too few runs =
    sticky regimes, too many = alternation; the cheapest exchangeability
    check before trusting any residual-based detector.  Signs against
    the lower weighted median; exact integer run counts; normal z with
    the shared A–S erfc p."""
    from ..operators.timeseries import runs_test

    return runs_test(
        _t(spark, sf_dir, "events"), dims=["event_type"], unit="day"
    )


@_q(
    "ts_ljung_box",
    f"""
    WITH b AS ({_DUCK_DAYMEANS}),
    cent AS (
      SELECT g, bk,
             m::DOUBLE - msum::DOUBLE / cnt AS xc
      FROM (SELECT g, bk, m,
                   sum(CAST(m AS DECIMAL(28,6))) OVER (PARTITION BY g)
                     AS msum,
                   count(*) OVER (PARTITION BY g) AS cnt
            FROM b)
    ),
    lagd AS (
      SELECT g, xc,
             lag(xc, 1) OVER (PARTITION BY g ORDER BY bk) AS l1,
             lag(xc, 2) OVER (PARTITION BY g ORDER BY bk) AS l2,
             lag(xc, 3) OVER (PARTITION BY g ORDER BY bk) AS l3,
             lag(xc, 4) OVER (PARTITION BY g ORDER BY bk) AS l4,
             lag(xc, 5) OVER (PARTITION BY g ORDER BY bk) AS l5,
             lag(xc, 6) OVER (PARTITION BY g ORDER BY bk) AS l6,
             lag(xc, 7) OVER (PARTITION BY g ORDER BY bk) AS l7
      FROM cent
    ),
    agg AS (
      SELECT g, count(*) AS nb,
             sum(CAST(xc * xc AS DECIMAL(28,12)))::DOUBLE AS den,
             sum(CAST(xc * l1 AS DECIMAL(28,12)))::DOUBLE AS n1,
             sum(CAST(xc * l2 AS DECIMAL(28,12)))::DOUBLE AS n2,
             sum(CAST(xc * l3 AS DECIMAL(28,12)))::DOUBLE AS n3,
             sum(CAST(xc * l4 AS DECIMAL(28,12)))::DOUBLE AS n4,
             sum(CAST(xc * l5 AS DECIMAL(28,12)))::DOUBLE AS n5,
             sum(CAST(xc * l6 AS DECIMAL(28,12)))::DOUBLE AS n6,
             sum(CAST(xc * l7 AS DECIMAL(28,12)))::DOUBLE AS n7
      FROM lagd GROUP BY 1
    ),
    q AS (
      SELECT g, nb, nb::DOUBLE AS n,
             nb::DOUBLE * (nb::DOUBLE + 2) * (
               (CASE WHEN den != 0 THEN n1/den END)
                 * (CASE WHEN den != 0 THEN n1/den END) / (nb::DOUBLE - 1.0)
               + (CASE WHEN den != 0 THEN n2/den END)
                 * (CASE WHEN den != 0 THEN n2/den END) / (nb::DOUBLE - 2.0)
               + (CASE WHEN den != 0 THEN n3/den END)
                 * (CASE WHEN den != 0 THEN n3/den END) / (nb::DOUBLE - 3.0)
               + (CASE WHEN den != 0 THEN n4/den END)
                 * (CASE WHEN den != 0 THEN n4/den END) / (nb::DOUBLE - 4.0)
               + (CASE WHEN den != 0 THEN n5/den END)
                 * (CASE WHEN den != 0 THEN n5/den END) / (nb::DOUBLE - 5.0)
               + (CASE WHEN den != 0 THEN n6/den END)
                 * (CASE WHEN den != 0 THEN n6/den END) / (nb::DOUBLE - 6.0)
               + (CASE WHEN den != 0 THEN n7/den END)
                 * (CASE WHEN den != 0 THEN n7/den END) / (nb::DOUBLE - 7.0)
             ) AS qs
      FROM agg
    ),
    z1 AS (
      SELECT *,
             (cbrt(qs / 7.0) - (1.0 - 2.0 / (9.0 * 7.0)))
               / sqrt(2.0 / (9.0 * 7.0)) AS uu
      FROM q
    ),
    z2 AS (SELECT *,
             (1.0 / (1.0 + 0.3275911 * (abs(uu) / sqrt(2.0)))) AS w
           FROM z1),
    z3 AS (SELECT *,
             w * (0.254829592 + w * (-0.284496736 + w * (1.421413741
               + w * (-1.453152027 + w * 1.061405429))))
               * exp(-(abs(uu) / sqrt(2.0)) * (abs(uu) / sqrt(2.0)))
               AS e
           FROM z2)
    SELECT g AS event_type, nb::BIGINT AS n_buckets,
           CAST(7 AS BIGINT) AS m,
           round(CASE WHEN nb > 7 THEN qs END, 9) AS q_stat,
           round(CASE WHEN nb > 7 THEN
             CASE WHEN uu >= 0 THEN e / 2.0 ELSE 1.0 - e / 2.0 END END, 9)
             AS p_approx
    FROM z3
    """,
)
def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box whiteness portmanteau (lags 1–7) per event type over
    daily bucket means (operators.timeseries.ljung_box) — pools seven
    near-zero autocorrelations into one χ²₇ verdict with the
    Wilson–Hilferty closed-form p; the joint test ts_autocorrelation's
    per-lag readout can't run."""
    from ..operators.timeseries import ljung_box

    return ljung_box(
        _t(spark, sf_dir, "events"), dims=["event_type"], unit="day",
        max_lag=7,
    )


@_q(
    "ts_variance_ratio",
    f"""
    WITH b AS ({_DUCK_DAYMEANS}),
    d AS (
      SELECT g,
             m::DOUBLE - lag(m::DOUBLE, 1)
               OVER (PARTITION BY g ORDER BY bk) AS d1,
             m::DOUBLE - lag(m::DOUBLE, 5)
               OVER (PARTITION BY g ORDER BY bk) AS dq
      FROM b
    ),
    agg AS (
      SELECT g, count(*) AS nb, count(d1) AS n1, count(dq) AS nq,
             sum(CAST(d1 AS DECIMAL(28,12))) AS s1,
             sum(CAST(d1 * d1 AS DECIMAL(28,12))) AS q1,
             sum(CAST(dq AS DECIMAL(28,12))) AS sq,
             sum(CAST(dq * dq AS DECIMAL(28,12))) AS qq
      FROM d GROUP BY 1
    ),
    v AS (
      SELECT g, nb, n1, nq,
             CASE WHEN n1 > 1 THEN
               (round(q1, 6)
                - round(CAST(s1::DOUBLE * s1::DOUBLE / n1::DOUBLE
                             AS DECIMAL(28,12)), 6))::DOUBLE
               / (n1::DOUBLE - 1) END AS v1,
             CASE WHEN nq > 1 THEN
               (round(qq, 6)
                - round(CAST(sq::DOUBLE * sq::DOUBLE / nq::DOUBLE
                             AS DECIMAL(28,12)), 6))::DOUBLE
               / (nq::DOUBLE - 1) END AS vq
      FROM agg
    ),
    vr AS (
      SELECT *,
             CASE WHEN 5.0 * v1 != 0 THEN vq / (5.0 * v1) END AS vrr,
             (nq >= 2 AND n1 >= 2) AS ok
      FROM v
    ),
    z1 AS (
      SELECT *,
             CASE WHEN ok AND sqrt(72.0 / (15.0 * n1::DOUBLE)) != 0
               THEN (vrr - 1) / sqrt(72.0 / (15.0 * n1::DOUBLE)) END AS uu
      FROM vr
    ),
    z2 AS (SELECT *,
             (1.0 / (1.0 + 0.3275911 * (abs(uu) / sqrt(2.0)))) AS w
           FROM z1),
    z3 AS (SELECT *,
             w * (0.254829592 + w * (-0.284496736 + w * (1.421413741
               + w * (-1.453152027 + w * 1.061405429))))
               * exp(-(abs(uu) / sqrt(2.0)) * (abs(uu) / sqrt(2.0)))
               AS e
           FROM z2)
    SELECT g AS event_type, nb::BIGINT AS n_buckets,
           CAST(5 AS BIGINT) AS q,
           round(CASE WHEN ok THEN vrr END, 9) AS vr,
           round(uu, 9) AS z, round(e, 9) AS p_approx
    FROM z3
    """,
)
def ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo–MacKinlay variance-ratio test (q=5) per event type over daily
    bucket means (operators.timeseries.variance_ratio) — VR < 1
    mean-reversion, > 1 momentum, with the homoskedastic z and A–S p;
    the one-number random-walk check beside ts_hurst_hourly's scaling
    law."""
    from ..operators.timeseries import variance_ratio

    return variance_ratio(
        _t(spark, sf_dir, "events"), dims=["event_type"], unit="day", q=5
    )


@_q(
    "ts_hurst_hourly",
    """
    WITH b AS (
      SELECT event_type AS g, date_trunc('hour', ts) AS bk,
             CAST(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                  / count(*) AS DECIMAL(28,6)) AS m
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
        AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    idx AS (
      SELECT g, bk, m::DOUBLE AS x,
             row_number() OVER (PARTITION BY g ORDER BY bk) - 1 AS i
      FROM b
    ),
    blocks AS (
      SELECT g, bk, x, i, w, i // w AS blk
      FROM idx CROSS JOIN (SELECT unnest([8, 16, 32, 64]) AS w)
    ),
    full_ AS (
      SELECT * FROM (
        SELECT *, count(*) OVER (PARTITION BY g, w, blk) AS bn
        FROM blocks
      ) WHERE bn = w
    ),
    dev AS (
      SELECT g, bk, w, blk, x,
             sum(CAST(x AS DECIMAL(28,6)))
               OVER (PARTITION BY g, w, blk)::DOUBLE / w::DOUBLE AS mu
      FROM full_
    ),
    cums AS (
      SELECT g, w, blk,
             sum(x - mu) OVER (PARTITION BY g, w, blk ORDER BY bk
                               ROWS UNBOUNDED PRECEDING) AS cum,
             sum(CAST((x - mu) * (x - mu) AS DECIMAL(28,12)))
               OVER (PARTITION BY g, w, blk) AS q
      FROM dev
    ),
    per_block AS (
      SELECT g, w, blk, max(cum) - min(cum) AS r,
             sqrt(max(q)::DOUBLE / max(w)::DOUBLE) AS s
      FROM cums GROUP BY 1, 2, 3
    ),
    per_w AS (
      SELECT g, w,
             sum(CAST(round(r / s, 9) AS DECIMAL(28,12)))::DOUBLE
               / count(*)::DOUBLE AS rs
      FROM per_block WHERE s > 0 GROUP BY 1, 2
    ),
    fit AS (
      SELECT g, count(*) AS k,
             sum(CAST(round(log2(w::DOUBLE), 9) AS DECIMAL(28,12)))
               AS sx,
             sum(CAST(round(log2(rs), 9) AS DECIMAL(28,12))) AS sy,
             sum(CAST(round(log2(w::DOUBLE) * log2(w::DOUBLE), 9)
                      AS DECIMAL(28,12))) AS sxx,
             sum(CAST(round(log2(w::DOUBLE) * log2(rs), 9)
                      AS DECIMAL(28,12))) AS sxy
      FROM per_w WHERE rs > 0 GROUP BY 1
    ),
    nb AS (SELECT g, count(*)::BIGINT AS n_buckets FROM idx GROUP BY 1)
    SELECT g AS event_type, n_buckets, k::BIGINT AS n_sizes,
           round(CASE WHEN k >= 2 AND
                 (k::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) != 0
             THEN (k::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                  / (k::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
             END, 9) AS hurst
    FROM fit JOIN nb USING (g)
    """,
)
def ts_hurst_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent per event type via rescaled-range analysis over
    HOURLY bucket means at block sizes 8/16/32/64
    (operators.timeseries.hurst_rs) — the all-horizons long-memory
    summary (H ≈ 0.5 random, > persistent, < mean-reverting).  Exact
    block statistics only (partial blocks dropped); every window
    partitions by (series, size, block)."""
    from ..operators.timeseries import hurst_rs

    return hurst_rs(
        _t(spark, sf_dir, "events"),
        dims=["event_type"],
        unit="hour",
        window_sizes=(8, 16, 32, 64),
    )


@_q(
    "ts_pacf",
    f"""
    WITH b AS ({_DUCK_DAYMEANS}),
    cent AS (
      SELECT g, bk,
             m::DOUBLE - msum::DOUBLE / cnt AS xc
      FROM (SELECT g, bk, m,
                   sum(CAST(m AS DECIMAL(28,6))) OVER (PARTITION BY g)
                     AS msum,
                   count(*) OVER (PARTITION BY g) AS cnt
            FROM b)
    ),
    lagd AS (
      SELECT g, xc,
             lag(xc, 1) OVER (PARTITION BY g ORDER BY bk) AS l1,
             lag(xc, 2) OVER (PARTITION BY g ORDER BY bk) AS l2,
             lag(xc, 3) OVER (PARTITION BY g ORDER BY bk) AS l3
      FROM cent
    ),
    agg AS (
      SELECT g,
             sum(CAST(xc * xc AS DECIMAL(28,12)))::DOUBLE AS den,
             sum(CAST(xc * l1 AS DECIMAL(28,12)))::DOUBLE AS c1,
             sum(CAST(xc * l2 AS DECIMAL(28,12)))::DOUBLE AS c2,
             sum(CAST(xc * l3 AS DECIMAL(28,12)))::DOUBLE AS c3
      FROM lagd GROUP BY 1
    ),
    r AS (
      SELECT g,
             CASE WHEN den != 0 THEN c1 / den END AS r1,
             CASE WHEN den != 0 THEN c2 / den END AS r2,
             CASE WHEN den != 0 THEN c3 / den END AS r3
      FROM agg
    ),
    ph AS (
      SELECT g, r1, r2, r3,
             CASE WHEN (1.0 - r1 * r1) != 0
               THEN (r2 - r1 * r1) / (1.0 - r1 * r1) END AS p2
      FROM r
    ),
    ph3 AS (
      SELECT g, r1, p2,
             CASE WHEN (1.0 - (r1 * (1.0 - p2)) * r1 - p2 * r2) != 0
               THEN (r3 - (r1 * (1.0 - p2)) * r2 - p2 * r1)
                    / (1.0 - (r1 * (1.0 - p2)) * r1 - p2 * r2) END AS p3
      FROM ph
    )
    SELECT g AS event_type, lag, pacf FROM (
      SELECT g, 1 AS lag, round(r1, 9) AS pacf FROM ph3
      UNION ALL SELECT g, 2, round(p2, 9) FROM ph3
      UNION ALL SELECT g, 3, round(p3, 9) FROM ph3
    )
    """,
)
def ts_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation (lags 1–3, Durbin–Levinson closed form)
    per event type over daily bucket means
    (operators.timeseries.pacf_durbin) — the AR-order picker that
    isolates DIRECT lag effects where the plain ACF conflates them with
    propagation."""
    from ..operators.timeseries import pacf_durbin

    return pacf_durbin(
        _t(spark, sf_dir, "events"), dims=["event_type"], unit="day"
    )


@_q(
    "ts_sax_motifs",
    f"""
    WITH b AS ({_DUCK_DAYMEANS}),
    stats AS (
      SELECT g, bk, m,
             sum(CAST(m AS DECIMAL(28,6))) OVER (PARTITION BY g) AS s,
             sum(CAST(m::DOUBLE * m::DOUBLE AS DECIMAL(28,12)))
               OVER (PARTITION BY g) AS q,
             count(*) OVER (PARTITION BY g) AS n
      FROM b
    ),
    z AS (
      SELECT g, bk,
             CASE WHEN sqrt((round(q, 6)
                    - round(CAST(s::DOUBLE * s::DOUBLE / n::DOUBLE
                                 AS DECIMAL(28,12)), 6))::DOUBLE
                    / n::DOUBLE) != 0
               THEN (m::DOUBLE - s::DOUBLE / n::DOUBLE)
                    / sqrt((round(q, 6)
                       - round(CAST(s::DOUBLE * s::DOUBLE / n::DOUBLE
                                    AS DECIMAL(28,12)), 6))::DOUBLE
                       / n::DOUBLE) END AS zz
      FROM stats
    ),
    sym AS (
      SELECT g, bk,
             CASE WHEN zz < -0.6745 THEN 'a'
                  WHEN zz < 0.0 THEN 'b'
                  WHEN zz < 0.6745 THEN 'c'
                  ELSE 'd' END AS sy
      FROM z
    ),
    motifs AS (
      SELECT g,
             sy || lead(sy, 1) OVER (PARTITION BY g ORDER BY bk)
                || lead(sy, 2) OVER (PARTITION BY g ORDER BY bk) AS motif
      FROM sym
    ),
    counted AS (
      SELECT g, motif, count(*) AS n FROM motifs
      WHERE length(motif) = 3 GROUP BY 1, 2
    )
    SELECT g AS event_type, motif, n::BIGINT AS n, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY g
                 ORDER BY n DESC, motif) AS rank
      FROM counted
    ) WHERE rank <= 5
    """,
)
def ts_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization (4-letter Gaussian-quartile alphabet) + top-5
    recurring 3-gram motifs per event type over daily bucket means
    (operators.timeseries.sax_motifs) — "what SHAPES does this metric
    repeat"; z-scores from decimal-exact mean/σ with the 6-dp operand
    cut, deterministic count-desc/motif-asc ranking."""
    from ..operators.timeseries import sax_motifs

    return sax_motifs(
        _t(spark, sf_dir, "events"), dims=["event_type"], unit="day",
        gram=3, top_k=5,
    )


# --------------------------------------------------------------------------
# Round 9 — embedding-geometry audits: isotropy, dim redundancy,
# assignment margins, label separability
# --------------------------------------------------------------------------
@_q(
    "emb_isotropy",
    """
    WITH b AS (
      SELECT vec_id, embedding,
             round(sqrt(list_sum(list_transform(embedding,
                     x -> x::DOUBLE * x::DOUBLE))), 6) AS nrm
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    comps AS (
      SELECT vec_id, unnest(range(0, len(embedding))) AS i,
             round(unnest(embedding)::DOUBLE / nrm, 6) AS u
      FROM b WHERE nrm > 0
    ),
    per_dim AS (
      SELECT i, sum(CAST(u AS DECIMAL(28,6))) AS s FROM comps GROUP BY 1
    ),
    ss AS (
      SELECT count(*) AS n_dims,
             sum(CAST(s::DOUBLE * s::DOUBLE AS DECIMAL(28,12))) AS ssq
      FROM per_dim
    ),
    tt AS (
      SELECT count(DISTINCT vec_id) AS n,
             sum(CAST(u * u AS DECIMAL(28,12))) AS t
      FROM comps
    )
    SELECT n::BIGINT AS n, n_dims::BIGINT AS n_dims,
           round(CASE WHEN n >= 2 THEN
             (ssq::DOUBLE - t::DOUBLE) / (n::DOUBLE * (n::DOUBLE - 1))
             END, 9) AS mean_cosine
    FROM tt CROSS JOIN ss
    """,
)
def emb_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space isotropy: the exact mean pairwise cosine over all
    C(n,2) unit-vector pairs WITHOUT a pair join
    (operators.similarity.isotropy_score) — ‖Σû‖² sum-vector algebra
    turns n² work into one scan plus a 64-cell reduction; the
    cone-collapse health check behind every cosine threshold."""
    from ..operators.similarity import isotropy_score

    return isotropy_score(_t(spark, sf_dir, "embeddings"))


@_q(
    "emb_covariance_pairs",
    """
    WITH comps AS (
      SELECT vec_id, unnest(range(0, len(embedding))) AS i,
             round(unnest(embedding)::DOUBLE * 1000000.0, 0)::BIGINT AS s
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    pairs AS (
      SELECT a.i AS ia, b2.i AS ib, a.s AS sa, b2.s AS sb
      FROM comps a JOIN comps b2
        ON a.vec_id = b2.vec_id AND a.i < b2.i
    ),
    agg AS (
      SELECT ia, ib, count(*)::HUGEINT AS n,
             sum(sa::HUGEINT) AS sx, sum(sb::HUGEINT) AS sy,
             sum(sa::HUGEINT * sa::HUGEINT) AS sxx,
             sum(sb::HUGEINT * sb::HUGEINT) AS syy,
             sum(sa::HUGEINT * sb::HUGEINT) AS sxy
      FROM pairs GROUP BY 1, 2
    ),
    corr AS (
      SELECT ia, ib, n,
             round(CASE WHEN
               sqrt((n * sxx - sx * sx)::DOUBLE)
               * sqrt((n * syy - sy * sy)::DOUBLE) != 0
             THEN (n * sxy - sx * sy)::DOUBLE
                  / (sqrt((n * sxx - sx * sx)::DOUBLE)
                     * sqrt((n * syy - sy * sy)::DOUBLE)) END, 9) AS corr
      FROM agg
    )
    SELECT ia::INT AS dim_i, ib::INT AS dim_j, n::BIGINT AS n, corr
    FROM (
      SELECT *, row_number() OVER (ORDER BY abs(corr) DESC, ia, ib)
               AS rk
      FROM corr
    ) WHERE rk <= 10
    """,
)
def emb_covariance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most-correlated embedding dimension pairs
    (operators.similarity.covariance_top_pairs) — the redundancy audit
    behind truncation decisions: exact scaled-integer Pearson over all
    C(64,2) dim pairs, fan-out per ROW (id-keyed posexplode self-join),
    ranking on the d²-row aggregate."""
    from ..operators.similarity import covariance_top_pairs

    return covariance_top_pairs(
        _t(spark, sf_dir, "embeddings"), top_k=10
    )


@_q(
    "emb_centroid_margin",
    """
    WITH cents AS (
      SELECT j::INT AS j,
             list_transform(range(0, 64),
               i -> CASE WHEN i % 4 = j THEN 1.0 ELSE 0.0 END) AS c
      FROM (SELECT unnest(range(0, 4)) AS j)
    ), scored AS (
      SELECT e.vec_id, cents.j AS cell,
             round(list_sum(list_transform(range(0, 64),
               i -> (e.embedding[i+1]::DOUBLE - cents.c[i+1])
                    * (e.embedding[i+1]::DOUBLE - cents.c[i+1]))), 6)
               AS dist2
      FROM embeddings e CROSS JOIN cents
      WHERE e.embedding IS NOT NULL
    ), own AS (
      SELECT vec_id, cell AS own_cell, dist2 AS d1
      FROM scored
      QUALIFY row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cell) = 1
    ), snd AS (
      SELECT s.vec_id, min(s.dist2) AS d2
      FROM scored s JOIN own o
        ON s.vec_id = o.vec_id AND s.cell != o.own_cell
      GROUP BY 1
    ), m AS (
      SELECT own_cell AS cell,
             round(sqrt(d2) - sqrt(d1), 6) AS mg
      FROM own JOIN snd USING (vec_id)
    )
    SELECT cell::INT AS cell, count(*)::BIGINT AS n,
           round(sum(CAST(mg AS DECIMAL(28,6)))::DOUBLE
                 / count(*)::DOUBLE, 9) AS mean_margin,
           round(min(mg), 9) AS min_margin,
           sum(CASE WHEN mg < 0.05 THEN 1 ELSE 0 END)::BIGINT
             AS ambiguous_n,
           round(sum(CASE WHEN mg < 0.05 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*)::DOUBLE, 9) AS ambiguous_share
    FROM m GROUP BY 1
    """,
)
def emb_centroid_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assignment-confidence margins (second-nearest minus nearest
    centroid distance) per fixed cell
    (operators.similarity.nearest_centroid_margin) — how DECISIVE the
    cell assignments are, with the boundary-mass share below 0.05; the
    zero-shuffle kmeans_assign scoring shape."""
    from ..operators.similarity import nearest_centroid_margin

    cents = [
        [1.0 if i % 4 == j else 0.0 for i in range(64)] for j in range(4)
    ]
    return nearest_centroid_margin(
        _t(spark, sf_dir, "embeddings"), cents, ambiguous_below=0.05
    )


@_q(
    "emb_label_cosine_contrast",
    """
    WITH b AS (
      SELECT CAST(label AS VARCHAR) AS l, vec_id, embedding,
             round(sqrt(list_sum(list_transform(embedding,
                     x -> x::DOUBLE * x::DOUBLE))), 6) AS nrm
      FROM embeddings
      WHERE embedding IS NOT NULL AND label IS NOT NULL
    ),
    comps AS (
      SELECT l, vec_id, unnest(range(0, len(embedding))) AS i,
             round(unnest(embedding)::DOUBLE / nrm, 6) AS u
      FROM b WHERE nrm > 0
    ),
    sums AS (
      SELECT l, i, sum(CAST(u AS DECIMAL(28,6))) AS s
      FROM comps GROUP BY 1, 2
    ),
    tots AS (SELECT i, sum(s) AS st FROM sums GROUP BY 1),
    dots AS (
      SELECT l,
             sum(CAST(s::DOUBLE * s::DOUBLE AS DECIMAL(28,12))) AS ss,
             sum(CAST(s::DOUBLE * (st - s)::DOUBLE AS DECIMAL(28,12)))
               AS sc
      FROM sums JOIN tots USING (i) GROUP BY 1
    ),
    per_l AS (
      SELECT l, count(DISTINCT vec_id) AS n,
             sum(CAST(u * u AS DECIMAL(28,12))) AS t
      FROM comps GROUP BY 1
    ),
    ntot AS (SELECT sum(n) AS nt FROM per_l),
    j AS (
      SELECT per_l.l, per_l.n, per_l.t, dots.ss, dots.sc, ntot.nt
      FROM per_l JOIN dots ON per_l.l = dots.l CROSS JOIN ntot
    )
    SELECT l AS label, n::BIGINT AS n,
           round(CASE WHEN n >= 2 THEN
             (ss::DOUBLE - t::DOUBLE)
             / (n::DOUBLE * (n::DOUBLE - 1)) END, 9) AS within_cos,
           round(CASE WHEN nt > n THEN
             sc::DOUBLE / (n::DOUBLE * (nt::DOUBLE - n::DOUBLE)) END, 9)
             AS cross_cos,
           round(CASE WHEN n >= 2 THEN
             (ss::DOUBLE - t::DOUBLE) / (n::DOUBLE * (n::DOUBLE - 1))
             END
             - CASE WHEN nt > n THEN
                 sc::DOUBLE / (n::DOUBLE * (nt::DOUBLE - n::DOUBLE))
               END, 9) AS contrast
    FROM j
    """,
)
def emb_label_cosine_contrast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-label vs cross-label mean cosine per stored label via
    sum-vector algebra — NO pair join
    (operators.similarity.label_cosine_contrast): the direct "are
    same-label vectors actually closer" separability readout beside
    emb_cells_vs_labels_ari's cell-agreement verdict."""
    from ..operators.similarity import label_cosine_contrast

    return label_cosine_contrast(_t(spark, sf_dir, "embeddings"))


# --------------------------------------------------------------------------
# Round 9 — text-analysis widening: PII audit, hashing-trick audit, RAKE,
# script mix, Simpson diversity, burstiness, compressibility proxy
# --------------------------------------------------------------------------
@_q(
    "pii_scan_report",
    """
    WITH base AS (
      SELECT source AS g,
             len(regexp_extract_all(text,
               '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+'))
               AS em,
             len(regexp_extract_all(text, '\\+[0-9]{7,15}')) AS ph,
             len(regexp_extract_all(text,
               '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS ip,
             len(regexp_extract_all(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}'))
               AS ssn
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
    )
    SELECT g AS "group", count(*)::BIGINT AS n_docs,
           sum(em)::BIGINT AS emails, sum(ph)::BIGINT AS phones,
           sum(ip)::BIGINT AS ipv4s, sum(ssn)::BIGINT AS ssn_like,
           sum(CASE WHEN em + ph + ip + ssn > 0 THEN 1 ELSE 0 END)::BIGINT
             AS docs_with_pii,
           round(sum(CASE WHEN em + ph + ip + ssn > 0 THEN 1 ELSE 0
                     END)::DOUBLE / count(*)::DOUBLE, 9) AS pii_doc_share
    FROM base GROUP BY 1
    """,
)
def pii_scan_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure audit
    (operators.textstats.pii_scan_report) — the release-gate REPORT
    beside pii_redact's rewriting pass: email/phone/IP/SSN-shaped hit
    counts and affected-document share per source, conservative
    character-class regexes identical under Java regex and RE2."""
    from ..operators.textstats import pii_scan_report

    return pii_scan_report(_t(spark, sf_dir, "documents"))


@_q(
    "feature_hash_audit",
    """
    WITH vocab AS (
      SELECT DISTINCT unnest(regexp_extract_all(lower(text),
               '[a-z0-9]+')) AS t
      FROM documents WHERE text IS NOT NULL
    ),
    bucketed AS (
      SELECT ('0x' || substr(md5(t), 1, 8))::BIGINT % 1024 AS b,
             count(*) AS c
      FROM vocab GROUP BY 1
    ),
    tot AS (
      SELECT sum(c) AS n, count(*) AS used, max(c) AS mx,
             sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS coll,
             sum(CAST(c::DOUBLE * c::DOUBLE AS DECIMAL(28,12))) AS sq
      FROM bucketed
    )
    SELECT n::BIGINT AS n_tokens, CAST(1024 AS BIGINT) AS n_buckets,
           used::BIGINT AS buckets_used, mx::BIGINT AS max_bucket,
           coll::BIGINT AS colliding_tokens,
           round(coll::DOUBLE / n::DOUBLE, 9) AS collision_share,
           round(1024.0 / n::DOUBLE * sq::DOUBLE - n::DOUBLE, 9)
             AS chi2_uniform
    FROM tot
    """,
)
def feature_hash_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick collision audit over the corpus vocabulary into
    1024 md5 buckets (operators.textstats.feature_hashing_audit) —
    occupancy, collision mass, and χ² uniformity vs the uniform-bucket
    null; runs on the DISTINCT-token axis, never the corpus."""
    from ..operators.textstats import feature_hashing_audit

    return feature_hashing_audit(
        _t(spark, sf_dir, "documents"), n_buckets=1024
    )


_RAKE_STOP_SQL = "('a','an','and','are','as','at','be','by','for','from','in','is','it','of','on','or','that','the','to','with')"


@_q(
    "rake_keywords_top",
    f"""
    WITH toks AS (
      SELECT doc_id AS id,
             unnest(range(0, len(regexp_extract_all(lower(text),
               '[a-z0-9]+')))) AS pos,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM documents WHERE text IS NOT NULL
    ),
    marked AS (
      SELECT id, pos, w,
             CASE WHEN w IN {_RAKE_STOP_SQL} THEN 1 ELSE 0 END AS stop
      FROM toks
    ),
    islands AS (
      SELECT id, pos, w,
             pos - row_number() OVER (PARTITION BY id, stop
                                      ORDER BY pos) AS grp
      FROM marked WHERE stop = 0
    ),
    phrases AS (
      SELECT id, grp,
             string_agg(w, ' ' ORDER BY pos) AS phrase,
             count(*) AS plen
      FROM islands GROUP BY 1, 2
    ),
    word_stats AS (
      SELECT w, sum(plen)::DOUBLE / count(*)::DOUBLE AS wscore
      FROM islands JOIN phrases USING (id, grp) GROUP BY w
    ),
    ps AS (
      SELECT id, grp,
             sum(CAST(round(wscore, 9) AS DECIMAL(28,9))) AS pscore
      FROM islands JOIN word_stats USING (w) GROUP BY 1, 2
    ),
    scored AS (
      SELECT phrase, count(*) AS n_phrase, max(pscore) AS sc
      FROM ps JOIN phrases USING (id, grp) GROUP BY 1
    )
    SELECT phrase, n_phrase::BIGINT AS n_phrase,
           round(sc::DOUBLE, 9) AS score
    FROM (
      SELECT *, row_number() OVER (ORDER BY sc DESC, phrase) AS rk
      FROM scored
    ) WHERE rk <= 15
    """,
)
def rake_keywords_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction: top-15 stopword-delimited candidate
    phrases by degree/frequency word-score sum
    (operators.textstats.rake_keywords) — gaps-and-islands phrase
    segmentation on per-doc windows, all scoring on vocab-sized
    aggregates."""
    from ..operators.textstats import rake_keywords

    return rake_keywords(_t(spark, sf_dir, "documents"), top_k=15)


@_q(
    "text_script_profile",
    """
    WITH base AS (
      SELECT source AS g, length(text) AS n,
             length(text) - length(regexp_replace(text,
               '[a-zA-Z]', '', 'g')) AS lat,
             length(text) - length(regexp_replace(text,
               '[0-9]', '', 'g')) AS dig,
             length(text) - length(regexp_replace(text,
               '[ \t\n\r]', '', 'g')) AS sp,
             length(text) - length(regexp_replace(text,
               '[.,;:!?''"()\\[\\]{{}}<>/\\\\|@#$%^&*_+=~`-]', '', 'g'))
               AS pun
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
    ),
    agg AS (
      SELECT g, count(*) AS n_docs, sum(n)::BIGINT AS chars,
             sum(lat) AS l, sum(dig) AS d, sum(sp) AS s, sum(pun) AS p
      FROM base GROUP BY 1
    )
    SELECT g AS "group", n_docs::BIGINT AS n_docs, chars,
           round(CASE WHEN chars != 0 THEN l::DOUBLE / chars::DOUBLE END,
                 9) AS latin_share,
           round(CASE WHEN chars != 0 THEN d::DOUBLE / chars::DOUBLE END,
                 9) AS digit_share,
           round(CASE WHEN chars != 0 THEN s::DOUBLE / chars::DOUBLE END,
                 9) AS space_share,
           round(CASE WHEN chars != 0 THEN p::DOUBLE / chars::DOUBLE END,
                 9) AS punct_share,
           round(CASE WHEN chars != 0 THEN
             (chars - l - d - s - p)::DOUBLE / chars::DOUBLE END, 9)
             AS other_share
    FROM agg
    """,
)
def text_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per source
    (operators.textstats.script_profile) — latin/digit/space/punct/other
    shares; a high `other` share on a latin-labeled source is a
    mislabeling or mojibake flag before any model-based language ID."""
    from ..operators.textstats import script_profile

    return script_profile(_t(spark, sf_dir, "documents"))


@_q(
    "vocab_simpson_diversity",
    """
    WITH wc AS (
      SELECT source AS g, t.w AS w, count(*) AS c
      FROM documents,
           unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(w)
      WHERE text IS NOT NULL AND source IS NOT NULL
      GROUP BY 1, 2
    ),
    agg AS (
      SELECT g, sum(c) AS n, count(*) AS n_types,
             sum(c::HUGEINT * (c - 1)::HUGEINT) AS pairs,
             max(c) AS maxc
      FROM wc GROUP BY 1
    )
    SELECT g AS "group", n::BIGINT AS n_tokens,
           n_types::BIGINT AS n_types,
           round(CASE WHEN n >= 2 THEN
             1.0 - pairs::DOUBLE / (n::DOUBLE * (n::DOUBLE - 1)) END, 9)
             AS simpson_d,
           round(CASE WHEN n >= 2 AND pairs != 0 THEN
             1.0 / (pairs::DOUBLE / (n::DOUBLE * (n::DOUBLE - 1))) END, 9)
             AS inv_simpson,
           round(maxc::DOUBLE / n::DOUBLE, 9) AS berger_parker
    FROM agg
    """,
)
def vocab_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson vocabulary diversity per source
    (operators.textstats.simpson_diversity) — dominance-weighted
    "probability two random tokens match" with inverse-Simpson and
    Berger–Parker; exact integer combinatorics over the (source, word)
    count table.  Template spam shows here before it moves entropy."""
    from ..operators.textstats import simpson_diversity

    return simpson_diversity(_t(spark, sf_dir, "documents"))


@_q(
    "term_burstiness_top",
    """
    WITH nd AS (
      SELECT count(*)::BIGINT AS ndocs FROM documents
      WHERE text IS NOT NULL
    ),
    per AS (
      SELECT t.w AS w, doc_id, count(*) AS c
      FROM documents,
           unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(w)
      WHERE text IS NOT NULL
      GROUP BY 1, 2
    ),
    stats AS (
      SELECT w, sum(c)::BIGINT AS tot, count(*)::BIGINT AS docs,
             sum((c * c)::HUGEINT) AS sq
      FROM per GROUP BY 1
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY tot DESC, w) AS rk
      FROM stats
    )
    SELECT w AS term, tot AS total, docs AS docs_with,
           round(tot::DOUBLE / ndocs::DOUBLE, 9) AS mean,
           round(sq::DOUBLE / ndocs::DOUBLE
                 - (tot::DOUBLE / ndocs::DOUBLE)
                   * (tot::DOUBLE / ndocs::DOUBLE), 9) AS variance,
           round(CASE WHEN tot::DOUBLE / ndocs::DOUBLE != 0 THEN
             (sq::DOUBLE / ndocs::DOUBLE
              - (tot::DOUBLE / ndocs::DOUBLE)
                * (tot::DOUBLE / ndocs::DOUBLE))
             / (tot::DOUBLE / ndocs::DOUBLE) END, 9) AS fano
    FROM ranked CROSS JOIN nd WHERE rk <= 20
    """,
)
def term_burstiness_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano-factor burstiness (zeros included via the corpus doc count —
    no dense join) of the top-20 corpus terms
    (operators.textstats.term_burstiness) — content words clump, function
    words spread; the dispersion readout raw frequency can't give."""
    from ..operators.textstats import term_burstiness

    return term_burstiness(_t(spark, sf_dir, "documents"), top_k=20)


@_q(
    "text_compressibility",
    """
    WITH letters AS (
      SELECT unnest(string_split('a b c d e f g h i j k l m n o p q r s'
               || ' t u v w x y z', ' ')) AS ch
    ),
    per_ch AS (
      SELECT doc_id, source, ch,
             length(lower(text))
               - length(translate(lower(text), ch, '')) AS c
      FROM documents CROSS JOIN letters
      WHERE text IS NOT NULL AND source IS NOT NULL
    ),
    ent AS (
      SELECT doc_id, source, max(tot)::DOUBLE AS total,
             round(sum(CASE WHEN c > 0 THEN
               -(c::DOUBLE / tot::DOUBLE) * log2(c::DOUBLE / tot::DOUBLE)
               ELSE 0.0 END), 6) AS en
      FROM (SELECT *, sum(c) OVER (PARTITION BY doc_id) AS tot
            FROM per_ch)
      GROUP BY 1, 2
    ),
    dr AS (
      SELECT doc_id, source AS g,
             CASE WHEN len(regexp_extract_all(lower(text),
                    '[a-z0-9]+')) != 0 THEN
               round(len(list_distinct(regexp_extract_all(lower(text),
                       '[a-z0-9]+')))::DOUBLE
                     / len(regexp_extract_all(lower(text),
                         '[a-z0-9]+'))::DOUBLE, 6) END AS drv
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
    ),
    j AS (
      SELECT g, drv,
             CASE WHEN total > 0 THEN en ELSE 0.0 END AS env
      FROM dr JOIN ent USING (doc_id)
    )
    SELECT g AS "group", count(*)::BIGINT AS n_docs,
           round(sum(CAST(drv AS DECIMAL(28,6)))::DOUBLE
                 / count(*)::DOUBLE, 9) AS mean_distinct_ratio,
           round(sum(CAST(env AS DECIMAL(28,6)))::DOUBLE
                 / count(*)::DOUBLE, 9) AS mean_char_entropy,
           sum(CAST((env < 3.5 OR drv < 0.4) AS INT))::BIGINT AS flagged,
           round(sum(CAST((env < 3.5 OR drv < 0.4) AS INT))::DOUBLE
                 / count(*)::DOUBLE, 9) AS flagged_share
    FROM j GROUP BY 1
    """,
)
def text_compressibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source compressibility proxy: distinct-token ratio + char
    unigram entropy with flagging
    (operators.textstats.compressibility_proxy) — the row-local
    gzip-pass stand-in that finds templated/machine text without
    scheduling a compression job over 100 TB."""
    from ..operators.textstats import compressibility_proxy

    return compressibility_proxy(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Round 9 — graph widening + behavior-chain analytics
# --------------------------------------------------------------------------
#: Shared denoised part co-occurrence edge CTE (the basket_part_pairs /
#: graph_pagerank_parts support>=2 filter) with symmetric closure + degrees.
_DUCK_PART_GRAPH = """
    edges AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    sym AS (SELECT src, dst FROM edges
            UNION ALL SELECT dst, src FROM edges),
    deg AS (SELECT src, count(*) AS d FROM sym GROUP BY 1)
"""


def _part_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared Spark twin of _DUCK_PART_GRAPH's `edges` CTE."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("src", "dst")
    )


@_q(
    "graph_assortativity",
    f"""
    WITH {_DUCK_PART_GRAPH},
    stubs AS (
      SELECT s.dst, d1.d AS du FROM sym s JOIN deg d1 ON s.src = d1.src
    ),
    stubs2 AS (
      SELECT st.du, d2.d AS dv FROM stubs st JOIN deg d2
        ON st.dst = d2.src
    ),
    agg AS (
      SELECT count(*)::HUGEINT AS m2,
             sum(du::HUGEINT) AS sx, sum(dv::HUGEINT) AS sy,
             sum(du::HUGEINT * du::HUGEINT) AS sxx,
             sum(dv::HUGEINT * dv::HUGEINT) AS syy,
             sum(du::HUGEINT * dv::HUGEINT) AS sxy
      FROM stubs2
    ),
    nodes AS (SELECT count(*) AS n_nodes FROM deg)
    SELECT n_nodes::BIGINT AS n_nodes, (m2 / 2)::BIGINT AS n_edges,
           round(CASE WHEN
             sqrt((m2 * sxx - sx * sx)::DOUBLE)
             * sqrt((m2 * syy - sy * sy)::DOUBLE) != 0
           THEN (m2 * sxy - sx * sy)::DOUBLE
                / (sqrt((m2 * sxx - sx * sx)::DOUBLE)
                   * sqrt((m2 * syy - sy * sy)::DOUBLE)) END, 9)
             AS assortativity
    FROM agg CROSS JOIN nodes
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the denoised part co-occurrence graph
    (operators.graph.degree_assortativity) — do hub parts co-occur with
    hub parts (r > 0) or with one-off accessories (r < 0)?  Newman's
    stub-pair Pearson over exact integer degree sums."""
    from ..operators.graph import degree_assortativity

    return degree_assortativity(_part_edges(spark, sf_dir))


@_q(
    "graph_link_prediction",
    f"""
    WITH {_DUCK_PART_GRAPH},
    mid AS (
      SELECT s.src AS v, s.dst AS u, d.d AS dv
      FROM sym s JOIN deg d ON s.src = d.src WHERE d.d <= 50
    ),
    pairs AS (
      SELECT a.u AS node_u, b.u AS node_w, count(*) AS cn,
             sum(CAST(CASE WHEN a.dv >= 2
                   THEN round(1.0 / ln(a.dv::DOUBLE), 9)
                   ELSE 0.0 END AS DECIMAL(28,9))) AS aa
      FROM mid a JOIN mid b ON a.v = b.v AND a.u < b.u
      GROUP BY 1, 2
    ),
    non AS (
      SELECT p.* FROM pairs p
      ANTI JOIN sym e ON p.node_u = e.src AND p.node_w = e.dst
    ),
    scored AS (
      SELECT n.node_u, n.node_w, n.cn, n.aa, d1.d AS du, d2.d AS dw
      FROM non n JOIN deg d1 ON n.node_u = d1.src
                 JOIN deg d2 ON n.node_w = d2.src
    )
    SELECT node_u, node_w, cn::BIGINT AS common_neighbors,
           round(cn::DOUBLE / (du::DOUBLE + dw::DOUBLE - cn::DOUBLE), 9)
             AS jaccard,
           round(aa::DOUBLE, 9) AS adamic_adar
    FROM (
      SELECT *, row_number() OVER (ORDER BY aa DESC, node_u, node_w)
               AS rk
      FROM scored
    ) WHERE rk <= 20
    """,
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbors / Jaccard / Adamic–Adar link prediction over the
    part graph (operators.graph.link_prediction_scores) — the top-20
    NON-edges most likely to be real co-purchases; hub intermediates
    above degree 50 excluded first so candidate fan-out stays bounded
    at any scale."""
    from ..operators.graph import link_prediction_scores

    return link_prediction_scores(
        _part_edges(spark, sf_dir), top_k=20, max_hub_degree=50
    )


@_q(
    "graph_bfs_layers",
    f"""
    WITH {_DUCK_PART_GRAPH},
    nodes AS (SELECT DISTINCT src AS node FROM sym),
    seeds AS (SELECT node FROM nodes ORDER BY node LIMIT 3),
    l1 AS (
      SELECT DISTINCT s.dst AS node FROM sym s
      JOIN seeds ON s.src = seeds.node
      WHERE s.dst NOT IN (SELECT node FROM seeds)
    ),
    l2 AS (
      SELECT DISTINCT s.dst AS node FROM sym s
      JOIN l1 ON s.src = l1.node
      WHERE s.dst NOT IN (SELECT node FROM seeds
                          UNION ALL SELECT node FROM l1)
    ),
    l3 AS (
      SELECT DISTINCT s.dst AS node FROM sym s
      JOIN l2 ON s.src = l2.node
      WHERE s.dst NOT IN (SELECT node FROM seeds
                          UNION ALL SELECT node FROM l1
                          UNION ALL SELECT node FROM l2)
    )
    SELECT layer, count(*)::BIGINT AS n_nodes FROM (
      SELECT 0 AS layer, node FROM seeds
      UNION ALL SELECT 1, node FROM l1
      UNION ALL SELECT 2, node FROM l2
      UNION ALL SELECT 3, node FROM l3
    ) GROUP BY 1
    """,
)
def graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS layer sizes (depth ≤ 3) from the three smallest part ids over
    the co-occurrence graph (operators.graph.bfs_layers) — the
    blast-radius readout: per-level frontier⋈edges joins with anti-join
    visited sets, the shape a 1000-executor BFS actually runs."""
    from ..operators.graph import bfs_layers

    edges = _part_edges(spark, sf_dir)
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    seeds = nodes.orderBy("node").limit(3)
    return bfs_layers(edges, seeds, max_depth=3)


def _markov_oracle(iterations: int = 25) -> str:
    # Every CTE is MATERIALIZED: DuckDB inlines single-reference CTEs,
    # and a 25-deep inlined chain (each level also inlining p/states)
    # explodes planning time — materialization keeps it linear.
    head = """
    WITH pairs AS MATERIALIZED (
      SELECT f, t2, count(*) AS n FROM (
        SELECT event_type AS f,
               lead(event_type) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS t2
        FROM events WHERE event_type IS NOT NULL
      ) WHERE t2 IS NOT NULL GROUP BY 1, 2
    ),
    rowtot AS MATERIALIZED (SELECT f, sum(n) AS tot FROM pairs
                            GROUP BY 1),
    p AS MATERIALIZED (
      SELECT pairs.f, pairs.t2, pairs.n::DOUBLE / rowtot.tot::DOUBLE AS p
      FROM pairs JOIN rowtot USING (f)
    ),
    states AS MATERIALIZED (SELECT DISTINCT f FROM p),
    v0 AS MATERIALIZED (
      SELECT f AS s,
             CAST(round(1.0 / (SELECT count(*) FROM states)::DOUBLE, 9)
                  AS DECIMAL(28,9)) AS val
      FROM states
    )"""
    steps = []
    for i in range(1, iterations + 1):
        steps.append(f""",
    v{i} AS MATERIALIZED (
      SELECT p.t2 AS s,
             sum(CAST(round(CAST(v.val AS DOUBLE) * p.p, 9)
                      AS DECIMAL(28,9))) AS val
      FROM v{i - 1} v JOIN p ON v.s = p.f
      WHERE p.t2 IN (SELECT f FROM states)
      GROUP BY 1
    )""")
    tail = f"""
    SELECT s AS event_type,
           round(CAST(val AS DOUBLE), 9) AS stationary_prob
    FROM v{iterations}
    """
    return head + "".join(steps) + tail


@_q("markov_stationary_events", _markov_oracle(25))
def markov_stationary_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-behavior Markov chain over
    event types (operators.funnel.markov_stationary, 25 synchronous
    power steps run INSIDE the engine as chained k-row joins — no
    driver-side linear algebra).  The long-run "where do sessions spend
    their time" summary event_transitions' one-step shares can't give;
    the oracle unrolls the same 25 steps as chained CTEs and matches
    bit-for-bit through per-step 9-dp decimal cuts."""
    from ..operators.funnel import markov_stationary

    return markov_stationary(_t(spark, sf_dir, "events"), iterations=25)


@_q(
    "attribution_time_decay",
    """
    WITH conv AS (
      SELECT user_id, min(ts) AS cts FROM events
      WHERE event_type = 'purchase' GROUP BY 1
    ),
    touch AS (
      SELECT e.user_id, e.event_type AS ty,
             epoch_us(conv.cts::TIMESTAMP) // 1000000
               - epoch_us(e.ts::TIMESTAMP) // 1000000 AS dsec
      FROM events e JOIN conv USING (user_id)
      WHERE e.event_type IN ('view', 'click') AND e.ts < conv.cts
        AND epoch_us(conv.cts::TIMESTAMP) // 1000000
            - epoch_us(e.ts::TIMESTAMP) // 1000000 <= 604800
    ),
    wtd AS (
      SELECT user_id, ty,
             round(pow(0.5, (dsec::DOUBLE / 86400.0) / 3.0), 9) AS w
      FROM touch
    ),
    shared AS (
      SELECT user_id, ty,
             round(w / (sum(CAST(w AS DECIMAL(28,9)))
                        OVER (PARTITION BY user_id))::DOUBLE, 9)
               AS share
      FROM wtd
    )
    SELECT ty AS event_type,
           count(DISTINCT user_id)::BIGINT AS conversions,
           count(*)::BIGINT AS touches,
           round(sum(CAST(share AS DECIMAL(28,9)))::DOUBLE, 9) AS credit
    FROM shared GROUP BY 1
    """,
)
def attribution_time_decay_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution (half-life 3 days, 7-day
    lookback before each user's first purchase)
    (operators.funnel.attribution_time_decay) — exp-decayed credit
    normalized per conversion; the honest middle between last-touch and
    linear.  Exact epoch-second deltas, 9-dp weight cuts."""
    from ..operators.funnel import attribution_time_decay

    return attribution_time_decay(_t(spark, sf_dir, "events"))



# --------------------------------------------------------------------------
# Round 9 window fillers: robust / tail / metric-distance statistics
# --------------------------------------------------------------------------
@_q(
    "hellinger_doclen_sources",
    """
    WITH joint AS (
      SELECT source AS g, (n_chars // 200)::VARCHAR AS k, count(*) AS o
      FROM documents
      WHERE source IS NOT NULL AND n_chars IS NOT NULL
      GROUP BY 1, 2
    ),
    grp AS (SELECT g, sum(o) AS ng FROM joint GROUP BY 1),
    keyc AS (SELECT k, sum(o) AS nk FROM joint GROUP BY 1),
    tot AS (SELECT sum(o) AS n FROM joint),
    cells AS (
      SELECT grp.g, grp.ng, keyc.nk, tot.n, coalesce(joint.o, 0) AS o
      FROM grp CROSS JOIN keyc
      LEFT JOIN joint ON joint.g = grp.g AND joint.k = keyc.k
      CROSS JOIN tot
    ),
    agg AS (
      SELECT g, max(ng) AS n,
             sum(CAST(sqrt((o::DOUBLE / ng::DOUBLE)
                           * (nk::DOUBLE / n::DOUBLE))
                      AS DECIMAL(28,12))) AS bc
      FROM cells GROUP BY 1
    )
    SELECT g AS source, n::BIGINT AS n, round(bc::DOUBLE, 9) AS bc,
           round(sqrt(greatest(0.0, 1.0 - bc::DOUBLE)), 9) AS hellinger
    FROM agg
    """,
)
def hellinger_doclen_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Hellinger distance between the source's doc-length
    distribution (200-char equi-width bins) and the corpus's
    (operators.profile.hellinger_by_group) — the metric drift readout
    beside js_source_lang_divergence: JSD gives bits, Hellinger gives a
    true metric whose deltas chain across releases.  One corpus-sized
    (source, bin) count groupBy; cell grid by crossed broadcast
    marginals; decimal-carried cell sums."""
    from ..operators.profile import hellinger_by_group

    docs = _t(spark, sf_dir, "documents").select(
        "source",
        F.floor(F.col("n_chars") / F.lit(200)).cast("int").alias("len_bin"),
    )
    return hellinger_by_group(docs, "len_bin", "source")


@_q(
    "hill_tail_price",
    """
    WITH top AS (
      SELECT o_totalprice::DOUBLE AS v FROM orders
      WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
      ORDER BY v DESC LIMIT 101
    ),
    mn AS (SELECT min(v) AS xm, count(*) AS cnt FROM top),
    s AS (
      SELECT sum(CAST(round(ln(v / xm), 9) AS DECIMAL(28,9))) AS s,
             max(cnt) AS cnt, max(xm) AS xm
      FROM top CROSS JOIN mn
    )
    SELECT CAST(100 AS BIGINT) AS k, round(xm, 9) AS x_tail_min,
           CASE WHEN cnt >= 101 AND s::DOUBLE > 0
                THEN round(100.0 / s::DOUBLE, 9) END AS hill_alpha
    FROM s
    """,
)
def hill_tail_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimate over the top-100 order totals
    (operators.profile.hill_tail_index) — the "how heavy is the revenue
    tail" scalar that decides whether mean-based dashboards are even
    meaningful (alpha <= 2: variance-infinite, use medians).  The top-k
    order statistics arrive via TakeOrderedAndProject (per-partition
    heap + driver merge, no global sort) — the only order-statistic
    access pattern that survives a 100 TB column."""
    from ..operators.profile import hill_tail_index

    return hill_tail_index(_t(spark, sf_dir, "orders"), "o_totalprice", k=100)


@_q(
    "mahalanobis_outlier_docs",
    """
    WITH feats AS (
      SELECT doc_id::BIGINT AS doc_id, n_chars::BIGINT AS n_chars,
             len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT
               AS n_tokens,
             len(regexp_extract_all(text, '[.,!?;:]'))::BIGINT AS n_punct
      FROM documents
    ),
    base AS (
      SELECT * FROM feats
      WHERE n_chars IS NOT NULL AND n_tokens IS NOT NULL
        AND n_punct IS NOT NULL
    ),
    mom AS (
      SELECT count(*) AS n,
             sum(n_chars::HUGEINT) AS s1,
             sum(n_chars::HUGEINT * n_chars::HUGEINT) AS q1,
             sum(n_tokens::HUGEINT) AS s2,
             sum(n_tokens::HUGEINT * n_tokens::HUGEINT) AS q2,
             sum(n_punct::HUGEINT) AS s3,
             sum(n_punct::HUGEINT * n_punct::HUGEINT) AS q3
      FROM base
    ),
    mm AS (
      SELECT n::DOUBLE AS nd,
             s1::DOUBLE / n::DOUBLE AS mu1, s2::DOUBLE / n::DOUBLE AS mu2,
             s3::DOUBLE / n::DOUBLE AS mu3,
             q1::DOUBLE / n::DOUBLE - (s1::DOUBLE / n::DOUBLE)
               * (s1::DOUBLE / n::DOUBLE) AS v1,
             q2::DOUBLE / n::DOUBLE - (s2::DOUBLE / n::DOUBLE)
               * (s2::DOUBLE / n::DOUBLE) AS v2,
             q3::DOUBLE / n::DOUBLE - (s3::DOUBLE / n::DOUBLE)
               * (s3::DOUBLE / n::DOUBLE) AS v3
      FROM mom
    )
    SELECT doc_id, n_chars, n_tokens, n_punct,
           round(
             coalesce((n_chars::DOUBLE - mu1) * (n_chars::DOUBLE - mu1)
               / nullif(v1, 0), 0)
             + coalesce((n_tokens::DOUBLE - mu2) * (n_tokens::DOUBLE - mu2)
               / nullif(v2, 0), 0)
             + coalesce((n_punct::DOUBLE - mu3) * (n_punct::DOUBLE - mu3)
               / nullif(v3, 0), 0), 9) AS d2
    FROM base CROSS JOIN mm
    ORDER BY d2 DESC, doc_id ASC LIMIT 10
    """,
)
def mahalanobis_outlier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 joint outliers by diagonal-covariance Mahalanobis distance
    over (n_chars, token count, punctuation count)
    (operators.profile.mahalanobis_diag_outliers) — the multivariate
    screen per-column z-fences can't do.  Scan 1 reduces exact integer
    moments to one broadcast row; scan 2 scores + TakeOrderedAndProject
    keeps the global top-10, id-tiebroken."""
    from ..operators.profile import mahalanobis_diag_outliers
    from ..operators.textstats import tokens

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(tokens("text")).cast("long").alias("n_tokens"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[.,!?;:]"), 0)
        ).cast("long").alias("n_punct"),
    )
    return mahalanobis_diag_outliers(
        docs, "doc_id", ["n_chars", "n_tokens", "n_punct"], top_k=10
    )


@_q("huber_location_price", """
    WITH vals AS MATERIALIZED (
      SELECT o_totalprice::DOUBLE AS v FROM orders
      WHERE o_totalprice IS NOT NULL
    ),
    cnt AS (SELECT v, count(*) AS c FROM vals GROUP BY 1),
    med AS MATERIALIZED (
      SELECT v AS m, tot AS n FROM (
        SELECT v, sum(c) OVER (ORDER BY v) AS cum,
               sum(c) OVER () AS tot FROM cnt
      ) WHERE cum * 2 >= tot ORDER BY v LIMIT 1
    ),
    ad AS (SELECT abs(v - (SELECT m FROM med)) AS a FROM vals),
    acnt AS (SELECT a, count(*) AS c FROM ad GROUP BY 1),
    mad AS MATERIALIZED (
      SELECT a AS s FROM (
        SELECT a, sum(c) OVER (ORDER BY a) AS cum,
               sum(c) OVER () AS tot FROM acnt
      ) WHERE cum * 2 >= tot ORDER BY a LIMIT 1
    ),
    it0 AS (SELECT (SELECT m FROM med) AS mu),
    it1 AS MATERIALIZED (
      SELECT CASE WHEN (SELECT s FROM mad) > 0 THEN
               CAST(sum(CAST(round(w * v, 9) AS DECIMAL(28,9))) AS DOUBLE)
             / CAST(sum(CAST(round(w, 9) AS DECIMAL(28,9))) AS DOUBLE)
             ELSE (SELECT m FROM med) END AS mu
      FROM (
        SELECT v,
               CASE WHEN (SELECT s FROM mad) > 0
                     AND abs(v - (SELECT mu FROM it0))
                         > 1.345 * (SELECT s FROM mad)
                    THEN 1.345 * (SELECT s FROM mad)
                         / abs(v - (SELECT mu FROM it0))
                    ELSE 1.0 END AS w
        FROM vals
      )
    ),
    it2 AS MATERIALIZED (
      SELECT CASE WHEN (SELECT s FROM mad) > 0 THEN
               CAST(sum(CAST(round(w * v, 9) AS DECIMAL(28,9))) AS DOUBLE)
             / CAST(sum(CAST(round(w, 9) AS DECIMAL(28,9))) AS DOUBLE)
             ELSE (SELECT m FROM med) END AS mu
      FROM (
        SELECT v,
               CASE WHEN (SELECT s FROM mad) > 0
                     AND abs(v - (SELECT mu FROM it1))
                         > 1.345 * (SELECT s FROM mad)
                    THEN 1.345 * (SELECT s FROM mad)
                         / abs(v - (SELECT mu FROM it1))
                    ELSE 1.0 END AS w
        FROM vals
      )
    ),
    it3 AS MATERIALIZED (
      SELECT CASE WHEN (SELECT s FROM mad) > 0 THEN
               CAST(sum(CAST(round(w * v, 9) AS DECIMAL(28,9))) AS DOUBLE)
             / CAST(sum(CAST(round(w, 9) AS DECIMAL(28,9))) AS DOUBLE)
             ELSE (SELECT m FROM med) END AS mu
      FROM (
        SELECT v,
               CASE WHEN (SELECT s FROM mad) > 0
                     AND abs(v - (SELECT mu FROM it2))
                         > 1.345 * (SELECT s FROM mad)
                    THEN 1.345 * (SELECT s FROM mad)
                         / abs(v - (SELECT mu FROM it2))
                    ELSE 1.0 END AS w
        FROM vals
      )
    ),
    mean_df AS (
      SELECT CAST(sum(CAST(round(v, 9) AS DECIMAL(28,9))) AS DOUBLE)
           / count(*)::DOUBLE AS mean FROM vals
    )
    SELECT (SELECT n FROM med)::BIGINT AS n,
           round((SELECT m FROM med), 9) AS median_low,
           round((SELECT s FROM mad), 9) AS mad_low,
           round((SELECT mean FROM mean_df), 9) AS mean,
           round((SELECT mu FROM it3), 9) AS huber_mu
    """)
def huber_location_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber M-estimator of the order-total location (c = 1.345, 3 fixed
    IRLS steps) beside the lower median, lower MAD and decimal-exact mean
    (operators.profile.huber_location) — the robust center a heavy tail
    can't own and a median doesn't waste.  Exact order statistics off the
    distinct-value axis; each IRLS step one decimal-carried scan with the
    current mu broadcast; loop unrolled as chained CTEs in the oracle."""
    from ..operators.profile import huber_location

    return huber_location(
        _t(spark, sf_dir, "orders"), "o_totalprice", c=1.345, iterations=3
    )



@_q(
    "pettitt_daily_value",
    """
    WITH b AS (
      SELECT date_trunc('day', ts)::TIMESTAMP AS bk,
             CAST(round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                        / count(*)::DOUBLE, 6) AS DECIMAL(28,6)) AS m
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1
    ),
    v AS (
      SELECT a.bk AS ba,
             sum(sign(a.m::DOUBLE - c.m::DOUBLE)::BIGINT)::BIGINT AS v
      FROM b a CROSS JOIN b c
      GROUP BY 1
    ),
    u AS (
      SELECT ba, sum(v) OVER (ORDER BY ba) AS u,
             count(*) OVER () AS n,
             row_number() OVER (ORDER BY ba) AS rn
      FROM v
    ),
    picked AS (
      SELECT * FROM u WHERE rn < n ORDER BY abs(u) DESC, ba ASC LIMIT 1
    )
    SELECT n::BIGINT AS n_buckets, ba AS change_bucket,
           abs(u)::BIGINT AS k_stat,
           round(least(1.0, 2.0 * exp(
             -6.0 * abs(u)::DOUBLE * abs(u)::DOUBLE
             / (n::DOUBLE * n::DOUBLE * n::DOUBLE
                + n::DOUBLE * n::DOUBLE))), 9) AS p_approx
    FROM picked
    """,
)
def pettitt_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt change-point test over daily event-value means
    (operators.timeseries.pettitt_changepoint) — WHERE the level
    shifted, rank-based so no spike or distribution assumption buys it;
    the localization companion to ts_cusum_changepoint's parametric
    CUSUM.  O(days squared) sign pairs on the bucket axis only, exact
    integer U path, earliest-bucket tiebreak."""
    from ..operators.timeseries import pettitt_changepoint

    return pettitt_changepoint(_t(spark, sf_dir, "events"))


@_q(
    "grubbs_daily_value",
    """
    WITH b AS (
      SELECT date_trunc('day', ts)::TIMESTAMP AS bk,
             CAST(round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                        / count(*)::DOUBLE, 6) AS DECIMAL(18,6)) AS m
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1
    ),
    mom AS (
      SELECT bk, m, count(*) OVER () AS n,
             sum(m) OVER () AS s,
             sum(m * m) OVER () AS q
      FROM b
    ),
    scored AS (
      SELECT bk, m, n, s, q,
             abs(n::DECIMAL(18,0) * m - s) AS anum,
             (n::DECIMAL(18,0) * m - s) AS num
      FROM mom
    ),
    picked AS (SELECT * FROM scored ORDER BY anum DESC, bk ASC LIMIT 1),
    fin AS (
      SELECT n, s, q, bk, m, anum, num,
             CASE WHEN n >= 2 THEN sqrt(greatest(0.0,
               (n::DOUBLE * q::DOUBLE - s::DOUBLE * s::DOUBLE)
               / (n::DOUBLE * (n::DOUBLE - 1.0)))) END AS sd
      FROM picked
    )
    SELECT n::BIGINT AS n_buckets,
           round(s::DOUBLE / n::DOUBLE, 9) AS mean,
           round(sd, 9) AS sd,
           bk AS outlier_bucket,
           round(m::DOUBLE, 9) AS outlier_value,
           round(CASE WHEN n >= 2 AND sd > 0
                 THEN (anum::DOUBLE / n::DOUBLE) / sd END, 9) AS g_stat,
           CASE WHEN num::DOUBLE >= 0 THEN 'max' ELSE 'min' END AS side
    FROM fin
    """,
)
def grubbs_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs extreme-outlier statistic over daily event-value means
    (operators.timeseries.grubbs_extreme) — is the single worst day an
    outlier, and which one; the single-point alarm beside Pettitt's
    level-shift localization.  Exact decimal deviation numerators and
    moment sums (no intermediate double rounding), one IEEE expression
    per series at the end; earliest-bucket tiebreak on the exact max
    deviation."""
    from ..operators.timeseries import grubbs_extreme

    return grubbs_extreme(_t(spark, sf_dir, "events"))


@_q(
    "gumbel_hourly_burst",
    """
    WITH sub AS (
      SELECT date_trunc('day', ts) AS blk, date_trunc('hour', ts) AS sb,
             count(*) AS c
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    mx AS (SELECT blk, max(c) AS x FROM sub GROUP BY 1),
    mom AS (
      SELECT count(*) AS n, sum(x::HUGEINT) AS s,
             sum(x::HUGEINT * x::HUGEINT) AS q
      FROM mx
    ),
    fit AS (
      SELECT n, s::DOUBLE / n::DOUBLE AS mean,
             sqrt(greatest(0.0,
               (q::DOUBLE - n::DOUBLE * (s::DOUBLE / n::DOUBLE)
                  * (s::DOUBLE / n::DOUBLE))
               / (n::DOUBLE - 1.0))) AS sd
      FROM mom
    ),
    g AS (
      SELECT n, mean, sd,
             sd * sqrt(6.0) / 3.141592653589793 AS beta
      FROM fit
    )
    SELECT n::BIGINT AS n_blocks, round(mean, 9) AS mean_max,
           round(CASE WHEN n >= 2 THEN sd END, 9) AS sd_max,
           round(CASE WHEN n >= 2
                 THEN mean - 0.5772156649015329 * beta END, 9)
             AS gumbel_mu,
           round(CASE WHEN n >= 2 THEN beta END, 9) AS gumbel_beta,
           round(CASE WHEN n >= 2
                 THEN (mean - 0.5772156649015329 * beta)
                      - beta * ln(-ln(0.95)) END, 9) AS rl_95,
           round(CASE WHEN n >= 2
                 THEN (mean - 0.5772156649015329 * beta)
                      - beta * ln(-ln(0.99)) END, 9) AS rl_99
    FROM g
    """,
)
def gumbel_hourly_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel extreme-value fit to daily maxima of hourly event counts
    (operators.timeseries.gumbel_block_maxima) — the capacity question
    ("what hourly burst should 99% of days stay under") that pooled
    percentiles structurally miss.  Block maxima are exact integers;
    method-of-moments fit + 95/99% return levels, all
    partial-aggregable."""
    from ..operators.timeseries import gumbel_block_maxima

    return gumbel_block_maxima(_t(spark, sf_dir, "events"))


@_q(
    "granger_clicks_purchases",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS b,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS y
      FROM events
      WHERE ts IS NOT NULL AND event_type IN ('click', 'purchase')
      GROUP BY 1
    ),
    lagged AS (
      SELECT y, lag(y) OVER (ORDER BY b) AS y1,
             lag(x) OVER (ORDER BY b) AS x1
      FROM daily
    ),
    kept AS (SELECT * FROM lagged WHERE y1 IS NOT NULL
             AND x1 IS NOT NULL),
    mom AS (
      SELECT count(*) AS m,
             sum(y::HUGEINT) AS sy, sum(y1::HUGEINT) AS s1,
             sum(x1::HUGEINT) AS s2,
             sum(y::HUGEINT * y::HUGEINT) AS qyy,
             sum(y1::HUGEINT * y1::HUGEINT) AS q11,
             sum(x1::HUGEINT * x1::HUGEINT) AS q22,
             sum(y::HUGEINT * y1::HUGEINT) AS qy1,
             sum(y::HUGEINT * x1::HUGEINT) AS qy2,
             sum(y1::HUGEINT * x1::HUGEINT) AS q12
      FROM kept
    ),
    cen AS (
      SELECT m,
             qyy::DOUBLE - sy::DOUBLE * sy::DOUBLE / m::DOUBLE AS syy,
             q11::DOUBLE - s1::DOUBLE * s1::DOUBLE / m::DOUBLE AS s11,
             q22::DOUBLE - s2::DOUBLE * s2::DOUBLE / m::DOUBLE AS s22,
             qy1::DOUBLE - sy::DOUBLE * s1::DOUBLE / m::DOUBLE AS sy1,
             qy2::DOUBLE - sy::DOUBLE * s2::DOUBLE / m::DOUBLE AS sy2,
             q12::DOUBLE - s1::DOUBLE * s2::DOUBLE / m::DOUBLE AS s12
      FROM mom
    ),
    fit AS (
      SELECT m, sy1 / nullif(s11, 0) AS b_r,
             syy - sy1 * sy1 / nullif(s11, 0) AS rss_r,
             (sy1 * s22 - sy2 * s12)
               / nullif(s11 * s22 - s12 * s12, 0) AS b1,
             (sy2 * s11 - sy1 * s12)
               / nullif(s11 * s22 - s12 * s12, 0) AS b2,
             syy, sy1, sy2
      FROM cen
    ),
    rss AS (
      SELECT m, b_r, rss_r, b1, b2,
             syy - b1 * sy1 - b2 * sy2 AS rss_u
      FROM fit
    )
    SELECT m::BIGINT AS m, round(b_r, 9) AS b_restricted,
           round(rss_r, 9) AS rss_r, round(b1, 9) AS b_y,
           round(b2, 9) AS b_x, round(rss_u, 9) AS rss_u,
           round(CASE WHEN m >= 4 AND rss_u > 0
                 THEN (rss_r - rss_u) / (rss_u / (m::DOUBLE - 3.0))
                 END, 9) AS f_stat
    FROM rss
    """,
)
def granger_clicks_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-lag Granger causality F-test: do yesterday's clicks improve
    today's purchase-count forecast beyond yesterday's purchases
    (operators.timeseries.granger_1lag)?  Closed-form restricted vs
    unrestricted OLS from exact integer cross-moments of the daily count
    series — one conditional-count groupBy, a 1-row lag window over the
    day axis, one moments reduce."""
    from ..operators.timeseries import granger_1lag

    return granger_1lag(
        _t(spark, sf_dir, "events"),
        cause="click",
        effect="purchase",
    )



@_q(
    "friedman_event_types",
    """
    WITH base AS (
      SELECT date_trunc('day', ts) AS blk, event_type AS trt,
             count(*) AS v
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    kd AS (SELECT count(DISTINCT trt) AS k FROM base),
    complete AS (
      SELECT blk FROM base GROUP BY 1
      HAVING count(DISTINCT trt) = (SELECT k FROM kd)
    ),
    kept AS (SELECT base.* FROM base JOIN complete USING (blk)),
    ranked AS (
      SELECT blk, trt,
             2 * rank() OVER (PARTITION BY blk ORDER BY v)
               + count(*) OVER (PARTITION BY blk, v) - 1 AS r2
      FROM kept
    ),
    pt AS (
      SELECT trt, sum(r2)::HUGEINT AS rr, count(*) AS n,
             sum(r2 * r2)::HUGEINT AS q2
      FROM ranked GROUP BY 1
    ),
    agg AS (
      SELECT max(n) AS n, max((SELECT k FROM kd)) AS k,
             sum((rr - n * ((SELECT k FROM kd) + 1))
                 * (rr - n * ((SELECT k FROM kd) + 1))) AS num,
             sum(q2) AS sq2
      FROM pt
    )
    SELECT n::BIGINT AS n_blocks, k::BIGINT AS k,
           round(CASE WHEN n >= 1 AND k >= 2
                       AND (sq2 - n * k * (k + 1) * (k + 1))::DOUBLE > 0
                 THEN (k - 1)::DOUBLE * num::DOUBLE
                      / (sq2 - n * k * (k + 1) * (k + 1))::DOUBLE
                 END, 9) AS q_stat,
           (k - 1)::BIGINT AS df
    FROM agg
    """,
)
def friedman_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test across event types blocked by day
    (operators.evaluation.friedman_test) — the repeated-measures
    companion to kw_doclen_by_lang: daily counts share each day's
    traffic level, so rank WITHIN the day before asking whether the k
    types differ.  Doubled midranks keep the tie-corrected statistic in
    exact integers to the final division; windows run over k rows per
    block only."""
    from ..operators.evaluation import friedman_test

    daily = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .groupBy(
            F.date_trunc("day", F.col("ts")).alias("blk"),
            F.col("event_type").alias("trt"),
        )
        .agg(F.count(F.lit(1)).alias("v"))
    )
    return friedman_test(daily, "blk", "trt", "v")


@_q(
    "cochran_q_quality_flags",
    """
    WITH flags AS (
      SELECT (n_chars >= 300) AS f1,
             (len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 56)
               AS f2,
             list_contains(regexp_extract_all(lower(text), '[a-z0-9]+'),
                           'the') AS f3
      FROM documents
      WHERE n_chars IS NOT NULL AND text IS NOT NULL
    ),
    agg AS (
      SELECT count(*) AS n,
             sum(f1::INT + f2::INT + f3::INT)::HUGEINT AS t,
             sum((f1::INT + f2::INT + f3::INT)
                 * (f1::INT + f2::INT + f3::INT))::HUGEINT AS r2,
             sum(f1::INT)::HUGEINT AS c0, sum(f2::INT)::HUGEINT AS c1,
             sum(f3::INT)::HUGEINT AS c2
      FROM flags
    )
    SELECT n::BIGINT AS n, CAST(3 AS BIGINT) AS k,
           round(CASE WHEN (3 * t - r2)::DOUBLE > 0
                 THEN 2.0 * (3 * (c0 * c0 + c1 * c1 + c2 * c2)
                             - t * t)::DOUBLE
                      / (3 * t - r2)::DOUBLE END, 9) AS q_stat,
           CAST(2 AS BIGINT) AS df
    FROM agg
    """,
)
def cochran_q_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q across three binary quality screens on the same docs
    (length >= 300 chars, >= 56 tokens, contains 'the')
    (operators.evaluation.cochran_q_test) — do the screens pass at
    different rates, the k-way McNemar a screen-consolidation decision
    needs.  One scan, integer arithmetic to the final division."""
    from ..operators.evaluation import cochran_q_test
    from ..operators.textstats import tokens

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("text").isNotNull()
    )
    toks = tokens("text")
    flagged = docs.select(
        (F.col("n_chars") >= 300).alias("f1"),
        (F.size(toks) >= 56).alias("f2"),
        F.array_contains(toks, "the").alias("f3"),
    )
    return cochran_q_test(flagged, ["f1", "f2", "f3"])


@_q(
    "mcc_langid_en",
    f"""
    WITH pl AS ({ORACLES["text_lang_id"]}),
    b AS (
      SELECT (predicted_lang = 'en') AS p, (lang = 'en') AS y
      FROM pl WHERE predicted_lang IS NOT NULL AND lang IS NOT NULL
    ),
    agg AS (
      SELECT sum(CASE WHEN p AND y THEN 1 ELSE 0 END) AS tp,
             sum(CASE WHEN p AND NOT y THEN 1 ELSE 0 END) AS fp,
             sum(CASE WHEN NOT p AND y THEN 1 ELSE 0 END) AS fn,
             sum(CASE WHEN NOT p AND NOT y THEN 1 ELSE 0 END) AS tn
      FROM b
    )
    SELECT tp::BIGINT AS tp, fp::BIGINT AS fp, fn::BIGINT AS fn,
           tn::BIGINT AS tn,
           round(CASE WHEN sqrt(tp::DOUBLE + fp::DOUBLE)
                        * sqrt(tp::DOUBLE + fn::DOUBLE)
                        * sqrt(tn::DOUBLE + fp::DOUBLE)
                        * sqrt(tn::DOUBLE + fn::DOUBLE) > 0
                 THEN (tp::DOUBLE * tn::DOUBLE - fp::DOUBLE * fn::DOUBLE)
                      / (sqrt(tp::DOUBLE + fp::DOUBLE)
                         * sqrt(tp::DOUBLE + fn::DOUBLE)
                         * sqrt(tn::DOUBLE + fp::DOUBLE)
                         * sqrt(tn::DOUBLE + fn::DOUBLE)) END, 9) AS mcc
    FROM agg
    """,
)
def mcc_langid_en(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation of the n-gram language ID treated as a
    binary en/non-en detector against the stored lang
    (operators.evaluation.mcc_binary) — the imbalance-honest single
    number beside lang_id_class_report's per-class table (accuracy
    rewards the non-en majority; MCC scores a majority predictor 0).
    One exact confusion-count scan; sqrt-factored denominator so no
    integer product can overflow at corpus scale."""
    from ..operators.evaluation import mcc_binary
    from ..operators.textstats import predict_lang

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    pl = predict_lang(docs).select(
        (F.col("predicted_lang") == "en").alias("p"),
        (F.col("lang") == "en").alias("y"),
    )
    return mcc_binary(pl, "p", "y")


@_q(
    "isotonic_purchase_by_activity",
    """
    WITH users AS (
      SELECT user_id, count(*) AS n_events,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS y
      FROM events WHERE user_id IS NOT NULL GROUP BY 1
    ),
    binned AS (
      SELECT ntile(10) OVER (ORDER BY n_events, user_id) AS bin, y
      FROM users
    ),
    bins AS (
      SELECT bin, count(*) AS n, sum(y) AS pos FROM binned GROUP BY 1
    ),
    cum AS (
      SELECT bin, n, pos, sum(n) OVER (ORDER BY bin) AS cn,
             sum(pos) OVER (ORDER BY bin) AS cp
      FROM bins
    ),
    seg AS (
      SELECT a.bin AS a, b.bin AS b,
             (b.cp - (a.cp - a.pos))::DOUBLE
               / (b.cn - (a.cn - a.n))::DOUBLE AS avgr
      FROM cum a JOIN cum b ON b.bin >= a.bin
    ),
    inner_min AS (
      SELECT i.bin AS i, seg.a, min(avgr) AS mn
      FROM cum i JOIN seg ON seg.a <= i.bin AND seg.b >= i.bin
      GROUP BY 1, 2
    ),
    iso AS (SELECT i, max(mn) AS iso FROM inner_min GROUP BY 1)
    SELECT bins.bin::BIGINT AS bin, n::BIGINT AS n, pos::BIGINT AS pos,
           round(pos::DOUBLE / n::DOUBLE, 9) AS rate_raw,
           round(iso, 9) AS rate_iso
    FROM bins JOIN iso ON iso.i = bins.bin
    """,
)
def isotonic_purchase_by_activity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Isotonic (PAVA) fit of purchase propensity against user-activity
    deciles (operators.evaluation.isotonic_calibration) — the monotone
    rate curve behind trend_conversion_by_activity's test: raw decile
    rates zig-zag with sampling noise; the isotonic fit is the closest
    non-decreasing curve, computed by the minimax identity as a
    B-cubed join on a 10-row broadcast table — no sequential PAVA
    loop, no driver state."""
    from ..operators.evaluation import isotonic_calibration

    users = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("y"),
        )
    )
    return isotonic_calibration(users, "n_events", "y", "user_id", n_bins=10)


@_q(
    "cvm_doclen_en_rest",
    """
    WITH u AS (
      SELECT n_chars AS v,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
             CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS b
      FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL
    ),
    counts AS (
      SELECT v, sum(a) AS na, sum(b) AS nb FROM u GROUP BY 1
    ),
    c AS (
      SELECT v, na, nb,
             sum(na) OVER (ORDER BY v) AS ca,
             sum(nb) OVER (ORDER BY v) AS cb,
             sum(na) OVER () AS ta, sum(nb) OVER () AS tb
      FROM counts
    ),
    agg AS (
      SELECT max(ta) AS n, max(tb) AS m,
             sum(CAST(round(
               (ca::DOUBLE / ta::DOUBLE - cb::DOUBLE / tb::DOUBLE)
               * (ca::DOUBLE / ta::DOUBLE - cb::DOUBLE / tb::DOUBLE)
               * ((na + nb)::DOUBLE / (ta + tb)::DOUBLE), 9)
               AS DECIMAL(28,9))) AS s
      FROM c
    )
    SELECT n::BIGINT AS n_a, m::BIGINT AS n_b,
           round(CASE WHEN n > 0 AND m > 0
                 THEN n::DOUBLE * m::DOUBLE / (n::DOUBLE + m::DOUBLE)
                      * s::DOUBLE END, 9) AS cvm_t
    FROM agg
    """,
)
def cvm_doclen_en_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises statistic between en and non-en doc
    lengths (operators.evaluation.cvm_two_sample) — the whole-CDF
    companion to the KS screen: KS sees one worst gap, CvM integrates
    the squared gap over the pooled distribution, so several modest
    shifts accumulate.  Counts-based over the distinct-length axis;
    9-dp decimal-carried term sums."""
    from ..operators.evaluation import cvm_two_sample

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("lang").isNotNull()
    )
    return cvm_two_sample(
        docs.filter(F.col("lang") == "en"),
        docs.filter(F.col("lang") != "en"),
        "n_chars",
    )


@_q(
    "vif_doc_features",
    """
    WITH feats AS (
      SELECT n_chars::BIGINT AS x0,
             len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT
               AS x1,
             len(regexp_extract_all(lower(text), '[a-z0-9]{5,}'))::BIGINT
               AS x2
      FROM documents
      WHERE n_chars IS NOT NULL AND text IS NOT NULL
    ),
    mom AS (
      SELECT count(*) AS n,
             sum(x0::HUGEINT) AS s0, sum(x1::HUGEINT) AS s1,
             sum(x2::HUGEINT) AS s2,
             sum(x0::HUGEINT * x0::HUGEINT) AS q00,
             sum(x0::HUGEINT * x1::HUGEINT) AS q01,
             sum(x0::HUGEINT * x2::HUGEINT) AS q02,
             sum(x1::HUGEINT * x1::HUGEINT) AS q11,
             sum(x1::HUGEINT * x2::HUGEINT) AS q12,
             sum(x2::HUGEINT * x2::HUGEINT) AS q22
      FROM feats
    ),
    cen AS (
      SELECT
        q00::DOUBLE - s0::DOUBLE * s0::DOUBLE / n::DOUBLE AS c00,
        q01::DOUBLE - s0::DOUBLE * s1::DOUBLE / n::DOUBLE AS c01,
        q02::DOUBLE - s0::DOUBLE * s2::DOUBLE / n::DOUBLE AS c02,
        q11::DOUBLE - s1::DOUBLE * s1::DOUBLE / n::DOUBLE AS c11,
        q12::DOUBLE - s1::DOUBLE * s2::DOUBLE / n::DOUBLE AS c12,
        q22::DOUBLE - s2::DOUBLE * s2::DOUBLE / n::DOUBLE AS c22
      FROM mom
    ),
    r AS (
      SELECT c01 / nullif(sqrt(c00) * sqrt(c11), 0) AS r01,
             c02 / nullif(sqrt(c00) * sqrt(c22), 0) AS r02,
             c12 / nullif(sqrt(c11) * sqrt(c22), 0) AS r12
      FROM cen
    ),
    rows_out AS (
      SELECT 'n_chars' AS feature,
             (r01 * r01 + r02 * r02 - 2.0 * r01 * r02 * r12)
               / nullif(1.0 - r12 * r12, 0) AS r2
      FROM r
      UNION ALL
      SELECT 'n_tokens',
             (r01 * r01 + r12 * r12 - 2.0 * r01 * r12 * r02)
               / nullif(1.0 - r02 * r02, 0)
      FROM r
      UNION ALL
      SELECT 'n_long_tokens',
             (r02 * r02 + r12 * r12 - 2.0 * r02 * r12 * r01)
               / nullif(1.0 - r01 * r01, 0)
      FROM r
    )
    SELECT feature, round(r2, 9) AS r2_aux,
           round(1.0 / nullif(1.0 - r2, 0), 9) AS vif
    FROM rows_out
    """,
)
def vif_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-inflation factors over (n_chars, token count, long-token
    count) (operators.evaluation.vif_three) — the multicollinearity
    pre-flight for any regression on the documents feature trio; the
    3-feature auxiliary R-squared is closed-form from pairwise Pearson
    correlations off ONE exact integer-moment scan."""
    from ..operators.evaluation import vif_three

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("text").isNotNull()
    )
    feats = docs.select(
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")),
                                 F.lit("[a-z0-9]+"), 0)
        ).cast("long").alias("n_tokens"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")),
                                 F.lit("[a-z0-9]{5,}"), 0)
        ).cast("long").alias("n_long_tokens"),
    )
    return vif_three(feats, ["n_chars", "n_tokens", "n_long_tokens"])



@_q(
    "neyman_allocation_quality",
    f"""
    WITH q AS ({ORACLES["text_quality_scores"]}),
    j AS (
      SELECT d.source AS h, q.quality_score AS v
      FROM documents d JOIN q USING (doc_id)
      WHERE d.source IS NOT NULL AND q.quality_score IS NOT NULL
    ),
    per AS (
      SELECT h, count(*) AS nh,
             sum(CAST(round(v, 9) AS DECIMAL(28,9))) AS s,
             sum(CAST(round(v * v, 9) AS DECIMAL(28,9))) AS q
      FROM j GROUP BY 1
    ),
    sdd AS (
      SELECT h, nh,
             CASE WHEN nh >= 2 THEN sqrt(greatest(0.0,
               (q::DOUBLE - nh::DOUBLE * (s::DOUBLE / nh::DOUBLE)
                  * (s::DOUBLE / nh::DOUBLE))
               / (nh::DOUBLE - 1.0))) END AS sd
      FROM per
    ),
    win AS (
      SELECT h, nh, sd,
             sum(nh) OVER () AS n,
             sum(CAST(round(nh::DOUBLE * sd, 9) AS DECIMAL(28,9)))
               OVER () AS ns
      FROM sdd
    )
    SELECT h AS source, nh::BIGINT AS n_rows,
           round(nh::DOUBLE / n::DOUBLE, 9) AS share,
           round(sd, 9) AS sd,
           round(1000.0 * (nh::DOUBLE / n::DOUBLE), 9) AS n_prop,
           round(CASE WHEN ns::DOUBLE > 0
                 THEN 1000.0 * (nh::DOUBLE * sd / ns::DOUBLE) END, 9)
             AS n_neyman
    FROM win
    """,
)
def neyman_allocation_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional vs Neyman-optimal allocation of a 1000-row labeling
    budget across sources for estimating mean quality
    (operators.curation.neyman_allocation) — where per-source quality
    variance diverges, proportional sampling wastes label budget on
    quiet strata.  Exact decimal per-stratum moments; the cross-strata
    normalizer is a decimal window sum over the bounded stratum axis."""
    from ..operators.curation import neyman_allocation
    from ..operators.textstats import quality_score

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    scored = quality_score(docs).filter(
        F.col("source").isNotNull() & F.col("quality_score").isNotNull()
    )
    return neyman_allocation(scored, "source", "quality_score", 1000)


@_q("textrank_keywords_top", """
    WITH tok AS (
      SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
      FROM documents WHERE text IS NOT NULL
    ),
    adj AS (
      SELECT ts[i] AS a, ts[i + 1] AS b
      FROM tok, unnest(range(1, len(ts))) AS t(i)
    ),
    fil AS (
      SELECT CASE WHEN a < b THEN a ELSE b END AS s,
             CASE WHEN a < b THEN b ELSE a END AS d
      FROM adj
      WHERE a <> b AND len(a) >= 2 AND len(b) >= 2
        AND a NOT IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it') AND b NOT IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it')
    ),
    pe AS (SELECT s, d FROM fil GROUP BY 1, 2
           HAVING count(*) >= 2),
    und AS (SELECT s, d FROM pe UNION ALL SELECT d AS s, s AS d FROM pe),
    deg AS (SELECT s, count(*) AS od FROM und GROUP BY 1),
    nodes AS (SELECT DISTINCT s AS node FROM und),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    p0 AS (SELECT node, CAST(1 AS DOUBLE) / n AS pr FROM nodes, nn),
    a1 AS (
      SELECT und.d AS node,
             CAST(sum(CAST(p0.pr / deg.od AS DECIMAL(28,12)))
                  AS DOUBLE) AS acc
      FROM und JOIN p0 ON p0.node = und.s JOIN deg ON deg.s = und.s
      GROUP BY 1
    ),
    p1 AS (
      SELECT nodes.node,
             (CAST(1 AS DOUBLE) - 0.85) / n
               + 0.85 * coalesce(a1.acc, 0) AS pr
      FROM nodes CROSS JOIN nn LEFT JOIN a1 USING (node)
    ),
    a2 AS (
      SELECT und.d AS node,
             CAST(sum(CAST(p1.pr / deg.od AS DECIMAL(28,12)))
                  AS DOUBLE) AS acc
      FROM und JOIN p1 ON p1.node = und.s JOIN deg ON deg.s = und.s
      GROUP BY 1
    ),
    p2 AS (
      SELECT nodes.node,
             (CAST(1 AS DOUBLE) - 0.85) / n
               + 0.85 * coalesce(a2.acc, 0) AS pr
      FROM nodes CROSS JOIN nn LEFT JOIN a2 USING (node)
    ),
    a3 AS (
      SELECT und.d AS node,
             CAST(sum(CAST(p2.pr / deg.od AS DECIMAL(28,12)))
                  AS DOUBLE) AS acc
      FROM und JOIN p2 ON p2.node = und.s JOIN deg ON deg.s = und.s
      GROUP BY 1
    ),
    p3 AS (
      SELECT nodes.node,
             (CAST(1 AS DOUBLE) - 0.85) / n
               + 0.85 * coalesce(a3.acc, 0) AS pr
      FROM nodes CROSS JOIN nn LEFT JOIN a3 USING (node)
    )
    SELECT token, pr FROM (
      SELECT node AS token, round(pr, 10) AS pr,
             row_number() OVER (ORDER BY round(pr, 10) DESC, node ASC)
               AS rk
      FROM p3
    ) WHERE rk <= 20""")
def textrank_keywords_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank top-20 keywords: 3-iteration PageRank over the word
    co-occurrence graph of adjacent token pairs
    (operators.ranking.textrank_keywords) — global network centrality
    beside rake_keywords_top's local phrase heuristic.  Pairing is
    row-local (zip_with of the token array against its 1-shift, no
    fact-sized self-join); edges below 2 corpus occurrences denoised;
    decimal-carried PageRank unrolled as chained CTEs in the oracle;
    10-dp-rounded scores, alphabetical tiebreak."""
    from ..operators.ranking import textrank_keywords

    return textrank_keywords(
        _t(spark, sf_dir, "documents"), top_k=20, iterations=3
    )



# --------------------------------------------------------------------------
# Round-9 post-window registrations (head the r10 driver window; see
# plans/verified.py DEFER_TO_NEXT_WINDOW)
# --------------------------------------------------------------------------
@_q(
    "wasserstein_doclen_en_rest",
    """
    WITH u AS (
      SELECT n_chars::DOUBLE AS v,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
             CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS b
      FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL
    ),
    counts AS (SELECT v, sum(a) AS na, sum(b) AS nb FROM u GROUP BY 1),
    c AS (
      SELECT v, na, nb,
             sum(na) OVER (ORDER BY v) AS ca,
             sum(nb) OVER (ORDER BY v) AS cb,
             sum(na) OVER () AS ta, sum(nb) OVER () AS tb,
             lead(v) OVER (ORDER BY v) AS nx
      FROM counts
    ),
    agg AS (
      SELECT max(ta) AS n, max(tb) AS m,
             sum(CAST(CASE WHEN nx IS NOT NULL
               THEN round(abs(ca::DOUBLE / ta::DOUBLE
                              - cb::DOUBLE / tb::DOUBLE)
                          * (nx - v), 9)
               ELSE 0.0 END AS DECIMAL(28,9))) AS s
      FROM c
    )
    SELECT n::BIGINT AS n_a, m::BIGINT AS n_b,
           round(CASE WHEN n > 0 AND m > 0 THEN s::DOUBLE END, 9) AS w1
    FROM agg
    """,
)
def wasserstein_doclen_en_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 (earth-mover) distance between en and non-en doc
    lengths (operators.profile.wasserstein_1d) — the shift readout in
    CHARACTER units ("mass moved W1 chars"), which KS/CvM/PSI can't
    give.  Exact 1-D closed form over the distinct-value axis: CDF gap
    x value step per distinct length, 9-dp decimal-carried sum."""
    from ..operators.profile import wasserstein_1d

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("lang").isNotNull()
    )
    return wasserstein_1d(
        docs.filter(F.col("lang") == "en"),
        docs.filter(F.col("lang") != "en"),
        "n_chars",
    )


@_q(
    "krippendorff_lang_alpha",
    f"""
    WITH pl AS ({ORACLES["text_lang_id"]}),
    base AS (
      SELECT lang AS x, predicted_lang AS y FROM pl
      WHERE lang IS NOT NULL AND predicted_lang IS NOT NULL
    ),
    prs AS (SELECT x, y FROM base UNION ALL SELECT y AS x, x AS y
            FROM base),
    o AS (SELECT x, y, count(*) AS o FROM prs GROUP BY 1, 2),
    marg AS (SELECT x, sum(o) AS nc FROM o GROUP BY 1),
    tot AS (
      SELECT sum(o)::HUGEINT AS n,
             sum(CASE WHEN x <> y THEN o ELSE 0 END)::HUGEINT AS dis
      FROM o
    ),
    e AS (
      SELECT sum(a.nc::HUGEINT * b.nc::HUGEINT) AS ep
      FROM marg a JOIN marg b ON a.x <> b.x
    )
    SELECT (n / 2)::BIGINT AS n_units,
           round(dis::DOUBLE / n::DOUBLE, 9) AS d_o,
           round(ep::DOUBLE / (n::DOUBLE * (n::DOUBLE - 1.0)), 9) AS d_e,
           round(CASE WHEN ep::DOUBLE / (n::DOUBLE * (n::DOUBLE - 1.0)) > 0
                 THEN 1.0 - (dis::DOUBLE / n::DOUBLE)
                      / (ep::DOUBLE / (n::DOUBLE * (n::DOUBLE - 1.0)))
                 END, 9) AS alpha
    FROM tot CROSS JOIN e
    """,
)
def krippendorff_lang_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal, two coders) between the stored
    lang and the n-gram prediction
    (operators.profile.krippendorff_alpha_nominal) — the agreement
    coefficient that derives chance from the POOLED code distribution,
    beside kappa_lang_agreement's per-coder marginals; >= 0.8 is the
    codebook-reliability line.  Coincidence-matrix integers to the two
    final divisions."""
    from ..operators.profile import krippendorff_alpha_nominal
    from ..operators.textstats import predict_lang

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return krippendorff_alpha_nominal(
        predict_lang(docs), "lang", "predicted_lang"
    )


_ENTROPY_ORACLE = f"""
    WITH pi AS ({_markov_oracle(25)}),
    pairs2 AS (
      SELECT f, t2, count(*) AS n FROM (
        SELECT event_type AS f,
               lead(event_type) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS t2
        FROM events WHERE event_type IS NOT NULL
      ) WHERE t2 IS NOT NULL GROUP BY 1, 2
    ),
    rowtot2 AS (SELECT f, sum(n) AS tot FROM pairs2 GROUP BY 1),
    p2 AS (
      SELECT pairs2.f, pairs2.t2,
             pairs2.n::DOUBLE / rowtot2.tot::DOUBLE AS p
      FROM pairs2 JOIN rowtot2 USING (f)
    ),
    terms AS (
      SELECT CAST(round(pi.stationary_prob * p2.p * ln(p2.p), 9)
                  AS DECIMAL(28,9)) AS h
      FROM p2 JOIN pi ON p2.f = pi.event_type
    ),
    k AS (SELECT count(*) AS kk FROM pi),
    agg AS (SELECT max(kk) AS k, sum(h) AS s FROM terms CROSS JOIN k)
    SELECT k::BIGINT AS n_states,
           round(-(s::DOUBLE), 9) AS entropy_nats,
           round(-(s::DOUBLE) / 0.6931471805599453, 9) AS entropy_bits,
           round(exp(-(s::DOUBLE)), 9) AS perplexity
    FROM agg
"""


@_q("markov_entropy_rate", _ENTROPY_ORACLE)
def markov_entropy_rate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the user-behavior Markov chain
    (operators.funnel.markov_entropy_rate) — how predictable the next
    event is given the current one, weighting each state's branching
    entropy by its stationary occupancy (markov_stationary_events' 25
    decimal-carried power steps); perplexity = the effective branching
    factor.  k-squared transition cells only; one fact-sized pair
    reduce."""
    from ..operators.funnel import markov_entropy_rate

    return markov_entropy_rate(_t(spark, sf_dir, "events"), iterations=25)


@_q(
    "event_pmi_userday",
    """
    WITH units AS (
      SELECT DISTINCT user_id AS u, ts::DATE AS d, event_type AS ty
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IS NOT NULL
    ),
    nu AS (SELECT count(*) AS c FROM (SELECT DISTINCT u, d FROM units)),
    singles AS (SELECT ty, count(*) AS nx FROM units GROUP BY 1),
    bo AS (
      SELECT a.ty AS ta, b.ty AS tb, count(*) AS nb
      FROM units a JOIN units b ON a.u = b.u AND a.d = b.d
        AND a.ty < b.ty
      GROUP BY 1, 2
    )
    SELECT ta AS type_a, tb AS type_b, nb::BIGINT AS n_both,
           sa.nx::BIGINT AS n_a, sb.nx::BIGINT AS n_b,
           round(ln((nb::DOUBLE / c::DOUBLE)
                    / ((sa.nx::DOUBLE / c::DOUBLE)
                       * (sb.nx::DOUBLE / c::DOUBLE))), 9) AS pmi,
           round(CASE WHEN -ln(nb::DOUBLE / c::DOUBLE) <> 0
                 THEN ln((nb::DOUBLE / c::DOUBLE)
                         / ((sa.nx::DOUBLE / c::DOUBLE)
                            * (sb.nx::DOUBLE / c::DOUBLE)))
                      / (-ln(nb::DOUBLE / c::DOUBLE)) END, 9) AS npmi
    FROM bo
    JOIN singles sa ON bo.ta = sa.ty
    JOIN singles sb ON bo.tb = sb.ty
    CROSS JOIN nu
    """,
)
def event_pmi_userday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI / normalized PMI between event-type pairs co-present in the
    same (user, day) unit (operators.funnel.event_pmi_pairs) — which
    behaviors actually travel together once popularity is discounted;
    the unit-presence companion to the sequential event_transitions.
    Presence sets reduce fact-sized; pair fan-out is per-unit k
    squared over tiny k."""
    from ..operators.funnel import event_pmi_pairs

    return event_pmi_pairs(_t(spark, sf_dir, "events"))


@_q(
    "mixture_temperature_sources",
    """
    WITH c AS (
      SELECT source, count(*) AS n FROM documents
      WHERE source IS NOT NULL GROUP BY 1
    ),
    w AS (SELECT source, n, sum(n) OVER () AS tot FROM c),
    p AS (SELECT source, n, n::DOUBLE / tot::DOUBLE AS p FROM w),
    normed AS (
      SELECT source, n, p,
        pow(p, 1.0) / (sum(CAST(round(pow(p, 1.0), 9) AS DECIMAL(28,9)))
                       OVER ())::DOUBLE AS w10,
        pow(p, 0.7) / (sum(CAST(round(pow(p, 0.7), 9) AS DECIMAL(28,9)))
                       OVER ())::DOUBLE AS w7,
        pow(p, 0.5) / (sum(CAST(round(pow(p, 0.5), 9) AS DECIMAL(28,9)))
                       OVER ())::DOUBLE AS w5,
        pow(p, 0.3) / (sum(CAST(round(pow(p, 0.3), 9) AS DECIMAL(28,9)))
                       OVER ())::DOUBLE AS w3
      FROM p
    )
    SELECT source, n::BIGINT AS n, round(p, 9) AS share,
           round(w10, 9) AS w_10, round(w10 / p, 9) AS boost_10,
           round(w7, 9) AS w_7, round(w7 / p, 9) AS boost_7,
           round(w5, 9) AS w_5, round(w5 / p, 9) AS boost_5,
           round(w3, 9) AS w_3, round(w3 / p, 9) AS boost_3
    FROM normed
    """,
)
def mixture_temperature_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-scaled mixture weights per source (alpha = 1.0, 0.7,
    0.5, 0.3) (operators.curation.mixture_temperature_scaling) — the
    standard multilingual/multi-source rebalancing rule (sample with
    probability proportional to share^alpha) with the implied up/down-
    sampling boost per source per alpha, read off one table.  One count
    groupBy; decimal-quantized normalizers on the source axis."""
    from ..operators.curation import mixture_temperature_scaling

    return mixture_temperature_scaling(
        _t(spark, sf_dir, "documents"), "source"
    )


@_q(
    "pairwise_welch_holm",
    """
    WITH g AS (
      SELECT event_type AS gg, count(*) AS n,
             sum(CAST(value AS DECIMAL(28,12))) AS s,
             sum(CAST(value * value AS DECIMAL(28,12))) AS q
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1
    ),
    pairs AS (
      SELECT a.gg AS group_a, b.gg AS group_b,
             a.n AS n_a, b.n AS n_b,
             a.s AS sa, a.q AS qa, b.s AS sb, b.q AS qb
      FROM g a JOIN g b ON a.gg < b.gg
    ),
    calc AS (
      SELECT *,
             n_a::DOUBLE AS na, n_b::DOUBLE AS nb,
             sa::DOUBLE / n_a AS m1, sb::DOUBLE / n_b AS m2,
             CASE WHEN n_a >= 2 THEN
               (qa::DOUBLE - n_a * (sa::DOUBLE / n_a)
                                 * (sa::DOUBLE / n_a)) / (n_a - 1)
             END AS v1,
             CASE WHEN n_b >= 2 THEN
               (qb::DOUBLE - n_b * (sb::DOUBLE / n_b)
                                 * (sb::DOUBLE / n_b)) / (n_b - 1)
             END AS v2,
             n_a >= 2 AND n_b >= 2 AS ok
      FROM pairs
    ),
    tt AS (
      SELECT *,
             CASE WHEN ok AND v1 / na + v2 / nb > 0
                  THEN (m1 - m2) / sqrt(v1 / na + v2 / nb) END AS t
      FROM calc
    ),
    pv AS (
      SELECT *,
             (1.0 / (1.0 + 0.3275911 * (abs(t) / sqrt(2.0)))) AS u
      FROM tt
    ),
    sel AS (
      SELECT group_a, group_b,
             round(u * (0.254829592 + u * (-0.284496736
               + u * (1.421413741
               + u * (-1.453152027 + u * 1.061405429))))
               * exp(-(abs(t) / sqrt(2.0)) * (abs(t) / sqrt(2.0))), 9)
               AS p9
      FROM pv
    ),
    hr AS (
      SELECT *,
             row_number() OVER (ORDER BY p9 ASC NULLS LAST,
                                group_a, group_b) AS i,
             count(p9) OVER () AS m
      FROM sel
    ),
    qr AS (
      SELECT *, CASE WHEN p9 IS NOT NULL
                     THEN (m - i + 1)::DOUBLE * p9 END AS qraw
      FROM hr
    ),
    qq AS (
      SELECT *,
             least(max(qraw) OVER (ORDER BY p9 ASC NULLS LAST,
                     group_a, group_b
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   1.0) AS q
      FROM qr
    )
    SELECT group_a, group_b, p9 AS p_approx,
           CASE WHEN p9 IS NOT NULL THEN i END::BIGINT AS rank_p,
           m::BIGINT AS m,
           round(CASE WHEN p9 IS NOT NULL THEN q END, 9) AS q_holm,
           CASE WHEN p9 IS NOT NULL THEN q <= 0.05 END
             AS significant_holm
    FROM qq
    """,
)
def pairwise_welch_holm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm step-down familywise correction over the pairwise Welch p's
    (operators.evaluation.holm_adjust composing pairwise_welch) — the
    uniformly-more-powerful drop-in for the Bonferroni flag, completing
    the correction ladder beside pairwise_welch_bh_fdr's FDR.
    Sort/prefix-max windows on the 10-pair hypotheses axis only."""
    from ..operators.evaluation import holm_adjust, pairwise_welch

    ev = _t(spark, sf_dir, "events")
    pw = pairwise_welch(ev, "value", "event_type").select(
        "group_a", "group_b", "p_approx"
    )
    return holm_adjust(pw, "p_approx", ["group_a", "group_b"])



@_q("emb_power_iteration_top", """
    WITH comps AS MATERIALIZED (
      SELECT vec_id, unnest(range(0, len(embedding))) AS i,
             round(unnest(embedding)::DOUBLE * 1000000.0, 0)::BIGINT AS s
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    agg AS MATERIALIZED (
      SELECT a.i AS ia, b2.i AS ib, count(*)::HUGEINT AS n,
             sum(a.s::HUGEINT) AS sx, sum(b2.s::HUGEINT) AS sy,
             sum(a.s::HUGEINT * b2.s::HUGEINT) AS sxy
      FROM comps a JOIN comps b2
        ON a.vec_id = b2.vec_id AND a.i <= b2.i
      GROUP BY 1, 2
    ),
    upper_m AS MATERIALIZED (
      SELECT ia AS i, ib AS j,
             (n * sxy - sx * sy)::DOUBLE
               / (n::DOUBLE * n::DOUBLE * 1000000000000.0) AS c
      FROM agg
    ),
    mat AS MATERIALIZED (
      SELECT i, j, c FROM upper_m
      UNION ALL
      SELECT j AS i, i AS j, c FROM upper_m WHERE i <> j
    ),
    tr AS MATERIALIZED (
      SELECT sum(CAST(round(c, 12) AS DECIMAL(38,12))) AS tr
      FROM mat WHERE i = j
    ),
    dims AS (SELECT DISTINCT i AS d FROM mat),
    kk AS (SELECT count(*) AS k FROM dims),
    v0 AS MATERIALIZED (
      SELECT d, 1.0 / sqrt((SELECT k FROM kk)::DOUBLE) AS v FROM dims
    ),
    u1 AS MATERIALIZED (
      SELECT mat.i AS d,
             CAST(sum(CAST(round(mat.c * v0.v, 12)
                           AS DECIMAL(38,12))) AS DOUBLE) AS u
      FROM mat JOIN v0 ON mat.j = v0.d GROUP BY 1
    ),
    n1 AS MATERIALIZED (
      SELECT sqrt(CAST(sum(CAST(round(u * u, 12) AS DECIMAL(38,12)))
                       AS DOUBLE)) AS nm
      FROM u1
    ),
    v1 AS MATERIALIZED (
      SELECT d, u / (SELECT nm FROM n1) AS v FROM u1
    ),
    u2 AS MATERIALIZED (
      SELECT mat.i AS d,
             CAST(sum(CAST(round(mat.c * v1.v, 12)
                           AS DECIMAL(38,12))) AS DOUBLE) AS u
      FROM mat JOIN v1 ON mat.j = v1.d GROUP BY 1
    ),
    n2 AS MATERIALIZED (
      SELECT sqrt(CAST(sum(CAST(round(u * u, 12) AS DECIMAL(38,12)))
                       AS DOUBLE)) AS nm
      FROM u2
    ),
    v2 AS MATERIALIZED (
      SELECT d, u / (SELECT nm FROM n2) AS v FROM u2
    ),
    u3 AS MATERIALIZED (
      SELECT mat.i AS d,
             CAST(sum(CAST(round(mat.c * v2.v, 12)
                           AS DECIMAL(38,12))) AS DOUBLE) AS u
      FROM mat JOIN v2 ON mat.j = v2.d GROUP BY 1
    ),
    n3 AS MATERIALIZED (
      SELECT sqrt(CAST(sum(CAST(round(u * u, 12) AS DECIMAL(38,12)))
                       AS DOUBLE)) AS nm
      FROM u3
    ),
    v3 AS MATERIALIZED (
      SELECT d, u / (SELECT nm FROM n3) AS v FROM u3
    ),
    u4 AS MATERIALIZED (
      SELECT mat.i AS d,
             CAST(sum(CAST(round(mat.c * v3.v, 12)
                           AS DECIMAL(38,12))) AS DOUBLE) AS u
      FROM mat JOIN v3 ON mat.j = v3.d GROUP BY 1
    ),
    n4 AS MATERIALIZED (
      SELECT sqrt(CAST(sum(CAST(round(u * u, 12) AS DECIMAL(38,12)))
                       AS DOUBLE)) AS nm
      FROM u4
    ),
    v4 AS MATERIALIZED (
      SELECT d, u / (SELECT nm FROM n4) AS v FROM u4
    ),
    u5 AS MATERIALIZED (
      SELECT mat.i AS d,
             CAST(sum(CAST(round(mat.c * v4.v, 12)
                           AS DECIMAL(38,12))) AS DOUBLE) AS u
      FROM mat JOIN v4 ON mat.j = v4.d GROUP BY 1
    ),
    n5 AS MATERIALIZED (
      SELECT sqrt(CAST(sum(CAST(round(u * u, 12) AS DECIMAL(38,12)))
                       AS DOUBLE)) AS nm
      FROM u5
    ),
    v5 AS MATERIALIZED (
      SELECT d, u / (SELECT nm FROM n5) AS v FROM u5
    )
    SELECT d::INT AS dim, round(v, 9) AS loading,
           round((SELECT nm FROM n5), 9) AS lambda1,
           round(CASE WHEN (SELECT tr FROM tr)::DOUBLE <> 0
                 THEN (SELECT nm FROM n5)
                      / (SELECT tr FROM tr)::DOUBLE END, 9) AS evr
    FROM v5
    """)
def emb_power_iteration_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding covariance by 5 fixed
    power-iteration steps (operators.similarity.power_iteration_top) —
    lambda-1, explained-variance ratio, and the 64 loadings: the "one
    dominant axis" audit beside emb_isotropy's spectrum summary and
    emb_covariance_pairs' pairwise view.  Covariance from exact scaled-
    integer moments (the one corpus-scale stage); each step a d-squared-
    row broadcast join with 12-dp decimal product cuts, unrolled as
    chained CTEs in the oracle; the all-ones start pins the eigenvector
    sign."""
    from ..operators.similarity import power_iteration_top

    return power_iteration_top(
        _t(spark, sf_dir, "embeddings"), iterations=5
    )



@_q(
    "ad_doclen_en_rest",
    """
    WITH u AS (
      SELECT n_chars AS v,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
             CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS b
      FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL
    ),
    counts AS (SELECT v, sum(a) AS na, sum(b) AS nb FROM u GROUP BY 1),
    c AS (
      SELECT v, na, nb, na + nb AS h,
             sum(na) OVER (ORDER BY v) AS ca,
             sum(nb) OVER (ORDER BY v) AS cb,
             sum(na) OVER () AS ta, sum(nb) OVER () AS tb
      FROM counts
    ),
    terms AS (
      SELECT ta, tb,
        CAST(round(
          coalesce(
            CASE WHEN (((ca + cb) * 2 - h)::DOUBLE
                       * ((ta + tb)::DOUBLE * 2.0
                          - ((ca + cb) * 2 - h)::DOUBLE)
                       - (ta + tb)::DOUBLE * (h::DOUBLE * 2.0) / 2.0) <> 0
            THEN h::DOUBLE / (ta + tb)::DOUBLE
                 * (((ta + tb)::DOUBLE * (ca * 2 - na)::DOUBLE
                     - ta::DOUBLE * ((ca + cb) * 2 - h)::DOUBLE)
                    * ((ta + tb)::DOUBLE * (ca * 2 - na)::DOUBLE
                       - ta::DOUBLE * ((ca + cb) * 2 - h)::DOUBLE))
                 / ta::DOUBLE
                 / (((ca + cb) * 2 - h)::DOUBLE
                    * ((ta + tb)::DOUBLE * 2.0
                       - ((ca + cb) * 2 - h)::DOUBLE)
                    - (ta + tb)::DOUBLE * (h::DOUBLE * 2.0) / 2.0)
            END, 0.0)
          + coalesce(
            CASE WHEN (((ca + cb) * 2 - h)::DOUBLE
                       * ((ta + tb)::DOUBLE * 2.0
                          - ((ca + cb) * 2 - h)::DOUBLE)
                       - (ta + tb)::DOUBLE * (h::DOUBLE * 2.0) / 2.0) <> 0
            THEN h::DOUBLE / (ta + tb)::DOUBLE
                 * (((ta + tb)::DOUBLE * (cb * 2 - nb)::DOUBLE
                     - tb::DOUBLE * ((ca + cb) * 2 - h)::DOUBLE)
                    * ((ta + tb)::DOUBLE * (cb * 2 - nb)::DOUBLE
                       - tb::DOUBLE * ((ca + cb) * 2 - h)::DOUBLE))
                 / tb::DOUBLE
                 / (((ca + cb) * 2 - h)::DOUBLE
                    * ((ta + tb)::DOUBLE * 2.0
                       - ((ca + cb) * 2 - h)::DOUBLE)
                    - (ta + tb)::DOUBLE * (h::DOUBLE * 2.0) / 2.0)
            END, 0.0), 9) AS DECIMAL(28,9)) AS t
      FROM c
    ),
    agg AS (
      SELECT max(ta) AS n, max(tb) AS m, sum(t) AS s FROM terms
    )
    SELECT n::BIGINT AS n_a, m::BIGINT AS n_b,
           round(CASE WHEN n > 0 AND m > 0 AND (n + m)::DOUBLE >= 2
                 THEN ((n + m)::DOUBLE - 1.0) / (n + m)::DOUBLE
                      * s::DOUBLE END, 9) AS ad_stat
    FROM agg
    """,
)
def ad_doclen_en_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling (Scholz-Stephens tie-adjusted
    midrank A2akN) between en and non-en doc lengths
    (operators.evaluation.ad_two_sample) — the TAIL-weighted member of
    the two-sample family beside KS (worst gap) and CvM (uniform
    integral): B(N-B) in the denominator makes the same CDF gap count
    more in the tails.  Doubled-unit exact integer mid-cumulatives over
    the distinct-length axis; verified against the Scholz-Stephens
    reference value on a hand case."""
    from ..operators.evaluation import ad_two_sample

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("lang").isNotNull()
    )
    return ad_two_sample(
        docs.filter(F.col("lang") == "en"),
        docs.filter(F.col("lang") != "en"),
        "n_chars",
    )


@_q("dtw_clicks_purchases", """
    WITH daily AS MATERIALIZED (
      SELECT date_trunc('day', ts) AS b,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS y
      FROM events
      WHERE ts IS NOT NULL AND event_type IN ('click', 'purchase')
      GROUP BY 1
    ),
    xs AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY b) AS i, x FROM daily
    ),
    ys AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY b) AS j, y FROM daily
    ),
    d2 AS MATERIALIZED (
      SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS d
      FROM xs JOIN ys ON xs.i = 1 AND ys.j = 1
    ),
    d3 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 3
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d2 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d2 p2 ON p2.i = c.i AND p2.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000)) < 1000000000000000
    ),
    d4 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 4
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d3 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d3 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d2 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d5 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 5
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d4 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d4 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d3 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d6 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 6
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d5 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d5 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d4 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d7 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 7
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d6 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d6 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d5 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d8 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 8
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d7 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d7 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d6 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d9 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 9
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d8 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d8 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d7 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d10 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 10
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d9 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d9 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d8 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d11 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 11
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d10 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d10 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d9 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d12 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 12
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d11 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d11 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d10 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d13 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 13
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d12 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d12 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d11 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d14 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 14
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d13 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d13 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d12 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d15 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 15
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d14 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d14 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d13 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d16 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 16
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d15 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d15 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d14 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d17 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 17
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d16 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d16 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d15 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d18 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 18
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d17 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d17 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d16 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d19 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 19
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d18 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d18 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d17 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d20 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 20
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d19 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d19 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d18 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d21 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 21
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d20 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d20 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d19 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d22 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 22
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d21 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d21 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d20 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d23 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 23
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d22 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d22 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d21 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d24 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 24
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d23 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d23 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d22 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d25 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 25
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d24 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d24 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d23 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d26 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 26
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d25 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d25 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d24 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d27 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 27
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d26 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d26 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d25 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d28 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 28
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d27 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d27 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d26 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d29 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 29
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d28 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d28 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d27 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d30 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 30
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d29 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d29 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d28 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d31 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 31
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d30 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d30 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d29 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d32 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 32
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d31 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d31 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d30 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d33 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 33
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d32 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d32 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d31 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d34 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 34
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d33 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d33 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d32 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d35 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 35
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d34 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d34 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d33 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d36 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 36
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d35 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d35 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d34 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d37 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 37
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d36 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d36 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d35 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d38 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 38
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d37 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d37 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d36 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d39 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 39
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d38 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d38 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d37 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d40 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 40
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d39 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d39 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d38 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d41 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 41
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d40 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d40 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d39 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d42 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 42
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d41 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d41 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d40 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d43 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 43
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d42 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d42 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d41 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d44 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 44
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d43 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d43 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d42 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d45 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 45
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d44 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d44 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d43 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d46 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 46
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d45 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d45 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d44 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d47 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 47
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d46 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d46 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d45 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d48 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 48
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d47 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d47 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d46 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d49 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 49
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d48 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d48 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d47 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d50 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 50
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d49 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d49 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d48 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d51 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 51
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d50 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d50 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d49 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d52 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 52
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d51 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d51 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d50 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d53 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 53
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d52 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d52 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d51 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d54 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 54
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d53 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d53 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d52 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d55 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 55
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d54 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d54 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d53 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d56 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 56
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d55 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d55 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d54 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d57 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 57
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d56 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d56 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d55 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d58 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 58
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d57 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d57 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d56 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d59 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 59
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d58 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d58 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d57 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d60 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 60
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d59 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d59 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d58 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d61 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 61
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d60 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d60 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d59 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d62 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 62
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d61 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d61 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d60 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d63 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 63
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d62 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d62 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d61 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d64 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 64
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d63 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d63 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d62 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d65 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 65
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d64 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d64 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d63 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d66 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 66
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d65 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d65 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d64 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d67 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 67
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d66 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d66 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d65 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d68 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 68
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d67 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d67 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d66 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d69 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 69
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d68 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d68 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d67 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    d70 AS MATERIALIZED (
      SELECT c.i, c.j,
             c.cost + least(
                coalesce(p1.d, 1000000000000000),
                coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) AS d
      FROM (SELECT xs.i, ys.j, abs(xs.x - ys.y)::BIGINT AS cost
            FROM xs JOIN ys ON xs.i + ys.j = 70
              AND abs(xs.i - ys.j) <= 7) c
      LEFT JOIN d69 p1 ON p1.i = c.i - 1 AND p1.j = c.j
      LEFT JOIN d69 p2 ON p2.i = c.i AND p2.j = c.j - 1
      LEFT JOIN d68 p3 ON p3.i = c.i - 1 AND p3.j = c.j - 1
      WHERE least(coalesce(p1.d, 1000000000000000),
                  coalesce(p2.d, 1000000000000000),
                coalesce(p3.d, 1000000000000000)) < 1000000000000000
    ),
    all_d AS (SELECT * FROM d2
      UNION ALL SELECT * FROM d3
      UNION ALL SELECT * FROM d4
      UNION ALL SELECT * FROM d5
      UNION ALL SELECT * FROM d6
      UNION ALL SELECT * FROM d7
      UNION ALL SELECT * FROM d8
      UNION ALL SELECT * FROM d9
      UNION ALL SELECT * FROM d10
      UNION ALL SELECT * FROM d11
      UNION ALL SELECT * FROM d12
      UNION ALL SELECT * FROM d13
      UNION ALL SELECT * FROM d14
      UNION ALL SELECT * FROM d15
      UNION ALL SELECT * FROM d16
      UNION ALL SELECT * FROM d17
      UNION ALL SELECT * FROM d18
      UNION ALL SELECT * FROM d19
      UNION ALL SELECT * FROM d20
      UNION ALL SELECT * FROM d21
      UNION ALL SELECT * FROM d22
      UNION ALL SELECT * FROM d23
      UNION ALL SELECT * FROM d24
      UNION ALL SELECT * FROM d25
      UNION ALL SELECT * FROM d26
      UNION ALL SELECT * FROM d27
      UNION ALL SELECT * FROM d28
      UNION ALL SELECT * FROM d29
      UNION ALL SELECT * FROM d30
      UNION ALL SELECT * FROM d31
      UNION ALL SELECT * FROM d32
      UNION ALL SELECT * FROM d33
      UNION ALL SELECT * FROM d34
      UNION ALL SELECT * FROM d35
      UNION ALL SELECT * FROM d36
      UNION ALL SELECT * FROM d37
      UNION ALL SELECT * FROM d38
      UNION ALL SELECT * FROM d39
      UNION ALL SELECT * FROM d40
      UNION ALL SELECT * FROM d41
      UNION ALL SELECT * FROM d42
      UNION ALL SELECT * FROM d43
      UNION ALL SELECT * FROM d44
      UNION ALL SELECT * FROM d45
      UNION ALL SELECT * FROM d46
      UNION ALL SELECT * FROM d47
      UNION ALL SELECT * FROM d48
      UNION ALL SELECT * FROM d49
      UNION ALL SELECT * FROM d50
      UNION ALL SELECT * FROM d51
      UNION ALL SELECT * FROM d52
      UNION ALL SELECT * FROM d53
      UNION ALL SELECT * FROM d54
      UNION ALL SELECT * FROM d55
      UNION ALL SELECT * FROM d56
      UNION ALL SELECT * FROM d57
      UNION ALL SELECT * FROM d58
      UNION ALL SELECT * FROM d59
      UNION ALL SELECT * FROM d60
      UNION ALL SELECT * FROM d61
      UNION ALL SELECT * FROM d62
      UNION ALL SELECT * FROM d63
      UNION ALL SELECT * FROM d64
      UNION ALL SELECT * FROM d65
      UNION ALL SELECT * FROM d66
      UNION ALL SELECT * FROM d67
      UNION ALL SELECT * FROM d68
      UNION ALL SELECT * FROM d69
      UNION ALL SELECT * FROM d70),
    nn AS (SELECT max(i) AS n FROM xs)
    SELECT nn.n::BIGINT AS n_days, CAST(7 AS BIGINT) AS band,
           round(all_d.d::DOUBLE, 9) AS dtw,
           round(all_d.d::DOUBLE / (2 * nn.n - 1)::DOUBLE, 9)
             AS dtw_per_step
    FROM all_d JOIN nn ON all_d.i = nn.n AND all_d.j = nn.n
    """)
def dtw_clicks_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sakoe-Chiba-banded dynamic-time-warping distance between the
    daily click and purchase count series
    (operators.timeseries.dtw_daily) — do the two behaviors follow the
    same SHAPE allowing lag/stretch, the question one global shift
    (cross-correlation) can't ask.  The inherently-sequential DP runs
    as ONE Arrow-batched applyInPandas over the bounded day axis (the
    DCT/FFT kernel class); integer costs make every cell exact, and
    the oracle unrolls the DP by anti-diagonals — 2n-1 chained CTEs,
    each depending on the previous two."""
    from ..operators.timeseries import dtw_daily

    return dtw_daily(_t(spark, sf_dir, "events"), band=7)



@_q(
    "ab_srm_check",
    """
    WITH arms AS (
      SELECT sum(CASE WHEN (user_id % 2)::VARCHAR = '0' THEN 1 ELSE 0
                 END) AS na,
             sum(CASE WHEN (user_id % 2)::VARCHAR = '0' THEN 0 ELSE 1
                 END) AS nb
      FROM (SELECT DISTINCT user_id FROM events
            WHERE user_id IS NOT NULL)
    ),
    chi AS (
      SELECT na, nb,
             CASE WHEN (na + nb)::DOUBLE > 0 THEN
               (na::DOUBLE - (na + nb)::DOUBLE * 0.5)
               * (na::DOUBLE - (na + nb)::DOUBLE * 0.5)
               / ((na + nb)::DOUBLE * 0.5)
               + (nb::DOUBLE - (na + nb)::DOUBLE * 0.5)
               * (nb::DOUBLE - (na + nb)::DOUBLE * 0.5)
               / ((na + nb)::DOUBLE * 0.5) END AS chi2
      FROM arms
    ),
    pv AS (
      SELECT *,
             (1.0 / (1.0 + 0.3275911 * (abs(sqrt(chi2)) / sqrt(2.0))))
               AS u
      FROM chi
    ),
    pp AS (
      SELECT na, nb, chi2,
             u * (0.254829592 + u * (-0.284496736 + u * (1.421413741
               + u * (-1.453152027 + u * 1.061405429))))
               * exp(-(abs(sqrt(chi2)) / sqrt(2.0))
                     * (abs(sqrt(chi2)) / sqrt(2.0))) AS p
      FROM pv
    )
    SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
           (na + nb)::BIGINT AS n, round(chi2, 9) AS chi2,
           round(p, 9) AS p_approx,
           CASE WHEN chi2 IS NOT NULL THEN p < 0.001 END AS srm
    FROM pp
    """,
)
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail on the user-parity experiment
    arms (operators.evaluation.srm_check) — the check every A/B readout
    must pass first: a split that deviates from the designed 50/50 more
    than chance allows voids every downstream comparison.  1-df
    chi-square GOF with the module's shared Phi polynomial; the 0.001
    alarm line is the always-on-guardrail standard."""
    from ..operators.evaluation import srm_check

    users = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .select((F.col("user_id") % 2).alias("arm"))
    )
    return srm_check(users, "arm")


@_q(
    "ab_cuped_value",
    """
    WITH per_user AS (
      SELECT user_id AS u, (user_id % 2)::VARCHAR AS arm,
             CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                      THEN CAST(value AS DECIMAL(28,6))
                      ELSE CAST(0.0 AS DECIMAL(28,6)) END) AS DOUBLE)
               AS x,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                      THEN CAST(value AS DECIMAL(28,6))
                      ELSE CAST(0.0 AS DECIMAL(28,6)) END) AS DOUBLE)
               AS y
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    mom AS (
      SELECT count(*) AS n,
             sum(CAST(round(x, 9) AS DECIMAL(28,9))) AS sx,
             sum(CAST(round(y, 9) AS DECIMAL(28,9))) AS sy,
             sum(CAST(round(x * x, 9) AS DECIMAL(28,9))) AS sxx,
             sum(CAST(round(x * y, 9) AS DECIMAL(28,9))) AS sxy
      FROM per_user
    ),
    st AS (
      SELECT (sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE)
             / nullif(sxx::DOUBLE
                      - n::DOUBLE * (sx::DOUBLE / n::DOUBLE)
                        * (sx::DOUBLE / n::DOUBLE), 0) AS theta,
             sx::DOUBLE / n::DOUBLE AS xbar
      FROM mom
    ),
    adj AS (
      SELECT arm, y, y - theta * (x - xbar) AS yadj, theta
      FROM per_user CROSS JOIN st
    ),
    per_arm AS (
      SELECT arm, count(*) AS nu, max(theta) AS theta,
             sum(CAST(round(y, 9) AS DECIMAL(28,9))) AS sy,
             sum(CAST(round(yadj, 9) AS DECIMAL(28,9))) AS sa,
             sum(CAST(round(y * y, 9) AS DECIMAL(28,9))) AS syy,
             sum(CAST(round(yadj * yadj, 9) AS DECIMAL(28,9))) AS saa
      FROM adj GROUP BY 1
    )
    SELECT arm, nu::BIGINT AS n_users, round(theta, 9) AS theta,
           round(sy::DOUBLE / nu::DOUBLE, 9) AS mean_y,
           round(sa::DOUBLE / nu::DOUBLE, 9) AS mean_y_adj,
           round(CASE WHEN nu >= 2 THEN
             (syy::DOUBLE - nu::DOUBLE * (sy::DOUBLE / nu::DOUBLE)
                * (sy::DOUBLE / nu::DOUBLE)) / (nu::DOUBLE - 1.0)
             END, 6) AS var_y,
           round(CASE WHEN nu >= 2 THEN
             (saa::DOUBLE - nu::DOUBLE * (sa::DOUBLE / nu::DOUBLE)
                * (sa::DOUBLE / nu::DOUBLE)) / (nu::DOUBLE - 1.0)
             END, 6) AS var_y_adj,
           round(1.0 - (CASE WHEN nu >= 2 THEN
             (saa::DOUBLE - nu::DOUBLE * (sa::DOUBLE / nu::DOUBLE)
                * (sa::DOUBLE / nu::DOUBLE)) / (nu::DOUBLE - 1.0) END)
             / nullif(CASE WHEN nu >= 2 THEN
             (syy::DOUBLE - nu::DOUBLE * (sy::DOUBLE / nu::DOUBLE)
                * (sy::DOUBLE / nu::DOUBLE)) / (nu::DOUBLE - 1.0)
             END, 0), 9) AS var_reduction
    FROM per_arm
    """,
)
def ab_cuped_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction on the user-parity experiment: per-user
    pre-period value (days 1-15) regressed out of the experiment-period
    value (days 16-30) (operators.evaluation.cuped_adjustment) — the
    industry-standard 1/(1-rho-squared) sensitivity multiplier, with
    the per-arm variance-reduction readout.  Exact decimal per-user
    sums; pooled theta broadcast back; user-axis moments only."""
    from ..operators.evaluation import cuped_adjustment

    return cuped_adjustment(
        _t(spark, sf_dir, "events"), "user_id", "ts", "value"
    )


@_q(
    "revenue_lorenz_deciles",
    """
    WITH per_key AS (
      SELECT o_custkey AS k,
             sum(CAST(o_totalprice AS DECIMAL(28,6))) AS v
      FROM orders
      WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
      GROUP BY 1
    ),
    binned AS (
      SELECT ntile(10) OVER (ORDER BY v, k) AS bin, v FROM per_key
    ),
    bins AS (
      SELECT bin, count(*) AS n, sum(v) AS s FROM binned GROUP BY 1
    ),
    c AS (
      SELECT bin, n, s,
             sum(s) OVER (ORDER BY bin) AS cs,
             sum(s) OVER () AS tot
      FROM bins
    )
    SELECT bin::BIGINT AS decile, n::BIGINT AS n_keys,
           round(s::DOUBLE, 9) AS value,
           round(s::DOUBLE / tot::DOUBLE, 9) AS share,
           round(cs::DOUBLE / tot::DOUBLE, 9) AS cum_share
    FROM c
    """,
)
def revenue_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-curve decile table of revenue over customers
    (operators.profile.lorenz_deciles) — the concentration CURVE behind
    source_gini's single number: "the top customer decile carries X% of
    revenue" reads off row 10.  Exact decimal per-key totals; the rank
    window runs on the customer axis, key-tiebroken ntile."""
    from ..operators.profile import lorenz_deciles

    return lorenz_deciles(
        _t(spark, sf_dir, "orders"), "o_custkey", "o_totalprice"
    )



@_q(
    "feature_info_gain",
    """
    WITH flags AS (
      SELECT (lang = 'en') AS y,
             (n_chars >= 300) AS f0,
             (len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 56)
               AS f1,
             list_contains(regexp_extract_all(lower(text), '[a-z0-9]+'),
                           'the') AS f2
      FROM documents
      WHERE lang IS NOT NULL AND n_chars IS NOT NULL
        AND text IS NOT NULL
    ),
    mom AS (
      SELECT count(*) AS n, sum(y::INT) AS p,
             sum(f0::INT) AS n0, sum((f0 AND y)::INT) AS p0,
             sum(f1::INT) AS n1, sum((f1 AND y)::INT) AS p1,
             sum(f2::INT) AS n2, sum((f2 AND y)::INT) AS p2
      FROM flags
    ),
    rows_out AS (
      SELECT 'len_ge_300' AS feature, n, n0 AS nf, p0 AS pf, p FROM mom
      UNION ALL
      SELECT 'tokens_ge_56', n, n1, p1, p FROM mom
      UNION ALL
      SELECT 'contains_the', n, n2, p2, p FROM mom
    ),
    ent AS (
      SELECT feature, n, nf, pf, p,
        nf::DOUBLE / n::DOUBLE AS pflag,
        CASE WHEN n > 0 THEN
          (CASE WHEN p::DOUBLE / n::DOUBLE > 0
                THEN -(p::DOUBLE / n::DOUBLE)
                     * log2(p::DOUBLE / n::DOUBLE) ELSE 0.0 END)
          + (CASE WHEN 1.0 - p::DOUBLE / n::DOUBLE > 0
                  THEN -(1.0 - p::DOUBLE / n::DOUBLE)
                       * log2(1.0 - p::DOUBLE / n::DOUBLE)
                  ELSE 0.0 END) END AS h_prior,
        CASE WHEN nf > 0 THEN
          (CASE WHEN pf::DOUBLE / nf::DOUBLE > 0
                THEN -(pf::DOUBLE / nf::DOUBLE)
                     * log2(pf::DOUBLE / nf::DOUBLE) ELSE 0.0 END)
          + (CASE WHEN 1.0 - pf::DOUBLE / nf::DOUBLE > 0
                  THEN -(1.0 - pf::DOUBLE / nf::DOUBLE)
                       * log2(1.0 - pf::DOUBLE / nf::DOUBLE)
                  ELSE 0.0 END) ELSE 0.0 END AS h_true,
        CASE WHEN n - nf > 0 THEN
          (CASE WHEN (p - pf)::DOUBLE / (n - nf)::DOUBLE > 0
                THEN -((p - pf)::DOUBLE / (n - nf)::DOUBLE)
                     * log2((p - pf)::DOUBLE / (n - nf)::DOUBLE)
                ELSE 0.0 END)
          + (CASE WHEN 1.0 - (p - pf)::DOUBLE / (n - nf)::DOUBLE > 0
                  THEN -(1.0 - (p - pf)::DOUBLE / (n - nf)::DOUBLE)
                       * log2(1.0 - (p - pf)::DOUBLE
                              / (n - nf)::DOUBLE)
                  ELSE 0.0 END) ELSE 0.0 END AS h_false
      FROM rows_out
    )
    SELECT feature, n::BIGINT AS n, round(pflag, 9) AS p_flag,
           round(h_prior, 9) AS h_prior,
           round(pflag * h_true + (1.0 - pflag) * h_false, 9) AS h_cond,
           round(CASE WHEN n > 0 AND nf > 0 AND nf < n
                 THEN h_prior - (pflag * h_true
                                 + (1.0 - pflag) * h_false) END, 9)
             AS info_gain
    FROM ent
    """,
)
def feature_info_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump information gain of the three document quality
    screens against the en/non-en label
    (operators.evaluation.binary_info_gain) — which screen actually
    separates the classes, ranked in bits, before anyone trains a
    model; the split-balance column flags rules masquerading as
    features.  All cell counts reduce in ONE scan; entropies are IEEE
    terms on exact integer ratios."""
    from ..operators.evaluation import binary_info_gain
    from ..operators.textstats import tokens

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull()
        & F.col("n_chars").isNotNull()
        & F.col("text").isNotNull()
    )
    toks = tokens("text")
    flagged = docs.select(
        (F.col("lang") == "en").alias("y"),
        (F.col("n_chars") >= 300).alias("len_ge_300"),
        (F.size(toks) >= 56).alias("tokens_ge_56"),
        F.array_contains(toks, "the").alias("contains_the"),
    )
    return binary_info_gain(
        flagged, ["len_ge_300", "tokens_ge_56", "contains_the"], "y"
    )



@_q(
    "pairwise_welch_by_fdr",
    """
    WITH g AS (
      SELECT event_type AS gg, count(*) AS n,
             sum(CAST(value AS DECIMAL(28,12))) AS s,
             sum(CAST(value * value AS DECIMAL(28,12))) AS q
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1
    ),
    pairs AS (
      SELECT a.gg AS group_a, b.gg AS group_b,
             a.n AS n_a, b.n AS n_b,
             a.s AS sa, a.q AS qa, b.s AS sb, b.q AS qb
      FROM g a JOIN g b ON a.gg < b.gg
    ),
    calc AS (
      SELECT *,
             n_a::DOUBLE AS na, n_b::DOUBLE AS nb,
             sa::DOUBLE / n_a AS m1, sb::DOUBLE / n_b AS m2,
             CASE WHEN n_a >= 2 THEN
               (qa::DOUBLE - n_a * (sa::DOUBLE / n_a)
                                 * (sa::DOUBLE / n_a)) / (n_a - 1)
             END AS v1,
             CASE WHEN n_b >= 2 THEN
               (qb::DOUBLE - n_b * (sb::DOUBLE / n_b)
                                 * (sb::DOUBLE / n_b)) / (n_b - 1)
             END AS v2,
             n_a >= 2 AND n_b >= 2 AS ok
      FROM pairs
    ),
    tt AS (
      SELECT *,
             CASE WHEN ok AND v1 / na + v2 / nb > 0
                  THEN (m1 - m2) / sqrt(v1 / na + v2 / nb) END AS t
      FROM calc
    ),
    pv AS (
      SELECT *,
             (1.0 / (1.0 + 0.3275911 * (abs(t) / sqrt(2.0)))) AS u
      FROM tt
    ),
    sel AS (
      SELECT group_a, group_b,
             round(u * (0.254829592 + u * (-0.284496736
               + u * (1.421413741
               + u * (-1.453152027 + u * 1.061405429))))
               * exp(-(abs(t) / sqrt(2.0)) * (abs(t) / sqrt(2.0))), 9)
               AS p9
      FROM pv
    ),
    hr AS (
      SELECT *,
             row_number() OVER (ORDER BY p9 ASC NULLS LAST,
                                group_a, group_b) AS i,
             count(p9) OVER () AS m
      FROM sel
    ),
    harm AS (
      SELECT CAST(sum(CAST(round(1.0 / i::DOUBLE, 9)
                           AS DECIMAL(28,9))) AS DOUBLE) AS cm
      FROM hr WHERE p9 IS NOT NULL
    ),
    qr AS (
      SELECT hr.*, CASE WHEN p9 IS NOT NULL
                   THEN harm.cm * m::DOUBLE * p9 / i::DOUBLE END AS qraw
      FROM hr CROSS JOIN harm
    ),
    qq AS (
      SELECT *,
             least(min(qraw) OVER (ORDER BY p9 ASC NULLS LAST,
                     group_a, group_b
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
                   1.0) AS q
      FROM qr
    )
    SELECT group_a, group_b, p9 AS p_approx,
           CASE WHEN p9 IS NOT NULL THEN i END::BIGINT AS rank_p,
           m::BIGINT AS m,
           round(CASE WHEN p9 IS NOT NULL THEN q END, 9) AS q_by,
           CASE WHEN p9 IS NOT NULL THEN q <= 0.05 END
             AS significant_by
    FROM qq
    """,
)
def pairwise_welch_by_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Yekutieli FDR over the pairwise Welch p's
    (operators.evaluation.by_adjust composing pairwise_welch) — BH made
    valid under arbitrary dependence via the harmonic c(m) penalty; the
    correction ladder is now complete (Bonferroni / Holm / BH / BY).
    Rank + suffix-min windows on the 10-pair hypotheses axis; exact
    decimal harmonic sum."""
    from ..operators.evaluation import by_adjust, pairwise_welch

    ev = _t(spark, sf_dir, "events")
    pw = pairwise_welch(ev, "value", "event_type").select(
        "group_a", "group_b", "p_approx"
    )
    return by_adjust(pw, "p_approx", ["group_a", "group_b"])



@_q("emb_spectral_gap", """
    WITH comps AS MATERIALIZED (
      SELECT vec_id, unnest(range(0, len(embedding))) AS i,
             round(unnest(embedding)::DOUBLE * 1000000.0, 0)::BIGINT AS s
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    agg AS MATERIALIZED (
      SELECT a.i AS ia, b2.i AS ib, count(*)::HUGEINT AS n,
             sum(a.s::HUGEINT) AS sx, sum(b2.s::HUGEINT) AS sy,
             sum(a.s::HUGEINT * b2.s::HUGEINT) AS sxy
      FROM comps a JOIN comps b2
        ON a.vec_id = b2.vec_id AND a.i <= b2.i
      GROUP BY 1, 2
    ),
    upper_m AS MATERIALIZED (
      SELECT ia AS i, ib AS j,
             (n * sxy - sx * sy)::DOUBLE
               / (n::DOUBLE * n::DOUBLE * 1000000000000.0) AS c
      FROM agg
    ),
    mat AS MATERIALIZED (
      SELECT i, j, c FROM upper_m
      UNION ALL
      SELECT j AS i, i AS j, c FROM upper_m WHERE i <> j
    ),
    tr AS MATERIALIZED (
      SELECT sum(CAST(round(c, 12) AS DECIMAL(38,12))) AS tr
      FROM mat WHERE i = j
    ),
    dims AS (SELECT DISTINCT i AS d FROM mat),
    kk AS (SELECT count(*) AS k FROM dims),
    v0 AS MATERIALIZED (
      SELECT d, 1.0 / sqrt((SELECT k FROM kk)::DOUBLE) AS v FROM dims
    ),
    u1 AS MATERIALIZED (
      SELECT mat.i AS d,
             CAST(sum(CAST(round(mat.c * v0.v, 12)
                           AS DECIMAL(38,12))) AS DOUBLE) AS u
      FROM mat JOIN v0 ON mat.j = v0.d GROUP BY 1
    ),
    n1 AS MATERIALIZED (
      SELECT sqrt(CAST(sum(CAST(round(u * u, 12) AS DECIMAL(38,12)))
                       AS DOUBLE)) AS nm
      FROM u1
    ),
    v1 AS MATERIALIZED (
      SELECT d, u / (SELECT nm FROM n1) AS v
      FROM u1
    ),
    u2 AS MATERIALIZED (
      SELECT mat.i AS d,
             CAST(sum(CAST(round(mat.c * v1.v, 12)
                           AS DECIMAL(38,12))) AS DOUBLE) AS u
      FROM mat JOIN v1 ON mat.j = v1.d GROUP BY 1
    ),
    n2 AS MATERIALIZED (
      SELECT sqrt(CAST(sum(CAST(round(u * u, 12) AS DECIMAL(38,12)))
                       AS DOUBLE)) AS nm
      FROM u2
    ),
    v2 AS MATERIALIZED (
      SELECT d, u / (SELECT nm FROM n2) AS v
      FROM u2
    ),
    u3 AS MATERIALIZED (
      SELECT mat.i AS d,
             CAST(sum(CAST(round(mat.c * v2.v, 12)
                           AS DECIMAL(38,12))) AS DOUBLE) AS u
      FROM mat JOIN v2 ON mat.j = v2.d GROUP BY 1
    ),
    n3 AS MATERIALIZED (
      SELECT sqrt(CAST(sum(CAST(round(u * u, 12) AS DECIMAL(38,12)))
                       AS DOUBLE)) AS nm
      FROM u3
    ),
    v3 AS MATERIALIZED (
      SELECT d, u / (SELECT nm FROM n3) AS v
      FROM u3
    ),
    u4 AS MATERIALIZED (
      SELECT mat.i AS d,
             CAST(sum(CAST(round(mat.c * v3.v, 12)
                           AS DECIMAL(38,12))) AS DOUBLE) AS u
      FROM mat JOIN v3 ON mat.j = v3.d GROUP BY 1
    ),
    n4 AS MATERIALIZED (
      SELECT sqrt(CAST(sum(CAST(round(u * u, 12) AS DECIMAL(38,12)))
                       AS DOUBLE)) AS nm
      FROM u4
    ),
    v4 AS MATERIALIZED (
      SELECT d, u / (SELECT nm FROM n4) AS v
      FROM u4
    ),
    u5 AS MATERIALIZED (
      SELECT mat.i AS d,
             CAST(sum(CAST(round(mat.c * v4.v, 12)
                           AS DECIMAL(38,12))) AS DOUBLE) AS u
      FROM mat JOIN v4 ON mat.j = v4.d GROUP BY 1
    ),
    n5 AS MATERIALIZED (
      SELECT sqrt(CAST(sum(CAST(round(u * u, 12) AS DECIMAL(38,12)))
                       AS DOUBLE)) AS nm
      FROM u5
    ),
    v5 AS MATERIALIZED (
      SELECT d, u / (SELECT nm FROM n5) AS v
      FROM u5
    ),
    matd AS MATERIALIZED (
      SELECT mat.i, mat.j,
             mat.c - (SELECT nm FROM n5) * a.v * b.v AS c
      FROM mat JOIN v5 a ON mat.i = a.d
               JOIN v5 b ON mat.j = b.d
    ),
    w0 AS MATERIALIZED (
      SELECT d, 1.0 / sqrt((SELECT k FROM kk)::DOUBLE) AS v FROM dims
    ),
    x1 AS MATERIALIZED (
      SELECT matd.i AS d,
             CAST(sum(CAST(round(matd.c * w0.v, 12)
                           AS DECIMAL(38,12))) AS DOUBLE) AS u
      FROM matd JOIN w0 ON matd.j = w0.d GROUP BY 1
    ),
    m1 AS MATERIALIZED (
      SELECT sqrt(CAST(sum(CAST(round(u * u, 12) AS DECIMAL(38,12)))
                       AS DOUBLE)) AS nm
      FROM x1
    ),
    w1 AS MATERIALIZED (
      SELECT d, u / (SELECT nm FROM m1) AS v
      FROM x1
    ),
    x2 AS MATERIALIZED (
      SELECT matd.i AS d,
             CAST(sum(CAST(round(matd.c * w1.v, 12)
                           AS DECIMAL(38,12))) AS DOUBLE) AS u
      FROM matd JOIN w1 ON matd.j = w1.d GROUP BY 1
    ),
    m2 AS MATERIALIZED (
      SELECT sqrt(CAST(sum(CAST(round(u * u, 12) AS DECIMAL(38,12)))
                       AS DOUBLE)) AS nm
      FROM x2
    ),
    w2 AS MATERIALIZED (
      SELECT d, u / (SELECT nm FROM m2) AS v
      FROM x2
    ),
    x3 AS MATERIALIZED (
      SELECT matd.i AS d,
             CAST(sum(CAST(round(matd.c * w2.v, 12)
                           AS DECIMAL(38,12))) AS DOUBLE) AS u
      FROM matd JOIN w2 ON matd.j = w2.d GROUP BY 1
    ),
    m3 AS MATERIALIZED (
      SELECT sqrt(CAST(sum(CAST(round(u * u, 12) AS DECIMAL(38,12)))
                       AS DOUBLE)) AS nm
      FROM x3
    ),
    w3 AS MATERIALIZED (
      SELECT d, u / (SELECT nm FROM m3) AS v
      FROM x3
    ),
    x4 AS MATERIALIZED (
      SELECT matd.i AS d,
             CAST(sum(CAST(round(matd.c * w3.v, 12)
                           AS DECIMAL(38,12))) AS DOUBLE) AS u
      FROM matd JOIN w3 ON matd.j = w3.d GROUP BY 1
    ),
    m4 AS MATERIALIZED (
      SELECT sqrt(CAST(sum(CAST(round(u * u, 12) AS DECIMAL(38,12)))
                       AS DOUBLE)) AS nm
      FROM x4
    ),
    w4 AS MATERIALIZED (
      SELECT d, u / (SELECT nm FROM m4) AS v
      FROM x4
    ),
    x5 AS MATERIALIZED (
      SELECT matd.i AS d,
             CAST(sum(CAST(round(matd.c * w4.v, 12)
                           AS DECIMAL(38,12))) AS DOUBLE) AS u
      FROM matd JOIN w4 ON matd.j = w4.d GROUP BY 1
    ),
    m5 AS MATERIALIZED (
      SELECT sqrt(CAST(sum(CAST(round(u * u, 12) AS DECIMAL(38,12)))
                       AS DOUBLE)) AS nm
      FROM x5
    ),
    w5 AS MATERIALIZED (
      SELECT d, u / (SELECT nm FROM m5) AS v
      FROM x5
    )
    SELECT round((SELECT nm FROM n5), 9) AS lambda1,
           round((SELECT nm FROM m5), 9) AS lambda2,
           round(CASE WHEN (SELECT nm FROM m5) <> 0
                 THEN (SELECT nm FROM n5)
                      / (SELECT nm FROM m5) END, 9)
             AS spectral_gap,
           round(CASE WHEN (SELECT tr FROM tr)::DOUBLE <> 0
                 THEN (SELECT nm FROM n5)
                      / (SELECT tr FROM tr)::DOUBLE END, 9) AS evr1,
           round(CASE WHEN (SELECT tr FROM tr)::DOUBLE <> 0
                 THEN (SELECT nm FROM m5)
                      / (SELECT tr FROM tr)::DOUBLE END, 9) AS evr2,
           round((SELECT tr FROM tr)::DOUBLE, 9) AS trace
    """)
def emb_spectral_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-two covariance eigenvalues by deflated power iteration
    (operators.similarity.spectral_gap_top2) — lambda1/lambda2: near 1
    means no single dominant axis, large means one direction owns the
    geometry (rogue feature / collapsed run); completes the spectral
    audit beside emb_power_iteration_top and emb_isotropy.  Phase 2
    runs the same decimal-carried steps on C - lambda1 v1 v1^T (a
    d-squared broadcast expression on exact phase-1 outputs); the
    oracle chains both unrolled phases around one deflation CTE."""
    from ..operators.similarity import spectral_gap_top2

    return spectral_gap_top2(
        _t(spark, sf_dir, "embeddings"), iterations=5
    )



@_q("esd_outlier_days", """
    WITH b1 AS MATERIALIZED (
      SELECT date_trunc('day', ts)::TIMESTAMP AS bk,
             CAST(round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                        / count(*)::DOUBLE, 6) AS DECIMAL(18,6)) AS m
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1
    ),
    s1 AS (
      SELECT bk, m, count(*) OVER () AS n,
             sum(m) OVER () AS s, sum(m * m) OVER () AS q,
             abs(count(*) OVER ()::DECIMAL(18,0) * m - sum(m) OVER ())
               AS anum,
             (count(*) OVER ()::DECIMAL(18,0) * m - sum(m) OVER ())
               AS num
      FROM b1
    ),
    p1 AS MATERIALIZED (
      SELECT * FROM (
        SELECT * FROM s1 ORDER BY anum DESC, bk ASC LIMIT 1
      ) WHERE n >= 3
    ),
    b2 AS MATERIALIZED (
      SELECT bk, m FROM b1
      WHERE (SELECT count(*) FROM p1) = 0
         OR bk <> (SELECT bk FROM p1)
    ),
    s2 AS (
      SELECT bk, m, count(*) OVER () AS n,
             sum(m) OVER () AS s, sum(m * m) OVER () AS q,
             abs(count(*) OVER ()::DECIMAL(18,0) * m - sum(m) OVER ())
               AS anum,
             (count(*) OVER ()::DECIMAL(18,0) * m - sum(m) OVER ())
               AS num
      FROM b2
    ),
    p2 AS MATERIALIZED (
      SELECT * FROM (
        SELECT * FROM s2 ORDER BY anum DESC, bk ASC LIMIT 1
      ) WHERE n >= 3
    ),
    b3 AS MATERIALIZED (
      SELECT bk, m FROM b2
      WHERE (SELECT count(*) FROM p2) = 0
         OR bk <> (SELECT bk FROM p2)
    ),
    s3 AS (
      SELECT bk, m, count(*) OVER () AS n,
             sum(m) OVER () AS s, sum(m * m) OVER () AS q,
             abs(count(*) OVER ()::DECIMAL(18,0) * m - sum(m) OVER ())
               AS anum,
             (count(*) OVER ()::DECIMAL(18,0) * m - sum(m) OVER ())
               AS num
      FROM b3
    ),
    p3 AS MATERIALIZED (
      SELECT * FROM (
        SELECT * FROM s3 ORDER BY anum DESC, bk ASC LIMIT 1
      ) WHERE n >= 3
    ),
    b4 AS MATERIALIZED (
      SELECT bk, m FROM b3
      WHERE (SELECT count(*) FROM p3) = 0
         OR bk <> (SELECT bk FROM p3)
    )

      SELECT CAST(1 AS BIGINT) AS round, n::BIGINT AS n_buckets,
             bk AS outlier_bucket, round(m::DOUBLE, 9) AS outlier_value,
             round(CASE WHEN sqrt(greatest(0.0,
                 (n::DOUBLE * q::DOUBLE - s::DOUBLE * s::DOUBLE)
                 / (n::DOUBLE * (n::DOUBLE - 1.0)))) > 0
               THEN (anum::DOUBLE / n::DOUBLE)
                    / sqrt(greatest(0.0,
                      (n::DOUBLE * q::DOUBLE - s::DOUBLE * s::DOUBLE)
                      / (n::DOUBLE * (n::DOUBLE - 1.0)))) END, 9)
               AS g_stat,
             CASE WHEN num::DOUBLE >= 0 THEN 'max' ELSE 'min' END
               AS side
      FROM p1    UNION ALL
      SELECT CAST(2 AS BIGINT) AS round, n::BIGINT AS n_buckets,
             bk AS outlier_bucket, round(m::DOUBLE, 9) AS outlier_value,
             round(CASE WHEN sqrt(greatest(0.0,
                 (n::DOUBLE * q::DOUBLE - s::DOUBLE * s::DOUBLE)
                 / (n::DOUBLE * (n::DOUBLE - 1.0)))) > 0
               THEN (anum::DOUBLE / n::DOUBLE)
                    / sqrt(greatest(0.0,
                      (n::DOUBLE * q::DOUBLE - s::DOUBLE * s::DOUBLE)
                      / (n::DOUBLE * (n::DOUBLE - 1.0)))) END, 9)
               AS g_stat,
             CASE WHEN num::DOUBLE >= 0 THEN 'max' ELSE 'min' END
               AS side
      FROM p2    UNION ALL
      SELECT CAST(3 AS BIGINT) AS round, n::BIGINT AS n_buckets,
             bk AS outlier_bucket, round(m::DOUBLE, 9) AS outlier_value,
             round(CASE WHEN sqrt(greatest(0.0,
                 (n::DOUBLE * q::DOUBLE - s::DOUBLE * s::DOUBLE)
                 / (n::DOUBLE * (n::DOUBLE - 1.0)))) > 0
               THEN (anum::DOUBLE / n::DOUBLE)
                    / sqrt(greatest(0.0,
                      (n::DOUBLE * q::DOUBLE - s::DOUBLE * s::DOUBLE)
                      / (n::DOUBLE * (n::DOUBLE - 1.0)))) END, 9)
               AS g_stat,
             CASE WHEN num::DOUBLE >= 0 THEN 'max' ELSE 'min' END
               AS side
      FROM p3""")
def esd_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized-ESD iterated extremes over daily event-value means
    (operators.timeseries.esd_extremes, 3 rounds) — Grubbs with
    REMOVAL, so a second outlier masked by the first still surfaces;
    the detection core of the S-H-ESD pipeline.  Exact decimal
    deviation numerators and moments per round; each removal is a
    broadcast anti-join on the bucket key; rounds unrolled as chained
    CTEs in the oracle."""
    from ..operators.timeseries import esd_extremes

    return esd_extremes(_t(spark, sf_dir, "events"), rounds=3)



@_q("yuen_trimmed_doclen", """
    WITH sa AS (
      WITH counts AS (
        SELECT n_chars::BIGINT AS v, count(*) AS c
        FROM documents
        WHERE n_chars IS NOT NULL AND lang IS NOT NULL AND lang = 'en'
        GROUP BY 1
      ),
      cw AS (
        SELECT v, c, sum(c) OVER (ORDER BY v) AS cum,
               sum(c) OVER () AS n
        FROM counts
      ),
      gk AS (
        SELECT v, c, cum, n, floor(0.1 * n)::BIGINT AS g FROM cw
      )
      SELECT max(n) AS n, max(g) AS g,
             sum(greatest(0, least(cum, n - g)
                 - greatest(cum - c, g))::HUGEINT * v::HUGEINT) AS ts,
             sum(greatest(0, least(cum, n - g)
                 - greatest(cum - c, g))::HUGEINT
                 * v::HUGEINT * v::HUGEINT) AS tq,
             max(CASE WHEN cum >= g + 1 AND cum - c < g + 1
                 THEN v END) AS L,
             max(CASE WHEN cum >= n - g AND cum - c < n - g
                 THEN v END) AS U
      FROM gk
    ),
    sb AS (
      WITH counts AS (
        SELECT n_chars::BIGINT AS v, count(*) AS c
        FROM documents
        WHERE n_chars IS NOT NULL AND lang IS NOT NULL AND lang <> 'en'
        GROUP BY 1
      ),
      cw AS (
        SELECT v, c, sum(c) OVER (ORDER BY v) AS cum,
               sum(c) OVER () AS n
        FROM counts
      ),
      gk AS (
        SELECT v, c, cum, n, floor(0.1 * n)::BIGINT AS g FROM cw
      )
      SELECT max(n) AS n, max(g) AS g,
             sum(greatest(0, least(cum, n - g)
                 - greatest(cum - c, g))::HUGEINT * v::HUGEINT) AS ts,
             sum(greatest(0, least(cum, n - g)
                 - greatest(cum - c, g))::HUGEINT
                 * v::HUGEINT * v::HUGEINT) AS tq,
             max(CASE WHEN cum >= g + 1 AND cum - c < g + 1
                 THEN v END) AS L,
             max(CASE WHEN cum >= n - g AND cum - c < n - g
                 THEN v END) AS U
      FROM gk
    ),
    j AS (SELECT sa.n AS na, sa.g AS ga, sa.ts AS tsa, sa.tq AS tqa,
                 sa.L AS La, sa.U AS Ua,
                 sb.n AS nb, sb.g AS gb, sb.ts AS tsb, sb.tq AS tqb,
                 sb.L AS Lb, sb.U AS Ub
          FROM sa CROSS JOIN sb),
    calc AS (
      SELECT na, nb,
             (na - 2 * ga) AS hha, (nb - 2 * gb) AS hhb,
             tsa::DOUBLE / nullif((na - 2 * ga)::DOUBLE, 0) AS ma,
             tsb::DOUBLE / nullif((nb - 2 * gb)::DOUBLE, 0) AS mb,
             CASE WHEN na >= 2 THEN
               ((tqa::DOUBLE + ga::DOUBLE * La::DOUBLE * La::DOUBLE
                 + ga::DOUBLE * Ua::DOUBLE * Ua::DOUBLE)
                - (tsa::DOUBLE + ga::DOUBLE * La::DOUBLE
                   + ga::DOUBLE * Ua::DOUBLE)
                  * (tsa::DOUBLE + ga::DOUBLE * La::DOUBLE
                     + ga::DOUBLE * Ua::DOUBLE) / na::DOUBLE)
               / (na::DOUBLE - 1.0) END AS s2wa,
             CASE WHEN nb >= 2 THEN
               ((tqb::DOUBLE + gb::DOUBLE * Lb::DOUBLE * Lb::DOUBLE
                 + gb::DOUBLE * Ub::DOUBLE * Ub::DOUBLE)
                - (tsb::DOUBLE + gb::DOUBLE * Lb::DOUBLE
                   + gb::DOUBLE * Ub::DOUBLE)
                  * (tsb::DOUBLE + gb::DOUBLE * Lb::DOUBLE
                     + gb::DOUBLE * Ub::DOUBLE) / nb::DOUBLE)
               / (nb::DOUBLE - 1.0) END AS s2wb
      FROM j
    ),
    dd AS (
      SELECT *,
             (na::DOUBLE - 1.0) * s2wa
               / nullif(hha::DOUBLE * (hha::DOUBLE - 1.0), 0) AS da,
             (nb::DOUBLE - 1.0) * s2wb
               / nullif(hhb::DOUBLE * (hhb::DOUBLE - 1.0), 0) AS db
      FROM calc
    ),
    tt AS (
      SELECT *,
             CASE WHEN hha >= 2 AND hhb >= 2 AND da + db > 0
                  THEN (ma - mb) / sqrt(da + db) END AS t,
             (da + db) * (da + db)
               / nullif(da * da / (hha::DOUBLE - 1.0)
                        + db * db / (hhb::DOUBLE - 1.0), 0) AS dfree
      FROM dd
    ),
    pv AS (
      SELECT *, (1.0 / (1.0 + 0.3275911 * (abs(t) / sqrt(2.0)))) AS u
      FROM tt
    )
    SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
           hha::BIGINT AS h_a, hhb::BIGINT AS h_b,
           round(ma, 9) AS tmean_a, round(mb, 9) AS tmean_b,
           round(t, 9) AS t, round(dfree, 9) AS df,
           round(u * (0.254829592 + u * (-0.284496736
             + u * (1.421413741
             + u * (-1.453152027 + u * 1.061405429))))
             * exp(-(abs(t) / sqrt(2.0)) * (abs(t) / sqrt(2.0))), 9)
             AS p_approx
    FROM pv
    """)
def yuen_trimmed_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yuen's 10%-trimmed-means t-test between en and non-en doc
    lengths (operators.evaluation.yuen_trimmed_t) — the robust location
    verdict between Welch (tail-owned means) and Mann-Whitney (no
    magnitude): trimmed-class means with winsorized variance.  Exact
    order-statistic trimming via integer cumulative counts on the
    distinct-length axis; the normal-approx p carries the documented
    large-h caveat."""
    from ..operators.evaluation import yuen_trimmed_t

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("lang").isNotNull()
    )
    return yuen_trimmed_t(
        docs.filter(F.col("lang") == "en"),
        docs.filter(F.col("lang") != "en"),
        "n_chars",
        trim=0.1,
    )



@_q(
    "cmh_purchase_by_activity",
    """
    WITH users AS (
      SELECT user_id, count(*) AS n_events,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS y,
             (user_id % 2)::VARCHAR AS g
      FROM events WHERE user_id IS NOT NULL GROUP BY 1
    ),
    strat AS (
      SELECT ntile(3) OVER (ORDER BY n_events, user_id) AS s, g, y
      FROM users
    ),
    cells AS (
      SELECT s, count(*) AS n,
             sum(CASE WHEN g = '0' THEN y ELSE 0 END) AS a,
             sum(CASE WHEN g = '0' THEN 1 - y ELSE 0 END) AS b,
             sum(CASE WHEN g <> '0' THEN y ELSE 0 END) AS c,
             sum(CASE WHEN g <> '0' THEN 1 - y ELSE 0 END) AS d
      FROM strat GROUP BY 1
    ),
    terms AS (
      SELECT n, a,
             (a + b)::DOUBLE * (a + c)::DOUBLE / n::DOUBLE AS e,
             CASE WHEN n >= 2 THEN
               (a + b)::DOUBLE * (c + d)::DOUBLE * (a + c)::DOUBLE
               * (b + d)::DOUBLE
               / (n::DOUBLE * n::DOUBLE * (n::DOUBLE - 1.0))
             ELSE 0.0 END AS v,
             a::DOUBLE * d::DOUBLE / n::DOUBLE AS adn,
             b::DOUBLE * c::DOUBLE / n::DOUBLE AS bcn
      FROM cells
    ),
    agg AS (
      SELECT sum(n) AS tot, count(*) AS k,
             sum(a::HUGEINT) AS sa,
             sum(CAST(round(e, 9) AS DECIMAL(28,9))) AS se,
             sum(CAST(round(v, 9) AS DECIMAL(28,9))) AS sv,
             sum(CAST(round(adn, 9) AS DECIMAL(28,9))) AS sad,
             sum(CAST(round(bcn, 9) AS DECIMAL(28,9))) AS sbc
      FROM terms
    ),
    stat AS (
      SELECT tot, k, sv, sad, sbc,
             CASE WHEN sv::DOUBLE > 0 THEN
               (abs(sa::DOUBLE - se::DOUBLE) - 0.5)
               * (abs(sa::DOUBLE - se::DOUBLE) - 0.5) / sv::DOUBLE
             END AS cmh
      FROM agg
    ),
    pv AS (
      SELECT *,
             (1.0 / (1.0 + 0.3275911 * (abs(sqrt(cmh)) / sqrt(2.0))))
               AS u
      FROM stat
    )
    SELECT tot::BIGINT AS n, k::BIGINT AS k_strata,
           round(cmh, 9) AS cmh,
           round(u * (0.254829592 + u * (-0.284496736
             + u * (1.421413741
             + u * (-1.453152027 + u * 1.061405429))))
             * exp(-(abs(sqrt(cmh)) / sqrt(2.0))
                   * (abs(sqrt(cmh)) / sqrt(2.0))), 9) AS p_approx,
           round(sad::DOUBLE / nullif(sbc::DOUBLE, 0), 9) AS or_mh
    FROM pv
    """,
)
def cmh_purchase_by_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel test + MH common odds ratio of
    purchase-vs-arm association stratified by activity tertile
    (operators.evaluation.cmh_test) — the confounder-adjusted A/B
    verdict beside ab_simpsons_check's reversal detector: test within
    strata, pool the evidence; OR_MH is the common effect estimate.
    Exact integer cells; E/V/OR terms decimal-quantized on the stratum
    axis."""
    from ..operators.evaluation import cmh_test

    users = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("y"),
        )
        .select(
            "user_id",
            "n_events",
            "y",
            (F.col("user_id") % 2).cast("string").alias("g"),
        )
    )
    strat = users.select(
        F.ntile(3)
        .over(Window.orderBy(F.col("n_events"), F.col("user_id")))
        .alias("s"),
        "g",
        "y",
    )
    return cmh_test(strat, "s", "g", "y")



@_q(
    "binseg_daily_value",
    """
    WITH b AS (
      SELECT date_trunc('day', ts)::TIMESTAMP AS bk,
             CAST(round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                        / count(*)::DOUBLE, 6) AS DECIMAL(18,6)) AS m
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1
    ),
    idx AS (
      SELECT bk, row_number() OVER (ORDER BY bk) AS t,
             sum(m) OVER (ORDER BY bk) AS cum,
             count(*) OVER () AS n, sum(m) OVER () AS tot
      FROM b
    ),
    c1 AS (
      SELECT bk, t, n AS nseg,
             cum::DOUBLE * cum::DOUBLE / t::DOUBLE
             + (tot::DOUBLE - cum::DOUBLE)
               * (tot::DOUBLE - cum::DOUBLE) / (n::DOUBLE - t::DOUBLE)
             - tot::DOUBLE * tot::DOUBLE / n::DOUBLE AS gain
      FROM idx WHERE t < n
    ),
    p1 AS (
      SELECT * FROM c1 ORDER BY gain DESC, t ASC LIMIT 1
    ),
    bd AS (
      SELECT idx.t AS T, idx.cum AS cumT
      FROM idx JOIN p1 ON idx.t = p1.t
    ),
    cl AS (
      SELECT idx.bk, idx.t, bd.T AS nseg,
             idx.cum::DOUBLE * idx.cum::DOUBLE / idx.t::DOUBLE
             + (bd.cumT::DOUBLE - idx.cum::DOUBLE)
               * (bd.cumT::DOUBLE - idx.cum::DOUBLE)
               / (bd.T::DOUBLE - idx.t::DOUBLE)
             - bd.cumT::DOUBLE * bd.cumT::DOUBLE / bd.T::DOUBLE AS gain
      FROM idx CROSS JOIN bd WHERE idx.t < bd.T
    ),
    pl AS (SELECT * FROM cl ORDER BY gain DESC, t ASC LIMIT 1),
    cr AS (
      SELECT idx.bk, idx.t, (idx.n - bd.T) AS nseg,
             (idx.cum::DOUBLE - bd.cumT::DOUBLE)
               * (idx.cum::DOUBLE - bd.cumT::DOUBLE)
               / (idx.t::DOUBLE - bd.T::DOUBLE)
             + ((idx.tot::DOUBLE - bd.cumT::DOUBLE)
                - (idx.cum::DOUBLE - bd.cumT::DOUBLE))
               * ((idx.tot::DOUBLE - bd.cumT::DOUBLE)
                  - (idx.cum::DOUBLE - bd.cumT::DOUBLE))
               / ((idx.n::DOUBLE - bd.T::DOUBLE)
                  - (idx.t::DOUBLE - bd.T::DOUBLE))
             - (idx.tot::DOUBLE - bd.cumT::DOUBLE)
               * (idx.tot::DOUBLE - bd.cumT::DOUBLE)
               / (idx.n::DOUBLE - bd.T::DOUBLE) AS gain
      FROM idx CROSS JOIN bd WHERE idx.t > bd.T AND idx.t < idx.n
    ),
    pr AS (SELECT * FROM cr ORDER BY gain DESC, t ASC LIMIT 1)
    SELECT CAST(1 AS BIGINT) AS level, 'all' AS segment,
           bk AS change_bucket, nseg::BIGINT AS n_segment,
           round(gain, 9) AS gain
    FROM p1
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'left', bk, nseg::BIGINT, round(gain, 9)
    FROM pl
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'right', bk, nseg::BIGINT, round(gain, 9)
    FROM pr
    """,
)
def binseg_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level binary-segmentation changepoints over daily event-value
    means (operators.timeseries.binseg_changepoints) — the multi-shift
    extension of the single-changepoint CUSUM/Pettitt pair: best
    between-segment sum-of-squares split of the whole series, then of
    each half.  Exact decimal prefix sums on the bucket axis; every
    gain is one IEEE expression, earliest-bucket argmax tiebreak."""
    from ..operators.timeseries import binseg_changepoints

    return binseg_changepoints(_t(spark, sf_dir, "events"))


@_q(
    "retention_km_bands",
    """
    WITH per_u AS (
      SELECT user_id,
             CASE WHEN min(ts) FILTER (WHERE event_type = 'error'
                         AND event_id % 5 = 0) IS NOT NULL
                  THEN date_diff('day', min(ts)::DATE,
                         min(ts) FILTER (WHERE event_type = 'error'
                           AND event_id % 5 = 0)::DATE)
                  ELSE date_diff('day', min(ts)::DATE,
                         (SELECT max(ts)::DATE FROM events)) END AS duration,
             CASE WHEN min(ts) FILTER (WHERE event_type = 'error'
                         AND event_id % 5 = 0) IS NOT NULL
                  THEN 1 ELSE 0 END AS event
      FROM events GROUP BY 1
    ),
    per_t AS (
      SELECT duration AS t, sum(event) AS n_events,
             sum(1 - event) AS n_censored, count(*) AS rows_
      FROM per_u GROUP BY 1
    ),
    tot AS (SELECT sum(rows_) AS total FROM per_t),
    staged AS (
      SELECT t, n_events, n_censored,
             total - coalesce(sum(rows_) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_at_risk
      FROM per_t, tot
    ),
    s2 AS (
      SELECT t, CAST(n_at_risk AS BIGINT) AS n_at_risk,
             CAST(n_events AS BIGINT) AS n_events,
             CAST(n_censored AS BIGINT) AS n_censored,
             CASE WHEN n_events < n_at_risk
                  THEN CAST(ln(CAST(1 AS DOUBLE)
                         - CAST(n_events AS DOUBLE) / n_at_risk)
                       AS DECIMAL(28,12)) END AS lnv,
             CASE WHEN n_events < n_at_risk
                  THEN CAST(CAST(n_events AS DOUBLE)
                         / (CAST(n_at_risk AS DOUBLE)
                            * (CAST(n_at_risk AS DOUBLE)
                               - CAST(n_events AS DOUBLE)))
                       AS DECIMAL(28,12))
                  ELSE CAST(0 AS DECIMAL(28,12)) END AS gv,
             CASE WHEN n_events = n_at_risk THEN 1 ELSE 0 END AS zf
      FROM staged
    ),
    s3 AS (
      SELECT t, n_at_risk, n_events, n_censored,
             max(zf) OVER wc AS zero, sum(lnv) OVER wc AS cum,
             sum(gv) OVER wc AS cumg
      FROM s2
      WINDOW wc AS (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s4 AS (
      SELECT t, n_at_risk, n_events, n_censored, zero,
             CASE WHEN zero = 1 THEN CAST(0 AS DOUBLE)
                  ELSE CAST(CAST(exp(CAST(cum AS DOUBLE))
                         AS DECIMAL(28,12)) AS DOUBLE) END AS survival,
             CAST(cum AS DOUBLE) AS lns,
             CAST(CAST(sqrt(CAST(cumg AS DOUBLE))
                  AS DECIMAL(28,12)) AS DOUBLE) AS sqrtg
      FROM s3
    ),
    s5 AS (
      SELECT *,
             CASE WHEN zero = 0 AND lns < 0
                  THEN CAST(CAST(1.959963984540054 * sqrtg / (-lns)
                       AS DECIMAL(28,12)) AS DOUBLE) END AS delta
      FROM s4
    )
    SELECT t, n_at_risk, n_events, n_censored, survival,
           round(survival * sqrtg, 9) AS se,
           round(CAST(CAST(exp(
             CAST(CAST(exp(delta) AS DECIMAL(28,12)) AS DOUBLE) * lns)
             AS DECIMAL(28,12)) AS DOUBLE), 9) AS ci_lo,
           round(CAST(CAST(exp(
             CAST(CAST(exp(-delta) AS DECIMAL(28,12)) AS DOUBLE) * lns)
             AS DECIMAL(28,12)) AS DOUBLE), 9) AS ci_hi
    FROM s5
    """,
)
def retention_km_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier churn curve WITH Greenwood SE and log-log 95% bands
    (operators.funnel.km_bands) — same churn fixture as
    retention_km_curve (first error event with event_id%5=0, censored
    at observation end), now answering "is this retention drop real":
    the log-log transform keeps bands inside (0,1); Greenwood terms and
    every ln/exp/sqrt quantize through decimal(28,12) (libm guard) on
    the bounded distinct-duration axis only."""
    from ..operators.funnel import km_bands

    ev = _t(spark, sf_dir, "events")
    obs_end = ev.agg(F.max(F.to_date("ts")).alias("_end"))
    churn_ts = F.min(
        F.when(
            (F.col("event_type") == "error")
            & (F.col("event_id") % 5 == 0),
            F.col("ts"),
        )
    )
    per_u = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("_first"),
            F.to_date(churn_ts).alias("_churn"),
        )
        .crossJoin(F.broadcast(obs_end))
        .select(
            F.when(
                F.col("_churn").isNotNull(),
                F.datediff("_churn", "_first"),
            )
            .otherwise(F.datediff("_end", "_first"))
            .alias("duration"),
            F.col("_churn").isNotNull().cast("int").alias("event"),
        )
    )
    return km_bands(per_u)


@_q(
    "benford_significand",
    """
    WITH pos AS (
      SELECT value::DOUBLE AS v FROM events
      WHERE value IS NOT NULL AND value > 0
    ),
    counts AS (
      SELECT CAST(substr(printf('%.6e', v), 1, 1) AS INT) AS digit,
             count(*) AS n
      FROM pos GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS total FROM counts)
    SELECT digit, CAST(n AS BIGINT) AS n,
           round(n::DOUBLE / total::DOUBLE, 9) AS share,
           round(log10(1.0 + 1.0 / digit), 9) AS expected,
           round(abs(n::DOUBLE / total::DOUBLE
                     - log10(1.0 + 1.0 / digit)), 9) AS abs_dev
    FROM counts, tot
    """,
)
def benford_significand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of the event value column via the
    normalized-scientific-form significand
    (operators.profile.benford_significand) — the general-magnitude
    variant benford_totalprice's fixed-decimals PRECONDITION rules out:
    the digit is the first character of printf('%.6e', x), identical in
    both engines because they format the same IEEE double with C-printf
    rounding. One 9-ary count groupBy; shares over the digit axis."""
    from ..operators.profile import benford_significand

    return benford_significand(_t(spark, sf_dir, "events"), "value")


@_q(
    "cohens_d_doclen",
    """
    WITH base AS (
      SELECT (lang = 'en') AS f, round(n_chars::DOUBLE, 9) AS v
      FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL
    ),
    agg AS (
      SELECT f, count(*) AS n,
             sum(CAST(v AS DECIMAL(28,9))) AS s,
             sum(CAST(round(v * v, 9) AS DECIMAL(28,9))) AS q
      FROM base GROUP BY 1
    ),
    t AS (SELECT n AS n1, s AS s1, q AS q1 FROM agg WHERE f),
    fl AS (SELECT n AS n0, s AS s0, q AS q0 FROM agg WHERE NOT f),
    m AS (
      SELECT n1, n0,
             s1::DOUBLE / n1::DOUBLE AS m1,
             s0::DOUBLE / n0::DOUBLE AS m0,
             q1::DOUBLE - n1::DOUBLE * (s1::DOUBLE / n1::DOUBLE)
               * (s1::DOUBLE / n1::DOUBLE) AS ss1,
             q0::DOUBLE - n0::DOUBLE * (s0::DOUBLE / n0::DOUBLE)
               * (s0::DOUBLE / n0::DOUBLE) AS ss0
      FROM t CROSS JOIN fl
    ),
    d AS (
      SELECT n1, n0, m1, m0,
             sqrt((ss1 + ss0) / (n1::DOUBLE + n0::DOUBLE - 2.0)) AS sp
      FROM m
    )
    SELECT n1::BIGINT AS n_true, n0::BIGINT AS n_false,
           round(m1, 9) AS mean_true, round(m0, 9) AS mean_false,
           round(sp, 9) AS pooled_sd,
           round((m1 - m0) / nullif(sp, 0), 9) AS cohens_d,
           round((m1 - m0) / nullif(sp, 0)
                 * (1.0 - 3.0 / (4.0 * (n1::DOUBLE + n0::DOUBLE) - 9.0)),
                 9) AS hedges_g
    FROM d
    """,
)
def cohens_d_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d / Hedges' g standardized length effect of English vs
    non-English docs (operators.evaluation.cohens_d) — the transferable
    effect size beside mw/welch's significance verdicts.  One
    partial-aggregable decimal-moment scan; closed form per group
    pair."""
    from ..operators.evaluation import cohens_d

    docs = _t(spark, sf_dir, "documents")
    return cohens_d(
        docs.filter(F.col("lang").isNotNull()),
        "n_chars",
        F.col("lang") == "en",
    )


@_q(
    "ab_ratio_value_per_event",
    """
    WITH per_u AS (
      SELECT user_id AS u,
             CAST(sum(CAST(round(coalesce(value, 0), 9)
                  AS DECIMAL(28,9))) AS DOUBLE) AS x,
             CAST(sum(CAST(round(1.0, 9) AS DECIMAL(28,9)))
                  AS DOUBLE) AS y
      FROM events WHERE user_id IS NOT NULL GROUP BY 1
    ),
    pu2 AS (SELECT CAST(u % 2 AS VARCHAR) AS arm, x, y FROM per_u),
    agg AS (
      SELECT arm, count(*) AS n,
             sum(CAST(round(x, 9) AS DECIMAL(28,9))) AS sx,
             sum(CAST(round(y, 9) AS DECIMAL(28,9))) AS sy,
             sum(CAST(round(x * x, 9) AS DECIMAL(28,9))) AS sxx,
             sum(CAST(round(y * y, 9) AS DECIMAL(28,9))) AS syy,
             sum(CAST(round(x * y, 9) AS DECIMAL(28,9))) AS sxy
      FROM pu2 GROUP BY 1
    ),
    st AS (
      SELECT arm, n,
             sx::DOUBLE / nullif(sy::DOUBLE, 0) AS r,
             ((sxx::DOUBLE - n::DOUBLE * (sx::DOUBLE / n::DOUBLE)
                 * (sx::DOUBLE / n::DOUBLE)) / (n::DOUBLE - 1.0)
              - 2.0 * (sx::DOUBLE / nullif(sy::DOUBLE, 0))
                 * ((sxy::DOUBLE - n::DOUBLE * (sx::DOUBLE / n::DOUBLE)
                     * (sy::DOUBLE / n::DOUBLE)) / (n::DOUBLE - 1.0))
              + (sx::DOUBLE / nullif(sy::DOUBLE, 0))
                 * (sx::DOUBLE / nullif(sy::DOUBLE, 0))
                 * ((syy::DOUBLE - n::DOUBLE * (sy::DOUBLE / n::DOUBLE)
                     * (sy::DOUBLE / n::DOUBLE)) / (n::DOUBLE - 1.0)))
             / nullif(n::DOUBLE * (sy::DOUBLE / n::DOUBLE)
                      * (sy::DOUBLE / n::DOUBLE), 0) AS v
      FROM agg
    ),
    a AS (SELECT n AS na, r AS ra, v AS va FROM st WHERE arm = '0'),
    b AS (SELECT n AS nb, r AS rb, v AS vb FROM st WHERE arm <> '0')
    SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
           round(ra, 9) AS ratio_a, round(rb, 9) AS ratio_b,
           round(ra - rb, 9) AS diff,
           round(sqrt(va + vb), 9) AS se,
           round((ra - rb) / nullif(sqrt(va + vb), 0), 9) AS z,
           coalesce(abs((ra - rb) / nullif(sqrt(va + vb), 0))
                    > 1.959963984540054, false) AS significant
    FROM a CROSS JOIN b
    """,
)
def ab_ratio_value_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method A/B comparison of the value-per-event ratio metric
    with user-level randomization (user_id % 2 arms)
    (operators.evaluation.ratio_metric_delta) — the within-user
    numerator/denominator correlation a per-row t-test ignores.  One
    user-keyed reduce + one bounded per-arm decimal-moment reduce."""
    from ..operators.evaluation import ratio_metric_delta

    ev = _t(spark, sf_dir, "events")
    return ratio_metric_delta(
        ev,
        "user_id",
        F.coalesce(F.col("value"), F.lit(0.0)),
        F.lit(1.0),
    )


@_q(
    "ab_sprt_purchase_daily",
    """
    WITH per_day AS (
      SELECT date_trunc('day', ts)::TIMESTAMP AS day, count(*) AS n,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS k
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1
    ),
    staged AS (
      SELECT day, n, k,
             sum(n) OVER w AS n_cum, sum(k) OVER w AS k_cum
      FROM per_day
      WINDOW w AS (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    scored AS (
      SELECT day, n, k, n_cum, k_cum,
             k_cum::DOUBLE * 0.22314355131420976
               + (n_cum - k_cum)::DOUBLE * (-0.06453852113757118)
               AS llr
      FROM staged
    ),
    dec AS (
      SELECT *,
             CASE WHEN llr >= 2.772588722239781 THEN 'accept_h1'
                  WHEN llr <= -1.5581446180465497 THEN 'accept_h0'
                  ELSE 'continue' END AS decision,
             coalesce(sum(CASE WHEN llr >= 2.772588722239781
                                 OR llr <= -1.5581446180465497
                               THEN 1 ELSE 0 END)
                      OVER (ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS prior_hits
      FROM scored
    )
    SELECT day, n::BIGINT AS n, k::BIGINT AS k,
           n_cum::BIGINT AS n_cum, k_cum::BIGINT AS k_cum,
           round(llr, 9) AS llr, decision,
           (decision <> 'continue' AND prior_hits = 0) AS crossed
    FROM dec
    """,
)
def ab_sprt_purchase_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT replay of the daily purchase-rate history (H0 p=0.2 vs
    H1 p=0.25, alpha=0.05, beta=0.2)
    (operators.evaluation.sprt_daily) — the sequential early-stopping
    readout; LLR coefficients and boundaries are Python literals so
    every statistic is an integer-weighted literal sum (no libm).  One
    day-axis reduce + cumulative windows."""
    from ..operators.evaluation import sprt_daily

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    return sprt_daily(
        ev, "ts", F.col("event_type") == "purchase"
    )


@_q(
    "hazard_ratio_churn_parity",
    """
    WITH per_u AS (
      SELECT CAST(user_id % 2 AS VARCHAR) AS g,
             CASE WHEN min(ts) FILTER (WHERE event_type = 'error'
                         AND event_id % 5 = 0) IS NOT NULL
                  THEN date_diff('day', min(ts)::DATE,
                         min(ts) FILTER (WHERE event_type = 'error'
                           AND event_id % 5 = 0)::DATE)
                  ELSE date_diff('day', min(ts)::DATE,
                         (SELECT max(ts)::DATE FROM events)) END AS t,
             CASE WHEN min(ts) FILTER (WHERE event_type = 'error'
                         AND event_id % 5 = 0) IS NOT NULL
                  THEN 1 ELSE 0 END AS e
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    arms AS (
      SELECT g, d, tt, row_number() OVER (ORDER BY g) AS rk,
             count(*) OVER () AS narms
      FROM (SELECT g, sum(e) AS d, sum(t) AS tt FROM per_u GROUP BY 1)
    ),
    a AS (SELECT g AS ga, d AS da, tt AS ta, narms FROM arms
          WHERE rk = 1),
    b AS (SELECT g AS gb, d AS db, tt AS tb FROM arms WHERE rk = 2),
    j AS (
      SELECT *,
             da::DOUBLE / nullif(ta::DOUBLE, 0) AS ra,
             db::DOUBLE / nullif(tb::DOUBLE, 0) AS rb
      FROM a CROSS JOIN b
    ),
    hrt AS (
      SELECT *,
             CASE WHEN narms = 2
                  THEN rb / nullif(ra, 0) END AS hr,
             CASE WHEN da > 0 AND db > 0
                  THEN CAST(CAST(sqrt(1.0 / da::DOUBLE
                         + 1.0 / db::DOUBLE) AS DECIMAL(28,12))
                       AS DOUBLE) END AS se
      FROM j
    ),
    lnh AS (
      SELECT *,
             CAST(CAST(ln(hr) AS DECIMAL(28,12)) AS DOUBLE) AS lnhr
      FROM hrt
    )
    SELECT CASE WHEN narms = 2 THEN ga END AS group_a,
           CASE WHEN narms = 2 THEN gb END AS group_b,
           da::BIGINT AS events_a, ta::BIGINT AS time_a,
           db::BIGINT AS events_b, tb::BIGINT AS time_b,
           round(ra, 9) AS rate_a, round(rb, 9) AS rate_b,
           round(hr, 9) AS hr,
           round(CAST(CAST(exp(lnhr - 1.959963984540054 * se)
                 AS DECIMAL(28,12)) AS DOUBLE), 9) AS hr_lo,
           round(CAST(CAST(exp(lnhr + 1.959963984540054 * se)
                 AS DECIMAL(28,12)) AS DOUBLE), 9) AS hr_hi
    FROM lnh
    """,
)
def hazard_ratio_churn_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-model churn hazard ratio between the user-parity arms
    (operators.funnel.exponential_hazard_ratio) — the one-number effect
    size beside logrank_churn_by_parity's significance verdict, same
    churn fixture (first error event with event_id%5=0, censored at
    observation end).  Exact integer events/person-time per arm; ln/exp
    through the decimal(28,12) libm guard."""
    from ..operators.funnel import exponential_hazard_ratio

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    obs_end = ev.agg(F.max(F.to_date("ts")).alias("_end"))
    churn_ts = F.min(
        F.when(
            (F.col("event_type") == "error")
            & (F.col("event_id") % 5 == 0),
            F.col("ts"),
        )
    )
    per_u = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("_first"),
            F.to_date(churn_ts).alias("_churn"),
        )
        .crossJoin(F.broadcast(obs_end))
        .select(
            (F.col("user_id") % 2).cast("string").alias("group"),
            F.when(
                F.col("_churn").isNotNull(),
                F.datediff("_churn", "_first"),
            )
            .otherwise(F.datediff("_end", "_first"))
            .alias("duration"),
            F.col("_churn").isNotNull().cast("int").alias("event"),
        )
    )
    return exponential_hazard_ratio(per_u)


@_q(
    "event_count_overdispersion",
    """
    WITH per AS (
      SELECT user_id, count(*) AS k FROM events
      WHERE user_id IS NOT NULL GROUP BY 1
    ),
    agg AS (
      SELECT count(*) AS n, sum(k::HUGEINT) AS s,
             sum(k::HUGEINT * k::HUGEINT) AS q
      FROM per
    ),
    st AS (
      SELECT n, s,
             s::DOUBLE / n::DOUBLE AS m,
             (q::DOUBLE - n::DOUBLE * (s::DOUBLE / n::DOUBLE)
               * (s::DOUBLE / n::DOUBLE)) / (n::DOUBLE - 1.0) AS v
      FROM agg
    ),
    fin AS (
      SELECT n, s, m, v,
             v / nullif(m, 0) AS disp,
             (n::DOUBLE - 1.0) * (v / nullif(m, 0)) AS chi2
      FROM st
    )
    SELECT n::BIGINT AS n_units, s::BIGINT AS n_events,
           round(m, 9) AS mean, round(v, 9) AS variance,
           round(disp, 9) AS dispersion, round(chi2, 9) AS chi2,
           round(sqrt(2.0 * chi2)
                 - sqrt(2.0 * (n::DOUBLE - 1.0) - 1.0), 9) AS z,
           coalesce(sqrt(2.0 * chi2)
                    - sqrt(2.0 * (n::DOUBLE - 1.0) - 1.0)
                    > 1.959963984540054, false) AS overdispersed
    FROM fin
    """,
)
def event_count_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson overdispersion diagnostic on per-user event counts
    (operators.evaluation.count_overdispersion) — dispersion index,
    (n-1)-scaled chi-square and Fisher's sqrt approximation; the
    model-sanity gate before Poisson rate CIs on this event stream.
    One user-keyed count reduce + one exact-integer moment reduce."""
    from ..operators.evaluation import count_overdispersion

    return count_overdispersion(_t(spark, sf_dir, "events"), "user_id")


#: Shared daily bucket-mean CTE (mirrors operators.timeseries._bucket_means:
#: 6-dp round BEFORE the decimal cast — the .5-ULP boundary rule).
_BUCKET_DAY = """
      SELECT date_trunc('day', ts)::TIMESTAMP AS bk,
             CAST(round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                        / count(*)::DOUBLE, 6) AS DECIMAL(18,6)) AS m
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1
"""


@_q(
    "ts_turning_points",
    f"""
    WITH b AS ({_BUCKET_DAY}),
    lagged AS (
      SELECT m::DOUBLE AS m,
             lag(m::DOUBLE) OVER (ORDER BY bk) AS pm,
             lead(m::DOUBLE) OVER (ORDER BY bk) AS nm
      FROM b
    ),
    tp AS (
      SELECT CASE WHEN pm IS NOT NULL AND nm IS NOT NULL
                   AND sign(m - pm) * sign(nm - m) < 0
                  THEN 1 ELSE 0 END AS t
      FROM lagged
    ),
    agg AS (SELECT count(*) AS n, sum(t) AS t FROM tp)
    SELECT n::BIGINT AS n_buckets, t::BIGINT AS turning_points,
           round(2.0 * (n::DOUBLE - 2.0) / 3.0, 9) AS expected,
           round(CASE WHEN n >= 3
                       AND (16.0 * n::DOUBLE - 29.0) / 90.0 > 0
                      THEN (t::DOUBLE - 2.0 * (n::DOUBLE - 2.0) / 3.0)
                           / sqrt((16.0 * n::DOUBLE - 29.0) / 90.0)
                 END, 9) AS z,
           coalesce(abs(CASE WHEN n >= 3
                              AND (16.0 * n::DOUBLE - 29.0) / 90.0 > 0
                             THEN (t::DOUBLE
                                   - 2.0 * (n::DOUBLE - 2.0) / 3.0)
                                  / sqrt((16.0 * n::DOUBLE - 29.0)
                                         / 90.0)
                        END) > 1.959963984540054, false) AS nonrandom
    FROM agg
    """,
)
def ts_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-points randomness test on daily event-value means
    (operators.timeseries.turning_points_test) — strict local extrema
    counted against the i.i.d. expectation 2(n-2)/3; too few = drift,
    too many = oscillation.  Bounded day-axis lags; exact integer T."""
    from ..operators.timeseries import turning_points_test

    return turning_points_test(_t(spark, sf_dir, "events"))


@_q(
    "ts_bartels_rank",
    f"""
    WITH b AS ({_BUCKET_DAY}),
    rk AS (
      SELECT bk, row_number() OVER (ORDER BY m, bk) AS r FROM b
    ),
    dd AS (
      SELECT r, r - lead(r) OVER (ORDER BY bk) AS d FROM rk
    ),
    agg AS (
      SELECT count(*) AS n, sum(d * d) AS nm FROM dd
    ),
    st AS (
      SELECT n, nm,
             nm::DOUBLE / nullif(n::DOUBLE * (n::DOUBLE * n::DOUBLE
               - 1.0) / 12.0, 0) AS rvn,
             4.0 * (n::DOUBLE - 2.0)
               * (5.0 * n::DOUBLE * n::DOUBLE - 2.0 * n::DOUBLE - 9.0)
               / (5.0 * n::DOUBLE * (n::DOUBLE + 1.0)
                  * (n::DOUBLE - 1.0) * (n::DOUBLE - 1.0)) AS var
      FROM agg
    )
    SELECT n::BIGINT AS n_buckets, round(rvn, 9) AS rvn,
           round(CASE WHEN n >= 4 AND var > 0
                      THEN (rvn - 2.0) / sqrt(var) END, 9) AS z,
           coalesce(abs(CASE WHEN n >= 4 AND var > 0
                             THEN (rvn - 2.0) / sqrt(var) END)
                    > 1.959963984540054, false) AS nonrandom
    FROM st
    """,
)
def ts_bartels_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartels rank von Neumann ratio on daily event-value means
    (operators.timeseries.bartels_rank_test) — rank-based serial-
    correlation test; total-order (value, bucket) ranks make both sums
    exact integers with the closed-form n(n^2-1)/12 denominator."""
    from ..operators.timeseries import bartels_rank_test

    return bartels_rank_test(_t(spark, sf_dir, "events"))


@_q(
    "ts_spectral_entropy",
    """
    WITH b AS (
      SELECT date_trunc('hour', ts)::TIMESTAMP AS bk,
             CAST(round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                        / count(*)::DOUBLE, 6) AS DECIMAL(18,6)) AS m
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1
    ),
    idx AS (
      SELECT row_number() OVER (ORDER BY bk) AS i,
             count(*) OVER () AS n,
             m::DOUBLE - (sum(m) OVER ())::DOUBLE
               / (count(*) OVER ())::DOUBLE AS d
      FROM b
    ),
    g AS (
      SELECT i, n, d, unnest(range(2, 49)) AS p
      FROM idx WHERE n >= 4
    ),
    per AS (
      SELECT p,
             sum(CAST(d * cos(6.283185307179586 * i::DOUBLE
                              / p::DOUBLE) AS DECIMAL(28,12))) AS c,
             sum(CAST(d * sin(6.283185307179586 * i::DOUBLE
                              / p::DOUBLE) AS DECIMAL(28,12))) AS s,
             max(n) AS n
      FROM g GROUP BY 1
    ),
    pw AS (
      SELECT n,
             round((c::DOUBLE * c::DOUBLE + s::DOUBLE * s::DOUBLE)
                   / (n::DOUBLE * n::DOUBLE), 9) AS pwr
      FROM per
    ),
    tot AS (
      SELECT max(n) AS nb, count(*) AS np,
             sum(CAST(pwr AS DECIMAL(28,9))) AS tt
      FROM pw
    ),
    terms AS (
      SELECT nb, np,
             CASE WHEN pwr / nullif(tt::DOUBLE, 0) > 0
                  THEN round(pwr / nullif(tt::DOUBLE, 0)
                       * CAST(CAST(ln(pwr / nullif(tt::DOUBLE, 0))
                              AS DECIMAL(28,12)) AS DOUBLE), 12)
             END AS term
      FROM pw CROSS JOIN tot
    ),
    ent AS (
      SELECT max(nb) AS nb, max(np) AS np,
             sum(CAST(term AS DECIMAL(28,12))) AS h
      FROM terms
    )
    SELECT nb::BIGINT AS n_buckets, np::BIGINT AS n_periods,
           round(CASE WHEN h IS NOT NULL
                      THEN -(h::DOUBLE)
                           / CAST(CAST(ln(np::DOUBLE)
                                  AS DECIMAL(28,12)) AS DOUBLE)
                 END, 9) AS spectral_entropy
    FROM ent
    """,
)
def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized spectral entropy of hourly event-value means over the
    period-2..48 grid (operators.timeseries.spectral_entropy) — the
    one-number forecastability readout beside ts_dominant_period's
    argmax; same bucket-axis trig grid and decimal(28,12) quantization,
    shares from exact decimal sums, each ln decimal-cut."""
    from ..operators.timeseries import spectral_entropy

    return spectral_entropy(_t(spark, sf_dir, "events"))


@_q(
    "ts_bollinger_daily",
    f"""
    WITH b AS ({_BUCKET_DAY}),
    wnd AS (
      SELECT bk, m,
             count(*) OVER w AS c,
             sum(m) OVER w AS sm,
             sum(m * m) OVER w AS sq
      FROM b
      WINDOW w AS (ORDER BY bk
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ),
    calc AS (
      SELECT bk, m::DOUBLE AS md,
             CASE WHEN c = 7 THEN sm::DOUBLE / 7.0 END AS mid,
             CASE WHEN c = 7 THEN greatest(
               sq::DOUBLE / 7.0 - (sm::DOUBLE / 7.0)
                 * (sm::DOUBLE / 7.0), 0.0) END AS var
      FROM wnd
    ),
    st AS (
      SELECT bk, md, mid,
             CAST(CAST(sqrt(var) AS DECIMAL(28,12)) AS DOUBLE) AS std
      FROM calc
    )
    SELECT bk AS bucket, round(md, 9) AS value, round(mid, 9) AS mid,
           round(mid + 2.0 * std, 9) AS band_hi,
           round(mid - 2.0 * std, 9) AS band_lo,
           CASE WHEN mid IS NOT NULL
                THEN md > mid + 2.0 * std END AS breach_hi,
           CASE WHEN mid IS NOT NULL
                THEN md < mid - 2.0 * std END AS breach_lo
    FROM st
    """,
)
def ts_bollinger_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger volatility envelope (trailing 7-day mean +/- 2 sigma)
    over daily event-value means with breach flags
    (operators.timeseries.bollinger_bands) — exact decimal window
    moments on the day axis, sqrt through the decimal(28,12) cut, NULL
    bands until a full window exists."""
    from ..operators.timeseries import bollinger_bands

    return bollinger_bands(_t(spark, sf_dir, "events"))


@_q(
    "ts_seasonal_mann_kendall",
    f"""
    WITH b AS ({_BUCKET_DAY}),
    wb AS (SELECT bk, m, dayofweek(bk) AS w FROM b),
    pairs AS (
      SELECT sign(c.m::DOUBLE - a.m::DOUBLE) AS sg
      FROM wb a JOIN wb c ON a.w = c.w AND a.bk < c.bk
    ),
    s_agg AS (
      SELECT coalesce(sum(CAST(sg AS BIGINT)), 0) AS s FROM pairs
    ),
    pertie AS (
      SELECT w, m, count(*) AS t FROM wb GROUP BY 1, 2
    ),
    perw AS (
      SELECT w, sum(t) AS nw,
             sum(t * (t - 1) * (2 * t + 5)) AS tie
      FROM pertie GROUP BY 1
    ),
    ties AS (
      SELECT sum(nw) AS n_buckets,
             sum(nw * (nw - 1) * (2 * nw + 5) - tie) AS vnum
      FROM perw
    ),
    j AS (SELECT * FROM s_agg CROSS JOIN ties)
    SELECT n_buckets::BIGINT AS n_buckets, s::BIGINT AS s,
           round(vnum::DOUBLE / 18.0, 9) AS var_s,
           round(CASE WHEN vnum::DOUBLE / 18.0 > 0
                      THEN (s::DOUBLE - sign(s::DOUBLE))
                           / sqrt(vnum::DOUBLE / 18.0) END, 9) AS z,
           CASE WHEN (CASE WHEN vnum::DOUBLE / 18.0 > 0
                           THEN (s::DOUBLE - sign(s::DOUBLE))
                                / sqrt(vnum::DOUBLE / 18.0) END)
                     > 1.959963984540054 THEN 'increasing'
                WHEN (CASE WHEN vnum::DOUBLE / 18.0 > 0
                           THEN (s::DOUBLE - sign(s::DOUBLE))
                                / sqrt(vnum::DOUBLE / 18.0) END)
                     < -1.959963984540054 THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM j
    """,
)
def ts_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal (weekday-stratified) Mann-Kendall trend test on daily
    event-value means (operators.timeseries.seasonal_mann_kendall) —
    sign pairs only within each weekday subseries so the day-of-week
    profile can't masquerade as drift; exact integer S and tie
    polynomials, continuity-corrected z."""
    from ..operators.timeseries import seasonal_mann_kendall

    return seasonal_mann_kendall(_t(spark, sf_dir, "events"))


@_q(
    "chow_break_daily",
    f"""
    WITH b AS ({_BUCKET_DAY}),
    idx AS (
      SELECT bk, m, row_number() OVER (ORDER BY bk) AS i,
             count(*) OVER () AS n
      FROM b
    ),
    st AS (
      SELECT *, CAST(floor(n * 0.5) AS INT) AS k FROM idx
    ),
    agg AS (
      SELECT max(n) AS nn,
             max(CASE WHEN i = k THEN bk END) AS bkk,
             count(i) AS np, sum(i) AS sxp, sum(i * i) AS sxxp,
             sum(m) AS syp, sum(m * m) AS syyp,
             sum(CAST(i AS DECIMAL(18,0)) * m) AS sxyp,
             count(i) FILTER (WHERE i <= k) AS n1,
             sum(i) FILTER (WHERE i <= k) AS sx1,
             sum(i * i) FILTER (WHERE i <= k) AS sxx1,
             sum(m) FILTER (WHERE i <= k) AS sy1,
             sum(m * m) FILTER (WHERE i <= k) AS syy1,
             sum(CAST(i AS DECIMAL(18,0)) * m)
               FILTER (WHERE i <= k) AS sxy1,
             count(i) FILTER (WHERE i > k) AS n2,
             sum(i) FILTER (WHERE i > k) AS sx2,
             sum(i * i) FILTER (WHERE i > k) AS sxx2,
             sum(m) FILTER (WHERE i > k) AS sy2,
             sum(m * m) FILTER (WHERE i > k) AS syy2,
             sum(CAST(i AS DECIMAL(18,0)) * m)
               FILTER (WHERE i > k) AS sxy2
      FROM st
    ),
    ssr AS (
      SELECT nn, bkk,
             CASE WHEN np >= 3 THEN
               (syyp::DOUBLE - syp::DOUBLE * syp::DOUBLE / np::DOUBLE)
               - (sxyp::DOUBLE - sxp::DOUBLE * syp::DOUBLE / np::DOUBLE)
                 * (sxyp::DOUBLE - sxp::DOUBLE * syp::DOUBLE
                    / np::DOUBLE)
                 / nullif(sxxp::DOUBLE - sxp::DOUBLE * sxp::DOUBLE
                          / np::DOUBLE, 0) END AS sp,
             CASE WHEN n1 >= 3 THEN
               (syy1::DOUBLE - sy1::DOUBLE * sy1::DOUBLE / n1::DOUBLE)
               - (sxy1::DOUBLE - sx1::DOUBLE * sy1::DOUBLE / n1::DOUBLE)
                 * (sxy1::DOUBLE - sx1::DOUBLE * sy1::DOUBLE
                    / n1::DOUBLE)
                 / nullif(sxx1::DOUBLE - sx1::DOUBLE * sx1::DOUBLE
                          / n1::DOUBLE, 0) END AS s1,
             CASE WHEN n2 >= 3 THEN
               (syy2::DOUBLE - sy2::DOUBLE * sy2::DOUBLE / n2::DOUBLE)
               - (sxy2::DOUBLE - sx2::DOUBLE * sy2::DOUBLE / n2::DOUBLE)
                 * (sxy2::DOUBLE - sx2::DOUBLE * sy2::DOUBLE
                    / n2::DOUBLE)
                 / nullif(sxx2::DOUBLE - sx2::DOUBLE * sx2::DOUBLE
                          / n2::DOUBLE, 0) END AS s2
      FROM agg
    )
    SELECT nn::BIGINT AS n_buckets, bkk AS break_bucket,
           round(sp, 9) AS ssr_pooled, round(s1 + s2, 9) AS ssr_split,
           round(CASE WHEN nn > 4
                      THEN ((sp - s1 - s2) / 2.0)
                           / nullif((s1 + s2) / (nn::DOUBLE - 4.0), 0)
                 END, 9) AS f_stat
    FROM ssr
    """,
)
def chow_break_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow structural-break F-test of the daily event-value trend line
    at the series midpoint (operators.timeseries.chow_test) — did the
    trend ITSELF change, beside pettitt's level-shift view; closed-form
    OLS SSRs from exact decimal moments on the day axis."""
    from ..operators.timeseries import chow_test

    return chow_test(_t(spark, sf_dir, "events"))


#: Shared doc-feature projection (mirrors the mahalanobis/vif trio).
_DOC_FEATS = """
      SELECT doc_id::BIGINT AS doc_id, n_chars::BIGINT AS n_chars,
             len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT
               AS n_tokens,
             len(regexp_extract_all(text, '[.,!?;:]'))::BIGINT AS n_punct
      FROM documents
      WHERE n_chars IS NOT NULL AND text IS NOT NULL
"""


@_q(
    "ols_tokens_2f",
    f"""
    WITH feats AS ({_DOC_FEATS}),
    base AS (
      SELECT n_chars AS a, n_punct AS b, n_tokens AS y FROM feats
    ),
    agg AS (
      SELECT count(*)::HUGEINT AS n,
             sum(a::HUGEINT) AS s1, sum(b::HUGEINT) AS s2,
             sum(y::HUGEINT) AS sy,
             sum(a::HUGEINT * a::HUGEINT) AS s11,
             sum(b::HUGEINT * b::HUGEINT) AS s22,
             sum(a::HUGEINT * b::HUGEINT) AS s12,
             sum(a::HUGEINT * y::HUGEINT) AS s1y,
             sum(b::HUGEINT * y::HUGEINT) AS s2y,
             sum(y::HUGEINT * y::HUGEINT) AS syy
      FROM base
    ),
    cen AS (
      SELECT n,
             (n * s11 - s1 * s1)::DOUBLE AS c11,
             (n * s22 - s2 * s2)::DOUBLE AS c22,
             (n * s12 - s1 * s2)::DOUBLE AS c12,
             (n * s1y - s1 * sy)::DOUBLE AS c1y,
             (n * s2y - s2 * sy)::DOUBLE AS c2y,
             (n * syy - sy * sy)::DOUBLE AS cyy,
             s1::DOUBLE AS s1d, s2::DOUBLE AS s2d, sy::DOUBLE AS syd
      FROM agg
    ),
    sol AS (
      SELECT n, s1d, s2d, syd, cyy, c1y, c2y,
             (c22 * c1y - c12 * c2y)
               / nullif(c11 * c22 - c12 * c12, 0) AS b1,
             (c11 * c2y - c12 * c1y)
               / nullif(c11 * c22 - c12 * c12, 0) AS b2
      FROM cen
    ),
    fin AS (
      SELECT n, b1, b2,
             syd / n::DOUBLE - b1 * s1d / n::DOUBLE
               - b2 * s2d / n::DOUBLE AS intercept,
             (b1 * c1y + b2 * c2y) / nullif(cyy, 0) AS r2
      FROM sol
    )
    SELECT n::BIGINT AS n, round(b1, 9) AS b1, round(b2, 9) AS b2,
           round(intercept, 9) AS intercept, round(r2, 9) AS r2,
           round(CASE WHEN n > 3 THEN (r2 / 2.0)
                 / nullif((1.0 - r2) / (n::DOUBLE - 3.0), 0) END, 9)
             AS f_stat
    FROM fin
    """,
)
def ols_tokens_2f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-regressor OLS n_tokens ~ n_chars + n_punct with model F-test
    (operators.profile.ols_two_features) — does punctuation explain
    token count beyond raw length; closed-form 2x2 normal equations on
    exact decimal(38,0) centered moments, one scan."""
    from ..operators.profile import ols_two_features
    from ..operators.textstats import tokens

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("text").isNotNull()
    ).select(
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[.,!?;:]"), 0)
        ).cast("long").alias("n_punct"),
        F.size(tokens("text")).cast("long").alias("n_tokens"),
    )
    return ols_two_features(docs, "n_chars", "n_punct", "n_tokens")


@_q(
    "breusch_pagan_tokens",
    f"""
    WITH feats AS ({_DOC_FEATS}),
    base AS (SELECT n_chars AS x, n_tokens AS y FROM feats),
    mom AS (
      SELECT count(*)::HUGEINT AS n,
             sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
             sum(x::HUGEINT * x::HUGEINT) AS sxx,
             sum(x::HUGEINT * y::HUGEINT) AS sxy
      FROM base
    ),
    fit AS (
      SELECT n,
             (n * sxy - sx * sy)::DOUBLE
               / nullif((n * sxx - sx * sx)::DOUBLE, 0) AS b,
             sy::DOUBLE / n::DOUBLE
               - (n * sxy - sx * sy)::DOUBLE
                 / nullif((n * sxx - sx * sx)::DOUBLE, 0)
                 * sx::DOUBLE / n::DOUBLE AS a
      FROM mom
    ),
    scored AS (
      SELECT base.x, fit.n, fit.b,
             round((base.y::DOUBLE - fit.a - fit.b * base.x::DOUBLE)
                   * (base.y::DOUBLE - fit.a - fit.b * base.x::DOUBLE),
                   9) AS z
      FROM base CROSS JOIN fit
    ),
    aux AS (
      SELECT max(n) AS n, max(b) AS slope,
             sum(CAST(z AS DECIMAL(38,9))) AS sz,
             sum(CAST(round(z * z, 9) AS DECIMAL(38,9))) AS szz,
             sum(CAST(round(z * x::DOUBLE, 9) AS DECIMAL(38,9))) AS szx,
             sum(x::HUGEINT) AS sx,
             sum(x::HUGEINT * x::HUGEINT) AS sxx
      FROM scored
    ),
    lmt AS (
      SELECT n, slope,
             n::DOUBLE
             * ((n::DOUBLE * szx::DOUBLE - sz::DOUBLE * sx::DOUBLE)
                * (n::DOUBLE * szx::DOUBLE - sz::DOUBLE * sx::DOUBLE))
             / nullif((n::DOUBLE * szz::DOUBLE - sz::DOUBLE * sz::DOUBLE)
                      * (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE
                         * sx::DOUBLE), 0) AS lm
      FROM aux
    ),
    pv AS (
      SELECT n, slope, lm, sqrt(lm) AS uu FROM lmt
    ),
    w1 AS (SELECT n, slope, lm, uu, {_AS_POLY} FROM pv),
    e1 AS (SELECT n, slope, lm, {_AS_E} FROM w1)
    SELECT n::BIGINT AS n, round(slope, 9) AS slope,
           round(lm, 9) AS lm, round(e, 9) AS p_approx,
           coalesce(e < 0.05, false) AS heteroscedastic
    FROM e1
    """,
)
def breusch_pagan_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch-Pagan heteroscedasticity test on the n_tokens ~ n_chars
    regression (operators.profile.breusch_pagan) — is token-count noise
    itself length-dependent (it is, for mixed-script corpora), the
    assumption behind ols_tokens_chars' standard errors.  Two scans:
    exact-moment fit broadcast back, 9-dp decimal residual moments,
    LM = n*R2_aux with the shared A-S erfc p."""
    from ..operators.profile import breusch_pagan
    from ..operators.textstats import tokens

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("text").isNotNull()
    ).select(
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(tokens("text")).cast("long").alias("n_tokens"),
    )
    return breusch_pagan(docs, "n_chars", "n_tokens")


#: Shared full (i, j, c) covariance-matrix oracle CTE chain over the
#: embeddings table (mirrors operators.similarity._scaled_cov_matrix).
_COV_MATRIX = """
    comps AS (
      SELECT vec_id, unnest(range(0, len(embedding))) AS i,
             round(unnest(embedding)::DOUBLE * 1000000.0, 0)::BIGINT AS s
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    cpairs AS (
      SELECT a.i AS ia, b2.i AS ib, a.s AS sa, b2.s AS sb
      FROM comps a JOIN comps b2
        ON a.vec_id = b2.vec_id AND a.i <= b2.i
    ),
    cagg AS (
      SELECT ia, ib, count(*)::HUGEINT AS n,
             sum(sa::HUGEINT) AS sx, sum(sb::HUGEINT) AS sy,
             sum(sa::HUGEINT * sb::HUGEINT) AS sxy
      FROM cpairs GROUP BY 1, 2
    ),
    upper_m AS (
      SELECT ia AS i, ib AS j,
             (n * sxy - sx * sy)::DOUBLE
               / (n::DOUBLE * n::DOUBLE * 1000000.0 * 1000000.0) AS c
      FROM cagg
    ),
    mat AS (
      SELECT i, j, c FROM upper_m
      UNION ALL
      SELECT j AS i, i AS j, c FROM upper_m WHERE i <> j
    )
"""


@_q(
    "emb_participation_ratio",
    f"""
    WITH {_COV_MATRIX},
    agg AS (
      SELECT count(DISTINCT i) AS d,
             sum(CASE WHEN i = j
                      THEN CAST(round(c, 12) AS DECIMAL(28,12)) END)
               AS tr,
             sum(CAST(round(c * c, 12) AS DECIMAL(28,12))) AS fr
      FROM mat
    )
    SELECT d::BIGINT AS n_dims, round(tr::DOUBLE, 9) AS trace,
           round(fr::DOUBLE, 9) AS frob2,
           round(tr::DOUBLE * tr::DOUBLE / nullif(fr::DOUBLE, 0), 9)
             AS participation_ratio,
           round(tr::DOUBLE * tr::DOUBLE / nullif(fr::DOUBLE, 0)
                 / d::DOUBLE, 9) AS effective_dim_share
    FROM agg
    """,
)
def emb_participation_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Participation ratio (effective rank) of the embedding covariance
    (operators.similarity.participation_ratio): trace(C)^2/||C||_F^2 —
    eigen-free effective dimensionality from the shared row-local
    covariance build; d^2-axis sums with 12-dp decimal quantization."""
    from ..operators.similarity import participation_ratio

    return participation_ratio(_t(spark, sf_dir, "embeddings"))


@_q(
    "emb_dim_moments",
    """
    WITH comps AS (
      SELECT unnest(range(0, len(embedding))) AS i,
             round(unnest(embedding)::DOUBLE * 1000000.0, 0)::HUGEINT
               AS s
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    agg AS (
      SELECT i, count(*)::HUGEINT AS n, sum(s) AS m1,
             sum(s * s) AS m2, sum(s * s * s) AS m3,
             sum((s * s) * (s * s)) AS m4
      FROM comps GROUP BY 1
    ),
    mom AS (
      SELECT i, n,
             m1::DOUBLE / n::DOUBLE AS m,
             m2::DOUBLE / n::DOUBLE AS r2,
             m3::DOUBLE / n::DOUBLE AS r3,
             m4::DOUBLE / n::DOUBLE AS r4
      FROM agg
    ),
    cm AS (
      SELECT i, n, m,
             r2 - m * m AS mu2,
             r3 - 3.0 * m * r2 + 2.0 * m * m * m AS mu3,
             r4 - 4.0 * m * r3 + 6.0 * m * m * r2
               - 3.0 * m * m * m * m AS mu4
      FROM mom
    ),
    fin AS (
      SELECT i::INT AS dim, n::BIGINT AS n,
             round(m / 1000000.0, 9) AS mean,
             round(mu3 / nullif(sqrt(mu2) * mu2, 0), 9) AS skewness,
             round(mu4 / nullif(mu2 * mu2, 0) - 3.0, 9) AS kurtosis
      FROM cm
    )
    SELECT dim, n, mean, skewness, kurtosis
    FROM (
      SELECT *, row_number() OVER (ORDER BY abs(kurtosis) DESC, dim)
               AS rk
      FROM fin
    ) WHERE rk <= 5
    """,
)
def emb_dim_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 embedding dimensions by |excess kurtosis| with skewness
    (operators.similarity.dim_moments) — the distribution-shape audit
    beside emb_dim_stats' mean/variance view; exact decimal(38,0) power
    sums (cast before multiply), d-axis ranking."""
    from ..operators.similarity import dim_moments

    return dim_moments(_t(spark, sf_dir, "embeddings"))


@_q(
    "emb_centroid_similarity",
    """
    WITH comps AS (
      SELECT label::INT AS l, unnest(range(0, len(embedding))) AS i,
             round(unnest(embedding)::DOUBLE * 1000000.0, 0)::BIGINT
               AS s
      FROM embeddings
      WHERE embedding IS NOT NULL AND label IS NOT NULL
    ),
    cent AS (
      SELECT l, i,
             round(sum(s::HUGEINT)::DOUBLE
                   / (count(*)::DOUBLE * 1000000.0), 9) AS c
      FROM comps GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.l AS label_a, b2.l AS label_b,
             a.c AS ca, b2.c AS cb
      FROM cent a JOIN cent b2 ON a.i = b2.i AND a.l < b2.l
    ),
    agg AS (
      SELECT label_a, label_b,
             sum(CAST(round(ca * cb, 12) AS DECIMAL(28,12))) AS dt,
             sum(CAST(round(ca * ca, 12) AS DECIMAL(28,12))) AS na,
             sum(CAST(round(cb * cb, 12) AS DECIMAL(28,12))) AS nb
      FROM pairs GROUP BY 1, 2
    )
    SELECT label_a, label_b,
           round(dt::DOUBLE / nullif(sqrt(na::DOUBLE)
                 * sqrt(nb::DOUBLE), 0), 9) AS cosine
    FROM agg
    """,
)
def emb_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between per-label embedding centroids
    (operators.similarity.label_centroid_similarity) — which classes
    the space actually separates, beside emb_label_cosine_contrast's
    within/cross view; exact integer component sums, all pair work on
    the labels x dims axis."""
    from ..operators.similarity import label_centroid_similarity

    return label_centroid_similarity(_t(spark, sf_dir, "embeddings"))


@_q(
    "emb_norm_outliers",
    """
    WITH comps AS (
      SELECT vec_id,
             round(unnest(embedding)::DOUBLE * 1000000.0, 0)::BIGINT
               AS s
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    n2 AS (
      SELECT vec_id, sum(s * s)::BIGINT AS n2
      FROM comps GROUP BY 1
    ),
    mom AS (
      SELECT count(*)::HUGEINT AS n, sum(n2::HUGEINT) AS s,
             sum(n2::HUGEINT * n2::HUGEINT) AS q
      FROM n2
    ),
    scored AS (
      SELECT vec_id,
             round(sqrt(n2::DOUBLE) / 1000000.0, 9) AS norm,
             round((n2::DOUBLE - s::DOUBLE / n::DOUBLE)
                   / nullif(sqrt(q::DOUBLE / n::DOUBLE
                     - (s::DOUBLE / n::DOUBLE)
                       * (s::DOUBLE / n::DOUBLE)), 0), 9) AS z
      FROM n2 CROSS JOIN mom
    )
    SELECT vec_id, norm, z
    FROM (
      SELECT *, row_number() OVER (ORDER BY abs(z) DESC, vec_id) AS rk
      FROM scored
    ) WHERE rk <= 10
    """,
)
def emb_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 embedding vectors by |z| of the squared L2 norm
    (operators.similarity.norm_outliers) — catches failed encodes
    (near-zero vectors cosine silently renormalizes) and fp blow-ups;
    row-local integer norm fold, one broadcast moment row, top-k scan."""
    from ..operators.similarity import norm_outliers

    return norm_outliers(_t(spark, sf_dir, "embeddings"))


@_q(
    "emb_int8_snr",
    """
    WITH vecs AS (
      SELECT embedding,
             list_min(embedding)::DOUBLE AS mn,
             list_max(embedding)::DOUBLE AS mx
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    comps AS (
      SELECT unnest(embedding)::DOUBLE AS x, mn, mx FROM vecs
    ),
    dq AS (
      SELECT x,
             x - (mn + (CASE WHEN mx = mn THEN 0.0
                         ELSE floor((x - mn) * 254.0 / (mx - mn) + 0.5)
                              - 127.0 END + 127.0)
                  * ((mx - mn) / 254.0)) AS e
      FROM comps
    ),
    agg AS (
      SELECT count(*)::HUGEINT AS n,
             sum(CAST(round(x, 12) AS DECIMAL(28,12))) AS sx,
             sum(CAST(round(x * x, 12) AS DECIMAL(28,12))) AS sxx,
             sum(CAST(round(e * e, 12) AS DECIMAL(28,12))) AS see
      FROM dq
    ),
    fin AS (
      SELECT n,
             sxx::DOUBLE / n::DOUBLE
               - (sx::DOUBLE / n::DOUBLE) * (sx::DOUBLE / n::DOUBLE)
               AS var,
             see::DOUBLE / n::DOUBLE AS mse
      FROM agg
    )
    SELECT n::BIGINT AS n_components, round(var, 9) AS variance,
           round(mse, 9) AS mse,
           round(var / nullif(mse, 0), 9) AS snr,
           round(10.0 * CAST(CAST(log10(var / nullif(mse, 0))
                 AS DECIMAL(28,12)) AS DOUBLE), 9) AS snr_db
    FROM fin
    """,
)
def emb_int8_snr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signal-to-noise ratio of int8 scalar quantization over the
    embedding store (operators.similarity.int8_quantization_snr) —
    Var(x)/MSE(x - dequant(quant(x))) with the quantize_embeddings grid
    emulated row-locally; 12-dp decimal component sums, log10 through
    the decimal cut."""
    from ..operators.similarity import int8_quantization_snr

    return int8_quantization_snr(_t(spark, sf_dir, "embeddings"))


@_q(
    "vocab_hapax_share",
    """
    WITH toks AS (
      SELECT source,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM documents
      WHERE text IS NOT NULL AND source IS NOT NULL
    ),
    cnt AS (SELECT source, t, count(*) AS n FROM toks GROUP BY 1, 2),
    agg AS (
      SELECT source, count(*) AS vocab,
             sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS hapax
      FROM cnt GROUP BY 1
    )
    SELECT source, vocab::BIGINT AS vocab, hapax::BIGINT AS hapax,
           round(hapax::DOUBLE / nullif(vocab::DOUBLE, 0), 9)
             AS hapax_share
    FROM agg
    """,
)
def vocab_hapax_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena share per source
    (operators.textstats.hapax_share) — the one-number vocabulary-health
    contrast: template sources collapse toward 0, OCR/mojibake explode
    toward 1.  One (source, token) count groupBy + bounded reduce."""
    from ..operators.textstats import hapax_share

    return hapax_share(_t(spark, sf_dir, "documents"))


@_q(
    "text_case_profile",
    """
    WITH words AS (
      SELECT lang, regexp_extract_all(text, '[A-Za-z]+') AS ws
      FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
    ),
    base AS (
      SELECT lang, len(ws) AS n,
             len(list_filter(ws,
                 w -> regexp_matches(w, '^[A-Z][a-z]+$'))) AS cap,
             len(list_filter(ws,
                 w -> regexp_matches(w, '^[A-Z]{2,}$'))) AS al,
             len(list_filter(ws,
                 w -> regexp_matches(w, '^[a-z]+$'))) AS lo
      FROM words
    ),
    agg AS (
      SELECT lang, sum(n) AS wt, sum(cap) AS c, sum(al) AS a,
             sum(lo) AS l
      FROM base GROUP BY 1
    )
    SELECT lang, wt::BIGINT AS word_tokens,
           round(c::DOUBLE / nullif(wt::DOUBLE, 0), 9) AS cap_share,
           round(a::DOUBLE / nullif(wt::DOUBLE, 0), 9)
             AS allcaps_share,
           round(l::DOUBLE / nullif(wt::DOUBLE, 0), 9) AS lower_share,
           round((wt - c - a - l)::DOUBLE / nullif(wt::DOUBLE, 0), 9)
             AS mixed_share
    FROM agg
    """,
)
def text_case_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casing composition of case-preserved word tokens per language
    (operators.textstats.case_profile) — lowercase-normalized scrapes,
    title-case boilerplate and ALL-CAPS noise each leave a distinct
    signature; row-local class counts, one partial-aggregable
    groupBy."""
    from ..operators.textstats import case_profile

    return case_profile(_t(spark, sf_dir, "documents"))


@_q(
    "text_digit_deciles",
    """
    WITH base AS (
      SELECT doc_id,
             (len(text) - len(regexp_replace(text, '[0-9]', '', 'g')))
               ::DOUBLE / len(text)::DOUBLE AS d
      FROM documents
      WHERE text IS NOT NULL AND len(text) > 0
        AND doc_id IS NOT NULL
    ),
    r AS (
      SELECT d, ntile(10) OVER (ORDER BY d, doc_id) AS decile
      FROM base
    )
    SELECT decile::INT AS decile, count(*)::BIGINT AS n_docs,
           round(CAST(sum(CAST(round(d, 9) AS DECIMAL(28,9)))
                 AS DOUBLE) / count(*)::DOUBLE, 9) AS mean_density,
           round(max(round(d, 9)), 9) AS max_density
    FROM r GROUP BY 1
    """,
)
def text_digit_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digit-character density in corpus deciles
    (operators.textstats.digit_density_deciles) — how much of the
    corpus is tables/IDs/logs; exact integer char counts, deterministic
    (density, id) ntile, 9-dp decimal mean sums."""
    from ..operators.textstats import digit_density_deciles

    return digit_density_deciles(_t(spark, sf_dir, "documents"))


@_q(
    "lang_script_mismatch",
    """
    WITH base AS (
      SELECT lang,
             lang IN ('en', 'de', 'fr', 'es') AS exp_lat,
             (2 * (len(text)
                   - len(regexp_replace(text, '[a-zA-Z]', '', 'g'))))
               >= len(regexp_replace(text, '[ \t\n\r]', '', 'g'))
               AS latin_dom
      FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
    )
    SELECT lang, count(*)::BIGINT AS n_docs,
           max(exp_lat) AS latin_expected,
           sum(CASE WHEN latin_dom <> exp_lat THEN 1 ELSE 0 END)::BIGINT
             AS mismatch_docs,
           round(sum(CASE WHEN latin_dom <> exp_lat THEN 1 ELSE 0 END)
                 ::DOUBLE / count(*)::DOUBLE, 9) AS mismatch_rate
    FROM base GROUP BY 1
    """,
)
def lang_script_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-label vs script-dominance agreement per lang
    (operators.textstats.lang_script_mismatch) — a 'zh' doc with
    latin-dominant characters is mislabeled or transliterated; exact
    integer dominance test (2*latin >= non-space), one reduce."""
    from ..operators.textstats import lang_script_mismatch

    return lang_script_mismatch(_t(spark, sf_dir, "documents"))


@_q(
    "doclen_lognormal_ks",
    """
    WITH counts AS (
      SELECT n_chars::BIGINT AS v, count(*) AS n
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
      GROUP BY 1
    ),
    staged AS (
      SELECT v, CAST(n AS DECIMAL(10,0)) AS n,
             CAST(round(ln(v::DOUBLE), 12) AS DECIMAL(18,12)) AS lv
      FROM counts
    ),
    mom AS (
      SELECT sum(n) AS tot,
             sum(lv * n) AS s,
             sum(CAST(round(lv::DOUBLE * lv::DOUBLE, 12)
                 AS DECIMAL(18,12)) * n) AS q
      FROM staged
    ),
    ms AS (
      SELECT tot,
             s::DOUBLE / tot::DOUBLE AS mu,
             CAST(CAST(sqrt(greatest(q::DOUBLE / tot::DOUBLE
                   - (s::DOUBLE / tot::DOUBLE)
                     * (s::DOUBLE / tot::DOUBLE), 0.0))
                  AS DECIMAL(28,12)) AS DOUBLE) AS sg
      FROM mom
    ),
    scored AS (
      SELECT st.v, st.n, st.lv, ms.mu, ms.sg, ms.tot,
             sum(st.n) OVER (ORDER BY st.v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             (st.lv::DOUBLE - ms.mu) / nullif(ms.sg, 0) AS z
      FROM staged st CROSS JOIN ms
    ),
    gaps AS (
      SELECT tot, mu, sg,
             CASE WHEN z >= 0 THEN 1.0 - e / 2 ELSE e / 2 END AS phi,
             cum::DOUBLE / tot::DOUBLE AS ec,
             (cum - n)::DOUBLE / tot::DOUBLE AS eb
      FROM (
        SELECT *,
               (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))))
                 * (0.254829592
                    + (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))))
                    * (-0.284496736
                       + (1.0 / (1.0 + 0.3275911
                                 * (abs(z) / sqrt(2.0))))
                       * (1.421413741
                          + (1.0 / (1.0 + 0.3275911
                                    * (abs(z) / sqrt(2.0))))
                          * (-1.453152027
                             + (1.0 / (1.0 + 0.3275911
                                       * (abs(z) / sqrt(2.0))))
                             * 1.061405429))))
                 * exp(-(abs(z) / sqrt(2.0)) * (abs(z) / sqrt(2.0)))
                 AS e
        FROM scored
      )
    ),
    fin AS (
      SELECT max(tot) AS n, max(mu) AS mu, max(sg) AS sg,
             max(round(greatest(abs(ec - phi), abs(phi - eb)), 9))
               AS ks_d
      FROM gaps
    )
    SELECT n::BIGINT AS n, round(mu, 9) AS mu, round(sg, 9) AS sigma,
           ks_d,
           coalesce(ks_d <= 1.36 / sqrt(n::DOUBLE), false)
             AS lognormal_fit
    FROM fin
    """,
)
def doclen_lognormal_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moment-fit lognormal + one-sample KS on document lengths
    (operators.textstats.doclen_lognormal_ks) — is the length
    distribution organic or truncated/chunked; decimal-cut lns over the
    distinct-length axis, A-S polynomial Phi, exact ECDF gaps."""
    from ..operators.textstats import doclen_lognormal_ks

    return doclen_lognormal_ks(_t(spark, sf_dir, "documents"))


def _token_yield_oracle() -> str:
    quality = ORACLES["text_quality_scores"]
    return f"""
    WITH q AS ({quality}),
    r AS (
      SELECT n_tokens,
             ntile(10) OVER (ORDER BY quality_score DESC, doc_id)
               AS decile
      FROM q
    ),
    per AS (
      SELECT decile, count(*) AS n_docs, sum(n_tokens) AS tokens
      FROM r GROUP BY 1
    )
    SELECT decile::INT AS decile, n_docs::BIGINT AS n_docs,
           tokens::BIGINT AS tokens,
           (sum(tokens) OVER w)::BIGINT AS cum_tokens,
           round((sum(tokens) OVER w)::DOUBLE
                 / (sum(tokens) OVER ())::DOUBLE, 9)
             AS cum_token_share
    FROM per
    WINDOW w AS (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """


@_q("token_yield_by_quality", _token_yield_oracle())
def token_yield_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative token yield by quality decile (decile 1 = best)
    (operators.textstats.token_yield_by_quality) — the share-of-corpus
    to training-tokens exchange rate every quality-cut decision needs;
    deterministic (quality DESC, id) ntile, exact integer token sums."""
    from ..operators.textstats import token_yield_by_quality

    return token_yield_by_quality(_t(spark, sf_dir, "documents"))


def _cluster_purity_oracle() -> str:
    cc = ORACLES["dedup_cc_clusters"]
    return f"""
    WITH cl AS ({cc}),
    j AS (
      SELECT cl.component_id AS c, d.lang
      FROM cl JOIN documents d ON d.doc_id = cl.id
    ),
    per AS (SELECT c, lang, count(*) AS n FROM j GROUP BY 1, 2),
    pc AS (
      SELECT c, sum(n) AS sz, max(n) AS maj, count(*) AS nlab
      FROM per GROUP BY 1
    )
    SELECT count(*)::BIGINT AS n_clusters, sum(sz)::BIGINT AS n_docs,
           round(sum(maj)::DOUBLE / nullif(sum(sz)::DOUBLE, 0), 9)
             AS purity,
           sum(CASE WHEN nlab > 1 THEN 1 ELSE 0 END)::BIGINT
             AS mixed_clusters,
           round(sum(CASE WHEN nlab > 1 THEN 1 ELSE 0 END)::DOUBLE
                 / nullif(count(*)::DOUBLE, 0), 9) AS mixed_share
    FROM pc
    """


@_q("dedup_cluster_purity", _cluster_purity_oracle())
def dedup_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language purity of the MinHash-LSH near-duplicate clusters
    (operators.dedup.cluster_label_purity over the dedup_cc_clusters
    pipeline) — clusters straddling language boundaries flag shingles
    too short or boilerplate-driven similarity; all post-cluster work on
    the clustered-docs axis."""
    from ..operators.dedup import (
        cluster_label_purity,
        connected_components,
        jaccard_verify_pairs,
        minhash_lsh_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(docs)
    clusters = connected_components(
        jaccard_verify_pairs(docs, cand, threshold=0.8)
    )
    labels = docs.select(F.col("doc_id").alias("id"), "lang")
    return cluster_label_purity(clusters, labels)


@_q(
    "split_feature_parity",
    """
    WITH fp AS (
      SELECT CASE WHEN ('0x' || substr(md5('split' || chr(31)
                     || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT
                     / 72057594037927936.0 < 0.8 THEN 'train'
                  WHEN ('0x' || substr(md5('split' || chr(31)
                     || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT
                     / 72057594037927936.0 < 0.9 THEN 'val'
                  ELSE 'test' END AS split,
             n_chars::HUGEINT AS v
      FROM documents WHERE n_chars IS NOT NULL
    ),
    per AS (
      SELECT split, count(*)::HUGEINT AS n, sum(v) AS s,
             sum(v * v) AS q
      FROM fp GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS tn, sum(s) AS ts, sum(q) AS tq FROM per),
    st AS (
      SELECT split, n, s, q, tn, ts, tq,
             s::DOUBLE / n::DOUBLE AS m,
             (q::DOUBLE - n::DOUBLE * (s::DOUBLE / n::DOUBLE)
               * (s::DOUBLE / n::DOUBLE)) / (n::DOUBLE - 1.0) AS var,
             (ts - s)::DOUBLE / (tn - n)::DOUBLE AS mr,
             ((tq - q)::DOUBLE - (tn - n)::DOUBLE
               * ((ts - s)::DOUBLE / (tn - n)::DOUBLE)
               * ((ts - s)::DOUBLE / (tn - n)::DOUBLE))
               / ((tn - n)::DOUBLE - 1.0) AS varr
      FROM per CROSS JOIN tot
    ),
    zc AS (
      SELECT split, n, m, var,
             (m - mr) / nullif(sqrt(var / n::DOUBLE
               + varr / (tn - n)::DOUBLE), 0) AS z
      FROM st
    )
    SELECT split, n::BIGINT AS n_docs, round(m, 9) AS mean,
           round(sqrt(var), 9) AS sd, round(z, 9) AS z_vs_rest,
           coalesce(abs(z) <= 1.959963984540054, false) AS balanced
    FROM zc
    """,
)
def split_feature_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-split n_chars distribution parity (Welch z vs the pooled
    rest) over the deterministic hash split
    (operators.curation.split_feature_parity) — the hygiene check that
    catches a validation set systematically longer than training; exact
    decimal moments, rest-moments by subtraction, one scan."""
    from ..operators.curation import split_feature_parity

    return split_feature_parity(_t(spark, sf_dir, "documents"))


@_q(
    "orders_cohort_ltv",
    """
    WITH first_o AS (
      SELECT o_custkey,
             date_trunc('month', min(o_orderdate))::TIMESTAMP AS cm
      FROM orders GROUP BY 1
    ),
    csize AS (
      SELECT cm, count(*) AS n_customers FROM first_o GROUP BY 1
    ),
    rev AS (
      SELECT f.cm,
             date_diff('month', f.cm,
                       date_trunc('month', o.o_orderdate)) AS off,
             sum(CAST(round(o.o_totalprice, 2) AS DECIMAL(28,2)))
               AS rv
      FROM orders o JOIN first_o f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2
    )
    SELECT r.cm AS cohort_month, r.off::INT AS month_offset,
           s.n_customers::BIGINT AS n_customers,
           r.rv::DOUBLE AS revenue,
           round((sum(r.rv) OVER (PARTITION BY r.cm ORDER BY r.off
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 ::DOUBLE / s.n_customers::DOUBLE, 6) AS cum_ltv
    FROM rev r JOIN csize s ON r.cm = s.cm
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: customers cohorted by first-order
    month, cumulative revenue per cohort member by month offset — the
    business-side retention triangle beside retention_weekly's activity
    view.  Two customer-keyed aggregates + one bounded cohort-axis
    window; revenue sums exact decimal(28,2)."""
    ords = _t(spark, sf_dir, "orders")
    first_o = ords.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cm")
    )
    csize = first_o.groupBy("cm").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    off = (
        (F.year(F.date_trunc("month", F.col("o_orderdate")))
         - F.year("cm")) * 12
        + (F.month(F.date_trunc("month", F.col("o_orderdate")))
           - F.month("cm"))
    )
    rev = (
        ords.join(first_o, "o_custkey")
        .groupBy("cm", off.alias("off"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice"), 2).cast("decimal(28,2)")
            ).alias("rv")
        )
    )
    w = (
        Window.partitionBy("cm")
        .orderBy("off")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rev.join(csize, "cm").select(
        F.col("cm").alias("cohort_month"),
        F.col("off").cast("int").alias("month_offset"),
        F.col("n_customers").cast("long").alias("n_customers"),
        # no round: the exact decimal(28,2) -> double conversion is
        # already engine-identical, and round-9 at ~5e6 magnitude is not
        F.col("rv").cast("double").alias("revenue"),
        # 6 dp, not 9: cum LTV is ~1e6 and round-9 would demand 16
        # significant digits — past double precision (memory trap #2)
        F.round(
            F.sum("rv").over(w).cast("double")
            / F.col("n_customers").cast("double"),
            6,
        ).alias("cum_ltv"),
    )


@_q(
    "order_to_ship_delay",
    """
    WITH d AS (
      SELECT o.o_orderpriority AS priority,
             date_diff('day', o.o_orderdate::DATE, l.l_shipdate::DATE)
               AS delay
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT priority, count(*)::BIGINT AS n,
           round(quantile_cont(delay, 0.5), 6) AS p50,
           round(quantile_cont(delay, 0.9), 6) AS p90,
           round(quantile_cont(delay, 0.99), 6) AS p99,
           max(delay)::BIGINT AS max_delay
    FROM d GROUP BY 1
    """,
)
def order_to_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency percentiles per order priority — the
    fulfillment-SLA readout (does URGENT actually ship faster); exact
    interpolated percentiles over integer day delays, one fact join +
    one priority-keyed aggregate."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    ords = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    d = li.join(
        ords, li["l_orderkey"] == ords["o_orderkey"]
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        ).alias("delay"),
    )
    return d.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.percentile("delay", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("delay", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("delay", F.lit(0.99)), 6).alias("p99"),
        F.max("delay").cast("long").alias("max_delay"),
    )


@_q(
    "part_affinity_lift",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    tot AS (SELECT count(DISTINCT l_orderkey) AS n FROM li),
    pc AS (SELECT l_partkey, count(*) AS np FROM li GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS nab
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey
       AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    sc AS (
      SELECT part_a, part_b, nab,
             round(nab::DOUBLE / tot.n::DOUBLE, 9) AS support,
             round(nab::DOUBLE / pa.np::DOUBLE, 9) AS confidence,
             round(nab::DOUBLE * tot.n::DOUBLE
                   / (pa.np::DOUBLE * pb.np::DOUBLE), 9) AS lift
      FROM pairs
      JOIN pc pa ON pa.l_partkey = pairs.part_a
      JOIN pc pb ON pb.l_partkey = pairs.part_b
      CROSS JOIN tot
    )
    SELECT part_a, part_b, nab::BIGINT AS n_orders, support,
           confidence, lift
    FROM (
      SELECT *, row_number() OVER (ORDER BY lift DESC, part_a, part_b)
               AS rk
      FROM sc
    ) WHERE rk <= 15
    """,
)
def part_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule metrics (support/confidence/lift) over the
    basket_part_pairs co-occurrence graph, top-15 by lift — WHICH part
    pairs co-sell beyond chance, not just often.  Pair expansion stays
    bounded by the largest order; part counts broadcast back; ranking on
    the qualifying-pairs axis."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    tot = li.agg(
        F.count_distinct("l_orderkey").alias("_n")
    )
    pc = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("_np"))
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("_nab"))
        .filter(F.col("_nab") >= 2)
    )
    sc = (
        pairs.join(
            F.broadcast(pc.select(F.col("l_partkey").alias("part_a"),
                                  F.col("_np").alias("_na"))),
            "part_a",
        )
        .join(
            F.broadcast(pc.select(F.col("l_partkey").alias("part_b"),
                                  F.col("_np").alias("_nb"))),
            "part_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            F.col("_nab").cast("long").alias("n_orders"),
            F.round(
                F.col("_nab").cast("double")
                / F.col("_n").cast("double"),
                9,
            ).alias("support"),
            F.round(
                F.col("_nab").cast("double")
                / F.col("_na").cast("double"),
                9,
            ).alias("confidence"),
            F.round(
                F.col("_nab").cast("double") * F.col("_n").cast("double")
                / (F.col("_na").cast("double")
                   * F.col("_nb").cast("double")),
                9,
            ).alias("lift"),
        )
    )
    ranked = sc.withColumn(
        "_rk",
        F.row_number().over(
            Window.orderBy(
                F.desc("lift"), F.asc("part_a"), F.asc("part_b")
            )
        ),
    )
    return ranked.filter(F.col("_rk") <= 15).drop("_rk")


@_q(
    "user_activity_gini",
    """
    WITH c AS (
      SELECT user_id AS g, count(*) AS x FROM events
      WHERE user_id IS NOT NULL GROUP BY 1
    ),
    r AS (SELECT x, row_number() OVER (ORDER BY x, g) AS i FROM c),
    a AS (
      SELECT count(*) AS n_groups, sum(x) AS total,
             sum(CAST(i AS DECIMAL(38,0)) * x) AS iw
      FROM r
    )
    SELECT CAST(n_groups AS BIGINT) AS n_groups,
           CAST(total AS BIGINT) AS total,
           round(2.0 * CAST(iw AS DOUBLE)
                 / (CAST(n_groups AS DOUBLE) * CAST(total AS DOUBLE))
                 - (CAST(n_groups AS DOUBLE) + 1.0)
                   / CAST(n_groups AS DOUBLE), 9) AS gini
    FROM a
    """,
)
def user_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of event mass across users
    (operators.profile.concentration_gini on the user axis) — how much
    of the traffic a few power users own; the abuse/bot-mix screen
    beside source_gini's corpus-balance view."""
    from ..operators.profile import concentration_gini

    return concentration_gini(
        _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull()),
        "user_id",
    )


@_q(
    "anova_value_weekday",
    """
    WITH g AS (
      SELECT dayofweek(ts) + 1 AS gg, count(*) AS n,
             sum(CAST(value AS DECIMAL(28,12))) AS s,
             sum(CAST(value * value AS DECIMAL(28,12))) AS q
      FROM events
      WHERE value IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1
    ),
    agg AS (
      SELECT sum(n) AS nn, count(*) AS k, sum(s) AS ss, sum(q) AS qq,
             sum(CAST(s::DOUBLE * s::DOUBLE / n::DOUBLE
                      AS DECIMAL(28,12))) AS sq_over_n
      FROM g
    ),
    calc AS (
      SELECT nn, k,
             CAST(round(sq_over_n, 6)
                  - round(CAST(ss::DOUBLE * ss::DOUBLE / nn::DOUBLE
                               AS DECIMAL(28,12)), 6)
                  AS DOUBLE) AS ssb,
             CAST(round(qq, 6) - round(sq_over_n, 6) AS DOUBLE)
               AS ssw,
             k >= 2 AND nn > k AS ok
      FROM agg
    )
    SELECT nn::BIGINT AS n, k::BIGINT AS k,
           (k - 1)::BIGINT AS df1, (nn - k)::BIGINT AS df2,
           round(CASE WHEN ok THEN ssb END, 9) AS ss_between,
           round(CASE WHEN ok THEN ssw END, 9) AS ss_within,
           round(CASE WHEN ok AND ssw > 0
                 THEN (ssb / (k::DOUBLE - 1))
                      / (ssw / (nn::DOUBLE - k::DOUBLE)) END, 9) AS f,
           round(CASE WHEN ok AND ssb + ssw != 0
                 THEN ssb / (ssb + ssw) END, 9) AS eta_squared
    FROM calc
    """,
)
def anova_value_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across the seven weekdays
    (operators.evaluation.anova_oneway on the day-of-week axis) — does
    the value metric carry a weekday effect worth deseasonalizing;
    same decimal-quantized group moments as the event-type omnibus."""
    from ..operators.evaluation import anova_oneway

    ev = _t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    ).select(
        F.col("value"), F.dayofweek("ts").alias("wd")
    )
    return anova_oneway(ev, "value", "wd")


def _retention_wilson_oracle() -> str:
    return """
    WITH cohort AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    csize AS (
      SELECT cohort_week, count(*) AS cohort_n FROM cohort GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
      FROM events
    ),
    ret AS (
      SELECT CAST(c.cohort_week AS TIMESTAMP) AS cohort_week,
             CAST(date_diff('day', c.cohort_week, a.activity_week) / 7
                  AS BIGINT) AS week_offset,
             count(*) AS active_users
      FROM activity a JOIN cohort c USING (user_id)
      WHERE a.activity_week >= c.cohort_week
      GROUP BY 1, 2
    ),
    w AS (
      SELECT r.cohort_week, r.week_offset, s.cohort_n,
             r.active_users,
             r.active_users::DOUBLE / s.cohort_n::DOUBLE AS p,
             1.959963984540054 AS z, s.cohort_n::DOUBLE AS nd
      FROM ret r
      JOIN csize s ON CAST(s.cohort_week AS TIMESTAMP) = r.cohort_week
    )
    SELECT cohort_week, week_offset,
           cohort_n::BIGINT AS cohort_n,
           active_users::BIGINT AS active_users,
           round(p, 9) AS rate,
           round((p + z * z / (2 * nd)
                  - z * sqrt(p * (1 - p) / nd
                             + z * z / (4 * nd * nd)))
                 / (1 + z * z / nd), 9) AS ci_lo,
           round((p + z * z / (2 * nd)
                  + z * sqrt(p * (1 - p) / nd
                             + z * z / (4 * nd * nd)))
                 / (1 + z * z / nd), 9) AS ci_hi
    FROM w
    """


@_q("retention_weekly_wilson", _retention_wilson_oracle())
def retention_weekly_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention WITH Wilson 95% error bars — the bars the
    retention triangle needs before anyone reads a 3-user cohort cell as
    signal (operators.funnel.retention_cohorts + the proportion_wilson_ci
    closed form).  Two user-keyed aggregates + one bounded cohort join;
    exact integer counts, closed-form interval per cell."""
    from ..operators.funnel import retention_cohorts

    ev = _t(spark, sf_dir, "events")
    ret = retention_cohorts(ev, cohort_step="signup")
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    csize = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_n")
    )
    j = ret.join(F.broadcast(csize), "cohort_week")
    z = F.lit(1.959963984540054)
    nd = F.col("cohort_n").cast("double")
    p = F.col("active_users").cast("double") / nd
    half = z * F.sqrt(
        p * (F.lit(1.0) - p) / nd + z * z / (F.lit(4.0) * nd * nd)
    )
    denom = F.lit(1.0) + z * z / nd
    center = p + z * z / (F.lit(2.0) * nd)
    return j.select(
        "cohort_week",
        F.col("week_offset").cast("long").alias("week_offset"),
        F.col("cohort_n").cast("long").alias("cohort_n"),
        F.col("active_users").cast("long").alias("active_users"),
        F.round(p, 9).alias("rate"),
        F.round((center - half) / denom, 9).alias("ci_lo"),
        F.round((center + half) / denom, 9).alias("ci_hi"),
    )


@_q(
    "dq_completeness_profile",
    """
    WITH agg AS (
      SELECT count(*) AS n,
             sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS n_doc,
             sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS n_text,
             sum(CASE WHEN text IS NOT NULL AND trim(text) = ''
                      THEN 1 ELSE 0 END) AS e_text,
             sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS n_lang,
             sum(CASE WHEN lang IS NOT NULL AND trim(lang) = ''
                      THEN 1 ELSE 0 END) AS e_lang,
             sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS n_src,
             sum(CASE WHEN source IS NOT NULL AND trim(source) = ''
                      THEN 1 ELSE 0 END) AS e_src,
             sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS n_nc
      FROM documents
    )
    SELECT t."column", agg.n::BIGINT AS n, t.nulls::BIGINT AS nulls,
           round(t.nulls::DOUBLE / nullif(agg.n::DOUBLE, 0), 9)
             AS null_share,
           t.empties::BIGINT AS empties
    FROM agg, LATERAL (
      VALUES ('doc_id', n_doc, NULL),
             ('text', n_text, e_text),
             ('lang', n_lang, e_lang),
             ('source', n_src, e_src),
             ('n_chars', n_nc, NULL)
    ) AS t("column", nulls, empties)
    """,
)
def dq_completeness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column NULL/blank completeness profile of the documents table
    (operators.profile.completeness_profile) — the generic first DQ pass
    beside dq_orders_expectations' rule checks; ONE scan, stacked to one
    row per column, exact integers."""
    from ..operators.profile import completeness_profile

    return completeness_profile(
        _t(spark, sf_dir, "documents"),
        ["doc_id", "text", "lang", "source", "n_chars"],
        string_cols=["text", "lang", "source"],
    )


@_q(
    "dedup_lsh_band_stats",
    f"""
    WITH {_DUCK_MINHASH},
    bands AS (
      SELECT doc_id, j // 4 AS band,
             string_agg(minhash::VARCHAR, '-' ORDER BY j) AS band_key
      FROM sig GROUP BY doc_id, j // 4
    ),
    sizes AS (
      SELECT band, band_key, count(*) AS s FROM bands GROUP BY 1, 2
    )
    SELECT band::INT AS band, sum(s)::BIGINT AS n_docs,
           count(*)::BIGINT AS n_buckets, max(s)::BIGINT AS max_bucket,
           sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)::BIGINT
             AS singleton_buckets,
           (sum(s * (s - 1)) // 2)::BIGINT AS candidate_pairs
    FROM sizes GROUP BY 1
    """,
)
def dedup_lsh_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band bucket-health stats of the MinHash-LSH index
    (operators.dedup.lsh_band_stats) — max bucket and exact candidate-
    pair counts, the audit behind every max_bucket_size skew cap; same
    row-local banding projection as the pair stage."""
    from ..operators.dedup import lsh_band_stats

    return lsh_band_stats(_t(spark, sf_dir, "documents"))


@_q(
    "event_interarrival_cv",
    """
    WITH gaps AS (
      SELECT user_id,
             CAST(floor(epoch(lead(ts) OVER (PARTITION BY user_id
                        ORDER BY ts))) AS BIGINT)
               - CAST(floor(epoch(ts)) AS BIGINT) AS g
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    per_u AS (
      SELECT user_id, count(*) AS n,
             sum(g::HUGEINT) AS s, sum(g::HUGEINT * g::HUGEINT) AS q
      FROM gaps WHERE g IS NOT NULL GROUP BY 1
      HAVING count(*) >= 2
    ),
    cvs AS (
      SELECT round(
               sqrt(greatest(q::DOUBLE / n::DOUBLE
                    - (s::DOUBLE / n::DOUBLE)
                      * (s::DOUBLE / n::DOUBLE), 0.0))
               / nullif(s::DOUBLE / n::DOUBLE, 0), 9) AS cv
      FROM per_u
    ),
    f AS (SELECT cv FROM cvs WHERE cv IS NOT NULL)
    SELECT count(*)::BIGINT AS n_users,
           round(CAST(sum(CAST(cv AS DECIMAL(28,9))) AS DOUBLE)
                 / count(*)::DOUBLE, 9) AS mean_cv,
           round(quantile_cont(cv, 0.5), 9) AS p50_cv,
           round(quantile_cont(cv, 0.9), 9) AS p90_cv,
           round(sum(CASE WHEN cv > 1.0 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*)::DOUBLE, 9) AS bursty_share
    FROM f
    """,
)
def event_interarrival_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival coefficient-of-variation profile
    (operators.timeseries.interarrival_cv_profile) — CV ~ 1 is Poisson,
    >> 1 bursty/bot-like, << 1 metronomic; exact integer-second gap
    moments per user, one summary reduce with exact percentiles."""
    from ..operators.timeseries import interarrival_cv_profile

    return interarrival_cv_profile(_t(spark, sf_dir, "events"))


@_q(
    "stopword_coverage_by_lang",
    """
    WITH base AS (
      SELECT lang,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n,
             len(list_filter(regexp_extract_all(lower(text),
                 '[a-z0-9]+'),
                 t -> list_contains(['the', 'a', 'an', 'and', 'or',
                                     'of', 'to', 'in', 'is', 'it'], t)))
               AS h
      FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
    )
    SELECT lang, count(*)::BIGINT AS n_docs,
           sum(n)::BIGINT AS tokens,
           sum(h)::BIGINT AS stopword_tokens,
           round(sum(h)::DOUBLE / nullif(sum(n)::DOUBLE, 0), 9)
             AS coverage,
           sum(CASE WHEN h = 0 THEN 1 ELSE 0 END)::BIGINT
             AS zero_stopword_docs
    FROM base GROUP BY 1
    """,
)
def stopword_coverage_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword token coverage per language label
    (operators.textstats.stopword_coverage) — near-zero coverage on
    'en' flags lists/code; nonzero coverage on non-English labels IS
    the contamination estimate.  Row-local hit counts, one groupBy."""
    from ..operators.textstats import stopword_coverage

    return stopword_coverage(_t(spark, sf_dir, "documents"))


@_q(
    "customer_order_frequency",
    """
    WITH per AS (
      SELECT o_custkey, count(*) AS k FROM orders GROUP BY 1
    )
    SELECT count(*)::BIGINT AS n_customers,
           sum(k)::BIGINT AS n_orders,
           round(sum(k)::DOUBLE / count(*)::DOUBLE, 9) AS mean_orders,
           round(quantile_cont(k, 0.5), 6) AS p50,
           round(quantile_cont(k, 0.9), 6) AS p90,
           max(k)::BIGINT AS max_orders,
           round(sum(CASE WHEN k >= 2 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*)::DOUBLE, 9) AS repeat_share
    FROM per
    """,
)
def customer_order_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-frequency distribution per customer — repeat-purchase rate
    and exact interpolated p50/p90 order counts; the RFM 'F' axis as a
    one-row corpus summary.  One customer-keyed count + one reduce."""
    per = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("k").cast("long").alias("n_orders"),
        F.round(
            F.sum("k").cast("double") / F.count(F.lit(1)).cast("double"),
            9,
        ).alias("mean_orders"),
        F.round(F.percentile("k", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("k", F.lit(0.9)), 6).alias("p90"),
        F.max("k").cast("long").alias("max_orders"),
        F.round(
            F.sum((F.col("k") >= 2).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            9,
        ).alias("repeat_share"),
    )


@_q(
    "discount_band_profile",
    """
    SELECT round(l_discount, 2) AS discount_band,
           count(*)::BIGINT AS n_lines,
           CAST(sum(CAST(round(l_extendedprice
                 * (1 - l_discount), 4) AS DECIMAL(28,4)))
                 AS DOUBLE) AS revenue,
           round(CAST(sum(CAST(round(l_quantity, 2)
                 AS DECIMAL(28,2))) AS DOUBLE)
                 / count(*)::DOUBLE, 9) AS avg_qty
    FROM lineitem
    WHERE l_discount IS NOT NULL
    GROUP BY 1
    """,
)
def discount_band_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue and volume by discount band — the promo-depth profile
    behind q14/q19's fixed predicates; exact decimal revenue sums per
    2-dp band, one partial-aggregable groupBy."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_discount").isNotNull()
    )
    return li.groupBy(
        F.round("l_discount", 2).alias("discount_band")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        # 4-dp quantize (the true 2dp*2dp product IS exactly 4 dp, so
        # no .5 boundary exists); emit the exact decimal-sum -> double
        # conversion unrounded (round-2 at ~1e8 magnitude is the known
        # half-digit boundary trap)
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (F.lit(1.0) - F.col("l_discount")),
                4,
            ).cast("decimal(28,4)")
        ).cast("double").alias("revenue"),
        F.round(
            F.sum(
                F.round(F.col("l_quantity"), 2).cast("decimal(28,2)")
            ).cast("double")
            / F.count(F.lit(1)).cast("double"),
            9,
        ).alias("avg_qty"),
    )


@_q(
    "jonckheere_value_by_activity",
    """
    WITH users AS (
      SELECT user_id, count(*) AS n_events,
             CAST(sum(CAST(round(coalesce(value, 0), 2)
                  AS DECIMAL(28,2))) AS DOUBLE) AS v
      FROM events WHERE user_id IS NOT NULL GROUP BY 1
    ),
    st AS (
      SELECT v, ntile(3) OVER (ORDER BY n_events, user_id) AS s
      FROM users
    ),
    pv AS (
      SELECT v,
             sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS c0,
             sum(CASE WHEN s = 2 THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN s = 3 THEN 1 ELSE 0 END) AS c2
      FROM st GROUP BY 1
    ),
    cum AS (
      SELECT *,
             coalesce(sum(c0) OVER wp, 0) AS p0,
             coalesce(sum(c1) OVER wp, 0) AS p1
      FROM pv
      WINDOW wp AS (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    agg AS (
      SELECT sum(c1 * (2 * p0 + c0) + c2 * (2 * p0 + c0)
                 + c2 * (2 * p1 + c1)) AS j2,
             sum(c0) AS n0, sum(c1) AS n1, sum(c2) AS n2
      FROM cum
    ),
    fin AS (
      SELECT j2, n0 + n1 + n2 AS n,
             n0 * n0 + n1 * n1 + n2 * n2 AS ssq,
             n0 * n0 * (2 * n0 + 3) + n1 * n1 * (2 * n1 + 3)
               + n2 * n2 * (2 * n2 + 3) AS spoly
      FROM agg
    ),
    zc AS (
      SELECT j2, n,
             (2.0 * j2::DOUBLE - (n * n - ssq)::DOUBLE)
             / nullif(4.0 * sqrt(((n * n)::DOUBLE
                 * (2.0 * n::DOUBLE + 3.0) - spoly::DOUBLE) / 72.0), 0)
               AS z
      FROM fin
    )
    SELECT n::BIGINT AS n, CAST(3 AS BIGINT) AS k,
           j2::BIGINT AS j2, round(z, 9) AS z,
           CASE WHEN z > 1.959963984540054 THEN 'increasing'
                WHEN z < -1.959963984540054 THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM zc
    """,
)
def jonckheere_value_by_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered-trend test of per-user total value
    across activity tertiles (operators.evaluation.jonckheere_terpstra)
    — does spend rise with activity, with ordering credit the unordered
    omnibus wastes; exact half-tie-credited 2J on the distinct-value
    axis, one z."""
    from ..operators.evaluation import jonckheere_terpstra

    users = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.round(F.coalesce(F.col("value"), F.lit(0.0)), 2)
                .cast("decimal(28,2)")
            ).cast("double").alias("v"),
        )
    )
    st = users.select(
        "v",
        F.ntile(3)
        .over(Window.orderBy(F.col("n_events"), F.col("user_id")))
        .cast("string")
        .alias("s"),
    )
    return jonckheere_terpstra(st, "v", "s", order=["1", "2", "3"])


@_q(
    "mood_median_doclen_lang",
    """
    WITH base AS (
      SELECT lang AS g, n_chars::DOUBLE AS v FROM documents
      WHERE n_chars IS NOT NULL AND lang IS NOT NULL
    ),
    cnt AS (SELECT v, count(*) AS c FROM base GROUP BY 1),
    med AS (
      SELECT v AS m FROM (
        SELECT v, sum(c) OVER (ORDER BY v) AS cum,
               sum(c) OVER () AS tot FROM cnt
      ) WHERE cum * 2 >= tot ORDER BY v LIMIT 1
    ),
    cells AS (
      SELECT g, count(*) AS n,
             sum(CASE WHEN v > (SELECT m FROM med)
                      THEN 1 ELSE 0 END) AS a
      FROM base GROUP BY 1
    ),
    marg AS (
      SELECT sum(n) AS nn, sum(a) AS aa, count(*) AS k FROM cells
    ),
    terms AS (
      SELECT round(
               CASE WHEN n::DOUBLE * aa::DOUBLE / nn::DOUBLE != 0
                    THEN (a::DOUBLE - n::DOUBLE * aa::DOUBLE
                          / nn::DOUBLE)
                         * (a::DOUBLE - n::DOUBLE * aa::DOUBLE
                            / nn::DOUBLE)
                         / (n::DOUBLE * aa::DOUBLE / nn::DOUBLE)
               END
               + CASE WHEN n::DOUBLE * (nn - aa)::DOUBLE
                           / nn::DOUBLE != 0
                      THEN ((n - a)::DOUBLE - n::DOUBLE
                            * (nn - aa)::DOUBLE / nn::DOUBLE)
                           * ((n - a)::DOUBLE - n::DOUBLE
                              * (nn - aa)::DOUBLE / nn::DOUBLE)
                           / (n::DOUBLE * (nn - aa)::DOUBLE
                              / nn::DOUBLE)
                 END, 12) AS t,
             nn, k
      FROM cells CROSS JOIN marg
    ),
    agg AS (
      SELECT max(nn) AS n, max(k) AS k,
             sum(CAST(t AS DECIMAL(28,12))) AS chi2
      FROM terms
    ),
    zc AS (
      SELECT n, k, chi2::DOUBLE AS chi2,
             (cbrt(chi2::DOUBLE / (k::DOUBLE - 1.0))
              - (1.0 - 2.0 / (9.0 * (k::DOUBLE - 1.0))))
             / sqrt(2.0 / (9.0 * (k::DOUBLE - 1.0))) AS uu
      FROM agg
    ),
    z2 AS (
      SELECT *,
             (1.0 / (1.0 + 0.3275911 * (abs(uu) / sqrt(2.0)))) AS w
      FROM zc
    ),
    z3 AS (
      SELECT *,
             w * (0.254829592 + w * (-0.284496736 + w * (1.421413741
               + w * (-1.453152027 + w * 1.061405429))))
               * exp(-(abs(uu) / sqrt(2.0)) * (abs(uu) / sqrt(2.0)))
               AS e
      FROM z2
    )
    SELECT n::BIGINT AS n, k::BIGINT AS k,
           round((SELECT m FROM med), 9) AS median,
           round(CASE WHEN k >= 2 THEN chi2 END, 9) AS chi2,
           (k - 1)::BIGINT AS dof,
           round(CASE WHEN k >= 2 THEN
             CASE WHEN uu >= 0 THEN e / 2.0 ELSE 1.0 - e / 2.0 END
             END, 9) AS p_approx
    FROM z3
    """,
)
def mood_median_doclen_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test of document length across languages
    (operators.evaluation.mood_median_test) — the maximally-robust
    shared-median omnibus (one bit per doc); exact pooled lower median
    off cumulative counts, 2xk integer cells, Wilson-Hilferty + A-S
    p."""
    from ..operators.evaluation import mood_median_test

    return mood_median_test(
        _t(spark, sf_dir, "documents"), "n_chars", "lang"
    )


@_q(
    "supplier_revenue_hhi",
    """
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(round(l_extendedprice * (1 - l_discount), 4)
                 AS DECIMAL(28,4))) AS r
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT sum(r) AS t, count(*) AS k FROM rev),
    sh AS (
      SELECT r::DOUBLE / t::DOUBLE AS s, k, t
      FROM rev CROSS JOIN tot
    )
    SELECT max(k)::BIGINT AS n_suppliers,
           CAST(max(t) AS DOUBLE) AS total_revenue,
           round(CAST(sum(CAST(round(s * s, 12) AS DECIMAL(28,12)))
                 AS DOUBLE), 9) AS hhi,
           round(max(s), 9) AS top_share
    FROM sh
    """,
)
def supplier_revenue_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of revenue across suppliers —
    the antitrust-style one-number beside pareto_parts' cumulative
    curve (HHI 1/k = perfectly even, -> 1 = monopoly).  Exact 4-dp
    decimal revenue sums per supplier, 12-dp-quantized share squares on
    the supplier axis."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (F.lit(1.0) - F.col("l_discount")),
                4,
            ).cast("decimal(28,4)")
        ).alias("r")
    )
    tot = rev.agg(
        F.sum("r").alias("t"), F.count(F.lit(1)).alias("k")
    )
    sh = rev.crossJoin(F.broadcast(tot)).select(
        (F.col("r").cast("double") / F.col("t").cast("double")).alias(
            "s"
        ),
        "k",
        "t",
    )
    return sh.agg(
        F.max("k").cast("long").alias("n_suppliers"),
        F.max("t").cast("double").alias("total_revenue"),
        F.round(
            F.sum(
                F.round(F.col("s") * F.col("s"), 12).cast(
                    "decimal(28,12)"
                )
            ).cast("double"),
            9,
        ).alias("hhi"),
        F.round(F.max("s"), 9).alias("top_share"),
    )


@_q(
    "ts_dickey_fuller",
    f"""
    WITH b AS ({_BUCKET_DAY}),
    lagged AS (
      SELECT m::DOUBLE AS y,
             lag(m::DOUBLE) OVER (ORDER BY bk) AS x
      FROM b
    ),
    st AS (
      SELECT x, y - x AS d FROM lagged WHERE x IS NOT NULL
    ),
    agg AS (
      SELECT count(*) AS n,
             sum(CAST(round(x, 9) AS DECIMAL(28,9))) AS sx,
             sum(CAST(round(d, 9) AS DECIMAL(28,9))) AS sy,
             sum(CAST(round(x * x, 9) AS DECIMAL(28,9))) AS sxx,
             sum(CAST(round(x * d, 9) AS DECIMAL(28,9))) AS sxy,
             sum(CAST(round(d * d, 9) AS DECIMAL(28,9))) AS syy
      FROM st
    ),
    calc AS (
      SELECT n,
             (sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE)
               / nullif(sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE
                        / n::DOUBLE, 0) AS beta,
             sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE AS vx,
             (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE)
               - (sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE)
                 * (sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE)
                 / nullif(sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE
                          / n::DOUBLE, 0) AS sse
      FROM agg
    ),
    fin AS (
      SELECT n, beta,
             CASE WHEN n > 3 THEN
               sqrt((sse / (n::DOUBLE - 2.0)) / nullif(vx, 0))
             END AS se
      FROM calc
    )
    SELECT n::BIGINT AS n, round(beta, 9) AS beta, round(se, 9) AS se,
           round(beta / nullif(se, 0), 9) AS df_stat,
           coalesce(beta / nullif(se, 0) < -2.86, false) AS stationary
    FROM fin
    """,
)
def ts_dickey_fuller(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root test on daily event-value means
    (operators.timeseries.dickey_fuller_test) — mean-reverting or random
    walk, the monitor-design question beside hurst/variance-ratio; OLS
    of the first difference on the lagged level from 9-dp decimal
    moments on the day axis."""
    from ..operators.timeseries import dickey_fuller_test

    return dickey_fuller_test(_t(spark, sf_dir, "events"))


@_q(
    "return_rate_by_band",
    """
    WITH base AS (
      SELECT round(l_discount, 2) AS discount_band,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
      FROM lineitem
      WHERE l_discount IS NOT NULL AND l_returnflag IS NOT NULL
    ),
    agg AS (
      SELECT discount_band, count(*) AS n, sum(r) AS k
      FROM base GROUP BY 1
    ),
    w AS (
      SELECT discount_band, n, k,
             k::DOUBLE / n::DOUBLE AS p, n::DOUBLE AS nd,
             1.959963984540054 AS z
      FROM agg
    )
    SELECT discount_band, n::BIGINT AS n, k::BIGINT AS returns,
           round(p, 9) AS rate,
           round((p + z * z / (2 * nd)
                  - z * sqrt(p * (1 - p) / nd
                             + z * z / (4 * nd * nd)))
                 / (1 + z * z / nd), 9) AS ci_lo,
           round((p + z * z / (2 * nd)
                  + z * sqrt(p * (1 - p) / nd
                             + z * z / (4 * nd * nd)))
                 / (1 + z * z / nd), 9) AS ci_hi
    FROM w
    """,
)
def return_rate_by_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate per discount band with Wilson 95% bars — do deeper
    discounts ship worse goods; exact integer cells, closed-form
    interval per band (the proportion_wilson_ci shape on the
    discount-band axis)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_discount").isNotNull()
        & F.col("l_returnflag").isNotNull()
    )
    agg = li.groupBy(
        F.round("l_discount", 2).alias("discount_band")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("l_returnflag") == "R").cast("long")
        ).alias("k"),
    )
    z = F.lit(1.959963984540054)
    nd = F.col("n").cast("double")
    p = F.col("k").cast("double") / nd
    half = z * F.sqrt(
        p * (F.lit(1.0) - p) / nd + z * z / (F.lit(4.0) * nd * nd)
    )
    denom = F.lit(1.0) + z * z / nd
    center = p + z * z / (F.lit(2.0) * nd)
    return agg.select(
        "discount_band",
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("returns"),
        F.round(p, 9).alias("rate"),
        F.round((center - half) / denom, 9).alias("ci_lo"),
        F.round((center + half) / denom, 9).alias("ci_hi"),
    )


def _quality_ks_oracle() -> str:
    quality = ORACLES["text_quality_scores"]
    return f"""
    WITH q AS ({quality}),
    counts AS (
      SELECT round(q.quality_score, 6) AS v, d.source AS g,
             count(*) AS n
      FROM q JOIN documents d USING (doc_id)
      WHERE d.source IS NOT NULL
      GROUP BY 1, 2
    ),
    grid AS (
      SELECT v, g
      FROM (SELECT DISTINCT v FROM counts)
      CROSS JOIN (SELECT DISTINCT g FROM counts)
    ),
    full_g AS (
      SELECT grid.v, grid.g, coalesce(counts.n, 0) AS n
      FROM grid LEFT JOIN counts USING (v, g)
    ),
    staged AS (
      SELECT g, v,
             sum(n) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(n) OVER (PARTITION BY g) AS tot
      FROM full_g
    ),
    gtab AS (
      SELECT v,
             sum(gn) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS gcum,
             sum(gn) OVER () AS gtot
      FROM (SELECT v, sum(n) AS gn FROM counts GROUP BY 1)
    ),
    j AS (
      SELECT s.g, s.cum, s.tot, gl.gcum, gl.gtot,
             abs(s.cum::DOUBLE / s.tot::DOUBLE
                 - (gl.gcum - s.cum)::DOUBLE
                   / nullif((gl.gtot - s.tot)::DOUBLE, 0)) AS gap
      FROM staged s JOIN gtab gl USING (v)
    )
    SELECT g AS "group", max(tot)::BIGINT AS n,
           max(gtot - tot)::BIGINT AS n_rest,
           round(max(gap), 9) AS ks_d
    FROM j GROUP BY 1
    """


@_q("quality_ks_by_source", _quality_ks_oracle())
def quality_ks_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source two-sample KS of the quality-score distribution vs the
    pooled rest (operators.profile.ks_group_vs_rest) — WHICH source
    drifted, in one pass over the shared 6-dp-quantized score axis with
    rest-counts by exact subtraction."""
    from ..operators.profile import ks_group_vs_rest
    from ..operators.textstats import quality_score

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull()
    )
    scored = quality_score(docs.select("doc_id", "source", "text"))
    return ks_group_vs_rest(scored, "quality_score", "source")


# --------------------------------------------------------------------------
# Round 11: association/ANOVA/trend/HAC statistics layer extensions
# --------------------------------------------------------------------------
@_q(
    "gk_lambda_lang_source",
    """
    WITH j AS (
      SELECT coalesce(lang, chr(0) || 'null') AS a,
             coalesce(source, chr(0) || 'null') AS b,
             count(*) AS o
      FROM documents GROUP BY 1, 2
    ),
    ra AS (SELECT a, sum(o) AS ma FROM j GROUP BY 1),
    cb AS (SELECT b, sum(o) AS mb FROM j GROUP BY 1),
    bestb AS (SELECT b, max(o) AS mo FROM j GROUP BY 1),
    besta AS (SELECT a, max(o) AS mo FROM j GROUP BY 1),
    s AS (
      SELECT (SELECT sum(o) FROM j) AS n,
             (SELECT max(ma) FROM ra) AS moda,
             (SELECT max(mb) FROM cb) AS modb,
             (SELECT sum(mo) FROM bestb) AS sb,
             (SELECT sum(mo) FROM besta) AS sa
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(CAST(sb - moda AS DOUBLE)
                 / nullif(CAST(n - moda AS DOUBLE), 0), 9)
             AS lambda_lang_given_source,
           round(CAST(sa - modb AS DOUBLE)
                 / nullif(CAST(n - modb AS DOUBLE), 0), 9)
             AS lambda_source_given_lang
    FROM s
    """,
)
def gk_lambda_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal lambda both ways for lang × source — the
    proportional-reduction-in-error association measure beside chi²/V
    (assoc_lang_source) and MI (mi_lang_source): "knowing the source, how
    much better do we guess the language than always guessing the modal
    one?".  PURE INTEGER arithmetic until the final two divisions (modal
    cell counts add and max — no quantization needed anywhere), over the
    broadcast-sized contingency table; the joint count groupBy is the one
    corpus-sized shuffle."""
    docs = _t(spark, sf_dir, "documents")
    a = F.coalesce(F.col("lang"), F.lit("\x00null"))
    b = F.coalesce(F.col("source"), F.lit("\x00null"))
    joint = (
        docs.select(a.alias("_a"), b.alias("_b"))
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).alias("_o"))
    )
    s = (
        joint.agg(F.sum("_o").alias("n"))
        .crossJoin(
            F.broadcast(
                joint.groupBy("_a").agg(F.sum("_o").alias("m"))
                .agg(F.max("m").alias("moda"))
            )
        )
        .crossJoin(
            F.broadcast(
                joint.groupBy("_b").agg(F.sum("_o").alias("m"))
                .agg(F.max("m").alias("modb"))
            )
        )
        .crossJoin(
            F.broadcast(
                joint.groupBy("_b").agg(F.max("_o").alias("m"))
                .agg(F.sum("m").alias("sb"))
            )
        )
        .crossJoin(
            F.broadcast(
                joint.groupBy("_a").agg(F.max("_o").alias("m"))
                .agg(F.sum("m").alias("sa"))
            )
        )
    )
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.round(
            F.try_divide(
                (F.col("sb") - F.col("moda")).cast("double"),
                (F.col("n") - F.col("moda")).cast("double"),
            ),
            9,
        ).alias("lambda_lang_given_source"),
        F.round(
            F.try_divide(
                (F.col("sa") - F.col("modb")).cast("double"),
                (F.col("n") - F.col("modb")).cast("double"),
            ),
            9,
        ).alias("lambda_source_given_lang"),
    )


@_q(
    "theils_u_lang_source",
    """
    WITH j AS (
      SELECT coalesce(lang, chr(0) || 'null') AS a,
             coalesce(source, chr(0) || 'null') AS b,
             count(*) AS o
      FROM documents GROUP BY 1, 2
    ),
    ra AS (SELECT a, sum(o) AS ma FROM j GROUP BY 1),
    cb AS (SELECT b, sum(o) AS mb FROM j GROUP BY 1),
    tot AS (SELECT sum(o) AS n FROM j),
    ha AS (
      SELECT CAST(sum(CAST(-(CAST(ma AS DOUBLE) / CAST(n AS DOUBLE))
                           * ln(CAST(ma AS DOUBLE) / CAST(n AS DOUBLE))
                      AS DECIMAL(28,12))) AS DOUBLE) AS h
      FROM ra CROSS JOIN tot
    ),
    hb AS (
      SELECT CAST(sum(CAST(-(CAST(mb AS DOUBLE) / CAST(n AS DOUBLE))
                           * ln(CAST(mb AS DOUBLE) / CAST(n AS DOUBLE))
                      AS DECIMAL(28,12))) AS DOUBLE) AS h
      FROM cb CROSS JOIN tot
    ),
    mi AS (
      SELECT CAST(sum(CAST((CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
                  * ln(CAST(n AS DOUBLE) * CAST(o AS DOUBLE)
                       / (CAST(ma AS DOUBLE) * CAST(mb AS DOUBLE)))
                 AS DECIMAL(28,12))) AS DOUBLE) AS mi,
             first(n) AS n
      FROM j JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(mi / nullif(ha.h, 0), 9) AS u_lang_given_source,
           round(mi / nullif(hb.h, 0), 9) AS u_source_given_lang
    FROM mi CROSS JOIN ha CROSS JOIN hb
    """,
)
def theils_u_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's uncertainty coefficient both ways for lang × source — the
    DIRECTIONAL normalization of mutual information (mi_lang_source's nmi
    is symmetric): U(lang|source) = MI/H(lang) answers "what fraction of
    language uncertainty does knowing the source remove", the asymmetric
    question a crawl-mix audit actually asks.  Same plan class as
    mi_lang_source: one joint-count groupBy, marginals on the broadcast
    contingency table, every entropy term ln'd per cell in double and
    12-dp-quantized before its cross-cell sum."""
    docs = _t(spark, sf_dir, "documents")
    a = F.coalesce(F.col("lang"), F.lit("\x00null"))
    b = F.coalesce(F.col("source"), F.lit("\x00null"))
    joint = (
        docs.select(a.alias("_a"), b.alias("_b"))
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).alias("_o"))
    )
    ra = joint.groupBy("_a").agg(F.sum("_o").alias("_ma"))
    cb = joint.groupBy("_b").agg(F.sum("_o").alias("_mb"))
    tot = joint.agg(F.sum("_o").alias("_n"))
    d12 = "decimal(28,12)"

    def _h(marg, m):
        p = F.col(m).cast("double") / F.col("_n").cast("double")
        return (
            marg.crossJoin(F.broadcast(tot))
            .select((-p * F.log(p)).cast(d12).alias("_t"))
            .agg(F.sum("_t").cast("double").alias("h"))
        )

    mi_term = (
        F.col("_o").cast("double") / F.col("_n").cast("double")
    ) * F.log(
        F.col("_n").cast("double")
        * F.col("_o").cast("double")
        / (F.col("_ma").cast("double") * F.col("_mb").cast("double"))
    )
    mi = (
        joint.join(F.broadcast(ra), "_a")
        .join(F.broadcast(cb), "_b")
        .crossJoin(F.broadcast(tot))
        .select(mi_term.cast(d12).alias("_t"), "_n")
        .groupBy()
        .agg(
            F.sum("_t").cast("double").alias("mi"),
            F.first("_n").alias("_n"),
        )
    )
    ha = _h(ra, "_ma").withColumnRenamed("h", "ha")
    hb = _h(cb, "_mb").withColumnRenamed("h", "hb")
    return (
        mi.crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
        .select(
            F.col("_n").cast("long").alias("n"),
            F.round(
                F.col("mi") / F.nullif(F.col("ha"), F.lit(0.0)), 9
            ).alias("u_lang_given_source"),
            F.round(
                F.col("mi") / F.nullif(F.col("hb"), F.lit(0.0)), 9
            ).alias("u_source_given_lang"),
        )
    )


@_q(
    "welch_anova_value_event",
    """
    WITH g AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(round(value, 9) AS DECIMAL(28,9))) AS DOUBLE) AS s,
             CAST(sum(CAST(round(value * value, 9) AS DECIMAL(28,9)))
                  AS DOUBLE) AS q
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1 HAVING count(*) >= 2
    ),
    m AS (
      SELECT event_type, n, s / n AS mean,
             (q - n * (s / n) * (s / n)) / (n - 1.0) AS var
      FROM g
    ),
    w AS (
      SELECT event_type, n, mean, var, n / var AS w FROM m WHERE var > 0
    ),
    t AS (
      SELECT CAST(sum(CAST(w AS DECIMAL(28,12))) AS DOUBLE) AS sw,
             CAST(sum(CAST(w * mean AS DECIMAL(28,12))) AS DOUBLE) AS swm,
             count(*) AS k, CAST(sum(n) AS BIGINT) AS n_rows
      FROM w
    ),
    parts AS (
      SELECT t.k, t.n_rows, t.sw,
             CAST(sum(CAST(w.w * (w.mean - t.swm / t.sw)
                           * (w.mean - t.swm / t.sw)
                      AS DECIMAL(28,12))) AS DOUBLE) AS numsum,
             CAST(sum(CAST((1.0 - w.w / t.sw) * (1.0 - w.w / t.sw)
                           / (w.n - 1.0)
                      AS DECIMAL(28,12))) AS DOUBLE) AS lam
      FROM w CROSS JOIN t GROUP BY 1, 2, 3
    )
    SELECT k::BIGINT AS k, n_rows,
           round(numsum / (k - 1.0)
                 / (1.0 + 2.0 * (k - 2.0) / (k * k - 1.0) * lam), 9)
             AS welch_f,
           round((k * k - 1.0) / (3.0 * lam), 9) AS df2
    FROM parts
    """,
)
def welch_anova_value_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA of event value across event
    types — the unequal-variance k-group omnibus beside the classic
    equal-variance F (anova_value_weekday) and its rank twin
    (kruskal-class tests): weights n_j/s_j² instead of a pooled MSE, so
    one high-variance event type cannot fake or mask a mean difference.
    One partial-aggregable decimal-moment scan to the 5-row group axis;
    every cross-group reduction 12-dp-quantized."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    d9, d12 = "decimal(28,9)", "decimal(28,12)"
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value"), 9).cast(d9)).cast("double").alias("s"),
        F.sum(F.round(F.col("value") * F.col("value"), 9).cast(d9))
        .cast("double")
        .alias("q"),
    ).filter(F.col("n") >= 2)
    nd = F.col("n").cast("double")
    mean = F.col("s") / nd
    var = (F.col("q") - nd * mean * mean) / (nd - F.lit(1.0))
    w = g.select(
        "event_type", "n", mean.alias("mean"), var.alias("var")
    ).filter(F.col("var") > 0).withColumn(
        "w", F.col("n").cast("double") / F.col("var")
    )
    t = w.agg(
        F.sum(F.col("w").cast(d12)).cast("double").alias("sw"),
        F.sum((F.col("w") * F.col("mean")).cast(d12))
        .cast("double")
        .alias("swm"),
        F.count(F.lit(1)).alias("k"),
        F.sum("n").cast("long").alias("n_rows"),
    )
    joined = w.crossJoin(F.broadcast(t))
    grand = F.col("swm") / F.col("sw")
    parts = joined.groupBy("k", "n_rows", "sw").agg(
        F.sum(
            (F.col("w") * (F.col("mean") - grand) * (F.col("mean") - grand))
            .cast(d12)
        )
        .cast("double")
        .alias("numsum"),
        F.sum(
            (
                (F.lit(1.0) - F.col("w") / F.col("sw"))
                * (F.lit(1.0) - F.col("w") / F.col("sw"))
                / (F.col("n").cast("double") - F.lit(1.0))
            ).cast(d12)
        )
        .cast("double")
        .alias("lam"),
    )
    kd = F.col("k").cast("double")
    return parts.select(
        F.col("k").cast("long").alias("k"),
        "n_rows",
        F.round(
            F.col("numsum")
            / (kd - F.lit(1.0))
            / (
                F.lit(1.0)
                + F.lit(2.0) * (kd - F.lit(2.0)) / (kd * kd - F.lit(1.0))
                * F.col("lam")
            ),
            9,
        ).alias("welch_f"),
        F.round((kd * kd - F.lit(1.0)) / (F.lit(3.0) * F.col("lam")), 9).alias(
            "df2"
        ),
    )


@_q(
    "odds_ratio_weekend_purchase",
    """
    WITH c AS (
      SELECT CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS wknd,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit,
             count(*) AS o
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN wknd = 1 AND hit = 1 THEN o END) AS DOUBLE) AS a,
             CAST(sum(CASE WHEN wknd = 1 AND hit = 0 THEN o END) AS DOUBLE) AS b,
             CAST(sum(CASE WHEN wknd = 0 AND hit = 1 THEN o END) AS DOUBLE) AS c,
             CAST(sum(CASE WHEN wknd = 0 AND hit = 0 THEN o END) AS DOUBLE) AS d
      FROM c
    )
    SELECT a::BIGINT AS n11, b::BIGINT AS n10, c::BIGINT AS n01,
           d::BIGINT AS n00,
           round(a * d / nullif(b * c, 0), 9) AS odds_ratio,
           round(ln(a * d / nullif(b * c, 0)), 9) AS log_or,
           round(sqrt(1/a + 1/b + 1/c + 1/d), 9) AS se_log_or,
           round(exp(ln(a * d / nullif(b * c, 0))
                     - 1.959963985 * sqrt(1/a + 1/b + 1/c + 1/d)), 9)
             AS ci_lo,
           round(exp(ln(a * d / nullif(b * c, 0))
                     + 1.959963985 * sqrt(1/a + 1/b + 1/c + 1/d)), 9)
             AS ci_hi
    FROM s
    """,
)
def odds_ratio_weekend_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 odds ratio of purchasing on weekends vs weekdays with the Woolf
    log-OR standard error and 95% CI — the case-control-style effect
    readout beside the cohort-style hazard/risk ratios already on file
    (hazard_ratio_churn_parity, ab_ratio_value_per_event).  One 4-cell
    integer-count reduce; all arithmetic after it is scalar double on one
    row."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    wknd = (F.weekday("ts") >= 5).cast("int")
    hit = (F.col("event_type") == "purchase").cast("int")
    s = ev.agg(
        F.sum(wknd * hit).cast("double").alias("a"),
        F.sum(wknd * (1 - hit)).cast("double").alias("b"),
        F.sum((1 - wknd) * hit).cast("double").alias("c"),
        F.sum((1 - wknd) * (1 - hit)).cast("double").alias("d"),
    )
    a, b, c, d = F.col("a"), F.col("b"), F.col("c"), F.col("d")
    orr = a * d / F.nullif(b * c, F.lit(0.0))
    se = F.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    z = F.lit(1.959963985)
    return s.select(
        a.cast("long").alias("n11"),
        b.cast("long").alias("n10"),
        c.cast("long").alias("n01"),
        d.cast("long").alias("n00"),
        F.round(orr, 9).alias("odds_ratio"),
        F.round(F.log(orr), 9).alias("log_or"),
        F.round(se, 9).alias("se_log_or"),
        F.round(F.exp(F.log(orr) - z * se), 9).alias("ci_lo"),
        F.round(F.exp(F.log(orr) + z * se), 9).alias("ci_hi"),
    )


@_q(
    "kuiper_value_uniform",
    """
    WITH c AS (
      SELECT event_type, value AS v, count(*) AS n
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, v, n,
             sum(n) OVER (PARTITION BY event_type ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(n) OVER (PARTITION BY event_type) AS tot
      FROM c
    ),
    g AS (
      SELECT event_type, tot,
             CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)
               - greatest(0.0, least(1.0, v / 500.0)) AS dplus,
             greatest(0.0, least(1.0, v / 500.0))
               - CAST(cum - n AS DOUBLE) / CAST(tot AS DOUBLE) AS dminus
      FROM w
    )
    SELECT event_type, CAST(max(tot) AS BIGINT) AS n,
           round(max(dplus), 9) AS d_plus,
           round(max(dminus), 9) AS d_minus,
           round(max(dplus) + max(dminus), 9) AS kuiper_v
    FROM g GROUP BY 1
    """,
)
def kuiper_value_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kuiper goodness-of-fit of event value vs uniform on [0, 500) per
    event_type — KS's rotation-invariant sibling (V = D⁺ + D⁻): equally
    sensitive in the tails and the middle where ks_uniform_fit's single
    max-gap underweights the tails — the right variant for cyclic or
    tail-heavy drift.  Same plan as ks_uniform_fit: one distinct-value
    count groupBy, cum windows on the value axis, exact integer counts,
    order-free maxes."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    c = ev.groupBy("event_type", F.col("value").alias("v")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("event_type")
    fv = F.greatest(F.lit(0.0), F.least(F.lit(1.0), F.col("v") / 500.0))
    g = (
        c.withColumn("cum", F.sum("n").over(w_cum))
        .withColumn("tot", F.sum("n").over(w_tot))
        .select(
            "event_type",
            "tot",
            (F.col("cum").cast("double") / F.col("tot").cast("double") - fv)
            .alias("dplus"),
            (
                fv
                - (F.col("cum") - F.col("n")).cast("double")
                / F.col("tot").cast("double")
            ).alias("dminus"),
        )
    )
    return g.groupBy("event_type").agg(
        F.max("tot").cast("long").alias("n"),
        F.round(F.max("dplus"), 9).alias("d_plus"),
        F.round(F.max("dminus"), 9).alias("d_minus"),
        F.round(F.max("dplus") + F.max("dminus"), 9).alias("kuiper_v"),
    )


@_q(
    "process_capability_value",
    """
    WITH g AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(round(value, 9) AS DECIMAL(28,9))) AS DOUBLE) AS s,
             CAST(sum(CAST(round(value * value, 9) AS DECIMAL(28,9)))
                  AS DOUBLE) AS q
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1 HAVING count(*) >= 2
    ),
    m AS (
      SELECT event_type, n, s / n AS mu,
             sqrt((q - n * (s / n) * (s / n)) / (n - 1.0)) AS sd
      FROM g
    )
    SELECT event_type, n::BIGINT AS n, round(mu, 9) AS mean,
           round(sd, 9) AS sd,
           round(500.0 / (6.0 * sd), 9) AS cp,
           round(least(500.0 - mu, mu - 0.0) / (3.0 * sd), 9) AS cpk
    FROM m
    """,
)
def process_capability_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-capability indices Cp / Cpk of event value against the
    [0, 500) spec band per event_type — the SPC one-number ("how many
    sigmas fit inside spec, and is the process centered?") beside the
    control-chart-style monitors (ts_level_shift, ts_bollinger_daily).
    One partial-aggregable decimal-moment scan; scalar arithmetic on the
    5-row group axis."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    d9 = "decimal(28,9)"
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value"), 9).cast(d9)).cast("double").alias("s"),
        F.sum(F.round(F.col("value") * F.col("value"), 9).cast(d9))
        .cast("double")
        .alias("q"),
    ).filter(F.col("n") >= 2)
    nd = F.col("n").cast("double")
    mu = F.col("s") / nd
    sd = F.sqrt((F.col("q") - nd * mu * mu) / (nd - F.lit(1.0)))
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(mu, 9).alias("mean"),
        F.round(sd, 9).alias("sd"),
        F.round(F.lit(500.0) / (F.lit(6.0) * sd), 9).alias("cp"),
        F.round(
            F.least(F.lit(500.0) - mu, mu - F.lit(0.0)) / (F.lit(3.0) * sd), 9
        ).alias("cpk"),
    )


@_q(
    "page_trend_weekday",
    """
    WITH cell AS (
      SELECT event_type, isodow(ts) AS wd,
             CAST(sum(CAST(round(value, 9) AS DECIMAL(28,9))) AS DOUBLE)
               / count(*) AS m
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    full_blocks AS (
      SELECT event_type FROM cell GROUP BY 1 HAVING count(*) = 7
    ),
    r AS (
      SELECT c.event_type, c.wd,
             rank() OVER (PARTITION BY c.event_type ORDER BY c.m)
               + (count(*) OVER (PARTITION BY c.event_type, c.m) - 1) / 2.0
               AS rk
      FROM cell c JOIN full_blocks USING (event_type)
    ),
    l AS (
      SELECT CAST(sum(CAST(wd * rk AS DECIMAL(28,6))) AS DOUBLE) AS l,
             count(DISTINCT event_type) AS b
      FROM r
    )
    SELECT b::BIGINT AS n_blocks, 7 AS k,
           round(l, 9) AS page_l,
           round((l - b * 7 * 64 / 4.0)
                 / sqrt(b * 49.0 * 8.0 * 48.0 / 144.0), 9) AS z
    FROM l
    """,
)
def page_trend_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L trend test for a MONOTONE ordering of mean event value
    across the week (treatments = ISO weekday 1..7, blocks = event
    types) — the ordered-alternative version of Friedman
    (friedman_event_types), crediting Monday<Tuesday<…<Sunday structure
    the unordered omnibus wastes; the blocked companion of Jonckheere.
    One corpus reduce to the 5×7 cell grid; midranks within each
    complete block; L = Σ j·R_j with the closed-form normal
    approximation."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    cell = ev.groupBy(
        "event_type", (F.weekday("ts") + 1).alias("wd")
    ).agg(
        (
            F.sum(F.round(F.col("value"), 9).cast("decimal(28,9)"))
            .cast("double")
            / F.count(F.lit(1))
        ).alias("m")
    )
    full_blocks = (
        cell.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") == 7)
        .select("event_type")
    )
    w_rank = Window.partitionBy("event_type").orderBy("m")
    w_tie = Window.partitionBy("event_type", "m")
    r = cell.join(F.broadcast(full_blocks), "event_type").select(
        "event_type",
        "wd",
        (
            F.rank().over(w_rank)
            + (F.count(F.lit(1)).over(w_tie) - 1) / F.lit(2.0)
        ).alias("rk"),
    )
    l = r.agg(
        F.sum((F.col("wd") * F.col("rk")).cast("decimal(28,6)"))
        .cast("double")
        .alias("l"),
        F.count_distinct("event_type").alias("b"),
    )
    bd = F.col("b").cast("double")
    # k = 7: E[L] = b·k(k+1)²/4 = b·112; Var[L] = b·k²(k+1)(k²−1)/144
    return l.select(
        F.col("b").cast("long").alias("n_blocks"),
        F.lit(7).alias("k"),
        F.round(F.col("l"), 9).alias("page_l"),
        F.round(
            (F.col("l") - bd * F.lit(7.0 * 64.0 / 4.0))
            / F.sqrt(bd * F.lit(49.0 * 8.0 * 48.0 / 144.0)),
            9,
        ).alias("z"),
    )


@_q(
    "newey_west_daily_mean",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts)::TIMESTAMP AS day,
             CAST(sum(CAST(round(value, 9) AS DECIMAL(28,9))) AS DOUBLE) AS x
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    s AS (
      SELECT count(*) AS t,
             CAST(sum(CAST(round(x, 9) AS DECIMAL(28,9))) AS DOUBLE)
               / count(*) AS mu
      FROM daily
    ),
    d AS (
      SELECT day, x - s.mu AS dev FROM daily CROSS JOIN s
    ),
    led AS (
      SELECT dev,
             lead(dev, 1) OVER (ORDER BY day) AS d1,
             lead(dev, 2) OVER (ORDER BY day) AS d2,
             lead(dev, 3) OVER (ORDER BY day) AS d3,
             lead(dev, 4) OVER (ORDER BY day) AS d4,
             lead(dev, 5) OVER (ORDER BY day) AS d5
      FROM d
    ),
    g AS (
      SELECT
        CAST(sum(CAST(round(dev * dev, 9) AS DECIMAL(28,9))) AS DOUBLE) AS g0,
        CAST(sum(CAST(round(dev * d1, 9) AS DECIMAL(28,9))) AS DOUBLE) AS g1,
        CAST(sum(CAST(round(dev * d2, 9) AS DECIMAL(28,9))) AS DOUBLE) AS g2,
        CAST(sum(CAST(round(dev * d3, 9) AS DECIMAL(28,9))) AS DOUBLE) AS g3,
        CAST(sum(CAST(round(dev * d4, 9) AS DECIMAL(28,9))) AS DOUBLE) AS g4,
        CAST(sum(CAST(round(dev * d5, 9) AS DECIMAL(28,9))) AS DOUBLE) AS g5
      FROM led
    )
    SELECT s.t::BIGINT AS n_days, round(s.mu, 9) AS daily_mean,
           round(sqrt((g0 / s.t) / s.t), 9) AS se_iid,
           round(sqrt(greatest(
             (g0 + 2 * ((1 - 1/6.0) * coalesce(g1, 0)
                        + (1 - 2/6.0) * coalesce(g2, 0)
                        + (1 - 3/6.0) * coalesce(g3, 0)
                        + (1 - 4/6.0) * coalesce(g4, 0)
                        + (1 - 5/6.0) * coalesce(g5, 0))) / s.t, 0)
             / s.t), 9) AS se_hac
    FROM g CROSS JOIN s
    """,
)
def newey_west_daily_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newey-West (HAC, Bartlett kernel, lag 5) standard error of the
    mean daily event value beside the naive iid SE — autocorrelated
    daily series make the iid SE overconfident by exactly the ratio this
    query reads out; the honest error bar every "is this week's mean
    up?" dashboard needs (companion to ts_ljung_box, which only detects
    the autocorrelation).  One corpus reduce to the day axis; lag
    products via lead windows on the bounded (~31-row) axis; 9-dp
    quantization before each cross-day sum."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d9 = "decimal(28,9)"
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.round(F.col("value"), 9).cast(d9)).cast("double").alias("x")
    )
    s = daily.agg(
        F.count(F.lit(1)).alias("t"),
        (
            F.sum(F.round(F.col("x"), 9).cast(d9)).cast("double")
            / F.count(F.lit(1))
        ).alias("mu"),
    )
    d = daily.crossJoin(F.broadcast(s)).select(
        "day", "t", "mu", (F.col("x") - F.col("mu")).alias("dev")
    )
    w = Window.orderBy("day")
    led = d.select(
        "t",
        "mu",
        "dev",
        *[F.lead("dev", i).over(w).alias(f"d{i}") for i in range(1, 6)],
    )
    g = led.groupBy("t", "mu").agg(
        F.sum(F.round(F.col("dev") * F.col("dev"), 9).cast(d9))
        .cast("double")
        .alias("g0"),
        *[
            F.sum(F.round(F.col("dev") * F.col(f"d{i}"), 9).cast(d9))
            .cast("double")
            .alias(f"g{i}")
            for i in range(1, 6)
        ],
    )
    td = F.col("t").cast("double")
    hac = F.col("g0")
    for i in range(1, 6):
        hac = hac + F.lit(2.0 * (1.0 - i / 6.0)) * F.coalesce(
            F.col(f"g{i}"), F.lit(0.0)
        )
    return g.select(
        F.col("t").cast("long").alias("n_days"),
        F.round(F.col("mu"), 9).alias("daily_mean"),
        F.round(F.sqrt((F.col("g0") / td) / td), 9).alias("se_iid"),
        F.round(
            F.sqrt(F.greatest(hac / td, F.lit(0.0)) / td), 9
        ).alias("se_hac"),
    )


def _qte_oracle() -> str:
    mins = ",\n             ".join(
        f"min(CASE WHEN cum * 100 >= {p} * tot THEN v END) AS q{p}"
        for p in range(10, 100, 10)
    )
    rows = "\nUNION ALL\n".join(
        f"SELECT {p} AS pct, en.q{p} AS q_en, re.q{p} AS q_rest,"
        f" en.q{p} - re.q{p} AS qte FROM en CROSS JOIN re"
        for p in range(10, 100, 10)
    )
    return f"""
    WITH c AS (
      SELECT (lang = 'en') AS f, n_chars AS v, count(*) AS n
      FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL
      GROUP BY 1, 2
    ),
    w AS (
      SELECT f, v, n,
             sum(n) OVER (PARTITION BY f ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(n) OVER (PARTITION BY f) AS tot
      FROM c
    ),
    q AS (
      SELECT f, {mins}
      FROM w GROUP BY f
    ),
    en AS (SELECT * FROM q WHERE f),
    re AS (SELECT * FROM q WHERE NOT f)
    {rows}
    """


@_q("qte_doclen_deciles", _qte_oracle())
def qte_doclen_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile-wise quantile treatment effect of English vs non-English
    document length — WHERE in the distribution the groups differ
    (uniform shift? tail-only?), the distributional readout a single
    mean effect (cohens_d_doclen) or one KS number flattens away.
    Empirical lower quantiles via the integer threshold 100·cum ≥ p·tot
    on the per-group distinct-length axis (no interpolation — engine-
    identical by construction); one count groupBy, two 9-column group
    rows, a 9-row output."""
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("lang").isNotNull()
    )
    c = docs.groupBy(
        (F.col("lang") == "en").alias("f"), F.col("n_chars").alias("v")
    ).agg(F.count(F.lit(1)).alias("n"))
    w_cum = (
        Window.partitionBy("f")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("f")
    w = c.withColumn("cum", F.sum("n").over(w_cum)).withColumn(
        "tot", F.sum("n").over(w_tot)
    )
    pcts = list(range(10, 100, 10))
    q = w.groupBy("f").agg(
        *[
            F.min(
                F.when(
                    F.col("cum") * 100 >= F.lit(p) * F.col("tot"), F.col("v")
                )
            ).alias(f"q{p}")
            for p in pcts
        ]
    )
    stack_expr = "stack({}, {}) as (pct, q)".format(
        len(pcts), ", ".join(f"{p}, q{p}" for p in pcts)
    )
    long = q.select("f", F.expr(stack_expr))
    return (
        long.groupBy("pct")
        .agg(
            F.max(F.when(F.col("f"), F.col("q"))).alias("q_en"),
            F.max(F.when(~F.col("f"), F.col("q"))).alias("q_rest"),
        )
        .select(
            "pct",
            "q_en",
            "q_rest",
            (F.col("q_en") - F.col("q_rest")).alias("qte"),
        )
    )


@_q(
    "ts_kpss_level",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts)::TIMESTAMP AS day,
             CAST(sum(CAST(round(value, 9) AS DECIMAL(28,9))) AS DOUBLE) AS x
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    s AS (
      SELECT count(*) AS t,
             CAST(sum(CAST(round(x, 9) AS DECIMAL(28,9))) AS DOUBLE)
               / count(*) AS mu
      FROM daily
    ),
    d AS (
      SELECT day, x - s.mu AS e,
             sum(x - s.mu) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cs
      FROM daily CROSS JOIN s
    ),
    led AS (
      SELECT e, cs,
             lead(e, 1) OVER (ORDER BY day) AS e1,
             lead(e, 2) OVER (ORDER BY day) AS e2,
             lead(e, 3) OVER (ORDER BY day) AS e3,
             lead(e, 4) OVER (ORDER BY day) AS e4,
             lead(e, 5) OVER (ORDER BY day) AS e5
      FROM d
    ),
    g AS (
      SELECT
        CAST(sum(CAST(round(cs * cs, 9) AS DECIMAL(28,9))) AS DOUBLE) AS ss,
        CAST(sum(CAST(round(e * e, 9) AS DECIMAL(28,9))) AS DOUBLE) AS g0,
        CAST(sum(CAST(round(e * e1, 9) AS DECIMAL(28,9))) AS DOUBLE) AS g1,
        CAST(sum(CAST(round(e * e2, 9) AS DECIMAL(28,9))) AS DOUBLE) AS g2,
        CAST(sum(CAST(round(e * e3, 9) AS DECIMAL(28,9))) AS DOUBLE) AS g3,
        CAST(sum(CAST(round(e * e4, 9) AS DECIMAL(28,9))) AS DOUBLE) AS g4,
        CAST(sum(CAST(round(e * e5, 9) AS DECIMAL(28,9))) AS DOUBLE) AS g5
      FROM led
    )
    SELECT s.t::BIGINT AS n_days,
           round((ss / (s.t * s.t))
                 / nullif((g0 + 2 * ((1 - 1/6.0) * coalesce(g1, 0)
                          + (1 - 2/6.0) * coalesce(g2, 0)
                          + (1 - 3/6.0) * coalesce(g3, 0)
                          + (1 - 4/6.0) * coalesce(g4, 0)
                          + (1 - 5/6.0) * coalesce(g5, 0))) / s.t, 0), 9)
             AS kpss_eta,
           (ss / (s.t * s.t))
             / nullif((g0 + 2 * ((1 - 1/6.0) * coalesce(g1, 0)
                      + (1 - 2/6.0) * coalesce(g2, 0)
                      + (1 - 3/6.0) * coalesce(g3, 0)
                      + (1 - 4/6.0) * coalesce(g4, 0)
                      + (1 - 5/6.0) * coalesce(g5, 0))) / s.t, 0) > 0.463
             AS reject_level_stationary_5pct
    FROM g CROSS JOIN s
    """,
)
def ts_kpss_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity test on the daily value series — the
    COMPLEMENT of ts_dickey_fuller (null = stationary here vs null = unit
    root there; agreeing verdicts from the opposed nulls is the standard
    stationarity protocol).  η = T⁻²·ΣS_t² over the Bartlett long-run
    variance (lag 5 — the same HAC kernel as newey_west_daily_mean);
    0.463 is the 5% level-stationary critical value.  One corpus reduce
    to the day axis; cumulative/lead windows on the bounded axis."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d9 = "decimal(28,9)"
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.round(F.col("value"), 9).cast(d9)).cast("double").alias("x")
    )
    s = daily.agg(
        F.count(F.lit(1)).alias("t"),
        (
            F.sum(F.round(F.col("x"), 9).cast(d9)).cast("double")
            / F.count(F.lit(1))
        ).alias("mu"),
    )
    w = Window.orderBy("day")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = daily.crossJoin(F.broadcast(s)).select(
        "day", "t", (F.col("x") - F.col("mu")).alias("e")
    )
    led = d.select(
        "t",
        "e",
        F.sum("e").over(w_cum).alias("cs"),
        *[F.lead("e", i).over(w).alias(f"e{i}") for i in range(1, 6)],
    )
    g = led.groupBy("t").agg(
        F.sum(F.round(F.col("cs") * F.col("cs"), 9).cast(d9))
        .cast("double")
        .alias("ss"),
        F.sum(F.round(F.col("e") * F.col("e"), 9).cast(d9))
        .cast("double")
        .alias("g0"),
        *[
            F.sum(F.round(F.col("e") * F.col(f"e{i}"), 9).cast(d9))
            .cast("double")
            .alias(f"g{i}")
            for i in range(1, 6)
        ],
    )
    td = F.col("t").cast("double")
    lrv = F.col("g0")
    for i in range(1, 6):
        lrv = lrv + F.lit(2.0 * (1.0 - i / 6.0)) * F.coalesce(
            F.col(f"g{i}"), F.lit(0.0)
        )
    eta = (F.col("ss") / (td * td)) / F.nullif(lrv / td, F.lit(0.0))
    return g.select(
        F.col("t").cast("long").alias("n_days"),
        F.round(eta, 9).alias("kpss_eta"),
        (eta > F.lit(0.463)).alias("reject_level_stationary_5pct"),
    )


@_q(
    "ts_streak_runs",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts)::TIMESTAMP AS day,
             CAST(sum(CAST(round(value, 9) AS DECIMAL(28,9))) AS DOUBLE) AS x
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    med AS (SELECT round(quantile_cont(x, 0.5), 6) AS m FROM daily),
    f AS (
      SELECT day, (x > med.m) AS up,
             row_number() OVER (ORDER BY day)
               - row_number() OVER (PARTITION BY (x > med.m) ORDER BY day)
               AS grp
      FROM daily CROSS JOIN med WHERE x <> med.m
    ),
    runs AS (
      SELECT up, grp, count(*) AS len FROM f GROUP BY 1, 2
    )
    SELECT (SELECT count(*) FROM daily)::BIGINT AS n_days,
           (SELECT m FROM med) AS median,
           count(*)::BIGINT AS n_runs,
           CAST(max(CASE WHEN up THEN len END) AS BIGINT)
             AS longest_above,
           CAST(max(CASE WHEN NOT up THEN len END) AS BIGINT)
             AS longest_below
    FROM runs
    """,
)
def ts_streak_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest daily streaks above/below the series median plus the run
    count — the streak-length readout behind ts_runs_test's z (the z says
    "too few runs"; this says "because of THAT 9-day stretch").  Median
    via the engine percentile rounded to 6 dp (the established
    cross-engine cut); the gaps-and-islands grouping is the standard
    double-row_number difference on the bounded day axis."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d9 = "decimal(28,9)"
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.round(F.col("value"), 9).cast(d9)).cast("double").alias("x")
    )
    med = daily.agg(
        F.round(F.percentile("x", F.lit(0.5)), 6).alias("m"),
        F.count(F.lit(1)).alias("n_days"),
    )
    f = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("x") != F.col("m"))
        .select("day", "n_days", "m", (F.col("x") > F.col("m")).alias("up"))
    )
    w_all = Window.orderBy("day")
    w_up = Window.partitionBy("up").orderBy("day")
    runs = (
        f.withColumn(
            "grp", F.row_number().over(w_all) - F.row_number().over(w_up)
        )
        .groupBy("n_days", "m", "up", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return runs.groupBy("n_days", "m").agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.max(F.when(F.col("up"), F.col("len"))).cast("long").alias(
            "longest_above"
        ),
        F.max(F.when(~F.col("up"), F.col("len"))).cast("long").alias(
            "longest_below"
        ),
    ).select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("m").alias("median"),
        F.col("n_runs").cast("long").alias("n_runs"),
        "longest_above",
        "longest_below",
    )


@_q(
    "ts_approx_entropy",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts)::TIMESTAMP AS day,
             CAST(sum(CAST(round(value, 9) AS DECIMAL(28,9))) AS DOUBLE) AS x
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    s AS (
      SELECT count(*) AS t,
             round(0.2 * sqrt((CAST(sum(CAST(round(x * x, 9)
                      AS DECIMAL(28,9))) AS DOUBLE)
                   - count(*) * pow(CAST(sum(CAST(round(x, 9)
                      AS DECIMAL(28,9))) AS DOUBLE) / count(*), 2))
                   / (count(*) - 1.0)), 9) AS r
      FROM daily
    ),
    v AS (
      SELECT row_number() OVER (ORDER BY day) AS i, x,
             lead(x, 1) OVER (ORDER BY day) AS x1,
             lead(x, 2) OVER (ORDER BY day) AS x2
      FROM daily
    ),
    c2 AS (
      SELECT a.i,
             count(*) AS c
      FROM v a CROSS JOIN v b CROSS JOIN s
      WHERE a.x1 IS NOT NULL AND b.x1 IS NOT NULL
        AND greatest(abs(a.x - b.x), abs(a.x1 - b.x1)) <= s.r
      GROUP BY a.i
    ),
    c3 AS (
      SELECT a.i, count(*) AS c
      FROM v a CROSS JOIN v b CROSS JOIN s
      WHERE a.x2 IS NOT NULL AND b.x2 IS NOT NULL
        AND greatest(abs(a.x - b.x), abs(a.x1 - b.x1),
                     abs(a.x2 - b.x2)) <= s.r
      GROUP BY a.i
    ),
    phi2 AS (
      SELECT CAST(sum(CAST(ln(CAST(c AS DOUBLE) / (s.t - 1))
                      AS DECIMAL(28,12))) AS DOUBLE) / (s.t - 1) AS p
      FROM c2 CROSS JOIN s GROUP BY s.t
    ),
    phi3 AS (
      SELECT CAST(sum(CAST(ln(CAST(c AS DOUBLE) / (s.t - 2))
                      AS DECIMAL(28,12))) AS DOUBLE) / (s.t - 2) AS p
      FROM c3 CROSS JOIN s GROUP BY s.t
    )
    SELECT s.t::BIGINT AS n_days, s.r AS tolerance_r,
           round(phi2.p - phi3.p, 9) AS apen
    FROM s CROSS JOIN phi2 CROSS JOIN phi3
    """,
)
def ts_approx_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate entropy (m=2, r=0.2σ) of the daily value series — the
    regularity/complexity one-number beside spectral entropy
    (ts_spectral_entropy reads the FREQUENCY mix; ApEn reads PATTERN
    repeatability, and is what flags a metronomic-but-nonsinusoidal
    series).  The template self-comparison is a day-axis × day-axis
    product — bounded (~31² pairs), never corpus-sized; counts are exact
    integers and each ln term is 12-dp-quantized before its sum."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d9, d12 = "decimal(28,9)", "decimal(28,12)"
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.round(F.col("value"), 9).cast(d9)).cast("double").alias("x")
    )
    nd = F.count(F.lit(1)).cast("double")
    sx = F.sum(F.round(F.col("x"), 9).cast(d9)).cast("double")
    sq = F.sum(F.round(F.col("x") * F.col("x"), 9).cast(d9)).cast("double")
    s = daily.agg(
        F.count(F.lit(1)).alias("t"),
        F.round(
            F.lit(0.2)
            * F.sqrt((sq - nd * F.pow(sx / nd, 2)) / (nd - F.lit(1.0))),
            9,
        ).alias("r"),
    )
    w = Window.orderBy("day")
    v = daily.select(
        F.row_number().over(w).alias("i"),
        "x",
        F.lead("x", 1).over(w).alias("x1"),
        F.lead("x", 2).over(w).alias("x2"),
    ).crossJoin(F.broadcast(s))
    a = v.select("i", "x", "x1", "x2", "t", "r")
    b = v.select(
        F.col("x").alias("bx"),
        F.col("x1").alias("bx1"),
        F.col("x2").alias("bx2"),
    )

    def _phi(m: int):
        if m == 2:
            cond = (
                F.col("x1").isNotNull()
                & F.col("bx1").isNotNull()
                & (
                    F.greatest(
                        F.abs(F.col("x") - F.col("bx")),
                        F.abs(F.col("x1") - F.col("bx1")),
                    )
                    <= F.col("r")
                )
            )
            denom = F.col("t").cast("double") - 1
        else:
            cond = (
                F.col("x2").isNotNull()
                & F.col("bx2").isNotNull()
                & (
                    F.greatest(
                        F.abs(F.col("x") - F.col("bx")),
                        F.abs(F.col("x1") - F.col("bx1")),
                        F.abs(F.col("x2") - F.col("bx2")),
                    )
                    <= F.col("r")
                )
            )
            denom = F.col("t").cast("double") - 2
        c = (
            a.crossJoin(b)
            .filter(cond)
            .groupBy("i", "t")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        return c.groupBy("t").agg(
            (
                F.sum(
                    F.log(F.col("c").cast("double") / denom).cast(d12)
                ).cast("double")
                / denom
            ).alias(f"p{m}")
        )

    p2, p3 = _phi(2), _phi(3)
    return (
        s.join(F.broadcast(p2), "t")
        .join(F.broadcast(p3), "t")
        .select(
            F.col("t").cast("long").alias("n_days"),
            F.col("r").alias("tolerance_r"),
            F.round(F.col("p2") - F.col("p3"), 9).alias("apen"),
        )
    )


@_q(
    "ts_permutation_entropy",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts)::TIMESTAMP AS day,
             CAST(sum(CAST(round(value, 9) AS DECIMAL(28,9))) AS DOUBLE) AS x
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    v AS (
      SELECT x AS x0,
             lead(x, 1) OVER (ORDER BY day) AS x1,
             lead(x, 2) OVER (ORDER BY day) AS x2
      FROM daily
    ),
    pat AS (
      SELECT array_to_string(
               list_transform(
                 list_sort([{'v': x0, 'i': 0}, {'v': x1, 'i': 1},
                            {'v': x2, 'i': 2}]),
                 s -> s.i::VARCHAR), '') AS p
      FROM v WHERE x2 IS NOT NULL
    ),
    cnt AS (SELECT p, count(*) AS n FROM pat GROUP BY 1),
    tot AS (SELECT sum(n) AS t FROM cnt),
    h AS (
      SELECT CAST(sum(CAST(-(CAST(n AS DOUBLE) / CAST(t AS DOUBLE))
                           * ln(CAST(n AS DOUBLE) / CAST(t AS DOUBLE))
                      AS DECIMAL(28,12))) AS DOUBLE) AS h,
             first(t) AS t,
             count(*) AS n_patterns
      FROM cnt CROSS JOIN tot
    )
    SELECT CAST(t AS BIGINT) AS n_windows,
           n_patterns::BIGINT AS n_patterns,
           round(h, 9) AS h_perm,
           round(h / ln(6.0), 9) AS h_norm
    FROM h
    """,
)
def ts_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bandt-Pompe permutation entropy (order m=3) of the daily value
    series — ordinal-pattern complexity: immune to monotone rescaling and
    cheap enough to run per-series at fleet scale, the third complexity
    axis beside spectral (frequency) and approximate (template) entropy.
    Each window's pattern is the index order after a (value, index)
    struct sort — ties break to temporal order identically in both
    engines; pattern counts are integers; one ln per pattern (≤ 6
    rows)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d9, d12 = "decimal(28,9)", "decimal(28,12)"
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.round(F.col("value"), 9).cast(d9)).cast("double").alias("x")
    )
    w = Window.orderBy("day")
    v = daily.select(
        F.col("x").alias("x0"),
        F.lead("x", 1).over(w).alias("x1"),
        F.lead("x", 2).over(w).alias("x2"),
    ).filter(F.col("x2").isNotNull())
    pat = v.select(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.array(
                        *[
                            F.struct(
                                F.col(f"x{i}").alias("v"),
                                F.lit(i).alias("i"),
                            )
                            for i in range(3)
                        ]
                    )
                ),
                lambda st: st["i"].cast("string"),
            ),
        ).alias("p")
    )
    cnt = pat.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.agg(F.sum("n").alias("t"))
    pr = F.col("n").cast("double") / F.col("t").cast("double")
    h = (
        cnt.crossJoin(F.broadcast(tot))
        .select((-pr * F.log(pr)).cast(d12).alias("_h"), "t")
        .groupBy("t")
        .agg(
            F.sum("_h").cast("double").alias("h"),
            F.count(F.lit(1)).alias("n_patterns"),
        )
    )
    import math as _m

    return h.select(
        F.col("t").cast("long").alias("n_windows"),
        F.col("n_patterns").cast("long").alias("n_patterns"),
        F.round(F.col("h"), 9).alias("h_perm"),
        F.round(F.col("h") / F.lit(_m.log(6.0)), 9).alias("h_norm"),
    )


@_q(
    "ts_date_gaps_audit",
    """
    WITH present AS (
      SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS day
      FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
    ),
    span AS (
      SELECT event_type, count(*) AS n_present,
             (date_diff('day', min(day), max(day)) + 1) AS n_expected
      FROM present GROUP BY 1
    ),
    gaps AS (
      SELECT event_type,
             date_diff('day', day,
                       lead(day) OVER (PARTITION BY event_type
                                       ORDER BY day)) - 1 AS gap
      FROM present
    )
    SELECT s.event_type, s.n_present::BIGINT AS n_present,
           s.n_expected::BIGINT AS n_expected,
           (s.n_expected - s.n_present)::BIGINT AS n_missing,
           CAST(coalesce(max(g.gap), 0) AS BIGINT) AS max_gap_days
    FROM span s LEFT JOIN gaps g USING (event_type)
    GROUP BY 1, 2, 3, 4
    """,
)
def ts_date_gaps_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-completeness audit per event_type: present vs expected
    days over the series' own span, and the largest consecutive hole —
    the data-quality precondition every gap-filling/rollup consumer
    (g3_gap_fill, rollup_incremental_weekly) should check first.  One
    distinct-day reduce; the gap scan is a lead window on the bounded
    per-type day axis."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    present = ev.select(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    span = present.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_present"),
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("n_expected"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    gaps = present.select(
        "event_type",
        (F.datediff(F.lead("day").over(w), F.col("day")) - 1).alias("gap"),
    )
    return (
        span.join(gaps, "event_type", "left")
        .groupBy("event_type", "n_present", "n_expected")
        .agg(
            F.coalesce(F.max("gap"), F.lit(0)).cast("long").alias(
                "max_gap_days"
            )
        )
        .select(
            "event_type",
            F.col("n_present").cast("long").alias("n_present"),
            F.col("n_expected").cast("long").alias("n_expected"),
            (F.col("n_expected") - F.col("n_present"))
            .cast("long")
            .alias("n_missing"),
            "max_gap_days",
        )
    )


@_q(
    "text_char_entropy_by_lang",
    """
    WITH ch AS (
      SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]')) AS c
      FROM documents WHERE lang IS NOT NULL
    ),
    cnt AS (SELECT lang, c, count(*) AS n FROM ch GROUP BY 1, 2),
    tot AS (SELECT lang, sum(n) AS t FROM cnt GROUP BY 1)
    SELECT lang, CAST(t AS BIGINT) AS n_chars,
           count(*)::BIGINT AS n_distinct_chars,
           round(CAST(sum(CAST(-(CAST(n AS DOUBLE) / CAST(t AS DOUBLE))
                          * ln(CAST(n AS DOUBLE) / CAST(t AS DOUBLE))
                     AS DECIMAL(28,12))) AS DOUBLE), 9) AS char_entropy
    FROM cnt JOIN tot USING (lang)
    GROUP BY lang, t
    """,
)
def text_char_entropy_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy per language over the
    [a-z0-9] alphabet — the language-level fingerprint beside the
    per-document compressibility proxy (text_compressibility): a
    language whose corpus char entropy drifts between crawls has a
    changed source mix or an encoding bug.  One char-explode count
    groupBy (bounded 36-symbol axis per lang); ln terms 12-dp-quantized
    before the per-lang sum."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    d12 = "decimal(28,12)"
    ch = docs.select(
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]"), 0)
        ).alias("c"),
    )
    cnt = ch.groupBy("lang", "c").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("lang").agg(F.sum("n").alias("t"))
    pr = F.col("n").cast("double") / F.col("t").cast("double")
    return (
        cnt.join(F.broadcast(tot), "lang")
        .select("lang", "t", (-pr * F.log(pr)).cast(d12).alias("_h"))
        .groupBy("lang", "t")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_chars"),
            F.sum("_h").cast("double").alias("h"),
        )
        .select(
            "lang",
            F.col("t").cast("long").alias("n_chars"),
            F.col("n_distinct_chars").cast("long").alias("n_distinct_chars"),
            F.round(F.col("h"), 9).alias("char_entropy"),
        )
    )


@_q(
    "ngram_novelty_bigram",
    """
    WITH tok AS (
      SELECT doc_id, source,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
      FROM documents WHERE source IS NOT NULL
    ),
    bg AS (
      SELECT DISTINCT doc_id, source,
             ts[i] || ' ' || ts[i + 1] AS b
      FROM tok, (SELECT unnest(range(1, 10000)) AS i) ii
      WHERE i <= len(ts) - 1
    ),
    df AS (SELECT b, count(DISTINCT doc_id) AS nd FROM bg GROUP BY 1),
    per_doc AS (
      SELECT doc_id, source, count(*) AS n_bigrams,
             sum(CASE WHEN nd = 1 THEN 1 ELSE 0 END) AS n_unique
      FROM bg JOIN df USING (b) GROUP BY 1, 2
    )
    SELECT source, count(*)::BIGINT AS n_docs,
           CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
           CAST(sum(n_unique) AS BIGINT) AS n_unique,
           round(CAST(sum(n_unique) AS DOUBLE)
                 / nullif(CAST(sum(n_bigrams) AS DOUBLE), 0), 9)
             AS novelty_rate
    FROM per_doc GROUP BY 1
    """,
)
def ngram_novelty_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source bigram novelty: the share of (doc, distinct-bigram)
    occurrences whose bigram appears in NO other document — the
    cross-document originality readout between exact dedup (identical
    docs) and the boilerplate trigram profile (shared phrases): a source
    whose novelty collapses is templating.  Plan: distinct per-doc
    bigrams (row-local explode + distinct), one bigram-keyed
    document-frequency groupBy, a semi-join back — all shuffles on the
    bigram axis, integer counts throughout."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("source").isNotNull())
    toks = F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)
    bg = (
        docs.select(
            "doc_id",
            "source",
            F.explode(
                F.when(F.size(toks) >= 2,
                    F.transform(
                        F.slice(toks, 1, F.size(toks) - 1),
                        lambda t, i: F.concat_ws(
                            " ", t, F.element_at(toks, i + 2)
                        ),
                    )
                ).otherwise(F.array().cast("array<string>"))
            ).alias("b"),
        )
        .distinct()
    )
    df = bg.groupBy("b").agg(F.count_distinct("doc_id").alias("nd"))
    per_doc = (
        bg.join(df, "b")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum((F.col("nd") == 1).cast("long")).alias("n_unique"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_bigrams").cast("long").alias("n_bigrams"),
        F.sum("n_unique").cast("long").alias("n_unique"),
        F.round(
            F.try_divide(
                F.sum("n_unique").cast("double"),
                F.sum("n_bigrams").cast("double"),
            ),
            9,
        ).alias("novelty_rate"),
    )


@_q(
    "word_len_profile_by_lang",
    """
    WITH w AS (
      SELECT lang, length(unnest(regexp_extract_all(lower(text),
                                                    '[a-z0-9]+'))) AS l
      FROM documents WHERE lang IS NOT NULL
    ),
    c AS (SELECT lang, l, count(*) AS n FROM w GROUP BY 1, 2),
    cw AS (
      SELECT lang, l, n,
             sum(n) OVER (PARTITION BY lang ORDER BY l
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(n) OVER (PARTITION BY lang) AS tot
      FROM c
    )
    SELECT lang, CAST(max(tot) AS BIGINT) AS n_words,
           round(CAST(sum(CAST(l * n AS DECIMAL(28,0))) AS DOUBLE)
                 / max(tot), 9) AS mean_len,
           CAST(min(CASE WHEN cum * 2 >= tot THEN l END) AS BIGINT) AS p50_len,
           CAST(min(CASE WHEN cum * 10 >= 9 * tot THEN l END) AS BIGINT)
             AS p90_len,
           CAST(max(l) AS BIGINT) AS max_len
    FROM cw GROUP BY lang
    """,
)
def word_len_profile_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-length distribution per language (mean, median, p90, max) —
    the morphology fingerprint that separates agglutinative from analytic
    languages and catches tokenizer-breaking garbage (a lang whose p90
    word length doubles grew URLs or concatenation noise).  One
    length-count groupBy to the bounded (lang × distinct-length) axis;
    integer-threshold percentiles, exact integer length sums."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    w = docs.select(
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)
        ).alias("tok"),
    ).select("lang", F.length("tok").alias("l"))
    c = w.groupBy("lang", "l").agg(F.count(F.lit(1)).alias("n"))
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("l")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("lang")
    cw = c.withColumn("cum", F.sum("n").over(w_cum)).withColumn(
        "tot", F.sum("n").over(w_tot)
    )
    return cw.groupBy("lang").agg(
        F.max("tot").cast("long").alias("n_words"),
        F.round(
            F.sum((F.col("l") * F.col("n")).cast("decimal(28,0)"))
            .cast("double")
            / F.max("tot"),
            9,
        ).alias("mean_len"),
        F.min(F.when(F.col("cum") * 2 >= F.col("tot"), F.col("l")))
        .cast("long")
        .alias("p50_len"),
        F.min(F.when(F.col("cum") * 10 >= 9 * F.col("tot"), F.col("l")))
        .cast("long")
        .alias("p90_len"),
        F.max("l").cast("long").alias("max_len"),
    )


@_q(
    "text_oov_rate_by_source",
    """
    WITH tok AS (
      SELECT source,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM documents WHERE source IS NOT NULL
    ),
    vocab AS (
      SELECT w FROM (
        SELECT w, count(*) AS n,
               row_number() OVER (ORDER BY count(*) DESC, w ASC) AS rn
        FROM tok GROUP BY w
      ) WHERE rn <= 1000
    )
    SELECT source, count(*)::BIGINT AS n_tokens,
           sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
           round(CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 9) AS oov_rate
    FROM tok t LEFT JOIN vocab v ON t.w = v.w
    GROUP BY source
    """,
)
def text_oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per source against the corpus' own top-1000
    vocabulary (count desc, token asc — a deterministic cut): the
    domain-shift readout a tokenizer/embedding budget planner needs
    (sources full of tokens the shared vocab misses cost long
    tokenizations and unknown embeddings).  One token-count groupBy
    builds the vocab (broadcast back); one left join marks OOV; integer
    counts to one ratio."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("source").isNotNull())
    tok = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)
        ).alias("w"),
    )
    w_rn = Window.orderBy(F.desc("n"), F.asc("w"))
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(w_rn))
        .filter(F.col("rn") <= 1000)
        .select("w", F.lit(True).alias("_in"))
    )
    return (
        tok.join(F.broadcast(vocab), "w", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.col("_in").isNull().cast("long"))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens"), 9
            ).alias("oov_rate"),
        )
    )


@_q(
    "text_sentence_stats",
    """
    WITH d AS (
      SELECT lang,
             list_filter(list_transform(regexp_split_to_array(text,
                                                              '[.!?]+'),
                                        s -> trim(s)),
                         s -> s <> '') AS sents
      FROM documents WHERE lang IS NOT NULL
    ),
    per AS (
      SELECT lang, len(sents) AS ns,
             CAST(list_sum(list_transform(sents, s -> length(s)))
                  AS BIGINT) AS chars
      FROM d
    )
    SELECT lang, count(*)::BIGINT AS n_docs,
           CAST(sum(ns) AS BIGINT) AS n_sentences,
           round(CAST(sum(ns) AS DOUBLE) / count(*), 9)
             AS sentences_per_doc,
           round(CAST(sum(chars) AS DOUBLE) / nullif(sum(ns), 0), 9)
             AS chars_per_sentence
    FROM per GROUP BY lang
    """,
)
def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation profile per language ([.!?]+ boundaries):
    sentences per document and characters per sentence — the
    document-structure axis the word/char profiles miss (run-on spam has
    few giant sentences; listicles have many tiny ones).  Entirely
    row-local splits; one integer-sum groupBy on the lang axis."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    sents = F.filter(
        F.transform(F.split("text", "[.!?]+"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    per = docs.select(
        "lang",
        F.size(sents).alias("ns"),
        F.coalesce(
            F.aggregate(
                sents,
                F.lit(0).cast("long"),
                lambda acc, s: acc + F.length(s).cast("long"),
            ),
            F.lit(0).cast("long"),
        ).alias("chars"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ns").cast("long").alias("n_sentences"),
        F.round(
            F.sum("ns").cast("double") / F.count(F.lit(1)), 9
        ).alias("sentences_per_doc"),
        F.round(
            F.try_divide(
                F.sum("chars").cast("double"), F.sum("ns").cast("double")
            ),
            9,
        ).alias("chars_per_sentence"),
    )


@_q(
    "text_readability_fk",
    """
    WITH d AS (
      SELECT doc_id, lang,
             greatest(1, len(list_filter(
               list_transform(regexp_split_to_array(text, '[.!?]+'),
                              s -> trim(s)),
               s -> s <> ''))) AS ns,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents WHERE lang IS NOT NULL
    ),
    syl AS (
      SELECT doc_id, lang, ns,
             greatest(1, len(regexp_extract_all(unnest(toks),
                                                '[aeiouy]+'))) AS sy
      FROM d
    ),
    per_doc AS (
      SELECT doc_id, any_value(lang) AS lang, any_value(ns) AS ns,
             count(*) AS nw, CAST(sum(sy) AS BIGINT) AS nsy
      FROM syl GROUP BY doc_id
    )
    SELECT lang, count(*)::BIGINT AS n_docs,
           CAST(sum(nw) AS BIGINT) AS n_words,
           CAST(sum(ns) AS BIGINT) AS n_sentences,
           CAST(sum(nsy) AS BIGINT) AS n_syllables,
           round(0.39 * (CAST(sum(nw) AS DOUBLE) / sum(ns))
                 + 11.8 * (CAST(sum(nsy) AS DOUBLE) / sum(nw)) - 15.59, 9)
             AS fk_grade
    FROM per_doc GROUP BY lang
    """,
)
def text_readability_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade level per language — the readability axis of
    the quality stack (text_quality_scores reads surface ratios; FK reads
    words-per-sentence × syllables-per-word, the curriculum-filter signal
    education-grade corpora select on).  Syllables via vowel-group counts
    (min 1/word, both engines same regex); sentence counts floored at 1;
    ALL-INTEGER sums to the lang axis, one double formula at the end."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    sents = F.filter(
        F.transform(F.split("text", "[.!?]+"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    toks = F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)
    per_doc = docs.select(
        "lang",
        F.greatest(F.lit(1), F.size(sents)).cast("long").alias("ns"),
        F.size(toks).cast("long").alias("nw"),
        F.coalesce(
            F.aggregate(
                toks,
                F.lit(0).cast("long"),
                lambda acc, t: acc
                + F.greatest(
                    F.lit(1),
                    F.size(
                        F.regexp_extract_all(t, F.lit("[aeiouy]+"), 0)
                    ),
                ).cast("long"),
            ),
            F.lit(0).cast("long"),
        ).alias("nsy"),
    ).filter(F.col("nw") > 0)
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nw").cast("long").alias("n_words"),
        F.sum("ns").cast("long").alias("n_sentences"),
        F.sum("nsy").cast("long").alias("n_syllables"),
        F.round(
            F.lit(0.39)
            * (F.sum("nw").cast("double") / F.sum("ns"))
            + F.lit(11.8) * (F.sum("nsy").cast("double") / F.sum("nw"))
            - F.lit(15.59),
            9,
        ).alias("fk_grade"),
    )


@_q(
    "emb_hubness_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 100),
    pairs AS (
      SELECT q.query_id, c.vec_id, {_DUCK_COSINE} AS score
      FROM embeddings c, q WHERE c.vec_id != q.query_id
    ), ranked AS (
      SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id ASC) AS rank
      FROM pairs
    ), occ AS (
      SELECT vec_id, count(*) AS n5
      FROM ranked WHERE rank <= 5 GROUP BY vec_id
    )
    SELECT vec_id AS hub_id, n5::BIGINT AS n5, rk::INTEGER AS hub_rank
    FROM (
      SELECT vec_id, n5,
             row_number() OVER (ORDER BY n5 DESC, vec_id ASC) AS rk
      FROM occ
    ) WHERE rk <= 20
    """,
)
def emb_hubness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit: the 20 most frequent members of the 100 probe
    queries' top-5 neighbor lists (k-occurrence N₅) — high-dimensional
    hubs are the vectors that pollute EVERY ANN answer; a heavy hub tail
    is the standard symptom of unnormalized or anisotropic embeddings
    (the actionable companion to emb_isotropy).  One brute scoring pass
    over (probes × corpus) — probe count fixed, so the scan is linear in
    the corpus like ann_cosine_topk — then a neighbor-keyed integer
    count."""
    from ..operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    topk = cosine_topk(emb, emb.filter(F.col("vec_id") < 100), k=5)
    occ = topk.groupBy("neighbor_id").agg(F.count(F.lit(1)).alias("n5"))
    w = Window.orderBy(F.desc("n5"), F.asc("neighbor_id"))
    return (
        occ.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select(
            F.col("neighbor_id").alias("hub_id"),
            F.col("n5").cast("long").alias("n5"),
            F.col("rk").cast("int").alias("hub_rank"),
        )
    )


@_q(
    "emb_cell_balance",
    """
    WITH c AS (
      SELECT label, count(*) AS n FROM embeddings
      WHERE label IS NOT NULL GROUP BY 1
    ),
    t AS (SELECT sum(n) AS tot, count(*) AS k, max(n) AS mx FROM c)
    SELECT k::BIGINT AS n_cells, CAST(tot AS BIGINT) AS n_vectors,
           CAST(mx AS BIGINT) AS max_cell,
           round(CAST(mx AS DOUBLE) / (CAST(tot AS DOUBLE) / k), 9)
             AS imbalance,
           round(CAST(sum(CAST(-(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
                          * ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
                     AS DECIMAL(28,12))) AS DOUBLE) / ln(CAST(k AS DOUBLE)), 9)
             AS balance_entropy
    FROM c CROSS JOIN t
    GROUP BY k, tot, mx
    """,
)
def emb_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF routing-cell balance: size imbalance (max cell / mean cell)
    and normalized size entropy over the label cells — at 100 TB a hot
    cell IS a hot partition: every probe routed there scans it, so this
    one-row audit is the capacity-planning readout behind ann_ivf_topk /
    ann_ivf_multiprobe (balanced cells ⇒ probes cost ~corpus/k each).
    One cell-count groupBy; entropy terms 12-dp-quantized on the k-row
    axis."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("label").isNotNull())
    d12 = "decimal(28,12)"
    c = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(
        F.sum("n").alias("tot"),
        F.count(F.lit(1)).alias("k"),
        F.max("n").alias("mx"),
    )
    pr = F.col("n").cast("double") / F.col("tot").cast("double")
    return (
        c.crossJoin(F.broadcast(t))
        .select("k", "tot", "mx", (-pr * F.log(pr)).cast(d12).alias("_h"))
        .groupBy("k", "tot", "mx")
        .agg(F.sum("_h").cast("double").alias("h"))
        .select(
            F.col("k").cast("long").alias("n_cells"),
            F.col("tot").cast("long").alias("n_vectors"),
            F.col("mx").cast("long").alias("max_cell"),
            F.round(
                F.col("mx").cast("double")
                / (F.col("tot").cast("double") / F.col("k")),
                9,
            ).alias("imbalance"),
            F.round(
                F.col("h") / F.log(F.col("k").cast("double")), 9
            ).alias("balance_entropy"),
        )
    )


@_q(
    "emb_nn_margin",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 50),
    pairs AS (
      SELECT q.query_id, c.vec_id, {_DUCK_COSINE} AS score
      FROM embeddings c, q WHERE c.vec_id != q.query_id
    ), ranked AS (
      SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id ASC) AS rank
      FROM pairs
    )
    SELECT query_id,
           max(CASE WHEN rank = 1 THEN vec_id END) AS nn1_id,
           max(CASE WHEN rank = 1 THEN score END) AS sim1,
           max(CASE WHEN rank = 2 THEN score END) AS sim2,
           round(max(CASE WHEN rank = 1 THEN score END)
                 - max(CASE WHEN rank = 2 THEN score END), 9) AS margin
    FROM ranked WHERE rank <= 2 GROUP BY query_id
    """,
)
def emb_nn_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor confidence margin per probe query: top-1 minus
    top-2 cosine — the per-query ambiguity readout (margin ≈ 0 means the
    ANN answer is a coin flip and quantization/probe errors will flip it;
    exactly the queries ann_quantized_rescore and multi-probe exist for).
    Brute top-2 over (probes × corpus) with the deterministic
    (score desc, id asc) rank; a 2-row pivot per query."""
    from ..operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    top2 = cosine_topk(emb, emb.filter(F.col("vec_id") < 50), k=2)
    return top2.groupBy("query_id").agg(
        F.max(F.when(F.col("rank") == 1, F.col("neighbor_id"))).alias(
            "nn1_id"
        ),
        F.max(F.when(F.col("rank") == 1, F.col("score"))).alias("sim1"),
        F.max(F.when(F.col("rank") == 2, F.col("score"))).alias("sim2"),
        F.round(
            F.max(F.when(F.col("rank") == 1, F.col("score")))
            - F.max(F.when(F.col("rank") == 2, F.col("score"))),
            9,
        ).alias("margin"),
    )


@_q(
    "emb_exact_dup_vectors",
    """
    WITH g AS (
      SELECT embedding, count(*) AS sz, min(vec_id) AS rep
      FROM embeddings GROUP BY embedding
    )
    SELECT count(*)::BIGINT AS n_distinct,
           CAST(sum(sz) AS BIGINT) AS n_vectors,
           sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_groups,
           CAST(sum(CASE WHEN sz > 1 THEN sz ELSE 0 END) AS BIGINT)
             AS n_dup_vectors,
           CAST(max(sz) AS BIGINT) AS largest_group
    FROM g
    """,
)
def emb_exact_dup_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-identical embedding collapse audit: group the corpus BY THE
    VECTOR ITSELF and count duplicate groups — identical embeddings for
    different items mean an encoder bug, a default-vector fallback, or
    upstream content dup that exact text dedup missed; any of them
    silently corrupts ANN ground truth and centroid stats.  One groupBy
    on the array column (exact binary float equality — no tolerance, no
    formatting); integer summary row."""
    emb = _t(spark, sf_dir, "embeddings")
    g = emb.groupBy("embedding").agg(
        F.count(F.lit(1)).alias("sz"), F.min("vec_id").alias("rep")
    )
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum("sz").cast("long").alias("n_vectors"),
        F.sum((F.col("sz") > 1).cast("long")).cast("long").alias(
            "n_dup_groups"
        ),
        F.sum(F.when(F.col("sz") > 1, F.col("sz")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_dup_vectors"),
        F.max("sz").cast("long").alias("largest_group"),
    )


@_q(
    "attribution_position_based",
    """
    WITH conv AS (
      SELECT user_id, min(ts) AS cts FROM events
      WHERE event_type = 'purchase' GROUP BY 1
    ),
    touch AS (
      SELECT e.user_id, e.event_type AS ty, e.ts, e.event_id
      FROM events e JOIN conv USING (user_id)
      WHERE e.event_type IN ('view', 'click') AND e.ts < conv.cts
        AND epoch_us(conv.cts::TIMESTAMP) // 1000000
            - epoch_us(e.ts::TIMESTAMP) // 1000000 <= 604800
    ),
    pos AS (
      SELECT user_id, ty,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS nt
      FROM touch
    ),
    wtd AS (
      SELECT user_id, ty,
             CASE WHEN nt = 1 THEN 1.0
                  WHEN nt = 2 THEN 0.5
                  WHEN rn = 1 OR rn = nt THEN 0.4
                  ELSE round(0.2 / (nt - 2), 9) END AS w
      FROM pos
    )
    SELECT ty AS event_type,
           count(DISTINCT user_id)::BIGINT AS conversions,
           count(*)::BIGINT AS touches,
           round(sum(CAST(w AS DECIMAL(28,9)))::DOUBLE, 9) AS credit
    FROM wtd GROUP BY 1
    """,
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped, 40/20/40) multi-touch attribution over
    the same conversion window as attribution_time_decay: first and last
    touch get 40% each, the middle splits 20% — the model that credits
    discovery AND closing, completing the attribution family
    (last-touch / time-decay / position).  One purchase-anchor reduce,
    one user-keyed position window, integer-derived 9-dp weights summed
    in decimal."""
    ev = _t(spark, sf_dir, "events")
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("cts"))
    )
    touch = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .join(conv, "user_id")
        .filter(
            (F.col("ts") < F.col("cts"))
            & (
                F.unix_timestamp("cts") - F.unix_timestamp("ts")
                <= F.lit(604800)
            )
        )
        .select("user_id", F.col("event_type").alias("ty"), "ts", "event_id")
    )
    w_pos = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_n = Window.partitionBy("user_id")
    pos = touch.select(
        "user_id",
        "ty",
        F.row_number().over(w_pos).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("nt"),
    )
    w = (
        F.when(F.col("nt") == 1, F.lit(1.0))
        .when(F.col("nt") == 2, F.lit(0.5))
        .when(
            (F.col("rn") == 1) | (F.col("rn") == F.col("nt")), F.lit(0.4)
        )
        .otherwise(F.round(F.lit(0.2) / (F.col("nt") - 2), 9))
    )
    return pos.select("user_id", "ty", w.alias("w")).groupBy("ty").agg(
        F.count_distinct("user_id").cast("long").alias("conversions"),
        F.count(F.lit(1)).cast("long").alias("touches"),
        F.round(
            F.sum(F.col("w").cast("decimal(28,9)")).cast("double"), 9
        ).alias("credit"),
    ).withColumnRenamed("ty", "event_type")


@_q(
    "cohort_stickiness_dau_mau",
    """
    WITH first_seen AS (
      SELECT user_id, date_trunc('month', min(ts))::TIMESTAMP AS cohort
      FROM events WHERE user_id IS NOT NULL GROUP BY 1
    ),
    act AS (
      SELECT f.cohort, date_trunc('month', e.ts)::TIMESTAMP AS month,
             date_trunc('day', e.ts)::TIMESTAMP AS day, e.user_id
      FROM events e JOIN first_seen f USING (user_id)
    ),
    dau AS (
      SELECT cohort, month, day, count(DISTINCT user_id) AS dau
      FROM act GROUP BY 1, 2, 3
    ),
    mau AS (
      SELECT cohort, month, count(DISTINCT user_id) AS mau
      FROM act GROUP BY 1, 2
    )
    SELECT d.cohort, d.month, max(m.mau)::BIGINT AS mau,
           count(*)::BIGINT AS n_active_days,
           round(CAST(sum(d.dau) AS DOUBLE) / count(*), 9) AS avg_dau,
           round(CAST(sum(d.dau) AS DOUBLE) / count(*) / max(m.mau), 9)
             AS stickiness
    FROM dau d JOIN mau m ON d.cohort = m.cohort AND d.month = m.month
    GROUP BY 1, 2
    """,
)
def cohort_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per signup cohort per calendar month — the
    engagement-quality readout beside retention_weekly's binary
    comeback: of the users a cohort retains, how many of its active days
    does each show up (avg daily actives / monthly actives)?  Exact
    distinct counts (the sketch path is dau_wau_sketch_rollup); two
    bounded groupBys over (cohort, month[, day])."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).alias("cohort")
    )
    act = ev.join(first_seen, "user_id").select(
        "cohort",
        F.date_trunc("month", "ts").alias("month"),
        F.date_trunc("day", "ts").alias("day"),
        "user_id",
    )
    dau = act.groupBy("cohort", "month", "day").agg(
        F.count_distinct("user_id").alias("dau")
    )
    mau = act.groupBy("cohort", "month").agg(
        F.count_distinct("user_id").alias("mau")
    )
    return (
        dau.join(mau, ["cohort", "month"])
        .groupBy("cohort", "month")
        .agg(
            F.max("mau").cast("long").alias("mau"),
            F.count(F.lit(1)).cast("long").alias("n_active_days"),
            F.round(
                F.sum("dau").cast("double") / F.count(F.lit(1)), 9
            ).alias("avg_dau"),
            F.round(
                F.sum("dau").cast("double")
                / F.count(F.lit(1))
                / F.max("mau"),
                9,
            ).alias("stickiness"),
        )
    )


@_q(
    "session_depth_deciles",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts::TIMESTAMP) // 1000000
                    - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                               ::TIMESTAMP) // 1000000 > 1800
                    OR lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM events WHERE user_id IS NOT NULL
    ),
    s AS (
      SELECT user_id,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    ),
    depth AS (
      SELECT user_id, sid, count(*) AS d FROM s GROUP BY 1, 2
    ),
    c AS (SELECT d, count(*) AS n FROM depth GROUP BY 1),
    w AS (
      SELECT d, n,
             sum(n) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum,
             sum(n) OVER () AS tot
      FROM c
    ),
    q AS (
      SELECT p.pct,
             min(CASE WHEN cum * 100 >= p.pct * tot THEN d END) AS depth
      FROM w CROSS JOIN (SELECT unnest([10,20,30,40,50,60,70,80,90,100])
                         AS pct) p
      GROUP BY p.pct
    )
    SELECT pct::INTEGER AS pct, CAST(depth AS BIGINT) AS depth,
           (SELECT CAST(sum(n) AS BIGINT) FROM c) AS n_sessions
    FROM q
    """,
)
def session_depth_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-depth distribution deciles (events per 30-min-gap session)
    — the engagement-shape readout on top of o6_session_windows'
    sessionization: a product whose p90 depth is 2 has a bounce problem
    no mean hides.  User-keyed gap windows (never a global sort), one
    depth-count reduce, integer-threshold deciles on the bounded
    distinct-depth axis."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = w_u.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w_u).isNull()
            | (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w_u))
                > 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    s = g.select("user_id", F.sum("brk").over(w_cum).alias("sid"))
    depth = s.groupBy("user_id", "sid").agg(F.count(F.lit(1)).alias("d"))
    c = depth.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    w_c = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_t = Window.orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wdf = c.withColumn("cum", F.sum("n").over(w_c)).withColumn(
        "tot", F.sum("n").over(Window.partitionBy())
    )
    pcts = spark.range(1, 11).select(
        (F.col("id") * 10).cast("int").alias("pct")
    )
    q = (
        wdf.crossJoin(F.broadcast(pcts))
        .groupBy("pct")
        .agg(
            F.min(
                F.when(
                    F.col("cum") * 100 >= F.col("pct") * F.col("tot"),
                    F.col("d"),
                )
            )
            .cast("long")
            .alias("depth"),
            F.max("tot").cast("long").alias("n_sessions"),
        )
    )
    return q.select("pct", "depth", "n_sessions")


@_q(
    "purchase_interval_stats",
    """
    WITH p AS (
      SELECT user_id, ts, event_id,
             epoch_us(ts::TIMESTAMP) // 1000000
               - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                          ::TIMESTAMP) // 1000000 AS gap
      FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
    ),
    gaps AS (SELECT user_id, gap FROM p WHERE gap IS NOT NULL),
    c AS (SELECT gap, count(*) AS n FROM gaps GROUP BY 1),
    w AS (
      SELECT gap, n,
             sum(n) OVER (ORDER BY gap ROWS UNBOUNDED PRECEDING) AS cum,
             sum(n) OVER () AS tot
      FROM c
    )
    SELECT (SELECT count(DISTINCT user_id) FROM gaps)::BIGINT
             AS n_repeat_buyers,
           CAST(max(tot) AS BIGINT) AS n_intervals,
           round(CAST((SELECT sum(CAST(gap AS DECIMAL(28,0))) FROM gaps)
                      AS DOUBLE) / max(tot) / 3600.0, 9) AS mean_gap_hours,
           CAST(min(CASE WHEN cum * 2 >= tot THEN gap END) AS BIGINT)
             AS p50_gap_sec,
           CAST(min(CASE WHEN cum * 10 >= 9 * tot THEN gap END) AS BIGINT)
             AS p90_gap_sec
    FROM w
    """,
)
def purchase_interval_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: the distribution of seconds between a
    user's consecutive purchases (mean hours, median and p90 seconds) —
    the replenishment-cycle readout behind customer_order_frequency's
    counts, and the empirical prior a "winback after X days" campaign
    needs.  User-keyed lag windows; exact integer second gaps; decimal
    mean; integer-threshold percentiles on the distinct-gap axis."""
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    )
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts").over(w_u))
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    stats = gaps.agg(
        F.count_distinct("user_id").alias("nu"),
        F.sum(F.col("gap").cast("decimal(28,0)")).alias("sg"),
    )
    c = gaps.groupBy("gap").agg(F.count(F.lit(1)).alias("n"))
    w_c = Window.orderBy("gap").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w = c.withColumn("cum", F.sum("n").over(w_c)).withColumn(
        "tot", F.sum("n").over(Window.partitionBy())
    )
    agg = w.agg(
        F.max("tot").cast("long").alias("n_intervals"),
        F.min(F.when(F.col("cum") * 2 >= F.col("tot"), F.col("gap")))
        .cast("long")
        .alias("p50_gap_sec"),
        F.min(
            F.when(F.col("cum") * 10 >= 9 * F.col("tot"), F.col("gap"))
        )
        .cast("long")
        .alias("p90_gap_sec"),
    )
    return agg.crossJoin(F.broadcast(stats)).select(
        F.col("nu").cast("long").alias("n_repeat_buyers"),
        "n_intervals",
        F.round(
            F.col("sg").cast("double") / F.col("n_intervals") / 3600.0, 9
        ).alias("mean_gap_hours"),
        "p50_gap_sec",
        "p90_gap_sec",
    )


@_q(
    "orders_backlog_aging",
    """
    SELECT o_orderstatus,
           CASE WHEN age <= 30 THEN '00-030'
                WHEN age <= 90 THEN '031-090'
                WHEN age <= 180 THEN '091-180'
                ELSE '180+' END AS age_band,
           count(*)::BIGINT AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_value
    FROM (
      SELECT o_orderstatus, o_totalprice,
             date_diff('day', o_orderdate,
                       TIMESTAMP '2024-06-01 00:00:00') AS age
      FROM orders WHERE o_orderdate <= TIMESTAMP '2024-06-01 00:00:00'
    )
    GROUP BY 1, 2
    """,
)
def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-backlog aging report at a fixed snapshot (2024-06-01):
    order count and exact decimal value per (status, age band) — the
    operational WIP readout behind q4's priority counts: how much value
    sits HOW OLD in each state.  One scan, row-local banding, a
    (3 status × 4 band) groupBy with exact decimal value sums."""
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") <= F.lit("2024-06-01 00:00:00")
    )
    age = F.datediff(F.lit("2024-06-01").cast("date"), F.col("o_orderdate"))
    band = (
        F.when(age <= 30, "00-030")
        .when(age <= 90, "031-090")
        .when(age <= 180, "091-180")
        .otherwise("180+")
    )
    return o.groupBy("o_orderstatus", band.alias("age_band")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias(
            "total_value"
        ),
    )


@_q(
    "nation_trade_balance",
    """
    WITH sup AS (
      SELECT s.s_nationkey AS nk,
             sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS rev
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1
    ),
    cust AS (
      SELECT c.c_nationkey AS nk,
             sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS spend
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1
    )
    SELECT n.n_name AS nation,
           CAST(coalesce(sup.rev, 0) AS DOUBLE) AS supply_revenue,
           CAST(coalesce(cust.spend, 0) AS DOUBLE) AS demand_spend,
           CAST(coalesce(sup.rev, 0) - coalesce(cust.spend, 0) AS DOUBLE)
             AS trade_balance
    FROM nation n
    LEFT JOIN sup ON n.n_nationkey = sup.nk
    LEFT JOIN cust ON n.n_nationkey = cust.nk
    """,
)
def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation trade balance: supply-side revenue (lineitem through
    its supplier's nation) vs demand-side spend (orders through the
    customer's nation) — the two-sided rollup q7's bilateral volume
    never totals.  Both fact scans aggregate BEFORE the tiny nation
    dim joins (broadcast); money stays decimal until the output cast;
    difference computed in decimal so the balance is exact."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        li.join(
            F.broadcast(sup.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == sup.s_suppkey,
        )
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(3,2)"))
            ).alias("rev")
        )
    )
    spend = (
        o.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            o.o_custkey == cust.c_custkey,
        )
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend"))
    )
    zero = F.lit(0).cast("decimal(38,4)")
    return (
        nation.join(rev, nation.n_nationkey == rev.nk, "left")
        .drop("nk")
        .join(spend, nation.n_nationkey == spend.nk, "left")
        .select(
            F.col("n_name").alias("nation"),
            F.coalesce(F.col("rev").cast("decimal(38,4)"), zero)
            .cast("double")
            .alias("supply_revenue"),
            F.coalesce(F.col("spend").cast("decimal(38,4)"), zero)
            .cast("double")
            .alias("demand_spend"),
            (
                F.coalesce(F.col("rev").cast("decimal(38,4)"), zero)
                - F.coalesce(F.col("spend").cast("decimal(38,4)"), zero)
            )
            .cast("double")
            .alias("trade_balance"),
        )
    )


@_q(
    "order_value_band_mix_monthly",
    """
    WITH b AS (
      SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS month,
             CASE WHEN o_totalprice < 1000 THEN '0-1k'
                  WHEN o_totalprice < 5000 THEN '1k-5k'
                  WHEN o_totalprice < 20000 THEN '5k-20k'
                  WHEN o_totalprice < 100000 THEN '20k-100k'
                  ELSE '100k+' END AS band,
             count(*) AS n
      FROM orders GROUP BY 1, 2
    ),
    m AS (SELECT month, sum(n) AS nm FROM b GROUP BY 1),
    t AS (SELECT band, sum(n) AS nb FROM b GROUP BY 1),
    tot AS (SELECT sum(n) AS n FROM b)
    SELECT b.month, b.band, b.n::BIGINT AS n_orders,
           round(CAST(b.n AS DOUBLE) / m.nm, 9) AS share_in_month,
           round(CAST(t.nb AS DOUBLE) / tot.n, 9) AS share_overall,
           round((CAST(b.n AS DOUBLE) / m.nm)
                 / (CAST(t.nb AS DOUBLE) / tot.n), 9) AS mix_lift
    FROM b JOIN m USING (month) JOIN t USING (band) CROSS JOIN tot
    """,
)
def order_value_band_mix_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order-value-band mix shift: each (month, price band)'s
    share against the band's all-time share, as a lift ratio — the
    mix-shift monitor that separates "AOV fell" into "band shares moved"
    vs "prices moved within bands".  One banded count groupBy; marginals
    on the bounded (month × 5-band) table; integer counts to three
    rounded ratios."""
    o = _t(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 1000, "0-1k")
        .when(F.col("o_totalprice") < 5000, "1k-5k")
        .when(F.col("o_totalprice") < 20000, "5k-20k")
        .when(F.col("o_totalprice") < 100000, "20k-100k")
        .otherwise("100k+")
    )
    b = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month"),
        band.alias("band"),
    ).agg(F.count(F.lit(1)).alias("n"))
    m = b.groupBy("month").agg(F.sum("n").alias("nm"))
    t = b.groupBy("band").agg(F.sum("n").alias("nb"))
    tot = b.agg(F.sum("n").alias("ntot"))
    sm = F.col("n").cast("double") / F.col("nm")
    so = F.col("nb").cast("double") / F.col("ntot")
    return (
        b.join(F.broadcast(m), "month")
        .join(F.broadcast(t), "band")
        .crossJoin(F.broadcast(tot))
        .select(
            "month",
            "band",
            F.col("n").cast("long").alias("n_orders"),
            F.round(sm, 9).alias("share_in_month"),
            F.round(so, 9).alias("share_overall"),
            F.round(sm / so, 9).alias("mix_lift"),
        )
    )


@_q(
    "event_partition_skew",
    """
    WITH c AS (
      SELECT date_trunc('day', ts)::TIMESTAMP AS day, event_type,
             count(*) AS n
      FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
    ),
    s AS (
      SELECT count(*) AS k, sum(n) AS tot, max(n) AS mx,
             CAST(sum(CAST(n * n AS DECIMAL(28,0))) AS DOUBLE) AS sq
      FROM c
    ),
    top1 AS (
      SELECT day, event_type, n FROM c
      ORDER BY n DESC, day ASC, event_type ASC LIMIT 1
    )
    SELECT s.k::BIGINT AS n_keys, CAST(s.tot AS BIGINT) AS n_rows,
           CAST(s.mx AS BIGINT) AS max_key_rows,
           round(CAST(s.mx AS DOUBLE) / (CAST(s.tot AS DOUBLE) / s.k), 9)
             AS skew_ratio,
           round(sqrt(greatest(s.sq / s.k
                 - pow(CAST(s.tot AS DOUBLE) / s.k, 2), 0))
                 / (CAST(s.tot AS DOUBLE) / s.k), 9) AS cv,
           top1.day AS hottest_day, top1.event_type AS hottest_type
    FROM s CROSS JOIN top1
    """,
)
def event_partition_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew audit for the (day, event_type) partitioning every
    time-bucketed aggregate in this engine shuffles on: max-key/mean-key
    ratio, coefficient of variation, and the hottest key — the number
    that says whether a salted variant (j_salted_skew) or AQE skew-join
    is needed BEFORE a 100 TB run discovers it as a straggler.  One
    key-count groupBy; population moments in exact integer squares."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    c = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    s = c.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("tot"),
        F.max("n").alias("mx"),
        F.sum((F.col("n") * F.col("n")).cast("decimal(28,0)"))
        .cast("double")
        .alias("sq"),
    )
    top1 = c.orderBy(
        F.desc("n"), F.asc("day"), F.asc("event_type")
    ).limit(1).select(
        F.col("day").alias("hottest_day"),
        F.col("event_type").alias("hottest_type"),
    )
    kd = F.col("k").cast("double")
    mean = F.col("tot").cast("double") / kd
    return s.crossJoin(F.broadcast(top1)).select(
        F.col("k").cast("long").alias("n_keys"),
        F.col("tot").cast("long").alias("n_rows"),
        F.col("mx").cast("long").alias("max_key_rows"),
        F.round(F.col("mx").cast("double") / mean, 9).alias("skew_ratio"),
        F.round(
            F.sqrt(
                F.greatest(
                    F.col("sq") / kd - F.pow(mean, F.lit(2.0)), F.lit(0.0)
                )
            )
            / mean,
            9,
        ).alias("cv"),
        "hottest_day",
        "hottest_type",
    )


def queries() -> dict[str, QueryFn]:
    """All registered queries, ordered unverified-first so the driver's
    ~50-query CORRECTNESS window covers a fresh slice each round (see
    :mod:`riot_graphs_spark.plans.verified`)."""
    from .verified import rotation_order

    order = rotation_order(list(QUERIES), frozenset(ORACLES))
    return {name: QUERIES[name] for name in order}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
