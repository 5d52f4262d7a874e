"""Second wave of relational coverage: API-predicate translation (P8),
SQL-file execution (S7/O2), as-of join, sessionization, pivot,
rollup + distinct aggregates.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from qaapi_spark.operators.joins import as_of_join
from qaapi_spark.plans.catalog import query, t
from qaapi_spark.sources.tables import register_temp_views

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SQL_FILE = os.path.join(_REPO, "queries", "daily_running.sql")


def translate_api_wildcards(pattern: str) -> str:
    """P8: Contact-API wildcard vocabulary -> SQL LIKE
    (`*`->`%`, `?`->`_`); ref PDF pp.103-110 via SURVEY §2.2."""
    return pattern.replace("%", r"\%").replace("_", r"\_").replace("*", "%").replace("?", "_")


@query(
    "p8_api_predicate_translation",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer
    WHERE (c_name LIKE 'Customer#00000012_' OR c_name LIKE 'Customer#0000009%')
      AND c_acctbal >= 100.0
      AND c_mktsegment IN ('BUILDING', 'MACHINERY')
    ORDER BY c_custkey
    """,
    doc="P8 API-side predicate vocabulary as ordinary filters: wildcard "
    "translation (*->%%, ?->_), repeated-param OR, threshold, IN; "
    "ref modules/qa_api_handler.py:101-107 + PDF pp.103-110",
)
def p8_api_predicate_translation(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    like1 = translate_api_wildcards("Customer#00000012?")
    like2 = translate_api_wildcards("Customer#0000009*")
    return (
        c.filter(
            (F.col("c_name").like(like1) | F.col("c_name").like(like2))
            & (F.col("c_acctbal") >= 100.0)
            & F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        )
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .orderBy("c_custkey")
    )


@query(
    "s7_sql_file_source",
    oracle=open(_SQL_FILE).read(),
    doc="S7 SQL-file execution path (spark.sql over registered views) + O2 "
    "ordinal ORDER BY; ref modules/snowflake.py:51-63, cslb contacts.sql:16",
)
def s7_sql_file_source(spark, sf_dir):
    register_temp_views(spark, sf_dir)
    with open(_SQL_FILE) as f:
        sql_text = f.read()
    return spark.sql(sql_text)


@query(
    "asof_latest_order_per_event",
    oracle="""
    WITH ranked AS (
        SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC) AS rn
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        WHERE e.event_id % 20 = 0
    )
    SELECT event_id, user_id, o_orderkey, o_totalprice
    FROM ranked WHERE rn = 1 ORDER BY event_id
    """,
    doc="as-of join (Spark lacks a native one): equi-join + range filter + "
    "top-1 per row; extension operator (pyspark_guide OLAP patterns)",
)
def asof_latest_order_per_event(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0).select(
        "event_id", "user_id", "ts"
    )
    o = t(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp")
    )
    joined = as_of_join(
        e, o, left_on="user_id", right_on="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"], tiebreak=["o_orderkey"],
    )
    # deterministic tiebreak on equal o_orderdate: highest orderkey
    # (as_of_join top-1 needs the same tiebreak as the oracle)
    return joined.select("event_id", "user_id", "o_orderkey", "o_totalprice").orderBy("event_id")


@query(
    "sessionization_gap30",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 1800 SECOND
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id ORDER BY user_id
    """,
    doc="sessionization via lag + gap>threshold + running sum; the gap "
    "compare is EXACT timestamp arithmetic (unix_timestamp/date_diff "
    "truncate sub-second parts, which every testdata ts carries) so "
    "all three sessionizers — this, session_window_native, and the "
    "stateful streaming one — share boundary semantics (extension; "
    "pyspark_guide OLAP patterns)",
)
def sessionization_gap30(spark, sf_dir):
    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    flagged = e.withColumn(
        "new_sess",
        F.when(
            prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 1800 SECONDS")), 1
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


@query(
    "pivot_daily_event_types",
    oracle="""
    SELECT CAST(ts AS DATE) AS dt,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
    FROM events GROUP BY dt ORDER BY dt
    """,
    doc="pivot: event_type counts per day via groupBy().pivot() with explicit "
    "values (extension; map-side partial agg preserved)",
)
def pivot_daily_event_types(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    out = (
        e.groupBy(F.to_date("ts").alias("dt"))
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .orderBy("dt")
    )
    # pivot leaves NULL for empty cells; the oracle COUNT(CASE) yields 0
    return out.select(
        "dt",
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(f"n_{c}")
            for c in ["click", "view", "purchase", "signup", "error"]
        ],
    )


@query(
    "rollup_orders_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           ROUND(SUM(o_totalprice), 2) AS sum_total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="rollup + distinct aggregate: subtotal hierarchy over orders "
    "(extension; A-family beyond the reference's plain GROUP BY)",
)
def rollup_orders_status_priority(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "range_join_events_nearby",
    # exact pair relation: integer-microsecond timestamps compare
    # identically on both engines, so the inequality join reproduces
    # bit-for-bit.
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS delta_us
    FROM events c JOIN events p
      ON ABS(epoch_us(p.ts) - epoch_us(c.ts)) <= 300 * 1000000
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    ORDER BY click_id, purchase_id
    """,
    doc="pure RANGE join (no equi-key): click/purchase events within "
    "+/-5 minutes of each other, via the time-band quantization "
    "rewrite — floor(ts/gap) bands, the left side probes its three "
    "adjacent bands, equi-join on the band key, exact |delta| filter "
    "(a naive inequality-only join is a BroadcastNestedLoop O(n*m) "
    "grid; the banded plan shuffles each side once on the band and "
    "only co-banded rows ever meet; extension operator — "
    "operators/joins.banded_range_join)",
)
def range_join_events_nearby(spark, sf_dir):
    from qaapi_spark.operators.joins import banded_range_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = t(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    return (
        banded_range_join(c, p, "c_ts", "p_ts", max_gap_s=300)
        .select("click_id", "purchase_id", "delta_us")
        .orderBy("click_id", "purchase_id")
    )
