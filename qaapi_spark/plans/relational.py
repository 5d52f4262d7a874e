"""Core relational queries — reference operator families P/L/J/A/W/O/F
(SURVEY.md §2) re-expressed as Catalyst plans, each with a DuckDB
oracle.

Scale design notes (local[32] tests, 1000-executor target):
  - Dimension joins (region/nation/supplier at TPC-H ratios) are
    broadcast so the fact scan never shuffles for them.
  - Aggregations are expressed as single groupBy chains => Catalyst
    emits partial (map-side) aggregation before the exchange.
  - Window dedups shuffle once on their partition keys; the global
    rolling window runs over post-aggregation day-level cardinality.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from qaapi_spark.functions.dialect import iff, nvl, regexp_substr, url_concat
from qaapi_spark.operators.windows import dedup_keep_latest, dedup_keep_one, rolling_sum
from qaapi_spark.plans.catalog import query, t


# ---------------------------------------------------------------------------
# W3 + A1: daily counts + 5-row rolling total — the flagship query.
# Reference: queries/pagenation.sql:1-25 (calls/day + running tally).
# ---------------------------------------------------------------------------
@query(
    "w3_rolling_daily_events",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS dt, COUNT(event_id) AS tally
        FROM events GROUP BY 1
    )
    SELECT dt, tally,
           CAST(SUM(tally) OVER (ORDER BY dt ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS running_tally
    FROM daily
    ORDER BY running_tally DESC, dt DESC
    """,
    doc="W3 rolling frame + A1 group-count; ref queries/pagenation.sql:5-24",
)
def w3_rolling_daily_events(spark, sf_dir):
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("dt"))
        .agg(F.count("event_id").alias("tally"))
    )
    return rolling_sum(daily, "dt", "tally", 4, "running_tally").orderBy(
        F.desc("running_tally"), F.desc("dt")
    )


# ---------------------------------------------------------------------------
# A1/A3 aggregate shapes + O1 multi-key sort.
# ---------------------------------------------------------------------------
@query(
    "a1_orders_by_priority",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_total,
           ROUND(AVG(o_totalprice), 4) AS avg_total
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    ORDER BY o_orderpriority, o_orderstatus
    """,
    doc="A1 group+count/sum/avg; ref queries/pagenation.sql:5-13",
)
def a1_orders_by_priority(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_total"),
        )
        .orderBy("o_orderpriority", "o_orderstatus")
    )


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: filter + 8-agg groupBy (A-family stress)",
)
def q1_pricing_summary(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# J1: left outer equi-join (ref: cslb contacts.sql:3-5).
# ---------------------------------------------------------------------------
@query(
    "j1_orders_left_join_customer",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_orderkey
    """,
    doc="J1 left equi-join; ref sql_templates/cslb contacts.sql:3-5",
)
def j1_orders_left_join_customer(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# P7 semi/anti joins (ref IN / NOT IN subqueries, Update...sql:88-92).
# ---------------------------------------------------------------------------
@query(
    "p7_semi_customers_with_orders",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="P7 IN-subquery as left_semi; ref Update...sql:88-92",
)
def p7_semi_customers_with_orders(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@query(
    "p7_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    doc="P7 NOT-IN as left_anti (null-safe); ref Update...sql:88-92",
)
def p7_anti_customers_without_orders(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# W1/W2 window dedups (ref Update...sql:119-121, 206-208).
# ---------------------------------------------------------------------------
@query(
    "w1_dedup_first_event_per_user_type",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM (
        SELECT event_id, user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
        FROM events
    ) WHERE rn = 1
    ORDER BY user_id, event_type
    """,
    doc="W1 keep-one dedup w/ deterministic tiebreak; ref Update...sql:119-121",
)
def w1_dedup_first_event_per_user_type(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        dedup_keep_one(
            e.select("event_id", "user_id", "event_type", "value"),
            ["user_id", "event_type"],
            [F.col("event_id").asc()],
        )
        .orderBy("user_id", "event_type")
    )


@query(
    "w2_latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value FROM (
        SELECT user_id, event_id, ts, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
    doc="W2 keep-latest-by-timestamp dedup; ref Update...sql:206-208",
)
def w2_latest_event_per_user(spark, sf_dir):
    e = t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type", "value")
    return dedup_keep_latest(e, ["user_id"], "ts", tiebreak=["event_id"]).orderBy("user_id")


# ---------------------------------------------------------------------------
# A2 distinct (ref cslb contacts.sql:9).
# ---------------------------------------------------------------------------
@query(
    "a2_distinct_segment_nation",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    ORDER BY c_mktsegment, c_nationkey
    """,
    doc="A2 SELECT DISTINCT; ref sql_templates/cslb contacts.sql:9",
)
def a2_distinct_segment_nation(spark, sf_dir):
    return (
        t(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    )


# ---------------------------------------------------------------------------
# Join + agg + deterministic top-k (Q3 shape; O3 sort on computed col).
# ---------------------------------------------------------------------------
@query(
    "q3_top_revenue_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_orderpriority,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY o.o_orderkey, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective join + agg + top-k (J/A/O families)",
)
def q3_top_revenue_orders(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    l = t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"), "left_semi")
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5 shape: snowflake-dim join chain with broadcast dims.
# ---------------------------------------------------------------------------
@query(
    "q5_revenue_by_nation",
    oracle="""
    SELECT n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 shape: multi-join with broadcast dims; local-supplier semantics",
)
def q5_revenue_by_nation(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = t(spark, sf_dir, "region").select("r_regionkey")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# ---------------------------------------------------------------------------
# P1/P8 JSON-path projection + cast (ref Update...sql:7-18; VARIANT access).
# ---------------------------------------------------------------------------
@query(
    "p1_json_props_by_type",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    doc="P1 JSON-path extraction + cast; ref Update...sql:7-18 (src:a.b::TYPE)",
)
def p1_json_props_by_type(spark, sf_dir):
    e = t(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# F-family scalar dialect layer exercised end-to-end.
# ---------------------------------------------------------------------------
@query(
    "f_dialect_customer_scalars",
    oracle="""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS parsed_id,
           'https://example.test/customer/' || CAST(c_custkey AS VARCHAR) || '/profile' AS profile_url,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn' ELSE 'ok' END AS bal_status,
           ROUND(COALESCE(c_acctbal, 0.0), 2) AS bal
    FROM customer
    ORDER BY c_custkey
    """,
    doc="F5/F6 regexp_substr, F9 iff, F10 nvl, F11 url concat; ref Update...sql:43-44,103,106,195",
)
def f_dialect_customer_scalars(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        regexp_substr(F.col("c_name"), "[0-9]+").cast("long").alias("parsed_id"),
        url_concat("https://example.test/customer/", F.col("c_custkey"), "/profile").alias("profile_url"),
        iff(F.col("c_acctbal") < 0, F.lit("overdrawn"), F.lit("ok")).alias("bal_status"),
        F.round(nvl(F.col("c_acctbal"), F.lit(0.0)), 2).alias("bal"),
    ).orderBy("c_custkey")


@query(
    "f_epoch_ms_roundtrip",
    oracle="""
    SELECT o_orderkey,
           epoch_ms(o_orderdate) AS order_epoch_ms,
           strftime(epoch_ms(epoch_ms(o_orderdate)), '%Y-%m-%d %H:%M:%S') AS order_ts_str
    FROM orders
    WHERE o_orderkey % 100 = 0
    ORDER BY o_orderkey
    """,
    doc="F2 epoch-ms <-> timestamp; ref Update...sql:42,68,109 DATEADD(ms,...)",
)
def f_epoch_ms_roundtrip(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    # o_orderdate is TIMESTAMP_NTZ in the parquet; with the session tz
    # pinned to UTC the cast to (ltz) TIMESTAMP is wall-time preserving.
    ms = F.unix_millis(F.col("o_orderdate").cast("timestamp"))
    return o.select(
        "o_orderkey",
        ms.alias("order_epoch_ms"),
        F.date_format(F.timestamp_millis(ms), "yyyy-MM-dd HH:mm:ss").alias("order_ts_str"),
    ).orderBy("o_orderkey")


@query(
    "f_convert_tz_denver",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS utc_str,
           strftime(timezone('America/Denver', timezone('UTC', ts)), '%Y-%m-%d %H:%M:%S') AS denver_str
    FROM events
    WHERE event_id % 50 = 0
    ORDER BY event_id
    """,
    doc="F3 CONVERT_TIMEZONE('UTC','America/Denver',ts); ref Update...sql:41,67,108,195",
)
def f_convert_tz_denver(spark, sf_dir):
    from qaapi_spark.functions.dialect import convert_tz

    e = t(spark, sf_dir, "events").filter(F.col("event_id") % 50 == 0)
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("utc_str"),
        F.date_format(convert_tz(F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("denver_str"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# L1 chained explode (inner) and L3 explode with empty-array default.
# ---------------------------------------------------------------------------
@query(
    "l1_explode_part_words",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    GROUP BY word ORDER BY word
    """,
    doc="L1 LATERAL FLATTEN (inner); ref Update...sql:19-22",
)
def l1_explode_part_words(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy("word")
    )


@query(
    "l3_explode_outer_default",
    oracle="""
    SELECT p_partkey, word
    FROM (
        SELECT p_partkey,
               unnest(CASE WHEN len(list_filter(string_split(p_name, ' '), w -> w LIKE 's%')) = 0
                           THEN [NULL]
                           ELSE list_filter(string_split(p_name, ' '), w -> w LIKE 's%') END) AS word
        FROM part
    )
    ORDER BY p_partkey, word
    """,
    doc="L3 FLATTEN over defaulted-empty array == explode_outer; ref Update...sql:200-202",
)
def l3_explode_outer_default(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    arr = F.filter(F.split("p_name", " "), lambda w: w.startswith("s"))
    return (
        p.select("p_partkey", F.explode_outer(arr).alias("word"))
        .orderBy("p_partkey", "word")
    )


# ---------------------------------------------------------------------------
# P4/P5/P6 predicates: equality on extracted field, NULL checks, regex.
# ---------------------------------------------------------------------------
@query(
    "p6_regex_docs_by_lang",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(CASE WHEN regexp_matches(text, '[0-9A-Za-z]') THEN 1 END) AS n_alnum,
           COUNT(CASE WHEN regexp_matches(text, 'vector') THEN 1 END) AS n_vector
    FROM documents
    GROUP BY lang ORDER BY lang
    """,
    doc="P6 REGEXP_LIKE has-alnum predicate; ref Update...sql:203-205",
)
def p6_regex_docs_by_lang(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("text").rlike("[0-9A-Za-z]"), 1)).alias("n_alnum"),
            F.count(F.when(F.col("text").rlike("vector"), 1)).alias("n_vector"),
        )
        .orderBy("lang")
    )
