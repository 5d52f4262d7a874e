"""Third relational wave: Spark-4 VariantType access, exact
percentiles, set operations, ranking window functions."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from qaapi_spark.plans.catalog import query, t


@query(
    "p1_variant_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT) * 2) AS BIGINT) AS sum_2k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="P1 via Spark 4 VariantType: parse_json + variant_get — the literal "
    "equivalent of Snowflake VARIANT src:path access (SURVEY §1.1)",
)
def p1_variant_props(spark, sf_dir):
    e = t(spark, sf_dir, "events").withColumn("v", F.parse_json("props"))
    k = F.variant_get("v", "$.k", "long")
    return (
        e.groupBy("event_type")
        .agg(
            F.sum(k * 2).alias("sum_2k"),
            F.min(k).alias("min_k"),
        )
        .orderBy("event_type")
    )


@query(
    "a4_exact_percentiles",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           ROUND(MIN(o_totalprice), 2) AS min_total,
           ROUND(MAX(o_totalprice), 2) AS max_total
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="exact interpolated percentiles + min/max (A-family extension; "
    "approx_percentile is the at-scale variant, not oracle-comparable)",
)
def a4_exact_percentiles(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
            F.round(F.min("o_totalprice"), 2).alias("min_total"),
            F.round(F.max("o_totalprice"), 2).alias("max_total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "setops_customer_segments",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 50000
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY c_custkey
    """,
    doc="set operations (INTERSECT/UNION/EXCEPT) — absent from the reference "
    "(SURVEY §2.7), native in Spark; chained with SQL precedence",
)
def setops_customer_segments(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big_orders = o.filter(F.col("o_totalprice") > 50000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    overdrawn = c.filter(F.col("c_acctbal") < 0).select("c_custkey")
    f_orders = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    # SQL set-op precedence: INTERSECT binds tighter; UNION/EXCEPT then
    # associate left-to-right
    return (
        building.intersect(big_orders)
        .union(overdrawn)
        .distinct()
        .exceptAll(f_orders.distinct())
        .orderBy("c_custkey")
    )


@query(
    "scalar_subquery_above_avg",
    oracle="""
    SELECT c.c_custkey, c.c_name, ROUND(c.c_acctbal, 2) AS acctbal,
           CAST(n_orders AS BIGINT) AS n_orders
    FROM customer c
    JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
      ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
      AND n_orders > (SELECT AVG(cnt) FROM
                      (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_custkey))
    ORDER BY c.c_custkey
    """,
    doc="scalar subqueries (uncorrelated) through the SQL API — Catalyst "
    "rewrites to broadcast joins; extension beyond the reference's IN/NOT IN",
)
def scalar_subquery_above_avg(spark, sf_dir):
    from qaapi_spark.sources.tables import register_temp_views

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, ROUND(c.c_acctbal, 2) AS acctbal,
               n_orders
        FROM customer c
        JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
          ON o.o_custkey = c.c_custkey
        WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
          AND n_orders > (SELECT AVG(cnt) FROM
                          (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_custkey))
        ORDER BY c.c_custkey
        """
    )


@query(
    "w4_ranking_functions",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           ROUND(o_totalprice - LAG(o_totalprice, 1, 0.0) OVER w, 2) AS delta_prev,
           ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS status_max
    FROM orders
    WHERE o_orderkey % 50 = 0
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_orderstatus, rnk, o_orderkey
    """,
    doc="rank/dense_rank/ntile/lag/first_value — window functions absent from "
    "the reference (SURVEY §2.6), native in Spark",
)
def w4_ranking_functions(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice", 1, 0.0).over(w), 2
        ).alias("delta_prev"),
        F.round(F.first("o_totalprice").over(w), 2).alias("status_max"),
    ).orderBy("o_orderstatus", "rnk", "o_orderkey")


@query(
    "skew_salted_revenue_by_segment",
    oracle="""
    SELECT c.c_mktsegment, ROUND(SUM(o.o_totalprice), 2) AS revenue,
           COUNT(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
    doc="explicit skew mitigation: the orders->customer join salted (hot "
    "custkeys spread over 8 reducers, dim replicated per salt) ONLY when a "
    "sampled key-histogram probe observes a hot key, like AQE's runtime "
    "skew gate — on uniform keys it falls through to the plain equi-join "
    "(the always-salt plan measured 3.9x slower on unskewed sf0.1, VERDICT "
    "r2) — output identical to the plain equi-join, which is the oracle "
    "(extension, SCALE.md skew notes)",
)
def skew_salted_revenue_by_segment(spark, sf_dir):
    from qaapi_spark.operators.skew import salted_join_auto

    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = (
        t(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    )
    return (
        salted_join_auto(o, c, "o_custkey", n_salts=8)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )
