"""Fourth relational wave: CUBE / GROUPING SETS, interval-overlap
join, top-k per group — relational extensions beyond the reference's
surface (SURVEY §2.5/§2.7 note they arrive free with Spark; these
pin the semantics with oracles).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from qaapi_spark.plans.catalog import query, t
from qaapi_spark.sources.tables import register_temp_views


@query(
    "cube_orders_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
    """,
    doc="CUBE over (status, priority) with GROUPING() disambiguation of "
    "the NULL super-aggregate rows (A-family extension; rollup variant "
    "is rollup_orders_status_priority)",
)
def cube_orders_status_priority(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n", "total")
        .orderBy("g_status", "g_priority", "o_orderstatus", "o_orderpriority")
    )


_GS_SQL = """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           ROUND(AVG(o_totalprice), 4) AS avg_total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@query(
    "groupingsets_orders",
    oracle=_GS_SQL,
    doc="explicit GROUPING SETS ((status),(priority),()) via the SQL API "
    "— same ANSI text runs on Spark and DuckDB (A-family extension)",
)
def groupingsets_orders(spark, sf_dir):
    register_temp_views(spark, sf_dir)
    return spark.sql(_GS_SQL)


# Fixed promo windows for the interval-overlap join; lineitem interval
# is [l_shipdate, l_shipdate + l_linenumber days] (synthetic span: the
# driver's lineitem has no receiptdate).
_PROMOS = [
    ("w1", "1995-01-01", "1995-03-31"),
    ("w2", "1995-07-01", "1995-09-30"),
    ("w3", "1996-01-01", "1996-06-30"),
    ("w4", "1997-01-01", "1997-12-31"),
]
_PROMO_VALUES = ", ".join(
    f"('{n}', TIMESTAMP '{s} 00:00:00', TIMESTAMP '{e} 00:00:00')" for n, s, e in _PROMOS
)


@query(
    "overlap_join_promo_windows",
    oracle=f"""
    WITH promos(w_name, w_start, w_end) AS (VALUES {_PROMO_VALUES}),
    spans AS (
        SELECT l_shipdate AS s_start,
               l_shipdate + INTERVAL (l_linenumber) DAY AS s_end,
               l_extendedprice * (1 - l_discount) AS revenue
        FROM lineitem
    )
    SELECT w_name, COUNT(*) AS n_items, ROUND(SUM(revenue), 2) AS revenue
    FROM promos JOIN spans
      ON s_start <= w_end AND s_end >= w_start
    GROUP BY w_name ORDER BY w_name
    """,
    doc="interval-overlap (range) join: lineitem activity spans x promo "
    "windows — broadcast-nested-loop on the tiny window side, so the "
    "fact side streams map-only at any scale (J-family extension)",
)
def overlap_join_promo_windows(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    promos = spark.createDataFrame(
        [(n, f"{s} 00:00:00", f"{e} 00:00:00") for n, s, e in _PROMOS],
        "w_name string, w_start string, w_end string",
    ).select(
        "w_name",
        F.col("w_start").cast("timestamp").alias("w_start"),
        F.col("w_end").cast("timestamp").alias("w_end"),
    )
    # Derived scan pre-filter: the promo table is a compile-time literal,
    # so its global [min(w_start), max(w_end)] envelope becomes literal
    # predicates on the fact scan.  `s_start <= max_end` lands in
    # PushedFilters (parquet row-group min/max skipping); the s_end
    # conjunct runs once per row BEFORE the BNLJ instead of once per
    # (row x window) inside it.  Rows outside the envelope overlap no
    # window, so the join result is unchanged.
    min_start = min(s for _, s, _ in _PROMOS) + " 00:00:00"
    max_end = max(e for _, _, e in _PROMOS) + " 00:00:00"
    spans = li.select(
        F.col("l_shipdate").alias("s_start"),
        F.timestamp_add("DAY", F.col("l_linenumber"), F.col("l_shipdate")).alias("s_end"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    ).filter(
        (F.col("s_start") <= F.lit(max_end).cast("timestamp"))
        & (F.col("s_end") >= F.lit(min_start).cast("timestamp"))
    )
    joined = F.broadcast(promos).join(
        spans, (F.col("s_start") <= F.col("w_end")) & (F.col("s_end") >= F.col("w_start"))
    )
    return (
        joined.groupBy("w_name")
        .agg(F.count("*").alias("n_items"), F.round(F.sum("revenue"), 2).alias("revenue"))
        .orderBy("w_name")
    )


@query(
    "topk_orders_per_priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rk AS INT) AS rk
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders
    ) WHERE rk <= 3
    ORDER BY o_orderpriority, rk
    """,
    doc="top-k per group (k=3 priciest orders per priority): window "
    "rank + filter — per-partition heaps, no global sort (W/O-family "
    "extension)",
)
def topk_orders_per_priority(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
        .orderBy("o_orderpriority", "rk")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: tight multi-predicate filter + single agg — "
    "the predicate-pushdown showcase (every predicate reaches the "
    "parquet scan as PushedFilters; tests/test_layout.py asserts it); "
    "map-side partial agg, no shuffle beyond the 1-row combine "
    "(A-family extension)",
)
def q6_forecast_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "session_window_native",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 1800 SECOND
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
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    doc="Spark-native session_window (30-min gap) in batch mode, pinned "
    "against a first-principles lag+cumsum oracle — the same operator "
    "drives watermarked streaming sessionization; window.end is "
    "last-event + gap; Spark merges INCLUSIVELY at the boundary (a "
    "gap of exactly the threshold extends the session; only gap > "
    "threshold starts a new one — verified empirically, and the "
    "oracle uses exact interval arithmetic because date_diff('second') "
    "truncates the sub-second parts every testdata ts carries) "
    "(extension, SURVEY §2.9)",
)
def session_window_native(spark, sf_dir):
    e = t(spark, sf_dir, "events").select("user_id", "ts")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "outliers_zscore_by_type",
    oracle="""
    WITH s AS (
        SELECT event_type, AVG(value) AS m, STDDEV(value) AS sd
        FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type, value,
           ROUND((value - m) / sd, 4) AS z
    FROM events e JOIN s ON e.event_type = s.event_type
    WHERE ABS(ROUND((value - m) / sd, 4)) > 3
    ORDER BY event_id
    """,
    doc="per-group z-score outlier detection (|z| > 3 within each "
    "event_type): one grouped stats pass broadcast back over the "
    "stream — the data-quality gate shape for training pipelines "
    "(filter on the rounded score so the cut is engine-portable) "
    "(extension: anomaly detection)",
)
def outliers_zscore_by_type(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev("value").alias("sd")
    )
    z = F.round((F.col("value") - F.col("m")) / F.col("sd"), 4)
    return (
        e.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > 3)
        .orderBy("event_id")
    )


@query(
    "histogram_event_values",
    oracle="""
    WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events)
    SELECT CAST(LEAST(9, GREATEST(0,
               FLOOR((value - lo) / ((hi - lo) / 10)))) AS INT) AS bucket,
           COUNT(*) AS n_events,
           ROUND(MIN(value), 4) AS bucket_min,
           ROUND(MAX(value), 4) AS bucket_max
    FROM events CROSS JOIN b
    GROUP BY bucket ORDER BY bucket
    """,
    doc="fixed-width 10-bucket histogram of a value column: min/max "
    "stats pass (exact, engine-identical doubles) broadcast back, "
    "map-side bucket assignment, one tiny combine — distribution "
    "profiling at any scale (extension: histogram / binning)",
)
def histogram_event_values(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    b = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    bucket = F.least(
        F.lit(9),
        F.greatest(
            F.lit(0),
            F.floor((F.col("value") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 10)),
        ),
    ).cast("int")
    return (
        e.crossJoin(F.broadcast(b))
        .select(bucket.alias("bucket"), "value")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.min("value"), 4).alias("bucket_min"),
            F.round(F.max("value"), 4).alias("bucket_max"),
        )
        .orderBy("bucket")
    )


@query(
    "fullouter_customer_order_recon",
    oracle="""
    WITH oc AS (
        SELECT o_custkey, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_spend
        FROM orders GROUP BY o_custkey
    )
    SELECT COALESCE(c.c_custkey, oc.o_custkey) AS custkey,
           CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END AS has_customer,
           CASE WHEN oc.o_custkey IS NULL THEN 0 ELSE 1 END AS has_orders,
           COALESCE(oc.n_orders, 0) AS n_orders,
           COALESCE(oc.total_spend, 0.0) AS total_spend
    FROM customer c FULL OUTER JOIN oc ON c.c_custkey = oc.o_custkey
    ORDER BY custkey
    """,
    doc="full-outer reconciliation: customers vs per-customer order "
    "rollup with presence flags — the audit shape for detecting "
    "orphans on either side in one pass (J-family extension; the "
    "reference audits one side at a time, trouble_children.sql:1-8)",
)
def fullouter_customer_order_recon(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select("c_custkey")
    oc = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
    )
    j = c.join(oc, c["c_custkey"] == oc["o_custkey"], "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.when(F.col("c_custkey").isNull(), 0).otherwise(1).alias("has_customer"),
        F.when(F.col("o_custkey").isNull(), 0).otherwise(1).alias("has_orders"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
    ).orderBy("custkey")


@query(
    "nullsafe_join_status_groups",
    oracle="""
    WITH a AS (
        SELECT NULLIF(o_orderstatus, 'P') AS s, COUNT(*) AS n_a
        FROM orders WHERE o_totalprice > 20000 GROUP BY s
    ),
    b AS (
        SELECT NULLIF(o_orderstatus, 'P') AS s, COUNT(*) AS n_b
        FROM orders WHERE o_totalprice <= 20000 GROUP BY s
    )
    SELECT a.s, n_a, n_b
    FROM a JOIN b ON a.s IS NOT DISTINCT FROM b.s
    ORDER BY a.s NULLS FIRST
    """,
    doc="null-safe equality join (<=> / IS NOT DISTINCT FROM): the NULL "
    "group on each side matches — plain = would silently drop it (the "
    "J5 NOT-IN NULL hazard, SURVEY §7.3, surfaced as a join operator)",
)
def nullsafe_join_status_groups(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    s = F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("s")
    a = o.filter(F.col("o_totalprice") > 20000).select(s).groupBy("s").agg(
        F.count("*").alias("n_a")
    )
    b = (
        o.filter(F.col("o_totalprice") <= 20000)
        .select(s)
        .groupBy("s")
        .agg(F.count("*").alias("n_b"))
        .withColumnRenamed("s", "s_b")
    )
    return (
        a.join(b, a["s"].eqNullSafe(b["s_b"]))
        .select("s", "n_a", "n_b")
        .orderBy(F.col("s").asc_nulls_first())
    )


@query(
    "outliers_robust_mad_by_type",
    oracle="""
    WITH med AS (
        SELECT event_type,
               ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_id, e.event_type, e.value, m.med,
               ABS(e.value - m.med) AS adev
        FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
        SELECT event_type,
               ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY adev), 6) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value,
           ROUND(0.6745 * (d.value - d.med) / m.mad, 6) AS mz
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    WHERE ABS(ROUND(0.6745 * (d.value - d.med) / m.mad, 6)) > 3.5
    ORDER BY event_id
    """,
    doc="robust outlier detection via the modified z-score "
    "(median/MAD and the score all round at 6dp on BOTH engines: the "
    "2dp inputs make 4dp/5dp scores land on EXACT decimal ties — e.g. "
    "0.6745*137.87/24.14 = 3.85225 — where engines' tie-breaking "
    "differs, while the 6dp representation is exact, so no tie exists) "
    "(Iglewicz-Hoaglin: 0.6745*(x-median)/MAD, cut |mz| > 3.5) — "
    "median/MAD resist the very outliers that inflate mean/stddev, the "
    "robust data-quality gate for training pipelines.  Two grouped "
    "exact-percentile passes (group-cardinality shuffles) broadcast "
    "back over the stream; the cut filters on the rounded score so it "
    "is engine-portable (extension: anomaly detection)",
)
def outliers_robust_mad_by_type(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 6).alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.percentile("adev", 0.5), 6).alias("mad")
    )
    mz = F.round(F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad"), 6)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select("event_id", "event_type", "value", mz.alias("mz"))
        .filter(F.abs(F.col("mz")) > 3.5)
        .orderBy("event_id")
    )
