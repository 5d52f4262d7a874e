"""Fifth relational wave: classic decision-support shapes the earlier
waves had not pinned — correlated-min subquery (TPC-H Q2 shape),
EXISTS-gated aggregation (Q4 shape), bi-nation volume matrix (Q7
shape), returned-item top-k revenue (Q10 shape), and HAVING-threshold
IN-subquery (Q18 shape).

The reference expresses all its relational work through Snowflake SQL
(SURVEY §2.2 P7 for IN-subqueries, §2.5 for aggregation shapes); these
queries pin the same semantics through the DataFrame API so Catalyst
chooses the physical strategy.  At scale: fixed-size dimensions
(nation: 25 rows, region: 5) carry explicit broadcast hints; tables
that grow with SF (customer ~150k rows/SF, supplier ~10k/SF) get NO
user hint — a user broadcast hint cannot be demoted by AQE, so hinting
them would OOM at large SF.  AQE/autoBroadcastJoinThreshold picks the
strategy for those from observed sizes.  The EXISTS becomes a
left-semi join that map-side prunes before the aggregate shuffle, and
the Q18 IN-subquery reuses lineitem's aggregation output as a filter
rather than a second shuffle of the fact table.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from qaapi_spark.plans.catalog import query, t


@query(
    "q2_min_acctbal_supplier_per_nation",
    oracle="""
    SELECT n.n_name, s.s_name, ROUND(s.s_acctbal, 2) AS acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_acctbal = (
        SELECT MIN(s2.s_acctbal) FROM supplier s2
        WHERE s2.s_nationkey = s.s_nationkey
    )
    ORDER BY n.n_name, s.s_name
    """,
    doc="TPC-H Q2 shape: correlated-MIN subquery, de-correlated into a "
    "per-nation window minimum (one shuffle on the tiny supplier dim; "
    "the correlated re-scan of the SQL form never materializes)",
)
def q2_min_acctbal_supplier_per_nation(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey")
    return (
        s.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            "s_name",
            F.round("s_acctbal", 2).alias("acctbal"),
        )
        .orderBy("n_name", "s_name")
    )


@query(
    "q4_priority_with_returns_exists",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS gate as a left-semi join; the lineitem "
    "side is filtered (returnflag pushdown to the scan) BEFORE the "
    "semi-join shuffle, and the date range prunes orders at the scan",
)
def q4_priority_with_returns_exists(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q7_bination_volume_by_year",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey < 5 AND n2.n_nationkey < 5
      AND n1.n_nationkey <> n2.n_nationkey
    GROUP BY supp_nation, cust_nation, o_year
    ORDER BY supp_nation, cust_nation, o_year
    """,
    doc="TPC-H Q7 shape: supplier-nation x customer-nation shipping "
    "volume by year; the fixed-size nation filters carry broadcast "
    "hints, while the SF-scaling supplier/customer joins are left to "
    "AQE so the plan cannot OOM at large SF; lineitem pays the single "
    "fact-side aggregate shuffle",
)
def q7_bination_volume_by_year(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.filter(F.col("n_nationkey") < 5).withColumnsRenamed(
        {"n_nationkey": "nk1", "n_name": "supp_nation"}
    )
    n2 = n.filter(F.col("n_nationkey") < 5).withColumnsRenamed(
        {"n_nationkey": "nk2", "n_name": "cust_nation"}
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(c.join(F.broadcast(n2), c.c_nationkey == F.col("nk2")),
              F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("volume")
        )
        .orderBy("supp_nation", "cust_nation", "o_year")
    )


@query(
    "q10_returned_item_revenue_topk",
    oracle="""
    SELECT c.c_custkey, c.c_name, ROUND(c.c_acctbal, 2) AS acctbal, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY c.c_custkey, c.c_name, acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: lost-revenue per customer from returned items "
    "in one quarter, top-20; returnflag + date predicates land in the "
    "parquet scans, nation (fixed-size) broadcasts while the customer "
    "join strategy is AQE's call from observed sizes, and the global "
    "top-k is a TakeOrderedAndProject (no full sort)",
)
def q10_returned_item_revenue_topk(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "gapfill_daily_signup_counts",
    oracle="""
    WITH b AS (
        SELECT date_trunc('day', MIN(ts)) AS lo, date_trunc('day', MAX(ts)) AS hi
        FROM events WHERE event_type = 'signup'
    ),
    days AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        FROM b
    ),
    c AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
        FROM events WHERE event_type = 'signup' GROUP BY 1
    )
    SELECT d.day, COALESCE(c.n, 0) AS n
    FROM days d LEFT JOIN c USING (day)
    ORDER BY day
    """,
    doc="calendar gap-fill: dense daily series via sequence()+explode "
    "over the observed [min, max] day range, zero-filled counts — the "
    "time-series densification step a training-data pipeline needs "
    "before rolling features; the calendar is O(days) regardless of "
    "fact size, so the only fact-side cost is one aggregate shuffle "
    "and the calendar side broadcasts",
)
def gapfill_daily_signup_counts(spark, sf_dir):
    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .withColumn("day", F.to_date("ts"))
    )
    counts = e.groupBy("day").agg(F.count("*").alias("cnt"))
    days = (
        e.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 day"))
            ).alias("day")
        )
    )
    return (
        days.join(counts, "day", "left")
        .select("day", F.coalesce("cnt", F.lit(0)).alias("n"))
        .orderBy("day")
    )


@query(
    "q18_large_quantity_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           ROUND(o.o_totalprice, 2) AS totalprice,
           ROUND(SUM(l.l_quantity), 1) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l2.l_orderkey FROM lineitem l2
        GROUP BY l2.l_orderkey
        HAVING SUM(l2.l_quantity) > 300
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, totalprice
    ORDER BY totalprice DESC, o_orderkey
    """,
    doc="TPC-H Q18 shape: the IN-subquery's HAVING output (a sharply "
    "selective key set) is computed once from lineitem and broadcast "
    "as a semi-filter back onto lineitem/orders — the fact table is "
    "shuffled once for the HAVING aggregate, never for the IN; the "
    "customer join carries no user hint (AQE decides)",
)
def q18_large_quantity_orders(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tot"))
        .filter(F.col("tot") > 300)
        .select("l_orderkey")
    )
    return (
        l.join(F.broadcast(big.withColumnRenamed("l_orderkey", "big_key")),
               F.col("l_orderkey") == F.col("big_key"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 1).alias("sum_qty"))
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
    )


@query(
    "timeseries_interpolate_daily",
    # interpolation consumes ROUNDED observed MEDIANS: an order
    # statistic is summation-order-free (AVG of doubles differs in the
    # last ulp between engines and can round across a 4dp boundary),
    # so both engines interpolate from bit-identical inputs; day
    # offsets are exact ints
    oracle="""
    WITH b AS (
        SELECT CAST(date_trunc('day', MIN(ts)) AS DATE) AS lo,
               CAST(date_trunc('day', MAX(ts)) AS DATE) AS hi
        FROM events
    ),
    spine AS (
        SELECT t.event_type, CAST(unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS DATE) AS day
        FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN b
    ),
    obs AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               ROUND(median(value), 4) AS v
        FROM events GROUP BY 1, 2
    ),
    j AS (
        SELECT s.event_type, s.day, o.v FROM spine s
        LEFT JOIN obs o ON o.event_type = s.event_type AND o.day = s.day
    ),
    w AS (
        SELECT event_type, day, v,
               last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pd,
               first_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nd
        FROM j
    )
    SELECT event_type, day,
           ROUND(CASE WHEN v IS NOT NULL THEN v
                      WHEN pv IS NOT NULL AND nv IS NOT NULL
                      THEN pv + (nv - pv) * CAST(datediff('day', pd, day) AS DOUBLE)
                               / CAST(datediff('day', pd, nd) AS DOUBLE)
                      ELSE COALESCE(pv, nv) END, 4) AS v_interp,
           CASE WHEN v IS NULL THEN 1 ELSE 0 END AS interpolated
    FROM w
    ORDER BY event_type, day
    """,
    doc="time-series linear interpolation: dense per-type daily spine "
    "(O(days x types), broadcastable), observed daily medians rounded "
    "BEFORE interpolation so the reconstruction is engine-exact, gaps "
    "filled by the line between surrounding observations (edges clamp "
    "to the nearest observation) — the densification step before "
    "rolling features on irregular series (extension: time series)",
)
def timeseries_interpolate_daily(spark, sf_dir):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    bounds = e.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = (
        e.select("event_type").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day"),
        )
    )
    obs = e.groupBy("event_type", "day").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("v")
    )
    j = spine.join(obs, ["event_type", "day"], "left")
    wprev = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wnext = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    vday = F.when(F.col("v").isNotNull(), F.col("day"))
    w = j.select(
        "event_type",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(wprev).alias("pv"),
        F.last(vday, ignorenulls=True).over(wprev).alias("pd"),
        F.first("v", ignorenulls=True).over(wnext).alias("nv"),
        F.first(vday, ignorenulls=True).over(wnext).alias("nd"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.datediff("day", "pd").cast("double")
        / F.datediff("nd", "pd").cast("double")
    )
    return w.select(
        "event_type",
        "day",
        F.round(
            F.when(F.col("v").isNotNull(), F.col("v"))
            .when(
                F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp
            )
            .otherwise(F.coalesce("pv", "nv")),
            4,
        ).alias("v_interp"),
        F.when(F.col("v").isNull(), 1).otherwise(0).alias("interpolated"),
    ).orderBy("event_type", "day")


@query(
    "w5_range_frame_trailing_revenue",
    # RANGE frame keyed on the VALUE of the ordering column (trailing
    # 7 days by timestamp), not row position — the frame semantics
    # ROWS (w3) cannot express when days are missing or duplicated
    oracle="""
    WITH daily AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
               ROUND(SUM(o_totalprice), 2) AS rev
        FROM orders GROUP BY 1, 2
    )
    SELECT o_custkey, d,
           ROUND(SUM(rev) OVER (
               PARTITION BY o_custkey ORDER BY d
               RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
           ), 2) AS trailing_7d_rev
    FROM daily
    WHERE o_custkey % 100 = 0
    ORDER BY o_custkey, d
    """,
    doc="RANGE window frame (trailing 7 calendar days BY VALUE of the "
    "order date): unlike the W3 ROWS frame, missing days shrink the "
    "window and same-day peers aggregate together — the frame "
    "semantics gaps/duplicates require (W-family extension; "
    "daily pre-aggregate keeps the window input one row per "
    "(customer, day))",
)
def w5_range_frame_trailing_revenue(spark, sf_dir):
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    daily = (
        o.select(
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("d"),
            "o_totalprice",
        )
        .groupBy("o_custkey", "d")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.col("d")))
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "o_custkey",
        "d",
        F.round(F.sum("rev").over(w), 2).alias("trailing_7d_rev"),
    ).orderBy("o_custkey", "d")


_RFM_QS = [0.25, 0.5, 0.75]  # exact binary fractions


@query(
    "rfm_customer_segments",
    # boundary parity: quartile fractions are exact in binary; each
    # engine rounds ITS OWN interpolated boundaries to 6 dp (the two
    # engines' blend formulas differ at ~1e-14 — see
    # histogram_equidepth_event_values); scores count boundaries
    # strictly below the value, identical integer logic both sides
    oracle=f"""
    WITH cust AS (
        SELECT o_custkey,
               CAST(FLOOR(epoch(MAX(o_orderdate)) / 86400) AS BIGINT) AS r_days,
               COUNT(*) AS f_cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS m_sum
        FROM orders GROUP BY o_custkey
    ),
    b AS (
        SELECT list_transform(quantile_cont(r_days, {_RFM_QS}), x -> round(x, 6)) AS rb,
               list_transform(quantile_cont(f_cnt, {_RFM_QS}), x -> round(x, 6)) AS fb,
               list_transform(quantile_cont(m_sum, {_RFM_QS}), x -> round(x, 6)) AS mb
        FROM cust
    ),
    scored AS (
        SELECT (1 + len(list_filter(b.rb, x -> cust.r_days > x))) AS r_score,
               (1 + len(list_filter(b.fb, x -> cust.f_cnt > x))) AS f_score,
               (1 + len(list_filter(b.mb, x -> cust.m_sum > x))) AS m_score,
               m_sum
        FROM cust CROSS JOIN b
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(m_sum), 2) AS avg_monetary
    FROM scored GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
    doc="RFM customer segmentation: per-customer recency (epoch-day of "
    "last order) / frequency / monetary in ONE customer-keyed "
    "aggregate, exact quartile boundaries for all three measures from "
    "one stats row broadcast back, map-side 1-4 scoring, <=64-group "
    "rollup — the classic lifecycle-segmentation query; at 100 TB the "
    "only corpus-sized cost is the first aggregate, and "
    "percentile_approx swaps into the same plan (extension)",
)
def rfm_customer_segments(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.floor(F.unix_timestamp(F.max("o_orderdate")) / 86400).alias("r_days"),
        F.count("*").alias("f_cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("m_sum"),
    )

    def bounds(c):
        return F.transform(
            F.percentile(c, F.lit(_RFM_QS)), lambda x: F.round(x, 6)
        )

    b = cust.agg(
        bounds(F.col("r_days").cast("double")).alias("rb"),
        bounds(F.col("f_cnt").cast("double")).alias("fb"),
        bounds(F.col("m_sum")).alias("mb"),
    )

    def score(val, bs):
        return F.lit(1) + F.aggregate(
            bs, F.lit(0), lambda acc, x: acc + (val > x).cast("int")
        )

    scored = cust.crossJoin(F.broadcast(b)).select(
        score(F.col("r_days"), F.col("rb")).alias("r_score"),
        score(F.col("f_cnt"), F.col("fb")).alias("f_score"),
        score(F.col("m_sum"), F.col("mb")).alias("m_score"),
        "m_sum",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("m_sum"), 2).alias("avg_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )
