"""Sixth relational wave: the remaining classic decision-support plan
shapes (TPC-H Q8/Q9/Q11-Q17/Q19-Q22 adapted to the test schema, which
has no partsupp table and no shipmode/commitdate/receiptdate columns —
each adaptation preserves the query's characteristic PLAN shape, which
is what the engine must get right, not the literal column list).

The reference delegates all relational work to Snowflake SQL (SURVEY
§2.2/§2.5); these queries pin the same semantics through the DataFrame
API so Catalyst picks the physical strategy.  Per-shape scale notes:

- Q8/Q9: multi-way star joins — fixed-size dims (nation 25, region 5)
  broadcast explicitly; SF-scaling sides (part, supplier, customer)
  carry NO user hint so AQE can demote to shuffle joins at large SF.
- Q11/Q15/Q22: global scalar subqueries (total value, max revenue,
  avg balance) computed once as a 1-row aggregate and broadcast via
  crossJoin — the fact table is never re-scanned per row.
- Q13: LEFT OUTER + two-level aggregation; the first groupBy reuses
  the join's hash partitioning on the key, so the histogram re-shuffle
  moves only one row per customer.
- Q16: NOT-IN as a broadcast anti-join + count_distinct.
- Q17/Q21: correlated subqueries de-correlated into per-key aggregates
  joined back — one shuffle each instead of a re-scan per outer row.
- Q19: OR-of-ANDs predicate — kept as a single disjunctive filter on
  the JOINED relation so Catalyst can still push the common partkey
  equi-join condition and per-branch constraints into both scans.
- Q12/Q14: conditional aggregation (SUM(CASE)) — one pass, no self-join.

Float determinism for oracle parity: every money aggregate sums
DECIMAL(18,2) products (exact, order-independent) and casts to double
only at output; ratios divide two such exact sums, so both engines
divide bit-identical doubles and IEEE division + ROUND stay
engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from qaapi_spark.plans.catalog import query, t


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


# exact order-independent revenue term: extendedprice * (1 - discount)
def _rev() -> F.Column:
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))


@query(
    "q8_market_share_by_year",
    oracle="""
    WITH flat AS (
        SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
               CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        JOIN region r ON n2.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
                               ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 4) AS mkt_share
    FROM flat GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H Q8 shape (market share): nation NATION_2's share of "
    "ECONOMY-part volume sold into ASIA customers by year; region/"
    "nation broadcast, part filter prunes the probe side before the "
    "fact join, share = ratio of two exact decimal sums (adapted: "
    "p_type value from this schema's vocabulary)",
)
def q8_market_share_by_year(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    # customers restricted to the ASIA region (nation x region broadcast)
    asia_cust = c.join(
        F.broadcast(
            n.join(r, n.n_regionkey == r.r_regionkey).select("n_nationkey")
        ),
        c.c_nationkey == F.col("n_nationkey"),
        "left_semi",
    )
    n1 = n.select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    flat = (
        l.join(p, l.l_partkey == p.p_partkey, "left_semi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(asia_cust, o.o_custkey == asia_cust.c_custkey, "left_semi")
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
    )
    return (
        flat.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", F.col("volume"))
                    .otherwise(F.lit(0).cast("decimal(18,2)"))
                ).cast("double")
                / F.sum("volume").cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    - CAST(p.p_retailprice AS DECIMAL(18,2))
                      * CAST(l.l_quantity AS DECIMAL(18,2)) * 0.1)
               AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year
    """,
    doc="TPC-H Q9 shape (product-type profit): LIKE-filtered part dim, "
    "4-way star join, profit per supplier-nation x year; adapted cost "
    "term 0.1*p_retailprice*l_quantity stands in for the absent "
    "partsupp.ps_supplycost — the plan shape (selective dim filter "
    "probing the fact, two broadcast dims, one agg shuffle) is intact",
)
def q9_product_profit_by_nation_year(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _rev() - _dec("p_retailprice") * _dec("l_quantity") * F.lit(
        "0.1"
    ).cast("decimal(18,2)")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
        .orderBy("nation", "o_year")
    )


@query(
    "q11_important_part_value",
    oracle="""
    WITH value_by_part AS (
        SELECT l.l_partkey,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS val
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_regionkey = 2
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
    FROM value_by_part
    WHERE val > (SELECT SUM(val) * 0.001 FROM value_by_part)
    ORDER BY part_value DESC, l_partkey
    """,
    doc="TPC-H Q11 shape (important stock): per-part value HAVING a "
    "global-scalar threshold (0.1% of total); the scalar is a 1-row "
    "re-aggregate of the SAME grouped relation broadcast back via "
    "crossJoin — the fact table is scanned and shuffled exactly once; "
    "adapted to lineitem value in region-2 supplier nations (no "
    "partsupp table in this schema)",
)
def q11_important_part_value(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 2)
        .select("n_nationkey")
    )
    by_part = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("val"))
    )
    total = by_part.agg(
        (F.sum("val") * F.lit("0.001").cast("decimal(18,6)")).alias("cut")
    )
    return (
        by_part.crossJoin(F.broadcast(total))
        .filter(F.col("val") > F.col("cut"))
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


@query(
    "q12_late_shipment_priority_counts",
    oracle="""
    SELECT CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) > 90
                THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY ship_bucket ORDER BY ship_bucket
    """,
    doc="TPC-H Q12 shape (shipmode priority classes): conditional "
    "SUM(CASE) counts per lateness bucket in ONE aggregate pass — no "
    "per-priority self-joins; the shipdate range lands in the parquet "
    "scan as PushedFilters (adapted: lateness derived from "
    "shipdate - orderdate since this schema has no "
    "commitdate/receiptdate/shipmode)",
)
def q12_late_shipment_priority_counts(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .withColumn(
            "ship_bucket",
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90,
                F.lit("LATE"),
            ).otherwise(F.lit("ONTIME")),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


@query(
    "q13_customer_order_count_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape (customer order-count distribution): LEFT "
    "OUTER join with the filter in the JOIN CONDITION (customers with "
    "zero qualifying orders survive with count 0 — a WHERE would drop "
    "them), then a two-level aggregate; the first groupBy reuses the "
    "outer join's partitioning on c_custkey so only the 1-row-per-"
    "customer histogram input re-shuffles (adapted: priority filter "
    "stands in for the o_comment NOT LIKE filter)",
)
def q13_customer_order_count_distribution(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q14_promo_revenue_pct",
    oracle="""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                     ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE),
                 4) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
    doc="TPC-H Q14 shape (promo revenue): conditional revenue ratio in "
    "one aggregate over a month of shipments; the shipdate range is "
    "the scan filter, part joins without a user hint (AQE broadcasts "
    "from observed size), and the percentage divides two exact decimal "
    "sums cast to double (bit-identical across engines)",
)
def q14_promo_revenue_pct(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(_rev()).cast("double"),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q15_top_supplier_revenue",
    oracle="""
    WITH revenue AS (
        SELECT l.l_suppkey AS supplier_no,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS total_rev
        FROM lineitem l
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 shape (top supplier): the revenue view is computed "
    "ONCE (one agg shuffle), its max is a 1-row re-aggregate broadcast "
    "back via crossJoin, and equality on the exact decimal sum avoids "
    "float-compare hazards; the supplier dim joins the handful of "
    "max-revenue rows (broadcast)",
)
def q15_top_supplier_revenue(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_rev")
    )
    mx = revenue.agg(F.max("total_rev").alias("max_rev"))
    top = (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .select("supplier_no", "total_rev")
    )
    return (
        s.join(F.broadcast(top), s.s_suppkey == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev")
        )
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_diversity_by_part_class",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (
          SELECT s.s_suppkey FROM supplier s WHERE s.s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape (supplier diversity): NOT-IN realized as a "
    "broadcast LEFT ANTI join against the excluded-supplier set (the "
    "subquery has no NULL keys so anti-join and NOT IN agree), part "
    "filters prune before the fact join, COUNT(DISTINCT) per part "
    "class (adapted: negative-acctbal suppliers stand in for the "
    "complaints comment filter; relationships come from lineitem "
    "since this schema has no partsupp)",
)
def q16_supplier_diversity_by_part_class(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH stats AS (
        SELECT l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN stats st ON l.l_partkey = st.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND p.p_size < 15
      AND CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * st.cnt < st.sq
    """,
    doc="TPC-H Q17 shape (small-quantity orders): the correlated "
    "AVG(l_quantity) subquery is de-correlated into ONE per-part "
    "aggregate joined back (no per-row re-scan), and the avg compare "
    "runs in exact integer-scaled decimal arithmetic "
    "(qty*5*cnt < sum  <=>  qty < 0.2*avg) so both engines agree "
    "bit-for-bit; part filters prune before both joins",
)
def q17_small_quantity_revenue(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    p = (
        t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#3") & (F.col("p_size") < 15))
        .select("p_partkey")
    )
    stats = l.groupBy(F.col("l_partkey").alias("sk")).agg(
        F.sum(_dec("l_quantity")).alias("sq"), F.count("*").alias("cnt")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey, "left_semi")
        .join(stats, F.col("l_partkey") == F.col("sk"))
        .filter(_dec("l_quantity") * F.lit(5) * F.col("cnt") < F.col("sq"))
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0), 2
            ).alias("avg_yearly")
        )
    )


@query(
    "q19_disjunctive_predicate_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (OR-of-ANDs): the disjunction mixes columns "
    "from BOTH relations, so it must stay a post-join filter — but "
    "Catalyst still derives the pushable per-side envelopes "
    "(p_brand IN (...), p_size <= 15, l_quantity <= 30) and the "
    "partkey equi-join; single aggregate, no per-branch UNION",
)
def q19_disjunctive_predicate_revenue(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(b1 | b2 | b3)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "q20_heavy_shippers_of_small_parts",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_regionkey = 3
      AND s.s_suppkey IN (
          SELECT l.l_suppkey
          FROM lineitem l
          WHERE l.l_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
          )
            AND l.l_shipdate >= TIMESTAMP '1996-01-01'
            AND l.l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l.l_suppkey
          HAVING SUM(l.l_quantity) > 50
      )
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q20 shape (part promotion candidates): nested IN "
    "subqueries become a chain of semi-joins — the part LIKE filter "
    "broadcasts into the lineitem scan, the per-supplier HAVING "
    "aggregate produces a small key set that semi-filters the "
    "supplier dim; region filter on the fixed-size nation broadcast "
    "(adapted: shipped quantity stands in for partsupp availqty)",
)
def q20_heavy_shippers_of_small_parts(spark, sf_dir):
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 3)
        .select("n_nationkey")
    )
    small = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    heavy = (
        l.join(F.broadcast(small), l.l_partkey == small.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("tot"))
        .filter(F.col("tot") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey"), "left_semi")
        .join(F.broadcast(heavy), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "q21_sole_late_supplier_blame",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_regionkey = 1
      AND datediff('day', o.o_orderdate, l1.l_shipdate) > 120
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND datediff('day', o3.o_orderdate, l3.l_shipdate) > 120
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): EXISTS + "
    "NOT EXISTS over the same fact self-relation, de-correlated into "
    "ONE per-order aggregate (distinct suppliers, distinct LATE "
    "suppliers) joined back — the classic double-correlated query "
    "runs with a single extra shuffle of one small row per order "
    "instead of two fact self-joins; top-20 is "
    "TakeOrderedAndProject (adapted: late = shipped >120 days after "
    "order date, region-1 nations, since this schema has no "
    "commit/receipt dates)",
)
def q21_sole_late_supplier_blame(spark, sf_dir):
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 1)
        .select("n_nationkey")
    )
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    l = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .withColumn(
            "is_late",
            (F.datediff("l_shipdate", "o_orderdate") > 120).cast("int"),
        )
    )
    # one aggregate answers both correlated subqueries: how many
    # distinct suppliers touched the order, and how many were late
    per_order = l.groupBy(F.col("l_orderkey").alias("agg_key")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    blamed = (
        l.filter((F.col("o_orderstatus") == "F") & (F.col("is_late") == 1))
        .join(per_order, F.col("l_orderkey") == F.col("agg_key"))
        # someone else touched the order, but no OTHER supplier was late
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        blamed.join(s, blamed.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@query(
    "q22_dormant_rich_customers",
    oracle="""
    WITH pos AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_bal
        FROM customer
        WHERE c_acctbal > 0 AND c_nationkey IN (1, 5, 9, 13, 17, 21)
    )
    SELECT c.c_nationkey AS cntry, COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c, pos
    WHERE c.c_nationkey IN (1, 5, 9, 13, 17, 21)
      AND c.c_acctbal > pos.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY cntry ORDER BY cntry
    """,
    doc="TPC-H Q22 shape (global sales opportunity): scalar AVG "
    "subquery broadcast via crossJoin (avg computed as exact decimal "
    "sum / count so both engines divide identical doubles), NOT "
    "EXISTS as a LEFT ANTI join against recent orders — the date "
    "filter prunes the anti-join build side at the scan (adapted: "
    "nation keys stand in for phone country codes; 'dormant' = no "
    "order since 1999, since every customer in the testdata has "
    "at least one lifetime order)",
)
def q22_dormant_rich_customers(spark, sf_dir):
    keys = [1, 5, 9, 13, 17, 21]
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(keys))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(_dec("c_acctbal")).cast("double") / F.count("*")
        ).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(pos))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntry")
    )


@query(
    "bloom_semi_join_revenue",
    # The bloom prefilter keeps every true member (no false negatives
    # by construction) and the exact semi-join removes the false
    # positives, so the result EQUALS the plain semi-join — the
    # oracle needs no bloom at all.
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="explicit bloom-filter runtime semi-join (Kirsch-Mitzenmacher-"
    "style md5 hash family, 4096 bits / 3 hashes): the dim-side "
    "filter keys aggregate DISTRIBUTEDLY into 64 packed int64 words "
    "(one bit_or hash-agg; driver materializes the FILTER, never the "
    "keys), the fact side drops non-members map-only inside its scan "
    "stage, and the exact semi-join then shuffles survivors only — "
    "the app-level form of the runtime filter Spark's planner injects "
    "natively when it can (spark.sql.optimizer.runtime.bloomFilter), "
    "for cross-system pushdown or pre-shuffle app filtering where it "
    "can't.  Result provably equals the plain semi-join (extension: "
    "join-optimization family; complements the bucketed co-located "
    "join)",
)
def bloom_semi_join_revenue(spark, sf_dir):
    from qaapi_spark.operators.joins import bloom_filter_bits, bloom_prefilter

    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = t(spark, sf_dir, "orders")
    bits = bloom_filter_bits(c, "c_custkey")
    pre = bloom_prefilter(o, "o_custkey", bits)
    # growing dim: no broadcast hint — AQE picks the strategy
    exact = pre.join(
        c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "left_semi"
    )
    return (
        exact.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "rollup_revenue_region_nation",
    # GROUPING() disambiguates real NULLs from subtotal rows in both
    # engines; revenue is ROUND(SUM(double), 2) — the established
    # revenue-aggregate parity posture.
    oracle="""
    SELECT COALESCE(r.r_name, '(all)') AS region,
           CASE WHEN GROUPING(n.n_name) = 1 THEN '(all)'
                ELSE n.n_name END AS nation,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    ORDER BY region, nation
    """,
    doc="hierarchical subtotals via ROLLUP grouping sets (region -> "
    "nation -> grand total): ONE pass over the joined relation "
    "produces all three aggregation levels — Spark expands the "
    "grouping sets inside a single Expand+HashAggregate, so the fact "
    "table is scanned and shuffled once instead of once per level; "
    "GROUPING() tags subtotal rows so they can't collide with real "
    "NULL keys (extension: §2.5 aggregate surface — grouping sets "
    "were the one classic aggregate form the catalog lacked)",
)
def rollup_revenue_region_nation(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    j = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
    )
    agg = j.rollup("r_name", "n_name").agg(
        F.count("o_orderkey").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.grouping("n_name").alias("__gn"),
    )
    return agg.select(
        F.coalesce(F.col("r_name"), F.lit("(all)")).alias("region"),
        F.when(F.col("__gn") == 1, F.lit("(all)"))
        .otherwise(F.col("n_name"))
        .alias("nation"),
        "n_orders",
        "revenue",
    ).orderBy("region", "nation")


@query(
    "pivot_status_by_priority",
    # PIVOT compiles to conditional aggregation in both engines; the
    # pivot domain is pinned explicitly ('F','O','P') so the output
    # schema is static — the scale-correct form (an unpinned pivot
    # needs a distinct-scan planning pass first).
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) AS status_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
               AS BIGINT) AS status_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
               AS BIGINT) AS status_p
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="PIVOT (long -> wide reshape): order counts per priority "
    "pivoted over the pinned status domain {F, O, P} — compiles to "
    "one conditional hash-aggregate (no extra shuffle vs the plain "
    "groupBy); pinning the pivot values keeps the plan single-pass "
    "at 100 TB, where the values-discovery distinct scan of an "
    "unpinned pivot would read the fact table twice (extension: "
    "§2.5 aggregate surface)",
)
def pivot_status_by_priority(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    ).orderBy("o_orderpriority")


@query(
    "unpivot_customer_measures",
    # exact integer/double pass-through; the long layout is the
    # UNION-ALL relation in both engines
    oracle="""
    SELECT c_custkey, 'acctbal' AS measure,
           CAST(c_acctbal AS DOUBLE) AS val
    FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE)
    FROM customer
    ORDER BY c_custkey, measure
    """,
    doc="UNPIVOT (wide -> long reshape, the PIVOT inverse): customer "
    "measure columns melt into (key, measure, val) rows via the "
    "native unpivot operator — a Generate (explode) over a constant "
    "2-element struct array, map-only, no shuffle beyond the final "
    "presentation sort; the long layout is what feature stores and "
    "EAV-style metric tables ingest (extension: §2.5/§2.3 reshape "
    "surface, complements pivot_status_by_priority)",
)
def unpivot_customer_measures(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return (
        c.unpivot("c_custkey", ["acctbal", "nationkey"], "measure", "val")
        .orderBy("c_custkey", "measure")
    )


@query(
    "audit_orders_lineitem_reconciliation",
    # The per-order recomputation rounds its float SUM to 2 dp (4-6
    # terms, error orders below the grain); every downstream value —
    # the diff, the 0.01 tolerance test, the max — is then arithmetic
    # on identical doubles in both engines.  NULL-computed orders
    # (no lineitems) count separately and drop out of SUM/MAX by
    # standard aggregate NULL-skip in both engines.
    oracle="""
    WITH li AS (
        SELECT l_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                   AS computed
        FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
        SELECT o.o_orderpriority,
               ABS(o.o_totalprice - li.computed) AS adiff,
               li.computed IS NULL AS missing
        FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN missing THEN 1 ELSE 0 END) AS BIGINT)
               AS n_missing,
           CAST(SUM(CASE WHEN NOT missing AND adiff > 0.01
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
           ROUND(MAX(adiff), 2) AS max_abs_diff,
           ROUND(SUM(adiff), 2) AS total_abs_diff
    FROM j GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="source-vs-target reconciliation audit (the QA heart of an "
    "ELT pipeline — exactly what a user of the reference's QA API "
    "runs after every load): recompute each order's total from its "
    "line items and tie it out against the stored o_totalprice with "
    "a 0.01 tolerance, reporting mismatch counts, orders with no "
    "detail rows, and the worst/total divergence per priority class. "
    "One lineitem aggregate (map-side combined), one orderkey join, "
    "one rollup — at 100 TB the detail table is touched exactly "
    "once (extension: data-quality family; complements "
    "dq_checks_orders' single-table constraints with a CROSS-TABLE "
    "consistency contract)",
)
def audit_orders_lineitem_reconciliation(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    li = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("computed")
        )
    )
    j = o.join(li, o["o_orderkey"] == li["l_orderkey"], "left").select(
        "o_orderpriority",
        F.abs(F.col("o_totalprice") - F.col("computed")).alias("adiff"),
        F.col("computed").isNull().alias("missing"),
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.when(F.col("missing"), 1).otherwise(0)).alias("n_missing"),
            F.sum(
                F.when(~F.col("missing") & (F.col("adiff") > 0.01), 1).otherwise(0)
            ).alias("n_mismatch"),
            F.round(F.max("adiff"), 2).alias("max_abs_diff"),
            F.round(F.sum("adiff"), 2).alias("total_abs_diff"),
        )
        .orderBy("o_orderpriority")
    )
