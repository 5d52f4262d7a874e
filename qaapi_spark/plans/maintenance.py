"""Table-maintenance semantics as queries (reference J2/J3/J5,
SURVEY.md §2.4) — the MERGE/DELETE statements of Update...sql expressed
as (target, batch) -> resulting relation over the `orders` table, so
the DuckDB oracle can verify the post-maintenance state.

The batch is a trailing-window increment (the reference re-extracts the
last 16/30 days and reconciles — Start.py:19,39); these queries split
`orders` by o_orderdate the same way.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from qaapi_spark.operators.maintain import delete_semi_anti, merge_insert_only, merge_upsert
from qaapi_spark.plans.catalog import query, t

_CUT_TARGET = "2000-01-01"  # target := orders strictly before this date
_CUT_BATCH = "1999-01-01"  # batch  := orders on/after this date (overlaps target)

_ORDER_COLS = "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"


def _split(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderdate") < F.lit(_CUT_TARGET).cast("timestamp"))
    batch = o.filter(F.col("o_orderdate") >= F.lit(_CUT_BATCH).cast("timestamp"))
    return target, batch


@query(
    "j2_merge_insert_only_orders",
    oracle=f"""
    WITH target AS (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '{_CUT_TARGET}'),
         batch  AS (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '{_CUT_BATCH}')
    SELECT {_ORDER_COLS} FROM target
    UNION ALL
    SELECT {_ORDER_COLS} FROM batch b
    WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.o_orderkey = b.o_orderkey)
    """,
    doc="J2 MERGE WHEN NOT MATCHED INSERT (anti-join+append); ref Update...sql:36-53",
)
def j2_merge_insert_only_orders(spark, sf_dir):
    target, batch = _split(spark, sf_dir)
    return merge_insert_only(target, batch, ["o_orderkey"])


@query(
    "j3_merge_upsert_orders",
    oracle=f"""
    WITH target AS (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '{_CUT_TARGET}'),
         batch AS (
            SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                   o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
            FROM orders WHERE o_orderdate >= TIMESTAMP '{_CUT_BATCH}'
         )
    SELECT t.o_orderkey, t.o_custkey, b.o_orderstatus, b.o_totalprice, t.o_orderdate, t.o_orderpriority
    FROM target t JOIN batch b ON t.o_orderkey = b.o_orderkey
    UNION ALL
    SELECT {_ORDER_COLS} FROM target t
    WHERE NOT EXISTS (SELECT 1 FROM batch b WHERE b.o_orderkey = t.o_orderkey)
    UNION ALL
    SELECT {_ORDER_COLS} FROM batch b
    WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.o_orderkey = b.o_orderkey)
    """,
    doc="J3 MERGE upsert updating a column subset (o_orderdate preserved on match, "
    "like evaluated_date at Update...sql:128-130); ref Update...sql:97-134",
)
def j3_merge_upsert_orders(spark, sf_dir):
    target, batch = _split(spark, sf_dir)
    # +1000.0 instead of *1.1: identical IEEE op in Spark and DuckDB,
    # no rounding boundary to disagree on.
    batch = batch.withColumn("o_orderstatus", F.lit("U")).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000.0
    )
    return merge_upsert(
        target, batch, ["o_orderkey"], update_cols=["o_orderstatus", "o_totalprice"]
    )


@query(
    "j5_delete_semi_anti_orders",
    oracle=f"""
    WITH batch AS (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '{_CUT_BATCH}')
    SELECT {_ORDER_COLS} FROM orders o
    WHERE NOT (o.o_custkey IN (SELECT o_custkey FROM batch)
               AND o.o_orderkey NOT IN (SELECT o_orderkey FROM batch))
    """,
    doc="J5 DELETE WHERE k IN scope AND k2 NOT IN keep (semi+anti, null-safe); "
    "ref Update...sql:88-92",
)
def j5_delete_semi_anti_orders(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    batch = o.filter(F.col("o_orderdate") >= F.lit(_CUT_BATCH).cast("timestamp"))
    return delete_semi_anti(
        o,
        scope=batch.select(F.col("o_custkey")),
        scope_keys=["o_custkey"],
        keep=batch.select(F.col("o_orderkey")),
        keep_keys=["o_orderkey"],
    )


@query(
    "mv_incremental_daily_revenue",
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders,
           ROUND(MAX(o_totalprice), 2) AS max_order
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-06-01'
      AND o_orderdate < TIMESTAMP '2000-02-01'
    GROUP BY day ORDER BY day
    """,
    doc="incremental materialized-view refresh (distributive "
    "aggregates): the daily-revenue MV over the base period folds in "
    "a new month's batch via operators/maintain.merge_partial_"
    "aggregates — partial SUM/COUNT/MAX merge as sum/sum/max, so the "
    "refresh re-aggregates ONLY the batch and shuffles 2x|MV| "
    "pre-aggregated rows, never rescanning the base fact table; the "
    "oracle proves merge(MV(base), agg(delta)) == MV(base UNION "
    "delta) (extension: MV maintenance; reference trailing-window "
    "reconciliation Start.py:19,39 applied to aggregates)",
)
def mv_incremental_daily_revenue(spark, sf_dir):
    from qaapi_spark.operators.maintain import merge_partial_aggregates

    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1999-06-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-02-01").cast("timestamp"))
    )
    base = o.filter(F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
    delta = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))

    def daily_partial(df):
        return (
            df.groupBy(F.col("o_orderdate").cast("date").alias("day"))
            .agg(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
                F.count("*").alias("n_orders"),
                F.round(F.max("o_totalprice"), 2).alias("max_order"),
            )
        )

    mv = daily_partial(base)  # the stored MV (materialized in a real pipeline)
    refreshed = merge_partial_aggregates(
        mv,
        daily_partial(delta),
        keys=["day"],
        merges={"rev": "sum", "n_orders": "sum", "max_order": "max"},
    )
    return refreshed.select(
        "day",
        F.col("rev").cast("double").alias("revenue"),
        "n_orders",
        "max_order",
    ).orderBy("day")


@query(
    "mv_incremental_revenue_with_deletes",
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders,
           ROUND(MAX(o_totalprice), 2) AS max_order
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-06-01'
      AND o_orderdate < TIMESTAMP '2000-02-01'
      AND NOT (o_orderkey % 10 = 3)
    GROUP BY day ORDER BY day
    """,
    doc="RETRACTION-aware incremental MV maintenance (VERDICT r12 next "
    "#6 — the reference's J5 delete-then-reconcile, 'Update Calabrio "
    "Tables from Staging Tables (D_POST_INSTALL).sql':85-92, applied "
    "to aggregate state): a GDPR-style delete batch's per-day partial "
    "aggregates fold OUT of the daily-revenue MV via operators/"
    "maintain.retract_partial_aggregates — SUM/COUNT subtract exactly "
    "(DECIMAL partials, no float drift), MAX is not invertible so "
    "only the days whose retracted max EQUALS the standing max "
    "recompute from their own (partition-prunable) base slice, and a "
    "day whose count reaches zero leaves the view.  The oracle proves "
    "retract(MV(base), agg(deleted)) == MV(base MINUS deleted) "
    "(extension: IVM under deletion, completing the retraction story "
    "from dedup state to aggregate state)",
)
def mv_incremental_revenue_with_deletes(spark, sf_dir):
    from qaapi_spark.operators.maintain import retract_partial_aggregates

    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1999-06-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-02-01").cast("timestamp"))
    )
    pred = F.col("o_orderkey") % 10 == 3
    deleted = o.filter(pred)

    def daily_partial(df):
        return (
            df.groupBy(F.col("o_orderdate").cast("date").alias("day"))
            .agg(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
                F.count("*").alias("n_orders"),
                F.round(F.max("o_totalprice"), 2).alias("max_order"),
            )
        )

    mv = daily_partial(o)  # the stored MV, built before the takedown

    def recompute(days):
        # per-day recompute over the LIVE base slice of the affected
        # days only (at scale: partition-pruned by the date key)
        live = o.filter(~pred).withColumn(
            "day", F.col("o_orderdate").cast("date")
        )
        return daily_partial(
            live.join(F.broadcast(days), "day", "left_semi").drop("day")
        )

    refreshed = retract_partial_aggregates(
        mv,
        daily_partial(deleted),
        keys=["day"],
        merges={"rev": "sum", "n_orders": "sum", "max_order": "max"},
        count_col="n_orders",
        recompute=recompute,
    )
    return refreshed.select(
        "day",
        F.col("rev").cast("double").alias("revenue"),
        "n_orders",
        "max_order",
    ).orderBy("day")


@query(
    "mv_incremental_join_enrichment",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY segment ORDER BY segment
    """,
    doc="incremental JOIN-view maintenance (insert-only fact deltas, "
    "static dim): the enriched-orders MV (orders x customer) is "
    "MATERIALIZED to parquet for the base period, then a later batch "
    "is maintained as MV' = MV UNION (delta JOIN dim) via a file-level "
    "append — the delta join touches ONLY the batch (dim broadcast), "
    "the base is never rescanned or rewritten, which is the entire "
    "point of keeping a join MV at 100 TB; the oracle proves the "
    "maintained view aggregates identically to the full join "
    "(extension: IVM for joins, complements the distributive-agg MV "
    "above)",
)
def mv_incremental_join_enrichment(spark, sf_dir):
    from qaapi_spark.operators.maintain import append, overwrite
    from qaapi_spark.session import scratch_dir

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    cutoff = F.lit("2000-01-01").cast("timestamp")

    def enrich(df):
        return df.join(F.broadcast(c), "o_custkey").select(
            "o_orderkey", "o_totalprice", "c_mktsegment"
        )

    path = scratch_dir("mv_join_") + "/enriched_orders"
    overwrite(enrich(o.filter(F.col("o_orderdate") < cutoff)), path)
    append(enrich(o.filter(F.col("o_orderdate") >= cutoff)), path)
    mv = spark.read.parquet(path)
    return (
        mv.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("segment")
    )


@query(
    "mv_incremental_join_enrichment_with_deletes",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE NOT (o.o_orderkey % 10 = 3)
    GROUP BY segment ORDER BY segment
    """,
    doc="RETRACTION-aware JOIN-view maintenance (VERDICT r13 next #3 — "
    "the join half of the MV retraction arc; the aggregate half landed "
    "r13 as retract_partial_aggregates): the enriched-orders MV is "
    "materialized as an epoch-keyed store (base epoch 0, delta append "
    "epoch 1), then a takedown batch of base keys is retracted via "
    "operators/maintain.retract_join_view — an O(|batch|) epoch-keyed "
    "tombstone write plus a read-side broadcast anti-join, key-local "
    "because an enriched row exists iff its base fact row exists (dim "
    "static).  The base is never rescanned and the view files are not "
    "rewritten on the delete path; physical erasure is deferred to "
    "purge_tombstoned (exercised in tests — a purge mid-query would "
    "invalidate this lazy plan's file listing).  Reference precedent: "
    "J5 delete-then-reconcile 'Update Calabrio Tables from Staging "
    "Tables (D_POST_INSTALL).sql':85-92 on a joined artifact.  The "
    "oracle proves retract(MV(base JOIN dim), keys) == (base MINUS "
    "keys) JOIN dim",
)
def mv_incremental_join_enrichment_with_deletes(spark, sf_dir):
    from qaapi_spark.operators.maintain import retract_join_view
    from qaapi_spark.session import scratch_dir

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    cutoff = F.lit("2000-01-01").cast("timestamp")

    def enrich(df):
        return df.join(F.broadcast(c), "o_custkey").select(
            "o_orderkey", "o_totalprice", "c_mktsegment"
        )

    root = scratch_dir("mv_join_rt_")
    path = root + "/enriched_orders"
    del_root = root + "/deleted"
    # epoch-keyed store: base materialization, then the delta append
    enrich(o.filter(F.col("o_orderdate") < cutoff)).write.mode(
        "overwrite"
    ).parquet(path + "/epoch=0")
    enrich(o.filter(F.col("o_orderdate") >= cutoff)).write.mode(
        "overwrite"
    ).parquet(path + "/epoch=1")
    deleted = o.filter(F.col("o_orderkey") % 10 == 3).select("o_orderkey")
    live = retract_join_view(
        spark, path, del_root, deleted, "o_orderkey", epoch=2
    )
    return (
        live.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("segment")
    )


@query(
    "mv_incremental_join_dim_update",
    oracle="""
    WITH dim AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 2 THEN 'REBRANDED'
                    ELSE c_mktsegment END AS c_mktsegment
        FROM customer
    )
    SELECT d.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN dim d ON o.o_custkey = d.c_custkey
    GROUP BY segment ORDER BY segment
    """,
    doc="dimension-UPDATE maintenance of a join-view MV (r15 — the "
    "third leg of the join-MV arc: inserts r14, deletes r14, updates "
    "here; the reference's J3 MERGE-upsert update-matched arm applied "
    "to a derived join artifact): the enriched-orders store (epoch 0 "
    "base + epoch 1 delta, join key RETAINED in the view schema) "
    "absorbs an SCD1 dim overwrite — customers with c_custkey % 7 = 2 "
    "are rebranded — via operators/maintain.update_join_view_dim: a "
    "broadcast semi-join selects exactly the affected keys' rows, "
    "their current version re-joins the replacement dim rows, and the "
    "patched rows land as ONE epoch-keyed delta read latest-wins per "
    "fact key; untouched keys' files are never rewritten.  The oracle "
    "proves update(MV(base JOIN dim), dim') == base JOIN dim'",
)
def mv_incremental_join_dim_update(spark, sf_dir):
    from qaapi_spark.operators.maintain import update_join_view_dim
    from qaapi_spark.session import scratch_dir

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    cutoff = F.lit("2000-01-01").cast("timestamp")

    def enrich(df):
        # join key kept in the view: dim updates need it to find rows
        return df.join(F.broadcast(c), "o_custkey").select(
            "o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment"
        )

    path = scratch_dir("mv_join_upd_") + "/enriched_orders"
    enrich(o.filter(F.col("o_orderdate") < cutoff)).write.mode(
        "overwrite"
    ).parquet(path + "/epoch=0")
    enrich(o.filter(F.col("o_orderdate") >= cutoff)).write.mode(
        "overwrite"
    ).parquet(path + "/epoch=1")
    patch = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 7 == 2)
        .select(
            F.col("c_custkey").alias("o_custkey"),
            F.lit("REBRANDED").alias("c_mktsegment"),
        )
    )
    live = update_join_view_dim(
        spark, path, patch, key_col="o_orderkey",
        join_key_col="o_custkey", epoch=2,
    )
    return (
        live.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("segment")
    )


@query(
    "mv_join_enrichment_autocompact",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE NOT (o.o_orderkey % 10 IN (1, 3, 7))
    GROUP BY segment ORDER BY segment
    """,
    doc="tombstone-debt compaction under REPEATED takedowns (r15, "
    "VERDICT r14 next #3 / wrong #2: retract_join_view's read "
    "filtered the union of ALL standing tombstone epochs under a "
    "forced broadcast, growing without bound until an out-of-band "
    "purge nothing scheduled): three successive takedown batches "
    "(keys % 10 in 3, 7, 1 — 10/20/30% cumulative debt) cross the "
    "purge_debt_ratio=0.25 trigger on the third epoch, auto-running "
    "maintain.compact_view — purge_tombstoned's crash-safe physical "
    "erasure then a tombstone-store reset — BEFORE the returned plan "
    "is built, so the final read anti-joins nothing and the swept "
    "store plus empty tombstone set carry this query's value hash.  "
    "Debt and view row counts come from parquet footer stats "
    "(driver-side, no job).  The oracle proves the relation is "
    "unchanged through the compaction: retract^3 then purge == base "
    "MINUS all three key sets JOIN dim",
)
def mv_join_enrichment_autocompact(spark, sf_dir):
    from qaapi_spark.operators.maintain import retract_join_view
    from qaapi_spark.session import scratch_dir

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    cutoff = F.lit("2000-01-01").cast("timestamp")

    def enrich(df):
        return df.join(F.broadcast(c), "o_custkey").select(
            "o_orderkey", "o_totalprice", "c_mktsegment"
        )

    root = scratch_dir("mv_join_ac_")
    path = root + "/enriched_orders"
    del_root = root + "/deleted"
    enrich(o.filter(F.col("o_orderdate") < cutoff)).write.mode(
        "overwrite"
    ).parquet(path + "/epoch=0")
    enrich(o.filter(F.col("o_orderdate") >= cutoff)).write.mode(
        "overwrite"
    ).parquet(path + "/epoch=1")
    live = None
    for i, rem in enumerate((3, 7, 1)):
        deleted = o.filter(F.col("o_orderkey") % 10 == rem).select(
            "o_orderkey"
        )
        live = retract_join_view(
            spark, path, del_root, deleted, "o_orderkey", epoch=2 + i
        )
    return (
        live.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("segment")
    )
