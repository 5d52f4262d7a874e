"""Scale-posture assertions for the dedup catalog defaults.

VERDICT r1 next-round #2: the catalog-default `dedup_ngram_jaccard` and
`dedup_embedding_cosine` must not collect the corpus to the driver on
the scale path.  `dedup_ngram_jaccard` binds the sanctioned regime
selector (`ngram_jaccard_pairs_auto`): open vocabularies — the only
regime that exists at 100 TB — take the prefix-filtered inverted-index
plan with nothing driver-side; the dense bitset/GEMM kernel is chosen
only when an observation pass proves the corpus is small-vocabulary
AND bounded, where the all-hot posting lists make the index degenerate
to n^2 anyway.  The driver-collect kernels stay reachable as the
explicit `*_dense` / `*_broadcast` catalog entries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from qaapi_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _open_vocab_docs(spark, n_docs=400, words_per_doc=16):
    """Synthetic corpus whose bigram vocabulary (> 4096) forces the
    sparse regime: every doc gets unique id-derived tokens."""
    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.array(
                    *[
                        F.concat(F.lit(f"w{k}_"), F.col("id").cast("string"))
                        for k in range(words_per_doc)
                    ]
                ),
            ).alias("text"),
        )
    )


def test_sparse_jaccard_plan_is_fully_distributed(spark):
    from qaapi_spark.operators.dedup import ngram_jaccard_pairs_sparse

    d = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(ngram_jaccard_pairs_sparse(d, 0.4, n=2))
    # corpus scan stays in the plan (nothing consumed driver-side) ...
    assert "parquet" in p and "doc_id" in p
    assert "LocalTableScan" not in p
    # ... and the whole kernel is Catalyst — no Python stage at all
    assert "MapInPandas" not in p and "FlatMapGroupsInPandas" not in p
    # prefix filtering is present: df-rank window + verification join
    assert "row_number" in p and "array_intersect" in p


def test_auto_selector_picks_sparse_for_open_vocab(spark):
    from qaapi_spark.operators.dedup import ngram_jaccard_pairs_auto

    p = _plan(ngram_jaccard_pairs_auto(_open_vocab_docs(spark), 0.4, n=2))
    # the scale regime must be the distributed plan
    assert "MapInPandas" not in p and "LocalTableScan" not in p
    assert "array_intersect" in p


def test_auto_selector_matches_sparse_output_on_testdata(spark):
    """Both kernels are exact => identical pairs whichever regime the
    selector picks on the (small-vocab) driver testdata."""
    from qaapi_spark.operators.dedup import (
        ngram_jaccard_pairs_auto,
        ngram_jaccard_pairs_sparse,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    auto = sorted(map(tuple, ngram_jaccard_pairs_auto(d, 0.4, n=2).collect()))
    sparse = sorted(map(tuple, ngram_jaccard_pairs_sparse(d, 0.4, n=2).collect()))
    assert auto == sparse
    assert len(auto) > 0


def test_prefix_filter_exactness_open_vocab(spark):
    """Prefix-filtered candidates lose no qualifying pair: compare the
    sparse kernel against the dense kernel on a corpus with planted
    near-duplicates and unique filler."""
    from qaapi_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_sparse,
    )

    base = _open_vocab_docs(spark, n_docs=60, words_per_doc=12)
    # plant near-dups: doc_id+1000 repeats doc_id's text with one extra word
    dups = base.select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
    )
    corpus = base.unionByName(dups)
    sparse = sorted(map(tuple, ngram_jaccard_pairs_sparse(corpus, 0.5, n=2).collect()))
    dense = sorted(map(tuple, ngram_jaccard_pairs(corpus, 0.5, n=2).collect()))
    assert sparse == dense
    assert len(sparse) >= 60  # every planted pair found


def test_default_embedding_cosine_is_blocked_grid(spark):
    df = CATALOG["dedup_embedding_cosine"].fn(spark, SF)
    p = _plan(df)
    assert "parquet" in p and "vec_id" in p
    assert "LocalTableScan" not in p
    # blocked miner = applyInPandas over (bi, bj) groups; the broadcast
    # fast path would show MapInPandas instead (corpus collected+bcast)
    assert "FlatMapGroupsInPandas" in p


def test_hll_portable_plan_is_two_hash_aggregates(spark):
    """The portable HLL must stay a pure aggregate pipeline: register
    build (group+bucket hash-agg with map-side partial) into a
    per-group fold — no collect, no python, no join."""
    df = CATALOG["sketch_hll_portable"].fn(spark, SF)
    p = _plan(df)
    assert "MapInPandas" not in p and "FlatMapGroupsInPandas" not in p
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in phys
    assert "Join" not in phys  # registers fold per-group, never join


def test_histogram_percentiles_stats_side_broadcasts(spark):
    """The two-pass histogram sketch joins each row to its group's
    (lo, hi) — group-count-sized, so it must broadcast, never shuffle
    the data side on the stats join."""
    df = CATALOG["sketch_percentiles_histogram"].fn(spark, SF)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in phys
    assert "SortMergeJoin" not in phys


def test_decode_features_is_maponly(spark):
    """Payload decode must never shuffle the media relation: metadata
    synthesis + Arrow kernel are one map-only pipeline."""
    from qaapi_spark.operators.multimodal import decode_features, synthesize_media
    from qaapi_spark.plans.catalog import t

    m = synthesize_media(t(spark, SF, "documents"))
    codes = decode_features(m)
    phys = codes._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in phys
    assert "MapInPandas" in phys


def test_cohort_join_broadcasts_the_cohort_side(spark):
    """The cohort relation (<= one row per user) must broadcast; the
    event side must not shuffle for the join."""
    df = CATALOG["cohort_retention_weekly"].fn(spark, SF)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in phys
    assert "SortMergeJoin" not in phys


def test_funnel_is_single_aggregate_pass(spark):
    """Funnel stages come from ONE conditional-MIN aggregate per user —
    a single shuffle, no self-joins over the event stream."""
    from qaapi_spark.plans.catalog import t as tbl
    from pyspark.sql import functions as F

    e = tbl(spark, SF, "events")
    stages = e.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
            for s in ("signup", "click", "purchase")
        ]
    )
    phys = stages._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Exchange") == 1, phys
    assert "Join" not in phys


def test_dq_checks_single_pass_plus_fk_join(spark):
    """All aggregate constraints fold into one scan; only the FK check
    adds a broadcast anti-join."""
    from qaapi_spark.operators.quality import in_range, not_null, run_checks, unique
    from qaapi_spark.plans.catalog import t as tbl

    o = tbl(spark, SF, "orders")
    agg = o.agg(
        *[
            e.cast("long").alias(n)
            for n, e in [not_null("o_orderkey"), unique("o_orderkey"), in_range("o_totalprice", 0, 10**6)]
        ]
    )
    phys = agg._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in phys
    assert phys.count("FileScan") == 1


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_round3_ops_have_distributed_shapes(spark):
    """Plan-shape guards for the round-3 wave: no cartesian products,
    no corpus broadcasts, partial (map-side) aggregation where the
    reduction is the scale lever."""
    from qaapi_spark.plans import CATALOG

    sf = "/root/testdata/sf0.001"

    # covariance (round-6 partial-Gram shape): one Arrow kernel pass
    # accumulates the integer Gram per partition, so the shuffle input
    # is O(partitions * d^2) rows, and the final cell sum still
    # partial-aggregates (assert on the operator — the catalog query
    # memoizes through a localCheckpoint, which replaces the plan with
    # Scan ExistingRDD)
    from qaapi_spark.operators.linalg import covariance_upper
    from qaapi_spark.sources.tables import read_table

    cov = covariance_upper(read_table(spark, sf, "embeddings"))
    p = _physical(cov)
    assert "CartesianProduct" not in p
    assert "MapInPandas" in p, "expected the partial-Gram Arrow kernel"
    assert p.count("HashAggregate") >= 2, "expected partial+final aggregate"
    assert "Generate" not in p, "product-row explode must be gone"

    # PCA projection: map-only over the corpus — a single scan, no join
    # against the embeddings relation beyond the covariance kernel
    pca = CATALOG["emb_pca_pc1_power"].fn(spark, sf)
    pp = _physical(pca)
    assert "Join" not in pp.split("Scan parquet")[0], pp

    # containment: inverted-index equi-join, never a cartesian product
    cont = CATALOG["dedup_containment_pairs"].fn(spark, sf)
    cp = _physical(cont)
    assert "CartesianProduct" not in cp
    assert "BroadcastNestedLoopJoin" not in cp


def test_pagerank_plan_joins_on_edges_not_cartesian(spark):
    from pyspark.sql import functions as F

    from qaapi_spark.operators.graph import pagerank

    edges = spark.range(0, 200).select(
        F.col("id").alias("id_a"), ((F.col("id") * 7 + 1) % 200).alias("id_b")
    )
    pr = pagerank(edges, iters=3)
    p = _physical(pr)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_containment_regime_crossover():
    """The containment selector prices the sparse path (sum(df^2) =
    posting-join rows; no AllPairs prefix bound prunes it) against the
    dense kernel's fixed costs, not FLOPs alone (VERDICT r6 #3)."""
    from qaapi_spark.operators.dedup import (
        SPARSE_MAX_JOINED_ROWS,
        _containment_regime,
    )

    budgets = dict(
        dense_max_vocab=4096, dense_max_docs=200_000, dense_max_flop=2.5e12
    )
    # sf0.1-shaped stats (nd=5000, nv=931, sum_df2=73.2M): the hot
    # vocabulary makes the unpruned posting join ~16 s while dense
    # runs ~2.4 s -> dense
    assert _containment_regime(5000, 931, 73_200_955, **budgets) == "dense"
    # cold-vocabulary corpus (posting lists short, sum_df2 below the
    # dense path's fixed pack+collect+broadcast cost) -> sparse even
    # though dense is comfortably within its budgets
    assert _containment_regime(5000, 931, 2_000_000, **budgets) == "sparse"
    # hot but over the dense budgets -> sparse is the only option
    assert _containment_regime(300_000, 944, 1_200_000_000, **budgets) == "sparse"
    assert _containment_regime(20_000, 8192, 1_200_000_000, **budgets) == "sparse"
    # exactly at the sparse ceiling -> still sparse (<= semantics)
    assert (
        _containment_regime(5000, 931, int(SPARSE_MAX_JOINED_ROWS), **budgets)
        == "sparse"
    )


def test_committer_v2_scoped_to_no_speculation(spark):
    """VERDICT r15 next #6: committer v2's task commit is non-atomic
    under concurrent attempts, so the tuned session may only apply it
    while speculative execution is off — enforced in code, with the
    deployment rule in SCALE.md ("Committer" section)."""
    from qaapi_spark.session import tune_session

    # the real tuned session: speculation off => v2 + no _SUCCESS
    assert (
        spark.sparkContext.getConf().get("spark.speculation", "false").lower()
        == "false"
    )
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    assert hc.get("mapreduce.fileoutputcommitter.algorithm.version") == "2"
    assert hc.get("mapreduce.fileoutputcommitter.marksuccessfuljobs") == "false"

    # guard branch: a speculating session must keep the v1 committer
    class _Rec(dict):
        def set(self, k, v):
            self[k] = v

    class _FakeSpark:
        def __init__(self, speculation):
            self.conf = _Rec()
            self.hc = _Rec()
            fake = self

            class _SC:
                class _jsc:  # noqa: N801 - mimic py4j attribute shape
                    @staticmethod
                    def hadoopConfiguration():
                        return fake.hc

                @staticmethod
                def getConf():
                    class _C:
                        @staticmethod
                        def get(key, default=None):
                            return speculation if key == "spark.speculation" else default

                    return _C()

            self.sparkContext = _SC()

    on = _FakeSpark("true")
    tune_session(on)
    assert "mapreduce.fileoutputcommitter.algorithm.version" not in on.hc
    assert on.hc["mapreduce.fileoutputcommitter.marksuccessfuljobs"] == "false"

    off = _FakeSpark("false")
    tune_session(off)
    assert off.hc["mapreduce.fileoutputcommitter.algorithm.version"] == "2"
