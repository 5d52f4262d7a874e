"""Curation operators: scale-shape assertions + local semantics.

Correctness vs DuckDB is covered by the oracle gate
(curation_* entries); these tests pin the *plan* properties that
matter at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_contamination_eval_side_broadcasts(spark):
    from qaapi_spark.operators.curation import benchmark_contamination

    d = spark.read.parquet(f"{SF}/documents.parquet")
    ev = d.filter(F.col("doc_id") % 17 == 0)
    plan = _phys(benchmark_contamination(d, ev, n=5, min_overlap=3))
    # the bounded eval index is the broadcast side; the corpus streams
    assert "BroadcastHashJoin" in plan


def test_training_order_has_no_global_window(spark):
    from qaapi_spark.operators.curation import training_order

    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = training_order(d, seed="seed0")
    plan = _phys(out)
    # the rank window must be partitioned by the hash bucket (a global
    # unpartitioned window would move every row to one partition)
    import re

    specs = re.findall(r"windowspecdefinition\((\w+)", plan)
    assert specs and all(s.startswith("bucket") for s in specs)


def test_training_order_is_dense_permutation(spark):
    from qaapi_spark.operators.curation import training_order

    d = spark.read.parquet(f"{SF}/documents.parquet")
    rows = training_order(d, seed="seed0").orderBy("train_rank").collect()
    n = d.count()
    assert [r.train_rank for r in rows] == list(range(1, n + 1))
    # key order == rank order (bucket composition is exact)
    keys = [r.shuffle_key for r in rows]
    assert keys == sorted(keys)
    # different seed => different permutation, same rank set
    rows2 = training_order(d, seed="seed1").orderBy("train_rank").collect()
    assert [r.doc_id for r in rows2] != [r.doc_id for r in rows]


def test_mixture_weights_shape(spark):
    from qaapi_spark.operators.curation import source_mixture_weights

    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = source_mixture_weights(d, {f"src{i}": 0.05 for i in range(20)}).collect()
    assert len(out) == 20
    total = sum(r.observed_frac for r in out)
    assert abs(total - 1.0) < 0.01
    # uniform data + uniform target => all weights ~1
    assert all(abs(r.weight - 1.0) < 0.25 for r in out)


def test_bigram_lm_nll_ranks_implausible_text(spark):
    from qaapi_spark.operators.curation import bigram_lm_nll

    # 20 fluent docs share their bigrams; one doc is a unique word salad
    rows = [(i, "the cat sat on the mat and the dog ran") for i in range(20)]
    rows.append((99, "zxq qwv plk mno vbn asd qpw oiu lkj hgf"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r.nll for r in bigram_lm_nll(df, k=0.5).collect()}
    salad = out.pop(99)
    assert all(salad > v for v in out.values())
