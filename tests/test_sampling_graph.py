"""Unit tests for the sampling/splitting, graph, and repetition/
redaction operators (training-data-pipeline extensions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from qaapi_spark.operators.graph import connected_components
from qaapi_spark.operators.sampling import (
    deterministic_split,
    frac_to_hex,
    stratified_sample,
)
from qaapi_spark.operators.textstats import redact, word_ngrams


def test_deterministic_split_fractions_and_stability(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = deterministic_split(df, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    counts = dict(
        out.groupBy("split").count().rdd.map(lambda r: (r["split"], r["count"])).collect()
    )
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    assert abs(counts["test"] / 2000 - 0.1) < 0.03
    # stability: identical assignment regardless of partitioning
    again = deterministic_split(
        df.repartition(13), "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    )
    a = sorted(out.select("doc_id", "split").collect())
    b = sorted(again.select("doc_id", "split").collect())
    assert a == b


def test_frac_to_hex_boundaries():
    assert frac_to_hex(0.0) == "0000"
    assert frac_to_hex(1.0) == "ffff"
    assert frac_to_hex(0.5) == "8000"


def test_stratified_sample_respects_rates(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)], "doc_id long, lang string"
    )
    out = stratified_sample(df, "lang", {"en": 0.5, "de": 0.1}, "doc_id")
    counts = dict(
        out.groupBy("lang").count().rdd.map(lambda r: (r["lang"], r["count"])).collect()
    )
    assert abs(counts["en"] / 1000 - 0.5) < 0.06
    assert abs(counts.get("de", 0) / 1000 - 0.1) < 0.04
    # unknown strata drop (default_fraction=0)
    df2 = df.withColumn("lang", F.lit("xx"))
    assert stratified_sample(df2, "lang", {"en": 0.5}, "doc_id").count() == 0


def test_connected_components_chain_triangle_isolated(spark):
    # chain 1-2-3, triangle 10-11-12, isolated 99
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 12, 99]], "node long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12)], "src long, dst long"
    )
    out = {r["node"]: r["comp"] for r in connected_components(nodes, edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_connected_components_long_chain_converges(spark):
    # a 9-node chain needs several propagation rounds
    n = 9
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src long, dst long")
    out = {r["node"]: r["comp"] for r in connected_components(nodes, edges).collect()}
    assert out == {i: 0 for i in range(n)}


def test_word_ngrams_positional_counts(spark):
    df = spark.createDataFrame([("a b a b",)], "text string")
    out = df.select(word_ngrams(F.col("text"), 2).alias("bg")).collect()[0]["bg"]
    assert out == ["a b", "b a", "a b"]  # non-distinct, in order
    one = df.select(word_ngrams(F.col("text"), 1).alias("u")).collect()[0]["u"]
    assert one == ["a", "b", "a", "b"]


def test_redact_email_and_numbers(spark):
    df = spark.createDataFrame(
        [("mail bob@example.com and 555 123",)], "text string"
    )
    red, n = redact(
        F.col("text"), "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"
    )
    row = df.select(red.alias("r"), n.alias("n")).collect()[0]
    assert row["r"] == "mail <EMAIL> and 555 123"
    assert row["n"] == 1
    red2, n2 = redact(F.col("text"), "[0-9]+", "<NUM>")
    row2 = df.select(red2.alias("r"), n2.alias("n")).collect()[0]
    assert row2["r"] == "mail bob@example.com and <NUM> <NUM>"
    assert row2["n"] == 2


def test_exact_k_per_group_counts_and_stability(spark):
    from qaapi_spark.operators.sampling import exact_k_per_group

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(100)] + [(1000, "tiny")],
        "doc_id long, grp string",
    )
    out = exact_k_per_group(df, "grp", 5, "doc_id")
    counts = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts == {"g0": 5, "g1": 5, "g2": 5, "tiny": 1}  # min(k, |group|)
    # partitioning-independent: same rows under a different layout
    again = exact_k_per_group(df.repartition(7), "grp", 5, "doc_id")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_pagerank_path_graph_mass_and_order(spark):
    from qaapi_spark.operators.graph import pagerank

    # path graph 1-2, 2-3: node 2 has degree 2 and must rank highest
    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    r = {row["node"]: row["pagerank"] for row in pagerank(edges, iters=20).collect()}
    assert set(r) == {1, 2, 3}
    assert r[2] > r[1] and r[2] > r[3]
    assert abs(r[1] - r[3]) < 1e-6  # symmetry of the path ends
    assert abs(sum(r.values()) - 1.0) < 1e-4  # mass conserved mod rounding


def test_pagerank_empty_graph_returns_empty(spark):
    """ADVICE r3 #5: zero near-dup pairs must yield an empty rank
    relation, not a ZeroDivisionError."""
    from qaapi_spark.operators.graph import pagerank

    edges = spark.createDataFrame([], "id_a long, id_b long")
    out = pagerank(edges, iters=3)
    assert out.columns == ["node", "pagerank"]
    assert out.count() == 0


def test_pagerank_deterministic_across_runs(spark):
    from qaapi_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], "id_a long, id_b long"
    )
    a = sorted(map(tuple, pagerank(edges, iters=7).collect()))
    b = sorted(map(tuple, pagerank(edges, iters=7).collect()))
    assert a == b
