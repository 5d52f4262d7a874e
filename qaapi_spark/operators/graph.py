"""Iterative graph operators (near-duplicate clustering).

Near-dup *pairs* (minhash / simhash / jaccard output) become dedup
*decisions* by grouping pairs into connected components and keeping
one representative per component.  Components are computed with
min-label propagation — each node repeatedly adopts the smallest
component id among itself and its neighbors until fixpoint:

  - every iteration is one shuffle (join on the edge key + groupBy);
  - iteration count is the graph diameter, and near-dup components
    are small/cliquish, so a handful of rounds converge;
  - convergence is detected from the monotonically decreasing sum of
    labels (one cheap scalar agg per round — no full-relation diff);
  - each round's result is persisted and the previous round released,
    so lineage stays O(1) instead of growing per iteration (the usual
    iterative-DataFrame trap).

This is the genuinely-iterative shape Spark SQL alone cannot express;
the DuckDB oracle mirrors it with a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, comp): comp = min node id reachable via undirected edges.

    Isolated nodes (present in ``nodes``, absent from ``edges``) keep
    themselves as their component.
    """
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .persist()
    )
    # Iterate ONLY over nodes that touch an edge: in a near-dup graph
    # that is a small fraction of the corpus, so every iteration's
    # join/agg runs on the edge-node set, not the full node set.
    # Isolated nodes re-attach at the end as their own component.
    labels = (
        sym.select(F.col("a").alias("node")).distinct().withColumn("comp", F.col("node")).persist()
    )
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]
    for _ in range(max_iter):
        neigh_min = (
            sym.join(labels, sym["a"] == labels["node"])
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(neigh_min, labels["node"] == neigh_min["node2"], "left")
            .select(
                "node",
                F.least("comp", F.coalesce("ncomp", "comp")).alias("comp"),
            )
            .persist()
        )
        cur_sum = new_labels.agg(F.sum("comp")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    sym.unpersist()
    # the final labels stay persisted (their lineage spans every
    # iteration); register with the kernel-cache registry so the
    # harness releases them after the query materializes.
    from qaapi_spark.session import register_kernel_cache

    labeled = register_kernel_cache(labels).select("node", "comp")
    all_nodes = nodes.select(F.col(node_col).alias("node")).distinct()
    return all_nodes.join(labeled, "node", "left").select(
        "node", F.coalesce("comp", F.col("node")).alias("comp")
    )
