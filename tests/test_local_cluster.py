"""Multi-executor realism: a representative cross-section of the
catalog runs under ``local-cluster[2,4,1024]`` — real executor JVMs
with serialization/broadcast boundaries that ``local[*]`` hides — and
still hash-matches the DuckDB oracles.

Runs in a subprocess so the cluster-mode SparkSession cannot collide
with the suite's shared local[*] session fixture.
"""

from __future__ import annotations

import pytest

import json
import subprocess
import sys

# families chosen to exercise executor-boundary machinery:
#   broadcast bitset kernel (dedup_ngram_jaccard), broadcast centroid
#   row + iterative decimal aggs (emb_kmeans_lloyd3), Arrow python
#   workers on executors (dedup_semantic_kmeans), band-key shuffles
#   (dedup_minhash_lsh), persist across executors + iterative joins
#   (graph_pagerank_neardup), JSON landing + nested flatten
#   (calabrio_contacts_curated), plain join+agg and window baselines.
QUERIES = [
    "q5_revenue_by_nation",
    "w3_rolling_daily_events",
    "calabrio_contacts_curated",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "emb_kmeans_lloyd3",
    "dedup_semantic_kmeans",
    "graph_pagerank_neardup",
    "sketch_hll_portable",
    # r5 additions: composed ANN index (broadcast codebooks + residual
    # encode kernel + candidate-sized joins across executor boundaries)
    # and the dense+lexical fusion (persisted weight relation, full
    # outer join)
    "ann_topk_ivfpq",
    "hybrid_search_rrf",
    # r6 additions: the partial-Gram covariance kernel (mapInPandas
    # closure + integer partial merge across executor boundaries), the
    # upper-triangle blocked dense-Jaccard GEMM, and the MMR greedy
    # applyInPandas islands
    "emb_covariance_upper",
    "dedup_ngram_jaccard_dense",
    "mmr_diversified_topk",
    # r7 additions: the one-int64 sign-bit packing + bit_count screen
    # (pure JVM expressions across executor boundaries, broadcast
    # query bits) and the pinned-exchange sparse posting join
    "ann_topk_binary_hamming",
    "dedup_containment_sparse",
    # r10 additions: the sliding-window ExactSubstr kernel (persisted
    # corpus-token-sized window relation + semi-join across executor
    # boundaries) and the indexed miner (driver-built SRP probe keys
    # broadcast into executor-side band joins + Arrow rerank)
    "dedup_exact_substring_ranges",
    "pairs_mine_contrastive",
    # r11 additions: the ExactSubstr APPLY step (canonical-occurrence
    # window ranking + trimmed-text rebuild across executor
    # boundaries) and the adaptive stripe-trained IVF miner leg
    # (rank-init Lloyd fit + broadcast codebook assignment)
    "dedup_exact_substring_apply",
    "pairs_mine_contrastive_ivf",
    # r13 addition: retraction-aware MV maintenance (broadcast negative
    # partials + the scoped MAX-recompute join across executor
    # boundaries)
    "mv_incremental_revenue_with_deletes",
]

_RUNNER = r"""
import json, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local-cluster[2,4,3072]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.executor.memory", "2g")
    # the deployment knob local[*] hides: executor python workers must
    # be able to import qaapi_spark (--py-files / PYTHONPATH in prod)
    .config("spark.executorEnv.PYTHONPATH", "/root/repo")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from qaapi_spark.plans import CATALOG
from qaapi_spark.testing import norm_rows
out = {}
for name in %s:
    df = CATALOG[name].fn(spark, "/root/testdata/sf0.001")
    cols, rows = norm_rows(df.columns, [tuple(r) for r in df.collect()])
    out[name] = {"cols": cols, "rows": [[str(v) for v in r] for r in rows]}
print("RESULT::" + json.dumps(out))
spark.stop()
"""


@pytest.mark.slow  # 229 s multi-JVM cross-section
def test_catalog_cross_section_on_local_cluster():
    import duckdb

    sys.path.insert(0, "/root/repo")
    from qaapi_spark.plans import CATALOG

    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER % json.dumps(QUERIES)],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT::")]
    assert line, proc.stdout[-2000:]
    got = json.loads(line[0][len("RESULT::"):])

    con = duckdb.connect()
    for tname in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{tname}.parquet'"
        )
    from qaapi_spark.testing import norm_rows

    for name in QUERIES:
        rec = got[name]
        oracle = CATALOG[name].oracle
        if oracle is None:
            assert len(rec["rows"]) > 0, name
            continue
        res = con.execute(oracle)
        d_cols = [d[0] for d in res.description]
        want_cols, want_rows = norm_rows(d_cols, res.fetchall())
        assert rec["cols"] == want_cols, (name, rec["cols"], want_cols)
        # full VALUE comparison against the oracle (ADVICE r3 #4: the
        # old check compared only row counts, so a value regression
        # under executor boundaries would have passed)
        want = [[str(v) for v in r] for r in want_rows]
        assert rec["rows"] == want, (
            name,
            [p for p in zip(rec["rows"], want) if p[0] != p[1]][:3],
        )
