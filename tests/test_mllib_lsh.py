"""MLlib MinHashLSH variant vs the exact-Jaccard pair oracle: the LSH
result must be a SUBSET of the exact pair set (HashingTF collisions
could only merge shingles, and the distance filter is exact on the
hashed features), and planted twins must be recalled."""

from __future__ import annotations

from pyspark.sql import functions as F

from qaapi_spark.plans import CATALOG
from tests.conftest import SF_SMOKE


def test_mllib_lsh_subset_and_recall(spark):
    lsh_pairs = {
        (r["id_a"], r["id_b"])
        for r in CATALOG["dedup_minhash_mllib"].fn(spark, SF_SMOKE).collect()
    }
    exact_pairs = {
        (r["id_a"], r["id_b"])
        for r in CATALOG["dedup_ngram_jaccard"].fn(spark, SF_SMOKE).collect()
    }
    assert exact_pairs, "testdata plants near-duplicate documents"
    # subset modulo hashed-feature collisions: every LSH pair is a real
    # near-dup pair at the shared threshold
    assert lsh_pairs <= exact_pairs, lsh_pairs - exact_pairs
    # recall: seeded 8-table LSH must find most of the planted pairs
    assert len(lsh_pairs) >= 0.8 * len(exact_pairs)


def test_mllib_lsh_deterministic(spark):
    a = sorted(
        map(tuple, CATALOG["dedup_minhash_mllib"].fn(spark, SF_SMOKE).collect())
    )
    b = sorted(
        map(tuple, CATALOG["dedup_minhash_mllib"].fn(spark, SF_SMOKE).collect())
    )
    assert a == b
