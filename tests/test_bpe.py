"""BPE training/apply vs a pure-python reference with identical
tie-breaks — the correctness pin for the two rows-only BPE catalog
entries (iterative argmax is not SQL-expressible)."""

from __future__ import annotations

from collections import Counter

from qaapi_spark.operators.bpe import EOW, bpe_segment, bpe_train, segment_word
from qaapi_spark.session import release_kernel_caches

from tests.conftest import SF_SMOKE


def reference_bpe_train(texts, n_merges, min_pair_count=2):
    """Dict-based BPE trainer: same ordering contract as the operator
    (pair count desc, then (left, right) asc)."""
    words = Counter()
    for t in texts:
        for w in t.lower().split():
            words[w] += 1
    vocab = {tuple(list(w) + [EOW]): c for w, c in words.items()}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((rank, l, r, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_train_matches_python_reference(spark):
    from qaapi_spark.plans.catalog import t

    d = t(spark, SF_SMOKE, "documents")
    texts = [r.text for r in d.select("text").collect()]
    got = bpe_train(d, n_merges=6)
    release_kernel_caches()
    want = reference_bpe_train(texts, n_merges=6)
    assert got == want


def test_bpe_segment_matches_reference_and_compresses(spark):
    from pyspark.sql import functions as F

    from qaapi_spark.operators.textstats import ws_tokens
    from qaapi_spark.plans.catalog import t

    d = t(spark, SF_SMOKE, "documents")
    merges = bpe_train(d, n_merges=6)
    release_kernel_caches()
    ranks = {(l, r): rank for rank, l, r, _ in merges}
    got = {r.id: r.n_tokens_bpe for r in bpe_segment(d, merges).collect()}
    rows = d.select("doc_id", "text").collect()
    for r in rows:
        want = sum(
            len(segment_word(w, ranks)) for w in r.text.lower().split()
        )
        assert got[r.doc_id] == want
    # merging must never yield MORE symbols than chars+EOW, and with 6
    # learned merges over a tiny vocabulary it strictly compresses
    n_chars_plus = d.select(
        F.sum(
            F.aggregate(
                F.transform(
                    ws_tokens(F.lower(F.col("text"))), lambda w: F.length(w) + 1
                ),
                F.lit(0),
                lambda a, b: a + b,
            )
        )
    ).collect()[0][0]
    assert sum(got.values()) < n_chars_plus


def test_segment_word_rank_priority():
    """Apply follows TRAINING ORDER, not left-to-right scan order."""
    ranks = {("a", "b"): 0, ("b", "c"): 1}
    # 'abc': pair (a,b) has the lower rank, so it merges first -> ab, c
    assert segment_word("abc", ranks) == ["ab", "c", EOW]
    # chain: once 'ab' exists, (ab, c) is not a learned pair
    ranks2 = {("b", "c"): 0, ("a", "b"): 1}
    assert segment_word("abc", ranks2) == ["a", "bc", EOW]


def test_driver_and_distributed_trainers_agree(spark, sf_dir):
    """bpe_train (capped-collect driver trainer) and
    bpe_train_distributed (Spark-loop trainer) learn byte-identical
    merge tables when the vocabulary fits the cap."""
    from qaapi_spark.operators.bpe import bpe_train, bpe_train_distributed

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert bpe_train(d, n_merges=8) == bpe_train_distributed(d, n_merges=8)


def _reference_counts(texts, merges):
    """Per-doc BPE token totals by applying merges in rank order with
    the left-greedy fold (the trainer's own pass semantics)."""
    from qaapi_spark.operators.bpe import _merge_pass

    out = []
    for i, t in enumerate(texts, start=1):
        tot = 0
        for w in t.lower().split():
            syms = list(w) + [EOW]
            for _rank, l, r, _cnt in merges:
                syms = _merge_pass(syms, l, r)
            tot += len(syms)
        out.append((i, tot))
    return out


def test_bpe_oracle_exact_on_overlapping_merge_sites():
    """Round-6 regression (ADVICE r5, high): the unrolled SQL oracle
    must reproduce the left-greedy fold on corpora where a learned
    merge has adjacent l-r-l-r or repeated-symbol sites (banana/aaaa).
    The old single-space replace(' l r ',' lr ') consumed the shared
    delimiter and merged only every other site; the double-space
    symbol encoding fixes it.  DuckDB-only — no Spark session needed
    (the python reference trainer is pinned to the Spark kernel by
    test_bpe_train_matches_python_reference)."""
    import duckdb
    import pandas as pd

    from qaapi_spark.plans.llm_text import _bpe_counts_oracle, _bpe_train_oracle

    texts = [
        "banana banana bandana cabana",
        "aaaa aaaaa an analog banana",
        "theses sense essence assess",
        "na na na na banana bananas",
    ]
    docs = pd.DataFrame({"doc_id": range(1, len(texts) + 1), "text": texts})
    con = duckdb.connect()
    con.register("documents", docs)

    want = reference_bpe_train(texts, 8, min_pair_count=1)
    assert len(want) == 8, "corpus must support 8 merges"
    # overlapping sites must actually be exercised: some learned merge
    # has a repeated/adjacent site in the corpus (banana's an-an)
    got = con.sql(_bpe_train_oracle(8)).fetchall()
    assert [tuple(r) for r in got] == want

    got_counts = con.sql(_bpe_counts_oracle(8)).fetchall()
    assert [tuple(r) for r in got_counts] == _reference_counts(texts, want)
