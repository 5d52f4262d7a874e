"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``qaapi_spark.plans`` (one entry per operator
family from SURVEY.md §2 + the extended LLM-pipeline surface).
"""

from __future__ import annotations

import json
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from qaapi_spark.plans import CATALOG

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "w3_rolling_daily_events"


# How many leading queries() entries the driver's correctness gate
# checks per round (observed: 50 in both r1 and r2).
_GATE_WINDOW = 50


def _driver_state() -> tuple[set[str], set[str], int, dict[str, int]]:
    """(hash_verified, rows_checked, rounds_seen, last_green) from prior
    driver gates.

    ``hash_verified``: oracle-paired queries with a green *value-hash*
    row — the only signal that counts as verified (VERDICT r2 wrong #2:
    keying on ``rows_match`` demoted the hash-FAILED
    ``pack_sequences_by_lang`` out of the re-check window).
    ``rows_checked``: rows-only queries (``err == 'no_oracle'``) the
    driver has at least executed — a weaker, but never-improving, signal.
    ``last_green``: per-query number of the most recent round with a
    green row, so the regression rotation can re-check the LEAST
    recently verified queries first (VERDICT r3 #6: nothing verified in
    r1 had been re-checked since).
    """
    hash_verified: set[str] = set()
    rows_checked: set[str] = set()
    last_green: dict[str, int] = {}
    rounds = 0
    for p in sorted(Path(__file__).resolve().parent.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(p.read_text())
            rnum = int(p.stem.split("_r")[1])
        except (OSError, ValueError, IndexError):
            continue
        rounds += 1
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            if rec.get("err") is None and rec.get("hash_match"):
                hash_verified.add(name)
                last_green[name] = max(last_green.get(name, 0), rnum)
            elif rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None:
                rows_checked.add(name)
                last_green[name] = max(last_green.get(name, 0), rnum)
    return hash_verified, rows_checked, rounds, last_green


# Queries whose kernel or oracle changed in round _FORCE_RECHECK_ROUND+1:
# green rows from <= _FORCE_RECHECK_ROUND no longer certify the current
# code, so they re-enter the unverified front of the window.  The force
# SELF-EXPIRES once a newer green row lands (otherwise these names
# would pin window slots forever).  Round 8: the ADVICE-r7 kernel-reuse
# fixes changed the executed path of the dense-Jaccard pack (inline
# persist + guard), the containment sparse/auto routes (_sets
# passthrough), and the Hamming screen's query collect (limit + bound),
# so their r7 rows certify retired code.  All four re-verified locally
# (check_oracle sf0.001 + sf0.01); the force makes the driver confirm.
_FORCE_RECHECK_ROUND = 15
_FORCE_RECHECK = frozenset(
    {
        # Round 16 (VERDICT r15 next #1a / what's-wrong #1): every
        # query whose EXECUTED kernel changed in the r15 optimization
        # round but whose existing green row predates that change —
        # the r15 correctness window certified five exsub/SCD2 twins
        # on the new paths, but these 16 also route through the new
        # code (trim restructure b341f99, Arrow simhash kernel,
        # epoch-write overlap + op routing a213771, footer-stat
        # boundaries 57bdb20, footer counts 041c00c/f36b823) and their
        # rows certify retired code.  All re-verified locally
        # (check_oracle sf0.01, full catalog); the pins make the
        # driver confirm on the current kernels.  Queries whose
        # kernels change again in r16 keep qualifying (last green
        # row <= round 15 by construction).
        "dedup_exact_substring_apply",
        "dedup_exact_substring_attribution",
        "pipeline_corpus_to_shards_exactsubstr",
        "dedup_simhash_portable",
        "tfidf_top_terms",
        "hybrid_search_rrf",
        "pairs_mine_contrastive",
        "pairs_mine_contrastive_ivf",
        "ann_recall_eval_srp",
        "stream_neardup_dedup_docs",
        "stream_neardup_with_deletes",
        "stream_cc_labels_incremental",
        "stream_cc_labels_with_deletes",
        "stream_exact_substring_apply",
        "stream_pipeline_corpus_to_shards",
        "mv_incremental_join_enrichment_with_deletes",
    }
)

# Rotation pins: rows-only queries whose last EXECUTION row is old
# enough that the LRU rotation alone won't reach them this round.
# Round 8: both rows-only stragglers (ann_topk_pq, dedup_minhash_mllib)
# landed fresh execution rows in CORRECTNESS_r07 — nothing to pin.
_ROTATION_PIN = frozenset()

# Highest-priority gate candidates: forced re-checks first (a stale
# green row is WEAKER than no row — the code it certified is gone),
# then any never-verified newcomers in catalog order.
_PRIORITY = tuple(sorted(_FORCE_RECHECK)) + tuple(sorted(_ROTATION_PIN))


def _ordered_names() -> list[str]:
    """Catalog order for the driver gate.

    Front of the window: (1) oracle-paired queries with no green hash
    row yet — VERDICT-r2-flagged ones first, (2) rows-only queries the
    driver never executed, then (3) a deterministic rotating sample of
    already-verified queries so regressions in verified code still
    surface (ADVICE r2 #5) instead of coverage resting on stale
    CORRECTNESS artifacts.  When unverified queries outnumber the
    window, the hash-checkable (oracle-paired) ones take the slots —
    a hash row is strictly stronger signal than a rows-only row.
    """
    hash_verified, rows_checked, rounds, last_green = _driver_state()
    names = list(CATALOG)
    idx = {n: i for i, n in enumerate(names)}
    prio = {n: i for i, n in enumerate(_PRIORITY)}
    unverified = [
        n
        for n in names
        if (n in _FORCE_RECHECK and last_green.get(n, 0) <= _FORCE_RECHECK_ROUND)
        or (n in _ROTATION_PIN and last_green.get(n, 0) <= _FORCE_RECHECK_ROUND)
        or not (
            (CATALOG[n].oracle is not None and n in hash_verified)
            or (CATALOG[n].oracle is None and n in rows_checked)
        )
    ]
    unverified.sort(
        key=lambda n: (
            prio.get(n, len(_PRIORITY)),
            0 if CATALOG[n].oracle is not None else 1,
            idx[n],
        )
    )
    # Regression rotation: least-recently-green first, so stale r1-era
    # verifications get re-checked before anything the driver saw last
    # round; catalog order breaks ties deterministically.
    rest = [n for n in names if n not in set(unverified)]
    rest.sort(key=lambda n: (last_green.get(n, 0), idx[n]))
    return unverified + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference queries/pagenation.sql:1-25 shape:
    daily event counts + 5-row rolling total) on sf0.001."""
    return CATALOG[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    not-yet-driver-verified queries first (see _driver_verified)."""
    return {name: CATALOG[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; omitted entries (approx /
    non-SQL-expressible operators) take the driver's rows-only check."""
    return {
        name: CATALOG[name].oracle
        for name in _ordered_names()
        if CATALOG[name].oracle is not None
    }
