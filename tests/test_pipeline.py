"""End-to-end incremental pipeline test: two batches with the
reference's reconciliation edge cases (SURVEY.md §5.2 item 2-3).

Batch 1 = the committed fixture corpus.  Batch 2 = a trailing-window
re-extract where, upstream:
  - a new contact (99) with one evaluation appears
  - contact 7's evaluation 1071 was DELETED (J5 victim: contact in
    batch, eval vanished) while 1070 survives with an updated score
  - contact 5's comment text was edited (delete-then-insert refresh)
  - contacts outside the window (e.g. 20s) are untouched
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from qaapi_spark.pipeline import CalabrioPipeline

FIX = "/root/repo/fixtures"


def _load(name):
    with open(f"{FIX}/{name}") as f:
        return json.load(f)


@pytest.fixture(scope="module")
def batch2_dir():
    """The committed batch-2 fixtures (tools/gen_batch2.py); assert the
    committed files still equal the deterministic generator output."""
    sys_path_root = "/root/repo"
    import sys

    if sys_path_root not in sys.path:
        sys.path.insert(0, sys_path_root)
    from tools.gen_batch2 import build_batch2

    for name, docs in build_batch2(FIX).items():
        assert _load(f"batch2/{name}") == docs, f"stale fixture: batch2/{name}"
    return f"{FIX}/batch2"


def test_two_batch_reconciliation(spark, tmp_path, batch2_dir):
    pipe = CalabrioPipeline(spark, str(tmp_path / "warehouse"))
    counts1 = pipe.run_batch(FIX)
    assert counts1["t_qa_forms"] == 69
    assert counts1["t_contacts"] == 40
    assert counts1["t_qa_evaluations"] == 33

    counts2 = pipe.run_batch(batch2_dir)

    contacts = pipe.read("t_contacts")
    # new contact inserted; previously-loaded contacts survive untouched
    assert contacts.filter(F.col("contact_id") == 99).count() == 1
    assert counts2["t_contacts"] == counts1["t_contacts"] + 1

    evals = pipe.read("t_qa_evaluations")
    # 1071 deleted (contact 7 in batch, eval vanished upstream)
    assert evals.filter(F.col("evaluation_id") == 1071).count() == 0
    # 1070 re-scored via upsert; evaluated_date preserved from batch 1
    row = evals.filter(F.col("evaluation_id") == 1070).collect()[0]
    assert row["final_score"] == 91.25
    # evaluations of contacts OUTSIDE the window are untouched
    # (contact 21 has 2 evals: cid % 7 == 0 in the fixture generator)
    assert evals.filter(F.col("contact_id") == 21).count() == 2
    # new contact's eval inserted
    assert evals.filter(F.col("evaluation_id") == 1990).count() == 1

    comments = pipe.read("t_qa_evaluation_comments")
    edited = comments.filter(F.col("contact_id") == 5).select("text").collect()
    assert edited and all(r["text"].endswith("(edited)") for r in edited)
    # comments of out-of-window contacts survive
    assert comments.filter(F.col("contact_id") > 9).count() > 0


def test_evaluated_date_preserved_on_upsert(spark, tmp_path, batch2_dir):
    pipe = CalabrioPipeline(spark, str(tmp_path / "warehouse2"))
    pipe.run_batch(FIX)
    before = {
        r["evaluation_id"]: r["evaluated_date"]
        for r in pipe.read("t_qa_evaluations").collect()
    }
    pipe.run_batch(batch2_dir)
    after = {
        r["evaluation_id"]: r["evaluated_date"]
        for r in pipe.read("t_qa_evaluations").collect()
    }
    # mirrors Update...sql:128-130: matched rows keep the OLD evaluated_date
    assert after[1070] == before[1070]


def test_multi_table_reconcile_failures_all_surface(spark, tmp_path, monkeypatch):
    """Round-6 (ADVICE r5): when several concurrent per-table
    reconciles fail, every exception must surface (ExceptionGroup),
    not just whichever future happened to be examined first."""
    pipe = CalabrioPipeline(spark, str(tmp_path / "warehouse3"))
    real = pipe._reconcile
    fail_tables = {"t_contacts", "t_qa_evaluations"}

    def flaky(table, *a, **kw):
        if table in fail_tables:
            raise RuntimeError(f"boom:{table}")
        return real(table, *a, **kw)

    monkeypatch.setattr(pipe, "_reconcile", flaky)
    with pytest.raises(ExceptionGroup) as ei:
        pipe.run_batch(FIX)
    got = {str(e) for e in ei.value.exceptions}
    assert got == {f"boom:{t}" for t in fail_tables}
