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
def batch2_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("batch2")
    # window covers contacts 5..9 plus the new contact 99
    win = lambda c: 5 <= c["id"] <= 9  # noqa: E731
    contacts = [c for c in _load("all_contacts_1.json") if win(c)]
    contacts.append({"id": 99, "startTime": 1_709_900_000_000, "assocCallId": "CALL-00099"})

    evals = []
    for e in _load("fix_eval_raw.json"):
        cid = int(e["qualityRef"].rsplit("/", 1)[-1])
        if not (5 <= cid <= 9):
            continue
        if e["id"] == 1071:
            continue  # deleted upstream
        if e["id"] == 1070:
            e = dict(e, totalScore=91.25, evaluated=e["evaluated"] + 86_400_000)
        evals.append(e)
    evals.append(
        {
            "id": 1990,
            "qualityRef": "/api/rest/recording/contact/99",
            "evalForm": {"evalFormId": 1},
            "agent": {"id": 201},
            "evaluator": {"id": 301},
            "isScoreCounted": True,
            "evaluated": 1_709_950_000_000,
            "responseState": {"text": "AGREED"},
            "state": {"text": "SCORED"},
            "additiveScore": 50,
            "totalScore": 77.0,
            "sections": [{"id": 100, "questions": [{"id": 1000, "selectedOption": 10000}]}],
            "comments": "/api/rest/recording/contact/99/eval/1990/comment/",
        }
    )

    comments = []
    for c in _load("fix_comments_raw.json"):
        cid = int(c["$ref"].split("/")[5])
        if not (5 <= cid <= 9):
            continue
        if cid == 5:
            c = dict(c, text=c["text"] + " (edited)")
        comments.append(c)

    (d / "forms.json").write_text(json.dumps(_load("forms.json")))
    (d / "all_contacts_1.json").write_text(json.dumps(contacts))
    (d / "fix_eval_raw.json").write_text(json.dumps(evals))
    (d / "fix_comments_raw.json").write_text(json.dumps(comments))
    return str(d)


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
