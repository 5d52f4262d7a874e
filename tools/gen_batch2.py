"""Generate the batch-2 trailing-window re-extract fixtures
(fixtures/batch2/) from the committed batch-1 corpus.

Batch 2 simulates what the reference's 30-day re-pull would land after
upstream edits (SURVEY.md §5.2 item 2-3), exercising every
reconciliation path of the pipeline:
  - window covers contacts 5..9 only (contacts outside stay untouched)
  - new contact 99 with one evaluation (insert path, J2/J3)
  - contact 7's evaluation 1071 DELETED upstream (J5 victim: contact
    present in batch, eval id vanished)
  - evaluation 1070 re-scored (J3 matched-update; evaluated_date must
    be preserved from the target per Update...sql:128-130)
  - contact 5's comment text edited (delete-then-insert refresh, S15)

Deterministic: pure function of the batch-1 fixtures.

Usage: python tools/gen_batch2.py [fixtures_dir=/root/repo/fixtures]
"""

from __future__ import annotations

import json
import os
import sys


def load(fix_dir: str, name: str):
    with open(os.path.join(fix_dir, name)) as f:
        return json.load(f)


def build_batch2(fix_dir: str) -> dict[str, list]:
    win = lambda cid: 5 <= cid <= 9  # noqa: E731

    contacts = [c for c in load(fix_dir, "all_contacts_1.json") if win(c["id"])]
    contacts.append({"id": 99, "startTime": 1_709_900_000_000, "assocCallId": "CALL-00099"})

    evals = []
    for e in load(fix_dir, "fix_eval_raw.json"):
        cid = int(e["qualityRef"].rsplit("/", 1)[-1])
        if not win(cid):
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
    for c in load(fix_dir, "fix_comments_raw.json"):
        cid = int(c["$ref"].split("/")[5])
        if not win(cid):
            continue
        if cid == 5:
            c = dict(c, text=c["text"] + " (edited)")
        comments.append(c)

    return {
        "forms.json": load(fix_dir, "forms.json"),
        "all_contacts_1.json": contacts,
        "fix_eval_raw.json": evals,
        "fix_comments_raw.json": comments,
    }


def main() -> None:
    fix_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/fixtures"
    out_dir = os.path.join(fix_dir, "batch2")
    os.makedirs(out_dir, exist_ok=True)
    for name, docs in build_batch2(fix_dir).items():
        with open(os.path.join(out_dir, name), "w") as f:
            json.dump(docs, f, indent=1)
        print(f"{out_dir}/{name}: {len(docs)} docs")


if __name__ == "__main__":
    main()
