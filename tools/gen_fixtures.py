"""Generate the Calabrio-shaped JSON fixtures (FIXTURES.md family A).

Fully deterministic (no RNG): every edge case the reference SQL
handles is planted explicitly —
  forms:    section with questions=[], question with options=[]
            (inner-flatten drops them, Update...sql:157-160)
  contacts: duplicate ids across the two all_contacts_* batch files
            (glob-union + insert-only merge), startTime values
            straddling the UTC/Denver day boundary
  evals:    duplicate documents per evaluation id (W1 dedup),
            non-SCORED states (filtered), NULL evaluator.id,
            missing `comments` key, contact-in-batch-with-vanished-
            eval (J5 delete case)
  comments: history=[] (explode_outer default), multi-entry history
            (W2 keep-latest), text with no alphanumerics (filtered)
  transcripts: one empty payload (skipped at ingest)

Usage: python tools/gen_fixtures.py [out_dir=/root/repo/fixtures]
"""

from __future__ import annotations

import json
import os
import sys

DAY_MS = 86_400_000
BASE_MS = 1_709_251_200_000  # 2024-03-01T00:00:00Z


def forms() -> list[dict]:
    out = []
    for f in range(1, 4):
        sections = []
        for s in range(3):
            questions = []
            for q in range(3):
                options = [
                    {
                        "id": f * 10_000 + s * 1000 + q * 100 + o,
                        "label": ["Y", "N", "N/A"][o],
                        "points": [5, 0, 0][o],
                        "type": ["ADDITIVE", "ADDITIVE", "N/A APPLICABLE"][o],
                    }
                    for o in range(3)
                ]
                if f == 2 and s == 1 and q == 2:
                    options = []  # inner flatten drops this question
                questions.append(
                    {
                        "id": f * 1000 + s * 100 + q,
                        "text": f"Question {q} of section {s}?",
                        "weight": 1.0 + q,
                        "options": options,
                    }
                )
            if f == 3 and s == 2:
                questions = []  # inner flatten drops this section
            sections.append(
                {
                    "id": f * 100 + s,
                    "name": f"Section {s}",
                    "weight": round(0.2 + 0.1 * s, 2),
                    "questions": questions,
                }
            )
        out.append({"id": f, "name": f"Eval Form {f}", "sections": sections})
    return out


def contact_doc(cid: int) -> dict:
    # 06:00 UTC == 23:00 previous day in Denver (straddles day boundary)
    start = BASE_MS + (cid % 20) * DAY_MS + (6 if cid % 3 == 0 else 15) * 3_600_000
    return {"id": cid, "startTime": start, "assocCallId": f"CALL-{cid:05d}"}


def all_contacts_batches() -> tuple[list[dict], list[dict]]:
    b1 = [contact_doc(c) for c in range(1, 31)]
    b2 = [contact_doc(c) for c in range(25, 41)]  # 25-30 duplicated across files
    return b1, b2


def qa_contacts() -> list[dict]:
    return [contact_doc(c) for c in range(5, 36)]


def evaluations() -> list[dict]:
    docs = []
    for cid in range(5, 36):
        n_evals = 2 if cid % 7 == 0 else 1
        for k in range(n_evals):
            eid = 1000 + cid * 10 + k
            state = "SCORED" if (cid % 10) != 9 else "IN_REVIEW"
            doc = {
                "id": eid,
                "qualityRef": f"/api/rest/recording/contact/{cid}",
                "evalForm": {"evalFormId": 1 + (cid % 3)},
                "agent": {"id": 200 + cid % 9},
                "evaluator": None if cid % 11 == 0 else {"id": 300 + cid % 4},
                "isScoreCounted": cid % 4 != 0,
                "evaluated": BASE_MS + cid * DAY_MS // 2 + k * 3_600_000,
                "responseState": {"text": "AGREED" if cid % 2 else "NONE"},
                "state": {"text": state},
                "additiveScore": 40 + (eid % 25),
                "totalScore": 0.0 if cid % 13 == 0 else round(60.0 + (eid % 40) * 0.75, 2),
                "sections": [
                    {
                        "id": (1 + (cid % 3)) * 100 + s,
                        "questions": [
                            {
                                "id": (1 + (cid % 3)) * 1000 + s * 100 + q,
                                "selectedOption": (1 + (cid % 3)) * 10_000
                                + s * 1000
                                + q * 100
                                + (eid + q) % 2,
                            }
                            for q in range(2)
                        ],
                    }
                    for s in range(2)
                ],
            }
            if cid % 6 != 0:  # some evals carry no comments link
                doc["comments"] = f"/api/rest/recording/contact/{cid}/eval/{eid}/comment/"
            docs.append(doc)
            if eid == 1070:  # duplicate document for one evaluation id (W1):
                # a later re-export with a corrected score — keep-latest wins
                dup = dict(doc)
                dup["evaluated"] = doc["evaluated"] + 7_200_000
                dup["totalScore"] = 88.5
                docs.append(dup)
    # nulls-through-NOT-IN regression shape: evaluator NULL already planted
    return docs


def comments() -> list[dict]:
    docs = []
    m = 0
    for ev in evaluations():
        if "comments" not in ev or ev["state"]["text"] != "SCORED":
            continue
        cid = int(ev["qualityRef"].rsplit("/", 1)[-1])
        eid = ev["id"]
        for k in range(2 if eid % 3 == 0 else 1):
            m += 1
            created = BASE_MS + m * 7_200_000
            history = []
            if m % 3 == 0:  # multi-entry history: keep newest (W2)
                history = [
                    {"created": created + 3_600_000 * h, "commentor": {"$ref": f"/api/rest/recording/person/{400 + h}"}}
                    for h in range(3)
                ]
            text = "No alnum here ..." if m % 9 == 0 else f"Comment {m} on eval {eid}"
            if m % 9 == 0:
                text = "…!?."  # filtered: no alphanumeric characters
            docs.append(
                {
                    "$ref": f"/api/rest/recording/contact/{cid}/eval/{eid}/comment/{m}",
                    "sectionFK": None if m % 4 == 0 else (1 + cid % 3) * 100,
                    "questionFK": None if m % 2 == 0 else (1 + cid % 3) * 1000 + 1,
                    "created": created,
                    "commentor": {"$ref": f"/api/rest/recording/person/{500 + m % 6}"},
                    "text": text,
                    "history": history,
                }
            )
    return docs


def transcripts() -> list[dict]:
    out = []
    for cid in (5, 8, 12):
        payload = [
            {"start_ms": i * 1500, "end_ms": i * 1500 + 1400, "speaker": ["agent", "customer"][i % 2], "text": f"utterance {i}"}
            for i in range(4)
        ]
        out.append({"ccrid": cid, "segments": payload})
    out.append({"ccrid": 14, "segments": []})  # empty: skipped at ingest
    return out


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/fixtures"
    os.makedirs(out_dir, exist_ok=True)
    b1, b2 = all_contacts_batches()
    files = {
        "forms.json": forms(),
        "all_contacts_1.json": b1,
        "all_contacts_2.json": b2,
        "contacts_1.json": qa_contacts(),
        "fix_eval_raw.json": evaluations(),
        "fix_comments_raw.json": comments(),
        "fix_transcript_raw.json": transcripts(),
    }
    for name, docs in files.items():
        with open(os.path.join(out_dir, name), "w") as f:
            json.dump(docs, f, indent=1)
        print(f"{name}: {len(docs)} docs")


if __name__ == "__main__":
    main()
