"""Explicit StructTypes for the Calabrio-shaped bronze entities.

Schema-on-write by declaration (SURVEY.md §1.3): the reference's
schemaless VARIANT staging is an artifact of Snowflake; declaring the
nested StructType up front gives Catalyst nested-field pruning and
NULL-for-missing semantics identical to `src:path` access
(`from_json`/JSON reader permissive mode).

Field sets are exactly the JSON paths the reference SQL consumes
(FIXTURES.md A1-A5; Update...sql:7-22,40-46,101-121,151-165,187-208).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _s(*fields: StructField) -> StructType:
    return StructType(list(fields))


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


OPTION = _s(
    _f("id", LongType()),
    _f("label", StringType()),
    _f("points", LongType()),
    _f("type", StringType()),
)

QUESTION = _s(
    _f("id", LongType()),
    _f("text", StringType()),
    _f("weight", DoubleType()),
    _f("options", ArrayType(OPTION)),
)

SECTION = _s(
    _f("id", LongType()),
    _f("name", StringType()),
    _f("weight", DoubleType()),
    _f("questions", ArrayType(QUESTION)),
)

FORMS = _s(
    _f("id", LongType()),
    _f("name", StringType()),
    _f("sections", ArrayType(SECTION)),
)

CONTACTS = _s(
    _f("id", LongType()),
    _f("startTime", LongType()),  # epoch ms UTC
    _f("assocCallId", StringType()),
)

EVAL_QUESTION = _s(_f("id", LongType()), _f("selectedOption", LongType()))
EVAL_SECTION = _s(_f("id", LongType()), _f("questions", ArrayType(EVAL_QUESTION)))

REF_OBJ = _s(_f("id", LongType()))
TEXT_OBJ = _s(_f("text", StringType()))

EVALUATIONS = _s(
    _f("id", LongType()),
    _f("qualityRef", StringType()),
    _f("evalForm", _s(_f("evalFormId", LongType()))),
    _f("agent", REF_OBJ),
    _f("evaluator", REF_OBJ),
    _f("isScoreCounted", BooleanType()),
    _f("evaluated", LongType()),  # epoch ms UTC
    _f("responseState", TEXT_OBJ),
    _f("state", TEXT_OBJ),
    _f("additiveScore", LongType()),
    _f("totalScore", DoubleType()),
    _f("comments", StringType()),  # nullable HATEOAS link
    _f("sections", ArrayType(EVAL_SECTION)),
)

DOLLAR_REF = _s(_f("$ref", StringType()))
HISTORY_ENTRY = _s(_f("created", LongType()), _f("commentor", DOLLAR_REF))

COMMENTS = _s(
    _f("$ref", StringType()),
    _f("sectionFK", LongType()),
    _f("questionFK", LongType()),
    _f("created", LongType()),  # epoch ms UTC
    _f("commentor", DOLLAR_REF),
    _f("text", StringType()),
    _f("history", ArrayType(HISTORY_ENTRY)),
)

TRANSCRIPT_SEGMENT = _s(
    _f("start_ms", LongType()),
    _f("end_ms", LongType()),
    _f("speaker", StringType()),
    _f("text", StringType()),
)

TRANSCRIPTS = _s(
    _f("ccrid", LongType()),
    _f("segments", ArrayType(TRANSCRIPT_SEGMENT)),
)

ENTITY_SCHEMAS: dict[str, StructType] = {
    "forms": FORMS,
    "all_contacts": CONTACTS,
    "contacts": CONTACTS,
    "evaluations": EVALUATIONS,
    "comments": COMMENTS,
    "transcripts": TRANSCRIPTS,
}

# landed filename pattern -> entity (reference X4 routing dict,
# modules/qa_api_handler.py:43-50)
FILE_ROUTING: dict[str, str] = {
    "forms*.json": "forms",
    "all_contacts*.json": "all_contacts",
    "contacts_*.json": "contacts",
    "fix_eval_raw.json": "evaluations",
    "fix_comments_raw.json": "comments",
    "fix_transcript_raw.json": "transcripts",
}
