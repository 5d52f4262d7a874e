"""Curated-layer transforms: DataFrame -> DataFrame, one function per
Update...sql statement body (SURVEY.md §2.3/§2.6/§2.8 operator mix).

These are the composable cores; `plans/calabrio.py` wraps them as
driver-contract queries over the fixture corpus, `pipeline.py` composes
them with the maintenance strategies for incremental runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from qaapi_spark.functions.dialect import (
    convert_tz,
    epoch_ms_to_ts,
    iff,
    nvl,
    regexp_substr,
    regexp_substr_occ,
    url_concat,
)
from qaapi_spark.operators.windows import dedup_keep_one

URL_PREFIX = "https://calabrio.example/recording/contact/"


def denver_ntz(col) -> F.Column:
    """Epoch-ms -> America/Denver wall time as TIMESTAMP_NTZ (F2+F3).

    NTZ so the stored value is the naive wall time, engine-independent
    (SURVEY §7.3 timezone-fidelity risk)."""
    return convert_tz(epoch_ms_to_ts(col)).cast("timestamp_ntz")


def forms_flatten(forms: DataFrame) -> DataFrame:
    """t_qa_forms: 3-level inner explode (L1); ref Update...sql:6-27."""
    s = forms.select(
        F.col("id").alias("form_id"),
        F.col("name").alias("form_name"),
        F.explode("sections").alias("sec"),
    )
    q = s.select(
        "form_id",
        "form_name",
        F.col("sec.id").alias("section_id"),
        F.col("sec.name").alias("section_name"),
        F.col("sec.weight").alias("section_weight"),
        F.explode("sec.questions").alias("que"),
    )
    o = q.select(
        "form_id",
        "form_name",
        "section_id",
        "section_name",
        "section_weight",
        F.col("que.id").alias("question_id"),
        F.col("que.text").alias("question_text"),
        F.col("que.weight").alias("question_weight"),
        F.explode("que.options").alias("opt"),
    )
    return o.select(
        "form_id",
        "form_name",
        "section_id",
        "section_name",
        "section_weight",
        "question_id",
        "question_text",
        "question_weight",
        F.col("opt.id").alias("option_id"),
        F.col("opt.label").alias("option_label"),
        F.col("opt.points").alias("option_points"),
        F.col("opt.type").alias("option_type"),
    )


def contacts_curated(contacts: DataFrame) -> DataFrame:
    """t_contacts projection: epoch->Denver (F2/F3), URL concat (F11/P2);
    ref Update...sql:40-46.  Dedup across batch files is the caller's
    concern (insert-only merge J2 / distinct)."""
    return contacts.select(
        F.col("id").alias("contact_id"),
        denver_ntz("startTime").alias("contact_start_time"),
        url_concat(URL_PREFIX, F.col("id"), "/review").alias("contact_url"),
        F.col("assocCallId").alias("cjp_session_id"),
    )


def evaluations_curated(evals: DataFrame) -> DataFrame:
    """t_qa_evaluations: SCORED filter (P4), W1 dedup (keep-latest
    re-export — deterministic divergence from the reference's ORDER BY
    1), JSON-path projections + casts (P1), trailing-digits contact id
    (F5), IFF eval type (F9); ref Update...sql:97-134."""
    e = evals.filter(F.col("state.text") == "SCORED")
    e = dedup_keep_one(e, ["id"], [F.col("evaluated").desc()])
    return e.select(
        F.col("id").alias("evaluation_id"),
        F.col("evalForm.evalFormId").alias("form_id"),
        regexp_substr(F.col("qualityRef"), "[0-9]+$").cast("long").alias("contact_id"),
        F.col("agent.id").alias("agent_id"),
        F.col("evaluator.id").alias("evaluator_id"),
        iff(F.col("isScoreCounted"), F.lit("Evaluation"), F.lit("Calibration")).alias("eval_type"),
        denver_ntz("evaluated").alias("evaluated_date"),
        F.col("responseState.text").alias("response_state"),
        F.col("additiveScore").alias("raw_score"),
        F.col("totalScore").alias("final_score"),
    )


def scores_flatten(evals: DataFrame) -> DataFrame:
    """t_qa_evaluation_scores: 2-level explode of scored evals (L2);
    ref Update...sql:149-170."""
    e = evals.filter(F.col("state.text") == "SCORED")
    e = dedup_keep_one(e, ["id"], [F.col("evaluated").desc()])
    s = e.select("id", "qualityRef", F.explode("sections").alias("sec"))
    q = s.select(
        "id", "qualityRef", F.col("sec.id").alias("section_id"), F.explode("sec.questions").alias("que")
    )
    return q.select(
        F.col("id").alias("evaluation_id"),
        regexp_substr(F.col("qualityRef"), "[0-9]+$").cast("long").alias("contact_id"),
        "section_id",
        F.col("que.id").alias("question_id"),
        F.col("que.selectedOption").alias("option_id"),
    )


def comments_curated(comments: DataFrame) -> DataFrame:
    """t_qa_evaluation_comments: $ref 3-id parse (F7), history
    explode_outer (L3 — the reference's IFF('[]','[{}]') default
    trick), keep-latest history (W2), has-alnum filter (P6);
    ref Update...sql:185-215."""
    exploded = comments.select(
        F.col("`$ref`").alias("cref"),
        F.col("sectionFK"),
        F.col("questionFK"),
        F.col("created"),
        F.col("commentor.`$ref`").alias("commentor_ref"),
        F.col("text"),
        F.explode_outer("history").alias("he"),
    )
    w = Window.partitionBy("cref").orderBy(F.col("he.created").desc_nulls_last())
    latest = exploded.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        latest.select(
            regexp_substr_occ(F.col("cref"), "[0-9]+", 3).cast("long").alias("comment_id"),
            regexp_substr_occ(F.col("cref"), "[0-9]+", 1).cast("long").alias("contact_id"),
            regexp_substr_occ(F.col("cref"), "[0-9]+", 2).cast("long").alias("evaluation_id"),
            F.col("sectionFK").alias("section_id"),
            F.col("questionFK").alias("question_id"),
            denver_ntz(nvl(F.col("he.created"), F.col("created"))).alias("created_date"),
            regexp_substr(nvl(F.col("he.commentor.`$ref`"), F.col("commentor_ref")), "[0-9]+")
            .cast("long")
            .alias("commentor_id"),
            "text",
        )
        .filter(F.col("text").rlike("[0-9A-Za-z]"))
    )


def transcripts_flatten(transcripts: DataFrame) -> DataFrame:
    """Transcript segments: empty-response skip (S5) + flatten;
    ref modules/qa_api_handler.py:163-200."""
    t = transcripts.filter(F.size("segments") > 0)
    return t.select("ccrid", F.explode("segments").alias("seg")).select(
        "ccrid",
        F.col("seg.start_ms").alias("start_ms"),
        F.col("seg.end_ms").alias("end_ms"),
        F.col("seg.speaker").alias("speaker"),
        F.col("seg.text").alias("text"),
    )
