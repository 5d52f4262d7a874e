"""Pipeline assembly (reference EP1/EP2, SURVEY.md §3): landing ->
bronze -> curated with the reference's four maintenance strategies.

The reference runs a trailing-window extraction (re-pull the last
16/30 days) and reconciles with MERGE/DELETE; ``run_batch`` is that
reconciliation as one deterministic function:

  forms        full replace                  (S14, Update...sql:6)
  contacts     insert-only merge on id       (J2,  Update...sql:36-79)
  evaluations  delete-vanished + upsert      (J5+J3, Update...sql:85-134)
  scores       delete-then-insert by eval    (S15, Update...sql:140-170)
  comments     delete-then-insert by contact (S15, Update...sql:176-215)

Scale notes: targets are plain parquet dirs rewritten via
write-temp-then-swap (atomic enough for a single writer; Delta MERGE is
the multi-writer upgrade path, SURVEY §4.3).  The batch side of every
join is broadcast — it is a bounded trailing window by construction.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from qaapi_spark import transforms as T
from qaapi_spark.operators.maintain import delete_semi_anti, merge_insert_only, merge_upsert
from qaapi_spark.sources.landing import read_entity

CURATED = ["t_qa_forms", "t_contacts", "t_qa_evaluations", "t_qa_evaluation_scores", "t_qa_evaluation_comments"]


class CalabrioPipeline:
    def __init__(
        self,
        spark: SparkSession,
        warehouse_dir: str,
        output_partitions: int | None = None,
    ):
        """``output_partitions``: coalesce curated tables to this many
        files on write.  Set it when batches are small (fixtures, tests:
        1 file beats 32 near-empty ones); leave None at scale so the
        write keeps the plan's parallelism."""
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        self.output_partitions = output_partitions
        os.makedirs(warehouse_dir, exist_ok=True)

    # -- table io --------------------------------------------------------
    def _path(self, table: str) -> str:
        return os.path.join(self.warehouse_dir, table)

    def read(self, table: str) -> DataFrame | None:
        p = self._path(table)
        if not os.path.exists(p):
            return None
        return self.spark.read.parquet(p)

    def _swap_write(self, df: DataFrame, table: str) -> None:
        """Write-temp-then-swap so a target is never read and
        overwritten in the same plan (self-overwrite corruption)."""
        final = self._path(table)
        tmp = final + ".tmp-" + uuid.uuid4().hex[:8]
        if self.output_partitions is not None:
            df = df.coalesce(self.output_partitions)
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)

    # -- one incremental batch ------------------------------------------
    def run_batch(self, landing_dir: str, collect_counts: bool = True) -> dict[str, int]:
        spark = self.spark
        forms = read_entity(spark, f"{landing_dir}/forms.json", "forms")
        contacts = read_entity(spark, f"{landing_dir}/all_contacts_*.json", "all_contacts")
        evals = read_entity(spark, f"{landing_dir}/fix_eval_raw.json", "evaluations")
        comments = read_entity(spark, f"{landing_dir}/fix_comments_raw.json", "comments")

        # forms: full replace (S14)
        self._swap_write(T.forms_flatten(forms), "t_qa_forms")

        # contacts: insert-only merge (J2) — existing rows keep their
        # original values; batch-internal duplicates collapse first
        new_contacts = T.contacts_curated(contacts).dropDuplicates(["contact_id"])
        tgt = self.read("t_contacts")
        merged = new_contacts if tgt is None else merge_insert_only(tgt, new_contacts, ["contact_id"])
        self._swap_write(merged, "t_contacts")

        # evaluations: delete evals whose contact is in this batch but
        # which vanished upstream (J5), then upsert the batch (J3).
        # The matched-update column list excludes evaluated_date,
        # mirroring Update...sql:128-130.
        batch_evals = T.evaluations_curated(evals)
        tgt = self.read("t_qa_evaluations")
        if tgt is not None:
            tgt = delete_semi_anti(
                tgt,
                scope=batch_evals.select("contact_id"),
                scope_keys=["contact_id"],
                keep=batch_evals.select("evaluation_id"),
                keep_keys=["evaluation_id"],
            )
            merged = merge_upsert(
                tgt,
                batch_evals,
                ["evaluation_id"],
                update_cols=[
                    "form_id", "contact_id", "agent_id", "evaluator_id",
                    "eval_type", "response_state", "raw_score", "final_score",
                ],
            )
        else:
            merged = batch_evals
        self._swap_write(merged, "t_qa_evaluations")

        # scores: delete-then-insert per evaluation in batch (S15/J5)
        batch_scores = T.scores_flatten(evals)
        tgt = self.read("t_qa_evaluation_scores")
        if tgt is not None:
            keep = tgt.join(
                batch_evals.select("contact_id").distinct(), "contact_id", "left_anti"
            )
            merged = keep.unionByName(batch_scores)
        else:
            merged = batch_scores
        self._swap_write(merged, "t_qa_evaluation_scores")

        # comments: delete-then-insert per contact in batch (S15,
        # Update...sql:176-182 "to address the possibility that a
        # comment was deleted")
        batch_comments = T.comments_curated(comments)
        tgt = self.read("t_qa_evaluation_comments")
        if tgt is not None:
            keep = tgt.join(
                contacts.select(contacts.id.alias("contact_id")).distinct(),
                "contact_id",
                "left_anti",
            )
            merged = keep.unionByName(batch_comments)
        else:
            merged = batch_comments
        self._swap_write(merged, "t_qa_evaluation_comments")

        if not collect_counts:
            return {}
        return {t: self.read(t).count() for t in CURATED}
