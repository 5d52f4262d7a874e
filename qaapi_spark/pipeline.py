"""Pipeline assembly (reference EP1/EP2, SURVEY.md §3): landing ->
bronze -> curated with the reference's four maintenance strategies.

The reference runs a trailing-window extraction (re-pull the last
16/30 days) and reconciles with MERGE/DELETE; ``run_batch`` is that
reconciliation as one deterministic function:

  forms        full replace                  (S14, Update...sql:6)
  contacts     insert-only merge on id       (J2,  Update...sql:62-79,
               all_contacts_*.json -> t_contacts)
  qa contacts  insert-only merge on id       (J2,  Update...sql:36-59,
               contacts_*.json -> t_qa_contacts — the reference's
               all_contacts=False flow lands this separate staging
               route, same merge shape)
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

CURATED = [
    "t_qa_forms",
    "t_contacts",
    "t_qa_contacts",
    "t_qa_evaluations",
    "t_qa_evaluation_scores",
    "t_qa_evaluation_comments",
]


def _future_exc(f) -> "BaseException | None":
    """Block on a future and return its exception instead of raising
    (so a multi-table reconcile can report every failure, not just the
    first)."""
    try:
        f.result()
        return None
    except BaseException as e:  # noqa: BLE001 - gathered, then re-raised
        return e


class CalabrioPipeline:
    def __init__(
        self,
        spark: SparkSession,
        warehouse_dir: str,
        output_partitions: int | None = None,
        partitioned: bool = False,
        n_buckets: int = 8,
    ):
        """``output_partitions``: coalesce curated tables to this many
        files on write.  Set it when batches are small (fixtures, tests:
        1 file beats 32 near-empty ones); leave None at scale so the
        write keeps the plan's parallelism.

        ``partitioned``: lay the incremental curated tables out as
        contact_id hash-bucket partitions and reconcile each batch via
        partition-scoped merges (``operators/partitioned.py``) —
        untouched bucket directories are never read or rewritten.  Same
        logical result as the full-rewrite path (oracle-checked); this
        is the 100 TB maintenance shape, where a trailing-window batch
        must not pay a full-table write (VERDICT r2 #4).
        """
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        self.output_partitions = output_partitions
        self.partitioned = partitioned
        self.n_buckets = n_buckets
        os.makedirs(warehouse_dir, exist_ok=True)

    # -- table io --------------------------------------------------------
    def _path(self, table: str) -> str:
        return os.path.join(self.warehouse_dir, table)

    def read(self, table: str) -> DataFrame | None:
        p = self._path(table)
        if not os.path.exists(p):
            return None
        df = self.spark.read.parquet(p)
        from qaapi_spark.operators.partitioned import PCOL

        return df.drop(PCOL) if PCOL in df.columns else df

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

    def _reconcile(
        self,
        table: str,
        batch: DataFrame,
        keys: list[str],
        merge_fn,
        key_col: str = "contact_id",
        scope_df: DataFrame | None = None,
    ) -> None:
        """One table's batch reconciliation: partition-scoped when
        ``self.partitioned`` (rewrites only affected contact-id
        buckets), full write-temp-then-swap otherwise.  Both paths
        apply the same ``merge_fn(target, batch)`` relational merge."""
        if self.partitioned:
            from qaapi_spark.operators.partitioned import merge_partitioned

            merge_partitioned(
                self.spark,
                self._path(table),
                batch,
                keys,
                merge_fn,
                key_col=key_col,
                n_buckets=self.n_buckets,
                coalesce=self.output_partitions,
                scope_df=scope_df,
            )
        else:
            tgt = self.read(table)
            merged = batch if tgt is None else merge_fn(tgt, batch)
            self._swap_write(merged, table)

    # -- one incremental batch ------------------------------------------
    def run_batch(self, landing_dir: str, collect_counts: bool = True) -> dict[str, int]:
        """One trailing-window batch.  An entity whose landing file is
        absent is SKIPPED (its curated table keeps its prior state) —
        the reference's partial flows (`Start.py:14-32` lands only
        contacts) stage nothing for the other tables, so their merges
        see an empty staging relation and no-op; skipping is the
        engine-side equivalent that also cannot wipe a full-replace
        table with an accidental empty batch."""
        import glob as _glob

        spark = self.spark

        def _landed(pattern: str) -> bool:
            return bool(_glob.glob(f"{landing_dir}/{pattern}"))

        forms = contacts = qa_contacts = evals = comments = None
        if _landed("forms.json"):
            forms = read_entity(spark, f"{landing_dir}/forms.json", "forms")
        if _landed("all_contacts_*.json"):
            contacts = read_entity(
                spark, f"{landing_dir}/all_contacts_*.json", "all_contacts"
            )
        if _landed("contacts_*.json"):
            # the reference's all_contacts=False (QA) flow: a separate
            # staging route into its own curated table (X4 table_pairs
            # 'contacts_1.json' -> qa_contacts staging,
            # qa_api_handler.py:43-50; merge Update...sql:36-59)
            qa_contacts = read_entity(
                spark, f"{landing_dir}/contacts_*.json", "contacts"
            )
        if _landed("fix_eval_raw.json"):
            evals = read_entity(spark, f"{landing_dir}/fix_eval_raw.json", "evaluations")
        if _landed("fix_comments_raw.json"):
            comments = read_entity(
                spark, f"{landing_dir}/fix_comments_raw.json", "comments"
            )

        # Independent tables reconcile CONCURRENTLY: each target is its
        # own directory and no table's merge reads another's output
        # within a batch, so the per-table action chains (bucket probe,
        # checkpoint, write) can overlap — at fixture scale the cost is
        # ~30 tiny jobs of scheduler latency, and overlapping them is
        # the same lever the reference pulls with thread-per-pipeline
        # (X1, Start.py); on a cluster the scheduler interleaves stages
        # from concurrent jobs across executors (FIFO pools).
        work: list = []

        # forms: full replace (S14) — inherently a whole-table write
        if forms is not None:
            work.append(lambda: self._swap_write(T.forms_flatten(forms), "t_qa_forms"))

        # contacts: insert-only merge (J2) — existing rows keep their
        # original values; batch-internal duplicates collapse first
        if contacts is not None:
            new_contacts = T.contacts_curated(contacts).dropDuplicates(["contact_id"])
            work.append(lambda: self._reconcile(
                "t_contacts",
                new_contacts,
                ["contact_id"],
                lambda t, b: merge_insert_only(t, b, ["contact_id"]),
            ))
        if qa_contacts is not None:
            new_qa = T.contacts_curated(qa_contacts).dropDuplicates(["contact_id"])
            work.append(lambda: self._reconcile(
                "t_qa_contacts",
                new_qa,
                ["contact_id"],
                lambda t, b: merge_insert_only(t, b, ["contact_id"]),
            ))

        # evaluations: delete evals whose contact is in this batch but
        # which vanished upstream (J5), then upsert the batch (J3).
        # The matched-update column list excludes evaluated_date,
        # mirroring Update...sql:128-130.
        batch_evals = T.evaluations_curated(evals) if evals is not None else None

        def _merge_evals(t: DataFrame, b: DataFrame) -> DataFrame:
            t = delete_semi_anti(
                t,
                scope=b.select("contact_id"),
                scope_keys=["contact_id"],
                keep=b.select("evaluation_id"),
                keep_keys=["evaluation_id"],
            )
            return merge_upsert(
                t,
                b,
                ["evaluation_id"],
                update_cols=[
                    "form_id", "contact_id", "agent_id", "evaluator_id",
                    "eval_type", "response_state", "raw_score", "final_score",
                ],
            )

        if batch_evals is not None:
            work.append(lambda: self._reconcile(
                "t_qa_evaluations", batch_evals, ["evaluation_id"], _merge_evals
            ))

            # scores: delete-then-insert per contact in batch (S15/J5);
            # the delete scope (batch contacts) can shrink buckets the
            # inserted rows never touch, so it rides along as scope_df
            batch_scores = T.scores_flatten(evals)
            eval_contacts = batch_evals.select("contact_id").distinct()
            work.append(lambda: self._reconcile(
                "t_qa_evaluation_scores",
                batch_scores,
                ["contact_id"],
                lambda t, b: t.join(
                    eval_contacts, "contact_id", "left_anti"
                ).unionByName(b),
                scope_df=eval_contacts,
            ))

        # comments: delete-then-insert per contact in batch (S15,
        # Update...sql:176-182 "to address the possibility that a
        # comment was deleted").  The reference scopes this delete by
        # the QA contacts staging ids (Update...sql:181); when only the
        # qa route landed (all_contacts=False flow), use it — the
        # all_contacts route keeps priority for the mixed-fixture case
        # the oracle queries pin.
        scope_contacts = contacts if contacts is not None else qa_contacts
        if comments is not None and scope_contacts is not None:
            batch_comments = T.comments_curated(comments)
            contact_ids = scope_contacts.select(
                scope_contacts.id.alias("contact_id")
            ).distinct()
            work.append(lambda: self._reconcile(
                "t_qa_evaluation_comments",
                batch_comments,
                ["contact_id"],
                lambda t, b: t.join(
                    contact_ids, "contact_id", "left_anti"
                ).unionByName(b),
                scope_df=contact_ids,
            ))

        if len(work) == 1:
            work[0]()
        elif work:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(work)) as pool:
                # wait for ALL tables, then surface every failure —
                # raising on the first future would silently drop
                # exceptions from the others (they still ran; their
                # writes are per-table idempotent reconciles)
                errs = [
                    e
                    for f in [pool.submit(w) for w in work]
                    if (e := _future_exc(f)) is not None
                ]
            if len(errs) == 1:
                raise errs[0]
            if errs:
                # BaseExceptionGroup: _future_exc gathers BaseException
                # (a worker can raise KeyboardInterrupt/SystemExit),
                # which plain ExceptionGroup rejects with a TypeError
                # that would mask the real failures.  It downgrades
                # itself to ExceptionGroup when all members are
                # Exception subclasses.
                raise BaseExceptionGroup("reconcile failures", errs)

        if not collect_counts:
            return {}
        return {
            t: (df.count() if (df := self.read(t)) is not None else 0)
            for t in CURATED
        }
