"""Job-level decomposition of one streaming twin's epoch callbacks.

profile_stream.py says WHICH epoch is slow; this says WHY: it times
every blocking driver action (collect/count/toPandas/parquet write)
issued inside each epoch callback, with the action's plan description
truncated, and counts Spark jobs per epoch via job groups (thunks run
through _par_writes are re-grouped inside their pool thread so
overlapped write jobs are counted too).

Usage: python tools/profile_epoch_jobs.py <sf_dir> <catalog_name>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Spark 4: pyspark.sql.DataFrame is the abstract interface; live
# objects are the classic implementations — patch those.
from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
from pyspark.sql.readwriter import DataFrameWriter  # noqa: E402

from qaapi_spark.plans.catalog import CATALOG  # noqa: E402
from qaapi_spark.session import get_spark  # noqa: E402

ACTIONS: list[tuple[str, str, float]] = []  # (phase, action desc, sec)
_PHASE = ["?"]


def _wrap_action(cls, name):
    orig = getattr(cls, name)

    def wrapped(self, *a, **kw):
        t0 = time.time()
        try:
            return orig(self, *a, **kw)
        finally:
            dt = time.time() - t0
            if dt > 0.005:
                desc = ""
                try:
                    df = self._df if isinstance(self, DataFrameWriter) else self
                    cols = df.columns
                    desc = ",".join(cols[:6]) + ("..." if len(cols) > 6 else "")
                except Exception:
                    pass
                ACTIONS.append((_PHASE[0], f"{name}({desc})", dt))

    setattr(cls, name, wrapped)


def main() -> None:
    sf_dir, name = sys.argv[1], sys.argv[2]
    spark = get_spark("profile-epoch-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for act in ("collect", "count"):
        _wrap_action(DataFrame, act)
    _wrap_action(DataFrameWriter, "parquet")
    _wrap_action(DataFrameWriter, "save")

    import qaapi_spark.streaming.incremental as inc
    import qaapi_spark.streaming.retraction as rt

    # group every epoch's jobs (including _par_writes pool threads)
    epoch_groups: list[tuple[str, str, float]] = []

    def patch_epoch(mod, fname):
        orig = getattr(mod, fname)

        def wrapped(bdf, epoch_id, *a, **kw):
            group = f"epoch_{fname}_{int(epoch_id)}"
            _PHASE[0] = group
            sc.setJobGroup(group, group)
            t0 = time.time()
            try:
                return orig(bdf, epoch_id, *a, **kw)
            finally:
                epoch_groups.append((group, fname, time.time() - t0))
                sc.setJobGroup(None, None)
                _PHASE[0] = "?"

        setattr(mod, fname, wrapped)

    orig_par = inc._par_writes

    def par_writes_grouped(*thunks):
        group = _PHASE[0]

        def regroup(t):
            def run():
                sc.setJobGroup(group, group + "_w")
                return t()

            return run

        return orig_par(*[regroup(t) for t in thunks])

    inc._par_writes = par_writes_grouped
    rt._par_writes = par_writes_grouped

    for mod in (rt, inc):
        for fname in list(vars(mod)):
            if ("_rt_insert_epoch" in fname or "_rt_delete_epoch" in fname
                    or "_uo_epoch" in fname or fname.endswith("_epoch")):
                if callable(getattr(mod, fname)):
                    patch_epoch(mod, fname)

    t0 = time.time()
    rows = len(CATALOG[name].fn(spark, sf_dir).collect())
    total = time.time() - t0
    print(f"\n== {name}: total={total:.2f}s rows={rows}")
    for group, fname, wall in epoch_groups:
        jids = sorted(tracker.getJobIdsForGroup(group))
        n_stages = n_tasks = 0
        for jid in jids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        acts = [(a, dt) for ph, a, dt in ACTIONS if ph == group]
        acts_s = sum(dt for _, dt in acts)
        print(
            f"  {group}: wall={wall:.2f}s jobs={len(jids)} "
            f"stages={n_stages} tasks={n_tasks} actions_sum={acts_s:.2f}s"
        )
        for a, dt in acts:
            print(f"      {dt:6.2f}s  {a}")
        if "--jobs" in sys.argv:
            for jid in jids:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                names = []
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None:
                        names.append(f"{si.name}[{si.numTasks}]")
                print(f"      job {jid}: {'; '.join(names)}")


if __name__ == "__main__":
    main()
