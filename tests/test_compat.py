"""Driver-facade parity (compat.ApiHandler): a reference-shaped entry
script runs end-to-end against the fixture transport and produces the
same curated relations the pipeline builds directly."""

from __future__ import annotations

import os

from qaapi_spark.compat import ApiHandler


def _mk(spark, tmp_path, **kw):
    return ApiHandler(
        console_output=False,
        schema="d_post_install",
        begin_date="2024-02-25",
        end_date="2024-03-25",
        break_size=10,
        spark=spark,
        landing_dir=str(tmp_path / "landing"),
        out_dir=str(tmp_path / "out"),
        **kw,
    )


def test_start_py_flow_produces_curated_tables(spark, tmp_path):
    (tmp_path / "landing").mkdir()
    api = _mk(spark, tmp_path)
    counts = api.full_run(
        [api.get_forms, api.get_all_contacts, api.get_evaluations, api.get_comments]
    )
    assert counts["t_contacts"] > 0
    assert counts["t_qa_evaluations"] > 0
    assert counts["t_qa_evaluation_comments"] > 0
    # landing purged after the run (X3, qa_api_handler.py:314)
    assert os.listdir(tmp_path / "landing") == []


def test_start_py_called_method_quirk_tolerated(spark, tmp_path):
    """Start.py:50-54 builds the list from CALLED methods (results, not
    callables).  Faithful consequence chain: the files land during list
    construction, full_run's leading temp purge (qa_api_handler.py:305)
    deletes them, the NoneType entries are skipped (:306-307), and the
    table update stages nothing — the run COMPLETES as a no-op instead
    of crashing, exactly like the reference."""
    (tmp_path / "landing").mkdir()
    api = _mk(spark, tmp_path)
    counts = api.full_run(
        [api.get_forms(), api.get_all_contacts(), api.get_evaluations()]
    )
    assert counts == {t: 0 for t in counts}


def test_full_run_guards_recursion_and_type(spark, tmp_path):
    (tmp_path / "landing").mkdir()
    api = _mk(spark, tmp_path)
    assert api.full_run("not a list") is None
    api.get_forms()
    api.get_all_contacts()
    counts = api.full_run([api.full_run, api.run_table_updates])
    assert isinstance(counts, dict)


def test_date_windows_chunk_contact_files(spark, tmp_path):
    (tmp_path / "landing").mkdir()
    api = _mk(spark, tmp_path)
    api.get_all_contacts()
    files = sorted(os.listdir(tmp_path / "landing"))
    # 2024-02-25 .. 2024-03-25 at 10-day breaks -> 3 window files
    assert files == [
        "all_contacts_1.json",
        "all_contacts_2.json",
        "all_contacts_3.json",
    ]
    assert len(api.contact_json) > 0
