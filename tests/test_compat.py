"""Driver-facade parity (compat.ApiHandler): a reference-shaped entry
script runs end-to-end against the fixture transport and produces the
same curated relations the pipeline builds directly.

Directory semantics mirror the reference exactly (ADVICE r3 #1):
``json_dir`` holds landed files and is staged by ``run_table_updates``
— ``full_run`` never purges it (the reference's ``_remove_temp_files``
empties only ``temp_dir``, `qa_api_handler.py:319-324`); ``temp_dir``
holds raw pre-repair scratch and IS purged before/after the run.
"""

from __future__ import annotations

import os

from qaapi_spark.compat import ApiHandler


def _mk(spark, tmp_path, **kw):
    kw.setdefault("break_size", 10)
    return ApiHandler(
        console_output=False,
        schema="d_post_install",
        begin_date="2024-02-25",
        end_date="2024-03-25",
        spark=spark,
        landing_dir=str(tmp_path / "landing"),
        out_dir=str(tmp_path / "out"),
        **kw,
    )


def test_start_py_qa_flow_produces_curated_tables(spark, tmp_path):
    """Start.py:35-55 qa flow: all_contacts=False, break_size = the
    whole range (ONE window — what makes the last-window contact_json
    quirk harmless), callables passed uncalled."""
    (tmp_path / "landing").mkdir()
    api = _mk(spark, tmp_path, break_size=30)
    counts = api.full_run(
        [api.get_forms, api.get_all_contacts, api.get_evaluations, api.get_comments]
    )
    # qa route: contacts_N.json -> t_qa_contacts (Update...sql:36-59)
    assert counts["t_qa_contacts"] > 0
    assert counts["t_contacts"] == 0  # no all_contacts_*.json landed
    assert counts["t_qa_evaluations"] > 0
    assert counts["t_qa_evaluation_comments"] > 0
    # landed files survive full_run (reference purges temp_dir only)
    landed = sorted(os.listdir(tmp_path / "landing"))
    assert "contacts_1.json" in landed and "fix_eval_raw.json" in landed
    # the scratch purge (X3) emptied temp_dir
    assert os.listdir(api.temp_dir) == []


def test_start_py_called_method_quirk_full_load(spark, tmp_path):
    """Start.py:50-54 builds the list from CALLED methods (results, not
    callables).  Faithful consequence chain: the files land in json_dir
    during list construction, full_run's leading purge empties only
    temp_dir scratch (qa_api_handler.py:305,319-324), the NoneType
    entries are skipped (:306-307), and run_table_updates stages the
    already-landed json_dir files — the run completes as a FULL load,
    exactly like the reference."""
    (tmp_path / "landing").mkdir()
    api = _mk(spark, tmp_path, break_size=30)
    counts = api.full_run(
        [api.get_forms(), api.get_all_contacts(), api.get_evaluations()]
    )
    assert counts["t_qa_contacts"] > 0
    assert counts["t_qa_evaluations"] > 0


def test_full_run_guards_recursion_and_type(spark, tmp_path):
    (tmp_path / "landing").mkdir()
    api = _mk(spark, tmp_path)
    assert api.full_run("not a list") is None
    api.get_forms()
    api.get_all_contacts()
    counts = api.full_run([api.full_run, api.run_table_updates])
    assert isinstance(counts, dict)


def test_date_windows_chunk_contact_files(spark, tmp_path):
    """all_contacts=True route: all_contacts_N.json naming, one file
    per break_size window (qa_api_handler.py:91-95)."""
    (tmp_path / "landing").mkdir()
    api = _mk(spark, tmp_path, all_contacts=True)
    api.get_all_contacts()
    files = sorted(os.listdir(tmp_path / "landing"))
    # 2024-02-25 .. 2024-03-25 at 10-day breaks -> 3 window files
    assert files == [
        "all_contacts_1.json",
        "all_contacts_2.json",
        "all_contacts_3.json",
    ]
    # faithful quirk (qa_api_handler.py:111): contact_json holds only
    # the LAST window's rows, not the accumulation
    import json

    last = json.load(open(tmp_path / "landing" / "all_contacts_3.json"))
    assert [r["id"] for r in api.contact_json] == [r["id"] for r in last]


def test_qa_route_lands_contacts_files(spark, tmp_path):
    """all_contacts=False (default) lands contacts_N.json — the
    reference's qa-contacts staging route (qa_api_handler.py:92-95,
    table_pairs :43-50)."""
    (tmp_path / "landing").mkdir()
    api = _mk(spark, tmp_path)
    api.get_all_contacts()
    files = sorted(os.listdir(tmp_path / "landing"))
    assert files == ["contacts_1.json", "contacts_2.json", "contacts_3.json"]


def test_window_boundaries_are_utc_deterministic(spark, tmp_path):
    """Request windows derive from UTC midnights, not host-local time
    (ADVICE r3 #3)."""
    assert ApiHandler._date_ms(__import__("datetime").date(2024, 2, 25)) == (
        1708819200000
    )
