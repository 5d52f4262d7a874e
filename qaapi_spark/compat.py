"""Drop-in ``ApiHandler`` facade mirroring the reference driver API.

The reference's entry scripts build an ``ApiHandler`` and call the
same five getters plus ``full_run`` (``Start.py:14-56``,
``modules/qa_api_handler.py:21-57,296-317``).  This class keeps that
exact surface — constructor keywords, method names, the
``full_run(fun_list)`` contract including its quirks — so a reference
driver script ports with one import change:

    from qaapi_spark.compat import ApiHandler

Differences are strictly behind the curtain: extraction goes through
an injectable transport (``sources/rest_source.FixtureTransport`` by
default; ``sources/http_transport.SessionTransport`` for a live
Calabrio endpoint), landing files are written with the reference's
exact names (``table_pairs`` routing, ``qa_api_handler.py:43-50``),
and ``run_table_updates`` runs the Spark reconciliation pipeline
(landing -> bronze -> curated) instead of Snowflake MERGE SQL —
producing the same curated relations the reference's
``Update...sql`` yields (oracle-verified by the
``calabrio_pipeline_*`` catalog queries).

Reference quirks preserved deliberately:

- ``full_run`` tolerates ``None`` entries — ``Start.py:50-54`` builds
  its list from *called* methods, so the handler receives results,
  not callables (``qa_api_handler.py:306-307`` skips NoneType).
  Because the scratch purge touches only ``temp_dir`` (below), files
  landed during list construction are still staged and the run
  completes as a FULL load — the reference's actual behavior;
- ``full_run`` refuses to re-enter ``full_run``/``run_table_updates``
  (the recursion guard, ``:308-309``; the reference's guard prints
  the warning but falls through and calls the function anyway — we
  skip instead, the one divergence, since faithfully recursing
  forever helps no one);
- scratch files are purged before the run and after table updates
  (``:305,314``; X3 in SURVEY §2) — the purge hits ``temp_dir``
  (raw pre-repair accumulation files, ``qa_api_handler.py:319-324``),
  NEVER ``json_dir`` where landed files live: the reference keeps
  landed files across runs (``run_table_updates`` re-stages whatever
  is in ``json_dir``, ``:278``);
- ``contact_json`` is OVERWRITTEN per extraction window
  (``qa_api_handler.py:111``), not accumulated — so a subsequent
  ``get_evaluations`` fans out over only the LAST window's contacts.
  ``Start.py:40-47``'s qa flow sets ``break_size`` to the whole date
  range (one window), which is what makes the quirk harmless there;
- ``all_contacts`` routes the landed files: ``True`` ->
  ``all_contacts_N.json`` (t_contacts staging), ``False`` ->
  ``contacts_N.json`` (qa-contacts staging) plus the
  ``evalState=scored`` server-side filter (``qa_api_handler.py:
  92-95,104-107``; the fixture transport expresses that filter as
  the fixture-file pattern).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import time

from qaapi_spark.session import scratch_dir as _scratch_dir

_DAY_MS = 86_400_000


class ApiHandler:
    """Reference-shaped driver facade over the Spark pipeline."""

    sql_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "queries")

    def __init__(
        self,
        console_output: bool = False,
        schema: str | None = None,
        all_contacts: bool = False,
        begin_date: str = "",
        end_date: str = "",
        break_size=None,
        sql_file: str | None = None,
        *,
        spark=None,
        transport=None,
        landing_dir: str | None = None,
        out_dir: str | None = None,
        partitioned: bool = False,
    ):
        self.console_output = console_output
        self.schema = schema
        self.all_contacts = all_contacts
        self.begin_date = dt.date.fromisoformat(begin_date) if begin_date else None
        self.end_date = dt.date.fromisoformat(end_date) if end_date else None
        self.break_size = dt.timedelta(int(break_size)) if break_size else None
        self.query_file = sql_file
        self.object_creation_time = time.time()

        if transport is None:
            from qaapi_spark.sources.rest_source import FixtureTransport

            transport = FixtureTransport(
                {"base_dir": os.path.join(os.path.dirname(self.sql_dir), "fixtures")}
            )
        self.transport = transport
        self.spark = spark
        # two directories, as in the reference (`qa_api_handler.py:
        # 15,17`): json_dir holds LANDED files and is what
        # run_table_updates stages — never purged by full_run;
        # temp_dir is scratch for raw pre-repair accumulation and is
        # what the X3 purge empties.
        self.json_dir = landing_dir or _scratch_dir(prefix="qaapi_landing_")
        self.temp_dir = _scratch_dir(prefix="qaapi_scratch_")
        self.out_dir = out_dir or _scratch_dir(prefix="qaapi_out_")
        self.partitioned = partitioned
        self.forms_json = None
        self.contact_json = None
        self.eval_json = None

    # -- landing ------------------------------------------------------
    def _land(self, name: str, rows: list[dict]) -> None:
        with open(os.path.join(self.json_dir, name), "w") as f:
            json.dump(rows, f)
        self._say(f"landed {len(rows)} rows -> {name}")

    def _scratch(self, name: str, rows: list[dict]) -> None:
        """Raw pre-repair artifact in temp_dir (the reference appends
        raw response bytes there before ``_fix_file`` writes the
        repaired ``fix_*`` file into json_dir, `qa_api_handler.py:
        142,161,230-236`) — the files the X3 purge exists to remove."""
        with open(os.path.join(self.temp_dir, name), "w") as f:
            json.dump(rows, f)

    def _say(self, msg: str) -> None:
        if self.console_output:
            print(msg)

    # -- extraction (S1-S5) -------------------------------------------
    def get_forms(self):
        """S1 single-resource GET (`qa_api_handler.py:73-84`)."""
        self.forms_json = self.transport.get_forms()
        self._land("forms.json", self.forms_json)

    @staticmethod
    def _date_ms(d: dt.date) -> int:
        """Epoch-ms of midnight UTC — fixed timezone so the request
        windows are deterministic across differently-configured hosts
        (a naive ``datetime(...).timestamp()`` shifts with local tz)."""
        return int(
            dt.datetime(d.year, d.month, d.day, tzinfo=dt.timezone.utc).timestamp()
            * 1000
        )

    def get_all_contacts(self):
        """S2 date-range-chunked extraction (`qa_api_handler.py:86-125`):
        one request window per ``break_size`` days, one landed file per
        window.  ``all_contacts`` picks the route (`:92-95`):
        ``all_contacts_N.json`` (every contact) vs ``contacts_N.json``
        (QA contacts, server-filtered ``evalState=scored``, `:104-107`
        — the fixture transport expresses that filter as the fixture
        pattern).  Faithful quirk: ``contact_json`` holds only the
        LAST window's rows (`:111` overwrites per window)."""
        stem = "all_contacts" if self.all_contacts else "contacts"
        step = self.break_size or (self.end_date - self.begin_date)
        lo, n = self.begin_date, 1
        while lo < self.end_date:
            hi = min(lo + step, self.end_date)
            rows = self.transport.get_contacts(
                f"{stem}_*.json", self._date_ms(lo), self._date_ms(hi)
            )
            self._land(f"{stem}_{n}.json", rows)
            self.contact_json = rows
            lo, n = hi, n + 1

    def get_evaluations(self):
        """S3 per-contact fan-out (`qa_api_handler.py:127-161`): raw
        accumulation in temp_dir, repaired landing in json_dir."""
        ids = [r["id"] for r in (self.contact_json or []) if r.get("id") is not None]
        self.eval_json = self.transport.get_evaluations(ids)
        self._scratch("eval_raw.json", self.eval_json)
        self._land("fix_eval_raw.json", self.eval_json)

    def get_comments(self):
        """S4 link-following (`qa_api_handler.py:202-228`)."""
        links = [
            r["comments"]
            for r in (self.eval_json or [])
            if isinstance(r.get("comments"), str)
        ]
        comments = self.transport.get_comments(links)
        self._scratch("comments_raw.json", comments)
        self._land("fix_comments_raw.json", comments)

    def get_transcripts(self):
        """S5 keyed lookup with empty-skip (`qa_api_handler.py:163-200`)."""
        ids = [r["id"] for r in (self.contact_json or []) if r.get("id") is not None]
        transcripts = self.transport.get_transcripts(ids)
        self._scratch("transcript_raw.json", transcripts)
        self._land("fix_transcript_raw.json", transcripts)

    # -- load + reconcile ---------------------------------------------
    def run_table_updates(self):
        """The reference's staged MERGE reconciliation
        (`qa_api_handler.py:277-294` + ``Update...sql``), expressed as
        the Spark landing->bronze->curated batch."""
        from qaapi_spark.pipeline import CalabrioPipeline

        spark = self.spark
        if spark is None:
            from qaapi_spark.session import get_spark

            spark = self.spark = get_spark("qaapi-compat")
        pipe = CalabrioPipeline(
            spark, self.out_dir, output_partitions=1, partitioned=self.partitioned
        )
        counts = pipe.run_batch(self.json_dir)
        self._say(f"table updates: {counts}")
        return counts

    def full_run(self, fun_list):
        """`qa_api_handler.py:296-317`: purge SCRATCH files (temp_dir,
        `:319-324` — landed files in json_dir are untouched, so files
        landed before full_run still get staged), run the extraction
        stages, reconcile tables, purge scratch again."""
        from qaapi_spark.sources.landing import clean_landing

        if not isinstance(fun_list, list):
            self._say(
                "Sorry, a list of function objects needs to be passed "
                "into this function."
            )
            return None
        clean_landing(self.temp_dir)
        for fun in fun_list:
            if fun is None:  # Start.py passes called methods' results
                continue
            if getattr(fun, "__name__", "") in ("full_run", "run_table_updates"):
                self._say(f"{fun.__name__} skipped to avoid recursion")
                continue
            self._say(f"running function: {fun.__name__}")
            fun()
        counts = self.run_table_updates()
        clean_landing(self.temp_dir)
        self._say(
            f"full_run ended after "
            f"{round(time.time() - self.object_creation_time, 4)} seconds."
        )
        return counts
