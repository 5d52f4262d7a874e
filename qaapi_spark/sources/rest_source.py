"""Pluggable REST-extraction source (Spark 4 Python DataSource API).

The reference's extractor is driver-side Python: a date-window loop for
contacts (S2, `modules/qa_api_handler.py:86-119`), one GET for forms
(S1, `:73-84`), and a per-row N+1 fan-out for evaluations (S3,
`:127-161`).  This source re-expresses those as a *partitioned Spark
read* so extraction itself scales out:

  - one InputPartition per break_size-day window (contacts) or per
    id-chunk (evaluations) — the reference's request chunking becomes
    Spark's unit of parallelism; 1000 windows = 1000 concurrent
    fetches on a cluster;
  - `pushFilters` translates startTime range predicates into request
    parameters (the reference pushes `evalState=scored` the same way,
    `:104-107`): pruned windows are never fetched, and Spark re-applies
    nothing — the filter is fully absorbed by the source;
  - the transport is *injectable*: the `transport` option names a
    class as `"pkg.module:ClassName"` (default
    `qaapi_spark.sources.rest_source:FixtureTransport`).  The class is
    resolved inside each partition's `read()` — only the dotted path
    is serialized, so any importable transport works on executors.  A
    transport is constructed with the reader's options dict and
    provides `get_contacts/get_forms/get_evaluations`; a production
    HTTP transport would run the reference's session-auth prelude
    (`modules/qa_api_handler.py:58-71`: authenticate once, reuse the
    session for every request in the partition) in `__init__` and
    issue real GETs — no network exists in this environment, so the
    shipped default evaluates the same query params against landed
    fixture JSON instead.

Usage::

    spark.dataSource.register(CalabrioRestDataSource)
    df = (spark.read.format("calabrio_rest")
          .option("entity", "contacts")
          .option("base_dir", "fixtures")
          .option("begin_date", "2024-03-01").option("end_date", "2024-03-17")
          .option("break_size", "2")
          .option("transport", "my_pkg.http:SessionTransport")  # optional
          .load())
"""

from __future__ import annotations

import glob
import json
import os
from datetime import date, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import ArrayType, StructType

from qaapi_spark.schemas import ENTITY_SCHEMAS

_MS_PER_DAY = 86_400_000


def _iso_to_ms(s: str) -> int:
    d = date.fromisoformat(s)
    return (d - date(1970, 1, 1)).days * _MS_PER_DAY


DEFAULT_TRANSPORT = "qaapi_spark.sources.rest_source:FixtureTransport"


def _resolve_transport(path: str):
    """`"pkg.module:ClassName"` (or dotted `pkg.module.ClassName`) ->
    class.  Resolved lazily in `read()` so only the string crosses the
    driver->executor boundary."""
    import importlib

    mod_name, _, cls_name = (
        path.partition(":") if ":" in path else path.rpartition(".")
    )
    if not mod_name or not cls_name:
        raise ValueError(f"transport must be 'pkg.module:ClassName', got {path!r}")
    return getattr(importlib.import_module(mod_name), cls_name)


class FixtureTransport:
    """Fake Calabrio API over landed fixture JSON: evaluates the same
    request params (date window, id) the real server would.

    Constructed with the reader options dict — the transport contract.
    A real transport would open the authenticated HTTP session here
    (reference `modules/qa_api_handler.py:58-71`).
    """

    def __init__(self, options: dict):
        self.base_dir = options.get("base_dir", "fixtures")

    def _load(self, pattern: str) -> list[dict]:
        rows: list[dict] = []
        for path in sorted(glob.glob(os.path.join(self.base_dir, pattern))):
            with open(path) as f:
                rows.extend(json.load(f))
        return rows

    def get_contacts(self, pattern: str, lo_ms: int, hi_ms: int) -> list[dict]:
        return [
            r
            for r in self._load(pattern)
            if r.get("startTime") is not None and lo_ms <= r["startTime"] < hi_ms
        ]

    def get_forms(self) -> list[dict]:
        return self._load("forms.json")

    def get_evaluations(self, contact_ids: list[int]) -> list[dict]:
        """S3: one 'request' per contact id (the N+1 fan-out)."""
        want = set(contact_ids)
        out = []
        for r in self._load("fix_eval_raw.json"):
            ref = r.get("qualityRef") or ""
            digits = "".join(ch for ch in ref.rsplit("/", 1)[-1] if ch.isdigit())
            if digits and int(digits) in want:
                out.append(r)
        return out

    def get_comments(self, links: list[str]) -> list[dict]:
        """S4 link-following: a comment belongs to the link whose path
        prefixes its ``$ref`` (reference: GET base + evaluation's
        ``comments`` link, `qa_api_handler.py:202-228`)."""
        out = []
        for r in self._load("fix_comments_raw.json"):
            ref = r.get("$ref") or ""
            if any(ref.startswith(lk) for lk in links):
                out.append(r)
        return out

    def get_transcripts(self, contact_ids: list[int]) -> list[dict]:
        """S5 keyed lookup with empty-result skip
        (`qa_api_handler.py:163-200`, skip `:187-188`)."""
        want = set(contact_ids)
        return [
            r
            for r in self._load("fix_transcript_raw.json")
            if r.get("ccrid") in want and r.get("segments")
        ]


def _to_tuple(obj, dtype):
    """JSON dict -> tuple shaped by the StructType (missing keys ->
    None, the VARIANT NULL-for-absent semantics of SURVEY §1.3)."""
    if obj is None:
        return None
    if isinstance(dtype, StructType):
        return tuple(_to_tuple(obj.get(f.name), f.dataType) for f in dtype.fields)
    if isinstance(dtype, ArrayType):
        return [_to_tuple(x, dtype.elementType) for x in obj]
    return obj


class _WindowPartition(InputPartition):
    def __init__(self, lo_ms: int, hi_ms: int):
        self.lo_ms, self.hi_ms = lo_ms, hi_ms


class _IdChunkPartition(InputPartition):
    def __init__(self, ids: list[int]):
        self.ids = ids


class _LinkChunkPartition(InputPartition):
    def __init__(self, links: list[str]):
        self.links = links


class _RestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.entity = options.get("entity", "contacts")
        self.base_dir = options.get("base_dir", "fixtures")
        self.pattern = options.get("pattern", "contacts_*.json")
        self.break_size = int(options.get("break_size", "2"))
        self.lo_ms = _iso_to_ms(options["begin_date"]) if "begin_date" in options else 0
        self.hi_ms = (
            _iso_to_ms(options["end_date"]) if "end_date" in options else 1 << 62
        )
        self.contact_ids = (
            [int(x) for x in options["contact_ids"].split(",")]
            if options.get("contact_ids")
            else []
        )
        # S4: the evaluation rows' `comments` HATEOAS links (comma-safe:
        # URL paths), one GET per link, chunked into partitions
        self.links = (
            [x for x in options["links"].split(",") if x]
            if options.get("links")
            else []
        )
        self.id_chunk = int(options.get("id_chunk", "8"))
        self.transport_path = options.get("transport", DEFAULT_TRANSPORT)
        self.options = options

    def pushFilters(self, filters):
        """Absorb startTime range predicates into the request window
        (source-level pushdown, the S2 `evalState=scored` pattern);
        everything else is returned for Spark to evaluate."""
        for f in filters:
            absorbed = False
            if (
                self.entity == "contacts"
                and getattr(f, "attribute", None) == ("startTime",)
                and hasattr(f, "value")
            ):
                v = f.value
                if isinstance(f, GreaterThanOrEqual):
                    self.lo_ms, absorbed = max(self.lo_ms, v), True
                elif isinstance(f, GreaterThan):
                    self.lo_ms, absorbed = max(self.lo_ms, v + 1), True
                elif isinstance(f, LessThan):
                    self.hi_ms, absorbed = min(self.hi_ms, v), True
                elif isinstance(f, LessThanOrEqual):
                    self.hi_ms, absorbed = min(self.hi_ms, v + 1), True
                elif isinstance(f, EqualTo):
                    self.lo_ms = max(self.lo_ms, v)
                    self.hi_ms, absorbed = min(self.hi_ms, v + 1), True
            if not absorbed:
                yield f

    def partitions(self):
        if self.entity in ("evaluations", "transcripts"):
            chunks = [
                self.contact_ids[i : i + self.id_chunk]
                for i in range(0, len(self.contact_ids), self.id_chunk)
            ]
            return [_IdChunkPartition(c) for c in chunks] or [_IdChunkPartition([])]
        if self.entity == "comments":
            chunks = [
                self.links[i : i + self.id_chunk]
                for i in range(0, len(self.links), self.id_chunk)
            ]
            return [_LinkChunkPartition(c) for c in chunks] or [_LinkChunkPartition([])]
        if self.entity == "forms":
            return [_WindowPartition(0, 1 << 62)]
        # contacts: one partition per break_size-day window, clipped to
        # the (possibly filter-narrowed) [lo, hi) request range
        step = self.break_size * _MS_PER_DAY
        lo = self.lo_ms
        out = []
        while lo < self.hi_ms:
            hi = min(lo + step, self.hi_ms)
            out.append(_WindowPartition(lo, hi))
            lo = hi
        return out or [_WindowPartition(0, 0)]

    def read(self, partition):
        transport = _resolve_transport(self.transport_path)(self.options)
        if self.entity == "forms":
            rows = transport.get_forms()
        elif self.entity == "evaluations":
            rows = transport.get_evaluations(partition.ids)
        elif self.entity == "transcripts":
            rows = transport.get_transcripts(partition.ids)
        elif self.entity == "comments":
            rows = transport.get_comments(partition.links)
        else:
            rows = transport.get_contacts(self.pattern, partition.lo_ms, partition.hi_ms)
        for r in rows:
            yield _to_tuple(r, self.schema)


class _RestStreamReader(DataSourceStreamReader):
    """Streaming contacts extraction: the reference's trailing-window
    incremental model (`Start.py:19,39` — re-pull a date window per
    scheduled run) as a Structured Streaming source with REAL offset
    tracking.

    Offsets are epoch-ms window boundaries: ``initialOffset`` =
    ``begin_date``; each micro-batch advances the offset by up to
    ``windows_per_batch * break_size`` days (capped at ``end_date`` —
    a live deployment would cap at now() instead and the stream would
    simply idle at the head).  ``partitions(start, end)`` splits the
    offset range into break_size-day request windows — the same unit
    of parallelism as the batch reader — and each partition fetches
    through the same injectable transport.  Exactly-once comes from
    the engine: offsets commit through the checkpoint log, and a
    retried batch re-fetches the identical window.
    """

    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.options = options
        self.lo_ms = _iso_to_ms(options.get("begin_date", "1970-01-01"))
        self.hi_ms = _iso_to_ms(options["end_date"]) if "end_date" in options else None
        self.break_ms = int(options.get("break_size", "2")) * _MS_PER_DAY
        self.windows_per_batch = int(options.get("windows_per_batch", "1"))
        self.transport_path = options.get("transport", DEFAULT_TRANSPORT)
        self.pattern = options.get("pattern", "all_contacts_*.json")

    def initialOffset(self) -> dict:
        return {"ms": self.lo_ms}

    def latestOffset(self) -> dict:
        # head of stream: advance up to windows_per_batch windows; a
        # live source would bound by wall clock, fixtures by end_date
        head = self.hi_ms if self.hi_ms is not None else self.lo_ms
        cur = getattr(self, "_last", self.lo_ms)
        nxt = min(head, cur + self.windows_per_batch * self.break_ms)
        self._last = nxt
        return {"ms": nxt}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["ms"], end["ms"]
        out = []
        while lo < hi:
            nxt = min(lo + self.break_ms, hi)
            out.append(_WindowPartition(lo, nxt))
            lo = nxt
        return out or [_WindowPartition(0, 0)]

    def read(self, partition):
        transport = _resolve_transport(self.transport_path)(self.options)
        for r in transport.get_contacts(self.pattern, partition.lo_ms, partition.hi_ms):
            yield _to_tuple(r, self.schema_)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the engine's checkpoint log


class CalabrioRestDataSource(DataSource):
    """format("calabrio_rest"): the reference extractor as a source
    (batch reader + streaming reader over the same transports)."""

    @classmethod
    def name(cls):
        return "calabrio_rest"

    def schema(self):
        return ENTITY_SCHEMAS[self.options.get("entity", "contacts")]

    def reader(self, schema):
        return _RestReader(schema, dict(self.options))

    def streamReader(self, schema):
        return _RestStreamReader(schema, dict(self.options))
