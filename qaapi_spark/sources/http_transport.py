"""Production HTTP transport for the Calabrio REST source (S6).

Re-expresses the reference's authenticated extraction session
(`modules/qa_api_handler.py:58-71`: one `requests.Session`, one POST to
``/api/rest/authorize`` with the ``CALABRIO_KEY`` payload, cookie reuse
for every subsequent GET) as an injectable transport class for
:class:`qaapi_spark.sources.rest_source.CalabrioRestDataSource`.

Differences from the reference, on purpose:

- **auth-once per transport instance** — the reference logs in eagerly
  in ``ApiHandler.__init__`` and every request in the run reuses the
  session; here each Spark input partition constructs one transport in
  ``read()``, so a 1000-partition extract opens 1000 sessions, each
  authenticated exactly once (N sessions, not N×requests logins);
- **retry with exponential backoff** on transient failures (HTTP 429 /
  5xx / connection errors) — the reference has no retry at all, so one
  flaky GET kills a multi-hour extract;
- **no filesystem side-effects** — the reference appends raw bytes to
  landing files mid-extraction (`:142-143`); rows flow back through the
  DataSource reader and landing is a separate sink concern.

The container running the test-suite has no network, so this class is
import-tested and driven through a mocked session factory
(`tests/test_http_transport.py`); nothing in CI ever opens a socket.

Usage::

    df = (spark.read.format("calabrio_rest")
          .option("entity", "contacts")
          .option("transport", "qaapi_spark.sources.http_transport:SessionTransport")
          .option("base_url", "https://calabriocloud.com")
          .load())
"""

from __future__ import annotations

import json
import os
import time
from datetime import date, timedelta

_MS_PER_DAY = 86_400_000

#: HTTP statuses worth retrying (throttle + server-side transients).
RETRYABLE_STATUSES = frozenset({429, 500, 502, 503, 504})


def _ms_to_iso(ms: int) -> str:
    """Epoch-ms (UTC midnight grid) -> the ``%Y-%m-%d`` strings the
    reference formats with ``strftime`` (`qa_api_handler.py:101-102`)."""
    return (date(1970, 1, 1) + timedelta(days=ms // _MS_PER_DAY)).isoformat()


class TransportError(RuntimeError):
    """A request failed after exhausting retries."""


class SessionTransport:
    """Authenticated ``requests``-backed Calabrio transport.

    Options (all via the DataFrame reader's ``.option(...)`` calls):

    ``base_url``
        API root (default ``https://calabriocloud.com``).
    ``auth_payload``
        Credential payload POSTed to ``/api/rest/authorize``; falls back
        to the ``CALABRIO_KEY`` env var — the reference's exact contract
        (`modules/qa_api_handler.py:66`, `modules/snowflake.py:29-37`).
    ``eval_state``
        Server-side pushdown filter (reference sends ``scored`` for QA
        extracts, `:104-107`); empty string disables it.
    ``page_limit``
        Rows per contact-window request (reference: 50000, `:103`).
    ``max_retries`` / ``backoff_s``
        Retry policy: ``max_retries`` attempts after the first, sleeping
        ``backoff_s * 2**attempt`` between tries.
    ``session_factory``
        Test seam: a callable returning a session-shaped object.  When
        absent, ``requests.Session`` is used (import gated so the class
        stays importable in environments without ``requests``).
    """

    def __init__(self, options: dict):
        self.base_url = str(options.get("base_url", "https://calabriocloud.com")).rstrip("/")
        self.eval_state = options.get("eval_state", "scored")
        self.page_limit = int(options.get("page_limit", 50000))
        self.max_retries = int(options.get("max_retries", 3))
        self.backoff_s = float(options.get("backoff_s", 0.5))
        self._sleep = options.get("sleep_fn", time.sleep)  # test seam

        factory = options.get("session_factory")
        if factory is None:
            try:
                import requests
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise ImportError(
                    "SessionTransport needs the 'requests' package (or pass "
                    "a session_factory option); use FixtureTransport for "
                    "network-free runs"
                ) from exc
            factory = requests.Session
        self.session = factory()

        # Auth prelude: POST once, cookie session reused by every GET
        # (reference `modules/qa_api_handler.py:58-71`).
        payload = options.get("auth_payload", os.environ.get("CALABRIO_KEY"))
        if payload is None:
            raise ValueError(
                "no credentials: pass auth_payload or set CALABRIO_KEY"
            )
        resp = self._send("POST", f"{self.base_url}/api/rest/authorize", data=payload)
        self.auth_status = resp.status_code

    # -- plumbing ---------------------------------------------------------

    def _send(self, method: str, url: str, **kwargs):
        """One request with bounded exponential-backoff retry."""
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            if attempt:
                self._sleep(self.backoff_s * (2 ** (attempt - 1)))
            try:
                resp = self.session.request(method, url, **kwargs)
            except Exception as exc:  # connection-level failure
                last_err = exc
                continue
            if resp.status_code in RETRYABLE_STATUSES:
                last_err = TransportError(f"HTTP {resp.status_code} from {url}")
                continue
            return resp
        raise TransportError(f"{method} {url} failed after {self.max_retries + 1} tries") from last_err

    def _get_json(self, url: str, params: dict | None = None):
        resp = self._send("GET", url, params=params)
        if resp.status_code >= 400:
            raise TransportError(f"HTTP {resp.status_code} from {url}")
        return json.loads(resp.text)

    # -- the rest_source transport contract -------------------------------

    def get_contacts(self, pattern: str, lo_ms: int, hi_ms: int) -> list[dict]:
        """S2 window request: one GET per [lo, hi) date window with the
        reference's param vocabulary (`qa_api_handler.py:101-107`).
        ``pattern`` is a landing-file concern; ignored over HTTP."""
        params = {
            "beginDate": _ms_to_iso(lo_ms),
            "endDate": _ms_to_iso(hi_ms),
            "limit": self.page_limit,
        }
        if self.eval_state:
            params["evalState"] = self.eval_state
        return self._get_json(f"{self.base_url}/api/rest/recording/contact", params)

    def get_forms(self) -> list[dict]:
        """S1: all evaluation forms in one GET (`qa_api_handler.py:73-84`)."""
        return self._get_json(f"{self.base_url}/api/rest/recording/evalform")

    def get_evaluations(self, contact_ids: list[int]) -> list[dict]:
        """S3 fan-out: one GET per contact id
        (`qa_api_handler.py:127-161`), flattened into one row list."""
        out: list[dict] = []
        for cid in contact_ids:
            out.extend(
                self._get_json(f"{self.base_url}/api/rest/recording/contact/{cid}/eval/")
            )
        return out

    def get_comments(self, links: list[str]) -> list[dict]:
        """S4 link-following: GET ``base + link`` for each evaluation's
        ``comments`` HATEOAS link (`qa_api_handler.py:202-228`)."""
        out: list[dict] = []
        for link in links:
            out.extend(self._get_json(self.base_url + link))
        return out

    def get_transcripts(self, contact_ids: list[int]) -> list[dict]:
        """S5 keyed lookup with empty-result skip
        (`qa_api_handler.py:163-200`, skip at `:187-188`)."""
        out: list[dict] = []
        for cid in contact_ids:
            rows = self._get_json(
                f"{self.base_url}/api/rest/cas/speechtextview",
                {"ccrid": cid, "isRootRecording": "false"},
            )
            if not rows:
                continue
            if isinstance(rows, dict):
                out.append(rows)
            else:
                out.extend(rows)
        return out
