"""SessionTransport unit tests over a mocked session (no sockets).

Proves the S6 contract (VERDICT r2 next #9): session-auth exactly once
in ``__init__`` (reference `modules/qa_api_handler.py:58-71`), request
param passthrough for every endpoint, and bounded retry/backoff —
all without network.
"""

from __future__ import annotations

import json

import pytest

from qaapi_spark.sources.http_transport import SessionTransport, TransportError


class FakeResponse:
    def __init__(self, status_code=200, body=None):
        self.status_code = status_code
        self.text = json.dumps(body if body is not None else [])


class FakeSession:
    """Records every request; scripted per-URL responses."""

    def __init__(self, script=None, fail_first=0):
        self.calls = []  # (method, url, kwargs)
        self.script = script or {}
        self.fail_first = fail_first

    def request(self, method, url, **kwargs):
        self.calls.append((method, url, kwargs))
        if self.fail_first > 0:
            self.fail_first -= 1
            return FakeResponse(status_code=503)
        for frag, body in self.script.items():
            if frag in url:
                return FakeResponse(body=body)
        return FakeResponse(body=[])


def _transport(session, **extra):
    opts = {
        "auth_payload": '{"user": "u", "pw": "p"}',
        "session_factory": lambda: session,
        "sleep_fn": lambda s: None,
        **extra,
    }
    return SessionTransport(opts)


def test_auth_once_then_reused_for_gets():
    ses = FakeSession()
    tr = _transport(ses)
    tr.get_forms()
    tr.get_forms()
    auths = [c for c in ses.calls if c[0] == "POST" and "authorize" in c[1]]
    assert len(auths) == 1, "login must happen exactly once, in __init__"
    assert auths[0][2]["data"] == '{"user": "u", "pw": "p"}'
    assert ses.calls[0] == auths[0], "auth is the prelude, before any GET"
    assert tr.auth_status == 200


def test_contact_window_param_passthrough():
    ses = FakeSession()
    tr = _transport(ses)
    day_ms = 86_400_000
    tr.get_contacts("ignored", 19_000 * day_ms, 19_002 * day_ms)
    _, url, kw = ses.calls[-1]
    assert url.endswith("/api/rest/recording/contact")
    # reference param vocabulary: qa_api_handler.py:101-107
    assert kw["params"] == {
        "beginDate": "2022-01-08",
        "endDate": "2022-01-10",
        "limit": 50000,
        "evalState": "scored",
    }


def test_eval_state_disable_and_fanout_urls():
    ses = FakeSession(script={"/eval/": [{"id": 7}]})
    tr = _transport(ses, eval_state="")
    tr.get_contacts("x", 0, 86_400_000)
    assert "evalState" not in ses.calls[-1][2]["params"]
    rows = tr.get_evaluations([11, 22])
    urls = [c[1] for c in ses.calls if "/eval/" in c[1]]
    assert urls == [
        "https://calabriocloud.com/api/rest/recording/contact/11/eval/",
        "https://calabriocloud.com/api/rest/recording/contact/22/eval/",
    ]
    assert rows == [{"id": 7}, {"id": 7}]


def test_comment_link_following_and_transcript_skip():
    ses = FakeSession(
        script={"/comment/": [{"id": 1}], "speechtextview": []}
    )
    tr = _transport(ses)
    got = tr.get_comments(["/api/rest/recording/contact/3/eval/4/comment/"])
    assert got == [{"id": 1}]
    assert any(
        c[1] == "https://calabriocloud.com/api/rest/recording/contact/3/eval/4/comment/"
        for c in ses.calls
    )
    # S5: empty transcript responses are dropped (qa_api_handler.py:187-188)
    assert tr.get_transcripts([9]) == []
    _, url, kw = ses.calls[-1]
    assert url.endswith("/api/rest/cas/speechtextview")
    assert kw["params"] == {"ccrid": 9, "isRootRecording": "false"}


def test_retry_backoff_then_success():
    sleeps = []
    ses = FakeSession(fail_first=2)
    tr = SessionTransport(
        {
            "auth_payload": "k",
            "session_factory": lambda: ses,
            "sleep_fn": sleeps.append,
            "backoff_s": 0.25,
        }
    )
    # auth itself consumed the two 503s: 3 attempts, exponential waits
    auth_calls = [c for c in ses.calls if c[0] == "POST"]
    assert len(auth_calls) == 3
    assert sleeps == [0.25, 0.5]
    assert tr.auth_status == 200


def test_retries_exhausted_raises():
    ses = FakeSession(fail_first=99)
    with pytest.raises(TransportError):
        _transport(ses, max_retries=2)
    assert len(ses.calls) == 3  # initial + 2 retries


def test_missing_credentials_rejected(monkeypatch):
    monkeypatch.delenv("CALABRIO_KEY", raising=False)
    with pytest.raises(ValueError):
        SessionTransport({"session_factory": FakeSession})
