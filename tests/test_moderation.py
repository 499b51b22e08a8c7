"""violates_moderation (llava/utils.py:173-190 parity): request shape,
flagged verdict pass-through, and fail-open on every error class."""

import io
import json

import pytest

from rsvldm_tpu.utils.moderation import (MODERATION_URL, moderation_msg,
                                         violates_moderation)


class _Resp:
    def __init__(self, body: bytes):
        self._body = body

    def read(self):
        return self._body

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_no_key_fails_open(monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    assert violates_moderation("anything") is False


def test_flagged_verdict(monkeypatch):
    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
    seen = {}

    def fake_urlopen(req, timeout):
        seen["url"] = req.full_url
        seen["auth"] = req.get_header("Authorization")
        seen["body"] = json.loads(req.data)
        return _Resp(json.dumps(
            {"results": [{"flagged": True}]}).encode())

    assert violates_moderation("bad\ntext", _urlopen=fake_urlopen) is True
    assert seen["url"] == MODERATION_URL
    assert seen["auth"] == "Bearer sk-test"
    # newlines stripped before sending (utils.py:180)
    assert seen["body"] == {"input": "badtext"}


def test_clean_verdict(monkeypatch):
    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")

    def fake_urlopen(req, timeout):
        return _Resp(json.dumps({"results": [{"flagged": False}]}).encode())

    assert violates_moderation("hello", _urlopen=fake_urlopen) is False


@pytest.mark.parametrize("fail", [
    lambda req, timeout: (_ for _ in ()).throw(OSError("down")),
    lambda req, timeout: _Resp(b"not json"),
    lambda req, timeout: _Resp(json.dumps({"unexpected": 1}).encode()),
])
def test_errors_fail_open(monkeypatch, fail):
    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
    assert violates_moderation("x", _urlopen=fail) is False


def test_moderation_msg_verbatim():
    assert moderation_msg.startswith("I am sorry. Your input may violate")
