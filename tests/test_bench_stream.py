"""Unit tests for bench.stream_parts — the one-child part-streaming loop.

stream_parts is the mechanism that made the driver bench fit its wall
clock (ROUND4.md §1): all parts ride ONE bench_full.py child so the
relay's per-process first-compile toll is paid once, results merge into
bench.RES as JSON lines arrive, and a hung part is identified by argv
order so the caller can drop it and respawn with the rest. These tests
pin that behavior against a FAKE bench_full.py (bench.HERE is
monkeypatched to a temp dir), so no jax import and no TPU.
"""

import json
import os
import sys
import textwrap
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # side-effect-free: handlers arm only under __main__


@pytest.fixture
def fake_child(tmp_path, monkeypatch):
    """Install a fake bench_full.py in a temp HERE; returns a writer."""
    monkeypatch.setattr(bench, "HERE", str(tmp_path))
    monkeypatch.setitem(bench.__dict__, "RES", {})

    def write(body):
        script = tmp_path / "bench_full.py"
        script.write_text("import json, sys, time\n"
                          + textwrap.dedent(body))
        return script

    return write


def _run(parts, budget=30.0, first_timeout=10.0, part_timeout=10.0):
    return bench.stream_parts(parts, time.time() + budget, first_timeout,
                              part_timeout)


def test_all_parts_complete_and_merge(fake_child):
    fake_child("""
        for name in sys.argv[1:]:
            print(json.dumps({"part": name, name + "_x": 1.5}), flush=True)
    """)
    pending, _, respawn = _run(["a", "b", "c"])
    assert pending == [] and not respawn
    assert bench.RES == {"a_x": 1.5, "b_x": 1.5, "c_x": 1.5}


def test_hung_part_identified_by_argv_order(fake_child):
    # the child completes "a" then hangs on "b" — pending[0] must be "b"
    # and "a"'s result must already be merged when the clock fires
    fake_child("""
        print(json.dumps({"part": "a", "a_x": 2.0}), flush=True)
        time.sleep(60)
    """)
    t0 = time.time()
    # first_timeout generous: the child pays interpreter startup (~2-3 s
    # through the axon sitecustomize, more under CI load) before printing
    # "a" — the behavior under test is the RE-ARMED part clock catching
    # the hang on "b" 2 s after "a" completes
    pending, _, _ = _run(["a", "b", "c"], budget=40.0, part_timeout=2.0,
                      first_timeout=15.0)
    assert pending == ["b", "c"]
    assert bench.RES["a_x"] == 2.0
    # the part clock (re-armed at part_timeout after "a"), not the budget,
    # ended the wait
    assert time.time() - t0 < 30


def test_crashed_child_returns_remaining_and_stderr(fake_child):
    fake_child("""
        print(json.dumps({"part": "a", "a_x": 3.0}), flush=True)
        print("boom: traceback tail", file=sys.stderr, flush=True)
        sys.exit(1)
    """)
    pending, stderr_tail, _ = _run(["a", "b"])
    assert pending == ["b"]
    assert bench.RES["a_x"] == 3.0
    assert any("boom" in ln for ln in stderr_tail)


def test_non_json_noise_lines_are_ignored(fake_child):
    fake_child("""
        print("WARNING: some library noise", flush=True)
        print(json.dumps({"part": "a", "a_x": 4.0}), flush=True)
        print("trailing chatter", flush=True)
    """)
    pending, _, _ = _run(["a"])
    assert pending == []
    assert bench.RES["a_x"] == 4.0


def test_error_result_lines_still_complete_their_part(fake_child):
    # bench_full prints {"part": name, name+"_error": ...} when a part
    # raises — the part must count as DONE (not hung), so the loop moves on
    fake_child("""
        print(json.dumps({"part": "a", "a_error": "ValueError: x"}),
              flush=True)
        print(json.dumps({"part": "b", "b_x": 5.0}), flush=True)
    """)
    pending, _, _ = _run(["a", "b"])
    assert pending == []
    assert bench.RES["a_error"] == "ValueError: x"
    assert bench.RES["b_x"] == 5.0


def test_oom_part_triggers_clean_respawn(fake_child):
    """A part that completes with a RESOURCE_EXHAUSTED error can leave the
    child's relay device wedged for every later part (observed round 5) —
    stream_parts must stop the child and flag a clean respawn with the
    remaining parts intact (none of them blamed)."""
    fake_child("""
        print(json.dumps({"part": "a", "a_x": 1.0}), flush=True)
        print(json.dumps({"part": "b",
                          "b_error": "JaxRuntimeError: RESOURCE_EXHAUSTED: "
                                     "TPU backend error"}), flush=True)
        print(json.dumps({"part": "c", "c_x": 9.9}), flush=True)
    """)
    pending, _, respawn = _run(["a", "b", "c"])
    assert respawn is True
    assert pending == ["c"]          # innocent, not blamed
    assert bench.RES["a_x"] == 1.0
    assert "RESOURCE_EXHAUSTED" in bench.RES["b_error"]
    assert "c_x" not in bench.RES    # c never ran in the wedged child
