"""bench.py orchestrator contract tests (no TPU, no JAX).

Round 3 shipped an empty official scoreboard because the monolithic
bench outlived the driver timeout (BENCH_r03 rc=124, parsed=null).
These tests pin the delivery mechanics that prevent a recurrence:
every leg subprocess's LAST printed JSON line is what merges, a
timed-out leg yields its partial result plus a note, and a crashed leg
cannot sink the run.
"""

import importlib.util
import json
import os
import sys
import textwrap

import pytest


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(__file__), os.pardir, "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_leg(tmp_path, body):
    """Write a stand-in leg script; bench._run_leg re-invokes
    ``<python> <file> --leg <name>``, so the stub just ignores argv."""
    p = tmp_path / "fake_bench.py"
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_run_leg_takes_last_json_line(bench, tmp_path):
    bench.__file__ = _fake_leg(
        tmp_path,
        """
        import json
        print("noise, not json")
        print(json.dumps({"a": 1}), flush=True)
        print(json.dumps({"a": 1, "b": 2}), flush=True)
        """,
    )
    parsed, note = bench._run_leg("anything", timeout_s=30)
    assert parsed == {"a": 1, "b": 2}
    assert note is None


def test_run_leg_timeout_keeps_partial_result(bench, tmp_path):
    bench.__file__ = _fake_leg(
        tmp_path,
        """
        import json, time
        print(json.dumps({"partial": True}), flush=True)
        time.sleep(60)
        print(json.dumps({"partial": False}), flush=True)
        """,
    )
    parsed, note = bench._run_leg("anything", timeout_s=3)
    assert parsed == {"partial": True}
    assert note == "timeout"


def test_run_leg_crash_reports_rc(bench, tmp_path):
    bench.__file__ = _fake_leg(
        tmp_path,
        """
        import json, sys
        print(json.dumps({"before_crash": 1}), flush=True)
        sys.exit(3)
        """,
    )
    parsed, note = bench._run_leg("anything", timeout_s=30)
    assert parsed == {"before_crash": 1}
    assert note == "rc=3"


def test_run_leg_no_output(bench, tmp_path):
    bench.__file__ = _fake_leg(tmp_path, "import sys; sys.exit(1)\n")
    parsed, note = bench._run_leg("anything", timeout_s=30)
    assert parsed is None
    assert note == "rc=1"


def test_leg_registry_complete(bench):
    assert set(bench.LEGS) == {"headline", "vrt_tiny", "serving", "vrt_full"}
