"""bench.py orchestrator contract tests (no TPU, no JAX).

Round 3 shipped an empty official scoreboard because the monolithic
bench outlived the driver timeout (BENCH_r03 rc=124, parsed=null);
round 4 additionally found that EVERY fresh TPU process pays a
140-240 s axon-tunnel congestion stall, which starved the secondary
legs out of per-leg subprocesses twice in a row. These tests pin the
delivery mechanics of the single persistent worker that prevents both:
all legs share one worker process, each leg's LAST printed JSON line is
what merges, a timed-out leg keeps its partial result (and kills the
wedged worker so later legs skip instead of hanging), a leg that raises
is noted without sinking the legs after it, and a worker crash reports
its rc without losing already-printed metrics.
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


# A stand-in worker implementing the ``--serve`` line protocol with one
# scripted behavior per leg name. bench._LegServer re-invokes
# ``<python> <bench.__file__> --serve``, so pointing __file__ at this
# script swaps the worker while keeping the orchestrator under test.
FAKE_SERVE = """
import json, os, sys, time

def emit(o):
    print(json.dumps(o), flush=True)

for line in sys.stdin:
    name = line.strip()
    if name == "prime":
        emit({"pid": os.getpid()})
    elif name == "good":
        emit({"a": 1})
        emit({"a": 1, "b": 2, "pid": os.getpid()})
    elif name == "slow":
        emit({"partial": True, "pid": os.getpid()})
        time.sleep(60)
        emit({"partial": False})
    elif name == "slow_short":
        emit({"partial": True})
        time.sleep(8)
        emit({"late_line": 1})
    elif name == "raises":
        emit({"kept": 1})
        emit({"__leg_error__": "raises: ValueError('boom')"})
    elif name == "crash":
        emit({"before_crash": 1})
        sys.exit(3)
    emit({"__leg_done__": name})
"""


@pytest.fixture()
def server(bench, tmp_path):
    p = tmp_path / "fake_bench.py"
    p.write_text(textwrap.dedent(FAKE_SERVE))
    bench.__file__ = str(p)
    srv = bench._LegServer()
    # absorb worker-process startup (can exceed the short per-leg
    # deadlines below when the box is under load) so the timed legs
    # exercise protocol behavior, not interpreter spawn time
    primed, pnote = srv.run_leg("prime", timeout_s=120)
    assert pnote is None, pnote
    yield srv
    srv.kill()


def test_one_worker_serves_all_legs_last_line_wins(server):
    parsed1, note1 = server.run_leg("good", timeout_s=30)
    parsed2, note2 = server.run_leg("good", timeout_s=30)
    assert note1 is None and note2 is None
    assert parsed1["b"] == 2  # last JSON line, not the first
    # the single-process property: both legs ran in the SAME worker
    assert parsed1["pid"] == parsed2["pid"]


def test_echo_forwards_metric_lines_immediately(server, capsys):
    """echo=True puts each metric line on the parent's stdout as it
    arrives, so a kill of the PARENT mid-leg still leaves the
    best-so-far result as the last stdout line."""
    server.run_leg("good", timeout_s=30, echo=True)
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert [set(o) - {"pid"} for o in lines] == [{"a"}, {"a", "b"}]
    # sentinel lines are never echoed
    assert not any("__leg_done__" in o for o in lines)


def test_timeout_keeps_partial_and_kills_worker(server):
    parsed, note = server.run_leg("slow", timeout_s=3)
    assert parsed == {"partial": True, "pid": parsed["pid"]}
    assert note == "timeout"
    # the wedged worker was killed; later legs skip instead of hanging
    parsed2, note2 = server.run_leg("good", timeout_s=3)
    assert parsed2 is None
    assert note2 == "skipped (worker dead)"


def test_leg_error_noted_without_sinking_later_legs(server):
    parsed, note = server.run_leg("raises", timeout_s=30)
    assert parsed == {"kept": 1}  # metrics printed before the error merge
    assert "ValueError" in note
    parsed2, note2 = server.run_leg("good", timeout_s=30)
    assert note2 is None and parsed2["b"] == 2


def test_no_kill_timeout_keeps_worker_for_later_legs(server):
    """kill_on_timeout=False (the warmup policy): a leg that outlives its
    deadline leaves the worker ALIVE, its late output is discarded, and
    the next leg still gets its own result — a >deadline first-contact
    stall delays the headline instead of emptying the scoreboard."""
    parsed, note = server.run_leg(
        "slow_short", timeout_s=4, kill_on_timeout=False
    )
    assert note == "timeout"
    assert parsed == {"partial": True}
    assert not server.dead
    # the overdue leg finishes inside the next leg's window; its late
    # lines are not attributed to this leg
    parsed2, note2 = server.run_leg("good", timeout_s=30)
    assert note2 is None
    assert parsed2["b"] == 2 and "late_line" not in parsed2


def test_no_kill_timeout_drops_overdue_lines(server, capsys):
    """Late metric lines from an overdue leg are never echoed or parsed
    into the next leg, and the next leg's done-sentinel is matched by
    name."""
    server.run_leg("slow_short", timeout_s=4, kill_on_timeout=False)
    parsed, note = server.run_leg("good", timeout_s=90, echo=True)
    assert note is None and parsed["b"] == 2
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    # only the "good" leg's lines were echoed; the overdue leg's
    # late_line was dropped
    assert [set(o) - {"pid"} for o in lines] == [{"a"}, {"a", "b"}]


def test_worker_crash_reports_rc_keeps_partial(server):
    parsed, note = server.run_leg("crash", timeout_s=30)
    assert parsed == {"before_crash": 1}
    assert note == "rc=3"
    assert server.dead


def test_leg_registry_complete(bench):
    assert set(bench.LEGS) == {
        "warmup", "headline", "train", "vrt_tiny", "serving", "vrt_full"
    }
    # every capped leg exists; the contract legs (warmup/headline) are
    # deliberately uncapped — their deadline is the whole remaining budget
    assert set(bench.LEG_CAP_S) == {"train", "serving", "vrt_full", "vrt_tiny"}


def test_respawn_after_wedge_serves_later_legs(bench, server):
    """The orchestrator's wedge-recovery move: after a timeout kills the
    worker, a FRESH _LegServer (same construction path main() uses)
    serves the remaining legs in a new process."""
    parsed, note = server.run_leg("slow", timeout_s=3)
    assert note == "timeout" and server.dead
    fresh = bench._LegServer()
    try:
        parsed2, note2 = fresh.run_leg("good", timeout_s=120)
        assert note2 is None and parsed2["b"] == 2
        assert parsed2["pid"] != parsed["pid"]  # genuinely a new worker
    finally:
        fresh.kill()
