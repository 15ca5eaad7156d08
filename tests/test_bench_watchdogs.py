"""bench.py harness-safety behavior: the headline JSON line always
precedes the (hour-scale) scale section, and every wedge mode observed
on the remote TPU worker (blocked compile RPC, blocked device
discovery) terminates the process instead of hanging the harness.

Each case runs bench.py in a SUBPROCESS with the heavy stages stubbed
(the real TPU bench is exercised by the driver and
tools/run_tpu_tests.py); what these tests pin is control flow: print
ordering, watchdog firing, exit codes.
"""
import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PRELUDE = """
import importlib.util, time, os, sys
spec = importlib.util.spec_from_file_location("benchmod", r"{repo}/bench.py")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
import jax
jax.config.update("jax_platforms", "cpu")
"""


def _run(body: str, env: dict, timeout: int = 120):
    code = _PRELUDE.format(repo=_REPO) + body
    e = dict(os.environ)
    e.update(env)
    e["PYTHONPATH"] = _REPO  # drops the axon sitecustomize -> pure CPU
    e["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout, env=e, cwd=_REPO,
    )


def test_headline_prints_before_scale_section():
    """A scale-section failure (or timeout) must not lose the metric."""
    r = _run(
        "m.bench_case = lambda et: (0.5, 'stub')\n"
        "m.bench_scale = lambda: (_ for _ in ()).throw(RuntimeError('boom'))\n"
        "m.main()\n",
        {"FEMSHELL_BENCH_SCALE": "1"},
    )
    assert r.returncode == 0, r.stderr
    line = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert len(line) == 1
    payload = json.loads(line[0])
    assert payload["metric"] == "testG_quad_overall_s"
    assert "scale bench unavailable" in r.stderr


def test_scale_watchdog_fires_and_exits_zero():
    r = _run(
        "m.bench_case = lambda et: (0.5, 'stub')\n"
        "m.bench_scale = lambda: time.sleep(60) or {}\n"
        "m.main()\n"
        "print('UNREACHABLE')\n",
        {"FEMSHELL_BENCH_SCALE_TIMEOUT": "1"},
    )
    assert r.returncode == 0, r.stderr
    assert "scale bench timed out" in r.stderr
    assert "UNREACHABLE" not in r.stdout  # os._exit, not a fall-through
    line = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert len(line) == 1  # headline survived the timeout


def test_discovery_watchdog_exits_nonzero_without_metric():
    r = _run(
        "class _Slow:\n"
        "    def __call__(self): time.sleep(60); return ['x']\n"
        "m.jax.devices = _Slow()\n"
        "m.main()\n",
        {"FEMSHELL_BENCH_DISCOVERY_TIMEOUT": "1"},
    )
    assert r.returncode == 1
    assert "device discovery blocked" in r.stderr
    assert not [l for l in r.stdout.splitlines() if l.startswith("{")]


def test_supervisor_passes_headline_through():
    """Happy path: the child's stdout (incl. the JSON line) streams
    through the supervisor unchanged, exit code propagates."""
    r = _run(
        "import sys as _s\n"
        "m._supervise(child_cmd=[_s.executable, '-c',\n"
        "    'print(chr(123) + chr(34) + \"metric\" + chr(34) + chr(58) + chr(34) + \"x\" + chr(34) + chr(125))'])\n",
        {"FEMSHELL_BENCH_HEADLINE_TIMEOUT": "30"},
    )
    assert r.returncode == 0, r.stderr
    line = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert len(line) == 1 and json.loads(line[0])["metric"] == "x"


def test_supervisor_kills_wedged_child_and_retries(tmp_path):
    """A child that produces no headline within the budget is killed and
    rerun once (the r3-observed wedge clears when the client dies); the
    retry's headline must be the only one on stdout."""
    marker = tmp_path / "first_attempt_ran"
    child_code = (
        "import os, sys, time, json\n"
        f"p = {str(marker)!r}\n"
        "if not os.path.exists(p):\n"
        "    open(p, 'w').close()\n"
        "    time.sleep(600)  # wedged: no headline, no exit\n"
        "print(json.dumps({'metric': 'retry_ok'}))\n"
    )
    r = _run(
        "import sys as _s\n"
        f"m._supervise(child_cmd=[_s.executable, '-c', {child_code!r}])\n",
        {"FEMSHELL_BENCH_HEADLINE_TIMEOUT": "3"},
        timeout=180,
    )
    assert r.returncode == 0, r.stderr
    assert "killing wedged bench child" in r.stderr
    line = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert len(line) == 1 and json.loads(line[0])["metric"] == "retry_ok"


def test_supervisor_gives_up_after_two_wedges():
    r = _run(
        "import sys as _s\n"
        "m._supervise(child_cmd=[_s.executable, '-c', 'import time; time.sleep(600)'])\n",
        {"FEMSHELL_BENCH_HEADLINE_TIMEOUT": "2"},
        timeout=180,
    )
    assert r.returncode != 0
    assert not [l for l in r.stdout.splitlines() if l.startswith("{")]


def test_scale_section_skippable():
    r = _run(
        "m.bench_case = lambda et: (0.5, 'stub')\n"
        "m.bench_scale = lambda: (_ for _ in ()).throw(AssertionError('must not run'))\n"
        "m.main()\n",
        {"FEMSHELL_BENCH_SCALE": "0"},
    )
    assert r.returncode == 0, r.stderr
    assert "must not run" not in r.stderr
    assert len([l for l in r.stdout.splitlines() if l.startswith("{")]) == 1
