"""Profiling utilities — the libMesh PerfLog analog (fem-shell.h:21;
methodology doc/validation.tex:500-518: named scopes for assembly / solver
/ overall, repeated runs, min/avg/max) plus jax.profiler trace capture.

Usage::

    perf = PerfLog()
    with perf.scope("assembly"):
        a = system.assemble()
    with perf.scope("solve"):
        u = system.solve(f)
    print(perf.report())

    with trace("/tmp/jax_trace"):       # XProf-compatible device trace
        system.solve(f)
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List


class PerfLog:
    def __init__(self):
        self._times: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def scope(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._times[name].append(time.perf_counter() - t0)

    def stats(self, name: str):
        ts = self._times[name]
        return {
            "n": len(ts),
            "min": min(ts),
            "avg": sum(ts) / len(ts),
            "max": max(ts),
            "total": sum(ts),
        }

    def report(self) -> str:
        lines = [f"{'scope':<24}{'n':>5}{'min':>12}{'avg':>12}{'max':>12}{'total':>12}"]
        for name in self._times:
            s = self.stats(name)
            lines.append(
                f"{name:<24}{s['n']:>5}{s['min']:>12.4f}{s['avg']:>12.4f}"
                f"{s['max']:>12.4f}{s['total']:>12.4f}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace (view with XProf/TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_until_ready(tree):
    """Convenience: block on every array in a pytree (accurate timing)."""
    import jax

    return jax.block_until_ready(tree)
