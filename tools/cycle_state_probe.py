"""Steady-state rebuild/solve cycling cost (real TPU).

The r4 stage profiler showed reassemble() costs 65 s right after a
refined solve, 24 s on the next call, and 4.9 s on the third — while
SCALE_BENCH's `operator_rebuild_s` (timed on the FIRST rebuild after the
warm solve) records the 22-24 s regime. A production coupled driver
alternates reassemble <-> solve every timestep, so the number that
matters is the REPEATING cost. This probe runs the alternation several
times and prints each leg.

Run STANDALONE:
  nohup python tools/cycle_state_probe.py 1024 t > /tmp/cycle_state.log 2>&1 &
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    et = sys.argv[2] if len(sys.argv) > 2 else "t"
    print(f"# device={jax.devices()[0]}  n={n} et={et}", flush=True)

    from fem_shell_tpu.mg import MultigridShellSystem

    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2,
                      et == "q", "z")
    mesh, rows, fac = generate(p)
    forces = rows * fac

    t0 = time.perf_counter()
    mg = MultigridShellSystem(p, MAT, dtype=jnp.float32, df_operator=True,
                              smoother="chebyshev")
    print(f"# construct: {time.perf_counter() - t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    mg.solve_df_refined(forces, rtol=1e-9)
    print(f"# warm solve: {time.perf_counter() - t0:.1f} s", flush=True)

    for i in range(4):
        t0 = time.perf_counter()
        mg.reassemble()
        t_re = time.perf_counter() - t0
        t0 = time.perf_counter()
        mg.solve_df_refined(forces, rtol=1e-9)
        t_sv = time.perf_counter() - t0
        print(f"# cycle[{i}]: rebuild {t_re:6.1f} s  solve {t_sv:6.1f} s "
              f"({mg.last_iters} it, res {mg.last_residual:.2e})", flush=True)


if __name__ == "__main__":
    main()
