"""Chebyshev vs Jacobi smoother on the real TPU (VERDICT r2 weak #6:
tri MG iteration counts grow with mesh size — 128 inner iters at 1024^2
— and the Chebyshev smoother was CPU-tested but never TPU-run).

Run STANDALONE: nohup python tools/cheby_probe.py 1024 t > /tmp/cheby_probe.log 2>&1 &
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
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate

MAT = Material(nu=0.3, em=1e7, thickness=0.5)
GOLDEN = 0.1064045


def run(n, et, smoother, nu):
    from fem_shell_tpu.mg import MultigridShellSystem

    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, et == "q", "z")
    mesh, rows, fac = generate(p)
    forces = rows * fac
    t0 = time.perf_counter()
    mg = MultigridShellSystem(p, MAT, dtype=jnp.float32, df_operator=True,
                              smoother=smoother, nu_smooth=nu)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    u = mg.solve_df_refined(forces, rtol=1e-9, verbose=True)
    t_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    u = mg.solve_df_refined(forces, rtol=1e-9)
    t_solve = time.perf_counter() - t0
    w = float(u[mesh.n_nodes // 2, 2])
    err = abs(w - GOLDEN) / GOLDEN
    print(f"# {smoother}/nu={nu} n={n}{et}: build {t_build:.1f} s, warm "
          f"{t_warm:.1f} s, solve {t_solve:.3f} s, iters {mg.last_iters}, "
          f"true resid {mg.last_residual:.3e}, golden err {err:.2e}",
          flush=True)
    del mg


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    et = sys.argv[2] if len(sys.argv) > 2 else "t"
    print(f"# device={jax.devices()[0]}", flush=True)
    run(n, et, "jacobi", 3)
    run(n, et, "chebyshev", 3)
    run(n, et, "chebyshev", 4)


if __name__ == "__main__":
    main()
