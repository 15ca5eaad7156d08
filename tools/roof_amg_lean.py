"""Lean AMG-on-roof probe (CPU, f64): does SA-AMG's operator-adapted
coarse space (rigid-mode tentative prolongator) give mesh-independent
CG iterations on the curved Scordelis-Lo roof where the geometric
Galerkin hierarchy weakens with depth?

Run ONE AT A TIME (single-core box):
  PYTHONPATH=/root/repo python tools/roof_amg_lean.py 64
"""
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(n):
    from fem_shell_tpu.amg import AMGShellSystem
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    mesh, forces, mid = scordelis_lo(n)
    print(f"# roof n={n} nodes={mesh.n_nodes}", flush=True)
    t0 = time.perf_counter()
    amg = AMGShellSystem(mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float64)
    t_setup = time.perf_counter() - t0
    t0 = time.perf_counter()
    u = amg.solve(forces, rtol=1e-9, maxiter=600)
    print(
        f"# amg: setup={t_setup:.0f}s levels={len(amg.levels)} "
        f"iters={amg.last_iters} res={amg.last_residual:.2e} "
        f"mid_w={float(u[mid, 2]):.6f} solve={time.perf_counter()-t0:.0f}s",
        flush=True,
    )


if __name__ == "__main__":
    for a in sys.argv[1:] or ["64"]:
        run(int(a))
