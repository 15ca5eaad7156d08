"""K-cycle vs V-cycle on the roof Galerkin hierarchy (CPU, f64 fine op,
f32 cycle = production preconditioner shape).

Measures outer CG iterations to rtol for cycle in {V, K} (flexible outer
CG for K — the K-cycle coarse solves are nonlinear) plus per-cycle cost
proxy (wall time) so iterations x cost can be compared.

Run: PYTHONPATH=/root/repo python tools/roof_kcycle_probe.py [n ...]
(pure-CPU process; safe alongside a TPU job)
"""
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(n=64):
    from fem_shell_tpu.mg import MultigridShellSystem
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    mesh, forces, mid = scordelis_lo(n)
    print(f"# roof n={n} nodes={mesh.n_nodes}", flush=True)

    for cyc in ("V", "K"):
        mg = MultigridShellSystem(
            mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float64,
            df_operator=False, smoother="chebyshev", cycle=cyc,
        )
        t0 = time.perf_counter()
        u = mg.solve(forces, rtol=1e-9, maxiter=600)
        dt = time.perf_counter() - t0
        w = float(u[mid, 2])
        print(
            f"# cycle={cyc}: levels={mg.n_levels} iters={int(mg.last_cg.iters)} "
            f"res={float(mg.last_cg.residual):.2e} mid_w={w:.6f} ({dt:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [64]
    for n in ns:
        run(n)
