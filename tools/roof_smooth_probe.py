"""Smoother-parameter study for the curved-shell (Scordelis-Lo) V-cycle:
the roof's MG-preconditioned CG needs 120+ iterations where the flat
plate needs ~20 — the coarse facet surfaces represent fine bending
modes poorly, so the smoother must cover more of the spectrum.

Sweeps (smoother, degree nu, chebyshev lower fraction) on the f32
galerkin hierarchy at a CPU-tractable size and reports CG iterations
to a fixed rtol.

Run: PYTHONPATH=/root/repo python tools/roof_smooth_probe.py [n]
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


def run(n=128):
    from fem_shell_tpu.mg import MultigridShellSystem
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    mesh, forces, mid = scordelis_lo(n)
    print(f"# roof n={n} nodes={mesh.n_nodes}", flush=True)
    configs = [
        ("jacobi", 3, None),
        ("chebyshev", 3, 0.25),
        ("chebyshev", 4, 0.25),
        ("chebyshev", 3, 0.0625),
        ("chebyshev", 4, 0.0625),
        ("chebyshev", 5, 0.04),
        ("chebyshev", 6, 0.02),
    ]
    for sm, nu, lo in configs:
        t0 = time.perf_counter()
        # f64 operator + f32 V-cycle: same preconditioner as the
        # production df path, but an outer CG whose residual floor is
        # far below rtol — iteration counts compare cleanly
        mg = MultigridShellSystem(
            mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float64,
            df_operator=False, smoother=sm, nu_smooth=nu,
        )
        if lo is not None:
            mg.cheby_lo = lo
        u = mg.solve_df(forces, rtol=1e-8, maxiter=300)
        w = float(u[mid, 2])
        print(
            f"# {sm}/nu{nu}/lo{lo}: iters={mg.last_iters} "
            f"res={mg.last_residual:.3e} w={w:.6f} "
            f"({time.perf_counter()-t0:.0f}s)",
            flush=True,
        )
        del mg


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
