"""Smoother-parameter study for the curved-shell (Scordelis-Lo) V-cycle.

The roof's MG-preconditioned CG needs 120+ iterations where the flat
plate needs ~20: the coarse facet surfaces represent fine bending modes
poorly, so the smoother must cover more of the spectrum. This probe
measures the V-cycle CONTRACTION FACTOR rho directly (stationary
iteration x <- x + M(b - Ax), f64 fine operator, f32 V-cycle — the
production preconditioner) for (smoother, degree, chebyshev lower
fraction) combinations. CG iterations to rtol scale as
log(rtol)/log(rho_cg), rho_cg ~ (1-sqrt(1-rho))/(1+sqrt(1-rho)).

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


def run(n=128, iters=25):
    from fem_shell_tpu.mg import MultigridShellSystem
    from fem_shell_tpu.ops.soa import soa_matvec
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
        mg = MultigridShellSystem(
            mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float64,
            df_operator=False, smoother=sm, nu_smooth=nu,
        )
        if lo is not None:
            mg.cheby_lo = lo
            # omega/lam were computed at build; lam is config-free, ok
        mg._ensure_f32_levels()
        fine = mg.levels[0]
        l32 = mg._levels32

        b = np.zeros((fine.npad, 6))
        b[: fine.nyp * fine.nxp] = np.asarray(forces)
        b = jnp.asarray(b.T) * fine.free_t

        @jax.jit
        def step(x, r):
            z = mg._vcycle(l32, 0, r.astype(jnp.float32)).astype(jnp.float64)
            x = x + z
            r = b - soa_matvec(fine.values, x, offsets=fine.offsets)
            return x, r, jnp.linalg.norm(r)

        x = jnp.zeros_like(b)
        r = b
        rho_hist = []
        prev = float(jnp.linalg.norm(b))
        for _ in range(iters):
            x, r, rn = step(x, r)
            rn = float(rn)
            rho_hist.append(rn / prev)
            prev = rn
        rho = float(np.median(rho_hist[-8:]))
        red = np.log(10) / max(-np.log(rho), 1e-12)
        print(
            f"# {sm}/nu{nu}/lo{lo}: rho={rho:.4f} "
            f"(iters/decade={red:.1f}) final_rel={prev / float(jnp.linalg.norm(b)):.3e} "
            f"({time.perf_counter()-t0:.0f}s)",
            flush=True,
        )
        del mg


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
