"""Depth discriminator for the roof V-cycle divergence (rho=2.7 as a
stationary iteration at n_levels=7, tools/roof_smooth_probe.py).

A VARIATIONAL two-grid cycle (Galerkin A_c = P^T A P, exact coarse
solve, convergent smoother) is a contraction in exact arithmetic — if
the measured two-grid rho >= 1 the implementation (transfers / RAP /
masking) is inconsistent; if two-grid contracts but rho grows past 1
with depth, the recursion (inexact coarse solves on weakening
hierarchies) is the problem and a W-cycle / K-cycle / stronger smoother
is the fix.

Run: PYTHONPATH=/root/repo python tools/roof_depth_probe.py [n]
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


def run(n=64, iters=25):
    from fem_shell_tpu.mg import MultigridShellSystem
    from fem_shell_tpu.ops.soa import soa_matvec
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    mesh, forces, mid = scordelis_lo(n)
    print(f"# roof n={n} nodes={mesh.n_nodes}", flush=True)
    max_depth = 1
    m = n
    while m % 2 == 0 and m > 8:
        m //= 2
        max_depth += 1
    mg64 = MultigridShellSystem(
        mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float64,
        df_operator=False, n_levels=2, coarse_op="galerkin",
    )
    fine = mg64.levels[0]
    b = np.zeros((fine.npad, 6))
    b[: fine.nyp * fine.nxp] = np.asarray(forces)
    b = jnp.asarray(b.T) * fine.free_t

    for depth in range(2, max_depth + 1):
        # three cycle variants against the SAME f64 reference operator:
        #   f64  — pure f64 cycle (exact-arithmetic / algorithm check)
        #   f32c — f64 build, levels cast to f32 (dense_inv cast: the
        #          worst-case coarse solve)
        #   prod — dtype=f32 production build (diagonally SCALED f32
        #          coarsest Cholesky — what the roof scale path runs)
        for sm, variant in (("jacobi", "f64"), ("jacobi", "f32c"),
                            ("jacobi", "prod"), ("chebyshev", "prod")):
            t0 = time.perf_counter()
            mg = MultigridShellSystem(
                mesh, SCORDELIS_LO_MATERIAL,
                dtype=jnp.float32 if variant == "prod" else jnp.float64,
                df_operator=False, smoother=sm, n_levels=depth,
                coarse_op="galerkin",
            )
            if variant == "f64":
                lvls = mg.levels
            elif variant == "f32c":
                mg._ensure_f32_levels()
                lvls = mg._levels32
            else:
                lvls = mg.levels  # f32 values + scaled chol coarsest

            @jax.jit
            def step(x, r):
                rz = r if variant == "f64" else r.astype(jnp.float32)
                z = mg._vcycle(lvls, 0, rz).astype(jnp.float64)
                x = x + z
                r = b - soa_matvec(fine.values, x, offsets=fine.offsets)
                return x, r, jnp.linalg.norm(r)

            x = jnp.zeros_like(b)
            r = b
            prev = float(jnp.linalg.norm(b))
            hist = []
            for _ in range(iters):
                x, r, rn = step(x, r)
                rn = float(rn)
                hist.append(rn / prev)
                prev = rn
            rho = float(np.median(hist[-8:]))
            print(
                f"# depth={depth} {sm}/{variant}: rho={rho:.4f} "
                f"final_rel={prev / float(jnp.linalg.norm(b)):.3e} "
                f"({time.perf_counter()-t0:.0f}s)",
                flush=True,
            )
            del mg


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
