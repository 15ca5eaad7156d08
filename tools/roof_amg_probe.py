"""Roof preconditioner shoot-out (CPU): W-cycle geometric Galerkin MG
vs SA-AMG-df on the Scordelis-Lo roof.

The V-cycle weakens with depth on the curved hierarchy even in exact
arithmetic (tools/roof_depth_probe.py: two-grid rho 0.77 -> 0.93 at
depth 3) — the W-cycle bounds the recursion loss at ~two-grid rho, and
SA-AMG adapts its coarse space to the operator (curvature included).
This probe reports CG iteration counts for both at one size.

Run: PYTHONPATH=/root/repo python tools/roof_amg_probe.py [n]
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
    from fem_shell_tpu.amg import AMGShellSystem
    from fem_shell_tpu.mg import MultigridShellSystem
    from fem_shell_tpu.ops.soa import soa_matvec
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    mesh, forces, mid = scordelis_lo(n)
    print(f"# roof n={n} nodes={mesh.n_nodes}", flush=True)

    # --- geometric MG, V vs W, production-precision rho ---
    mg64 = MultigridShellSystem(
        mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float64,
        df_operator=False, n_levels=2, coarse_op="galerkin",
    )
    fine = mg64.levels[0]
    b = np.zeros((fine.npad, 6))
    b[: fine.nyp * fine.nxp] = np.asarray(forces)
    b = jnp.asarray(b.T) * fine.free_t

    for cyc in ("V", "W"):
        for sm in ("chebyshev",):
            t0 = time.perf_counter()
            mg = MultigridShellSystem(
                mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float32,
                df_operator=False, smoother=sm, coarse_op="galerkin",
                cycle=cyc,
            )

            @jax.jit
            def step(x, r):
                z = mg._vcycle(mg.levels, 0, r.astype(jnp.float32)).astype(jnp.float64)
                x = x + z
                r = b - soa_matvec(fine.values, x, offsets=fine.offsets)
                return x, r, jnp.linalg.norm(r)

            x = jnp.zeros_like(b)
            r = b
            prev = float(jnp.linalg.norm(b))
            hist = []
            for _ in range(25):
                x, r, rn = step(x, r)
                rn = float(rn)
                hist.append(rn / prev)
                prev = rn
            rho = float(np.median(hist[-8:]))
            print(f"# geo {cyc}/{sm} depth={mg.n_levels}: rho={rho:.4f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
            del mg

    # --- SA-AMG-df: production unstructured family on the roof ---
    t0 = time.perf_counter()
    amg = AMGShellSystem(mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float32,
                         df=True)
    t_setup = time.perf_counter() - t0
    t0 = time.perf_counter()
    u = amg.solve_df(forces, rtol=1e-8, maxiter=400)
    print(f"# amg-df: setup={t_setup:.0f}s iters={amg.last_iters} "
          f"res={amg.last_residual:.3e} w={float(u[mid, 2]):.6f} "
          f"solve={time.perf_counter()-t0:.0f}s levels={len(amg.levels)}",
          flush=True)


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
