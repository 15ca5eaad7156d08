"""CPU bisection of the roof-scale NaN (ROOF_SCALE.json at n=1024:
residual NaN after 1 CG iteration; n=256 is clean).

The df solve's V-cycle preconditioner is pure f32 — fine pair.hi smoothing,
Galerkin stencil_rap chain, coarsest f32 Cholesky — so if the NaN lives in
the preconditioner it reproduces on the CPU backend in plain f32 mode
(df_operator=False), where iteration is cheap and eager inspection works.

Run: PYTHONPATH=/root/repo python tools/roof_cpu_probe.py [n]
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


def stage(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run(n=1024):
    from fem_shell_tpu.mg import MultigridShellSystem
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    mesh, forces, mid = scordelis_lo(n)
    stage(f"mesh n={n} nodes={mesh.n_nodes}")
    t0 = time.perf_counter()
    mg = MultigridShellSystem(
        mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float32,
        df_operator=False, smoother="chebyshev",
    )
    stage(f"build {time.perf_counter()-t0:.0f}s coarse_op={mg.coarse_op} "
          f"levels={mg.n_levels}")
    for li, lvl in enumerate(mg.levels):
        vals_ok = None if lvl.values is None else bool(
            jnp.isfinite(lvl.values).all())
        chol_ok = None if lvl.chol is None else bool(
            jnp.isfinite(lvl.chol).all())
        print(
            f"#   L{li} {lvl.nyp}x{lvl.nxp} finite={vals_ok} "
            f"omega={None if lvl.omega is None else float(lvl.omega):.4} "
            f"lam={None if lvl.lam is None else float(lvl.lam):.4} "
            f"diag_ok={bool(jnp.isfinite(lvl.inv_diag).all())} "
            f"chol_ok={chol_ok}",
            flush=True,
        )
    # V-cycle application to the (padded) force vector
    lvl0 = mg.levels[0]
    f = np.zeros((lvl0.npad, 6), np.float32)
    f[: lvl0.nyp * lvl0.nxp] = np.asarray(forces, np.float32)
    b = jnp.asarray(f.T)

    vjit = jax.jit(lambda b: mg._vcycle(mg.levels, 0, b))
    z = vjit(b)
    stage(f"vcycle finite={bool(jnp.isfinite(z).all())} "
          f"|z|max={float(jnp.abs(z).max()):.3e}")
    # per-level matvec finiteness
    for li, lvl in enumerate(mg.levels):
        if lvl.values is None:
            continue
        x = jnp.ones((6, lvl.npad), jnp.float32) * lvl.free_t
        y = jax.jit(lambda l=lvl, x=x: mg._mv(l, x))()
        print(f"#   L{li} mv finite={bool(jnp.isfinite(y).all())} "
              f"|y|max={float(jnp.abs(y).max()):.3e}", flush=True)
    t0 = time.perf_counter()
    u = mg.solve_df(forces, rtol=1e-9, maxiter=40)
    stage(f"solve iters={mg.last_iters} res={mg.last_residual:.3e} "
          f"w={float(u[mid,2]):.6f} ({time.perf_counter()-t0:.0f}s)")
    t0 = time.perf_counter()
    mg.reassemble()
    stage(f"reassemble {time.perf_counter()-t0:.0f}s")
    z = vjit(b)
    stage(f"post-reassemble vcycle finite={bool(jnp.isfinite(z).all())}")
    u = mg.solve_df(forces, rtol=1e-9, maxiter=40)
    stage(f"post-reassemble solve iters={mg.last_iters} "
          f"res={mg.last_residual:.3e} w={float(u[mid,2]):.6f}")


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
