"""V vs W cycle contraction on the roof Galerkin hierarchy with the
CURRENT lambda estimator (r3: the auto-W roof-scale runs diverged at
n=1024 — residual 1.3e5 then 6.1e5 AFTER the Ritz upper-bound fix —
while the older V-cycle run reached residual 2e-5; this isolates the
cycle choice with everything else held at production settings).

Measures the stationary iteration x <- x + M(b - Ax) contraction factor
rho (f64 fine operator, f32 cycle = the production preconditioner) for
cycle in {V, W} on the same system, plus per-level lam values.

Run: PYTHONPATH=/root/repo python tools/roof_cycle_probe.py [n]
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

    mg = MultigridShellSystem(
        mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float64,
        df_operator=False, smoother="chebyshev",
    )
    mg._ensure_f32_levels()
    fine = mg.levels[0]
    l32 = mg._levels32
    print(f"# levels={mg.n_levels} coarse_op={mg.coarse_op} "
          f"auto_cycle={mg.cycle}", flush=True)
    for li, lvl in enumerate(l32):
        lam = None if lvl.lam is None else float(lvl.lam)
        kind = "direct" if (lvl.chol is not None or lvl.dense_inv is not None) else "smooth"
        print(f"#  L{li} {lvl.nyp}x{lvl.nxp} {kind} lam={lam}", flush=True)

    b = np.zeros((fine.npad, 6))
    b[: fine.nyp * fine.nxp] = np.asarray(forces)
    b = jnp.asarray(b.T) * fine.free_t

    for cyc in ("V", "W"):
        mg.cycle = cyc
        t0 = time.perf_counter()

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
        print(
            f"# cycle={cyc}: rho={rho:.4f} "
            f"final_rel={prev / float(jnp.linalg.norm(b)):.3e} "
            f"hist_last5={[f'{h:.3f}' for h in rho_hist[-5:]]} "
            f"({time.perf_counter()-t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
