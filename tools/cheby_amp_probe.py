"""Is the Chebyshev smoother AMPLIFYING above its estimated interval?

r4 observation: the production V-cycle's first CG iteration overshoots
the residual by 6.5e3x at 512^2 (tools/cg_blowup_probe.py) — the
signature of smoothing modes ABOVE lam_est (Chebyshev grows
exponentially outside its interval; pre+post smoothing squares it).

This probe (CPU, flat XLA paths) measures, per level:
  - lam_est: the lvl.lam the production build computed (power+Ritz)
  - lam_true: 300-iteration power iteration on D^-1/2 A D^-1/2
  - rho(E): spectral radius of the one-level smoother error operator
    E x = x - smooth(x; b=0)  ... wait, E IS smooth(x; b=0).
    rho > 1 => the smoother amplifies some mode.

Run ONE AT A TIME: PYTHONPATH=/root/repo python tools/cheby_amp_probe.py 256
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

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def run(n=256, et="t"):
    from fem_shell_tpu.mg import MultigridShellSystem

    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2,
                      et == "q", "z")
    mg = MultigridShellSystem(p, MAT, dtype=jnp.float32, df_operator=False,
                              smoother="chebyshev", use_pallas=False)
    print(f"# n={n}{et} levels={mg.n_levels}", flush=True)

    for li, lvl in enumerate(mg.levels):
        if lvl.chol is not None or lvl.dense_inv is not None:
            continue
        lam_est = float(lvl.lam) if lvl.lam is not None else float("nan")
        dis = jnp.sqrt(lvl.inv_diag)

        @jax.jit
        def smv(v, lvl=lvl, dis=dis):
            return dis * mg._mv(lvl, dis * v)

        # true lam via long power iteration from a random start
        v = jax.random.normal(jax.random.PRNGKey(0), lvl.free_t.shape,
                              jnp.float32) * lvl.free_t

        @jax.jit
        def pstep(v):
            w = smv(v)
            return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

        for _ in range(300):
            v = pstep(v)
        w = smv(v)
        lam_true = float(jnp.vdot(v, w) / jnp.vdot(v, v))

        # smoother error operator rho via power iteration
        @jax.jit
        def estep(v, lvl=lvl):
            w = mg._smooth(lvl, v, jnp.zeros_like(v), mg.nu_smooth)
            nw = jnp.linalg.norm(w)
            return w / jnp.maximum(nw, 1e-30), nw

        v = jax.random.normal(jax.random.PRNGKey(1), lvl.free_t.shape,
                              jnp.float32) * lvl.free_t
        v = v / jnp.linalg.norm(v)
        g = None
        for _ in range(60):
            v, g = estep(v)
        print(f"# L{li}: lam_est={lam_est:.4f} lam_true={lam_true:.4f} "
              f"under={lam_true / lam_est - 1:+.2%} rho_smoother={float(g):.3e}",
              flush=True)


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 256,
        sys.argv[2] if len(sys.argv) > 2 else "t")
