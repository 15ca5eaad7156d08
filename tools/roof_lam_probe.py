"""Chebyshev lambda_max audit for the roof Galerkin hierarchy (r3:
ROOF_SCALE W-cycle run diverged at n=1024, residual 1.3e5; the
stationary V-cycle rho=2.7 at depth 7 from tools/roof_smooth_probe.py
already implied a NON-CONTRACTIVE smoother at some level — a variational
cycle with convergent symmetric smoothers is provably contractive).

Hypothesis: lvl.lam comes from a 15-step power iteration, which is a
LOWER bound on lambda_max(D^-1 A); the Chebyshev polynomial explodes
outside its interval top (1.05*lam), so a few percent of underestimate
makes the smoother — and with it the whole cycle — divergent.

Per level this prints:
  lam_stored   the production 15-iter estimate
  lam_long     a 300-iter power estimate (tight lower bound)
  lam_gersh    certified upper bound: max_i sum_j |a_ij| / d_i
               (abs-stencil matvec applied to ones)
  cheby_amp    growth factor per deg-3 Chebyshev sweep on b=0
               (>1 means the smoother amplifies some mode)

Run: PYTHONPATH=/root/repo python tools/roof_lam_probe.py [n]
(pure-CPU process; safe alongside a TPU job)
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(n=128):
    from fem_shell_tpu.mg import MultigridShellSystem
    from fem_shell_tpu.ops.soa import soa_matvec
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    mesh, forces, mid = scordelis_lo(n)
    mg = MultigridShellSystem(
        mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float32,
        df_operator=False, smoother="chebyshev", coarse_op="galerkin",
    )
    print(f"# roof n={n} levels={mg.n_levels} coarse_op={mg.coarse_op} "
          f"cycle={mg.cycle}", flush=True)

    for li, lvl in enumerate(mg.levels):
        if lvl.chol is not None or lvl.dense_inv is not None:
            print(f"# L{li} {lvl.nyp}x{lvl.nxp}: coarsest (direct)", flush=True)
            continue
        # long power iteration (same iteration as mg._power_lambda)
        i = jnp.arange(6 * lvl.npad, dtype=lvl.inv_diag.dtype).reshape(6, lvl.npad)
        v = (jnp.sin(i * 0.7311) + 0.1) * lvl.free_t
        v = v / jnp.linalg.norm(v)

        @jax.jit
        def pstep(v, lvl=lvl):
            w = lvl.inv_diag * mg._mv(lvl, v)
            return w / jnp.maximum(jnp.linalg.norm(w), 1e-30), jnp.linalg.norm(w)

        lam_long = None
        for it in range(300):
            v, lam_long = pstep(v)
        lam_long = float(lam_long)

        # certified Gershgorin upper bound via abs-stencil matvec on ones
        lam_gersh = float("nan")
        if lvl.values is not None and lvl.offsets is not None:
            ones = jnp.ones_like(lvl.inv_diag)
            rowsum = soa_matvec(jnp.abs(lvl.values), ones, offsets=lvl.offsets)
            lam_gersh = float(jnp.max(lvl.inv_diag * rowsum * lvl.free_t))

        # direct smoother amplification: deg-3 cheby sweeps on b=0
        rng = np.random.default_rng(li)
        x = jnp.asarray(
            rng.standard_normal((6, lvl.npad)), lvl.inv_diag.dtype) * lvl.free_t
        b = jnp.zeros_like(x)
        amps = []
        for _ in range(8):
            n0 = float(jnp.linalg.norm(x))
            x = mg._smooth(lvl, x, b, mg.nu_smooth)
            amps.append(float(jnp.linalg.norm(x)) / max(n0, 1e-30))
        amp = float(np.median(amps[-4:]))

        lam_stored = float(lvl.lam) if lvl.lam is not None else float("nan")
        flag = " <-- DIVERGENT" if amp > 1.0 else ""
        print(
            f"# L{li} {lvl.nyp}x{lvl.nxp}: lam_stored={lam_stored:.4f} "
            f"lam_long={lam_long:.4f} lam_gersh={lam_gersh:.4f} "
            f"ratio_long/stored={lam_long / lam_stored:.4f} "
            f"cheby_amp={amp:.4f}{flag}",
            flush=True,
        )


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
