"""Locate which V-cycle level injects the high-energy overshoot.

r4: the production V-cycle's first CG application overshoots
||r1||/||b|| to 6.5e3 at 512^2 (cg_blowup_probe) yet the one-level
smoother error operator contracts (rho 0.99, cheby_amp_probe) — so a
COARSE level must inject rough energy. This probe truncates the cycle
at depth K (correction below K replaced by zero) and reports
  q(K) = ||A M_K b|| / ||b||
for K = 1..n_levels, chebyshev and jacobi smoothing. The K where q
jumps is the injecting level.

Run ONE AT A TIME: PYTHONPATH=/root/repo python tools/vcycle_overshoot_probe.py 512
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def run(n=512, et="t"):
    from fem_shell_tpu.mg import MultigridShellSystem

    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2,
                      et == "q", "z")
    mesh, rows, fac = generate(p)
    forces = rows * fac
    for sm in ("chebyshev", "jacobi"):
        mg = MultigridShellSystem(p, MAT, dtype=jnp.float32,
                                  df_operator=False, smoother=sm,
                                  use_pallas=False)
        fine = mg.levels[0]
        b = np.zeros((fine.npad, 6), np.float32)
        b[: fine.nyp * fine.nxp] = np.asarray(forces, np.float32)
        b = jnp.asarray(b.T) * fine.free_t
        bn = float(jnp.linalg.norm(b))

        orig = mg._coarse_visit
        for K in range(1, mg.n_levels + 1):
            def trunc(levels, li, rc, K=K):
                if li >= K:
                    return jnp.zeros_like(rc)
                return orig(levels, li, rc)

            mg._coarse_visit = trunc

            @jax.jit
            def apply(levels, b):
                z = mg._vcycle(levels, 0, b)
                az = mg._mv(levels[0], z) * levels[0].free_t
                return jnp.linalg.norm(b - az), jnp.linalg.norm(z)

            q, zn = apply(mg.levels, b)
            print(f"# {sm} K={K}: ||b - A M_K b||/||b|| = {float(q)/bn:.4e} "
                  f"||z||={float(zn):.3e}", flush=True)
        mg._coarse_visit = orig
        del mg


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 512,
        sys.argv[2] if len(sys.argv) > 2 else "t")
