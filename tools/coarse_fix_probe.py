"""Is the f32 coarsest Cholesky the V-cycle overshoot source?

r4 bisection (vcycle_overshoot_probe): the residual of one cycle
application jumps from 2.3 to 6.5e3 x ||b|| exactly when the coarsest
direct solve joins the recursion. Here we re-run the full cycle with
the coarsest solve replaced by an exact f64 dense solve and compare
    q = ||b - A M b|| / ||b||
f32-chol vs f64-exact, plus the coarsest solve defect itself.

Run ONE AT A TIME: PYTHONPATH=/root/repo python tools/coarse_fix_probe.py 512
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
    from fem_shell_tpu.mg import MultigridShellSystem, _densify

    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2,
                      et == "q", "z")
    mesh, rows, fac = generate(p)
    forces = rows * fac
    mg = MultigridShellSystem(p, MAT, dtype=jnp.float32,
                              df_operator=False, smoother="chebyshev",
                              use_pallas=False)
    fine = mg.levels[0]
    b = np.zeros((fine.npad, 6), np.float32)
    b[: fine.nyp * fine.nxp] = np.asarray(forces, np.float32)
    b = jnp.asarray(b.T) * fine.free_t
    bn = float(jnp.linalg.norm(b))

    # f64 dense coarsest (component-major, same layout the chol uses)
    co_li = mg.n_levels - 1
    co = mg.levels[co_li]
    sys_c = mg._systems[co_li]
    vals = sys_c.assemble()
    lvl_dense = co.__class__(
        values=vals, offsets=co.offsets, free_t=co.free_t,
        inv_diag=co.inv_diag, nyp=co.nyp, nxp=co.nxp, npad=co.npad,
    ) if hasattr(co, "__class__") else None
    import dataclasses

    co_vals = dataclasses.replace(co, values=vals, chol=None)
    dense64 = np.asarray(_densify(co_vals), np.float64)
    n_real = co.nyp * co.nxp
    print(f"# coarsest {co.nyp}x{co.nxp} cond(scaled)="
          f"{np.linalg.cond(dense64 / np.sqrt(np.outer(np.diag(dense64), np.diag(dense64)))):.3e}",
          flush=True)

    orig = mg._coarse_visit

    def exact_coarse(levels, li, rc):
        if li == co_li:
            rhs = np.asarray(rc, np.float64)[:, :n_real].reshape(-1)
            sol = np.linalg.solve(dense64, rhs)
            out = np.zeros((6, co.npad), np.float64)
            out[:, :n_real] = sol.reshape(6, n_real)
            return (jnp.asarray(out, jnp.float32) * levels[li].free_t)
        return orig(levels, li, rc)

    for name, cv in (("f32-chol", orig), ("f64-exact", exact_coarse)):
        mg._coarse_visit = cv
        z = mg._vcycle(mg.levels, 0, b)
        az = mg._mv(mg.levels[0], z) * fine.free_t
        q = float(jnp.linalg.norm(b - az)) / bn
        print(f"# {name}: q = {q:.4e}  ||z|| = {float(jnp.linalg.norm(z)):.4e}",
              flush=True)

    # coarsest defect on the restricted rhs
    from fem_shell_tpu.mg import _from_grid, _restrict, _to_grid

    rc = b
    for li in range(co_li):
        rc = _from_grid(
            _restrict(_to_grid(rc, mg.levels[li])), mg.levels[li + 1]
        ) * mg.levels[li + 1].free_t
    e32 = orig(mg.levels, co_li, rc)
    e64 = exact_coarse(mg.levels, co_li, rc)
    d = float(jnp.linalg.norm(e32 - e64)) / max(float(jnp.linalg.norm(e64)), 1e-30)
    print(f"# coarsest defect ||e32-e64||/||e64|| = {d:.4e} "
          f"(||e64||={float(jnp.linalg.norm(e64)):.3e})", flush=True)


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 512,
        sys.argv[2] if len(sys.argv) > 2 else "t")
