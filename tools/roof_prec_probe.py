"""Decompose the roof V-cycle weakness: coarse-space quality vs f32
precision (RAP arithmetic vs cycle application).

Three variants on the same mesh, all driven by an f64 outer PCG:
  f64cyc : f64-built hierarchy, f64 cycle  (pure algorithmic quality)
  f32cast: f64-ARITHMETIC Galerkin RAP, levels cast to f32, f32 cycle
           (only application precision lost)
  f32rap : dtype=f32 production build — stencil RAP computed IN f32
           (accumulated cancellation error in the coarse operators)

If f32cast tracks f64cyc but f32rap blows up, the production fix is
computing the RAP chain in f64/df and casting, keeping the cheap f32
cycle application.

Run ONE AT A TIME: PYTHONPATH=/root/repo python tools/roof_prec_probe.py 128
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
    from fem_shell_tpu.solver import pcg
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    mesh, forces, mid = scordelis_lo(n)
    print(f"# roof n={n} nodes={mesh.n_nodes}", flush=True)

    mg64 = MultigridShellSystem(
        mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float64,
        df_operator=False, smoother="chebyshev",
    )
    fine = mg64.levels[0]
    b = np.zeros((fine.npad, 6))
    b[: fine.nyp * fine.nxp] = np.asarray(forces)
    b64 = jnp.asarray(b.T) * fine.free_t

    from fem_shell_tpu.ops.soa import soa_matvec

    mv64 = lambda x: soa_matvec(fine.values, x, offsets=fine.offsets)  # noqa: E731

    def solve_with(prec, label):
        t0 = time.perf_counter()
        res = jax.jit(
            lambda b: pcg(mv64, b, rtol=1e-9, maxiter=800, apply_prec=prec)
        )(b64)
        x = res.x
        print(f"# {label}: iters={int(res.iters)} res={float(res.residual):.3e} "
              f"w={float(x[2, mid]):.6f} ({time.perf_counter()-t0:.0f}s)",
              flush=True)

    # 1. f64 cycle
    solve_with(lambda r: mg64._vcycle(mg64.levels, 0, r), "f64cyc")

    # 2. f64-arithmetic RAP, f32-cast levels
    mg64._ensure_f32_levels()
    l32 = mg64._levels32
    solve_with(
        lambda r: mg64._vcycle(l32, 0, r.astype(jnp.float32)).astype(jnp.float64),
        "f32cast",
    )

    # 3. production f32 build (f32 RAP arithmetic)
    mgp = MultigridShellSystem(
        mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float32,
        df_operator=False, smoother="chebyshev", use_pallas=False,
    )
    solve_with(
        lambda r: mgp._vcycle(mgp.levels, 0, r.astype(jnp.float32)).astype(jnp.float64),
        "f32rap",
    )


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
