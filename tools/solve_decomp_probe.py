"""Decompose solve_df_refined wall time at scale (real TPU, one process).

r4 findings so far (1024^2 tri, class path): pad df matvec 5.76 ms, pad
V-cycle 13.7 ms => ~19.5 ms/iter CG core, yet solve_df_refined averages
~88 ms per inner iteration. The gap must live in the refinement loop
(true-residual evaluations, per-pass dispatch+sync, df_add/to64) or in
CG overhead not covered by the kernels. This probe times every piece in
ONE process (the 850 s construct tax is paid once):

  1. warm solve_df_refined (verbose) — per-pass iters + residuals
  2. _residual_jit (true-residual eval) alone
  3. solve_df marginal per-iteration cost (maxiter 45 vs 5)
  4. pcg_df identity-prec overhead per iteration
  5. reassemble <-> solve_df_refined alternation x3 (steady-state
     rebuild cost — SCALE_BENCH times the FIRST rebuild after a solve)

Run STANDALONE:
  nohup python tools/solve_decomp_probe.py 1024 t > /tmp/solve_decomp.log 2>&1 &
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    et = sys.argv[2] if len(sys.argv) > 2 else "t"
    print(f"# device={jax.devices()[0]}  n={n} et={et}", flush=True)

    from fem_shell_tpu.mg import MultigridShellSystem
    from fem_shell_tpu.ops.df import DF, df_from_f64

    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2,
                      et == "q", "z")
    mesh, rows, fac = generate(p)
    forces = rows * fac

    t0 = time.perf_counter()
    mg = MultigridShellSystem(p, MAT, dtype=jnp.float32, df_operator=True,
                              smoother="chebyshev")
    print(f"# construct: {time.perf_counter() - t0:.1f} s", flush=True)

    # 1. warm + verbose refined solve
    t0 = time.perf_counter()
    mg.solve_df_refined(forces, rtol=1e-9, verbose=True)
    print(f"# warm solve_df_refined: {time.perf_counter() - t0:.1f} s "
          f"({mg.last_iters} it)", flush=True)
    t0 = time.perf_counter()
    mg.solve_df_refined(forces, rtol=1e-9, verbose=True)
    print(f"# 2nd solve_df_refined: {time.perf_counter() - t0:.1f} s "
          f"({mg.last_iters} it)", flush=True)

    # 2. true-residual eval alone
    fine = mg._fine
    f = np.zeros((fine.npad, 6))
    f[: fine.nyp * fine.nxp] = np.asarray(forces)
    b = mg._b_jit(jnp.asarray(f.T, jnp.float64), fine.free_t)
    x = df_from_f64(jnp.zeros((6, fine.npad), jnp.float64))
    for i in range(3):
        t0 = time.perf_counter()
        r, rn = mg._residual_jit(mg._fine_df, mg._cdf,
                                 getattr(mg, "_tabs", None), x, b)
        float(rn)
        print(f"# residual_eval[{i}]: {(time.perf_counter()-t0)*1e3:.1f} ms",
              flush=True)

    # 3. solve_df marginal per-iteration cost
    mg.solve_df(forces, rtol=1e-30, maxiter=5)  # warm
    ts = {}
    for it in (5, 45, 5, 45):
        t0 = time.perf_counter()
        mg.solve_df(forces, rtol=1e-30, maxiter=it)
        dt = time.perf_counter() - t0
        ts.setdefault(it, []).append(dt)
        print(f"# solve_df maxiter={it:3d}: {dt*1e3:8.1f} ms", flush=True)
    marg = (min(ts[45]) - min(ts[5])) / 40
    print(f"# marginal CG iter: {marg*1e3:.2f} ms", flush=True)

    # 4. pcg_df identity-prec overhead
    from fem_shell_tpu.solver_df import pcg_df

    x32 = jnp.zeros((6, fine.npad), jnp.float32) + 1e-3

    def cg_chain(xv):
        bdf = DF(xv, jnp.zeros_like(xv))
        mv = lambda v: DF(v.hi * 1.0001, v.lo * 1.0001)  # noqa: E731
        res = pcg_df(mv, bdf, rtol=0.0, maxiter=20,
                     apply_prec=lambda r: r)
        return jnp.sum(res.x.hi)

    jc = jax.jit(cg_chain)
    float(jc(x32))
    t0 = time.perf_counter()
    float(jc(x32))
    print(f"# pcg_df identity overhead: {(time.perf_counter()-t0)/20*1e3:.2f} "
          f"ms/iter", flush=True)

    # 5. steady-state alternation
    for i in range(3):
        t0 = time.perf_counter()
        mg.reassemble()
        t_re = time.perf_counter() - t0
        t0 = time.perf_counter()
        mg.solve_df_refined(forces, rtol=1e-9)
        t_sv = time.perf_counter() - t0
        print(f"# cycle[{i}]: rebuild {t_re:6.1f} s  solve {t_sv:6.1f} s "
              f"({mg.last_iters} it, res {mg.last_residual:.2e})", flush=True)


if __name__ == "__main__":
    main()
