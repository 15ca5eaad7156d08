"""Decompose the production class-path CG iteration cost at scale.

SCALE_BENCH r3: solve 5.5 s / 75 inner iters = ~73 ms/iter, while the
measured kernels only account for ~20 ms (df matvec 5.3 ms + V-cycle
smoothing ~11 ms + coarse levels). This probe times each piece the
production _solve_df_impl_class composes, all honest (chained jit +
device fetch):

  - pad df matvec (CG operator)
  - pad V-cycle application (preconditioner)
  - pure pcg_df iteration with identity preconditioner (CG vector ops)
  - full solve_df at fixed maxiter (the composed number)

Run STANDALONE: nohup python tools/iter_cost_probe.py > /tmp/iter_cost.log 2>&1 &
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
ITERS = 20


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    et = sys.argv[2] if len(sys.argv) > 2 else "t"
    from fem_shell_tpu.mg import MultigridShellSystem
    from fem_shell_tpu.ops.df import DF
    from fem_shell_tpu.ops.pallas_class import (
        _PadGridSpec,
        class_matvec_df_pad,
        pad_ring_mask,
        to_pad_grid,
    )

    print(f"# device={jax.devices()[0]} n={n}{et}", flush=True)
    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2,
                      et == "q", "z")
    mesh, rows, fac = generate(p)
    forces = rows * fac
    t0 = time.perf_counter()
    mg = MultigridShellSystem(p, MAT, dtype=jnp.float32, df_operator=True,
                              smoother="chebyshev")
    print(f"# build {time.perf_counter()-t0:.0f}s "
          f"fine={'class' if mg._cdf is not None else 'pair'}", flush=True)
    fine = mg.levels[0]
    pg = _PadGridSpec(fine.nyp, fine.nxp)
    ring = pad_ring_mask(pg)
    rng = np.random.default_rng(0)
    xf = jnp.asarray(rng.standard_normal((6, fine.npad)), jnp.float32)
    x2 = to_pad_grid(pg, xf)

    def timed(label, chain, *args):
        jitc = jax.jit(chain)
        float(jitc(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jitc(*args))
            ts.append((time.perf_counter() - t0) / ITERS)
        print(f"# {label:32s} {min(ts) * 1e3:8.3f} ms", flush=True)

    # (a) pad df matvec
    def mv_chain(x2):
        c = DF(x2, jnp.zeros_like(x2))
        for _ in range(ITERS):
            y = class_matvec_df_pad(mg._cdf, pg, c, ring)
            s = jnp.max(jnp.abs(y.hi))
            buf = jnp.zeros_like(x2)
            c = DF(
                buf.at[:6, pg.hr : pg.hr + pg.nr, :].set(y.hi / s),
                buf.at[:6, pg.hr : pg.hr + pg.nr, :].set(y.lo / s),
            )
        return jnp.sum(c.hi)

    stages = os.environ.get("ITER_COST_STAGES", "abcd")
    if "a" in stages:
        timed("pad df matvec", mv_chain, x2)

    # (b) pad V-cycle — levels cross the jit boundary as ARGUMENTS
    # (closure constants embed in the HLO -> remote 413 at this scale)
    def vc_chain(levels, x2):
        c = x2
        for _ in range(ITERS):
            z = mg._vcycle_pad_carry(levels, c)
            c = z / jnp.max(jnp.abs(z))
        return jnp.sum(c)

    if "b" in stages:
        timed("pad V-cycle (full)", vc_chain, mg.levels, x2)

    # (c) CG vector ops: pcg_df with identity prec and trivial mv
    from fem_shell_tpu.solver_df import pcg_df

    def cg_chain(x2):
        b = DF(x2, jnp.zeros_like(x2))
        mv = lambda v: DF(v.hi * 1.0001, v.lo * 1.0001)  # noqa: E731
        res = pcg_df(mv, b, rtol=0.0, maxiter=ITERS,
                     apply_prec=lambda r: r)
        return jnp.sum(res.x.hi)

    if "c" in stages:
        timed("pcg_df overhead (identity)", cg_chain, x2)

    if "d" not in stages:
        return

    # (d) the composed production solve at fixed iteration count
    t0 = time.perf_counter()
    mg.solve_df(forces, rtol=1e-30, maxiter=5)
    print(f"# solve_df warm+compile (5 it)    {time.perf_counter()-t0:8.1f} s",
          flush=True)
    for it in (5, 45):
        t0 = time.perf_counter()
        mg.solve_df(forces, rtol=1e-30, maxiter=it)
        print(f"# solve_df maxiter={it:3d}            "
              f"{(time.perf_counter()-t0) * 1e3:8.1f} ms", flush=True)
    # marginal per-iteration cost from the 45-5 difference
    t5 = time.perf_counter()
    mg.solve_df(forces, rtol=1e-30, maxiter=5)
    t5 = time.perf_counter() - t5
    t45 = time.perf_counter()
    mg.solve_df(forces, rtol=1e-30, maxiter=45)
    t45 = time.perf_counter() - t45
    print(f"# marginal ms/iter                {(t45 - t5) / 40 * 1e3:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
