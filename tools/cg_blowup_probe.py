"""Diagnose the first-iteration df CG blow-up at 1024^2 (class path).

r4 observation (tools/solve_decomp_probe.py): solve_df_refined's pass-0
inner CG exits after ONE iteration with true residual 2.3e4 x ||b|| (the
1e4 blowup guard) — on the FLAT plate, with the rhs b; every later pass
(rhs = true residual) behaves normally (15-25 iters). This probe runs 3
manually-unrolled PCG iterations on the production class-path operator
and prints alpha, r.z, p.Ap, and residual norms per step, plus the same
with (a) jacobi instead of chebyshev smoothing and (b) V-cycle replaced
by plain Jacobi, to isolate which component mis-scales on the raw rhs.

Run STANDALONE:
  nohup python tools/cg_blowup_probe.py 1024 t > /tmp/cg_blowup.log 2>&1 &
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
    from fem_shell_tpu.ops.class_matvec import class_matvec_df
    from fem_shell_tpu.ops.df import DF, df_add, df_dot_f64, df_from_f64, df_neg, df_scale, df_scalar_from_f64

    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2,
                      et == "q", "z")
    mesh, rows, fac = generate(p)
    forces = rows * fac

    t0 = time.perf_counter()
    mg = MultigridShellSystem(p, MAT, dtype=jnp.float32, df_operator=True,
                              smoother="chebyshev")
    print(f"# construct: {time.perf_counter() - t0:.1f} s "
          f"(fine={'class' if mg._cdf is not None else 'pair'})", flush=True)

    fine = mg.levels[0]
    f = np.zeros((fine.npad, 6))
    f[: fine.nyp * fine.nxp] = np.asarray(forces)
    b = df_from_f64(jnp.asarray(f.T, jnp.float64) * fine.free_t.astype(jnp.float64))

    def stats(levels, b, prec_mode):
        """3 unrolled PCG iterations; returns diagnostics per step."""
        fine0 = levels[0]
        if prec_mode == "pad":
            # mirror the production pad-layout inner CG exactly
            from fem_shell_tpu.ops.pallas_class import (
                _PadGridSpec,
                class_matvec_df_pad,
                pad_embed,
                pad_ring_mask,
                to_pad_grid,
            )

            pg = _PadGridSpec(fine0.nyp, fine0.nxp)
            ring = pad_ring_mask(pg)
            b = DF(to_pad_grid(pg, b.hi), to_pad_grid(pg, b.lo))

            def mv(x):
                y = class_matvec_df_pad(mg._cdf, pg, x, ring)
                return DF(pad_embed(pg, y.hi), pad_embed(pg, y.lo))

            def prec(r):
                return DF(mg._vcycle_pad_carry(levels, r.hi), None)
        else:
            mv = lambda x: class_matvec_df(mg._cdf, x)  # noqa: E731

            if prec_mode == "vcycle":
                prec = lambda r: DF(mg._vcycle(levels, 0, r.hi), None)  # noqa: E731
            else:
                inv = fine0.inv_diag
                prec = lambda r: DF(r.hi * inv, None)  # noqa: E731

        out = []
        x = DF(jnp.zeros_like(b.hi), jnp.zeros_like(b.lo))
        r = b
        z = prec(r)
        z = DF(z.hi, jnp.zeros_like(z.hi))
        p_ = z
        rz = df_dot_f64(r, z)
        for _ in range(3):
            ap = mv(p_)
            pap = df_dot_f64(p_, ap)
            alpha = rz / pap
            a_df = df_scalar_from_f64(alpha)
            x = df_add(x, df_scale(p_, a_df))
            r = df_add(r, df_scale(ap, df_scalar_from_f64(-alpha)))
            rn = jnp.sqrt(df_dot_f64(r, r))
            zn = jnp.sqrt(jnp.sum(z.hi.astype(jnp.float64) ** 2))
            out.append((rz, pap, alpha, rn, zn))
            z = prec(r)
            z = DF(z.hi, jnp.zeros_like(z.hi))
            rz_new = df_dot_f64(r, z)
            beta = df_scalar_from_f64(rz_new / rz)
            p_ = df_add(z, df_scale(p_, beta))
            rz = rz_new
        return out

    jstats = jax.jit(stats, static_argnums=(2,))
    bn = float(jnp.sqrt(df_dot_f64(b, b)))
    print(f"# ||b|| = {bn:.6e}", flush=True)
    for mode in ("pad", "vcycle", "jacobi"):
        res = jax.device_get(jstats(mg.levels, b, mode))
        for i, (rz, pap, alpha, rn, zn) in enumerate(res):
            print(f"# {mode}[{i}]: rz={float(rz):.4e} pAp={float(pap):.4e} "
                  f"alpha={float(alpha):.4e} ||r||/||b||={float(rn)/bn:.4e} "
                  f"||z||={float(zn):.4e}", flush=True)


if __name__ == "__main__":
    main()
