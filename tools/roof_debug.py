"""Bisect the roof-scale NaN (r3: galerkin+chebyshev df solve NaN'd at
n=1024 in one outer iteration) at n=256 where every production code
path (Pallas tiled smoother, grid-df assembly, df CG) is already
engaged (>= 65536 elements).

Run STANDALONE: nohup python tools/roof_debug.py > /tmp/roof_debug.log 2>&1 &
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


def run(n=256):
    from fem_shell_tpu.mg import MultigridShellSystem
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    mesh, forces, mid = scordelis_lo(n)
    print(f"# device={jax.devices()[0]} n={n}", flush=True)
    for coarse_op, smoother in (
        ("galerkin", "jacobi"),
        ("galerkin", "chebyshev"),
        ("rediscretize", "jacobi"),
    ):
        t0 = time.perf_counter()
        mg = MultigridShellSystem(
            mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float32, df_operator=True,
            smoother=smoother, coarse_op=coarse_op,
        )
        for li, lvl in enumerate(mg.levels):
            vals_ok = (
                None
                if lvl.values is None
                else bool(jnp.isfinite(lvl.values).all())
            )
            print(
                f"#   L{li} {lvl.nyp}x{lvl.nxp} finite={vals_ok} "
                f"omega={None if lvl.omega is None else float(lvl.omega):.4} "
                f"lam={None if lvl.lam is None else float(lvl.lam):.4} "
                f"diag_ok={bool(jnp.isfinite(lvl.inv_diag).all())}",
                flush=True,
            )
        u = mg.solve_df(forces, rtol=1e-9, maxiter=120)
        w = float(u[mid, 2])
        print(
            f"# {coarse_op}/{smoother}: iters={mg.last_iters} "
            f"res={mg.last_residual:.3e} w={w:.6f} "
            f"({time.perf_counter()-t0:.0f}s)",
            flush=True,
        )
        # the r3 n=1024 NaN appeared in the post-reassemble solve
        t0 = time.perf_counter()
        mg.reassemble()
        for li, lvl in enumerate(mg.levels):
            ok = (
                None if lvl.values is None else bool(jnp.isfinite(lvl.values).all())
            )
            print(f"#   post-reassemble L{li} finite={ok} "
                  f"omega={None if lvl.omega is None else float(lvl.omega):.4}",
                  flush=True)
        u = mg.solve_df(forces, rtol=1e-9, maxiter=120)
        print(
            f"# {coarse_op}/{smoother} post-reassemble: iters={mg.last_iters} "
            f"res={mg.last_residual:.3e} w={float(u[mid,2]):.6f} "
            f"({time.perf_counter()-t0:.0f}s)",
            flush=True,
        )
        del mg


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
