"""Debug the roof AMG-df NaN on TPU (n=256 run: 18 inner iters then
NaN true residual; the CPU f64 AMG solves the same mesh fine).

Checks at n=128 (cheap): hierarchy finiteness, plain f32 AMG solve,
df solve with verbose iterations, E-correction finiteness.

Run STANDALONE: nohup python tools/roof_amg_tpu_debug.py 128 > /tmp/amg_dbg.log 2>&1 &
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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from fem_shell_tpu.amg import AMGShellSystem
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    mesh, forces, mid = scordelis_lo(n)
    print(f"# device={jax.devices()[0]} n={n} nodes={mesh.n_nodes}", flush=True)

    cycle = sys.argv[2] if len(sys.argv) > 2 else "W"
    t0 = time.perf_counter()
    amg = AMGShellSystem(mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float32,
                         df=True, cycle=cycle)
    print(f"# setup {time.perf_counter()-t0:.0f}s levels={len(amg.levels)} "
          f"cycle={cycle}", flush=True)

    # hierarchy finiteness
    for li, lvl in enumerate(amg.levels):
        bad = []
        for name in dir(lvl):
            if name.startswith("_"):
                continue
            v = getattr(lvl, name)
            if isinstance(v, (jnp.ndarray, np.ndarray)) and jnp.issubdtype(
                jnp.asarray(v).dtype, jnp.floating
            ):
                if not bool(jnp.isfinite(jnp.asarray(v)).all()):
                    bad.append(name)
        print(f"# L{li}: nonfinite={bad or 'none'}", flush=True)
    fd = amg._fine_df
    print(f"# fine_df finite: hi={bool(jnp.isfinite(fd.hi).all())} "
          f"lo={bool(jnp.isfinite(fd.lo).all())}", flush=True)
    if getattr(amg, "_e32", None) is not None:
        print(f"# e32 finite: {bool(jnp.isfinite(amg._e32).all())}", flush=True)

    # df solve, few iterations at a time
    for mi in (5, 20, 60, 200):
        u = amg.solve_df(forces, rtol=1e-8, maxiter=mi)
        w = float(u[mid, 2])
        print(f"# solve_df maxiter={mi}: iters={amg.last_iters} "
              f"res={amg.last_residual:.3e} mid_w={w:.6f}", flush=True)

    # refined (the NaN reproducer)
    u = amg.solve_df_refined(forces, rtol=1e-9, verbose=True)
    print(f"# refined: iters={amg.last_iters} res={amg.last_residual:.3e} "
          f"mid_w={float(u[mid, 2]):.6f}", flush=True)


if __name__ == "__main__":
    main()
