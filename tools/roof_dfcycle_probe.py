"""df-valued cycle on the Scordelis-Lo roof (real TPU).

The question this answers: does the df (two-f32, eps49) cycle
application restore the convergence that the f32 cycle loses on the
near-inextensional roof hierarchy?  Known bracketing results:

  f32 cycle (production r4): K-cycle at 512^2 stalls at residual ~1e-1,
      1024^2 at 1.6e-3 with midside error 1-5% (ROOF_SCALE.json);
      even with f64-exact RAP operators cast to f32, the f32 cycle
      stalls an f64 outer CG at residual ~37 after 800 iterations
      (tools/roof_prec_probe.py "f32cast").
  f64 cycle (CPU): converges to 1e-9, V 215 / K 53 iterations at 256^2.

The df cycle should land near the f64 iteration counts with an eps49
floor — at TPU speed, with no emulated-f64 graph anywhere outside the
tiny coarsest inverse.

Run STANDALONE (holds the TPU): python tools/roof_dfcycle_probe.py 128
Optional second arg: cycle (V|K, default auto=V). Env:
FEMSHELL_ROOF_MAXITER, FEMSHELL_ROOF_RTOL.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(n=128, cycle=None):
    from fem_shell_tpu.mg import MultigridShellSystem
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    mesh, forces, mid = scordelis_lo(n)
    print(f"# device={jax.devices()[0]} n={n} elements={len(mesh.quad)} "
          f"dofs={mesh.n_dofs} cycle={cycle or 'auto'}", flush=True)

    kd = os.environ.get("FEMSHELL_ROOF_KDEPTH")
    t0 = time.perf_counter()
    mg = MultigridShellSystem(
        mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float32, df_operator=True,
        df_cycle=True, smoother="chebyshev", cycle=cycle,
        k_depth=int(kd) if kd else None,
    )
    t_build = time.perf_counter() - t0
    print(f"# build {t_build:.1f} s levels={mg.n_levels} "
          f"coarse_op={mg.coarse_op} cycle={mg.cycle}", flush=True)

    maxiter = int(os.environ.get("FEMSHELL_ROOF_MAXITER", "600"))
    rtol = float(os.environ.get("FEMSHELL_ROOF_RTOL", "1e-9"))
    t0 = time.perf_counter()
    u = mg.solve_df(forces, rtol=rtol, maxiter=maxiter)
    t_warm = time.perf_counter() - t0
    print(f"# warm-incl-compile solve {t_warm:.1f} s iters={mg.last_iters} "
          f"res={mg.last_residual:.3e}", flush=True)
    t0 = time.perf_counter()
    u = mg.solve_df(forces, rtol=rtol, maxiter=maxiter)
    t_solve = time.perf_counter() - t0

    w = float(u[mid, 2])
    target = -0.3031
    payload = {
        "metric": "roof_dfcycle",
        "n": n,
        "cycle": mg.cycle,
        "levels": mg.n_levels,
        "solve_s": round(t_solve, 3),
        "build_s": round(t_build, 1),
        "inner_iters": mg.last_iters,
        "residual": float(f"{mg.last_residual:.3e}"),
        "midside_w": float(f"{w:.6f}"),
        "err_vs_richardson": float(f"{abs(w - target) / abs(target):.3e}"),
    }
    print(json.dumps(payload), flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cycle = sys.argv[2] if len(sys.argv) > 2 else None
    run(n, cycle)
