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
FEMSHELL_ROOF_MAXITER, FEMSHELL_ROOF_RTOL, FEMSHELL_ROOF_KDEPTH.

FEMSHELL_ROOF_REFINE=k adds k passes of mixed-precision iterative
refinement driven by EXACT f64 true residuals computed on the host CPU
backend (r = f - A64 x, SoA matvec), each correction solved by the df
cycle at a loose rtol.  Why: at 512^2 the converged-residual df solve
still carries ~2% midside forward error — the roof's conditioning
amplifies the df OPERATOR representation error (kappa * eps49), which
no Krylov residual can see.  IR against the f64 operator contracts that
error by ~kappa*eps49 per pass.  FEMSHELL_ROOF_F64REF=1 additionally
solves the system on CPU f64 for a ground-truth midside (slow; use at
n <= 256).
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

    refine = int(os.environ.get("FEMSHELL_ROOF_REFINE", "0"))
    if refine:
        import numpy as np

        from fem_shell_tpu.large import LargeShellSystem
        from fem_shell_tpu.ops.soa import soa_matvec

        cpu0 = jax.devices("cpu")[0]
        t0 = time.perf_counter()
        with jax.default_device(cpu0):
            sys64 = LargeShellSystem(mesh, SCORDELIS_LO_MATERIAL,
                                     dtype=jnp.float64)
            vals64 = sys64.assemble()
        npad = sys64.pattern.n_pad
        nn = mesh.n_nodes
        free = np.asarray(sys64.free_t, np.float64)  # [6, npad]
        f_t = np.zeros((6, npad))
        f_t[:, :nn] = np.asarray(forces, np.float64).T
        f_t *= free
        print(f"# f64 operator (host) {time.perf_counter()-t0:.1f} s",
              flush=True)
        x_t = np.zeros((6, npad))
        x_t[:, :nn] = np.asarray(u, np.float64).T
        mv_jit = jax.jit(soa_matvec, static_argnames=("offsets",))
        for p in range(refine):
            with jax.default_device(cpu0):
                r_t = f_t - np.asarray(
                    mv_jit(vals64, jnp.asarray(x_t),
                           offsets=tuple(int(o) for o in sys64.offsets))
                )
            r_t *= free
            rn = float(np.linalg.norm(r_t) / max(np.linalg.norm(f_t), 1e-300))
            t0 = time.perf_counter()
            dx = mg.solve_df(np.ascontiguousarray(r_t[:, :nn].T), rtol=1e-6,
                             maxiter=maxiter)
            x_t[:, :nn] += np.asarray(dx, np.float64).T
            x_t *= free
            print(f"# refine pass {p}: true-res {rn:.3e} inner {mg.last_iters}"
                  f" w={x_t[2, mid]:.7f} ({time.perf_counter()-t0:.1f} s)",
                  flush=True)
        payload["midside_w_refined"] = float(f"{x_t[2, mid]:.7f}")
        payload["refine_passes"] = refine
        payload["final_true_residual"] = rn

    if os.environ.get("FEMSHELL_ROOF_F64REF", "0") == "1":
        t0 = time.perf_counter()
        with jax.default_device(jax.devices("cpu")[0]):
            ref = MultigridShellSystem(mesh, SCORDELIS_LO_MATERIAL,
                                       dtype=jnp.float64,
                                       smoother="chebyshev", cycle="K")
            u64 = ref.solve(forces, rtol=1e-10, maxiter=800)
        w64 = float(u64[mid, 2])
        payload["midside_w_f64"] = float(f"{w64:.7f}")
        print(f"# f64 CPU reference w={w64:.7f} "
              f"({time.perf_counter()-t0:.1f} s)", flush=True)

    print(json.dumps(payload), flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cycle = sys.argv[2] if len(sys.argv) > 2 else None
    run(n, cycle)
