"""f64 SA-AMG roof solve on TPU at increasing sizes — the CONVERGED
curved-shell path (f32/df cycles are precision-limited on the roof's
near-inextensional conditioning: r4 probes show the f32 K-cycle stalls
at residual ~0.1 at 512^2 while the f64 AMG cycle converges: 98
iterations at 128^2 on this TPU).

Writes ROOF_AMG_F64.json with the largest completed row.

Run STANDALONE:
  nohup python tools/roof_amg_f64_scale.py 256 512 > /tmp/roof_amg64.log 2>&1 &
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


def run(n):
    from fem_shell_tpu.amg import AMGShellSystem
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    mesh, forces, mid = scordelis_lo(n)
    print(f"# n={n} elements={len(mesh.quad)} dofs={mesh.n_dofs}", flush=True)
    t0 = time.perf_counter()
    amg = AMGShellSystem(mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float64,
                         cycle="W")
    setup_s = time.perf_counter() - t0
    print(f"# setup {setup_s:.0f}s levels={len(amg.levels)}", flush=True)
    t0 = time.perf_counter()
    u = amg.solve(forces, rtol=1e-9, maxiter=400)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    u = amg.solve(forces, rtol=1e-9, maxiter=400)
    solve_s = time.perf_counter() - t0
    w = float(u[mid, 2])
    target = -0.3031
    payload = {
        "metric": "scordelis_lo_roof_amg_f64",
        "n": n,
        "elements": len(mesh.quad),
        "dofs": int(mesh.n_dofs),
        "levels": len(amg.levels),
        "setup_s": round(setup_s, 1),
        "solve_s": round(solve_s, 2),
        "solve_warm_incl_compile_s": round(warm, 1),
        "iters": amg.last_iters,
        "residual": float(f"{amg.last_residual:.3e}"),
        "midside_w": float(f"{w:.6f}"),
        "err_vs_richardson": float(f"{abs(w - target) / abs(target):.3e}"),
    }
    print(json.dumps(payload), flush=True)
    return payload


def main():
    out = None
    for a in sys.argv[1:] or ["256"]:
        out = run(int(a))
    if out:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "ROOF_AMG_F64.json")
        with open(path, "w") as f:
            json.dump(out, f)
            f.write("\n")
        print(f"# wrote {path}", flush=True)


if __name__ == "__main__":
    main()
