"""Curved-shell scale proof: Scordelis-Lo roof at >=1M elements on the
real TPU with the production MG-df pipeline (VERDICT r2 next-step #8 —
curved geometry was never exercised above toy size).

The curved structured grid goes through grid-df assembly + the
materialized df pair + Pallas SpMV + the f32 V-cycle exactly like the
flat plate; only the uniform-grid class-table fast path falls back (the
exact-stencil class construction requires affine coordinates).

Validation: the facet-shell midside deflection converges to ~-0.3031
(Richardson from 16/32, tests/test_shells.py) toward the canonical
-0.3024; at n=1024 discretization error is ~1e-4 and the df operator
floor ~2e-4, so the value must land within 2e-3 of the Richardson
limit.

Run STANDALONE: nohup python tools/roof_scale.py 1024 > /tmp/roof_scale.log 2>&1 &
        or:     nohup python tools/roof_scale.py 1024 amg > ... &

``amg`` mode routes the curved mesh to SA-AMG-df (amg.py): the
rigid-mode tentative prolongator adapts the coarse space to the curved
operator, where the geometric Galerkin hierarchy weakens with depth
(r4 CPU probe, tools/roof_amg_lean.py: AMG 36/47 CG iterations at
n=64/128 vs geometric V 75/178 — near-mesh-independent).
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
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(n=1024, mode="mg"):
    from fem_shell_tpu.mg import MultigridShellSystem
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    mesh, forces, mid = scordelis_lo(n)
    n_elem = len(mesh.quad)
    print(f"# device={jax.devices()[0]} elements={n_elem} dofs={mesh.n_dofs}",
          flush=True)
    if mode == "amg":
        return run_amg(mesh, forces, mid, n, n_elem)

    t0 = time.perf_counter()
    # chebyshev smoother + (auto) Galerkin coarse operators: the
    # rediscretized-coarse V-cycle stagnates on curved grids (r3
    # diagnosis, see mg.stencil_rap) — the first roof-scale attempt
    # diverged at residual 34 for exactly that reason. Cycle is the
    # (auto) V: both auto-W runs at n=1024 diverged (1.3e5 / 6.1e5 —
    # 2M-MAM goes indefinite on the deep f32 hierarchy, see
    # mg.__init__), where V on identical kernels reached 2e-5.
    # cycle: env override (r4: the K-cycle + the sustained-growth CG
    # guard turn the roof hierarchy from 215 V-iterations (f64, n=256)
    # to 53 — tools/roof_kcycle_probe.py)
    cycle = os.environ.get("FEMSHELL_ROOF_CYCLE") or None
    # FEMSHELL_ROOF_DFCYCLE=1: df-VALUED cycle (mg_df.py) — the r5
    # precision fix for the f32 cycle's stall on this hierarchy (the
    # f32 K-cycle at 512^2/1024^2 plateaus at residual 1e-1/1.6e-3;
    # the df cycle converges to the requested rtol, see
    # tools/roof_dfcycle_probe.py results in ROADMAP/COVERAGE)
    df_cycle = os.environ.get("FEMSHELL_ROOF_DFCYCLE", "0") == "1"
    # FEMSHELL_ROOF_KDEPTH: bound the K-cycle recursion depth (trace
    # size doubles per K level; full-depth df K OOMed the remote
    # compiler at 512^2 — see mg.py k_depth)
    kd = os.environ.get("FEMSHELL_ROOF_KDEPTH")
    # FEMSHELL_ROOF_SYMSPMV=0: drop the symmetric-storage outer-CG copy
    # (~1.5 GB at 1024^2) — HBM headroom knob for the df-cycle runs
    # (the r5 1024^2 df-cycle attempt crashed the worker mid-solve)
    sym = os.environ.get("FEMSHELL_ROOF_SYMSPMV")
    mg = MultigridShellSystem(mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float32,
                              df_operator=True, smoother="chebyshev",
                              cycle=cycle, df_cycle=df_cycle,
                              k_depth=int(kd) if kd else None,
                              sym_spmv=None if sym is None else sym == "1")
    t_build = time.perf_counter() - t0
    print(f"# construct+assemble: {t_build:.1f} s "
          f"(fine operator: {'class' if mg._cdf is not None else 'pair'}, "
          f"coarse_op: {mg.coarse_op}, levels: {mg.n_levels})",
          flush=True)

    # maxiter 1500: the V-preconditioned CG is SPD-but-weak on the deep
    # curved hierarchy (stationary rho ~2.5 at n=128 already, i.e. the
    # cycle only helps through CG; tools/roof_cycle_probe.py). NOTE
    # (r3-end run, ROOF_SCALE.json): 1500 iterations still hit the cap
    # at residual 3.3e-4 with err_vs_richardson stuck at the same 5.7%
    # the 600-iteration run showed — the extra 900 iterations bought
    # nothing; the plateau is hierarchy-limited, not iteration-limited
    # (see the curved-grid depth weakness in COVERAGE known limits).
    maxiter = int(os.environ.get("FEMSHELL_ROOF_MAXITER", "1500"))
    rtol = float(os.environ.get("FEMSHELL_ROOF_RTOL", "1e-9"))
    t0 = time.perf_counter()
    u = mg.solve_df(forces, rtol=rtol, maxiter=maxiter)
    t_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    mg.reassemble()
    t_asm = time.perf_counter() - t0
    t0 = time.perf_counter()
    u = mg.solve_df(forces, rtol=rtol, maxiter=maxiter)
    t_solve = time.perf_counter() - t0

    w = float(u[mid, 2])
    target = -0.3031  # Richardson limit of this facet discretization
    err = abs(w - target) / abs(target)
    payload = {
        "metric": "scordelis_lo_roof_scale",
        "n": n,
        "elements": n_elem,
        "dofs": int(mesh.n_dofs),
        "cycle": mg.cycle,
        "df_cycle": df_cycle,
        "levels": mg.n_levels,
        "maxiter": maxiter,
        "operator_rebuild_s": round(t_asm, 3),
        "solve_s": round(t_solve, 3),
        "solve_warm_incl_compile_s": round(t_warm, 2),
        "inner_iters": mg.last_iters,
        "residual": float(f"{mg.last_residual:.3e}"),
        "midside_w": float(f"{w:.6f}"),
        "err_vs_richardson": float(f"{err:.3e}"),
    }
    print(json.dumps(payload), flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "ROOF_SCALE.json")
    with open(path, "w") as f:
        json.dump(payload, f)
        f.write("\n")
    print(f"# wrote {path}", flush=True)


def run_amg(mesh, forces, mid, n, n_elem):
    from fem_shell_tpu.amg import AMGShellSystem
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL

    t0 = time.perf_counter()
    amg = AMGShellSystem(mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float32,
                         df=True)
    setup_s = time.perf_counter() - t0
    print(f"# AMG-df setup: {setup_s:.1f} s ({len(amg.levels)} levels)",
          flush=True)

    t0 = time.perf_counter()
    u = amg.solve_df_refined(forces, rtol=1e-9, verbose=True)
    t_warm = time.perf_counter() - t0
    print(f"# warm solve: {t_warm:.1f} s ({amg.last_iters} it)", flush=True)
    t0 = time.perf_counter()
    u = amg.solve_df_refined(forces, rtol=1e-9)
    t_solve = time.perf_counter() - t0

    w = float(u[mid, 2])
    target = -0.3031  # Richardson limit of this facet discretization
    err = abs(w - target) / abs(target)
    payload = {
        "metric": "scordelis_lo_roof_scale",
        "solver": "sa-amg-df",
        "n": n,
        "elements": n_elem,
        "dofs": int(mesh.n_dofs),
        "levels": len(amg.levels),
        "setup_s": round(setup_s, 2),
        "solve_s": round(t_solve, 3),
        "solve_warm_incl_compile_s": round(t_warm, 2),
        "inner_iters": amg.last_iters,
        "residual": float(f"{amg.last_residual:.3e}"),
        "midside_w": float(f"{w:.6f}"),
        "err_vs_richardson": float(f"{err:.3e}"),
    }
    print(json.dumps(payload), flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "ROOF_SCALE.json")
    with open(path, "w") as f:
        json.dump(payload, f)
        f.write("\n")
    print(f"# wrote {path}", flush=True)


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 1024,
        sys.argv[2] if len(sys.argv) > 2 else "mg")
