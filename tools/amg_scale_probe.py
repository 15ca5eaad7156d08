"""Unstructured-path scale probe on real TPU: AMG-df setup + solve at
>=1M DOF (VERDICT r2 next-step #10 — the 'arbitrary mesh at scale' story
had CPU correctness evidence only).

The mesh is a randomly node-permuted 416^2 quad plate: physically the
Test-D/G plate, but the permutation destroys the structured numbering so
every structured-grid fast path rejects it — the solver sees a genuinely
unstructured problem (gather-mode operator, RCM reorder, SA-AMG
hierarchy), while the analytic Kirchhoff golden still validates the
answer.

Run STANDALONE: nohup python tools/amg_scale_probe.py > /tmp/amg_probe.log 2>&1 &
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


def run(n=416, et="q"):
    from fem_shell_tpu.amg import AMGShellSystem
    from fem_shell_tpu.materials import Material
    from fem_shell_tpu.mesh import permute_nodes
    from fem_shell_tpu.meshgen import MeshGenParams, generate

    mat = Material(nu=0.3, em=1e7, thickness=0.5)
    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, et == "q", "z")
    mesh, rows, fac = generate(p)
    perm = np.random.default_rng(1).permutation(mesh.n_nodes)
    mesh2 = permute_nodes(mesh, perm)
    forces = (rows * fac)[perm]
    print(f"# device={jax.devices()[0]} dofs={mesh2.n_dofs}", flush=True)

    t0 = time.perf_counter()
    amg = AMGShellSystem(mesh2, mat, dtype=jnp.float32, df=True,
                         verbose_setup=True)
    setup_s = time.perf_counter() - t0
    print(f"# AMG-df setup: {setup_s:.1f} s", flush=True)

    t0 = time.perf_counter()
    u = amg.solve_df_refined(forces, rtol=1e-9, verbose=True)
    warm_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    u = amg.solve_df_refined(forces, rtol=1e-9)
    solve_s = time.perf_counter() - t0

    center_new = int(np.nonzero(perm == mesh.n_nodes // 2)[0][0])
    w = float(u[center_new, 2])
    golden = 0.1064045
    err = abs(w - golden) / golden
    payload = {
        "metric": "amg_unstructured_1mdof",
        "n": n,
        "elem_type": et,
        "dofs": int(mesh2.n_dofs),
        "setup_s": round(setup_s, 2),
        "setup_timings": {k: round(v, 2) for k, v in amg.setup_timings.items()},
        "solve_warm_incl_compile_s": round(warm_s, 2),
        "solve_s": round(solve_s, 3),
        "inner_iters": amg.last_iters,
        "true_residual": float(f"{amg.last_residual:.3e}"),
        "golden_err": float(f"{err:.3e}"),
    }
    print(json.dumps(payload), flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "AMG_SCALE.json")
    with open(path, "w") as f:
        json.dump(payload, f)
        f.write("\n")
    print(f"# wrote {path}", flush=True)


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 416,
        sys.argv[2] if len(sys.argv) > 2 else "q")
