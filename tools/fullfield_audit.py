"""Full-field accuracy audit of the production refined solve (VERDICT r2
weak #4: forward error was only ever spot-checked at the center node).

Two phases, two processes (the TPU tunnel is single-client and the
reference must run in pure f64/longdouble on the host):

  phase tpu  — real-TPU mg.solve_df_refined at n^2; saves the solution.
      python tools/fullfield_audit.py tpu 512
  phase cpu  — CPU f64 MG solve refined against the LONGDOUBLE
      class-table operator (ops/exact_stencil.exact_matvec_f64) until its
      own true residual is ~1e-12 — a reference whose forward error is
      far below the df floor under test. Writes FULLFIELD_AUDIT.json
      with the max-norm relative error of the TPU field.
      PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/fullfield_audit.py cpu 512

The df (two-f32) representation floor bounds the TPU solve's TRUE
residual at ~kappa*eps49 (mg.solve_df_refined docstring); this audit
measures what that floor means for the FULL displacement field, not just
the center golden.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fem_shell_tpu.materials import Material

MAT = Material(nu=0.3, em=1e7, thickness=0.5)
GOLDEN = 0.1064045  # analytic Kirchhoff center deflection


def _case(n, et):
    from fem_shell_tpu.meshgen import MeshGenParams, generate

    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, et == "q", "z")
    mesh, rows, fac = generate(p)
    return mesh, rows * fac


def phase_tpu(n, et):
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from fem_shell_tpu.mg import MultigridShellSystem

    print(f"# device={jax.devices()[0]}", flush=True)
    mesh, forces = _case(n, et)
    mg = MultigridShellSystem(mesh, MAT, dtype=jnp.float32, df_operator=True)
    t0 = time.perf_counter()
    u = mg.solve_df_refined(forces, rtol=1e-9, verbose=True)
    dt = time.perf_counter() - t0
    out = f"/tmp/fullfield_x_{et}{n}.npz"
    np.savez(out, u=u, n=n, et=et, iters=mg.last_iters,
             true_residual=mg.last_residual, solve_s=dt)
    w = float(u[mesh.n_nodes // 2, 2])
    print(f"# solved {n}^2 {et}: {mg.last_iters} iters, true resid "
          f"{mg.last_residual:.3e}, center w {w:.7f} "
          f"(golden err {abs(w - GOLDEN) / GOLDEN:.2e}), {dt:.1f} s -> {out}",
          flush=True)


def phase_cpu(n, et):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from fem_shell_tpu.mg import MultigridShellSystem, detect_structured_grid
    from fem_shell_tpu.ops.exact_stencil import build_exact_stencil, exact_matvec_f64
    from fem_shell_tpu.ops.ld_interp import LD
    from fem_shell_tpu.ops.soa import _offsets_of

    mesh, forces = _case(n, et)
    data = np.load(f"/tmp/fullfield_x_{et}{n}.npz")
    u_tpu = np.asarray(data["u"], np.float64)  # [n_nodes, 6]

    grid = detect_structured_grid(mesh)
    st = build_exact_stencil(mesh, MAT, _offsets_of(mesh), grid=grid)
    nn = mesh.n_nodes
    free = (~mesh.dirichlet_mask()).astype(np.float64)  # [nn, 6]
    b_ld = (np.asarray(forces) * free).T.astype(LD)  # [6, nn]
    b_norm = float(np.sqrt(np.sum((b_ld * b_ld).astype(np.float64))))

    mg = MultigridShellSystem(mesh, MAT, dtype=jnp.float64)
    t0 = time.perf_counter()
    x = mg.solve(forces, rtol=1e-11, maxiter=400).T.astype(LD)  # [6, nn]
    print(f"# cpu f64 MG solve: {mg.last_cg.iters} iters, "
          f"{time.perf_counter() - t0:.1f} s", flush=True)

    # longdouble-residual refinement of the CPU reference: contracts the
    # correlated f64-assembly error (kappa*eps53) far below the df floor
    hist = []
    for k in range(5):
        r_ld = b_ld - exact_matvec_f64(st, x)
        rn = float(np.sqrt(np.sum((r_ld * r_ld).astype(np.float64)))) / b_norm
        hist.append(rn)
        print(f"# ref refine[{k}]: true residual {rn:.3e}", flush=True)
        if rn < 1e-12 or (len(hist) > 1 and rn > 0.5 * hist[-2]):
            break
        d = mg.solve(np.asarray(r_ld.T, np.float64), rtol=1e-10, maxiter=400)
        x = x + d.T.astype(LD)
    x_ref = np.asarray(x.T, np.float64)  # [nn, 6]

    scale = float(np.max(np.abs(x_ref)))
    err_full = float(np.max(np.abs(u_tpu - x_ref))) / scale
    # per-component worst relative error (w-dofs vs rotation dofs differ
    # in scale; the max-norm over the full field is the headline)
    comp_err = [
        float(np.max(np.abs(u_tpu[:, c] - x_ref[:, c]))
              / max(np.max(np.abs(x_ref[:, c])), 1e-300))
        for c in range(6)
    ]
    w_c = float(x_ref[nn // 2, 2])
    payload = {
        "n": n,
        "elem_type": et,
        "dofs": 6 * nn,
        "tpu_true_residual": float(data["true_residual"]),
        "tpu_iters": int(data["iters"]),
        "ref_true_residual": hist[-1],
        "fullfield_err": err_full,
        "component_err": comp_err,
        "center_w_ref": w_c,
        "center_err_vs_analytic": abs(w_c - GOLDEN) / GOLDEN,
    }
    print(json.dumps(payload), flush=True)
    out_dir = os.environ.get(
        "FULLFIELD_OUT",
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    path = os.path.join(out_dir, f"FULLFIELD_AUDIT_{et}{n}.json")
    with open(path, "w") as f:
        json.dump(payload, f)
        f.write("\n")
    print(f"# wrote {path}", flush=True)


def main():
    phase = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    et = sys.argv[3] if len(sys.argv) > 3 else "t"
    if phase == "tpu":
        phase_tpu(n, et)
    elif phase == "cpu":
        phase_cpu(n, et)
    else:
        raise SystemExit(f"unknown phase {phase!r} (tpu|cpu)")


if __name__ == "__main__":
    main()
