"""Probe: fused single-dispatch Test-G (assembly+solve in one jit) on TPU."""
import os, sys, time
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
from fem_shell_tpu.mg import MultigridShellSystem

GOLDEN = {"q": 0.106465, "t": 0.106413}
mat = Material(0.3, 1e7, 0.5)
for et in ("q", "t"):
    p = MeshGenParams(et, 64, 64, 0, 0, 10, 10, (0,0,0,0), 300.0, 2, et=="q", "z")
    mesh, rows, fac = generate(p)
    forces = rows * fac
    t0 = time.perf_counter()
    mg = MultigridShellSystem(mesh, mat, dtype=jnp.float64, assemble=False)
    print(f"{et}: construct {time.perf_counter()-t0:.2f} s", flush=True)
    t0 = time.perf_counter()
    u = mg.solve_fused(forces, rtol=1e-9, maxiter=400)
    print(f"{et}: cold solve_fused {time.perf_counter()-t0:.1f} s  iters={mg.last_iters} res={mg.last_residual:.2e}", flush=True)
    w = float(u[mesh.n_nodes//2, 2]); err = abs(w-GOLDEN[et])/GOLDEN[et]
    print(f"{et}: center w={w:.6f} err={err:.2e}", flush=True)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        u = mg.solve_fused(forces, rtol=1e-9, maxiter=400)
        times.append(time.perf_counter()-t0)
    print(f"{et}: warm reps {[f'{x:.3f}' for x in times]}  mean {np.mean(times):.3f} s", flush=True)
