"""Probe: exact-stencil refined solve on TPU at moderate scale.

Usage: python tools/refine_probe.py [n=512] [et=t] [smoother=jacobi]
Compares plain solve_df vs solve_df_refined center deflection and true
residual against the analytic Kirchhoff golden 0.1064045.
"""
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

GOLDEN = 0.1064045
n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
et = sys.argv[2] if len(sys.argv) > 2 else "t"
smoother = sys.argv[3] if len(sys.argv) > 3 else "jacobi"
mat = Material(0.3, 1e7, 0.5)
p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0,0,0,0), 300.0, 2, et == "q", "z")
t0 = time.perf_counter()
mesh, rows, fac = generate(p)
forces = rows * fac
print(f"mesh {n}x{n} {et}: {len(mesh.tri)+len(mesh.quad)} elems, {mesh.n_nodes} nodes ({time.perf_counter()-t0:.1f} s)", flush=True)
t0 = time.perf_counter()
mg = MultigridShellSystem(mesh, mat, dtype=jnp.float32, df_operator=True,
                          smoother=smoother)
print(f"build+assemble: {time.perf_counter()-t0:.1f} s ({mg.n_levels} levels, "
      f"pallas={mg.use_pallas}, smoother={smoother})", flush=True)
t0 = time.perf_counter()
u1 = mg.solve_df(forces, rtol=1e-9, maxiter=600)
w1 = float(u1[mesh.n_nodes//2, 2])
print(f"solve_df: {time.perf_counter()-t0:.1f} s  iters={mg.last_iters}  w={w1:.8f}  err={abs(w1-GOLDEN)/GOLDEN:.2e}", flush=True)
t0 = time.perf_counter()
u2 = mg.solve_df_refined(forces, rtol=1e-9, verbose=True)
w2 = float(u2[mesh.n_nodes//2, 2])
print(f"refined (cold): {time.perf_counter()-t0:.1f} s  inner_iters={mg.last_iters}  w={w2:.8f}  err={abs(w2-GOLDEN)/GOLDEN:.2e}", flush=True)
t0 = time.perf_counter()
u2 = mg.solve_df_refined(forces, rtol=1e-9)
print(f"refined (warm): {time.perf_counter()-t0:.1f} s  inner_iters={mg.last_iters}  hist={['%.1e'%h for h in mg.refine_history]}", flush=True)
