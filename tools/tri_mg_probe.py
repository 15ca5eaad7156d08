"""Tri MG-df on TPU: pallas vs XLA + direct tri-stencil matvec parity."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fem_shell_tpu.large import LargeShellSystem
from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.mg import MultigridShellSystem
from fem_shell_tpu.ops.assemble_grid import untile_values
from fem_shell_tpu.ops.df import DF, df_stencil_matvec
from fem_shell_tpu.ops.pallas_spmv import stencil_spmv_pallas_tiled
from fem_shell_tpu.ops.pallas_spmv_df import stencil_spmv_pallas_df
from fem_shell_tpu.ops.soa import soa_diagonal, soa_matvec

MAT = Material(nu=0.3, em=1e7, thickness=0.5)
n = 256
pm = MeshGenParams("t", n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
mesh, rows, fac = generate(pm)
forces = rows * fac

s = LargeShellSystem(mesh, MAT, dtype=jnp.float32, chunk=8192)
pair, diag = s.assemble_df(layout="tiled", with_diag=True, method="grid")
offsets = tuple(int(o) for o in s.offsets)
npad = s.pattern.n_pad
flat_hi = np.asarray(untile_values(pair.hi))
flat_lo = np.asarray(untile_values(pair.lo))
rng = np.random.default_rng(0)
x32 = jnp.asarray(rng.normal(size=(6, npad)), jnp.float32)

ref = np.asarray(
    jax.jit(lambda v, c: soa_matvec(v, c, offsets=offsets))(jnp.asarray(flat_hi), x32)
)
got = np.asarray(
    jax.jit(lambda v, c: stencil_spmv_pallas_tiled(v, c, offsets))(pair.hi, x32)
)
scale = np.abs(ref).max()
print(f"tri f32 tiled pallas vs XLA: rel {np.abs(got - ref).max() / scale:.3e}", flush=True)

xdf = DF(x32, jnp.asarray(rng.normal(size=(6, npad)) * 1e-8, jnp.float32))
ref_df = jax.jit(lambda h, l, c: df_stencil_matvec(DF(h, l), c, offsets))(
    jnp.asarray(flat_hi), jnp.asarray(flat_lo), xdf
)
got_df = jax.jit(lambda h, l, c: stencil_spmv_pallas_df(h, l, c, offsets))(
    pair.hi, pair.lo, xdf
)
r64 = np.asarray(ref_df.hi, np.float64) + np.asarray(ref_df.lo, np.float64)
g64 = np.asarray(got_df.hi, np.float64) + np.asarray(got_df.lo, np.float64)
print(
    f"tri df tiled pallas vs XLA: rel {np.abs(g64 - r64).max() / np.abs(r64).max():.3e}",
    flush=True,
)

d_ref = np.asarray(soa_diagonal(jnp.asarray(flat_hi), offsets=offsets))
print(
    f"diag parity: {np.abs(np.asarray(diag) - d_ref).max():.3e} "
    f"(scale {np.abs(d_ref).max():.3e})",
    flush=True,
)
del s, pair

for pallas in (False, True):
    mg = MultigridShellSystem(
        mesh, MAT, dtype=jnp.float32, df_operator=True, use_pallas=pallas
    )
    u = mg.solve_df(forces, rtol=1e-9, maxiter=300)
    w = float(u[mesh.n_nodes // 2, 2])
    print(
        f"tri256 pallas={pallas}: iters={mg.last_iters} res={mg.last_residual:.2e} w={w:.6f}",
        flush=True,
    )
    del mg
