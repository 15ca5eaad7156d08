"""t512 on TPU: operator parity, level omegas, per-level pallas parity."""
import os, sys
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
from fem_shell_tpu.ops.soa import soa_matvec
from fem_shell_tpu.ops.df import DF, df_stencil_matvec
from fem_shell_tpu.ops.pallas_spmv import stencil_spmv_pallas_tiled
from fem_shell_tpu.ops.pallas_spmv_df import stencil_spmv_pallas_df

MAT = Material(nu=0.3, em=1e7, thickness=0.5)
n = 512
pm = MeshGenParams("t", n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
mesh, rows, fac = generate(pm)

# 1) fine-level tiled assembly parity vs CPU f64 reference
s = LargeShellSystem(mesh, MAT, dtype=jnp.float32, chunk=8192)
pair, diag = s.assemble_df(layout="tiled", with_diag=True, method="grid")
offsets = tuple(int(o) for o in s.offsets)
flat = np.asarray(untile_values(pair.hi), np.float64) + np.asarray(untile_values(pair.lo), np.float64)
ref = np.load("/tmp/grid_ref_t512.npy").reshape(flat.shape)
print(f"t512 fine parity: {np.abs(flat - ref).max() / np.abs(ref).max():.3e}", flush=True)
del pair, s, flat, ref

# 2) build the MG (pallas on) and report omegas + per-level pallas-vs-XLA matvec parity
mg = MultigridShellSystem(mesh, MAT, dtype=jnp.float32, df_operator=True, use_pallas=True)
rng = np.random.default_rng(1)
for li, lvl in enumerate(mg.levels):
    om = float(lvl.omega) if lvl.omega is not None else -1.0
    x = jnp.asarray(rng.normal(size=(6, lvl.npad)), jnp.float32)
    if lvl.values.ndim == 4:
        got = np.asarray(jax.jit(lambda v, c: stencil_spmv_pallas_tiled(v, c, lvl.offsets))(lvl.values, x))
        vf = untile_values(lvl.values)
        refm = np.asarray(jax.jit(lambda v, c: soa_matvec(v, c, offsets=lvl.offsets))(vf, x))
        rel = np.abs(got - refm).max() / (np.abs(refm).max() + 1e-30)
    else:
        rel = -1.0
    print(f"level {li}: npad={lvl.npad} omega={om:.3f} pallas-mv rel={rel:.3e}", flush=True)

# 3) df outer matvec parity at fine level
fine = mg.levels[0]
xdf = DF(jnp.asarray(rng.normal(size=(6, fine.npad)), jnp.float32), jnp.zeros((6, fine.npad), jnp.float32))
fl_hi = untile_values(mg._fine_df.hi)
fl_lo = untile_values(mg._fine_df.lo)
refd = jax.jit(lambda h, l, c: df_stencil_matvec(DF(h, l), c, fine.offsets))(fl_hi, fl_lo, xdf)
gotd = jax.jit(lambda h, l, c: stencil_spmv_pallas_df(h, l, c, fine.offsets))(mg._fine_df.hi, mg._fine_df.lo, xdf)
r64 = np.asarray(refd.hi, np.float64) + np.asarray(refd.lo, np.float64)
g64 = np.asarray(gotd.hi, np.float64) + np.asarray(gotd.lo, np.float64)
print(f"df fine matvec parity: {np.abs(g64 - r64).max() / np.abs(r64).max():.3e}", flush=True)

# 4) solve (pallas) and compare against solve with pallas OFF
u = mg.solve_df(rows * fac, rtol=1e-9, maxiter=500)
print(f"pallas solve: iters={mg.last_iters} res={mg.last_residual:.2e} w={float(u[mesh.n_nodes//2,2]):.6f}", flush=True)
del mg
mg2 = MultigridShellSystem(mesh, MAT, dtype=jnp.float32, df_operator=True, use_pallas=False)
u2 = mg2.solve_df(rows * fac, rtol=1e-9, maxiter=500)
print(f"xla    solve: iters={mg2.last_iters} res={mg2.last_residual:.2e} w={float(u2[mesh.n_nodes//2,2]):.6f}", flush=True)
