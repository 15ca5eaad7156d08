"""Pallas kernels at the 10M-node scale with SYNTHETIC values."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fem_shell_tpu.ops.df import DF
from fem_shell_tpu.ops.pallas_spmv import stencil_spmv_pallas_tiled
from fem_shell_tpu.ops.pallas_spmv_df import stencil_spmv_pallas_df

nxp = 2305
npad = -(-(nxp * nxp) // 1024) * 1024
k = 7
offsets = (-nxp, -(nxp - 1), -1, 0, 1, nxp - 1, nxp)
ntiles = npad // 1024
print(f"npad={npad} ntiles={ntiles}", flush=True)

key = jax.random.PRNGKey(0)
vh = jax.random.normal(key, (ntiles, 36 * k, 8, 128), jnp.float32)
vl = vh * 1e-8
x = DF(jnp.ones((6, npad), jnp.float32), jnp.zeros((6, npad), jnp.float32))

# f32 tiled smoother matvec
f32mv = jax.jit(lambda v, c: stencil_spmv_pallas_tiled(v, c, offsets))
t0 = time.perf_counter(); r = np.asarray(f32mv(vh, x.hi)[0, :4])
print(f"f32 tiled matvec OK {time.perf_counter()-t0:.1f} s (first)", flush=True)
t0 = time.perf_counter(); np.asarray(f32mv(vh, x.hi)[0, :4])
print(f"f32 tiled matvec {time.perf_counter()-t0:.3f} s", flush=True)

# df tiled matvec
dfmv = jax.jit(lambda a, b, c: stencil_spmv_pallas_df(a, b, c, offsets))
t0 = time.perf_counter(); y = dfmv(vh, vl, x); r = np.asarray(y.hi[0, :4])
print(f"df tiled matvec OK {time.perf_counter()-t0:.1f} s (first)", flush=True)
t0 = time.perf_counter(); np.asarray(dfmv(vh, vl, x).hi[0, :4])
print(f"df tiled matvec {time.perf_counter()-t0:.3f} s", flush=True)
print("ALL OK", flush=True)
