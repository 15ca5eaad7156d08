"""f32 Pallas SpMV tile sweep on the real TPU (ROADMAP perf item).

Measures the tile-major f32 stencil SpMV (ops/pallas_spmv.py,
stencil_spmv_pallas_tiled) at r_tile = 8/16/32 on a synthetic 9-point
stencil operator sized like a 1024^2 quad grid, plus the df pair kernel
at its VMEM-capped r=8 for comparison. Honest timing: chained matvecs
inside one jit + device->host fetch (CLAUDE.md: block_until_ready is
optimistic on the remote axon platform).

Usage: python tools/spmv_sweep.py [npad_multiple_of_4096=1052672]
"""
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

from fem_shell_tpu.ops.pallas_spmv import prepare_tiled_values, stencil_spmv_pallas_tiled

NPAD = int(sys.argv[1]) if len(sys.argv) > 1 else 1052672  # 1025*1027 ceil to 4096
assert NPAD % 4096 == 0
NXP = 1027  # row stride of a 1024^2 quad grid (nodes+halo pad)
OFFSETS = (-NXP - 1, -NXP, -NXP + 1, -1, 0, 1, NXP - 1, NXP, NXP + 1)
K = len(OFFSETS)
ITERS = 30

print(f"device={jax.devices()[0]}  npad={NPAD}  K={K}  "
      f"values={36 * K * NPAD * 4 / 1e9:.2f} GB", flush=True)

rng = np.random.default_rng(0)
values = jnp.asarray(rng.standard_normal((36, K, NPAD)), jnp.float32)
x = jnp.asarray(rng.standard_normal((6, NPAD)), jnp.float32)
nbytes = 36 * K * NPAD * 4


def timed(fn, *args):
    @jax.jit
    def chain(*a):
        def body(i, c):
            y = fn(*a[:-1], c)
            return y / jnp.max(jnp.abs(y))

        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, a[-1]))

    float(chain(*args))  # warm/compile
    t0 = time.perf_counter()
    float(chain(*args))
    return time.perf_counter() - t0


y_ref = None
for r in (8, 16, 32):
    vt, r_got = prepare_tiled_values(values, r)
    assert r_got == r, (r, r_got)
    mv = lambda v, xx: stencil_spmv_pallas_tiled(v, xx, OFFSETS)  # noqa: E731
    y = mv(vt, x)
    if y_ref is None:
        y_ref = np.asarray(y)
    else:
        err = np.abs(np.asarray(y) - y_ref).max() / np.abs(y_ref).max()
        assert err < 1e-6, f"r={r} parity {err:.2e}"
    dt = timed(mv, vt, x)
    print(f"f32 tiled r={r:2d}: {dt:.3f} s for {ITERS} matvecs -> "
          f"{ITERS * nbytes / dt / 1e9:.0f} GB/s", flush=True)
    del vt

# df pair at its VMEM cap for reference
from fem_shell_tpu.ops.df import DF, df_from_f64
from fem_shell_tpu.ops.pallas_spmv_df import prepare_tiled_values_df, stencil_spmv_pallas_df

pair = DF(values.reshape(36 * K, NPAD), (values * 1e-8).reshape(36 * K, NPAD))
vh, vl, r = prepare_tiled_values_df(pair, 8)
xdf = df_from_f64(jnp.asarray(rng.standard_normal((6, NPAD))))


def mv_df(vh_, vl_, xx):
    y = stencil_spmv_pallas_df(vh_, vl_, xx, OFFSETS)
    s = jnp.max(jnp.abs(y.hi))
    return DF(y.hi / s, y.lo / s)


@jax.jit
def chain_df(vh_, vl_, xx):
    y = jax.lax.fori_loop(0, ITERS, lambda i, c: mv_df(vh_, vl_, c), xx)
    return jnp.sum(y.hi)


float(chain_df(vh, vl, xdf))
t0 = time.perf_counter()
float(chain_df(vh, vl, xdf))
dt = time.perf_counter() - t0
print(f"df  tiled r={r:2d}: {dt:.3f} s for {ITERS} matvecs -> "
      f"{ITERS * 2 * nbytes / dt / 1e9:.0f} GB/s", flush=True)
