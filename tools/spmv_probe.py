"""SpMV bandwidth probe on the real TPU: XLA vs Pallas, f32 and df.

Builds the 1024^2 quad operator via grid-df assembly, then times each
matvec variant with chained iterations + host fetch (honest under the
remote platform). Reports effective GB/s against the bytes each variant
actually streams.
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

from fem_shell_tpu.large import LargeShellSystem
from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.ops.df import DF, df_stencil_matvec
from fem_shell_tpu.ops.pallas_spmv import (
    prepare_tiled_values,
    stencil_spmv_pallas,
    stencil_spmv_pallas_tiled,
)
from fem_shell_tpu.ops.pallas_spmv_df import (
    prepare_tiled_values_df,
    stencil_spmv_pallas_df,
    stencil_spmv_pallas_df_flat,
)
from fem_shell_tpu.ops.soa import soa_matvec

ITERS = 20


def time_mv(label, mv, v, x0, nbytes, tree=False):
    @jax.jit
    def chain(v, x):
        def body(i, c):
            y = mv(v, c)
            if tree:
                s = jnp.max(jnp.abs(y[0]))
                return jax.tree.map(lambda a: a / s, y)
            return y / jnp.max(jnp.abs(y))

        y = jax.lax.fori_loop(0, ITERS, body, x)
        return jnp.sum(y[0] if tree else y)

    try:
        r = float(chain(v, x0))
    except Exception as ex:
        print(f"{label}: FAILED {type(ex).__name__}: {str(ex)[:200]}", flush=True)
        return
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = float(chain(v, x0))
        ts.append(time.perf_counter() - t0)
    t = min(ts) / ITERS
    print(f"{label}: {t * 1e3:.3f} ms/iter -> {nbytes / t / 1e9:.1f} GB/s  [{r:.3e}]", flush=True)


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print(f"device={jax.devices()[0]} nx={nx}", flush=True)
    mat = Material(nu=0.3, em=1e7, thickness=0.5)
    pm = MeshGenParams("q", nx, nx, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, _, _ = generate(pm)
    s = LargeShellSystem(mesh, mat, dtype=jnp.float64, chunk=4096)
    pair = s.assemble_df()
    k = len(s.offsets)
    npad = s.pattern.n_pad
    offsets = tuple(int(o) for o in s.offsets)

    v32 = pair.hi  # flat [36K, npad]
    v3 = v32.reshape(36, k, npad)
    x32 = jnp.ones((6, npad), jnp.float32)
    nbytes = (36 * k * npad + 2 * 6 * npad) * 4
    nbytes_df = (2 * 36 * k * npad + 4 * 6 * npad) * 4

    time_mv("XLA f32 soa_matvec ", lambda v, c: soa_matvec(v, c, offsets=offsets), v3, x32, nbytes)
    time_mv("Pallas f32 plain   ", lambda v, c: stencil_spmv_pallas(v, c, offsets), v3, x32, nbytes)
    for rt in (8, 16, 32):
        vt, r = prepare_tiled_values(v3, r_tile=rt)
        if r != rt:
            print(f"(tiled r_tile={rt} -> r={r})", flush=True)
        time_mv(
            f"Pallas f32 tiled r={r:2d}",
            lambda v, c: stencil_spmv_pallas_tiled(v, c, offsets),
            vt,
            x32,
            nbytes,
        )
        del vt

    xdf = DF(x32, jnp.zeros_like(x32))
    time_mv(
        "XLA df matvec      ",
        lambda v, c: df_stencil_matvec(DF(v[0], v[1]), c, offsets),
        (pair.hi, pair.lo),
        xdf,
        nbytes_df,
        tree=True,
    )
    time_mv(
        "Pallas df flat r=8 ",
        lambda v, c: stencil_spmv_pallas_df_flat(DF(v[0], v[1]), c, offsets),
        (pair.hi, pair.lo),
        xdf,
        nbytes_df,
        tree=True,
    )
    vh_t, vl_t, r = prepare_tiled_values_df(pair)
    time_mv(
        f"Pallas df tiled r={r}",
        lambda v, c: stencil_spmv_pallas_df(v[0], v[1], c, offsets),
        (vh_t, vl_t),
        xdf,
        nbytes_df,
        tree=True,
    )


if __name__ == "__main__":
    main()
