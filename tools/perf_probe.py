"""Perf probe: where does time go at ~1M elements on the real TPU?

Timing is honest under the remote (axon) platform: every measured region
chains ITERS dependent applications inside ONE jit and ends with a
device->host scalar fetch. All large arrays cross the jit boundary as
ARGUMENTS (closure constants are embedded into the serialized HLO —
remote-compile size limit).

Run: nohup python tools/perf_probe.py [nx] > /tmp/perf_probe.log 2>&1 &
"""
import functools
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

ITERS = 20


def chain_jit(mv, tree):
    @jax.jit
    def chain(v, x):
        def body(i, c):
            y = mv(v, c)
            if tree:
                s = jnp.max(jnp.abs(y[0]))
                return jax.tree.map(lambda a: a / s, y)
            s = jnp.max(jnp.abs(y))
            return y / s

        y = jax.lax.fori_loop(0, ITERS, body, x)
        return jnp.sum(y[0] if tree else y)

    return chain


def time_matvec(label, mv, v, x0, nbytes, tree=False):
    """Time ITERS chained applications of mv(values, x) inside one jit."""
    chain = chain_jit(mv, tree)
    r = float(chain(v, x0))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = float(chain(v, x0))
        ts.append(time.perf_counter() - t0)
    t = min(ts) / ITERS
    print(f"{label}: {t * 1e3:.3f} ms/iter  ->  {nbytes / t / 1e9:.1f} GB/s   [{r:.3e}]", flush=True)
    return t


def time_host(label, fn, per, unit, reps=3):
    """Time fn() which must END with a host sync of its own."""
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{label}: {t:.3f} s  ->  {per / t / 1e6:.3f} M{unit}/s", flush=True)
    return t


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print(f"device={jax.devices()[0]}  nx={nx}", flush=True)
    mat = Material(nu=0.3, em=1e7, thickness=0.5)
    p = MeshGenParams("q", nx, nx, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, _, _ = generate(p)
    e = nx * nx
    print(f"elements={e}  nodes={mesh.n_nodes}", flush=True)

    sys64 = LargeShellSystem(mesh, mat, dtype=jnp.float64, chunk=8192)
    k = len(sys64.offsets)
    npad = sys64.pattern.n_pad
    offsets = tuple(int(o) for o in sys64.offsets)

    # ---- assembly breakdown: batched element kernels (emulated f64) alone
    from fem_shell_tpu.ops.elements import batched_quad_stiffness

    coords64 = jnp.asarray(mesh.coords, jnp.float64)
    conn = jnp.asarray(mesh.quad)
    dm64, dp64 = (jnp.asarray(a, jnp.float64) for a in mat.matrices())
    chunk = 8192

    @jax.jit
    def kernels_only(coords, cn, dm, dp):
        def body(carry, cc):
            ke = batched_quad_stiffness(coords, cc, dm, dp, mat.thickness)
            return carry + jnp.sum(ke[:, 0, 0]), None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float64), cn.reshape(-1, chunk, 4))
        return s

    def kern():
        with jax.default_matmul_precision("highest"):
            return float(kernels_only(coords64, conn, dm64, dp64))

    time_host(f"f64 element kernels only ({e} elem)", kern, e, "elem")

    # same in f32
    coords32 = jnp.asarray(mesh.coords, jnp.float32)
    dm32, dp32 = (jnp.asarray(a, jnp.float32) for a in mat.matrices())

    @jax.jit
    def kernels_only32(coords, cn, dm, dp):
        def body(carry, cc):
            ke = batched_quad_stiffness(coords, cc, dm, dp, jnp.float32(mat.thickness))
            return carry + jnp.sum(ke[:, 0, 0]), None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), cn.reshape(-1, chunk, 4))
        return s

    def kern32():
        with jax.default_matmul_precision("highest"):
            return float(kernels_only32(coords32, conn, dm32, dp32))

    time_host(f"f32 element kernels only ({e} elem)", kern32, e, "elem")

    # ---- full strip-df assembly
    def asm():
        d = sys64.assemble_df()
        np.asarray(d.hi[0, :8])
        return d

    time_host(f"strip-df assembly ({e} elem)", asm, e, "elem")
    df = sys64.assemble_df()

    # ---- df matvec
    from fem_shell_tpu.ops.df import DF, df_stencil_matvec

    x = DF(jnp.ones((6, npad), jnp.float32), jnp.zeros((6, npad), jnp.float32))
    nbytes_df = (2 * 36 * k * npad + 4 * 6 * npad) * 4
    time_matvec(
        "df matvec (XLA)",
        lambda v, c: df_stencil_matvec(DF(v[0], v[1]), c, offsets),
        (df.hi, df.lo),
        x,
        nbytes_df,
        tree=True,
    )

    v32 = df.hi  # flat [36K, npad] f32 — fine for perf shape purposes
    del df

    # ---- f32 SpMV variants
    from fem_shell_tpu.ops.soa import soa_matvec

    x32 = jnp.ones((6, npad), jnp.float32)
    nbytes = (36 * k * npad + 2 * 6 * npad) * 4

    time_matvec(
        "XLA soa_matvec flat",
        lambda v, c: soa_matvec(v, c, offsets=offsets),
        v32,
        x32,
        nbytes,
    )

    from fem_shell_tpu.ops.pallas_spmv import (
        prepare_tiled_values,
        stencil_spmv_pallas,
        stencil_spmv_pallas_tiled,
    )

    v3 = v32.reshape(36, k, npad)
    try:
        time_matvec(
            "Pallas plain",
            lambda v, c: stencil_spmv_pallas(v, c, offsets),
            v3,
            x32,
            nbytes,
        )
    except Exception as ex:
        print(f"Pallas plain FAILED: {type(ex).__name__}: {str(ex)[:300]}", flush=True)

    for rt in (32, 64):
        try:
            vt, r = prepare_tiled_values(v3, r_tile=rt)
            time_matvec(
                f"Pallas tiled r={r}",
                lambda v, c: stencil_spmv_pallas_tiled(v, c, offsets),
                vt,
                x32,
                nbytes,
            )
            del vt
        except Exception as ex:
            print(f"Pallas tiled r_tile={rt} FAILED: {type(ex).__name__}: {str(ex)[:300]}", flush=True)


if __name__ == "__main__":
    main()
