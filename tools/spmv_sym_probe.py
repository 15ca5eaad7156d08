"""A/B the symmetric-storage df SpMV kernel against the full-storage
one on the real TPU (VERDICT r2 next-step #2: close the roofline gap).

The symmetric kernel streams only the off >= 0 slots (5/9 on quad,
4/7 on tri) and uses each block for its direct AND transposed term, so
the matvec-equivalent bandwidth (full-operator bytes / time) roughly
doubles at the same physical stream rate. Reports:
  - physical GB/s   (bytes actually moved / time)
  - equivalent GB/s (full-pair bytes + x + y / time — what a
    full-storage kernel would have to stream to match this time)
and checks accuracy vs the f64 oracle.

Run STANDALONE: nohup python tools/spmv_sym_probe.py > /tmp/spmv_sym.log 2>&1 &
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

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate

MAT = Material(nu=0.3, em=1e7, thickness=0.5)
ITERS = 20


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    et = sys.argv[2] if len(sys.argv) > 2 else "t"
    from fem_shell_tpu.large import LargeShellSystem
    from fem_shell_tpu.ops.assemble_grid import untile_values
    from fem_shell_tpu.ops.df import DF, df_from_f64, df_to_f64
    from fem_shell_tpu.ops.pallas_spmv_df import (
        prepare_tiled_values_df_sym,
        stencil_spmv_pallas_df,
        stencil_spmv_pallas_df_sym,
    )

    print(f"# device={jax.devices()[0]} n={n}{et}", flush=True)
    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, et == "q", "z")
    mesh, _, _ = generate(p)
    sys0 = LargeShellSystem(mesh, MAT, dtype=jnp.float32)
    pair, _ = sys0.assemble_df(layout="tiled", with_diag=True, method="grid")
    offsets = tuple(int(o) for o in sys0.offsets)
    npad = sys0.pattern.n_pad
    k = len(offsets)
    ku = sum(1 for o in offsets if o >= 0)

    flat = DF(untile_values(pair.hi), untile_values(pair.lo))
    vh_u, vl_u, _ = prepare_tiled_values_df_sym(flat, offsets)

    rng = np.random.default_rng(0)
    x64 = rng.standard_normal((6, npad))
    x0 = df_from_f64(jnp.asarray(x64))

    vec_bytes = (x0.hi.size * 4 * 2) * 2  # x read + y write (hi+lo)
    full_bytes = pair.hi.size * 4 * 2 + vec_bytes
    sym_bytes = vh_u.size * 4 * 2 + vec_bytes

    def bench(label, fn, args, phys_bytes):
        @jax.jit
        def chain(vh, vl, x):
            def body(i, c):
                y = fn(vh, vl, c, offsets)
                s = jnp.max(jnp.abs(y.hi))
                return DF(y.hi / s, y.lo / s)

            return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x).hi)

        float(chain(*args, x0))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(*args, x0))
            ts.append((time.perf_counter() - t0) / ITERS)
        dt = min(ts)
        print(f"# {label:10s} {dt * 1e3:8.3f} ms  physical "
              f"{phys_bytes / dt / 1e9:6.1f} GB/s  matvec-equivalent "
              f"{full_bytes / dt / 1e9:6.1f} GB/s", flush=True)

    import functools

    bench("full", stencil_spmv_pallas_df, (pair.hi, pair.lo), full_bytes)
    bench("sym", stencil_spmv_pallas_df_sym, (vh_u, vl_u), sym_bytes)
    for tps in (2, 4):
        for kahan in (False, True):
            fn = functools.partial(
                stencil_spmv_pallas_df_sym, tps=tps, kahan=kahan
            )
            bench(f"sym t{tps}{'k' if kahan else ''}", fn, (vh_u, vl_u),
                  sym_bytes)

    # accuracy vs f64 oracle
    with jax.default_matmul_precision("highest"):
        y_sym = stencil_spmv_pallas_df_sym(vh_u, vl_u, x0, offsets)
    v64 = flat.hi.astype(jnp.float64) + flat.lo.astype(jnp.float64)
    y64 = np.zeros((6, npad))
    v4 = np.asarray(v64).reshape(6, 6, k, npad)
    for s, off in enumerate(offsets):
        xs = np.roll(x64, -off, axis=1)
        y64 += np.einsum("abn,bn->an", v4[:, :, s, :], xs)
    sl = slice(2 * (n + 1), npad - 2 * (n + 1))
    scale = np.abs(y64[:, sl]).max()
    yv = np.asarray(df_to_f64(y_sym))
    err = np.abs(yv[:, sl] - y64[:, sl]).max() / scale
    print(f"# accuracy sym: max rel err vs f64 oracle {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
