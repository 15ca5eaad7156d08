"""A/B the df pair-SpMV accumulation variants on the real TPU
(VERDICT r2 next-step #2: 436 -> >=660 GB/s with corrected accounting).

Streams a real assembled tiled pair at 1024^2 and times:
  - renorm  (current default: full renormalized df add per term)
  - kahan   (exact two_sum main channel + plain f32 error channel)
and reports GB/s under TWO accountings: pair-only (the historical
SCALE_BENCH number) and true-bytes (pair + x in + y out).
Also checks the kahan variant's accuracy vs the f64 oracle.

Run STANDALONE: nohup python tools/spmv_kahan_probe.py > /tmp/spmv_kahan.log 2>&1 &
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
    from fem_shell_tpu.ops.df import DF, df_from_f64, df_stencil_matvec, df_to_f64
    from fem_shell_tpu.ops.pallas_spmv_df import stencil_spmv_pallas_df

    print(f"# device={jax.devices()[0]} n={n}{et}", flush=True)
    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, et == "q", "z")
    mesh, _, _ = generate(p)
    sys0 = LargeShellSystem(mesh, MAT, dtype=jnp.float32)
    pair, _ = sys0.assemble_df(layout="tiled", with_diag=True, method="grid")
    offsets = tuple(int(o) for o in sys0.offsets)
    npad = sys0.pattern.n_pad
    k = len(offsets)

    rng = np.random.default_rng(0)
    x64 = rng.standard_normal((6, npad))
    x0 = df_from_f64(jnp.asarray(x64))

    pair_bytes = pair.hi.size * 4 * 2
    true_bytes = pair_bytes + (x0.hi.size * 4 * 2) * 2  # + x read + y write

    for label, kw in (
        ("renorm/tps1", {"tps": 1}),
        ("renorm/tps2", {"tps": 2}),
        ("kahan/tps2", {"kahan": True, "tps": 2}),
        ("renorm/tps4", {"tps": 4}),
    ):
        @jax.jit
        def chain(vh, vl, x):
            def body(i, c):
                y = stencil_spmv_pallas_df(vh, vl, c, offsets, **kw)
                s = jnp.max(jnp.abs(y.hi))
                return DF(y.hi / s, y.lo / s)

            y = jax.lax.fori_loop(0, ITERS, body, x)
            return jnp.sum(y.hi)

        float(chain(pair.hi, pair.lo, x0))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(pair.hi, pair.lo, x0))
            ts.append((time.perf_counter() - t0) / ITERS)
        dt = min(ts)
        print(f"# {label:8s} {dt * 1e3:8.3f} ms  pair-only "
              f"{pair_bytes / dt / 1e9:6.1f} GB/s  true-bytes "
              f"{true_bytes / dt / 1e9:6.1f} GB/s", flush=True)

    # accuracy: kahan vs renorm vs f64 XLA oracle on one matvec
    with jax.default_matmul_precision("highest"):
        y_ren = stencil_spmv_pallas_df(pair.hi, pair.lo, x0, offsets)
        y_kah = stencil_spmv_pallas_df(pair.hi, pair.lo, x0, offsets, kahan=True)
        from fem_shell_tpu.ops.assemble_grid import untile_values

        flat = DF(untile_values(pair.hi), untile_values(pair.lo))
        v64 = flat.hi.astype(jnp.float64) + flat.lo.astype(jnp.float64)
        y64 = np.zeros((6, npad))
        v4 = np.asarray(v64).reshape(6, 6, k, npad)
        for s, off in enumerate(offsets):
            xs = np.roll(x64, -off, axis=1)
            y64 += np.einsum("abn,bn->an", v4[:, :, s, :], xs)
        # rolled wrap entries correspond to zero operator values; compare
        # on the interior where the stencil stays in range
        sl = slice(2 * (n + 1), npad - 2 * (n + 1))
        scale = np.abs(y64[:, sl]).max()
        for lbl, y in (("renorm", y_ren), ("kahan", y_kah)):
            yv = np.asarray(df_to_f64(y))
            err = np.abs(yv[:, sl] - y64[:, sl]).max() / scale
            print(f"# accuracy {lbl:8s}: max rel err vs f64 oracle {err:.3e}",
                  flush=True)


if __name__ == "__main__":
    main()
