"""Speed probe: df-interpreted element kernels on the real TPU.

Measures Melem/s of the two-float32 (df) quad/tri stiffness kernels
(ops/dfk.py jaxpr re-execution, elements on lanes) vs the emulated-f64
baseline of 0.015 Melem/s.

Run: nohup python tools/dfk_probe.py [n_elem] [chunk] > /tmp/dfk_probe.log 2>&1 &
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
from fem_shell_tpu.ops.dfk import DF, d_from_f64, df_function
from fem_shell_tpu.ops.elements import quad_shell_stiffness, tri_shell_stiffness


def main():
    n_elem = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    print(f"device={jax.devices()[0]}  n_elem={n_elem}  chunk={chunk}", flush=True)
    mat = Material(nu=0.3, em=1e7, thickness=0.5)
    dm, dp = (np.asarray(a, np.float64) for a in mat.matrices())
    rng = np.random.default_rng(0)

    for name, fn, m in [("quad", quad_shell_stiffness, 4), ("tri", tri_shell_stiffness, 3)]:
        corners = (
            np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float64)
            if m == 4
            else np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
        )
        xyz = (
            rng.normal(size=(n_elem, 1, 3)) * 5
            + corners[None]
            + 0.05 * rng.normal(size=(n_elem, m, 3))
        )
        xyz_t = np.ascontiguousarray(np.transpose(xyz, (1, 2, 0)))  # [m,3,E]
        xh = jnp.asarray(xyz_t.astype(np.float32))
        xl = jnp.asarray((xyz_t - xyz_t.astype(np.float32)).astype(np.float32))

        f = jax.vmap(
            lambda p: fn(p, jnp.asarray(dm), jnp.asarray(dp), 0.5),
            in_axes=2,
            out_axes=2,
        )
        dfn = df_function(f)

        n_chunks = n_elem // chunk

        @jax.jit
        def run(xh, xl):
            def body(carry, c):
                ke, = dfn(DF(c[0], c[1]))
                return carry + jnp.sum(ke.hi[0, 0]) + jnp.sum(ke.lo[0, 0]), None

            xs = jnp.stack(
                [
                    xh.reshape(m, 3, n_chunks, chunk).transpose(2, 0, 1, 3),
                    xl.reshape(m, 3, n_chunks, chunk).transpose(2, 0, 1, 3),
                ],
                axis=1,
            )
            s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
            return s

        with jax.default_matmul_precision("highest"):
            t0 = time.perf_counter()
            r = float(run(xh, xl))
            print(f"{name}: compile+first {time.perf_counter() - t0:.1f} s   [{r:.3e}]", flush=True)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                r = float(run(xh, xl))
                ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"{name} df kernels: {t:.3f} s  ->  {n_elem / t / 1e6:.3f} Melem/s", flush=True)


if __name__ == "__main__":
    main()
