"""A/B the pad-layout class kernels across row_mult (grid rows batched
per Pallas grid step) on the real TPU — r3 follow-up to the 3.6 ms
f32 matvec vs ~0.9 ms roofline gap (per-step pipeline overhead).

Times, per row_mult: f32 pad matvec, df pad matvec, and a 3-sweep
jacobi smoother chain — the building blocks of every production
V-cycle iteration at the class-operator scale.

Run STANDALONE: nohup python tools/pad_rowmult_probe.py > /tmp/pad_rowmult.log 2>&1 &
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

MAT = Material(nu=0.3, em=1e7, thickness=0.5)
ITERS = 20


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    et = sys.argv[2] if len(sys.argv) > 2 else "t"
    from fem_shell_tpu.large import LargeShellSystem
    from fem_shell_tpu.meshgen import MeshGenParams, generate
    from fem_shell_tpu.ops.class_matvec import build_class_parts
    from fem_shell_tpu.ops.df import DF
    from fem_shell_tpu.ops.exact_stencil import build_exact_stencil
    from fem_shell_tpu.ops.pallas_class import (
        _PadGridSpec,
        class_matvec_df_pad,
        class_matvec_f32_pad,
        class_smooth_f32_pad,
        pad_core,
        pad_ring_mask,
        to_pad_grid,
    )

    print(f"# device={jax.devices()[0]} n={n}{et}", flush=True)
    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2,
                      et == "q", "z")
    mesh, _, _ = generate(p)
    sys0 = LargeShellSystem(mesh, MAT, dtype=jnp.float32)
    st = build_exact_stencil(mesh, MAT, sys0.offsets)
    cp, diag = build_class_parts(st, sys0.pattern.n_pad)
    nyp = nxp = n + 1
    rng = np.random.default_rng(0)
    xf = jnp.asarray(rng.standard_normal((6, sys0.pattern.n_pad)), jnp.float32)

    def timed(label, fn, x0):
        @jax.jit
        def chain(c):
            for _ in range(ITERS):
                c = fn(c)
            return jnp.sum(c)

        float(chain(x0))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(x0))
            ts.append((time.perf_counter() - t0) / ITERS)
        print(f"# {label:28s} {min(ts) * 1e3:8.3f} ms", flush=True)

    for rm in (1, 2, 4, 8):
        pg = _PadGridSpec(nyp, nxp, rm)
        steps = pg.nr // pg.r_tile
        x2 = to_pad_grid(pg, xf)
        ring = pad_ring_mask(pg)
        b_c = pad_core(pg, to_pad_grid(pg, xf))
        wd_c = jnp.abs(b_c) * 1e-3  # small positive damping: bounded chain

        def mv32(c):
            y = class_matvec_f32_pad(cp, pg, c)
            # embed back so the chain can iterate (compact -> carry)
            buf = jnp.zeros_like(c)
            return buf.at[:6, pg.hr : pg.hr + pg.nr, :].set(
                y / jnp.max(jnp.abs(y))
            )

        def smooth3(c):
            return class_smooth_f32_pad(cp, pg, c, b_c, wd_c, 3)

        timed(f"rm{rm}({steps}steps) f32 matvec", mv32, x2)
        timed(f"rm{rm}({steps}steps) smooth3", smooth3, x2)

        def mvdf(c):
            y = class_matvec_df_pad(cp, pg, DF(c, jnp.zeros_like(c)), ring)
            buf = jnp.zeros_like(c)
            return buf.at[:6, pg.hr : pg.hr + pg.nr, :].set(
                y.hi / jnp.max(jnp.abs(y.hi))
            )

        timed(f"rm{rm}({steps}steps) df matvec", mvdf, x2)


if __name__ == "__main__":
    main()
