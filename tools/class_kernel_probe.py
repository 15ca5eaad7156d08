"""Probe: class-table matvec kernel variants on the real TPU.

The fine-level class matvec is both the CG operator (df, 12.8 ms at
1024^2) and the level-0 smoother operator (f32, 4.7 ms) — together ~80%
of solve time. Vector-streaming roofline is ~0.15 ms (x + y traffic
only), so there is >10x on the table. Variants:

f32 (smoother contract — any faithful f32 evaluation is valid):
  pallas   — current ops/pallas_class.py interior kernel
  conv     — lax.conv_general_dilated 6->6 channels, 3x3 (MXU)
  shiftmm  — stack 9 shifted copies -> one [6,54]x[54,N] dot (MXU)
  xla      — current XLA fallback path (slice+broadcast FMA chain)

df (CG-operator contract — entrywise ~2^-45-class accumulation):
  pallas   — current EFT kernel
  conv3    — hi*hi via conv + (hi*lo + lo*hi) via conv, Dekker error of
             the main product dropped: NOT accuracy-valid, measured only
             to bound what MXU structure would buy.

Run STANDALONE: nohup python tools/class_kernel_probe.py 1024 t > /tmp/class_probe.log 2>&1 &
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
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate

MAT = Material(nu=0.3, em=1e7, thickness=0.5)
ITERS = 30


def timed(label, fn, *args):
    @jax.jit
    def chain(*a):
        def body(i, c):
            y = fn(*a[:-1], c)
            s = jnp.max(jnp.abs(y[0] if isinstance(y, tuple) else y)) + 1e-30
            if isinstance(y, tuple):
                return tuple(t / s for t in y)
            return y / s

        y = jax.lax.fori_loop(0, ITERS, body, a[-1])
        return jnp.sum(y[0] if isinstance(y, tuple) else y)

    try:
        float(chain(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(*args))
            ts.append((time.perf_counter() - t0) / ITERS * 1e3)
        print(f"# {label:28s} {min(ts):8.3f} ms", flush=True)
        return min(ts)
    except Exception as e:
        print(f"# {label:28s} FAILED {type(e).__name__}: {e}", flush=True)
        return None


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    et = sys.argv[2] if len(sys.argv) > 2 else "t"
    print(f"# device={jax.devices()[0]} n={n} et={et}", flush=True)

    from fem_shell_tpu.large import LargeShellSystem
    from fem_shell_tpu.mg import detect_structured_grid
    from fem_shell_tpu.ops.class_matvec import build_class_parts, class_matvec_df, class_matvec_f32
    from fem_shell_tpu.ops.df import DF
    from fem_shell_tpu.ops.exact_stencil import build_exact_stencil

    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, et == "q", "z")
    mesh, rows, fac = generate(p)
    sys_l = LargeShellSystem(mesh, MAT, dtype=jnp.float32)
    grid = detect_structured_grid(mesh)
    st = build_exact_stencil(mesh, MAT, sys_l.offsets, grid=grid)
    cp, diag = build_class_parts(st, sys_l.pattern.n_pad)
    npad = sys_l.pattern.n_pad
    nyp, nxp = grid.nyp, grid.nxp
    nf = nyp * nxp
    print(f"# nodes={nf} npad={npad} K={len(cp.offs2d)} nz={len(cp.nzmask)}",
          flush=True)

    x0 = jnp.zeros((6, npad), jnp.float32) + 1e-3
    x0df = DF(x0, x0 * 1e-8)

    # roofline reference: y = x * c streamed once
    timed("stream(y=2x) [6,npad]", lambda c: c * 2.0, x0)

    # ---- f32 variants -------------------------------------------------
    timed("f32/pallas(current)", lambda c: class_matvec_f32(cp, c), x0)
    timed("f32/xla", lambda c: class_matvec_f32(cp, c, use_pallas=False), x0)

    # conv: wrap-pad grid, 6->6 channel 3x3 conv on the MXU
    kern = np.zeros((6, 6, 3, 3), np.float32)  # [O, I, KH, KW]
    for s, (dy, dx) in enumerate(cp.offs2d):
        kern[:, :, dy + 1, dx + 1] += np.asarray(cp.ih)[s]
    kern_j = jnp.asarray(kern)
    dn = lax.conv_dimension_numbers((1, 6, nyp + 2, nxp + 2), kern.shape,
                                    ("NCHW", "OIHW", "NCHW"))

    def conv_f32(kj, c):
        xg = c[:, :nf].reshape(6, nyp, nxp)
        xp = jnp.pad(xg, ((0, 0), (1, 1), (1, 1)), mode="wrap")[None]
        y = lax.conv_general_dilated(
            xp, kj, (1, 1), "VALID", dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )[0]
        return jnp.pad(y.reshape(6, nf), ((0, 0), (0, npad - nf)))

    with jax.default_matmul_precision("highest"):
        timed("f32/conv-highest", conv_f32, kern_j, x0)
    timed("f32/conv-default", conv_f32, kern_j, x0)

    # shifted-matmul: [54, N] stack -> [6,54] @ [54,N]
    cmat = np.zeros((6, 6 * len(cp.offs2d)), np.float32)
    for s in range(len(cp.offs2d)):
        cmat[:, s * 6 : (s + 1) * 6] = np.asarray(cp.ih)[s]
    cmat_j = jnp.asarray(cmat)

    def shiftmm(cj, c):
        xg = c[:, :nf].reshape(6, nyp, nxp)
        xp = jnp.pad(xg, ((0, 0), (1, 1), (1, 1)), mode="wrap")
        slabs = [
            lax.slice(xp, (0, 1 + dy, 1 + dx), (6, 1 + dy + nyp, 1 + dx + nxp))
            for dy, dx in cp.offs2d
        ]
        xs = jnp.concatenate(slabs, axis=0).reshape(6 * len(cp.offs2d), nf)
        y = jnp.dot(cj, xs, preferred_element_type=jnp.float32)
        return jnp.pad(y, ((0, 0), (0, npad - nf)))

    with jax.default_matmul_precision("highest"):
        timed("f32/shiftmm-highest", shiftmm, cmat_j, x0)
    timed("f32/shiftmm-default", shiftmm, cmat_j, x0)

    # ---- df variants --------------------------------------------------
    def dfmv(c):
        y = class_matvec_df(cp, c)
        return (y.hi, y.lo)

    timed("df/pallas(current)", lambda c: dfmv(DF(c[0], c[1])), (x0df.hi, x0df.lo))

    # conv3: structure-only probe (accuracy NOT valid — no Dekker error)
    def conv3(kj, c):
        h = conv_f32(kj, c[0])
        l = conv_f32(kj, c[1])
        return (h, l + (h - h))

    with jax.default_matmul_precision("highest"):
        timed("df/conv3-structure", conv3, kern_j, (x0df.hi, x0df.lo))

    # wrapper-vs-kernel split: time the raw pallas_call on a PRE-BUILT
    # padded input (isolates the pad/reshape/unpad wrapper copies)
    try:
        from fem_shell_tpu.ops import pallas_class as pc_mod

        pyp, pxp = nyp + 2, nxp + 2
        pxq = -(-pxp // 128) * 128
        nf2 = pyp * pxq
        offs_flat = tuple(int(dy) * pxq + int(dx) for dy, dx in cp.offs2d)
        npad2, nr2, r_tile, hr = pc_mod._grid_params(nf2, offs_flat)
        x2 = jnp.zeros((8, nr2 + 2 * hr, 128), jnp.float32) + 1e-3

        import functools as ft

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        ctab = jnp.stack([
            jnp.transpose(cp.ih, (1, 2, 0)).reshape(36, len(offs_flat)),
            jnp.zeros((36, len(offs_flat)), jnp.float32),
        ])
        kern_fn = ft.partial(pc_mod._kernel, offs_flat, len(offs_flat), r_tile,
                             hr, tuple(sorted(cp.nzmask)), False)

        def raw_call(x2_, ctab_):
            return pl.pallas_call(
                kern_fn,
                grid=(nr2 // r_tile,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec((2, 36, len(offs_flat)),
                                 lambda i: (pc_mod._z(), pc_mod._z(), pc_mod._z()),
                                 memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, 6, r_tile, 128),
                    lambda i: (pc_mod._z(), pc_mod._z(), i, pc_mod._z()),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((1, 6, nr2, 128), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((2, 8, r_tile + 2 * hr, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )(x2_, ctab_)

        @jax.jit
        def raw_chain(x2_, ctab_):
            def body(i, c):
                y = raw_call(c, ctab_)[0]  # [6, nr2, 128]
                s = jnp.max(jnp.abs(y)) + 1e-30
                c = c.at[:6, hr:hr + nr2, :].set(y / s)
                return c

            return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x2_))

        float(raw_chain(x2, ctab))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(raw_chain(x2, ctab))
            ts.append((time.perf_counter() - t0) / ITERS * 1e3)
        print(f"# f32/raw-kernel-only          {min(ts):8.3f} ms", flush=True)
    except Exception as e:
        print(f"# f32/raw-kernel-only FAILED {type(e).__name__}: {e}", flush=True)

    # per-op floor probe: tiny-level matvec chained 100x
    small = jnp.zeros((6, 33 * 33), jnp.float32) + 1e-3

    @jax.jit
    def tiny_chain(c):
        def body(i, v):
            return v * 1.000001 + 1e-9

        return jnp.sum(jax.lax.fori_loop(0, 1000, body, c))

    float(tiny_chain(small))
    t0 = time.perf_counter()
    float(tiny_chain(small))
    print(f"# tiny-op floor: {(time.perf_counter() - t0) / 1000 * 1e3:8.4f} ms/op",
          flush=True)


if __name__ == "__main__":
    main()
