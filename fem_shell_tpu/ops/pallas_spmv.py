"""Pallas TPU kernel: gather-free stencil block-SpMV (2D-tiled).

Computes y = A x for the SoA stencil operator (ops/soa.py):
  values [36, K, Npad]  (6x6 blocks per stencil offset, nodes on lanes)
  x, y   [6, Npad]

Why a custom kernel: the XLA fallback evaluates the K offsets as separate
fused passes (re-reading/writing y per slot, and paying a lane-rotate
relayout per shift), reaching ~15-20% of HBM bandwidth. Vectors shaped
[6, N] also leave 3/4 of the VPU sublanes idle.

Kernel layout: the node axis is split as (rows, 128 lanes), so every
operand is a full (8,128)-tiled 2D block:
  values2 [36, K, NR, 128]      x2 [6, HR + NR + HR, 128] (halo rows)
A stencil shift by ``off`` becomes two *static* slices of the haloed x
window — rows [q, q+R) lanes [m, 128) concatenated with rows [q+1, q+R+1)
lanes [0, m) where q, m = divmod(off + HR*128, 128) — i.e. pure
register-level data movement, no gather, no relayout. The whole
contraction is ONE pass over values at streaming bandwidth.

f32 (TPU f64 is an XLA-level emulation unavailable inside Pallas); the
f64 path keeps the XLA implementation.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _z():
    """int32 zero for BlockSpec index maps: python literals become i64
    under jax_enable_x64 and the remote Mosaic AOT rejects the mixed
    (i64, i32) index tuple ("failed to legalize func.return")."""
    return jnp.int32(0)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(offsets, r_tile, hr, x_hbm, values_ref, out_ref, x_vmem, sem):
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    win_rows = r_tile + 2 * hr
    # NB: i % 2 with a python literal promotes to int64 under jax_enable_x64
    # — Mosaic's 64-bit convert helper then recurses forever at lowering.
    two = jnp.int32(2)

    # double-buffered x-window DMA: wait on this tile's copy (started by the
    # previous iteration), then prefetch the next tile's window so its
    # latency hides behind this tile's compute + values fetch.
    def window_dma(slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(tile * r_tile, win_rows), :],
            x_vmem.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        window_dma(jnp.int32(0), 0).start()

    cur = jax.lax.rem(i, two)
    nxt = jax.lax.rem(i + 1, two)

    @pl.when(i + 1 < n_tiles)
    def _():
        window_dma(nxt, i + 1).start()

    window_dma(cur, i).wait()

    # shifted x windows per offset: a lane-rotate of two adjacent row
    # slabs + lane select (Mosaic cannot concat lane-offset slices)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, r_tile, LANES), 2)
    xs = {}
    for s, off in enumerate(offsets):
        q, m = divmod(off + hr * LANES, LANES)
        if m == 0:
            slab = x_vmem[cur, :, q : q + r_tile, :]
        else:
            a_rows = pltpu.roll(x_vmem[cur, :, q : q + r_tile, :], jnp.int32(LANES - m), 2)
            b_rows = pltpu.roll(x_vmem[cur, :, q + 1 : q + 1 + r_tile, :], jnp.int32(LANES - m), 2)
            slab = jnp.where(lane < LANES - m, a_rows, b_rows)
        for b in range(6):
            xs[(s, b)] = slab[b]

    for a in range(6):
        acc = jnp.zeros((r_tile, LANES), out_ref.dtype)
        for s in range(len(offsets)):
            for b in range(6):
                acc = acc + values_ref[a * 6 + b, s, :, :] * xs[(s, b)]
        out_ref[a, :, :] = acc


def stencil_spmv_pallas(values, x, offsets: Sequence[int], r_tile: int = 32, interpret: bool = False):
    """y = A x. ``values`` [36,K,Npad] f32, ``x`` [6,Npad] f32, ``offsets``
    static ints (ascending). Npad must be a multiple of 128.
    ``interpret=True`` runs the kernel in the Pallas TPU interpreter
    (CPU-hosted correctness tests, tests/test_pallas_spmv.py)."""
    k, npad = values.shape[1], values.shape[2]
    offsets = tuple(int(o) for o in offsets)
    assert len(offsets) == k and npad % LANES == 0
    nr = npad // LANES
    # tile rows: a multiple of 8 dividing nr (build_soa_pattern pads Npad
    # to 1024 = 8*128 so such a tile always exists), capped at r_tile
    best = None
    t = 8
    while t <= min(r_tile, nr):
        if nr % t == 0:
            best = t
        t += 8
    if best is None:
        if nr % 8:
            raise ValueError(f"Npad/128 = {nr} not a multiple of 8; rebuild the pattern with pad_to=1024")
        best = nr  # whole-array tile
    r_tile = best
    halo = max(abs(offsets[0]), abs(offsets[-1]))
    hr = _ceil_to(_ceil_to(halo, LANES) // LANES + 1, 8)

    values2 = values.reshape(36, k, nr, LANES)
    x2 = x.reshape(6, nr, LANES)
    x2 = jnp.pad(x2, ((0, 2), (hr, hr), (0, 0)))  # 8 sublane-dof rows + halo rows

    grid = (nr // r_tile,)
    kernel = functools.partial(_kernel, offsets, r_tile, hr)
    y2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x2 stays in HBM, DMA'd manually
            pl.BlockSpec(
                (36, k, r_tile, LANES), lambda i: (_z(), _z(), i, _z()), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (6, r_tile, LANES), lambda i: (_z(), i, _z()), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((6, nr, LANES), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 8, r_tile + 2 * hr, LANES), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x2, values2)
    return y2.reshape(6, npad)


def pick_tile(npad: int, max_tile: int = 8192, multiple: int = 128) -> int:
    """Kept for API compatibility with the row-vector prototype."""
    t = min(max_tile, npad)
    t -= t % multiple
    while t > multiple and npad % t:
        t -= multiple
    return max(t, multiple) if npad % max(t, multiple) == 0 else multiple


# ----------------------------------------------------------------------
# tile-contiguous variant: values pre-permuted so each grid step streams
# ONE contiguous block (the [36,K,r,128] slices of the plain layout are 324
# strided segments per tile, which caps the pipeline well below HBM peak).
# The permutation costs one pass over values — amortized over all CG
# iterations by calling prepare_tiled_values() once per assembly.
# ----------------------------------------------------------------------


def choose_r_tile(npad: int, r_tile: int = 32) -> int:
    nr = npad // LANES
    best = None
    t = 8
    while t <= min(r_tile, nr):
        if nr % t == 0:
            best = t
        t += 8
    if best is None:
        if nr % 8:
            raise ValueError(f"Npad/128 = {nr} not a multiple of 8")
        best = nr
    return best


def prepare_tiled_values(values, r_tile: int = 32):
    """[36, K, Npad] -> ([ntiles, 36*K, r, 128], r) tile-major contiguous."""
    k, npad = values.shape[1], values.shape[2]
    r = choose_r_tile(npad, r_tile)
    nr = npad // LANES
    v = values.reshape(36 * k, nr // r, r, LANES)
    return jnp.transpose(v, (1, 0, 2, 3)), r


def _kernel_tiled(offsets, k, r_tile, hr, x_hbm, values_ref, out_ref, x_vmem, sem):
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    win_rows = r_tile + 2 * hr
    two = jnp.int32(2)  # see _kernel: avoid int64 promotion under x64

    def window_dma(slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(tile * r_tile, win_rows), :],
            x_vmem.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        window_dma(jnp.int32(0), 0).start()

    cur = jax.lax.rem(i, two)

    @pl.when(i + 1 < n_tiles)
    def _():
        window_dma(jax.lax.rem(i + 1, two), i + 1).start()

    window_dma(cur, i).wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, r_tile, LANES), 2)
    slabs = []
    for s, off in enumerate(offsets):
        q, m = divmod(off + hr * LANES, LANES)
        if m == 0:
            slabs.append(x_vmem[cur, :, q : q + r_tile, :])
        else:
            a_rows = pltpu.roll(x_vmem[cur, :, q : q + r_tile, :], jnp.int32(LANES - m), 2)
            b_rows = pltpu.roll(x_vmem[cur, :, q + 1 : q + 1 + r_tile, :], jnp.int32(LANES - m), 2)
            slabs.append(jnp.where(lane < LANES - m, a_rows, b_rows))

    for a in range(6):
        acc = jnp.zeros((r_tile, LANES), out_ref.dtype)
        for s in range(len(offsets)):
            slab = slabs[s]
            for b in range(6):
                acc = acc + values_ref[0, (a * 6 + b) * k + s, :, :] * slab[b]
        out_ref[a, :, :] = acc


def stencil_spmv_pallas_tiled(values_tiled, x, offsets: Sequence[int], interpret: bool = False):
    """y = A x with tile-major values from prepare_tiled_values()."""
    ntiles, rows36k, r_tile, _ = values_tiled.shape
    offsets = tuple(int(o) for o in offsets)
    k = len(offsets)
    assert rows36k == 36 * k
    npad = ntiles * r_tile * LANES
    nr = npad // LANES
    halo = max(abs(offsets[0]), abs(offsets[-1]))
    hr = _ceil_to(_ceil_to(halo, LANES) // LANES + 1, 8)

    x2 = x.reshape(6, nr, LANES)
    x2 = jnp.pad(x2, ((0, 2), (hr, hr), (0, 0)))

    kernel = functools.partial(_kernel_tiled, offsets, k, r_tile, hr)
    y2 = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, 36 * k, r_tile, LANES),
                lambda i: (i, _z(), _z(), _z()),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (6, r_tile, LANES), lambda i: (_z(), i, _z()), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((6, nr, LANES), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 8, r_tile + 2 * hr, LANES), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x2, values_tiled)
    return y2.reshape(6, npad)
