"""Pallas TPU kernel: gather-free stencil block-SpMV.

Computes y = A x for the SoA stencil operator (ops/soa.py):
  values [36, K, Npad]  (6x6 blocks per stencil offset, nodes on lanes)
  x, y   [6, Npad]

The XLA fallback evaluates the K offset shifts as separate fused loops,
re-reading x and re-writing y per slot (~15% of HBM peak). This kernel
makes the whole contraction ONE pass: the grid tiles the node axis; per
tile the kernel holds a haloed x window in VMEM (manually DMA'd from HBM,
since halo windows overlap and BlockSpec blocks cannot) and accumulates
all K offsets x 36 block entries on the VPU while the values tile streams
through the pipeline. Traffic = values once + x once (+halo) + y once,
i.e. the bandwidth roofline for this operator.

f32 only (TPU f64 is an XLA-level emulation not available inside Pallas);
the f64 path keeps the XLA implementation.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(offsets: Tuple[int, ...], tile: int, halo_lo: int, width: int,
            x_hbm_ref, values_ref, out_ref, x_vmem, sem):
    i = pl.program_id(0)
    # DMA the haloed x window for this tile: columns [i*tile, i*tile+width)
    # of the padded x (padding absorbs the negative offsets).
    dma = pltpu.make_async_copy(
        x_hbm_ref.at[:, pl.ds(i * tile, width)], x_vmem, sem
    )
    dma.start()
    dma.wait()
    for a in range(6):  # static unrolled: per output row, one accumulator
        row = jnp.zeros((tile,), out_ref.dtype)
        for s, off in enumerate(offsets):
            start = off + halo_lo  # static slice into the haloed window
            for b in range(6):
                row = row + values_ref[a * 6 + b, s, :] * x_vmem[b, start : start + tile]
        out_ref[a, :] = row  # x_vmem row 6-7 are sublane padding (unused)


def stencil_spmv_pallas(values, x, offsets: Sequence[int], tile: int = 4096):
    """y = A x. ``values`` [36,K,Npad] f32, ``x`` [6,Npad] f32,
    ``offsets`` static ints (ascending)."""
    k, npad = values.shape[1], values.shape[2]
    offsets = tuple(int(o) for o in offsets)
    assert len(offsets) == k
    halo_lo = -min(0, offsets[0])
    halo_hi = max(0, offsets[-1])
    width = tile + halo_lo + halo_hi
    width += (-width) % 128  # DMA slices must be lane-aligned (128)
    assert npad % tile == 0, (npad, tile)
    # pad x: lanes on both sides so every window read is in bounds (right
    # padding absorbs the lane alignment), and to 8 sublanes so the manual
    # DMA slice meets the (8,128) tiling rule
    x_padded = jnp.pad(x, ((0, 2), (halo_lo, width - tile - halo_lo)))

    grid = (npad // tile,)
    kernel = functools.partial(_kernel, offsets, tile, halo_lo, width)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM, DMA'd manually
            pl.BlockSpec((36, k, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((6, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((6, npad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, width), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(x_padded, values)


def pick_tile(npad: int, max_tile: int = 8192, multiple: int = 128) -> int:
    """Largest tile <= max_tile that divides npad (npad is a multiple of 128)."""
    t = min(max_tile, npad)
    t -= t % multiple
    while t > multiple and npad % t:
        t -= multiple
    return max(t, multiple) if npad % max(t, multiple) == 0 else multiple
