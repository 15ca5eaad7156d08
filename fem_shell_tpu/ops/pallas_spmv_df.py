"""Pallas TPU kernel: df (two-float32) stencil block-SpMV.

The outer CG loop of the production MG-df solver does ONE df matvec per
iteration over the [36K, Npad] hi/lo operator pair (ops/df.py:
df_stencil_matvec). The XLA implementation measures ~69 GB/s on v5e —
every error-free transform is wrapped in optimization_barrier, which is
an HLO fusion boundary, so the contraction shatters into hundreds of
small passes. Inside a Pallas kernel the EFT sequences compile to
straight-line Mosaic vector code with VMEM-resident intermediates: one
streaming pass over the pair.

Layout mirrors ops/pallas_spmv.py's tile-contiguous variant, with hi
and lo as SEPARATE tile-major arrays [ntiles, 36K, r, 128]
(prepare_tiled_values_df) — the hi array then doubles as the f32
V-cycle smoother's operator (stencil_spmv_pallas_tiled) with no
relayout or copy. x is carried as hi/lo stacked [16, nr+2hr, 128]
halo-padded rows.

Accumulation is full df: Dekker two_prod per hi*hi term, cross terms
folded into the error channel, renormalized two_sum add per term —
identical error behavior to the XLA path (parity-tested in interpret
mode and on device; a toolchain that started FMA-contracting across the
EFT expressions would fail those tests immediately).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fem_shell_tpu.ops.df import DF
from fem_shell_tpu.ops.pallas_spmv import LANES, _ceil_to, choose_r_tile

# numpy scalar, NOT a jax array: pallas_call rejects captured tracers
_SPLIT = np.float32(4097.0)


def _z():
    """int32 zero for BlockSpec index maps: python literals become i64
    under jax_enable_x64 and the remote Mosaic AOT rejects the mixed
    (i64, i32) index tuple ("failed to legalize func.return")."""
    return jnp.int32(0)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _two_prod(a, b):
    p = a * b
    c = _SPLIT * a
    ah = c - (c - a)
    al = a - ah
    d = _SPLIT * b
    bh = d - (d - b)
    bl = b - bh
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def prepare_tiled_values_df(values: DF, r_tile: int = 8) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """(hi, lo) flat [36K, Npad] -> two tile-major [ntiles, 36K, r, 128]
    arrays + r. hi_tiled is directly usable by stencil_spmv_pallas_tiled."""
    rows36k, npad = values.hi.shape
    r = choose_r_tile(npad, r_tile)
    nr = npad // LANES

    def tile(v):
        return jnp.transpose(v.reshape(rows36k, nr // r, r, LANES), (1, 0, 2, 3))

    return tile(values.hi), tile(values.lo), r


def _acc4_add(acc, big, mids, small):
    """4-level compensated accumulation: every drop is ~2^-72 of the
    largest partial magnitude (vs ~2^-48 for the plain df renorm add) —
    the accumulator behind the tf (compensated) SpMV used by
    iterative-refinement residuals (ops/exact_stencil.py error budget).

    ``mids`` is a TUPLE of ~2^-24-level terms, each folded in with its
    own exact two_sum — pre-adding them in plain f32 would round at
    2^-48 of the term scale and silently degrade tf back to plain-df
    accuracy (measured: 3.1e-5 vs 4.5e-5 abs error at 512^2 before this
    was split out)."""
    a0, a1, a2, a3 = acc
    s0, c0 = _two_sum(a0, big)
    s1, c1 = _two_sum(a1, c0)
    lo = small
    for m in mids:
        s1, cm = _two_sum(s1, m)
        lo = lo + cm
    s2, c3 = _two_sum(a2, lo + c1)
    return (s0, s1, s2, a3 + c3)


def _kernel(offsets, k, r_tile, hr, x_hbm, vh_ref, vl_ref, out_ref, x_vmem, sem, tiled=True, tf=False, kahan=False, tps=1):
    """``tps`` (tiled mode): value tiles processed per grid step —
    batching amortizes the per-step pipeline overhead that capped the
    1-tile kernel at ~53% of HBM bandwidth (r3 probe)."""
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    pay = tps * r_tile  # payload rows per grid step
    win_rows = pay + 2 * hr
    two = jnp.int32(2)  # avoid int64 promotion under x64 (see pallas_spmv.py)

    def window_dma(slot, step):
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(step * pay, win_rows), :],
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

    # shifted x windows (hi rows 0..5, lo rows 8..13 of the 16-sublane pad)
    lane = jax.lax.broadcasted_iota(jnp.int32, (16, pay, LANES), 2)
    slabs = []
    for s, off in enumerate(offsets):
        q, m = divmod(off + hr * LANES, LANES)
        if m == 0:
            slabs.append(x_vmem[cur, :, q : q + pay, :])
        else:
            a_rows = pltpu.roll(
                x_vmem[cur, :, q : q + pay, :], jnp.int32(LANES - m), 2
            )
            b_rows = pltpu.roll(
                x_vmem[cur, :, q + 1 : q + 1 + pay, :], jnp.int32(LANES - m), 2
            )
            slabs.append(jnp.where(lane < LANES - m, a_rows, b_rows))

    for t in range(tps):
        rsl = slice(t * r_tile, (t + 1) * r_tile)
        for a in range(6):
            if tf:
                z = jnp.zeros((r_tile, LANES), jnp.float32)
                acc = (z, z, z, z)
            else:
                acc_h = jnp.zeros((r_tile, LANES), jnp.float32)
                acc_l = jnp.zeros((r_tile, LANES), jnp.float32)
            for s in range(len(offsets)):
                slab = slabs[s]
                for b in range(6):
                    if tiled:
                        vh = vh_ref[t, (a * 6 + b) * k + s, :, :]
                        vl = vl_ref[t, (a * 6 + b) * k + s, :, :]
                    else:
                        vh = vh_ref[(a * 6 + b) * k + s, rsl, :]
                        vl = vl_ref[(a * 6 + b) * k + s, rsl, :]
                    xh = slab[b, rsl, :]
                    xl = slab[8 + b, rsl, :]
                    if tf:
                        # every f32xf32 product pair is Dekker-exact; only
                        # vl*xl (2^-48-level) stays plain
                        p0, e0 = _two_prod(vh, xh)
                        p1, e1 = _two_prod(vh, xl)
                        p2, e2 = _two_prod(vl, xh)
                        p3 = vl * xl
                        acc = _acc4_add(acc, p0, (e0, p1, p2), (e1 + e2) + p3)
                        continue
                    p, pe = _two_prod(vh, xh)
                    pe = pe + (vh * xl + vl * xh)
                    if kahan:
                        # Kahan-style: exact two_sum for the main channel,
                        # plain f32 error channel (no per-term renorm). The
                        # error channel's own rounding is 2nd-order
                        # (~2^-24 of the ~2^-24-level terms) — same
                        # 2^-45-class entrywise contract, ~8 fewer VPU ops
                        # per term on the hot accumulation path.
                        sh, se = _two_sum(acc_h, p)
                        acc_h = sh
                        acc_l = acc_l + (se + pe)
                        continue
                    # renormalized df add of (p, pe) into (acc_h, acc_l)
                    sh, se = _two_sum(acc_h, p)
                    se = se + (acc_l + pe)
                    acc_h, acc_l = _two_sum(sh, se)
            if kahan and not tf:
                # one final renormalization so y is a proper df pair
                acc_h, acc_l = _two_sum(acc_h, acc_l)
            if tf:
                s0, s1, s2, s3 = acc
                h1, c1 = _two_sum(s0, s1)
                h2, c2 = _two_sum(h1, s2)
                acc_h, acc_l = _two_sum(h2, (c1 + c2) + s3)
            out_ref[0, a, rsl, :] = acc_h
            out_ref[1, a, rsl, :] = acc_l


def stencil_spmv_pallas_df(
    vh_tiled, vl_tiled, x: DF, offsets: Sequence[int], interpret: bool = False,
    tf: bool = False, kahan: bool = False, tps: int = 0,
) -> DF:
    """y = A x with A the tile-major df pair (prepare_tiled_values_df)
    and x, y df vectors [6, Npad]. ``tf=True`` switches to the 4-level
    compensated accumulator (~2^-70 accumulation error) for
    iterative-refinement residual evaluation; ``kahan=True`` uses the
    cheaper Kahan-channel accumulation (same 2^-45-class contract).
    ``tps`` = value tiles per grid step (0 = auto: 2 when the tile count
    divides — per-step pipeline overhead capped the 1-tile kernel at
    ~53% of HBM bandwidth; 2 tiles still fit the double-buffered VMEM
    budget at K<=9)."""
    ntiles, rows36k, r_tile, _ = vh_tiled.shape
    offsets = tuple(int(o) for o in offsets)
    k = len(offsets)
    assert rows36k == 36 * k and vl_tiled.shape == vh_tiled.shape
    if tps <= 0:
        tps = 2 if ntiles % 2 == 0 else 1
    if ntiles % tps:
        tps = 1
    npad = ntiles * r_tile * LANES
    nr = npad // LANES
    pay = tps * r_tile
    halo = max(abs(offsets[0]), abs(offsets[-1]))
    hr = _ceil_to(_ceil_to(halo, LANES) // LANES + 1, 8)

    # x window: [16, nr + 2hr, 128] — hi in rows 0..5, lo in rows 8..13
    def rows3(v):
        return v.reshape(6, nr, LANES)

    x2 = jnp.concatenate(
        [
            jnp.pad(rows3(x.hi), ((0, 2), (hr, hr), (0, 0))),
            jnp.pad(rows3(x.lo), ((0, 2), (hr, hr), (0, 0))),
        ],
        axis=0,
    )

    kernel = functools.partial(_kernel, offsets, k, r_tile, hr, tf=tf,
                               kahan=kahan, tps=tps)
    y2 = pl.pallas_call(
        kernel,
        grid=(ntiles // tps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (tps, 36 * k, r_tile, LANES),
                lambda i: (i, _z(), _z(), _z()),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tps, 36 * k, r_tile, LANES),
                lambda i: (i, _z(), _z(), _z()),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, 6, pay, LANES), lambda i: (_z(), _z(), i, _z()), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2, 6, nr, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 16, pay + 2 * hr, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x2, vh_tiled, vl_tiled)
    return DF(y2[0].reshape(6, npad), y2[1].reshape(6, npad))


def stencil_spmv_pallas_df_flat(
    values: DF, x: DF, offsets: Sequence[int], r_tile: int = 8, interpret: bool = False,
    tf: bool = False,
) -> DF:
    """y = A x with A the FLAT df pair [36K, Npad] — no tile-major
    relayout. The tiled variant streams one contiguous block per grid
    step; this one reads 36K strided row segments per tile, which costs
    some bandwidth but avoids materializing a second copy of the pair
    (prohibitive at the multi-million-node scale: the pair is most of
    HBM)."""
    # r_tile default 8: the df kernel streams TWO value arrays, each
    # double-buffered by the pallas pipeline — 4 x [36K, r, 128] blocks
    # must fit VMEM alongside the x window (r=24 at K=9 blew the 16 MB
    # scoped limit by 96 KB on v5e).
    rows36k, npad = values.hi.shape
    offsets = tuple(int(o) for o in offsets)
    k = len(offsets)
    assert rows36k == 36 * k and npad % LANES == 0
    r_tile = choose_r_tile(npad, r_tile)
    nr = npad // LANES
    halo = max(abs(offsets[0]), abs(offsets[-1]))
    hr = _ceil_to(_ceil_to(halo, LANES) // LANES + 1, 8)

    def rows3(v):
        return v.reshape(6, nr, LANES)

    x2 = jnp.concatenate(
        [
            jnp.pad(rows3(x.hi), ((0, 2), (hr, hr), (0, 0))),
            jnp.pad(rows3(x.lo), ((0, 2), (hr, hr), (0, 0))),
        ],
        axis=0,
    )
    vh3 = values.hi.reshape(36 * k, nr, LANES)
    vl3 = values.lo.reshape(36 * k, nr, LANES)

    kernel = functools.partial(_kernel_flat, offsets, k, r_tile, hr, tf=tf)
    y2 = pl.pallas_call(
        kernel,
        grid=(nr // r_tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (36 * k, r_tile, LANES), lambda i: (_z(), i, _z()), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (36 * k, r_tile, LANES), lambda i: (_z(), i, _z()), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, 6, r_tile, LANES), lambda i: (_z(), _z(), i, _z()), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2, 6, nr, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 16, r_tile + 2 * hr, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x2, vh3, vl3)
    return DF(y2[0].reshape(6, npad), y2[1].reshape(6, npad))


def _kernel_flat(offsets, k, r_tile, hr, x_hbm, vh_ref, vl_ref, out_ref, x_vmem, sem, tf=False):
    _kernel(offsets, k, r_tile, hr, x_hbm, vh_ref, vl_ref, out_ref, x_vmem, sem, tiled=False, tf=tf)


# ----------------------------------------------------------------------
# symmetric-storage df SpMV: stream HALF the operator
# ----------------------------------------------------------------------
#
# The shell stencil operator is symmetric: A(i, i+off) = A(i+off, i)^T,
# i.e. values[a, b, off, i] = values[b, a, -off, i+off]. The general
# kernel above streams all K slots — both matrix halves — so at the
# measured ~436 GB/s it moves 2x the bytes the matvec fundamentally
# needs. This variant stores only the off >= 0 slots (5 of 9 on quad
# grids, 4 of 7 on tri) and uses every loaded block twice:
#
#   y[i]      += S[off](i)    x[i+off]      (direct, off >= 0)
#   y[i+off]  += S[off](i)^T  x[i]          (transposed, off > 0)
#
# The transposed contribution writes FORWARD (rows up to
# ceil(off/128)+1 ahead). TPU Pallas grid steps run sequentially on the
# core and scratch persists across them, so contributions that cross
# the tile boundary are handed to the NEXT grid step through a
# persistent VMEM carry buffer — no extra HBM traffic, no second pass.
# VPU work is unchanged (each block still feeds 36 MAC terms per use);
# HBM value traffic halves, so the matvec-equivalent bandwidth
# (full-operator bytes / time) roughly doubles.


def prepare_tiled_values_df_sym(
    values: DF, offsets: Sequence[int], r_tile: int = 8
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """(hi, lo) flat [36K, Npad] -> upper-half tile-major arrays
    [ntiles, 36*ku, r, 128] keeping only the off >= 0 slots."""
    offsets = tuple(int(o) for o in offsets)
    k = len(offsets)
    rows36k, npad = values.hi.shape
    assert rows36k == 36 * k
    up = [s for s, o in enumerate(offsets) if o >= 0]
    ku = len(up)
    r = choose_r_tile(npad, r_tile)
    nr = npad // LANES

    def sel_tile(v):
        v4 = v.reshape(36, k, npad)[:, np.asarray(up), :].reshape(36 * ku, npad)
        return jnp.transpose(
            v4.reshape(36 * ku, nr // r, r, LANES), (1, 0, 2, 3)
        )

    return sel_tile(values.hi), sel_tile(values.lo), r


def _df_add(ah, al, bh, bl):
    sh, se = _two_sum(ah, bh)
    se = se + (al + bl)
    return _two_sum(sh, se)


def _kahan_add(ah, al, bh, bl):
    # exact main channel, plain error channel (no per-add renorm): the
    # error channel's own rounding is 2nd-order — same 2^-45-class
    # entrywise contract as _df_add at ~2/3 the VPU ops
    sh, se = _two_sum(ah, bh)
    return sh, al + (se + bl)


def _kernel_sym(offs_up, ku, r_tile, hr, tail, tps, kahan,
                x_hbm, vh_ref, vl_ref, out_ref, x_vmem, carry, sem):
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    pay = tps * r_tile
    win_rows = pay + hr
    two = jnp.int32(2)

    def window_dma(slot, step):
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(step * pay, win_rows), :],
            x_vmem.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        window_dma(jnp.int32(0), 0).start()
        carry[...] = jnp.zeros_like(carry)

    cur = jax.lax.rem(i, two)

    @pl.when(i + 1 < n_tiles)
    def _():
        window_dma(jax.lax.rem(i + 1, two), i + 1).start()

    window_dma(cur, i).wait()

    # x slabs shifted by +off (window row 0 = payload row 0; forward only)
    lane = jax.lax.broadcasted_iota(jnp.int32, (16, pay, LANES), 2)
    slabs = []
    for off in offs_up:
        q, m = divmod(off, LANES)
        if m == 0:
            slabs.append(x_vmem[cur, :, q : q + pay, :])
        else:
            a_rows = pltpu.roll(x_vmem[cur, :, q : q + pay, :], jnp.int32(LANES - m), 2)
            b_rows = pltpu.roll(
                x_vmem[cur, :, q + 1 : q + 1 + pay, :], jnp.int32(LANES - m), 2
            )
            slabs.append(jnp.where(lane < LANES - m, a_rows, b_rows))
    x0 = slabs[0]  # off slot 0 must be the diagonal (offs_up[0] == 0)

    lane2 = jax.lax.broadcasted_iota(jnp.int32, (r_tile, LANES), 1)

    def embed(x, lo):
        # rows [lo : lo+x.shape[0]] of a zeroed (pay+tail, LANES) field.
        # Static concatenate, NOT .at[slice].set: jnp scatter updates
        # lower to the `scatter` primitive, which Mosaic TPU rejects
        # (interpret mode masked this — r3 real-TPU lowering failure).
        hi = pay + tail - lo - x.shape[0]
        parts = ([jnp.zeros((lo, LANES), jnp.float32)] if lo else []) + [x]
        if hi:
            parts.append(jnp.zeros((hi, LANES), jnp.float32))
        return jnp.concatenate(parts, 0) if len(parts) > 1 else x

    kmask = 7 if kahan is True else int(kahan)
    merge_d = _kahan_add if kmask & 1 else _df_add
    merge_t = _kahan_add if kmask & 2 else _df_add
    merge_x = _kahan_add if kmask & 4 else _df_add

    for a in range(6):
        # full-payload accumulator (+tail rows that spill into the next
        # tile); carry-in from the previous grid step lands in the head
        acc_h = embed(carry[0, a], 0)
        acc_l = embed(carry[1, a], 0)
        for t in range(tps):
            rsl = slice(t * r_tile, (t + 1) * r_tile)
            # direct terms: y[a, rows] += sum_b S[off][a,b] x[b, rows+off]
            dh = jnp.zeros((r_tile, LANES), jnp.float32)
            dl = jnp.zeros((r_tile, LANES), jnp.float32)
            for s, off in enumerate(offs_up):
                slab = slabs[s]
                for b in range(6):
                    vh = vh_ref[t, (a * 6 + b) * ku + s, :, :]
                    vl = vl_ref[t, (a * 6 + b) * ku + s, :, :]
                    p, pe = _two_prod(vh, slab[b, rsl, :])
                    pe = pe + (vh * slab[8 + b, rsl, :] + vl * slab[b, rsl, :])
                    dh, dl = merge_d(dh, dl, p, pe)
            acc_h, acc_l = merge_x(
                acc_h, acc_l, embed(dh, t * r_tile), embed(dl, t * r_tile)
            )
            # transposed terms: y[a, rows+off] += sum_b S[off][b,a] x[b, rows]
            for s, off in enumerate(offs_up):
                if off == 0:
                    continue
                th = jnp.zeros((r_tile, LANES), jnp.float32)
                tl = jnp.zeros((r_tile, LANES), jnp.float32)
                for b in range(6):
                    vh = vh_ref[t, (b * 6 + a) * ku + s, :, :]
                    vl = vl_ref[t, (b * 6 + a) * ku + s, :, :]
                    p, pe = _two_prod(vh, x0[b, rsl, :])
                    pe = pe + (vh * x0[8 + b, rsl, :] + vl * x0[b, rsl, :])
                    th, tl = merge_t(th, tl, p, pe)
                q, m = divmod(off, LANES)
                base = t * r_tile + q
                if m == 0:
                    sh_h = embed(th, base)
                    sh_l = embed(tl, base)
                else:
                    def shift(tt):
                        rolled = pltpu.roll(tt, jnp.int32(m), 1)
                        hi_part = jnp.where(lane2 >= m, rolled, 0.0)
                        lo_part = jnp.where(lane2 < m, rolled, 0.0)
                        return embed(hi_part, base) + embed(lo_part, base + 1)

                    sh_h = shift(th)
                    sh_l = shift(tl)
                acc_h, acc_l = merge_x(acc_h, acc_l, sh_h, sh_l)
        if kmask:
            # one final renormalization so y is a proper df pair
            acc_h, acc_l = _two_sum(acc_h, acc_l)
        carry[0, a] = acc_h[pay : pay + tail]
        carry[1, a] = acc_l[pay : pay + tail]
        out_ref[0, a, :, :] = acc_h[:pay]
        out_ref[1, a, :, :] = acc_l[:pay]


def stencil_spmv_pallas_df_sym(
    vh_up, vl_up, x: DF, offsets: Sequence[int], interpret: bool = False,
    tps: int = 0, kahan: bool = False,
) -> DF:
    """y = A x streaming only the upper (off >= 0) half of the operator
    (prepare_tiled_values_df_sym). Same 2^-45-class entrywise contract
    as the full-storage kernel (different — still compensated —
    summation order). ``kahan=True`` uses the cheaper Kahan-channel
    accumulation (the sym kernel is VPU-bound: each streamed block does
    both its direct and transposed term)."""
    ntiles, rows36ku, r_tile, _ = vh_up.shape
    offsets = tuple(int(o) for o in offsets)
    offs_up = [o for o in offsets if o >= 0]
    ku = len(offs_up)
    assert rows36ku == 36 * ku and vl_up.shape == vh_up.shape
    assert offs_up[0] == 0, "diagonal slot must be stored"
    if tps <= 0:
        tps = 2 if ntiles % 2 == 0 else 1
    if ntiles % tps:
        tps = 1
    npad = ntiles * r_tile * LANES
    nr = npad // LANES
    pay = tps * r_tile
    halo = max(offs_up)
    tail = halo // LANES + 1
    if tail > pay:
        raise ValueError(
            f"halo rows ({tail}) exceed the per-step payload ({pay}): "
            "cross-tile carry only reaches one step ahead"
        )
    hr = _ceil_to(_ceil_to(halo, LANES) // LANES + 1, 8)

    def rows3(v):
        return v.reshape(6, nr, LANES)

    x2 = jnp.concatenate(
        [
            jnp.pad(rows3(x.hi), ((0, 2), (0, hr), (0, 0))),
            jnp.pad(rows3(x.lo), ((0, 2), (0, hr), (0, 0))),
        ],
        axis=0,
    )

    kernel = functools.partial(
        _kernel_sym, offs_up, ku, r_tile, hr, tail, tps, kahan
    )
    y2 = pl.pallas_call(
        kernel,
        grid=(ntiles // tps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (tps, 36 * ku, r_tile, LANES),
                lambda i: (i, _z(), _z(), _z()),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tps, 36 * ku, r_tile, LANES),
                lambda i: (i, _z(), _z(), _z()),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, 6, pay, LANES), lambda i: (_z(), _z(), i, _z()),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2, 6, nr, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 16, pay + hr, LANES), jnp.float32),
            pltpu.VMEM((2, 6, tail, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x2, vh_up, vl_up)
    return DF(y2[0].reshape(6, npad), y2[1].reshape(6, npad))
