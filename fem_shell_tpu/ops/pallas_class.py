"""Pallas TPU kernel: interior term of the matrix-free class-table
operator (ops/class_matvec.py).

The XLA evaluation of y_int = sum_s c[s] * shift(x, s) shatters into one
materialized [6, nyp, nxp] df intermediate per accumulation step — the
EFT two_sum optimization_barrier is an HLO fusion boundary, so the K*6
df-FMA chain round-trips the full grid through HBM ~54 times per matvec
(measured 73 ms at 1152^2 on v5e — ~400x the vector-streaming roofline,
and the dominant cost of the scale solve: the class matvec is the fine
CG operator AND the level-0 smoother).

Inside a Pallas kernel the chain is straight-line Mosaic vector code
with VMEM-resident accumulators: one streaming pass over x. There is NO
coefficient stream at all — the class scalars c[s, a, b] (a few hundred
numbers) ride in SMEM, so the kernel reads x (hi+lo) and writes y
(hi+lo) and nothing else. The cost is VPU compute: K*6 df-FMAs per
output element, cut ~2.5x by a static nonzero mask (flat shells decouple
membrane [u,v] / plate [w,tx,ty] / drilling [tz] blocks, so most of the
6x6 class blocks are structurally zero; the mask is part of ClassParts'
static treedef, computed host-side from the longdouble tables).

Layout: x arrives as the WRAP-PADDED grid [6, nyp+2, nxp+2] flattened to
lane rows (the same 2D-wrap semantics as the XLA path — the band deltas
cancel the wrapped interior contributions exactly, see class_matvec.py
docstring), so a 2D stencil offset (dy, dx) is the static flat shift
dy*(nxp+2)+dx and the kernel is the scalar-coefficient sibling of
ops/pallas_spmv_df.py (same halo-row window, same roll+select lane
shifts, same Dekker/two_sum EFT accumulation — bitwise-parity-tested
against the XLA path on device, tools/run_tpu_tests.py).

Reference context: replaces PETSc's assembled AIJ SpMV as the hot CG
operator on uniform grids (reference hot loop doc/validation.tex:529-537)
at vector-streaming cost instead of matrix-streaming cost.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fem_shell_tpu.ops.pallas_spmv import LANES, _ceil_to

_SPLIT = np.float32(4097.0)  # numpy scalar: pallas_call rejects captured tracers


def _z():
    """int32 zero for BlockSpec index maps (i64 literals break the
    remote Mosaic AOT under jax_enable_x64; see pallas_spmv.py)."""
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


def _accumulate(offsets, k, r_tile, hr, nz, df, xwin, c_ref, out_ref):
    """Shared compute: shifted slabs + scalar-stencil accumulation from
    one VMEM window ``xwin`` [nch, r_tile + 2hr, 128]."""
    nch = 16 if df else 8
    used = sorted({s for (_, _, s) in nz})
    lane = jax.lax.broadcasted_iota(jnp.int32, (nch, r_tile, LANES), 2)
    # one full-window roll per distinct lane alignment, shared by every
    # offset with that alignment (the wrapper pads grid rows to a LANES
    # multiple, so a 3x3 stencil has only alignments {0, 1, LANES-1} and
    # the dx=0 column needs no roll at all)
    qm = {s: divmod(offsets[s] + hr * LANES, LANES) for s in used}
    rolled = {
        m: pltpu.roll(xwin, jnp.int32(LANES - m), 2)
        for m in sorted({m for _, m in qm.values()} - {0})
    }
    slabs = {}
    for s in used:
        q, m = qm[s]
        if m == 0:
            slabs[s] = xwin[:, q : q + r_tile, :]
        else:
            r = rolled[m]
            slabs[s] = jnp.where(
                lane < LANES - m, r[:, q : q + r_tile, :], r[:, q + 1 : q + 1 + r_tile, :]
            )

    # term order (s-major, then b) mirrors the XLA path's accumulation
    # loop exactly — required for bitwise parity of the EFT chain
    by_row = {
        a: sorted(((b, s) for (aa, b, s) in nz if aa == a), key=lambda t: (t[1], t[0]))
        for a in range(6)
    }
    for a in range(6):
        acc_h = jnp.zeros((r_tile, LANES), jnp.float32)
        acc_l = jnp.zeros((r_tile, LANES), jnp.float32)
        for b, s in by_row[a]:
            slab = slabs[s]
            ch = c_ref[0, a * 6 + b, s]
            xh = slab[b]
            if not df:
                acc_h = acc_h + ch * xh
                continue
            cl = c_ref[1, a * 6 + b, s]
            xl = slab[8 + b]
            p, pe = _two_prod(ch, xh)
            pe = pe + (ch * xl + cl * xh)
            # renormalized df add (identical sequence to df.df_add /
            # pallas_spmv_df._kernel — bitwise parity depends on it)
            sh, se = _two_sum(acc_h, p)
            se = se + (acc_l + pe)
            acc_h, acc_l = _two_sum(sh, se)
        out_ref[0, a, :, :] = acc_h
        if df:
            out_ref[1, a, :, :] = acc_l


def _kernel(offsets, k, r_tile, hr, nz, df, x_hbm, c_ref, out_ref, x_vmem, sem):
    """One grid step: DMA an x window, accumulate the scalar stencil.

    ``nz``: static tuple of (a, b, s) triples actually accumulated.
    ``df``: True = df x/y channels + EFT accumulation; False = plain f32.
    ``c_ref``: SMEM [2, 36, K] (hi, lo) when df else [1, 36, K].
    """
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    win_rows = r_tile + 2 * hr
    two = jnp.int32(2)  # avoid int64 promotion under x64

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
    _accumulate(offsets, k, r_tile, hr, nz, df, x_vmem[cur], c_ref, out_ref)


def _kernel_df2(offsets, k, r_tile, hr, nz, xh_hbm, xl_hbm, c_ref, out_ref,
                x_vmem, sem):
    """df variant with SEPARATE hi/lo HBM streams (the pad-layout CG
    keeps DF carry pairs as two 8-channel arrays; two window DMAs fill
    the 16-channel VMEM window the shared compute expects)."""
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    win_rows = r_tile + 2 * hr
    two = jnp.int32(2)

    def window_dmas(slot, tile):
        # semaphore indices must stay i32: python-int literals promote
        # to i64 under jax_enable_x64 and the remote Mosaic AOT rejects
        # the mixed (i32, i64) memref_slice (same class of failure as
        # the _z() BlockSpec index maps)
        return (
            pltpu.make_async_copy(
                xh_hbm.at[:, pl.ds(tile * r_tile, win_rows), :],
                x_vmem.at[slot, 0:8],
                sem.at[slot, jnp.int32(0)],
            ),
            pltpu.make_async_copy(
                xl_hbm.at[:, pl.ds(tile * r_tile, win_rows), :],
                x_vmem.at[slot, 8:16],
                sem.at[slot, jnp.int32(1)],
            ),
        )

    @pl.when(i == 0)
    def _():
        for d in window_dmas(jnp.int32(0), 0):
            d.start()

    cur = jax.lax.rem(i, two)

    @pl.when(i + 1 < n_tiles)
    def _():
        for d in window_dmas(jax.lax.rem(i + 1, two), i + 1):
            d.start()

    for d in window_dmas(cur, i):
        d.wait()
    _accumulate(offsets, k, r_tile, hr, nz, True, x_vmem[cur], c_ref, out_ref)


# ----------------------------------------------------------------------
# padded-grid-resident evaluation: the V-cycle's level-0 smoother calls
# the matvec ~7x per cycle, and the flat<->grid relayout around each
# pallas call (wrap-pad, lane-pad, halo-pad, unpad) costs ~4 full-vector
# copies per application — measured 3.6 ms/matvec at 1024^2 against a
# ~0.9 ms kernel. Keeping x/b/r in ONE persistent kernel layout for the
# whole level visit removes all per-sweep copies:
#
# - layout [8, nr + 2hr, 128]: grid node (gy, gx) lives at flat position
#   (1+gy)*pxq + (1+gx) of a [pyp', pxq] zero-ringed grid (pyp' = pyp
#   padded to 8 rows, pxq = pxp padded to 128 lanes), flattened to
#   128-lane rows with hr halo rows above/below;
# - the ring is ZERO instead of wrapped: the band-delta cancellation
#   identity holds for any ring values as long as interior and bands
#   read the SAME array (class_matvec.py docstring), and zeros survive
#   smoother sweeps for free because omega*inv_diag is zero there;
# - r_tile = 8*q (q = pxq/128) makes nf2 = pyp'*pxq an exact multiple of
#   the tile, so [6, nr*128] <-> [6, pyp', pxq] are pure reshapes — grid
#   views for band folds and MG transfers cost nothing.
# ----------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
class _PadGridSpec:
    """Static layout parameters for one (nyp, nxp) level grid.

    ``row_mult`` batches grid rows per kernel step (probe knob,
    tools/pad_rowmult_probe.py). Measured on the v5e at 1024^2: the
    class matvec is INVARIANT to it (2.32 ms at 129 steps, 2.33 at 33)
    — per-step pipeline overhead is NOT the bottleneck (unlike the df
    SpMV, whose tps batching helped); the remaining gap to the ~0.3 ms
    roofline is per-op codegen (scalar-broadcast FMA / roll throughput),
    and row_mult >= 8 OOMs the 16 MB scoped VMEM. Default stays 1."""

    def __init__(self, nyp: int, nxp: int, row_mult: int = 1):
        self.nyp, self.nxp = nyp, nxp
        self.pyp, self.pxp = nyp + 2, nxp + 2
        self.pxq = _ceil_to(self.pxp, LANES)
        self.q = self.pxq // LANES
        self.row_mult = row_mult
        self.pyp_pad = _ceil_to(self.pyp, 8 * row_mult)
        # r_tile = 8*q keeps one kernel step = 8 grid rows, but the
        # _accumulate temporaries (per-offset window slabs) scale with
        # r_tile + 2hr and blow the 16 MB scoped-VMEM budget on wide
        # grids (2304^2: r_tile 152, 16.6 MB — the AOT compiler rejects
        # the kernel). Cap the tile at 96 lane-rows and pad pyp_pad
        # until the tile divides nr; grids at or below 1024^2 (q <= 12)
        # keep their exact previous layout.
        self.r_tile = min(8 * self.q * row_mult, 96 * row_mult)
        while (self.pyp_pad * self.q) % self.r_tile:
            self.pyp_pad += 8 * row_mult
        self.nf2 = self.pyp_pad * self.pxq
        self.nr = self.nf2 // LANES
        halo = self.pxq + 1
        self.hr = _ceil_to(_ceil_to(halo, LANES) // LANES + 1, 8)

    def offsets_flat(self, offs2d):
        return tuple(int(dy) * self.pxq + int(dx) for dy, dx in offs2d)


def to_pad_grid(pg: "_PadGridSpec", x_flat, n_channels: int = 8):
    """[C<=6, npad] flat vector -> [n_channels, nr + 2hr, 128] kernel
    layout (zero ring, zero halo, zero channel padding)."""
    c = x_flat.shape[0]
    xg = x_flat[:, : pg.nyp * pg.nxp].reshape(c, pg.nyp, pg.nxp)
    xq = jnp.pad(xg, ((0, 0), (0, 0), (1, pg.pxq - pg.nxp - 1)))
    xrows = xq.reshape(c, pg.nyp * pg.q, LANES)
    buf = jnp.zeros((n_channels, pg.nr + 2 * pg.hr, LANES), jnp.float32)
    return buf.at[:c, pg.hr + pg.q : pg.hr + pg.q + pg.nyp * pg.q, :].set(xrows)


def from_pad_grid(pg: "_PadGridSpec", x2, npad: int):
    """Inverse of to_pad_grid: -> [6, npad] flat vector."""
    core = x2[:6, pg.hr + pg.q : pg.hr + pg.q + pg.nyp * pg.q, :]
    xq = core.reshape(6, pg.nyp, pg.pxq)[:, :, 1 : 1 + pg.nxp]
    flat = xq.reshape(6, pg.nyp * pg.nxp)
    return jnp.pad(flat, ((0, 0), (0, npad - pg.nyp * pg.nxp)))


def pad_grid_view(pg: "_PadGridSpec", x2):
    """Zero-copy [6, pyp_pad, pxq] grid view of the padded layout —
    index (iy, ix) matches the wrap-padded array of the flat path for
    iy < pyp, ix < pxp (ring values are zero here, wrapped there; both
    conventions are exact, see module docstring)."""
    return x2[:6, pg.hr : pg.hr + pg.nr, :].reshape(6, pg.pyp_pad, pg.pxq)


def class_matvec_f32_pad(cp, pg: "_PadGridSpec", x2, interpret: bool = False):
    """y2 = A_hi x2 entirely in the padded kernel layout: Pallas interior
    + XLA band-delta folds on grid views. Ring/halo rows of y2 carry
    garbage from the interior stencil — harmless: every consumer either
    multiplies by a ring-zero factor (smoother wd) or reads interior
    grid views only (transfers, from_pad_grid)."""
    offsets = pg.offsets_flat(cp.offs2d)
    nz = tuple(sorted(cp.nzmask))

    def c36(t):
        return jnp.transpose(t, (1, 2, 0)).reshape(36, len(offsets))

    ctab = jnp.stack([c36(cp.ih), jnp.zeros_like(c36(cp.ih))])
    kernel = functools.partial(
        _kernel, offsets, len(offsets), pg.r_tile, pg.hr, nz, False
    )
    y2 = pl.pallas_call(
        kernel,
        grid=(pg.nr // pg.r_tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (2, 36, len(offsets)),
                lambda i: (_z(), _z(), _z()),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 6, pg.r_tile, LANES),
            lambda i: (_z(), _z(), i, _z()),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((1, 6, pg.nr, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 8, pg.r_tile + 2 * pg.hr, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x2, ctab)[0]

    # band-delta folds on grid views (O(boundary) work; each .at update
    # compiles to an in-place dynamic-update-slice on the dying buffer)
    xp = pad_grid_view(pg, x2)
    yv = y2.reshape(6, pg.pyp_pad, pg.pxq)
    nyp, nxp = pg.nyp, pg.nxp
    for bh, r0, kind in (
        (cp.bt_h, 0, "row"),
        (cp.bb_h, nyp - 2, "row"),
        (cp.bl_h, 0, "col"),
        (cp.br_h, nxp - 2, "col"),
    ):
        ln = nxp if kind == "row" else nyp
        yb = jnp.zeros((6, 2, ln), jnp.float32)
        for s, s2 in enumerate(cp.offs2d):
            xs = _band_x_pad(xp, s2, r0, kind, nyp, nxp)
            for b in range(6):
                yb = yb + bh[s, :, b] * xs[b][None]
        if kind == "row":
            sl = (slice(None), slice(1 + r0, 3 + r0), slice(1, 1 + nxp))
            yv = yv.at[sl].add(yb)
        else:
            sl = (slice(None), slice(1, 1 + nyp), slice(1 + r0, 3 + r0))
            yv = yv.at[sl].add(yb.transpose(0, 2, 1))
    # COMPACT [6, nr, 128] result (ring positions carry stencil garbage;
    # consumers mask it or read interior views only)
    return yv.reshape(6, pg.nr, LANES)


def _band_x_pad(xp, s2, r0: int, kind: str, nyp: int, nxp: int):
    """pallas-layout sibling of class_matvec._band_x: the band's neighbor
    block [6, 2, L] from the [6, pyp_pad, pxq] grid view (same (iy, ix)
    indexing as the wrap-padded array; ring reads see zeros)."""
    dy, dx = s2
    if kind == "row":
        return jax.lax.slice(
            xp, (0, 1 + dy + r0, 1 + dx), (6, 3 + dy + r0, 1 + dx + nxp)
        )
    blk = jax.lax.slice(
        xp, (0, 1 + dy, 1 + dx + r0), (6, 1 + dy + nyp, 3 + dx + r0)
    )
    return blk.transpose(0, 2, 1)


def pad_core(pg: "_PadGridSpec", x2):
    """COMPACT [6, nr, 128] core view of the carry layout."""
    return x2[:6, pg.hr : pg.hr + pg.nr, :]


def pad_embed(pg: "_PadGridSpec", y_c):
    """COMPACT [6, nr, 128] -> carry layout (zero halo/channel pad)."""
    buf = jnp.zeros((8, pg.nr + 2 * pg.hr, LANES), jnp.float32)
    return buf.at[:6, pg.hr : pg.hr + pg.nr, :].set(y_c)


def pad_ring_mask(pg: "_PadGridSpec"):
    """COMPACT [1, nr, 128] mask: 1 at real grid-node positions, 0 on
    ring / lane padding — multiplied into pad matvec outputs so CG
    vectors (and their dot products) stay ring-clean."""
    ones = np.zeros((pg.pyp_pad, pg.pxq), np.float32)
    ones[1 : 1 + pg.nyp, 1 : 1 + pg.nxp] = 1.0
    return jnp.asarray(ones.reshape(1, pg.nr, LANES))


def class_matvec_df_pad(cp, pg: "_PadGridSpec", x, ring_c,
                        interpret: bool = False):
    """y = A_df x in the padded layout: ``x`` is a DF of two carry
    arrays [8, nr+2hr, 128]; returns a DF of COMPACT [6, nr, 128] pairs
    with ring positions zeroed by ``ring_c`` (pad_ring_mask). Same math
    as class_matvec.class_matvec_df under the zero-ring convention."""
    from fem_shell_tpu.ops.class_matvec import _acc_df, _band_tables
    from fem_shell_tpu.ops.df import DF, df_add

    offsets = pg.offsets_flat(cp.offs2d)
    nz = tuple(sorted(cp.nzmask))

    def c36(t):
        return jnp.transpose(t, (1, 2, 0)).reshape(36, len(offsets))

    ctab = jnp.stack([c36(cp.ih), c36(cp.il)])
    kernel = functools.partial(
        _kernel_df2, offsets, len(offsets), pg.r_tile, pg.hr, nz
    )
    y2 = pl.pallas_call(
        kernel,
        grid=(pg.nr // pg.r_tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (2, 36, len(offsets)),
                lambda i: (_z(), _z(), _z()),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, 6, pg.r_tile, LANES),
            lambda i: (_z(), _z(), i, _z()),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2, 6, pg.nr, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 16, pg.r_tile + 2 * pg.hr, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(x.hi, x.lo, ctab)

    xp_h = pad_grid_view(pg, x.hi)
    xp_l = pad_grid_view(pg, x.lo)
    yvh = y2[0].reshape(6, pg.pyp_pad, pg.pxq)
    yvl = y2[1].reshape(6, pg.pyp_pad, pg.pxq)
    nyp, nxp = pg.nyp, pg.nxp
    hi_tabs = _band_tables(cp, 0)
    lo_tabs = _band_tables(cp, 1)
    for (bh, r0, kind), (bl, _, _) in zip(hi_tabs, lo_tabs):
        ln = nxp if kind == "row" else nyp
        zb = jnp.zeros((6, 2, ln), jnp.float32)
        accb = DF(zb, zb)
        for s, s2 in enumerate(cp.offs2d):
            xsh = _band_x_pad(xp_h, s2, r0, kind, nyp, nxp)
            xsl = _band_x_pad(xp_l, s2, r0, kind, nyp, nxp)
            for b in range(6):
                accb = _acc_df(accb, bh[s, :, b], bl[s, :, b],
                               xsh[b][None], xsl[b][None])
        if kind == "row":
            sl = (slice(None), slice(1 + r0, 3 + r0), slice(1, 1 + nxp))
        else:
            sl = (slice(None), slice(1, 1 + nyp), slice(1 + r0, 3 + r0))
            accb = DF(accb.hi.transpose(0, 2, 1), accb.lo.transpose(0, 2, 1))
        cur = df_add(DF(yvh[sl], yvl[sl]), accb)
        yvh = yvh.at[sl].set(cur.hi)
        yvl = yvl.at[sl].set(cur.lo)
    return DF(
        yvh.reshape(6, pg.nr, LANES) * ring_c,
        yvl.reshape(6, pg.nr, LANES) * ring_c,
    )


def class_smooth_f32_pad(cp, pg: "_PadGridSpec", x2, b_c, wd_c, sweeps: int,
                         interpret: bool = False):
    """``sweeps`` damped-Jacobi sweeps x <- x + wd * (b - A x) on the
    persistent carry layout. ``b_c``/``wd_c`` are COMPACT [6, nr, 128]
    (wd = omega * inv_diag with zeros on ring positions, which keeps the
    carry's zero ring invariant for free — and the x update an in-place
    dynamic-update-slice)."""
    for _ in range(sweeps):
        y = class_matvec_f32_pad(cp, pg, x2, interpret=interpret)
        x2 = x2.at[:6, pg.hr : pg.hr + pg.nr, :].add(wd_c * (b_c - y))
    return x2


def _grid_params(nf: int, offsets: Sequence[int], r_tile: int = 128):
    """(npad, nr, r, hr) for a flat length-``nf`` padded-grid vector.

    npad is internal to the kernel (the wrapper slices the output back
    to nf), so pad straight up to a multiple of r_tile*LANES: each grid
    step re-reads a 2*hr halo ring around its r_tile payload rows, so
    large row tiles amortize the window overlap (an 8-row tile at
    1152^2 re-reads x 5x; 128 rows cost ~1.4x and ~3 MB VMEM)."""
    halo = max(abs(int(o)) for o in offsets)
    hr = _ceil_to(_ceil_to(halo, LANES) // LANES + 1, 8)
    npad = _ceil_to(nf, r_tile * LANES)
    nr = npad // LANES
    return npad, nr, r_tile, hr


def class_interior_pallas(
    ctab_h,
    ctab_l,
    xph,
    xpl,
    offs2d: Sequence[Tuple[int, int]],
    nzmask: Sequence[Tuple[int, int, int]],
    interpret: bool = False,
):
    """Interior class-stencil contraction on the wrap-padded grid.

    ``ctab_h/ctab_l``: [K, 6, 6] interior scalars (lo may be None for the
    plain-f32 single-table variant). ``xph/xpl``: [6, nyp+2, nxp+2]
    wrap-padded x channels (lo None iff ctab_l None). Returns hi (and lo
    when df) as [6, nyp+2, nxp+2] — junk values on the wrap ring, exact
    interior; the caller slices [1:-1, 1:-1] and folds the band deltas.
    """
    df = ctab_l is not None
    six, pyp, pxp = xph.shape
    assert six == 6
    # pad grid rows to a LANES multiple: every dy lands on lane
    # alignment 0 (plain row slice in the kernel) and only dx=+-1 need a
    # lane roll — 2 full-window rolls total instead of one per offset
    pxq = _ceil_to(pxp, LANES)
    nf = pyp * pxq
    offsets = tuple(int(dy) * pxq + int(dx) for dy, dx in offs2d)
    nz = tuple(sorted(nzmask))
    npad, nr, r_tile, hr = _grid_params(nf, offsets)

    # coefficient table [2, 36, K] in offs2d order (SMEM)
    def c36(t):
        return jnp.transpose(t, (1, 2, 0)).reshape(36, len(offsets))

    ctab = jnp.stack([c36(ctab_h), c36(ctab_l) if df else jnp.zeros_like(c36(ctab_h))])

    def rows3(v):
        vq = jnp.pad(v, ((0, 2), (0, 0), (0, pxq - pxp)))
        flat = jnp.pad(vq.reshape(8, nf), ((0, 0), (0, npad - nf)))
        return jnp.pad(flat.reshape(8, nr, LANES), ((0, 0), (hr, hr), (0, 0)))

    x2 = jnp.concatenate([rows3(xph), rows3(xpl)], axis=0) if df else rows3(xph)

    nch_out = 2 if df else 1
    kernel = functools.partial(_kernel, offsets, len(offsets), r_tile, hr, nz, df)
    y2 = pl.pallas_call(
        kernel,
        grid=(nr // r_tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            # explicit int32 index map: the default map returns python-int
            # zeros, which are i64 under x64 and break the remote Mosaic AOT
            pl.BlockSpec(
                (2, 36, len(offsets)),
                lambda i: (_z(), _z(), _z()),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (nch_out, 6, r_tile, LANES),
            lambda i: (_z(), _z(), i, _z()),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nch_out, 6, nr, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 16 if df else 8, r_tile + 2 * hr, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x2, ctab)
    def ungrid(yc):
        return yc.reshape(6, npad)[:, :nf].reshape(6, pyp, pxq)[:, :, :pxp]

    yh = ungrid(y2[0])
    if not df:
        return yh, None
    return yh, ungrid(y2[1])
