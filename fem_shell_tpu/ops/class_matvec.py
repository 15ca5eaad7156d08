"""Matrix-free class-table operator for uniform structured grids.

On a uniform grid the stiffness operator has O(1) distinct stencil rows
(P=6 boundary-distance classes per axis, ops/exact_stencil.py), so
materializing a per-node operator — 10.7 GB as a df pair at the 10M
element scale, HBM-roofline-bound at ~21 ms/matvec — stores and streams
the same few hundred numbers five million times over. This module keeps
the operator AS its classes and evaluates

    y = A x  =  (interior constant stencil) x  +  (boundary-band deltas) x

on the fly: the interior term is a pure constant-coefficient stencil
(wrap-padded slices + broadcast FMA — vector-bandwidth-bound, no
coefficient traffic at all), and the per-class corrections live only on
the 2-node-wide boundary bands (rows 0,1 and nyp-2,nyp-1; columns
likewise), precomputed host-side as exact longdouble deltas split into
f32 triples (~60 MB total). HBM per matvec drops from 10.7 GB to the
vectors themselves, and peak residency at n=2304 drops from ~13 GB
(RESOURCE_EXHAUSTED territory) to ~4 GB.

Accuracy contract (identical to the materialized class pair,
mg._ensure_class_pair): the df operator seen by CG is exactly
(t0 + t1) per class — interior scalars are the literal (t0, t1) entries,
band deltas are longdouble (A_class - A_interior) split to df, so a
band row evaluates to A_class within ~2^-49|delta| of the class pair.
The third-term correction E = A_true - A_df for refinement residuals is
carried the same way (i2 interior constant + band e-deltas), keeping the
residual's systematic error at ~2^-72 |A||x|.

Wrap semantics: out-of-range neighbors use periodic wrap (jnp.pad
mode="wrap"), and the TRUE class tables zero every coefficient that
would reach across an edge — so the interior term's wrapped products are
cancelled exactly by the band delta (delta = 0 - c_int there), provided
bands and interior read the SAME wrapped x. Both read one shared
wrap-padded array, guaranteeing that.

Reference context: this replaces PETSc's assembled AIJ SpMV as the hot
CG operator (reference hot loop: doc/validation.tex:529-537) for the
uniform-grid scale path; general structured grids keep the Pallas pair
SpMV and unstructured meshes the gather-mode path.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from fem_shell_tpu.ops.df import DF, df_add, two_prod
from fem_shell_tpu.ops.exact_stencil import _P, ExactStencil
from fem_shell_tpu.ops.ld_interp import LD


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ClassParts:
    """Device-resident class-table operator parts.

    Interior scalars ``ih/il/i2`` are [K, 6, 6] (offset, row-var a,
    col-var b). Band blocks are per-node delta coefficients vs the
    interior class: top/bottom rows as [K, 6, 6, 2, nxp]; left/right
    columns TRANSPOSED to [K, 6, 6, 2, nyp] (band index before the long
    axis keeps the long axis on TPU lanes — [.., nyp, 2] would pad the
    trailing 2 to 128). Left/right blocks are zeroed on the four band
    rows so corner nodes are owned exclusively by the row bands.
    """

    ih: jnp.ndarray
    il: jnp.ndarray
    i2: jnp.ndarray
    bt_h: jnp.ndarray
    bt_l: jnp.ndarray
    bt_e: jnp.ndarray
    bb_h: jnp.ndarray
    bb_l: jnp.ndarray
    bb_e: jnp.ndarray
    bl_h: jnp.ndarray
    bl_l: jnp.ndarray
    bl_e: jnp.ndarray
    br_h: jnp.ndarray
    br_l: jnp.ndarray
    br_e: jnp.ndarray
    offs2d: Tuple[Tuple[int, int], ...]
    nyp: int
    nxp: int
    npad: int
    # static (a, b, s) triples with a nonzero interior scalar in ANY of
    # ih/il/i2 — the Pallas interior kernel skips the rest at trace time
    # (flat shells: membrane/plate/drilling blocks decouple, ~2.5x fewer
    # terms). None = built by an older caller; Pallas path disabled.
    nzmask: Optional[Tuple[Tuple[int, int, int], ...]] = None

    def tree_flatten(self):
        return (
            (
                self.ih, self.il, self.i2,
                self.bt_h, self.bt_l, self.bt_e,
                self.bb_h, self.bb_l, self.bb_e,
                self.bl_h, self.bl_l, self.bl_e,
                self.br_h, self.br_l, self.br_e,
            ),
            (self.offs2d, self.nyp, self.nxp, self.npad, self.nzmask),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def _split3(d_ld):
    """Longdouble -> (f32, f32, f32) triple split (exact residual chain)."""
    h = d_ld.astype(np.float32)
    r = d_ld - h.astype(LD)
    l = r.astype(np.float32)
    e = (r - l.astype(LD)).astype(np.float32)
    return h, l, e


def build_class_parts(st: ExactStencil, npad: int):
    """Host: exact-stencil tables -> (ClassParts, diag[6, npad] f32).

    A_true is reconstructed in longdouble as t0+t1+t2 (the operational
    definition of the true operator everywhere in the refinement path),
    so interior + delta decompositions round only at the triple-f32
    noise floor (~2^-72 relative).
    """
    nyp, nxp = st.nyp, st.nxp
    if nyp < _P or nxp < _P:
        raise ValueError(f"grid {nyp}x{nxp} smaller than the class patch")
    a_ld = st.t0.astype(LD) + st.t1.astype(LD) + st.t2.astype(LD)  # [K,6,6,P,P]
    a_int = a_ld[:, :, :, 2, 2]
    cy, cx = st.cy_idx, st.cx_idx

    def band_rows(rows):
        d = a_ld[:, :, :, cy[rows], :][:, :, :, :, cx] - a_int[..., None, None]
        return _split3(d)  # [K,6,6,2,nxp]

    def band_cols(cols):
        d = a_ld[:, :, :, cy, :][:, :, :, :, cx[cols]] - a_int[..., None, None]
        d[:, :, :, (0, 1, nyp - 2, nyp - 1), :] = LD(0)  # corners: row bands own them
        return _split3(np.swapaxes(d, 3, 4))  # [K,6,6,2,nyp]

    bt = band_rows(np.array([0, 1]))
    bb = band_rows(np.array([nyp - 2, nyp - 1]))
    bl = band_cols(np.array([0, 1]))
    br = band_cols(np.array([nxp - 2, nxp - 1]))

    k0 = st.offs2d.index((0, 0))
    aa = np.arange(6)
    # expand the [6, P, P] diagonal class table in f64, not longdouble:
    # the O(N) longdouble gather+convert cost ~seconds at 2304^2, and the
    # f64 intermediate only matters in (astronomically rare, harmless)
    # f32 double-rounding ties of a preconditioner diagonal
    diag_tab = a_ld[k0, aa, aa].astype(np.float64)  # [6, P, P]
    diag64 = diag_tab[:, cy, :][:, :, cx]  # [6, nyp, nxp]
    diag = np.zeros((6, npad), np.float32)
    diag[:, : nyp * nxp] = diag64.reshape(6, -1).astype(np.float32)

    ih_np = np.asarray(st.t0[:, :, :, 2, 2], np.float32)
    il_np = np.asarray(st.t1[:, :, :, 2, 2], np.float32)
    i2_np = np.asarray(st.t2[:, :, :, 2, 2], np.float32)
    nz = (ih_np != 0) | (il_np != 0) | (i2_np != 0)  # [K, 6, 6]
    nzmask = tuple(
        sorted((int(a), int(b), int(s)) for s, a, b in zip(*np.nonzero(nz)))
    )

    parts = ClassParts(
        ih=jnp.asarray(ih_np),
        il=jnp.asarray(il_np),
        i2=jnp.asarray(i2_np),
        bt_h=jnp.asarray(bt[0]), bt_l=jnp.asarray(bt[1]), bt_e=jnp.asarray(bt[2]),
        bb_h=jnp.asarray(bb[0]), bb_l=jnp.asarray(bb[1]), bb_e=jnp.asarray(bb[2]),
        bl_h=jnp.asarray(bl[0]), bl_l=jnp.asarray(bl[1]), bl_e=jnp.asarray(bl[2]),
        br_h=jnp.asarray(br[0]), br_l=jnp.asarray(br[1]), br_e=jnp.asarray(br[2]),
        offs2d=tuple(st.offs2d),
        nyp=nyp,
        nxp=nxp,
        npad=npad,
        nzmask=nzmask,
    )
    return parts, jnp.asarray(diag)


# ----------------------------------------------------------------------
# matvec core
# ----------------------------------------------------------------------


def _acc_df(acc: DF, ch, cl, xh, xl) -> DF:
    """acc += (ch + cl) * (xh + xl) with Dekker product + full df fold
    (same accumulation contract as ops/df.py df_stencil_matvec)."""
    p, pe = two_prod(ch, xh)
    pe = pe + (ch * xl + cl * xh)
    return df_add(acc, DF(p, pe))


def _band_tables(cp: ClassParts, sel: int):
    """Per-band coefficient tables for term ``sel`` (0=hi, 1=lo, 2=e):
    [(tables, r0, kind)] with kind 'row' (top/bottom) or 'col'."""
    return (
        ((cp.bt_h, cp.bt_l, cp.bt_e)[sel], 0, "row"),
        ((cp.bb_h, cp.bb_l, cp.bb_e)[sel], cp.nyp - 2, "row"),
        ((cp.bl_h, cp.bl_l, cp.bl_e)[sel], 0, "col"),
        ((cp.br_h, cp.br_l, cp.br_e)[sel], cp.nxp - 2, "col"),
    )


def _band_x(xp, s2, r0: int, kind: str, nyp: int, nxp: int):
    """The band's neighbor block for offset (dy, dx) from the shared
    wrap-padded x: [6, 2, L] with the long axis last."""
    dy, dx = s2
    if kind == "row":
        return lax.slice(xp, (0, 1 + dy + r0, 1 + dx), (6, 3 + dy + r0, 1 + dx + nxp))
    blk = lax.slice(xp, (0, 1 + dy, 1 + dx + r0), (6, 1 + dy + nyp, 3 + dx + r0))
    return blk.transpose(0, 2, 1)


def _fold_band(acc_hi, accb, r0: int, kind: str):
    """Write a band accumulator back into the full-grid array (plain
    f32 add — used by the f32/e paths)."""
    if kind == "row":
        sl = (slice(None), slice(r0, r0 + 2), slice(None))
        return acc_hi.at[sl].add(accb)
    sl = (slice(None), slice(None), slice(r0, r0 + 2))
    return acc_hi.at[sl].add(accb.transpose(0, 2, 1))


def _pallas_default(cp: ClassParts, use_pallas) -> bool:
    """Pallas interior kernel: real accelerator only (CPU Pallas is
    interpret-only) and only for parts built with a nonzero mask."""
    if cp.nzmask is None:
        return False
    if use_pallas is None:
        return jax.default_backend() != "cpu"
    return bool(use_pallas)


def class_matvec_df(
    cp: ClassParts, x: DF, use_pallas=None, interpret: bool = False
) -> DF:
    """y = A_df x, A_df = class-table (t0 + t1), x/y flat df [6, npad].

    Interior term: Pallas scalar-stencil kernel on accelerators
    (ops/pallas_class.py — one streaming pass over x; the XLA EFT chain
    materializes ~K*6 full-grid intermediates), XLA elsewhere. Band
    deltas are O(boundary) and stay in XLA either way."""
    nyp, nxp, npad = cp.nyp, cp.nxp, cp.npad
    n = nyp * nxp
    xgh = x.hi[:, :n].reshape(6, nyp, nxp)
    xgl = x.lo[:, :n].reshape(6, nyp, nxp)
    xph = jnp.pad(xgh, ((0, 0), (1, 1), (1, 1)), mode="wrap")
    xpl = jnp.pad(xgl, ((0, 0), (1, 1), (1, 1)), mode="wrap")

    if _pallas_default(cp, use_pallas):
        from fem_shell_tpu.ops.pallas_class import class_interior_pallas

        yh, yl = class_interior_pallas(
            cp.ih, cp.il, xph, xpl, cp.offs2d, cp.nzmask, interpret=interpret
        )
        acc = DF(yh[:, 1:-1, 1:-1], yl[:, 1:-1, 1:-1])
    else:
        z = jnp.zeros((6, nyp, nxp), jnp.float32)
        acc = DF(z, z)
        for s, (dy, dx) in enumerate(cp.offs2d):
            xsh = lax.slice(xph, (0, 1 + dy, 1 + dx), (6, 1 + dy + nyp, 1 + dx + nxp))
            xsl = lax.slice(xpl, (0, 1 + dy, 1 + dx), (6, 1 + dy + nyp, 1 + dx + nxp))
            for b in range(6):
                ch = cp.ih[s, :, b][:, None, None]
                cl = cp.il[s, :, b][:, None, None]
                acc = _acc_df(acc, ch, cl, xsh[b][None], xsl[b][None])

    hi_tabs = _band_tables(cp, 0)
    lo_tabs = _band_tables(cp, 1)
    for (bh, r0, kind), (bl, _, _) in zip(hi_tabs, lo_tabs):
        ln = nxp if kind == "row" else nyp
        zb = jnp.zeros((6, 2, ln), jnp.float32)
        accb = DF(zb, zb)
        for s, s2 in enumerate(cp.offs2d):
            xsh = _band_x(xph, s2, r0, kind, nyp, nxp)
            xsl = _band_x(xpl, s2, r0, kind, nyp, nxp)
            for b in range(6):
                accb = _acc_df(accb, bh[s, :, b], bl[s, :, b], xsh[b][None], xsl[b][None])
        if kind == "row":
            sl = (slice(None), slice(r0, r0 + 2), slice(None))
        else:
            sl = (slice(None), slice(None), slice(r0, r0 + 2))
            accb = DF(accb.hi.transpose(0, 2, 1), accb.lo.transpose(0, 2, 1))
        cur = df_add(DF(acc.hi[sl], acc.lo[sl]), accb)
        acc = DF(acc.hi.at[sl].set(cur.hi), acc.lo.at[sl].set(cur.lo))

    pad = ((0, 0), (0, npad - n))
    return DF(jnp.pad(acc.hi.reshape(6, n), pad), jnp.pad(acc.lo.reshape(6, n), pad))


def _matvec_f32_sel(cp: ClassParts, xf, sel: int, use_pallas=None, interpret=False):
    """Shared single-table core: sel=0 -> hi operator (t0, smoother /
    power iteration), sel=2 -> E-term (t2-class correction)."""
    nyp, nxp, npad = cp.nyp, cp.nxp, cp.npad
    n = nyp * nxp
    xg = xf[:, :n].reshape(6, nyp, nxp)
    xp = jnp.pad(xg, ((0, 0), (1, 1), (1, 1)), mode="wrap")
    itab = (cp.ih, cp.il, cp.i2)[sel]

    if _pallas_default(cp, use_pallas):
        from fem_shell_tpu.ops.pallas_class import class_interior_pallas

        yp, _ = class_interior_pallas(
            itab, None, xp, None, cp.offs2d, cp.nzmask, interpret=interpret
        )
        y = yp[:, 1:-1, 1:-1]
    else:
        y = jnp.zeros((6, nyp, nxp), jnp.float32)
        for s, (dy, dx) in enumerate(cp.offs2d):
            xs = lax.slice(xp, (0, 1 + dy, 1 + dx), (6, 1 + dy + nyp, 1 + dx + nxp))
            for b in range(6):
                y = y + itab[s, :, b][:, None, None] * xs[b][None]

    for bh, r0, kind in _band_tables(cp, sel):
        ln = nxp if kind == "row" else nyp
        yb = jnp.zeros((6, 2, ln), jnp.float32)
        for s, s2 in enumerate(cp.offs2d):
            xs = _band_x(xp, s2, r0, kind, nyp, nxp)
            for b in range(6):
                yb = yb + bh[s, :, b] * xs[b][None]
        y = _fold_band(y, yb, r0, kind)

    return jnp.pad(y.reshape(6, n), ((0, 0), (0, npad - n)))


def class_matvec_f32(cp: ClassParts, xf, use_pallas=None, interpret=False):
    """y = A_hi x in plain f32 (t0 table only): the V-cycle level-0
    smoother / power-iteration operator. A_hi is the hi part of the df
    operator — a 2^-24-relative perturbation, irrelevant for a
    preconditioner component."""
    return _matvec_f32_sel(cp, xf, 0, use_pallas, interpret)


def class_ecorr_f32(cp: ClassParts, xf, use_pallas=None, interpret=False):
    """y = E x, E = A_true - A_df (the t2-class third term), plain f32:
    |E| ~ 2^-49 |A| so f32 evaluation keeps the residual's systematic
    error at ~2^-73 |A||x|."""
    return _matvec_f32_sel(cp, xf, 2, use_pallas, interpret)
