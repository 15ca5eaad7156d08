"""df-valued (two-float32, ~eps49) multigrid cycle components.

Why this exists: the f32 cycle APPLICATION is the precision bottleneck
on near-inextensional curved shells (Scordelis-Lo roof).  With
f64-arithmetic Galerkin coarse operators merely CAST to f32, the f32
cycle still stalls the outer CG five decades short (r4
tools/roof_prec_probe.py "f32cast": 800 iterations, residual 37 — vs
f64 cycles converging to 1e-9), so better coarse OPERATORS cannot fix
it.  Full f64 cycles are off the table on this TPU (f64 is emulated and
the remote worker crashes on >=66k-node f64 einsum graphs, r4), which
leaves a df-valued cycle: level operators as two-f32 pairs, level
vectors as DF, every residual/transfer/correction accumulated with
error-free transforms (ops/df.py).

Two structural facts make this cheap and exact:

* All transfer weights (0.5 / 0.25) and Galerkin RAP weights (products
  of {0.5, 1}) are exact powers of two — scaling a df pair by them is
  EXACT, no renormalization needed.  The only rounding anywhere in the
  df cycle is the two_sum-renormalized accumulation (eps49-class),
  never the catastrophic f32 cancellation of the hi-only cycle.
* The smoother's D^-1 and damping stay plain f32 (a preconditioner
  inside the preconditioner needs no precision) — only the residuals
  b - A x and the running corrections carry df pairs.

CPU note: like every EFT path in this package the functions here are
TPU-exact but degraded (~f32) under CPU jit (LLVM fma contraction, see
ops/df.py header); CPU tests exercise them eagerly.

Reference scope analog: PETSc applies its preconditioners in full f64
(/root/reference/doc/implementation.tex:403) — this module is how a
two-f32 TPU stack reaches the same preconditioner quality without any
emulated-f64 graph.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from fem_shell_tpu.ops.df import (
    DF,
    df_add,
    df_mul_f32,
    df_neg,
)

__all__ = [
    "to_grid_df",
    "from_grid_df",
    "mask_df",
    "prolong_df",
    "restrict_df",
    "stencil_rap_df",
    "smooth_jacobi_df",
    "smooth_cheby_df",
]


def to_grid_df(x: DF, nyp: int, nxp: int) -> DF:
    n = nyp * nxp
    return DF(
        x.hi[:, :n].reshape(6, nyp, nxp),
        x.lo[:, :n].reshape(6, nyp, nxp),
    )


def from_grid_df(g: DF, npad: int) -> DF:
    n = g.hi.shape[1] * g.hi.shape[2]
    pad = ((0, 0), (0, npad - n))
    return DF(
        jnp.pad(g.hi.reshape(6, n), pad),
        jnp.pad(g.lo.reshape(6, n), pad),
    )


def mask_df(x: DF, free_t) -> DF:
    """Dirichlet elimination: multiply both members by the 0/1 mask
    (exact)."""
    m = free_t.astype(x.hi.dtype)
    return DF(x.hi * m, x.lo * m)


def _half(x: DF) -> DF:
    return DF(0.5 * x.hi, 0.5 * x.lo)  # power-of-two scale: exact


def prolong_df(gc: DF) -> DF:
    """Bilinear coarse->fine on df node grids: [6, nc, mc] ->
    [6, 2nc-1, 2mc-1].  Same operator as mg._prolong; midpoints are
    df_add-renormalized, interleaving is pure indexing (exact)."""
    ch, cl = gc
    # interleave rows
    mid = _half(df_add(DF(ch[:, :-1], cl[:, :-1]), DF(ch[:, 1:], cl[:, 1:])))
    nr = ch.shape[1] + mid.hi.shape[1]

    def weave(rows_c, rows_m, n, axis1=True):
        out = jnp.zeros((6, n, rows_c.shape[2]), rows_c.dtype)
        out = out.at[:, 0::2, :].set(rows_c)
        out = out.at[:, 1::2, :].set(rows_m)
        return out

    rh = weave(ch, mid.hi, nr)
    rl = weave(cl, mid.lo, nr)
    # interleave cols
    cmid = _half(df_add(DF(rh[:, :, :-1], rl[:, :, :-1]), DF(rh[:, :, 1:], rl[:, :, 1:])))
    ncl = rh.shape[2] + cmid.hi.shape[2]

    def weave_c(cols_c, cols_m):
        out = jnp.zeros((6, cols_c.shape[1], ncl), cols_c.dtype)
        out = out.at[:, :, 0::2].set(cols_c)
        out = out.at[:, :, 1::2].set(cols_m)
        return out

    return DF(weave_c(rh, cmid.hi), weave_c(rl, cmid.lo))


def restrict_df(gf: DF) -> DF:
    """P^T on df node grids: [6, 2nc-1, 2mc-1] -> [6, nc, mc].  Each
    coarse node collects its own fine value + 1/2 of the edge-midpoint
    neighbors (the transpose of prolong_df), all df_add-accumulated."""
    fh, fl = gf
    # columns first
    even = DF(fh[:, :, 0::2], fl[:, :, 0::2])
    odd = _half(DF(fh[:, :, 1::2], fl[:, :, 1::2]))
    pad = ((0, 0), (0, 0), (1, 1))
    oph, opl = jnp.pad(odd.hi, pad), jnp.pad(odd.lo, pad)
    cols = df_add(
        df_add(even, DF(oph[:, :, 1:], opl[:, :, 1:])),
        DF(oph[:, :, :-1], opl[:, :, :-1]),
    )
    # then rows
    even_r = DF(cols.hi[:, 0::2, :], cols.lo[:, 0::2, :])
    odd_r = _half(DF(cols.hi[:, 1::2, :], cols.lo[:, 1::2, :]))
    pad = ((0, 0), (1, 1), (0, 0))
    oph, opl = jnp.pad(odd_r.hi, pad), jnp.pad(odd_r.lo, pad)
    return df_add(
        df_add(even_r, DF(oph[:, 1:, :], opl[:, 1:, :])),
        DF(oph[:, :-1, :], opl[:, :-1, :]),
    )


def stencil_rap_df(
    values: DF, free_c, offsets_f: Sequence[int], nyp_f: int, nxp_f: int,
    npad_c: int,
) -> DF:
    """Galerkin coarse operator C = P^T A P in stencil space with A (and
    C) as df pairs.  Mirrors mg.stencil_rap term-for-term — same 3x3
    closure, same coarse Dirichlet re-masking — but every weight wt
    (a product of four {0.5, 1} factors) scales the pair EXACTLY and
    every accumulation renormalizes through df_add, so the coarse pair
    carries the fine pair's value to ~eps49 instead of the f32 RAP's
    accumulated cancellation error.  One-time setup cost per rebuild.
    """
    from fem_shell_tpu.mg import _offset_dydx

    k = len(offsets_f)
    n_f = nyp_f * nxp_f
    nyc, nxc = (nyp_f + 1) // 2, (nxp_f + 1) // 2
    n_c = nyc * nxc

    def prep(v):
        S = v.reshape(6, 6, k, -1)[:, :, :, :n_f].reshape(6, 6, k, nyp_f, nxp_f)
        return jnp.pad(S, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1)))

    Sph, Spl = prep(values.hi), prep(values.lo)
    w = {-1: 0.5, 0: 1.0, 1: 0.5}
    acc = {(oy, ox): None for oy in (-1, 0, 1) for ox in (-1, 0, 1)}
    for s, off in enumerate(offsets_f):
        oy, ox = _offset_dydx(int(off), nxp_f)
        for d1y in (-1, 0, 1):
            ty = oy + d1y
            for d1x in (-1, 0, 1):
                tx = ox + d1x
                sl = (
                    slice(None), slice(None), s,
                    slice(d1y + 1, d1y + 2 * nyc, 2),
                    slice(d1x + 1, d1x + 2 * nxc, 2),
                )
                samp = DF(Sph[sl], Spl[sl])
                for Oy in range((ty - 1 + 1) // 2, (ty + 1) // 2 + 1):
                    d2y = ty - 2 * Oy
                    if abs(d2y) > 1:
                        continue
                    for Ox in range((tx - 1 + 1) // 2, (tx + 1) // 2 + 1):
                        d2x = tx - 2 * Ox
                        if abs(d2x) > 1:
                            continue
                        wt = w[d1y] * w[d1x] * w[d2y] * w[d2x]
                        t = DF(wt * samp.hi, wt * samp.lo)  # exact
                        prev = acc[(Oy, Ox)]
                        acc[(Oy, Ox)] = t if prev is None else df_add(prev, t)
    oh = jnp.stack([acc[(oy, ox)].hi for oy in (-1, 0, 1) for ox in (-1, 0, 1)], axis=2)
    ol = jnp.stack([acc[(oy, ox)].lo for oy in (-1, 0, 1) for ox in (-1, 0, 1)], axis=2)
    # [6, 6, 9, nyc, nxc]; re-apply coarse Dirichlet elimination (exact
    # 0/1 multiplies + unit hi / zero lo diagonals)
    fg = free_c[:, :n_c].reshape(6, nyc, nxc).astype(oh.dtype)
    fgp = jnp.pad(fg, ((0, 0), (1, 1), (1, 1)))
    nb = jnp.stack(
        [
            fgp[:, 1 + oy : 1 + oy + nyc, 1 + ox : 1 + ox + nxc]
            for oy in (-1, 0, 1)
            for ox in (-1, 0, 1)
        ],
        axis=1,
    )
    oh = oh * fg[:, None, None] * nb[None, :, :]
    ol = ol * fg[:, None, None] * nb[None, :, :]
    one = jnp.ones((nyc, nxc), oh.dtype)
    zero = jnp.zeros((nyc, nxc), ol.dtype)
    for a in range(6):
        oh = oh.at[a, a, 4].set(jnp.where(fg[a] > 0, oh[a, a, 4], one))
        ol = ol.at[a, a, 4].set(jnp.where(fg[a] > 0, ol[a, a, 4], zero))
    pad = ((0, 0), (0, npad_c - n_c))
    return DF(
        jnp.pad(oh.reshape(36 * 9, n_c), pad),
        jnp.pad(ol.reshape(36 * 9, n_c), pad),
    )


def smooth_jacobi_df(mv, x: DF, b: DF, w, sweeps: int) -> DF:
    """Damped-Jacobi sweeps with df residuals: ``w`` = omega * inv_diag
    as plain f32 (the update operator needs no precision; the residual
    does)."""
    for _ in range(sweeps):
        r = df_add(b, df_neg(mv(x)))
        x = df_add(x, df_mul_f32(r, w))
    return x


def smooth_cheby_df(mv, x: DF, b: DF, inv_diag, lam, cheby_lo: float,
                    deg: int) -> DF:
    """Chebyshev smoothing on D^-1 A over [cheby_lo, 1.05]*lam_max with
    df iterates/residuals and f32 polynomial coefficients — the same
    recurrence as mg._smooth_cheby, so the cycle stays a fixed SPD
    polynomial preconditioner."""
    lam = lam * jnp.float32(1.05)
    lmin = jnp.float32(cheby_lo) * lam
    theta = 0.5 * (lam + lmin)
    delta = 0.5 * (lam - lmin)
    sigma = theta / delta
    rho = 1.0 / sigma
    z = df_mul_f32(df_add(b, df_neg(mv(x))), inv_diag)
    p = df_mul_f32(z, 1.0 / theta)
    x = df_add(x, p)
    for _ in range(deg - 1):
        rho_new = 1.0 / (2.0 * sigma - rho)
        z = df_mul_f32(df_add(b, df_neg(mv(x))), inv_diag)
        p = df_add(df_mul_f32(p, rho_new * rho), df_mul_f32(z, 2.0 * rho_new / delta))
        x = df_add(x, p)
        rho = rho_new
    return x
