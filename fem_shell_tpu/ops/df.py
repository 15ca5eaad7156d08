"""Double-float (two-float32) arithmetic for TPU-speed f64-class solves.

TPU v5e has no native f64 — XLA emulates it at a large per-op cost. For
the bandwidth/latency-critical CG loop we instead carry vectors and the
operator as *unevaluated sums of two f32s* (hi + lo, ~49-bit mantissa)
and use error-free transformations (Knuth two_sum, Dekker two_prod via
12-bit splitting) on the VPU. Probed on this hardware: two_sum/two_prod
are bit-exact under jit (no harmful FMA contraction).

The shell systems here have condition numbers ~1e5-1e7; attainable CG
accuracy ~ kappa * eps: f32 (eps 6e-8) fails outright, df (eps ~4e-15)
matches the f64 reference to golden tolerance at a fraction of the cost.

Representation: a pair (hi, lo) of same-shape f32 arrays, |lo| <= ulp(hi).
Scalars in the CG recurrence stay in (emulated) f64 — they are O(1) work.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_SPLITTER = 4097.0  # 2^12 + 1 for f32 Dekker splitting

# Error-free transforms depend on every operand being an honestly-rounded
# f32 value and on the EXACT IEEE rounding of expressions with deliberate
# catastrophic cancellation (s - a where s = fl(a + b), etc.). Under jit,
# XLA's fusion keeps intermediate expressions in EXCESS PRECISION (fma
# contraction / wide registers), so the value feeding one use of `e` can
# differ from the rounded value feeding another — the (hi, lo) pair then
# silently loses its invariant and df degrades to f32 (observed: eager df
# CG converges like f64, the jitted identical loop stalls 5 decades
# short, with fast_two_sum producing inconsistent pairs).
# optimization_barrier on the EFT *inputs* and rounded intermediates
# forces materialized f32 values and blocks the rewrites.
_ob = jax.lax.optimization_barrier


class DF(NamedTuple):
    hi: jnp.ndarray
    lo: jnp.ndarray


def two_sum(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """s + err == a + b exactly (Knuth)."""
    a, b = _ob((a, b))
    s = _ob(a + b)
    bb = _ob(s - a)
    err = (a - _ob(s - bb)) + (b - bb)
    return s, err


def fast_two_sum(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Requires |a| >= |b|; cheaper renormalization."""
    a, b = _ob((a, b))
    s = _ob(a + b)
    return s, b - _ob(s - a)


def _split(a):
    a = _ob(a)
    c = _ob(jnp.float32(_SPLITTER) * a)
    hi = c - _ob(c - a)
    return hi, a - hi


def two_prod(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """p + err == a * b exactly (Dekker). Every rounded product is
    barriered so all uses see the SAME materialized f32 value (fusion may
    otherwise rematerialize p with different fma contraction per use)."""
    a, b = _ob((a, b))
    p = _ob(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((_ob(ah * bh) - p) + _ob(ah * bl) + _ob(al * bh)) + _ob(al * bl)
    return p, err


# ----------------------------------------------------------------------
# df constructors / conversions
# ----------------------------------------------------------------------


def df_from_f64(x64) -> DF:
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(x64.dtype)).astype(jnp.float32)
    return DF(hi, lo)


def df_to_f64(x: DF):
    return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)


def df_zeros_like(x: DF) -> DF:
    return DF(jnp.zeros_like(x.hi), jnp.zeros_like(x.lo))


# ----------------------------------------------------------------------
# df vector operations (elementwise, VPU-native f32)
# ----------------------------------------------------------------------


def df_add(x: DF, y: DF) -> DF:
    # renormalize with the full two_sum: CG updates cancel heavily
    # (r -= alpha*Ap), so the fast_two_sum precondition |s| >= |e| does
    # NOT hold here — using it costs ~3x the CG iterations.
    s, e = two_sum(x.hi, y.hi)
    e = e + (x.lo + y.lo)
    return DF(*two_sum(s, e))


def df_neg(x: DF) -> DF:
    return DF(-x.hi, -x.lo)


def df_scale(x: DF, a: DF) -> DF:
    """x * a with a a df scalar (broadcast)."""
    p, e = two_prod(x.hi, a.hi)
    e = e + (x.hi * a.lo + x.lo * a.hi)
    return DF(*fast_two_sum(p, e))


def df_mul_f32(x: DF, a) -> DF:
    """x * a with a plain f32 (used for preconditioning — the
    preconditioner itself need not be high precision)."""
    p, e = two_prod(x.hi, a)
    e = e + x.lo * a
    return DF(*fast_two_sum(p, e))


def df_scalar_from_f64(a64) -> DF:
    hi = a64.astype(jnp.float32)
    lo = (a64 - hi.astype(a64.dtype)).astype(jnp.float32)
    return DF(hi, lo)


def df_dot_f64(x: DF, y: DF):
    """<x, y> accumulated in (emulated) f64 — O(N) cheap ops, exactness
    of the reduction matters far less than the matvec."""
    x64 = df_to_f64(x)
    y64 = df_to_f64(y)
    return jnp.sum(x64 * y64)


# ----------------------------------------------------------------------
# df stencil SpMV (SoA layout, XLA level)
# ----------------------------------------------------------------------


def _rows(v, k: int):
    """Slot-row accessor for operator values: accepts the FLAT [36K, N]
    layout (production: no 36-sublane tile padding) or legacy [36, K, N];
    returns rows(a, b, s) -> [6?, N]. For flat input this is pure row
    indexing — no reshape, so the argument keeps its efficient 2D
    layout."""
    if v.ndim == 2:
        return lambda a, b, s: v[(a * 6 + b) * k + s]
    v4 = v.reshape(6, 6, k, v.shape[2])
    return lambda a, b, s: v4[a, b, s]


def df_stencil_matvec(values: DF, x: DF, offsets) -> DF:
    """y = A x for the stencil SoA operator with A and x in df.

    Full df accumulation: each exact product pair (Dekker) is folded into
    the running df sum with a two_sum-renormalized add. (A cheaper
    compensated-summation variant stalls CG on these operators: its
    O(eps32^2 * sum|terms|) error gets multiplied by the bending
    operator's term-cancellation ratio ~ kappa.)
    """
    k = len(offsets)
    npad = values.hi.shape[-1]
    vh = _rows(values.hi, k)
    vl = _rows(values.lo, k)
    acc = DF(jnp.zeros((6, npad), jnp.float32), jnp.zeros((6, npad), jnp.float32))
    for s, off in enumerate(offsets):
        o = int(off)
        xh = jnp.roll(x.hi, -o, axis=1)
        xl = jnp.roll(x.lo, -o, axis=1)
        for b in range(6):
            vhb = jnp.stack([vh(a, b, s) for a in range(6)])
            vlb = jnp.stack([vl(a, b, s) for a in range(6)])
            p, pe = two_prod(vhb, xh[b])
            pe = pe + (vhb * xl[b] + vlb * xh[b])
            acc = df_add(acc, DF(p, pe))
    return acc


def df_gather_matvec(values: DF, x: DF, adj_t) -> DF:
    """y = A x for the gather-mode SoA operator (general unstructured
    meshes, ``adj_t [K, Npad]`` neighbor table) with A and x in df. Same
    full-df accumulation as the stencil variant; the lane shifts become
    lane gathers."""
    k = adj_t.shape[0]
    npad = values.hi.shape[-1]
    vh = _rows(values.hi, k)
    vl = _rows(values.lo, k)
    xh = x.hi[:, adj_t]  # [6, K, Npad]
    xl = x.lo[:, adj_t]
    acc = DF(jnp.zeros((6, npad), jnp.float32), jnp.zeros((6, npad), jnp.float32))
    for s in range(k):
        for b in range(6):
            vhb = jnp.stack([vh(a, b, s) for a in range(6)])
            vlb = jnp.stack([vl(a, b, s) for a in range(6)])
            p, pe = two_prod(vhb, xh[b, s])
            pe = pe + (vhb * xl[b, s] + vlb * xh[b, s])
            acc = df_add(acc, DF(p, pe))
    return acc


def df_stencil_matvec_f32v(values_f32, x: DF, offsets) -> DF:
    """y = A x with A stored as PLAIN f32 values and x, y in df.

    The df solver only needs df vectors and exact per-term matvec
    accumulation — the operator values define the system being solved, so
    when the system was assembled directly in f32 (exact-geometry centered
    kernels, ops/soa.py:_centered_xyz) there is no lo part to carry.
    Halves operator HBM and drops the vl product vs df_stencil_matvec."""
    k = len(offsets)
    npad = values_f32.shape[-1]
    v = _rows(values_f32, k)
    acc = DF(jnp.zeros((6, npad), jnp.float32), jnp.zeros((6, npad), jnp.float32))
    for s, off in enumerate(offsets):
        o = int(off)
        xh = jnp.roll(x.hi, -o, axis=1)
        xl = jnp.roll(x.lo, -o, axis=1)
        for b in range(6):
            vb = jnp.stack([v(a, b, s) for a in range(6)])
            p, pe = two_prod(vb, xh[b])
            pe = pe + vb * xl[b]
            acc = df_add(acc, DF(p, pe))
    return acc
