"""df (two-float32) re-execution of traced f64 kernels.

TPU v5e emulates f64 at catastrophic cost for compute-dense code: the
element-stiffness kernels (ops/elements.py, behavioral ports of the
reference fem-shell.cpp:306-1110) measure ~0.015 Melem/s in emulated f64
— 65x slower than the same graph in f32 — and they dominate production
assembly end-to-end. This module gets f64-class element kernels at
f32-VPU cost:

1. ``jax.make_jaxpr`` traces the EXISTING, golden-validated f64 kernel
   once (no transcription — the operation sequence is identical to the
   reference port by construction);
2. the jaxpr is re-executed with every f64 value carried as an
   unevaluated two-float32 sum (hi, lo) and every arithmetic primitive
   mapped to an error-free-transform implementation (Knuth two_sum,
   Dekker two_prod — ops/df.py); data-movement primitives (slice,
   gather, transpose, ...) apply componentwise, which is exact.

Accuracy: each df op is correctly rounded to ~2^-49 relative (standard
double-double bounds), strictly tighter than the TPU's own emulated f64
(CLAUDE.md: ~1e-8-noise class for some op families). Entrywise element
stiffness error measured ~1e-14 relative vs CPU-native f64.

Layout: trace the kernel vmapped with the ELEMENT axis LAST
(in_axes/out_axes=-1) so every interpreted op keeps elements on the
128-lane axis — materialized intermediates then tile-pad by <=2.7x
instead of the >40x a trailing (3,3)/(24,24) axis costs. EFT
optimization barriers force materialization (see ops/df.py), so this
matters here far more than in ordinary fused f32 code.

CPU caveat (CLAUDE.md): LLVM's FMA contraction breaks EFTs under CPU
jit; interpret EAGERLY on CPU (tests) and under jit only on TPU.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.extend.core import Literal as _Literal

from fem_shell_tpu.ops.df import DF

_F32 = jnp.float32

# ----------------------------------------------------------------------
# Error-free transforms, MINIMALLY barriered.
#
# ops/df.py wraps every EFT operand AND intermediate in
# jax.lax.optimization_barrier. Each barrier is an HLO fusion boundary;
# at ~3 barriers per df op and ~10 df ops per original f64 op, the
# interpreted kernels shatter into thousands of tiny fusions (measured:
# quad df kernels 0.106 Melem/s fully barriered vs 0.49 barrier-free).
#
# On-device bisection (on-device bisection, r1 probes — removed after recording) shows exactly ONE rewrite
# hazard on the current XLA/TPU toolchain: expressions built on an
# unprotected rounded sum s = a + b get algebraically simplified inside
# large fused graphs (the Specht plate kernel lost 6 decimal digits;
# Dekker two_prod chains were never rewritten). A single barrier on s
# restores full eps49 behavior (tri plate entry error 4.3e-15 of scale)
# while keeping the fusion regions large. Regression guards: the
# on-device kernel parity test (tests/test_dfk.py TPU-gated) and the
# bench golden check.
# ----------------------------------------------------------------------

# 2^12 + 1, Dekker f32 splitting. np scalar, NOT jnp: a module-level jnp
# constant initializes the default backend at import time, and on this
# machine that opens (and holds) the single-client axon TPU tunnel —
# which silently starves every TPU subprocess (run_tpu_tests children
# then fall back to CPU and skip).
_SPLITTER = np.float32(4097.0)
_ob = jax.lax.optimization_barrier


def two_sum(a, b):
    s = _ob(a + b)
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def fast_two_sum(a, b):
    s = _ob(a + b)
    return s, b - (s - a)


def two_prod(a, b):
    p = a * b
    c = _SPLITTER * a
    ah = c - (c - a)
    al = a - ah
    d = _SPLITTER * b
    bh = d - (d - b)
    bl = b - bh
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


# ----------------------------------------------------------------------
# df scalar/array arithmetic (beyond ops/df.py's vector helpers)
# ----------------------------------------------------------------------


def d_from_f64(x) -> DF:
    """Exact split of host/f64 values into (hi, lo) f32 pairs."""
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def d_to_f64(x: DF):
    return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)


def d_add(x: DF, y: DF) -> DF:
    s, e = two_sum(x.hi, y.hi)
    e = e + (x.lo + y.lo)
    return DF(*two_sum(s, e))


def d_sub(x: DF, y: DF) -> DF:
    s, e = two_sum(x.hi, -y.hi)
    e = e + (x.lo - y.lo)
    return DF(*two_sum(s, e))


def d_neg(x: DF) -> DF:
    return DF(-x.hi, -x.lo)


def d_mul(x: DF, y: DF) -> DF:
    p, e = two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    return DF(*fast_two_sum(p, e))


def d_div(x: DF, y: DF) -> DF:
    """Long-division style double-double divide (~eps49 relative)."""
    q0 = x.hi / y.hi
    p, pe = two_prod(q0, y.hi)
    # r = x - q0*y
    s, se = two_sum(x.hi, -p)
    se = se + (x.lo - pe - q0 * y.lo)
    r = s + se
    q1 = r / y.hi
    return DF(*fast_two_sum(q0, q1))


def d_sqrt(x: DF) -> DF:
    """One df Newton refinement of the f32 sqrt (~eps49 relative).
    Guards the exact-zero case (frame vectors of degenerate padding
    elements): sqrt(0) = 0 without 0/0."""
    s0 = jnp.sqrt(x.hi)
    p, pe = two_prod(s0, s0)
    e, ee = two_sum(x.hi, -p)
    num = e + (ee + (x.lo - pe))
    denom = jnp.where(s0 > 0, 2.0 * s0, jnp.float32(1.0))
    c = jnp.where(s0 > 0, num / denom, jnp.float32(0.0))
    return DF(*fast_two_sum(s0, c))


def _d_lt(x: DF, y: DF):
    return (x.hi < y.hi) | ((x.hi == y.hi) & (x.lo < y.lo))


def _d_le(x: DF, y: DF):
    return (x.hi < y.hi) | ((x.hi == y.hi) & (x.lo <= y.lo))


def d_max(x: DF, y: DF) -> DF:
    keep_y = _d_lt(x, y)
    return DF(jnp.where(keep_y, y.hi, x.hi), jnp.where(keep_y, y.lo, x.lo))


def d_min(x: DF, y: DF) -> DF:
    keep_y = _d_lt(y, x)
    return DF(jnp.where(keep_y, y.hi, x.hi), jnp.where(keep_y, y.lo, x.lo))


def d_integer_pow(x: DF, p: int) -> DF:
    if p < 0:
        inv = d_integer_pow(x, -p)
        one = DF(jnp.ones_like(x.hi), jnp.zeros_like(x.hi))
        return d_div(one, inv)
    if p == 0:
        return DF(jnp.ones_like(x.hi), jnp.zeros_like(x.hi))
    acc = None
    base = x
    while p:
        if p & 1:
            acc = base if acc is None else d_mul(acc, base)
        p >>= 1
        if p:
            base = d_mul(base, base)
    return acc


def d_reduce_sum(x: DF, axes: Sequence[int]) -> DF:
    """Pairwise-tree df summation along ``axes`` (renormalized adds)."""
    for ax in sorted(axes, reverse=True):
        n = x.hi.shape[ax]
        while n > 1:
            half = n // 2
            lo_idx = [slice(None)] * x.hi.ndim
            hi_idx = [slice(None)] * x.hi.ndim
            lo_idx[ax] = slice(0, half)
            hi_idx[ax] = slice(half, 2 * half)
            pair = d_add(
                DF(x.hi[tuple(lo_idx)], x.lo[tuple(lo_idx)]),
                DF(x.hi[tuple(hi_idx)], x.lo[tuple(hi_idx)]),
            )
            if n % 2:
                last = [slice(None)] * x.hi.ndim
                last[ax] = slice(2 * half, n)
                head = [slice(None)] * x.hi.ndim
                head[ax] = slice(0, 1)
                first = d_add(
                    DF(pair.hi[tuple(head)], pair.lo[tuple(head)]),
                    DF(x.hi[tuple(last)], x.lo[tuple(last)]),
                )
                if half == 1:
                    # n == 3: `first` IS the whole reduced row — the
                    # would-be rest slice(1, 1) is empty, and Mosaic
                    # rejects 0-sized vector types ("positive constant
                    # sizes but got 0"; r4 pallas-elem lowering failure)
                    pair = first
                else:
                    rest = [slice(None)] * x.hi.ndim
                    rest[ax] = slice(1, half)
                    pair = DF(
                        jnp.concatenate([first.hi, pair.hi[tuple(rest)]], axis=ax),
                        jnp.concatenate([first.lo, pair.lo[tuple(rest)]], axis=ax),
                    )
            x = pair
            n = half
        x = DF(jnp.squeeze(x.hi, axis=ax), jnp.squeeze(x.lo, axis=ax))
    return x


def _split(x):
    """Dekker split of an f32 array into (head, tail)."""
    c = _SPLITTER * x
    h = c - (c - x)
    return h, x - h


def d_dot_general(a: DF, b: DF, dimension_numbers) -> DF:
    """df dot_general: explicit (static, small) contraction loop of
    df multiply-adds. Output dims follow lax.dot_general: batch dims,
    then lhs free dims, then rhs free dims.

    The Dekker splits of both factors are computed on the UNBROADCAST
    [B,M,1]/[B,1,N] operands — recomputing them per broadcast output
    element would roughly double the dot's flop count."""
    (lc, rc), (lb, rb) = dimension_numbers
    lc, rc, lb, rb = map(tuple, (lc, rc, lb, rb))
    a_free = [d for d in range(a.hi.ndim) if d not in lc + lb]
    b_free = [d for d in range(b.hi.ndim) if d not in rc + rb]

    def canon(x, batch, free, contract):
        perm = list(batch) + list(free) + list(contract)
        hi = jnp.transpose(x.hi, perm)
        lo = jnp.transpose(x.lo, perm)
        bsh = [x.hi.shape[d] for d in batch]
        fsh = [x.hi.shape[d] for d in free]
        csh = [x.hi.shape[d] for d in contract]
        nb, nf, nc = int(np.prod(bsh or [1])), int(np.prod(fsh or [1])), int(np.prod(csh or [1]))
        return DF(hi.reshape(nb, nf, nc), lo.reshape(nb, nf, nc)), bsh, fsh

    ac, bsh, a_fsh = canon(a, lb, a_free, lc)
    bc, _, b_fsh = canon(b, rb, b_free, rc)
    ah_h, ah_t = _split(ac.hi)
    bh_h, bh_t = _split(bc.hi)
    n_contract = ac.hi.shape[2]
    acc = None
    for c in range(n_contract):
        xh = ac.hi[:, :, None, c]
        yh = bc.hi[:, None, :, c]
        p = xh * yh
        err = (
            (ah_h[:, :, None, c] * bh_h[:, None, :, c] - p)
            + ah_h[:, :, None, c] * bh_t[:, None, :, c]
            + ah_t[:, :, None, c] * bh_h[:, None, :, c]
        ) + ah_t[:, :, None, c] * bh_t[:, None, :, c]
        err = err + (xh * bc.lo[:, None, :, c] + ac.lo[:, :, None, c] * yh)
        term = DF(*fast_two_sum(p, err))
        acc = term if acc is None else d_add(acc, term)
    out_shape = tuple(bsh) + tuple(a_fsh) + tuple(b_fsh)
    return DF(acc.hi.reshape(out_shape), acc.lo.reshape(out_shape))


# ----------------------------------------------------------------------
# jaxpr interpreter
# ----------------------------------------------------------------------


def _is_float(aval) -> bool:
    return jnp.issubdtype(aval.dtype, jnp.floating)


def _wrap(val):
    """Lift a concrete float value (jaxpr const / literal) to DF."""
    if isinstance(val, DF):
        return val
    v = np.asarray(val)
    if np.issubdtype(v.dtype, np.floating):
        return d_from_f64(v)
    return jnp.asarray(v)


def _bind_parts(prim, params, *vals):
    """Apply a pure data-movement primitive componentwise (exact)."""
    any_df = any(isinstance(v, DF) for v in vals)
    if not any_df:
        return prim.bind(*vals, **params)
    his = [v.hi if isinstance(v, DF) else v for v in vals]
    los = [v.lo if isinstance(v, DF) else v for v in vals]
    return DF(prim.bind(*his, **params), prim.bind(*los, **params))


def _rule_movement(eqn, *vals):
    return _bind_parts(eqn.primitive, eqn.params, *vals)


def _rule_convert(eqn, x):
    new = eqn.params["new_dtype"]
    if jnp.issubdtype(new, jnp.floating):
        if isinstance(x, DF):
            if jnp.dtype(new).itemsize < 8:
                # a kernel that deliberately narrows (f64 -> f32) must
                # not silently retain full df precision: round through
                # the target dtype so the interpreter matches eager f64
                # semantics
                rounded = d_to_f64(x).astype(new).astype(_F32)
                return DF(rounded, jnp.zeros_like(rounded))
            return x
        # int -> float: element-kernel integers are tiny (quadrature /
        # index constants), exactly representable in f32
        return DF(x.astype(_F32), jnp.zeros(x.shape, _F32))
    if isinstance(x, DF):
        return d_to_f64(x).astype(new)
    return x.astype(new)


def _rule_iota(eqn):
    p = dict(eqn.params)
    if jnp.issubdtype(p["dtype"], jnp.floating):
        p["dtype"] = _F32
        hi = eqn.primitive.bind(**p)
        return DF(hi, jnp.zeros_like(hi))
    return eqn.primitive.bind(**p)


def _rule_scatter(eqn, operand, indices, updates):
    """.at[].set lowers to scatter (replace) — exact componentwise.
    Rebuilt through the public API so the update computation is retyped
    for f32."""
    kw = dict(
        dimension_numbers=eqn.params["dimension_numbers"],
        indices_are_sorted=eqn.params["indices_are_sorted"],
        unique_indices=eqn.params["unique_indices"],
        mode=eqn.params["mode"],
    )
    if not isinstance(operand, DF):
        return jax.lax.scatter(operand, indices, updates, **kw)
    upd = updates if isinstance(updates, DF) else DF(updates, jnp.zeros_like(updates))
    return DF(
        jax.lax.scatter(operand.hi, indices, upd.hi, **kw),
        jax.lax.scatter(operand.lo, indices, upd.lo, **kw),
    )


def _cmp(op_hi, op_tie):
    def rule(eqn, x, y):
        if isinstance(x, DF) or isinstance(y, DF):
            x = x if isinstance(x, DF) else DF(x, jnp.zeros_like(x))
            y = y if isinstance(y, DF) else DF(y, jnp.zeros_like(y))
            return op_hi(x.hi, y.hi) | ((x.hi == y.hi) & op_tie(x.lo, y.lo))
        return eqn.primitive.bind(x, y, **eqn.params)

    return rule


def _rule_select_n(eqn, pred, *cases):
    if not any(isinstance(c, DF) for c in cases):
        return eqn.primitive.bind(pred, *cases, **eqn.params)
    cs = [c if isinstance(c, DF) else DF(c, jnp.zeros_like(c)) for c in cases]
    return DF(
        jax.lax.select_n(pred, *[c.hi for c in cs]),
        jax.lax.select_n(pred, *[c.lo for c in cs]),
    )


def _arith(fn):
    def rule(eqn, *vals):
        if not any(isinstance(v, DF) for v in vals):
            # pure integer/bool arithmetic (index computation) stays plain
            return eqn.primitive.bind(*vals, **eqn.params)
        vals = [
            v
            if isinstance(v, DF)
            else DF(v.astype(_F32), jnp.zeros(jnp.shape(v), _F32))
            for v in vals
        ]
        return fn(*vals)

    return rule


_MOVEMENT = (
    "broadcast_in_dim",
    "concatenate",
    "gather",
    "reshape",
    "slice",
    "squeeze",
    "transpose",
    "rev",
    "expand_dims",
    "copy",
)

_RULES: Dict[str, Any] = {name: _rule_movement for name in _MOVEMENT}
_RULES.update(
    add=_arith(d_add),
    sub=_arith(d_sub),
    mul=_arith(d_mul),
    div=_arith(d_div),
    neg=_arith(d_neg),
    max=_arith(d_max),
    min=_arith(d_min),
    sqrt=_arith(d_sqrt),
    convert_element_type=_rule_convert,
    iota=_rule_iota,
    scatter=_rule_scatter,
    select_n=_rule_select_n,
    lt=_cmp(jnp.less, jnp.less),
    le=_cmp(jnp.less, jnp.less_equal),
    gt=_cmp(jnp.greater, jnp.greater),
    ge=_cmp(jnp.greater, jnp.greater_equal),
    integer_pow=lambda eqn, x: d_integer_pow(x, eqn.params["y"]),
    reduce_sum=lambda eqn, x: d_reduce_sum(x, eqn.params["axes"]),
    dot_general=lambda eqn, a, b: d_dot_general(a, b, eqn.params["dimension_numbers"]),
)


def _abs_df(x: DF) -> DF:
    negate = x.hi < 0
    return DF(jnp.where(negate, -x.hi, x.hi), jnp.where(negate, -x.lo, x.lo))


_RULES["abs"] = _arith(_abs_df)


def _rule_eq(eqn, x, y):
    if isinstance(x, DF) or isinstance(y, DF):
        x = x if isinstance(x, DF) else DF(x, jnp.zeros_like(x))
        y = y if isinstance(y, DF) else DF(y, jnp.zeros_like(y))
        return (x.hi == y.hi) & (x.lo == y.lo)
    return eqn.primitive.bind(x, y, **eqn.params)


_RULES["eq"] = _rule_eq


def df_eval_jaxpr(jaxpr, consts, *args):
    """Evaluate a (f64-traced) jaxpr with floats carried as DF pairs.

    ``args``: DF for float-typed invars, plain arrays otherwise.
    """
    env: Dict[Any, Any] = {}

    def read(v):
        if isinstance(v, _Literal):
            return _wrap(v.val)
        return env[v]

    def write(v, val):
        env[v] = val

    for v, c in zip(jaxpr.constvars, consts):
        write(v, _wrap(c))
    for v, a in zip(jaxpr.invars, args):
        write(v, a)

    for eqn in jaxpr.eqns:
        vals = [read(v) for v in eqn.invars]
        name = eqn.primitive.name
        if name in ("pjit", "jit", "closed_call", "custom_jvp_call", "custom_vjp_call"):
            sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            outs = df_eval_jaxpr(sub.jaxpr, sub.consts, *vals)
        else:
            rule = _RULES.get(name)
            if rule is None:
                if any(isinstance(v, DF) for v in vals):
                    raise NotImplementedError(f"no df rule for primitive '{name}'")
                outs = eqn.primitive.bind(*vals, **eqn.params)
            else:
                outs = rule(eqn, *vals)
        if eqn.primitive.multiple_results:
            for v, o in zip(eqn.outvars, outs):
                write(v, o)
        else:
            write(eqn.outvars[0], outs)

    return [read(v) for v in jaxpr.outvars]


class DfFunction:
    """A traced f64 function re-executable in df arithmetic.

    Float arguments are passed/returned as DF pairs; integer arguments
    pass through. The trace is cached per concrete input shapes.
    """

    def __init__(self, fn):
        self._fn = fn
        self._cache = {}

    def __call__(self, *args):
        key = tuple(
            (True, v.hi.shape, str(v.hi.dtype)) if isinstance(v, DF) else (False, np.shape(v), str(np.asarray(v).dtype))
            for v in args
        )
        closed = self._cache.get(key)
        if closed is None:
            example = [
                jax.ShapeDtypeStruct(v.hi.shape, jnp.float64) if isinstance(v, DF) else v
                for v in args
            ]
            closed = jax.make_jaxpr(self._fn)(*example)
            self._cache[key] = closed
        return df_eval_jaxpr(closed.jaxpr, closed.consts, *args)


def df_function(fn) -> DfFunction:
    return DfFunction(fn)


# ======================================================================
# Batch-last interpretation: re-execute the UNBATCHED kernel jaxpr with
# every float value carrying a TRAILING element axis.
#
# jax.vmap puts the batch axis FIRST on intermediates, so the df-
# interpreted batched kernels materialize [E, 3, 3]-shaped temporaries
# whose trailing dims tile-pad up to ~40x on TPU ((8,128) tiling) —
# measured: a [4.2M, 12, 12] f32 temp allocated 25.7 GB and OOMed the
# 10M-element assembly. Interpreting the SINGLE-ELEMENT jaxpr with a
# trailing E axis keeps elements on the 128-lane axis of every
# intermediate: [3, 3, E] pads ~2.7x on sublanes only.
#
# Invariants:
# - float values: DF pairs shaped logical_shape + (E,) (constants carry
#   trailing 1 and broadcast on use);
# - integer/bool values: UNBATCHED logical shapes (index computation is
#   element-independent). A comparison of DF values would produce a
#   batched bool — unsupported (asserted); the element kernels have none
#   (their lt/select_n traffic is integer index clamping).
# ======================================================================


def _bl_E(vals):
    e = 1
    for v in vals:
        if isinstance(v, DF):
            e = max(e, v.hi.shape[-1])
    return e


def _bl_bcast(v: DF, e: int) -> DF:
    if v.hi.shape[-1] == e:
        return v
    shape = v.hi.shape[:-1] + (e,)
    return DF(jnp.broadcast_to(v.hi, shape), jnp.broadcast_to(v.lo, shape))


def _bl_movement(fn):
    """Lift a (params-adjusted) movement op over the DF pair."""

    def apply(v: DF, *args, **kw):
        return DF(fn(v.hi, *args, **kw), fn(v.lo, *args, **kw))

    return apply


def _bl_rule_broadcast(eqn, x):
    p = eqn.params
    if not isinstance(x, DF):
        return eqn.primitive.bind(x, **p)
    shape = tuple(p["shape"]) + (x.hi.shape[-1],)
    bd = tuple(p["broadcast_dimensions"]) + (len(p["shape"]),)
    return _bl_movement(
        lambda a: jax.lax.broadcast_in_dim(a, shape, bd)
    )(x)


def _bl_rule_reshape(eqn, x):
    p = eqn.params
    if not isinstance(x, DF):
        return eqn.primitive.bind(x, **p)
    if p.get("dimensions") is not None:
        raise NotImplementedError("reshape with dimensions in batch-last mode")
    new = tuple(p["new_sizes"]) + (x.hi.shape[-1],)
    return _bl_movement(lambda a: jax.lax.reshape(a, new))(x)


def _bl_rule_transpose(eqn, x):
    p = eqn.params
    if not isinstance(x, DF):
        return eqn.primitive.bind(x, **p)
    perm = tuple(p["permutation"]) + (x.hi.ndim - 1,)
    return _bl_movement(lambda a: jax.lax.transpose(a, perm))(x)


def _bl_rule_slice(eqn, x):
    p = eqn.params
    if not isinstance(x, DF):
        return eqn.primitive.bind(x, **p)
    e = x.hi.shape[-1]
    start = tuple(p["start_indices"]) + (0,)
    limit = tuple(p["limit_indices"]) + (e,)
    strides = p["strides"]
    strides = (tuple(strides) + (1,)) if strides is not None else None
    return _bl_movement(lambda a: jax.lax.slice(a, start, limit, strides))(x)


def _bl_rule_squeeze(eqn, x):
    p = eqn.params
    if not isinstance(x, DF):
        return eqn.primitive.bind(x, **p)
    return _bl_movement(lambda a: jax.lax.squeeze(a, p["dimensions"]))(x)


def _bl_rule_concat(eqn, *vals):
    p = eqn.params
    if not any(isinstance(v, DF) for v in vals):
        return eqn.primitive.bind(*vals, **p)
    e = _bl_E(vals)
    vs = [
        _bl_bcast(v, e)
        if isinstance(v, DF)
        else DF(
            jnp.broadcast_to(v.astype(_F32)[..., None], v.shape + (e,)),
            jnp.zeros(v.shape + (e,), _F32),
        )
        for v in vals
    ]
    d = p["dimension"]
    return DF(
        jax.lax.concatenate([v.hi for v in vs], d),
        jax.lax.concatenate([v.lo for v in vs], d),
    )


def _bl_rule_gather(eqn, operand, indices):
    p = eqn.params
    if not isinstance(operand, DF):
        return eqn.primitive.bind(operand, indices, **p)
    dn = p["dimension_numbers"]
    e = operand.hi.shape[-1]
    out_logical_rank = len(eqn.outvars[0].aval.shape)
    new_dn = jax.lax.GatherDimensionNumbers(
        offset_dims=tuple(dn.offset_dims) + (out_logical_rank,),
        collapsed_slice_dims=tuple(dn.collapsed_slice_dims),
        start_index_map=tuple(dn.start_index_map),
    )
    sizes = tuple(p["slice_sizes"]) + (e,)

    def g(a):
        return jax.lax.gather(
            a,
            indices,
            new_dn,
            sizes,
            indices_are_sorted=p["indices_are_sorted"],
            unique_indices=p["unique_indices"],
            mode=p["mode"],
        )

    return _bl_movement(g)(operand)


def _bl_rule_scatter(eqn, operand, indices, updates):
    p = eqn.params
    if not isinstance(operand, DF) and not isinstance(updates, DF):
        return _rule_scatter(eqn, operand, indices, updates)
    e = _bl_E([v for v in (operand, updates) if isinstance(v, DF)])
    if not isinstance(operand, DF):
        operand = DF(
            jnp.broadcast_to(operand.astype(_F32)[..., None], operand.shape + (e,)),
            jnp.zeros(operand.shape + (e,), _F32),
        )
    operand = _bl_bcast(operand, e)
    if not isinstance(updates, DF):
        updates = DF(
            jnp.broadcast_to(updates.astype(_F32)[..., None], updates.shape + (e,)),
            jnp.zeros(updates.shape + (e,), _F32),
        )
    updates = _bl_bcast(updates, e)
    dn = p["dimension_numbers"]
    new_dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=tuple(dn.update_window_dims) + (updates.hi.ndim - 1,),
        inserted_window_dims=tuple(dn.inserted_window_dims),
        scatter_dims_to_operand_dims=tuple(dn.scatter_dims_to_operand_dims),
    )

    def sc(a, u):
        return jax.lax.scatter(
            a,
            indices,
            u,
            new_dn,
            indices_are_sorted=p["indices_are_sorted"],
            unique_indices=p["unique_indices"],
            mode=p["mode"],
        )

    return DF(sc(operand.hi, updates.hi), sc(operand.lo, updates.lo))


def _bl_rule_select_n(eqn, pred, *cases):
    if not any(isinstance(c, DF) for c in cases):
        return eqn.primitive.bind(pred, *cases, **eqn.params)
    if isinstance(pred, DF) or (
        hasattr(pred, "ndim") and cases and isinstance(cases[0], DF) and pred.ndim == cases[0].hi.ndim
    ):
        raise NotImplementedError("batched predicate in batch-last mode")
    e = _bl_E(cases)
    cs = [
        _bl_bcast(c, e)
        if isinstance(c, DF)
        else DF(
            jnp.broadcast_to(c.astype(_F32)[..., None], c.shape + (e,)),
            jnp.zeros(c.shape + (e,), _F32),
        )
        for c in cases
    ]
    pred_b = pred[..., None]
    return DF(
        jnp.where(pred_b, cs[1].hi, cs[0].hi)
        if len(cs) == 2
        else jax.lax.select_n(jnp.broadcast_to(pred_b, cs[0].hi.shape), *[c.hi for c in cs]),
        jnp.where(pred_b, cs[1].lo, cs[0].lo)
        if len(cs) == 2
        else jax.lax.select_n(jnp.broadcast_to(pred_b, cs[0].lo.shape), *[c.lo for c in cs]),
    )


def _bl_rule_convert(eqn, x):
    new = eqn.params["new_dtype"]
    if jnp.issubdtype(new, jnp.floating):
        if isinstance(x, DF):
            return x
        # unbatched int -> float constant: trailing 1, broadcasts on use
        return DF(x.astype(_F32)[..., None], jnp.zeros(x.shape + (1,), _F32))
    if isinstance(x, DF):
        raise NotImplementedError("float->int conversion in batch-last mode")
    return x.astype(new)


def _bl_rule_iota(eqn):
    p = dict(eqn.params)
    if jnp.issubdtype(p["dtype"], jnp.floating):
        p["dtype"] = _F32
        hi = eqn.primitive.bind(**p)[..., None]
        return DF(hi, jnp.zeros_like(hi))
    return eqn.primitive.bind(**p)


def d_dot_general_bl(a: DF, b: DF, dimension_numbers) -> DF:
    """Batch-last df dot_general: E rides the last axis of both operands
    and of the output; the (tiny, static) contraction and any logical
    batch dims are unrolled in python. Output dims follow dot_general
    (batch, lhs free, rhs free) with E appended."""
    import itertools

    (lc, rc), (lb, rb) = dimension_numbers
    lc, rc, lb, rb = map(tuple, (lc, rc, lb, rb))
    na, nb_ = a.hi.ndim - 1, b.hi.ndim - 1
    a_free = [d for d in range(na) if d not in lc + lb]
    b_free = [d for d in range(nb_) if d not in rc + rb]

    def canon(x, batch, free, contract):
        perm = list(batch) + list(free) + list(contract) + [x.hi.ndim - 1]
        return DF(jnp.transpose(x.hi, perm), jnp.transpose(x.lo, perm))

    at = canon(a, lb, a_free, lc)
    bt = canon(b, rb, b_free, rc)
    csh = [a.hi.shape[d] for d in lc]
    nbd, nfa, nfb = len(lb), len(a_free), len(b_free)

    acc = None
    for cidx in itertools.product(*[range(s) for s in csh]):
        a_sl = at.hi[(slice(None),) * (nbd + nfa) + cidx + (slice(None),)]
        a_sll = at.lo[(slice(None),) * (nbd + nfa) + cidx + (slice(None),)]
        b_sl = bt.hi[(slice(None),) * (nbd + nfb) + cidx + (slice(None),)]
        b_sll = bt.lo[(slice(None),) * (nbd + nfb) + cidx + (slice(None),)]
        # insert singleton free axes: a -> [B.., Fa.., 1xFb.., E],
        #                             b -> [B.., 1xFa.., Fb.., E]
        for _ in range(nfb):
            a_sl = jnp.expand_dims(a_sl, nbd + nfa)
            a_sll = jnp.expand_dims(a_sll, nbd + nfa)
        for _ in range(nfa):
            b_sl = jnp.expand_dims(b_sl, nbd)
            b_sll = jnp.expand_dims(b_sll, nbd)
        term = d_mul(DF(a_sl, a_sll), DF(b_sl, b_sll))
        acc = term if acc is None else d_add(acc, term)
    return acc


_BL_RULES: Dict[str, Any] = dict(_RULES)
_BL_RULES.update(
    broadcast_in_dim=_bl_rule_broadcast,
    reshape=_bl_rule_reshape,
    transpose=_bl_rule_transpose,
    slice=_bl_rule_slice,
    squeeze=_bl_rule_squeeze,
    concatenate=_bl_rule_concat,
    gather=_bl_rule_gather,
    scatter=_bl_rule_scatter,
    select_n=_bl_rule_select_n,
    convert_element_type=_bl_rule_convert,
    iota=_bl_rule_iota,
    dot_general=lambda eqn, x, y: d_dot_general_bl(
        x if isinstance(x, DF) else DF(x.astype(_F32)[..., None], jnp.zeros(x.shape + (1,), _F32)),
        y if isinstance(y, DF) else DF(y.astype(_F32)[..., None], jnp.zeros(y.shape + (1,), _F32)),
        eqn.params["dimension_numbers"],
    ),
    rev=lambda eqn, x: _bl_movement(lambda a: jax.lax.rev(a, eqn.params["dimensions"]))(x)
    if isinstance(x, DF)
    else eqn.primitive.bind(x, **eqn.params),
)


def _bl_arith_wrap(vals):
    """Promote plain operands mixed into DF arithmetic (batch-last):
    unbatched ints/bools get a trailing singleton."""
    e = _bl_E(vals)
    out = []
    for v in vals:
        if isinstance(v, DF):
            out.append(v)
        else:
            out.append(
                DF(v.astype(_F32)[..., None], jnp.zeros(jnp.shape(v) + (1,), _F32))
            )
    return out


for _name, _fn in (
    ("add", d_add),
    ("sub", d_sub),
    ("mul", d_mul),
    ("div", d_div),
    ("max", d_max),
    ("min", d_min),
):
    def _mk(fn):
        def rule(eqn, *vals):
            if not any(isinstance(v, DF) for v in vals):
                return eqn.primitive.bind(*vals, **eqn.params)
            return fn(*_bl_arith_wrap(vals))

        return rule

    _BL_RULES[_name] = _mk(_fn)

_BL_RULES["reduce_sum"] = lambda eqn, x: d_reduce_sum(x, eqn.params["axes"])


def df_eval_jaxpr_bl(jaxpr, consts, *args):
    """Batch-last evaluation (see module section comment). ``args``: DF
    with trailing E for float invars, plain for ints."""
    env: Dict[Any, Any] = {}

    def read(v):
        if isinstance(v, _Literal):
            val = np.asarray(v.val)
            if np.issubdtype(val.dtype, np.floating):
                d = d_from_f64(val)
                return DF(d.hi[..., None], d.lo[..., None])
            return jnp.asarray(val)
        return env[v]

    for v, c in zip(jaxpr.constvars, consts):
        c = np.asarray(c)
        if np.issubdtype(c.dtype, np.floating):
            d = d_from_f64(c)
            env[v] = DF(d.hi[..., None], d.lo[..., None])
        else:
            env[v] = jnp.asarray(c)
    for v, a in zip(jaxpr.invars, args):
        env[v] = a

    for eqn in jaxpr.eqns:
        vals = [read(v) for v in eqn.invars]
        name = eqn.primitive.name
        if name in ("pjit", "jit", "closed_call", "custom_jvp_call", "custom_vjp_call"):
            sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            outs = df_eval_jaxpr_bl(sub.jaxpr, sub.consts, *vals)
        else:
            rule = _BL_RULES.get(name)
            if rule is None:
                if any(isinstance(v, DF) for v in vals):
                    raise NotImplementedError(f"no batch-last df rule for '{name}'")
                outs = eqn.primitive.bind(*vals, **eqn.params)
            else:
                outs = rule(eqn, *vals)
        if eqn.primitive.multiple_results:
            for v, o in zip(eqn.outvars, outs):
                env[v] = o
        else:
            env[eqn.outvars[0]] = outs

    return [read(v) for v in jaxpr.outvars]


class DfFunctionBL:
    """Batch-last df re-execution of an UNBATCHED f64 kernel.

    Float args are DF pairs shaped logical_shape + (E,); the trace is of
    the single-element function (cached per logical shapes)."""

    def __init__(self, fn):
        self._fn = fn
        self._cache = {}

    def __call__(self, *args):
        key = tuple(
            (True, v.hi.shape[:-1], str(v.hi.dtype))
            if isinstance(v, DF)
            else (False, np.shape(v), str(np.asarray(v).dtype))
            for v in args
        )
        closed = self._cache.get(key)
        if closed is None:
            example = [
                jax.ShapeDtypeStruct(v.hi.shape[:-1], jnp.float64)
                if isinstance(v, DF)
                else v
                for v in args
            ]
            closed = jax.make_jaxpr(self._fn)(*example)
            self._cache[key] = closed
        return df_eval_jaxpr_bl(closed.jaxpr, closed.consts, *args)


def df_function_bl(fn) -> DfFunctionBL:
    return DfFunctionBL(fn)
