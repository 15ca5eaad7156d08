"""Numpy-longdouble jaxpr interpreter (host-side, eager, exact-ish).

Re-executes a traced f64 kernel with ``np.longdouble`` (x86-64 extended
precision, eps = 2^-64 ~ 5.4e-20) arrays. Used to compute the *exact*
reference stencil tables for the structured-grid refinement operator
(ops/exact_stencil.py): plate-bending conditioning (kappa ~ n^4)
amplifies correlated operator rounding by kappa, so at the 10M-element
scale target even eps53 entries would bound the solution at ~1e-3;
eps64 tables push the floor to ~1e-6-class worst case.

The interpreter covers exactly the primitive set of the element kernels
(ops/elements.py): arithmetic, shaping, dot_general, gather/scatter,
select/compare. Gather and scatter are made faithful by running the
REAL jax primitive on index arrays (data-independent) and applying the
resulting index map to the longdouble operands — no reimplementation of
XLA's dimension-number semantics.

This runs EAGERLY in numpy: no LLVM fusion, so (unlike CPU-jitted EFT
code) the arithmetic is honestly rounded per op.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.extend.core import Literal as _Literal

LD = np.longdouble


def _is_float(aval) -> bool:
    return np.issubdtype(aval.dtype, np.floating)


def _to_ld(x):
    x = np.asarray(x)
    if np.issubdtype(x.dtype, np.floating):
        return x.astype(LD)
    return x


# ----------------------------------------------------------------------
# gather/scatter via index maps computed by the real primitives
# ----------------------------------------------------------------------


# index maps are DATA-INDEPENDENT (they depend only on shapes, dimension
# numbers, and the index operand values), so they are computed once per
# structural signature and cached as host numpy. Without the cache, every
# interpreted element re-ran ~10 eager gather/scatter ops on the default
# backend — on the tunneled remote TPU that is ~10 round trips per
# element, which made the 50-element patch assembly cost ~14 s/rebuild
# (r3 profile) instead of ~0.7 s.
_INDEX_MAP_CACHE: dict = {}


class _cpu_default_device:
    """Context: run the eager index-map primitives on the host CPU
    backend when one exists — on the tunneled remote TPU platform each
    eager gather/scatter is otherwise a fresh remote compile (~6 s cold)
    plus a round trip."""

    def __enter__(self):
        try:
            self._ctx = jax.default_device(jax.devices("cpu")[0])
        except Exception:
            self._ctx = None
        if self._ctx is not None:
            self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        if self._ctx is not None:
            self._ctx.__exit__(*exc)
        return False


def _map_key(kind, eqn, operand_shape, indices):
    return (
        kind,
        operand_shape,
        repr(eqn.params.get("dimension_numbers")),
        tuple(eqn.params.get("slice_sizes", ())),
        repr(eqn.params.get("mode", None)),
        indices.shape,
        indices.tobytes(),
    )


def _apply_gather(eqn, operand, indices):
    indices = np.asarray(indices)
    key = _map_key("g", eqn, operand.shape, indices)
    out_map = _INDEX_MAP_CACHE.get(key)
    if out_map is None:
        idx = np.arange(operand.size, dtype=np.int64).reshape(operand.shape)
        with _cpu_default_device():
            out_map = np.asarray(
                jax.lax.gather(
                    jnp.asarray(idx),
                    jnp.asarray(indices),
                    dimension_numbers=eqn.params["dimension_numbers"],
                    slice_sizes=eqn.params["slice_sizes"],
                    mode=eqn.params.get("mode", None),
                    fill_value=None,
                )
            )
        _INDEX_MAP_CACHE[key] = out_map
    return operand.reshape(-1)[out_map]


def _apply_scatter(eqn, operand, indices, updates):
    # the real scatter on a sentinel -1 operand and arange updates tells,
    # per output position, which update lands there
    indices = np.asarray(indices)
    key = _map_key("s", eqn, operand.shape, indices) + (updates.shape,)
    out_map = _INDEX_MAP_CACHE.get(key)
    if out_map is None:
        with _cpu_default_device():
            sentinel = jnp.full(operand.shape, -1, jnp.int64)
            upd_ids = jnp.arange(updates.size, dtype=jnp.int64).reshape(updates.shape)
            out_map = np.asarray(
                jax.lax.scatter(
                    sentinel,
                    jnp.asarray(indices),
                    upd_ids,
                    dimension_numbers=eqn.params["dimension_numbers"],
                    indices_are_sorted=eqn.params.get("indices_are_sorted", False),
                    unique_indices=eqn.params.get("unique_indices", False),
                    mode=eqn.params.get("mode", None),
                )
            ).reshape(-1)
        _INDEX_MAP_CACHE[key] = out_map
    res = operand.reshape(-1).copy()
    mask = out_map >= 0
    res[mask] = updates.reshape(-1)[out_map[mask]]
    return res.reshape(operand.shape)


# ----------------------------------------------------------------------
# dot_general -> einsum
# ----------------------------------------------------------------------


def _dot_general(lhs, rhs, dimension_numbers):
    (lc, rc), (lb, rb) = dimension_numbers
    letters = "abcdefghijklmnopqrstuvwxyz"
    next_l = iter(letters)
    l_spec = [None] * lhs.ndim
    r_spec = [None] * rhs.ndim
    # batch dims share letters and appear in output first
    out = []
    for i, j in zip(lb, rb):
        c = next(next_l)
        l_spec[i] = r_spec[j] = c
        out.append(c)
    for i, j in zip(lc, rc):
        c = next(next_l)
        l_spec[i] = r_spec[j] = c
    for i in range(lhs.ndim):
        if l_spec[i] is None:
            l_spec[i] = next(next_l)
            out.append(l_spec[i])
    for j in range(rhs.ndim):
        if r_spec[j] is None:
            r_spec[j] = next(next_l)
            out.append(r_spec[j])
    spec = f"{''.join(l_spec)},{''.join(r_spec)}->{''.join(out)}"
    return np.einsum(spec, lhs, rhs)


# ----------------------------------------------------------------------
# the interpreter
# ----------------------------------------------------------------------


def _eval_jaxpr(jaxpr, consts, *args):
    env = {}

    def read(v):
        if isinstance(v, _Literal):
            return _to_ld(v.val)
        return env[v]

    def write(v, val):
        env[v] = val

    for v, c in zip(jaxpr.constvars, consts):
        write(v, _to_ld(np.asarray(c)))
    for v, a in zip(jaxpr.invars, args):
        write(v, a)

    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        vals = [read(v) for v in eqn.invars]
        p = eqn.params
        if name in ("jit", "pjit", "closed_call", "custom_jvp_call", "custom_vjp_call"):
            inner = p["jaxpr"]
            if hasattr(inner, "jaxpr"):
                out = _eval_jaxpr(inner.jaxpr, [_to_ld(np.asarray(c)) for c in inner.consts], *vals)
            else:
                out = _eval_jaxpr(inner, [], *vals)
        elif name == "add":
            out = [vals[0] + vals[1]]
        elif name == "sub":
            out = [vals[0] - vals[1]]
        elif name == "mul":
            out = [vals[0] * vals[1]]
        elif name == "div":
            out = [vals[0] / vals[1]]
        elif name == "neg":
            out = [-vals[0]]
        elif name == "max":
            out = [np.maximum(vals[0], vals[1])]
        elif name == "min":
            out = [np.minimum(vals[0], vals[1])]
        elif name == "abs":
            out = [np.abs(vals[0])]
        elif name == "sqrt":
            out = [np.sqrt(vals[0])]
        elif name == "integer_pow":
            out = [vals[0] ** p["y"]]
        elif name == "pow":
            out = [vals[0] ** vals[1]]
        elif name == "lt":
            out = [vals[0] < vals[1]]
        elif name == "le":
            out = [vals[0] <= vals[1]]
        elif name == "gt":
            out = [vals[0] > vals[1]]
        elif name == "ge":
            out = [vals[0] >= vals[1]]
        elif name == "eq":
            out = [vals[0] == vals[1]]
        elif name == "select_n":
            pred = vals[0]
            cases = vals[1:]
            if pred.dtype == np.bool_:
                out = [np.where(pred, cases[1], cases[0])]
            else:
                out = [np.choose(pred, cases)]
        elif name == "convert_element_type":
            new = p["new_dtype"]
            if np.issubdtype(new, np.floating):
                out = [vals[0].astype(LD)]
            else:
                out = [vals[0].astype(new)]
        elif name == "broadcast_in_dim":
            shape = p["shape"]
            dims = p["broadcast_dimensions"]
            x = vals[0]
            slc = [np.newaxis] * len(shape)
            for i, d in enumerate(dims):
                slc[d] = slice(None)
            out = [np.broadcast_to(x[tuple(slc)], shape).copy()]
        elif name == "reshape":
            out = [vals[0].reshape(p["new_sizes"])]
        elif name == "squeeze":
            out = [np.squeeze(vals[0], axis=tuple(p["dimensions"]))]
        elif name == "transpose":
            out = [np.transpose(vals[0], p["permutation"])]
        elif name == "slice":
            slc = tuple(
                slice(s, l, (st or 1))
                for s, l, st in zip(
                    p["start_indices"],
                    p["limit_indices"],
                    p["strides"] or [1] * len(p["start_indices"]),
                )
            )
            out = [vals[0][slc]]
        elif name == "concatenate":
            out = [np.concatenate(vals, axis=p["dimension"])]
        elif name == "iota":
            out = [
                np.broadcast_to(
                    np.arange(p["shape"][p["dimension"]], dtype=p["dtype"]).reshape(
                        [-1 if i == p["dimension"] else 1 for i in range(len(p["shape"]))]
                    ),
                    p["shape"],
                ).copy()
            ]
        elif name == "reduce_sum":
            out = [np.sum(vals[0], axis=tuple(p["axes"]))]
        elif name == "reduce_max":
            out = [np.max(vals[0], axis=tuple(p["axes"]))]
        elif name == "reduce_min":
            out = [np.min(vals[0], axis=tuple(p["axes"]))]
        elif name == "dot_general":
            out = [_dot_general(vals[0], vals[1], p["dimension_numbers"])]
        elif name == "gather":
            out = [_apply_gather(eqn, vals[0], vals[1])]
        elif name == "scatter":
            out = [_apply_scatter(eqn, vals[0], vals[1], vals[2])]
        elif name == "stop_gradient":
            out = vals
        elif name == "copy":
            out = vals
        else:
            raise NotImplementedError(f"ld_interp: primitive {name!r}")
        if eqn.primitive.multiple_results:
            for v, o in zip(eqn.outvars, out):
                write(v, o)
        else:
            write(eqn.outvars[0], out[0])

    return [read(v) for v in jaxpr.outvars]


class LdFunction:
    """Longdouble re-execution of an f64-traceable function. Arguments
    are numpy arrays (longdouble floats pass through exactly); the trace
    is cached per argument shapes."""

    def __init__(self, fn):
        self._fn = fn
        self._cache = {}

    def __call__(self, *args):
        key = tuple((np.shape(a), np.issubdtype(np.asarray(a).dtype, np.floating)) for a in args)
        cached = self._cache.get(key)
        if cached is None:
            example = [
                jax.ShapeDtypeStruct(
                    np.shape(a),
                    jnp.float64 if np.issubdtype(np.asarray(a).dtype, np.floating) else np.asarray(a).dtype,
                )
                for a in args
            ]
            closed = jax.make_jaxpr(self._fn)(*example)
            # fetch the jaxpr consts to host ONCE: np.asarray on a device
            # constant is a remote round trip on the tunneled TPU
            # platform — per-call fetches dominated the patch assembly
            # (measured 15 s for 50 elements at r3)
            consts_ld = [_to_ld(np.asarray(c)) for c in closed.consts]
            cached = (closed, consts_ld)
            self._cache[key] = cached
        closed, consts_ld = cached
        ld_args = [_to_ld(a) for a in args]
        out = _eval_jaxpr(closed.jaxpr, consts_ld, *ld_args)
        if len(closed.jaxpr.outvars) == 1:
            return out[0]
        return out


def ld_function(fn) -> LdFunction:
    return LdFunction(fn)
