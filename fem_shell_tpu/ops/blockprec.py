"""Batched 6x6 block-Jacobi preconditioner via unrolled Cholesky.

TPU-friendly: ``jnp.linalg.inv``/``cholesky`` lower to LAPACK-style custom
calls that the TPU pipeline may not support (and are overkill for fixed
6x6 blocks); instead the factorization and triangular solves are fully
unrolled over the 6 block rows as plain VPU ops, batched over all nodes.

The node-diagonal blocks of the constrained shell operator are SPD
(element matrices are PSD, drilling stabilization adds positive diagonal,
constrained dofs carry identity), so Cholesky without pivoting is stable.
"""
from __future__ import annotations

import jax.numpy as jnp

_M = 6


def cholesky6(a: jnp.ndarray) -> jnp.ndarray:
    """Batched lower-Cholesky of [N,6,6] SPD blocks, unrolled."""
    cols = [[None] * _M for _ in range(_M)]  # cols[i][j] = L[i,j], j<=i
    for j in range(_M):
        s = a[..., j, j]
        for k in range(j):
            s = s - cols[j][k] * cols[j][k]
        d = jnp.sqrt(s)
        cols[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, _M):
            s = a[..., i, j]
            for k in range(j):
                s = s - cols[i][k] * cols[j][k]
            cols[i][j] = s * inv_d
    rows = []
    for i in range(_M):
        entries = [cols[i][j] if j <= i else jnp.zeros_like(a[..., 0, 0]) for j in range(_M)]
        rows.append(jnp.stack(entries, axis=-1))
    return jnp.stack(rows, axis=-2)


def cholesky6_solve(l: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) z = r for batched [N,6,6] factors and [N,6] rhs."""
    # forward substitution L y = r
    y = [None] * _M
    for i in range(_M):
        s = r[..., i]
        for k in range(i):
            s = s - l[..., i, k] * y[k]
        y[i] = s / l[..., i, i]
    # backward substitution L^T z = y
    z = [None] * _M
    for i in reversed(range(_M)):
        s = y[i]
        for k in range(i + 1, _M):
            s = s - l[..., k, i] * z[k]
        z[i] = s / l[..., i, i]
    return jnp.stack(z, axis=-1)
