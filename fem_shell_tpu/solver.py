"""Linear solvers — the PETSc KSP analog (doc/implementation.tex:403,459).

Two jit-compatible paths:

- :func:`dense_solve` — direct solve on the densified operator; used for
  small systems and as the correctness oracle.
- :func:`pcg` — Jacobi-preconditioned conjugate gradients with a
  ``lax.while_loop`` (compiler-friendly iteration, static shapes). The
  operator is abstract (any ``matvec`` callable), so the same solver runs
  on assembled block-ELL, matrix-free element loops, and sharded variants.

Stopping criterion: relative residual ||r|| / ||b|| < rtol (PETSc default
convergence style), plus an absolute floor and a max-iteration cap
analogous to ``-ksp_rtol/-ksp_max_it``.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray  # int32 iterations taken
    residual: jnp.ndarray  # final ||r||/||b||


def pcg(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    diag: jnp.ndarray | None = None,
    rtol: float = 1e-10,
    atol: float = 0.0,
    maxiter: int = 10000,
    x0: jnp.ndarray | None = None,
    apply_prec: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    blowup_factor: float = 1e4,
    flexible: bool = False,
) -> CGResult:
    """Preconditioned CG. Pass either ``diag`` (Jacobi) or ``apply_prec``
    (arbitrary SPD preconditioner application, e.g. block-Jacobi).
    ``matvec`` must preserve the shape of ``b``.

    ``flexible=True`` switches beta to the Polak-Ribiere (IPCG/FCG) form
    ``z_{k+1}.(r_{k+1} - r_k) / z_k.r_k`` — required when the
    preconditioner is nonlinear/varying (e.g. a Krylov-accelerated
    K-cycle, mg.py cycle="K"); costs one extra dot per iteration."""
    dtype = b.dtype
    if apply_prec is None:
        inv_diag = jnp.where(diag != 0, 1.0 / diag, jnp.ones_like(diag))
        apply_prec = lambda v: inv_diag * v  # noqa: E731
    b_norm = jnp.sqrt(jnp.sum(b * b))
    stop = jnp.maximum(rtol * b_norm, atol).astype(dtype)

    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x) if x0 is not None else b
    z = apply_prec(r)
    p = z
    rz = jnp.sum(r * z)

    # divergence early-exit: stop when the residual sits above
    # blowup_factor x its start AND has grown for >= 8 consecutive
    # iterations (the r3 roof auto-W divergence pattern). The growth
    # counter matters: a healthy MG-CG on a kappa ~ 1e10 plate
    # legitimately spikes its 2-norm residual ~1e4x on the FIRST
    # iteration and then decays (r4, tools/cg_blowup_probe.py) — an
    # absolute threshold here killed such solves at iteration 1. Floored
    # with b_norm so a warm start (x0 near the solution, r0n at
    # roundoff) cannot trip the guard on roundoff-level oscillation.
    r0n = jnp.sqrt(jnp.sum(r * r))
    blowup = blowup_factor * jnp.maximum(jnp.maximum(r0n, b_norm),
                                         jnp.finfo(dtype).tiny)

    def cond(state):
        _, r, _, _, _, _, grow, it = state
        rn = jnp.sqrt(jnp.sum(r * r))
        diverging = jnp.logical_and(grow >= 8, rn > blowup)
        return jnp.logical_and(
            jnp.logical_and(rn > stop, it < maxiter),
            jnp.logical_not(diverging),
        )

    def body(state):
        x, r, z, p, rz, rn_prev, grow, it = state
        ap = matvec(p)
        alpha = rz / jnp.sum(p * ap)
        x = x + alpha * p
        r_old = r
        r = r - alpha * ap
        z = apply_prec(r)
        rz_new = jnp.sum(r * z)
        if flexible:
            beta = (rz_new - jnp.sum(r_old * z)) / rz
        else:
            beta = rz_new / rz
        p = z + beta * p
        rn = jnp.sqrt(jnp.sum(r * r))
        grow = jnp.where(rn > rn_prev, grow + 1, jnp.zeros_like(grow))
        return (x, r, z, p, rz_new, rn, grow, it + 1)

    state = (x, r, z, p, rz, r0n, jnp.zeros((), jnp.int32),
             jnp.zeros((), jnp.int32))
    x, r, _, _, _, _, _, it = jax.lax.while_loop(cond, body, state)
    rn = jnp.sqrt(jnp.sum(r * r))
    rel = jnp.where(b_norm > 0, rn / b_norm, rn)
    return CGResult(x, it, rel)


def dense_solve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Direct dense solve (small systems / oracle path)."""
    return jnp.linalg.solve(a, b)
