"""Double-float preconditioned CG (see ops/df.py for the arithmetic).

Vectors and the matvec run in df (two-f32, VPU-native); the scalar
recurrence (dots, alpha, beta, norms) runs in emulated f64 — O(1) work
per iteration. Attainable accuracy matches the f64 solver on the shell
systems (kappa * 4e-15 << golden tolerance) at a fraction of the cost of
full f64 emulation.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from fem_shell_tpu.ops.df import (
    DF,
    df_add,
    df_dot_f64,
    df_mul_f32,
    df_scale,
    df_scalar_from_f64,
    df_zeros_like,
)


class DFCGResult(NamedTuple):
    x: DF
    iters: jnp.ndarray
    residual: jnp.ndarray


def pcg_df(
    matvec: Callable[[DF], DF],
    b: DF,
    inv_diag: jnp.ndarray = None,  # plain f32 Jacobi preconditioner...
    rtol: float = 1e-10,
    maxiter: int = 20000,
    apply_prec: Callable[[DF], DF] = None,  # ...or any SPD prec in df
    blowup_factor: float = 1e4,
    flexible: bool = False,
) -> DFCGResult:
    """``flexible=True``: Polak-Ribiere (IPCG/FCG) beta — required for
    nonlinear/varying preconditioners (mg.py cycle="K"); one extra df
    dot per iteration."""
    if apply_prec is None:
        apply_prec = lambda r: df_mul_f32(r, inv_diag)  # noqa: E731
    b_norm = jnp.sqrt(df_dot_f64(b, b))
    stop = rtol * b_norm
    # divergence early-exit: stop when the residual sits above
    # blowup_factor x ||b|| AND has grown for >= 8 consecutive
    # iterations. Both conditions matter: an indefinite preconditioner
    # (the r3 roof auto-W regression) climbs steadily and trips the
    # growth counter within ~10 iterations, while a HEALTHY df MG-CG on
    # a kappa ~ 1e10 plate legitimately spikes the 2-norm residual to
    # ~1e4 x ||b|| on its FIRST iteration and then decays monotonically
    # (r4 diagnosis, tools/cg_blowup_probe.py + coarse_fix_probe.py: the
    # spike is the prolongated coarse correction's mid-frequency
    # interpolation error — the A-norm error contracts; an absolute
    # guard here killed pass 0 of every production refined solve at
    # iteration 1). NaN exits via rn > stop comparing False.
    blowup = blowup_factor * b_norm

    x = df_zeros_like(b)
    r = b
    p = apply_prec(r)
    rz = df_dot_f64(r, p)

    # carry only (x, r, p, rz, rn_prev, grow, it): z = prec(r) is
    # recomputed in every body anyway — carrying it costs an extra df
    # vector (255 MB at 5.3M nodes, where the operator pair already
    # fills ~2/3 of HBM)

    def cond(state):
        _, r, _, _, _, grow, it = state
        rn = jnp.sqrt(df_dot_f64(r, r))
        diverging = jnp.logical_and(grow >= 8, rn > blowup)
        return jnp.logical_and(
            jnp.logical_and(rn > stop, it < maxiter),
            jnp.logical_not(diverging),
        )

    def body(state):
        x, r, p, rz, rn_prev, grow, it = state
        ap = matvec(p)
        alpha = rz / df_dot_f64(p, ap)
        a_df = df_scalar_from_f64(alpha)
        x = df_add(x, df_scale(p, a_df))
        r_old = r
        r = df_add(r, df_scale(ap, df_scalar_from_f64(-alpha)))
        z = apply_prec(r)
        rz_new = df_dot_f64(r, z)
        if flexible:
            beta_v = (rz_new - df_dot_f64(r_old, z)) / rz
        else:
            beta_v = rz_new / rz
        beta = df_scalar_from_f64(beta_v)
        p = df_add(z, df_scale(p, beta))
        rn = jnp.sqrt(df_dot_f64(r, r))
        grow = jnp.where(rn > rn_prev, grow + 1, jnp.zeros_like(grow))
        return (x, r, p, rz_new, rn, grow, it + 1)

    state = (x, r, p, rz, b_norm, jnp.zeros((), jnp.int32),
             jnp.zeros((), jnp.int32))
    x, r, _, _, _, _, it = jax.lax.while_loop(cond, body, state)
    rel = jnp.sqrt(df_dot_f64(r, r)) / b_norm
    return DFCGResult(x, it, rel)
