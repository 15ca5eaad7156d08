"""CG divergence early-exit (failure detection, SURVEY §5): an
indefinite preconditioner can make PCG blow up — the r3 roof auto-W
regression burned 600 iterations (x2 runs x ~35 min on the TPU)
climbing to residual 6e5 before maxiter stopped it. Both CG kernels
exit when the residual exceeds ``blowup_factor`` (default 1e4) x its
starting value AND has grown for >= 8 consecutive iterations (the
growth condition keeps the guard off healthy solves whose residual
spikes transiently — see test_pcg_survives_first_iteration_spike).

Fixture note: tiny textbook fixtures cannot trip the default guard —
exact-arithmetic CG terminates by Krylov exhaustion at n iterations
even for indefinite M or A. The mechanism is pinned with a lowered
``blowup_factor`` on an f32 ill-conditioned system whose indefinitely
preconditioned residual provably wanders above 2x (verified to reach
rel ~12 by 5000 iterations when unguarded)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_shell_tpu.ops.df import df_from_f64
from fem_shell_tpu.solver import pcg
from fem_shell_tpu.solver_df import pcg_df


def _fixture(n=200, neg=10):
    rng = np.random.default_rng(0)
    q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    a = q @ np.diag(np.logspace(0, 6, n)) @ q.T
    b = rng.standard_normal(n)
    v = np.linalg.qr(rng.standard_normal((n, neg)))[0]
    m = np.eye(n) - 1e4 * v @ v.T  # strongly indefinite "preconditioner"
    return a, b, m


def test_pcg_exits_early_on_divergence():
    a, b, m = _fixture()
    res = pcg(
        lambda x: jnp.asarray(a, jnp.float32) @ x,
        jnp.asarray(b, jnp.float32),
        maxiter=5000, rtol=1e-6,
        apply_prec=lambda r: jnp.asarray(m, jnp.float32) @ r,
        blowup_factor=2.0,
    )
    assert int(res.iters) < 5000  # guard fired, nowhere near maxiter
    assert float(res.residual) > 1.0  # reported as NOT converged


def test_pcg_df_exits_early_on_divergence():
    a, b, m = _fixture()
    aj = jnp.asarray(a)
    mj = jnp.asarray(m)

    def mv(p):
        return df_from_f64(aj @ (p.hi.astype(jnp.float64) + p.lo))

    def prec(r):
        return df_from_f64(mj @ (r.hi.astype(jnp.float64) + r.lo))

    res = pcg_df(mv, df_from_f64(jnp.asarray(b)), maxiter=5000, rtol=1e-12,
                 apply_prec=prec, blowup_factor=1.5)
    assert int(res.iters) < 5000
    assert float(res.residual) > 1.0


def _spike_fixture():
    """Healthy SPD system + SPD preconditioner whose FIRST application
    spikes the residual 2-norm ~1.5e4x ||b|| (error on the top
    eigendirection of a kappa=1e10 operator) before CG wipes that
    direction and converges — the r4-diagnosed production pattern
    (tools/cg_blowup_probe.py: the prolongated coarse correction's
    interpolation error does this on every >=512^2 plate solve)."""
    n = 200
    lam = np.logspace(0, 10, n)
    a = np.diag(lam)
    b = np.zeros(n)
    b[:100] = 1.0
    b[-1] = 3e-3
    m = np.diag(1.0 / lam)
    m[-1, -1] += 1e-2
    return a, b, m


def test_pcg_survives_first_iteration_spike():
    """The guard must NOT kill a healthy solve whose residual spikes
    above blowup_factor x ||b|| transiently (it decays immediately;
    only SUSTAINED growth is divergence)."""
    a, b, m = _spike_fixture()
    res = pcg(
        lambda x: jnp.asarray(a) @ x, jnp.asarray(b),
        rtol=1e-10, maxiter=100,
        apply_prec=lambda r: jnp.asarray(m) @ r,
    )
    assert float(res.residual) < 1e-9
    assert int(res.iters) < 20


def test_pcg_df_survives_first_iteration_spike():
    a, b, m = _spike_fixture()
    aj = jnp.asarray(a)
    mj = jnp.asarray(m)
    res = pcg_df(
        lambda p: df_from_f64(aj @ (p.hi.astype(jnp.float64) + p.lo)),
        df_from_f64(jnp.asarray(b)), rtol=1e-10, maxiter=100,
        apply_prec=lambda r: df_from_f64(mj @ (r.hi.astype(jnp.float64) + r.lo)),
    )
    assert float(res.residual) < 1e-8
    assert int(res.iters) < 20


def test_pcg_convergence_unaffected():
    """The default guard must not perturb a healthy solve (residual
    excursions in a converging CG stay far below 1e4x)."""
    a, b, _ = _fixture()
    res = pcg(
        lambda v: jnp.asarray(a) @ v, jnp.asarray(b),
        diag=jnp.asarray(np.diagonal(a)), rtol=1e-10, maxiter=10000,
    )
    x = np.linalg.solve(a, b)
    np.testing.assert_allclose(np.asarray(res.x), x, rtol=1e-6)
