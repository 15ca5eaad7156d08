"""df-valued multigrid cycle (mg_df.py + MultigridShellSystem df_cycle).

Arithmetic parity tests run the df ops EAGERLY: under CPU jit LLVM's fma
contraction breaks the error-free transforms (ops/df.py header), so
eps49-class assertions are only meaningful eagerly on CPU (or jitted on
TPU — tools/run_tpu_tests.py covers that side). The solve tests run
jitted: they assert convergence/iteration behavior, which survives the
CPU EFT degradation (the pair degrades toward f32, not garbage).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.mg import (
    MultigridShellSystem,
    _prolong,
    _restrict,
    grid_rap_offsets,
    stencil_rap,
)
from fem_shell_tpu.mg_df import (
    prolong_df,
    restrict_df,
    stencil_rap_df,
)
from fem_shell_tpu.ops.df import DF, df_from_f64, df_to_f64

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def _plate(n):
    p = MeshGenParams("q", n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    return mesh, rows * fac


def test_transfers_df_match_f64():
    """prolong_df/restrict_df reproduce the f64 transfer operators to
    ~eps49 when fed exact df splits of f64 grids (eager CPU)."""
    rng = np.random.default_rng(3)
    xc64 = jnp.asarray(rng.normal(size=(6, 9, 9)))
    xf64 = jnp.asarray(rng.normal(size=(6, 17, 17)))
    pf = df_to_f64(prolong_df(df_from_f64(xc64)))
    rf = df_to_f64(restrict_df(df_from_f64(xf64)))
    np.testing.assert_allclose(np.asarray(pf), np.asarray(_prolong(xc64)),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(rf), np.asarray(_restrict(xf64)),
                               rtol=0, atol=1e-13)


def test_stencil_rap_df_matches_f64_rap():
    """The df Galerkin RAP reproduces the f64 RAP to ~eps49 on a curved
    (Scordelis-Lo) grid — the accumulation path is exact power-of-two
    scaling + two_sum renormalization (eager CPU)."""
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    mesh, _, _ = scordelis_lo(8)
    mg = MultigridShellSystem(
        mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float64, n_levels=2
    )
    assert mg.coarse_op == "galerkin"
    fine = mg.levels[0]
    sys1 = mg._systems[1]
    ref = stencil_rap(
        fine.values, sys1.free_t.astype(jnp.float64), fine.offsets,
        fine.nyp, fine.nxp, sys1.pattern.n_pad,
    )
    pair = stencil_rap_df(
        df_from_f64(fine.values), sys1.free_t.astype(jnp.float32),
        fine.offsets, fine.nyp, fine.nxp, sys1.pattern.n_pad,
    )
    got = np.asarray(df_to_f64(pair))
    refn = np.asarray(ref)
    scale = np.abs(refn).max()
    assert np.abs(got - refn).max() < 3e-14 * scale


def test_df_cycle_solve_matches_f32_cycle_path():
    """df_cycle=True on a flat plate: converges in the same iteration
    count class as the production f32-cycle df solve and agrees with it
    (the preconditioner changes, the system does not)."""
    mesh, forces = _plate(32)
    mg = MultigridShellSystem(mesh, MAT, dtype=jnp.float32, df_operator=True,
                              df_cycle=True, use_pallas=False)
    assert mg.levels[-1].dense_inv is not None
    assert mg.levels[-1].dense_inv.dtype == jnp.float64
    u = mg.solve_df(forces, rtol=1e-8, maxiter=300)
    it_df = mg.last_iters
    mg2 = MultigridShellSystem(mesh, MAT, dtype=jnp.float32, df_operator=True,
                               use_pallas=False, class_operator=False)
    u2 = mg2.solve_df(forces, rtol=1e-8, maxiter=300)
    assert it_df <= mg2.last_iters + 5
    assert np.abs(u - u2).max() < 1e-3 * np.abs(u2).max()


def test_df_cycle_galerkin_roof():
    """df_cycle on a small curved roof (auto Galerkin hierarchy):
    converges and matches the f64 reference solve. Pins the whole df
    chain — df RAP coarse pairs, df smoothing/transfers, f64 coarsest
    inverse of the df pair."""
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    mesh, forces, mid = scordelis_lo(16)
    ref = MultigridShellSystem(mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float64)
    u64 = ref.solve(forces, rtol=1e-10)
    mg = MultigridShellSystem(mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float32,
                              df_operator=True, df_cycle=True,
                              use_pallas=False, smoother="chebyshev")
    assert mg.coarse_op == "galerkin"
    assert all(p is not None for p in mg._pairs[1:])
    u = mg.solve_df(forces, rtol=1e-6, maxiter=400)
    # CPU jit BREAKS the EFTs (fma contraction, ops/df.py header): the
    # pair degrades below f32 and the curved cycle stalls early — this
    # test only pins structure + ballpark convergence. The eps49-class
    # residual/accuracy assertions run on the TPU
    # (tools/run_tpu_tests.py df-cycle section / roof_dfcycle_probe.py).
    assert mg.last_residual < 5e-2
    assert np.abs(u[mid, 2] - u64[mid, 2]) < 5e-2 * np.abs(u64[mid, 2])


def test_df_cycle_kcycle_runs():
    """cycle='K' composes with the df cycle (df FCG coarse solves +
    flexible outer CG)."""
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    mesh, forces, mid = scordelis_lo(16)
    mg = MultigridShellSystem(mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float32,
                              df_operator=True, df_cycle=True, cycle="K",
                              use_pallas=False, smoother="chebyshev")
    u = mg.solve_df(forces, rtol=1e-6, maxiter=400)
    # loose bound: CPU jit breaks the EFTs (see test above)
    assert mg.last_residual < 1e-3
    assert np.isfinite(u).all()


def test_df_cycle_kcycle_bounded_depth():
    """k_depth bounds the K recursion (trace size is 2^depth; the
    unbounded df K OOMed the remote compiler at 512^2) — the truncated
    cycle stays SPD and converges."""
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    mesh, forces, mid = scordelis_lo(16)
    mg = MultigridShellSystem(mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float32,
                              df_operator=True, df_cycle=True, cycle="K",
                              k_depth=1, use_pallas=False,
                              smoother="chebyshev")
    u = mg.solve_df(forces, rtol=1e-6, maxiter=400)
    assert mg.last_residual < 1e-3
    assert np.isfinite(u).all()


def test_df_cycle_reassemble_rebuilds_pairs():
    """reassemble() regenerates the df coarse pairs and the f64 coarsest
    inverse; a second solve reproduces the first."""
    mesh, forces = _plate(16)
    mg = MultigridShellSystem(mesh, MAT, dtype=jnp.float32, df_operator=True,
                              df_cycle=True, use_pallas=False)
    u1 = mg.solve_df(forces, rtol=1e-8, maxiter=300)
    mg.reassemble()
    assert all(p is not None for p in mg._pairs[1:])
    assert mg.levels[-1].dense_inv is not None
    u2 = mg.solve_df(forces, rtol=1e-8, maxiter=300)
    np.testing.assert_allclose(u1, u2, rtol=0, atol=1e-9 * np.abs(u1).max())


def test_df_cycle_requires_df_operator():
    mesh, _ = _plate(16)
    with pytest.raises(ValueError):
        MultigridShellSystem(mesh, MAT, dtype=jnp.float32, df_cycle=True)
