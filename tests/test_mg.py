"""Geometric multigrid preconditioner tests (f64 paths; the mixed df+MG
solve is TPU-only and validated there)."""
import jax.numpy as jnp
import numpy as np
import pytest

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.mg import MultigridShellSystem, _prolong, _restrict
from fem_shell_tpu.system import ShellSystem

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def test_restrict_is_prolong_transpose():
    """<P xc, xf> == <xc, P^T xf> for random grids (exact adjointness is
    required for the V-cycle to be an SPD preconditioner)."""
    rng = np.random.default_rng(0)
    xc = jnp.asarray(rng.normal(size=(6, 9, 9)))
    xf = jnp.asarray(rng.normal(size=(6, 17, 17)))
    lhs = float(jnp.sum(_prolong(xc) * xf))
    rhs = float(jnp.sum(xc * _restrict(xf)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-13)


def test_mg_matches_reference_solution():
    p = MeshGenParams("q", 32, 32, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    forces = rows * fac
    ref = np.asarray(ShellSystem(mesh, MAT).solve(forces))
    mg = MultigridShellSystem(p, MAT)
    u = mg.solve(forces, rtol=1e-10)
    assert np.abs(u - ref).max() < 1e-8 * np.abs(ref).max()


def test_mg_iteration_count_mesh_independent():
    """The whole point: MG-PCG iterations stay ~constant under refinement
    (Jacobi-PCG grows ~O(n^2) on plates)."""
    counts = {}
    for n in (32, 64):
        p = MeshGenParams("q", n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
        mesh, rows, fac = generate(p)
        mg = MultigridShellSystem(p, MAT)
        mg.solve(rows * fac, rtol=1e-10)
        counts[n] = int(mg.last_cg.iters)
    assert counts[32] < 60 and counts[64] < 60
    assert counts[64] <= 2 * counts[32]


def test_mg_rejects_unsupported_grids():
    p = MeshGenParams("q", 30, 30, 0, 0, 1, 1, (0, 0, 0, 0), 1.0, 2, True, "z")
    mg = MultigridShellSystem(p, MAT, n_levels=2)  # 30/2=15 ok
    with pytest.raises(ValueError):
        MultigridShellSystem(p, MAT, n_levels=3)  # 30/4 not integer


def test_mg_chebyshev_smoother_matches_reference():
    """Chebyshev-smoothed V-cycle: same answer as the direct solver, and
    at least as few iterations as the damped-Jacobi smoother (it exists
    to flatten iteration growth at depth, VERDICT r1 #8)."""
    p = MeshGenParams("q", 32, 32, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    forces = rows * fac
    ref = np.asarray(ShellSystem(mesh, MAT).solve(forces))
    mg_j = MultigridShellSystem(p, MAT)
    mg_j.solve(forces, rtol=1e-10)
    mg_c = MultigridShellSystem(p, MAT, smoother="chebyshev")
    u = mg_c.solve(forces, rtol=1e-10)
    assert np.abs(u - ref).max() < 1e-8 * np.abs(ref).max()
    assert mg_c.last_cg.iters <= mg_j.last_cg.iters + 2, (
        int(mg_c.last_cg.iters),
        int(mg_j.last_cg.iters),
    )


def test_stencil_rap_matches_dense_ptap():
    """stencil_rap (the Galerkin coarse-level builder) equals the dense
    P^T A P with bilinear P — on a curved quad grid (Scordelis-Lo roof,
    9-offset fine stencil) and a flat tri grid (7-offset fine stencil
    whose RAP fills the full 9-point coarse pattern)."""
    import jax

    from fem_shell_tpu.mg import _densify
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    def dense_rap(mg):
        fine, coarse = mg.levels[0], mg.levels[1]
        nc = coarse.nyp * coarse.nxp
        eye = jnp.eye(6 * nc).reshape(6 * nc, 6, coarse.nyp, coarse.nxp)
        P = np.asarray(
            jax.vmap(_prolong)(eye).reshape(6 * nc, 6 * fine.nyp * fine.nxp)
        ).T
        A = np.asarray(_densify(fine), np.float64)
        C = P.T @ A @ P
        free_c = np.asarray(coarse.free_t)[:, :nc].reshape(-1).astype(bool)
        C[~free_c, :] = 0.0
        C[:, ~free_c] = 0.0
        C[np.ix_(~free_c, ~free_c)] = np.eye((~free_c).sum())
        return C

    roof, _, _ = scordelis_lo(8)
    plate, _, _ = generate(
        MeshGenParams("t", 8, 8, 0, 0, 1, 1, (1, 1, -1, -1), 1.0, 0, True, "z")
    )
    for mesh, mat in ((roof, SCORDELIS_LO_MATERIAL), (plate, MAT)):
        g = MultigridShellSystem(mesh, mat, dtype=jnp.float64, n_levels=2,
                                 coarse_op="galerkin")
        r = MultigridShellSystem(mesh, mat, dtype=jnp.float64, n_levels=2,
                                 coarse_op="rediscretize")
        C_stencil = np.asarray(_densify(g.levels[1]), np.float64)
        C_dense = dense_rap(r)
        err = np.abs(C_stencil - C_dense).max() / np.abs(C_dense).max()
        assert err < 1e-12, err


def test_coarse_op_auto_selection():
    """None = auto: flat meshes keep the (cheaper) rediscretized coarse
    levels — identical behavior to previous rounds — while non-planar
    meshes pick galerkin."""
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    p = MeshGenParams("q", 8, 8, 0, 0, 1, 1, (0, 0, 0, 0), 1.0, 2, True, "z")
    flat = MultigridShellSystem(p, MAT, n_levels=2)
    assert flat.coarse_op == "rediscretize"
    roof, _, _ = scordelis_lo(8)
    curved = MultigridShellSystem(roof, SCORDELIS_LO_MATERIAL, n_levels=2)
    assert curved.coarse_op == "galerkin"
    with pytest.raises(ValueError):
        MultigridShellSystem(roof, SCORDELIS_LO_MATERIAL, n_levels=2,
                             coarse_op="nonsense")


def test_staged_forces_device_resident_io():
    """stage_forces / return_device / fetch_solution: the device-resident
    IO contract (the remote-tunnel full-field round trip costs more than
    the whole 1024^2 device solve, r5) must be bit-identical to the host
    path — same jitted program, same operands."""
    p = MeshGenParams("q", 16, 16, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    forces = rows * fac
    mg = MultigridShellSystem(p, MAT, dtype=jnp.float32, df_operator=True,
                              use_pallas=False)
    u_host = mg.solve_df(forces, rtol=1e-9)
    f_dev = mg.stage_forces(forces)
    assert f_dev.shape == (6, mg._fine.npad)
    x_dev = mg.solve_df(f_dev, rtol=1e-9, return_device=True)
    u_dev = mg.fetch_solution(x_dev)
    np.testing.assert_array_equal(u_host, u_dev)
    # refined path accepts the same staged handle
    x_ref = mg.solve_df_refined(f_dev, rtol=1e-7, return_device=True)
    u_ref = mg.fetch_solution(x_ref)
    # loose bound: CPU-jitted EFTs are degraded (ops/df.py docstring) —
    # this checks the staged-handle PLUMBING, not df accuracy (TPU runner)
    assert np.abs(u_ref - u_host).max() < 1e-4 * np.abs(u_host).max()
