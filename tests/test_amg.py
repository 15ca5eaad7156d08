"""Smoothed-aggregation AMG (fem_shell_tpu/amg.py): unstructured-mesh
multigrid — the libMesh+PETSc arbitrary-mesh default's analog
(doc/implementation.tex:11,463-486)."""
import numpy as np
import pytest

import jax.numpy as jnp

from fem_shell_tpu.amg import AMGShellSystem
from fem_shell_tpu.materials import Material
from fem_shell_tpu.mesh import permute_nodes, refine_uniform
from fem_shell_tpu.meshgen import MeshGenParams, generate

from helpers import mesh_from_tris

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def test_amg_renumbered_plate_parity():
    """Randomly renumbered plate: no stencil structure available; AMG
    must stay mesh-independent-ish and match the direct solver."""
    from fem_shell_tpu.system import ShellSystem

    p = MeshGenParams("q", 48, 48, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    perm = np.random.default_rng(0).permutation(mesh.n_nodes)
    mesh2 = permute_nodes(mesh, perm)
    forces2 = (rows * fac)[perm]
    amg = AMGShellSystem(mesh2, MAT)
    u = amg.solve(forces2, rtol=1e-10)
    assert amg.last_iters < 40, amg.last_iters
    u_ref = np.asarray(ShellSystem(mesh2, MAT).solve(forces2))
    assert np.abs(u - u_ref).max() < 1e-9 * np.abs(u_ref).max()


def test_amg_refined_ibeam():
    """Genuinely unstructured geometry: the Test-E I-beam refined twice
    (3,264 elements); AMG parity vs the f64 Jacobi-PCG reference."""
    from fem_shell_tpu.data import test_e as E
    from fem_shell_tpu.large import LargeShellSystem

    mat = Material(nu=0.25, em=10000, thickness=0.25)
    mesh = mesh_from_tris(E.COORDS, E.TRIS, E.BOUNDARY_SIDES)
    fine = refine_uniform(mesh, 2)
    # refine forces consistently: original nodes keep their loads (new
    # nodes unloaded) — a legal load vector for the refined model
    f = np.zeros((fine.n_nodes, 6))
    f[: mesh.n_nodes] = E.FORCES
    amg = AMGShellSystem(fine, mat)
    u = amg.solve(f, rtol=1e-10, maxiter=300)
    assert amg.last_residual < 1e-10
    assert amg.last_iters < 120, amg.last_iters
    ref = LargeShellSystem(fine, mat, dtype=jnp.float64)
    u_ref = np.asarray(ref.solve(f, rtol=1e-12, maxiter=200000))
    assert np.abs(u - u_ref).max() < 1e-7 * np.abs(u_ref).max()


def test_amg_df_solve_golden():
    """AMG-df: two-f32 outer CG on the equilibrated operator with the
    f32 AMG W-cycle preconditioner — the TPU production configuration
    for unstructured meshes. CPU-jit EFTs are degraded, so the oracle
    tolerance pins the machinery (1e-4); mesh-independence is pinned by
    the iteration cap."""
    from fem_shell_tpu.system import ShellSystem

    p = MeshGenParams("q", 40, 40, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    perm = np.random.default_rng(5).permutation(mesh.n_nodes)
    mesh2 = permute_nodes(mesh, perm)
    f2 = (rows * fac)[perm]
    amg = AMGShellSystem(mesh2, MAT, dtype=jnp.float32, df=True)
    u = amg.solve_df(f2, rtol=1e-9, maxiter=400)
    assert amg.last_residual < 1e-9
    assert amg.last_iters < 60, amg.last_iters
    u_ref = np.asarray(ShellSystem(mesh2, MAT).solve(f2, rtol=1e-12))
    # 3e-4: CPU-jit df floor (LLVM FMA-contracts the EFTs — measured
    # 1.2e-4 here); the TPU contract is the eps49 class
    assert np.abs(u - u_ref).max() < 3e-4 * np.abs(u_ref).max()
    # solve() must stay correct on a scaled (df=True) hierarchy: the
    # b/x scaling round-trip (f64 levels so 1e-8 is reachable)
    amg64 = AMGShellSystem(mesh2, MAT, dtype=jnp.float64, df=True)
    u2 = amg64.solve(f2, rtol=1e-10)
    assert np.abs(u2 - u_ref).max() < 1e-8 * np.abs(u_ref).max()


def test_amg_df_refined_golden():
    """AMG-df + E-corrected refinement: with the residual run eagerly
    (exact on CPU), the refinement must push well past the CPU df floor
    — 1e-8 oracle parity on a renumbered mesh."""
    from fem_shell_tpu.system import ShellSystem

    p = MeshGenParams("q", 40, 40, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    perm = np.random.default_rng(7).permutation(mesh.n_nodes)
    mesh2 = permute_nodes(mesh, perm)
    f2 = (rows * fac)[perm]
    amg = AMGShellSystem(mesh2, MAT, dtype=jnp.float32, df=True)
    u = amg.solve_df_refined(f2, rtol=1e-11, inner_rtol=1e-6,
                             jit_residual=False)
    assert len(amg.refine_history) >= 1
    u_ref = np.asarray(ShellSystem(mesh2, MAT).solve(f2, rtol=1e-13))
    err = np.abs(u - u_ref).max() / np.abs(u_ref).max()
    assert err < 1e-8, (err, amg.refine_history)


@pytest.mark.slow
def test_amg_million_dof():
    """SURVEY/VERDICT target: >=1M DOF unstructured-path mesh in <100
    iterations, golden-accurate center deflection."""
    p = MeshGenParams("q", 416, 416, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    perm = np.random.default_rng(1).permutation(mesh.n_nodes)
    mesh2 = permute_nodes(mesh, perm)
    assert mesh2.n_dofs >= 1_000_000
    amg = AMGShellSystem(mesh2, MAT)
    u = amg.solve((rows * fac)[perm], rtol=1e-10, maxiter=200)
    assert amg.last_residual < 1e-10
    assert amg.last_iters < 100, amg.last_iters
    center_new = int(np.nonzero(perm == mesh.n_nodes // 2)[0][0])
    w = float(u[center_new, 2])
    # golden is the ANALYTIC Kirchhoff value; the DKQ element's own
    # converged plateau sits ~5.8e-4 ABOVE it (w -> 0.106466; the same
    # plateau the 2304^2 refined scale run and the reference's Test-G
    # n=64 value 0.106454 approach), so gate at 1e-3 — discretization
    # limit, not solver tolerance.
    assert abs(w - 0.1064045) / 0.1064045 < 1e-3, w
