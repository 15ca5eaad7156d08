"""RCM reordering + unstructured-mesh fast-path tests.

Reference generality target: libMesh+Metis handle arbitrary meshes
(doc/implementation.tex:11,463-486). Here arbitrary node numberings are
bandwidth-reduced with reverse Cuthill-McKee so the SoA operator's
gathers stay local, and general (gather-mode) meshes get the block-Jacobi
preconditioner and df solves.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fem_shell_tpu.materials import Material
from fem_shell_tpu.mesh import ShellMesh, bandwidth, permute_nodes, rcm_order
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.large import LargeShellSystem
from fem_shell_tpu.system import ShellSystem
from fem_shell_tpu.data import test_e as E

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def _permuted_plate(n=12, seed=0):
    pm = MeshGenParams("q", n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(pm)
    forces = rows * fac
    perm = np.random.default_rng(seed).permutation(mesh.n_nodes)
    scrambled = permute_nodes(mesh, perm)
    # forces follow the relabeling: new node j carries old node perm[j]
    return mesh, scrambled, forces, forces[perm]


def test_rcm_reduces_bandwidth():
    _, scrambled, _, _ = _permuted_plate()
    b0 = bandwidth(scrambled)
    banded = permute_nodes(scrambled, rcm_order(scrambled))
    b1 = bandwidth(banded)
    assert b1 < b0 / 4, (b0, b1)
    assert b1 <= 30  # 12x12 grid: RCM ~ grid bandwidth (nxp+1 = 14)


def test_rcm_solution_matches_reference():
    """Scrambled-numbering mesh through LargeShellSystem(reorder='rcm'):
    solution identical (original numbering) to the AoS reference path."""
    mesh, scrambled, forces, forces_s = _permuted_plate()
    ref = np.asarray(ShellSystem(mesh, MAT).solve(forces))
    big = LargeShellSystem(scrambled, MAT, dtype=jnp.float64, reorder="rcm")
    u = big.solve(forces_s, rtol=1e-12)
    # undo the scramble: scrambled node j = original node perm[j]
    perm = np.random.default_rng(0).permutation(mesh.n_nodes)
    back = np.empty_like(u)
    back[perm] = u[np.arange(len(perm))]
    # u is indexed by scrambled ids; map to original ids
    assert np.abs(u - ref[perm]).max() < 1e-12 * np.abs(ref).max()


def test_block_jacobi_cuts_iterations_vs_jacobi():
    """The gather-mode iteration story: block-Jacobi (PETSc bjacobi
    analog) must beat scalar Jacobi when node frames mix DOF scales.
    (On a FLAT uniform plate the 6x6 self-blocks are diagonal by
    symmetry, so the comparison needs true 3D shell geometry — the
    I-beam's web/flange nodes couple u,v,w through their local frames.)"""
    from helpers import mesh_from_tris

    mesh = mesh_from_tris(E.COORDS, E.TRIS, E.BOUNDARY_SIDES)
    mat = Material(nu=0.25, em=10000, thickness=0.25)
    big = LargeShellSystem(mesh, mat, dtype=jnp.float64, reorder="rcm")
    big.solve(E.FORCES, rtol=1e-10, precond="jacobi")
    it_j = int(big.last_cg.iters)
    big.solve(E.FORCES, rtol=1e-10, precond="block_jacobi")
    it_bj = int(big.last_cg.iters)
    assert it_bj < 0.8 * it_j, (it_bj, it_j)


def test_ibeam_through_large_system_rcm():
    """Test-E I-beam (hand-made unstructured fixture) through the SoA
    machinery with RCM: parity with ShellSystem <= 1e-12."""
    from helpers import mesh_from_tris

    mesh = mesh_from_tris(E.COORDS, E.TRIS, E.BOUNDARY_SIDES)
    mat = Material(nu=0.25, em=10000, thickness=0.25)
    ref = np.asarray(ShellSystem(mesh, mat).solve(E.FORCES))
    big = LargeShellSystem(mesh, mat, dtype=jnp.float64, reorder="rcm")
    u = big.solve(E.FORCES, rtol=1e-12, precond="block_jacobi")
    assert np.abs(u - ref).max() < 1e-12 * np.abs(ref).max()
