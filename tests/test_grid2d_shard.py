"""2D process-grid halo solver tests (tile partition, x+y ppermute
halos, corner flow through the extended rows)."""
import jax.numpy as jnp
import numpy as np
import pytest

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.parallel.grid2d_shard import (
    Sharded2DGridSystem,
    make_device_mesh2d,
)
from fem_shell_tpu.system import ShellSystem

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def case(et="q", n=24):
    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, et == "q", "z")
    mesh, rows, fac = generate(p)
    return mesh, rows * fac


@pytest.mark.parametrize("py,px", [(1, 1), (2, 2), (2, 4), (4, 2)])
def test_quad_2d_invariance(py, px):
    """Same answer as the single-device dense-assembled reference for
    every process-grid shape (the 2D analog of reference Test G's
    process-count invariance, doc/validation.tex:518)."""
    mesh, forces = case("q", 24)
    ref = np.asarray(ShellSystem(mesh, MAT).solve(forces))
    s = Sharded2DGridSystem(
        mesh, MAT, make_device_mesh2d(py, px), dtype=jnp.float64, chunk=256
    )
    u = s.solve(forces)
    assert np.abs(u - ref).max() < 1e-12 * np.abs(ref).max()
    assert s.last_residual < 1e-9


@pytest.mark.parametrize("py,px", [(2, 2), (2, 4)])
def test_tri_2d(py, px):
    """Tri grids exercise the off-diagonal (dy=+1, dx=-1) stencil slots
    crossing tile corners diagonally."""
    mesh, forces = case("t", 20)
    ref = np.asarray(ShellSystem(mesh, MAT).solve(forces))
    s = Sharded2DGridSystem(
        mesh, MAT, make_device_mesh2d(py, px), dtype=jnp.float64, chunk=256
    )
    u = s.solve(forces)
    assert np.abs(u - ref).max() < 1e-12 * np.abs(ref).max()


def test_uneven_tiles():
    """Node grid not divisible by the process grid: edge tiles padded,
    pad nodes fully constrained."""
    mesh, forces = case("q", 21)  # 22x22 nodes over (4, 2): ly=6 pads 24
    ref = np.asarray(ShellSystem(mesh, MAT).solve(forces))
    s = Sharded2DGridSystem(
        mesh, MAT, make_device_mesh2d(4, 2), dtype=jnp.float64, chunk=256
    )
    u = s.solve(forces)
    assert np.abs(u - ref).max() < 1e-12 * np.abs(ref).max()


def test_unstructured_rejected():
    from fem_shell_tpu.data import test_a as A
    from tests.helpers import mesh_from_tris

    mesh = mesh_from_tris(A.COORDS, A.TRIS, A.BOUNDARY_SIDES)
    with pytest.raises(ValueError, match="structured grid"):
        Sharded2DGridSystem(mesh, MAT, make_device_mesh2d(2, 2))


def test_quad_2d_df():
    """PRODUCTION df CG on the 2D tile partition
    (Sharded2DGridDFSystem): df pair operator, DF vectors, 2-axis psum
    dots, both df components per halo ring. CPU-jit EFTs are degraded vs
    TPU (ops/df.py), hence the loose window vs the f64 reference."""
    from fem_shell_tpu.parallel.grid2d_shard import Sharded2DGridDFSystem

    mesh, forces = case("q", 16)
    ref = np.asarray(ShellSystem(mesh, MAT).solve(forces, rtol=1e-12))
    s = Sharded2DGridDFSystem(mesh, MAT, make_device_mesh2d(2, 4), chunk=256)
    u = s.solve(forces, rtol=1e-9, maxiter=20000)
    assert s.last_residual < 1e-9
    # unequilibrated df accumulation floor, further degraded by CPU-jit
    # FMA contraction of the EFTs (ops/df.py) — same window class as the
    # dryrun's df paths
    assert np.abs(u - ref).max() < 1e-4 * np.abs(ref).max()

    # shard-layout invariance of the df path
    s2 = Sharded2DGridDFSystem(mesh, MAT, make_device_mesh2d(4, 2), chunk=256)
    u2 = s2.solve(forces, rtol=1e-9, maxiter=20000)
    assert np.abs(u2 - ref).max() < 1e-4 * np.abs(ref).max()
