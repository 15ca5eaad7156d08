"""Halo-exchange SPMD solver tests (strip partition + ppermute halos)."""
import jax.numpy as jnp
import numpy as np
import pytest

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.parallel.sharded import make_device_mesh
from fem_shell_tpu.parallel.stencil_shard import ShardedStencilSystem
from fem_shell_tpu.system import ShellSystem

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def case(et="q", n=40):
    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, et == "q", "z")
    mesh, rows, fac = generate(p)
    return mesh, rows * fac


@pytest.mark.parametrize("ndev", [1, 2, 4])
def test_quad_halo_invariance(ndev):
    mesh, forces = case("q", 40)
    ref = np.asarray(ShellSystem(mesh, MAT).solve(forces))
    s = ShardedStencilSystem(mesh, MAT, make_device_mesh(ndev), dtype=jnp.float64, chunk=512)
    u = s.solve(forces)
    assert np.abs(u - ref).max() < 1e-12 * np.abs(ref).max()
    assert s.last_residual < 1e-9


def test_tri_halo():
    mesh, forces = case("t", 32)
    ref = np.asarray(ShellSystem(mesh, MAT).solve(forces))
    s = ShardedStencilSystem(mesh, MAT, make_device_mesh(2), dtype=jnp.float64, chunk=512)
    u = s.solve(forces)
    assert np.abs(u - ref).max() < 1e-12 * np.abs(ref).max()


def test_narrow_strip_rejected():
    mesh, forces = case("q", 20)  # 441 nodes over 8 shards -> L=128 < 2W=256
    with pytest.raises(ValueError, match="strips too narrow"):
        ShardedStencilSystem(mesh, MAT, make_device_mesh(8), dtype=jnp.float64)
