"""Sharded multigrid tests (virtual 8-device CPU mesh, f64).

The multi-chip analog of Test-G's process-count invariance
(doc/validation.tex:518) with mesh-independent MG iteration counts on
top: the same plate must solve to the same answer with the same ~30
iterations on 1..8 shards, exercising sharded->sharded and
sharded->replicated level transfers.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.parallel.sharded import make_device_mesh
from fem_shell_tpu.parallel.mg_shard import ShardedMGShellSystem
from fem_shell_tpu.system import ShellSystem

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def _case(n=32):
    p = MeshGenParams("q", n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    return mesh, rows * fac


@pytest.mark.parametrize("s,n", [(1, 32), (2, 32), (4, 32), (8, 64)])
def test_sharded_mg_matches_reference_and_iters(s, n):
    # halo strips need L = rows*nxp >= 2*ceil(halo,128): 8 shards need the
    # 64^2 grid (a 32^2 strip is 6 rows * 33 lanes = 198 < 256)
    mesh, forces = _case(n)
    ref = np.asarray(ShellSystem(mesh, MAT).solve(forces))
    mg = ShardedMGShellSystem(mesh, MAT, make_device_mesh(s), dtype=jnp.float64)
    u = mg.solve(forces, rtol=1e-10, maxiter=100)
    assert mg.last_residual < 1e-10
    assert mg.last_iters < 40, mg.last_iters
    assert np.abs(u - ref).max() < 1e-7 * np.abs(ref).max()


def test_sharded_mg_shard_count_invariance():
    mesh, forces = _case(32)
    sols = {}
    iters = {}
    for s in (1, 4):
        mg = ShardedMGShellSystem(mesh, MAT, make_device_mesh(s), dtype=jnp.float64)
        sols[s] = mg.solve(forces, rtol=1e-10, maxiter=100)
        iters[s] = mg.last_iters
    scale = np.abs(sols[1]).max()
    assert np.abs(sols[1] - sols[4]).max() < 1e-9 * scale
    assert abs(iters[1] - iters[4]) <= 3, iters


@pytest.mark.slow
def test_sharded_mg_iterations_mesh_independent():
    counts = {}
    for n in (32, 64):
        mesh, forces = _case(n)
        mg = ShardedMGShellSystem(mesh, MAT, make_device_mesh(4), dtype=jnp.float64)
        mg.solve(forces, rtol=1e-10, maxiter=100)
        counts[n] = mg.last_iters
    assert counts[64] <= counts[32] + 10, counts
