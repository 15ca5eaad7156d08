"""Sharded production-df solvers (parallel/df_shard.py): shard-count
invariance and golden accuracy on the virtual CPU device mesh.

CPU-jitted EFTs are degraded (LLVM FMA contraction), so tolerances here
are looser than the TPU contract; what these tests pin is the SPMD
machinery — halo-df exchange, distributed df CG, sharded V-cycle
preconditioning — producing shard-count-independent, golden-window
solutions. Reference analog: Test G (doc/validation.tex:518).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.parallel.sharded import make_device_mesh

MAT = Material(nu=0.3, em=1e7, thickness=0.5)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 (virtual) devices"
)


def test_sharded_df_jacobi_invariance():
    from fem_shell_tpu.parallel.df_shard import ShardedDFShellSystem

    p = MeshGenParams("q", 8, 64, 0, 0, 1, 8, (0, 0, 0, 0), 1.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    us = {}
    for nd in (1, 2, 4):
        sys = ShardedDFShellSystem(mesh, MAT, make_device_mesh(nd))
        u = sys.solve(rows * fac, rtol=1e-9, maxiter=20000)
        assert sys.last_residual < 1e-9
        us[nd] = u
    scale = np.abs(us[1]).max()
    assert np.abs(us[1] - us[2]).max() < 1e-5 * scale
    assert np.abs(us[1] - us[4]).max() < 1e-5 * scale
    # f64 oracle parity (CPU df floor)
    from fem_shell_tpu.system import ShellSystem

    u64 = np.asarray(ShellSystem(mesh, MAT).solve(rows * fac))
    assert np.abs(us[1] - u64).max() < 1e-4 * np.abs(u64).max()


def test_sharded_mgdf_golden_and_invariance():
    from fem_shell_tpu.parallel.df_shard import ShardedMGDFShellSystem

    p = MeshGenParams("q", 64, 64, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    us, iters = {}, {}
    for nd in (1, 4):
        sys = ShardedMGDFShellSystem(mesh, MAT, make_device_mesh(nd))
        u = sys.solve_df(rows * fac, rtol=1e-9, maxiter=100)
        assert sys.last_residual < 1e-9
        us[nd], iters[nd] = u, sys.last_iters
    for nd in (1, 4):
        w = float(us[nd][mesh.n_nodes // 2, 2])
        assert abs(w - 0.106465) / 0.106465 < 5e-5, (nd, w)
        assert iters[nd] < 40  # MG keeps the count mesh-independent
    scale = np.abs(us[1]).max()
    assert np.abs(us[1] - us[4]).max() < 1e-6 * scale
