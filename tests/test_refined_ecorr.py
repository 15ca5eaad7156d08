"""E-corrected iterative refinement on arbitrary meshes
(LargeShellSystem.solve_df_refined): the df operator's representation
error E = A64 - (hi+lo), stored f32, drives a TRUE residual — removing
the correlated stencil-perturbation error that kappa amplifies, with no
class/grid structure required (the unstructured analog of
ops/exact_stencil.py refinement).

CPU: the inner df CG is FMA-degraded under jit (plain-solve floor
~1e-4..1e-6 relative), but the residual runs EAGERLY (exact) here — so
a passing 1e-8 oracle parity demonstrates the refinement mechanism
genuinely contracting past the inner-solve floor.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from fem_shell_tpu.large import LargeShellSystem
from fem_shell_tpu.materials import Material
from fem_shell_tpu.mesh import permute_nodes
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.system import ShellSystem

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def _plate(n=48, permute=False):
    p = MeshGenParams("q", n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    f = rows * fac
    if permute:
        perm = np.random.default_rng(3).permutation(mesh.n_nodes)
        return permute_nodes(mesh, perm), f[perm]
    return mesh, f


@pytest.mark.parametrize("permute", [False, True],
                         ids=["stencil-mode", "gather-mode"])
def test_refined_ecorr_beats_plain_floor(permute):
    mesh, f = _plate(permute=permute)
    sys = LargeShellSystem(mesh, MAT, dtype=jnp.float64)
    u = sys.solve_df_refined(f, rtol=1e-11, inner_rtol=1e-6,
                             jit_residual=False)
    assert len(sys.refine_history) >= 1
    u64 = np.asarray(ShellSystem(mesh, MAT).solve(f, rtol=1e-13))
    scale = np.abs(u64).max()
    err = np.abs(u - u64).max() / scale
    assert err < 1e-8, (err, sys.refine_history)


def test_refined_requires_f64():
    mesh, f = _plate(n=8)
    sys = LargeShellSystem(mesh, MAT, dtype=jnp.float32, exact_geom=True)
    with pytest.raises(AssertionError):
        sys.solve_df_refined(f)
