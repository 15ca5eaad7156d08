"""Differentiability of the solve pipeline — a capability the reference
C++ stack has no analog for: jax.grad through assemble+solve yields load
and shape sensitivities.
"""
import jax
import jax.numpy as jnp
import numpy as np

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.system import ShellSystem


def _setup(n=4):
    p = MeshGenParams("q", n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    return mesh, jnp.asarray(rows * fac)


def test_grad_wrt_loads():
    """d(center deflection)/d(loads) == the corresponding row of K^-1
    (linear system => gradient equals the influence function); validated
    against a finite difference."""
    mesh, forces = _setup()
    system = ShellSystem(mesh, Material(0.3, 1e7, 0.5))
    center = mesh.n_nodes // 2

    def center_w(f):
        x, _ = system._solve_pcg_impl(system.coords, f, 1e-12, 5000, "block_jacobi", differentiable=True)
        return x[center, 2]

    g = jax.grad(center_w)(forces)
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference check on one load component
    probe = (7, 2)
    eps = 1e-3
    fp = forces.at[probe].add(eps)
    fm = forces.at[probe].add(-eps)
    fd = (center_w(fp) - center_w(fm)) / (2 * eps)
    np.testing.assert_allclose(float(g[probe]), float(fd), rtol=1e-5)


def test_grad_wrt_coordinates():
    """Shape sensitivity: d(compliance)/d(node coords) through the full
    element-kernel + assembly + CG pipeline."""
    mesh, forces = _setup()
    system = ShellSystem(mesh, Material(0.3, 1e7, 0.5))

    def compliance(coords):
        x, _ = system._solve_pcg_impl(coords, forces, 1e-12, 5000, "block_jacobi", differentiable=True)
        return jnp.sum(x * forces)

    g = jax.grad(compliance)(system.coords)
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference check: move one interior node in-plane
    node = mesh.n_nodes // 2 + 1
    eps = 1e-4
    cp = system.coords.at[node, 0].add(eps)
    cm = system.coords.at[node, 0].add(-eps)
    fd = (compliance(cp) - compliance(cm)) / (2 * eps)
    np.testing.assert_allclose(float(g[node, 0]), float(fd), rtol=1e-4)
