"""Element-kernel property tests (symmetry, rigid-body modes, invariance).

The reference has no unit tests; these encode the mathematical invariants
of the shell element (doc/shellelements.tex) that any correct
implementation must satisfy, independent of golden values.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_shell_tpu.materials import material_matrices
from fem_shell_tpu.ops.elements import quad_shell_stiffness, tri_shell_stiffness

RNG = np.random.default_rng(42)
NU, EM, T = 0.3, 1e6, 0.1
DM, DP = material_matrices(NU, EM, T)

tri_jit = jax.jit(tri_shell_stiffness)
quad_jit = jax.jit(quad_shell_stiffness)


def random_rotation():
    q = RNG.normal(size=(3, 3))
    qr, _ = np.linalg.qr(q)
    if np.linalg.det(qr) < 0:
        qr[:, 0] *= -1
    return qr


def rand_tri():
    pts = np.zeros((3, 3))
    pts[:, :2] = RNG.uniform(-1, 1, (3, 2)) * 2
    while abs(np.cross(pts[1, :2] - pts[0, :2], pts[2, :2] - pts[0, :2])) < 0.3:
        pts[:, :2] = RNG.uniform(-1, 1, (3, 2)) * 2
    r = random_rotation()
    return pts @ r.T + RNG.uniform(-3, 3, 3)


def rand_quad():
    base = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    pts = np.zeros((4, 3))
    pts[:, :2] = (base + RNG.uniform(-0.1, 0.1, (4, 2))) * 2
    r = random_rotation()
    return pts @ r.T + RNG.uniform(-3, 3, 3)


@pytest.mark.parametrize("make,kfn,n", [(rand_tri, tri_jit, 3), (rand_quad, quad_jit, 4)])
def test_symmetry(make, kfn, n):
    for _ in range(5):
        ke = np.asarray(kfn(make(), DM, DP, T))
        np.testing.assert_allclose(ke, ke.T, atol=1e-9 * np.abs(ke).max())


@pytest.mark.parametrize("make,kfn,n", [(rand_tri, tri_jit, 3), (rand_quad, quad_jit, 4)])
def test_rigid_translation_zero_force(make, kfn, n):
    """Uniform translation in x/y/z produces zero elastic force."""
    for _ in range(3):
        ke = np.asarray(kfn(make(), DM, DP, T))
        for d in range(3):
            u = np.zeros(6 * n)
            u[d::6] = 1.0
            f = ke @ u
            assert np.abs(f).max() < 1e-8 * np.abs(ke).max()


@pytest.mark.parametrize("make,kfn,n", [(rand_tri, tri_jit, 3), (rand_quad, quad_jit, 4)])
def test_positive_semidefinite(make, kfn, n):
    for _ in range(3):
        ke = np.asarray(kfn(make(), DM, DP, T))
        w = np.linalg.eigvalsh(0.5 * (ke + ke.T))
        assert w.min() > -1e-8 * np.abs(w).max()


@pytest.mark.parametrize("make,kfn,n", [(rand_tri, tri_jit, 3), (rand_quad, quad_jit, 4)])
def test_frame_invariance(make, kfn, n):
    """Rotating the element rotates K congruently: K(Rx) = T K(x) T^T with
    the block-diagonal rotation T (objectivity of the shell element)."""
    xyz = make()
    ke = np.asarray(kfn(xyz, DM, DP, T))
    r = random_rotation()
    ke_rot = np.asarray(kfn(xyz @ r.T, DM, DP, T))
    t6 = np.zeros((6, 6))
    t6[:3, :3] = r
    t6[3:, 3:] = r
    big = np.kron(np.eye(n), t6)
    np.testing.assert_allclose(ke_rot, big @ ke @ big.T, atol=2e-7 * np.abs(ke).max())


def test_membrane_plate_decoupling_flat():
    """For an element in the global xy-plane, membrane dofs (u,v) must not
    couple to plate dofs (w,tx,ty)."""
    xyz = np.array([[0.0, 0, 0], [2, 0.2, 0], [0.7, 1.5, 0]])
    ke = np.asarray(tri_jit(xyz, DM, DP, T))
    scale = np.abs(ke).max()
    for i in range(3):
        for j in range(3):
            blk = ke[6 * i : 6 * i + 6, 6 * j : 6 * j + 6]
            assert np.abs(blk[0:2, 2:5]).max() < 1e-12 * scale
            assert np.abs(blk[2:5, 0:2]).max() < 1e-12 * scale


def test_drilling_diagonal_value():
    """Drilling blocks equal max of sub-block diagonals / 1000
    (fem-shell.cpp:1035-1051). Uses an element whose local frame coincides
    with the global frame (A at origin, B on +x) so the drilling entries are
    directly visible in the global matrix."""
    xyz = np.array([[0.0, 0, 0], [2, 0.0, 0], [0.7, 1.5, 0]])
    ke = np.asarray(tri_jit(xyz, DM, DP, T))
    for i in range(3):
        for j in range(3):
            blk = ke[6 * i : 6 * i + 6, 6 * j : 6 * j + 6]
            expected = max(blk[0, 0], blk[1, 1], blk[2, 2], blk[3, 3], blk[4, 4]) / 1000.0
            np.testing.assert_allclose(blk[5, 5], expected, rtol=1e-12)


def test_batched_matches_single():
    from fem_shell_tpu.ops.elements import batched_tri_stiffness

    coords = np.array([rand_tri() for _ in range(4)]).reshape(-1, 3)
    conn = np.arange(12, dtype=np.int32).reshape(4, 3)
    kes = np.asarray(
        jax.jit(batched_tri_stiffness)(jnp.asarray(coords), jnp.asarray(conn), DM, DP, T)
    )
    for e in range(4):
        single = np.asarray(tri_jit(coords[conn[e]], DM, DP, T))
        np.testing.assert_allclose(kes[e], single, rtol=1e-12, atol=1e-9 * np.abs(single).max())
