"""SoA gather-mode coverage: a randomly permuted node numbering destroys
the constant-offset (stencil) property, forcing the general adj_t path —
which must produce identical solutions."""
import jax.numpy as jnp
import numpy as np

from fem_shell_tpu.materials import Material
from fem_shell_tpu.mesh import ShellMesh
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.system import ShellSystem

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def permuted_plate(n=10, seed=0):
    p = MeshGenParams("q", n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    forces = rows * fac
    rng = np.random.default_rng(seed)
    perm = rng.permutation(mesh.n_nodes)  # new id of old node i = perm[i]
    inv = np.argsort(perm)
    coords = mesh.coords[inv]
    conn = mesh.elem_conn.copy()
    valid = conn >= 0
    conn[valid] = perm[conn[valid]]
    pm = ShellMesh(coords, mesh.elem_types, conn, mesh.boundary_sides)
    return mesh, pm, forces, perm


def test_permuted_mesh_uses_gather_mode():
    from fem_shell_tpu.ops.soa import build_soa_pattern

    _, pm, _, _ = permuted_plate()
    pat = build_soa_pattern(pm)
    assert pat.offsets is None and pat.adj_t is not None


def test_gather_mode_solution_matches():
    from fem_shell_tpu.large import LargeShellSystem

    mesh, pm, forces, perm = permuted_plate()
    u_ref = np.asarray(ShellSystem(mesh, MAT).solve(forces))
    big = LargeShellSystem(pm, MAT, dtype=jnp.float64, chunk=64)
    assert big.offsets is None  # gather mode
    forces_perm = forces[np.argsort(perm)]  # forces_perm[perm[i]] == forces[i]
    u_perm = big.solve(forces_perm)
    # u_perm rows are in permuted numbering: u_perm[perm[i]] == u_ref[i]
    np.testing.assert_allclose(u_perm[perm], u_ref, atol=1e-11 * np.abs(u_ref).max())


def test_stencil_mode_on_structured():
    from fem_shell_tpu.ops.soa import build_soa_pattern

    p = MeshGenParams("t", 6, 6, 0, 0, 1, 1, (0, 0, 0, 0), 1.0, 1, False, "z")
    mesh, _, _ = generate(p)
    pat = build_soa_pattern(mesh)
    assert pat.offsets is not None and len(pat.offsets) <= 9
