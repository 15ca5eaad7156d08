"""Golden-value integration tests A-G.

These reproduce the reference's example runner (run_examples.sh:35-48) with
the expected displacements from the thesis validation tables
(doc/validation.tex; see BASELINE.md). Meshes C/D/F/G are regenerated from
parameters with the meshgen analog (verified byte-equivalent to the shipped
XDA fixtures); A/B/E are hand-made meshes embedded as data modules.
"""
import numpy as np
import pytest

from fem_shell_tpu.data import test_a as A
from fem_shell_tpu.data import test_b as B
from fem_shell_tpu.data import test_e as E
from helpers import mesh_from_quads, mesh_from_tris, solve

from fem_shell_tpu.meshgen import MeshGenParams, generate


def plate_case(elem_type, n, bcid, loading, factor, domain=(0, 0, 10, 10), ul_lr=False):
    p = MeshGenParams(
        elem_type, n, n, domain[0], domain[1], domain[2], domain[3],
        (bcid, bcid, bcid, bcid), factor, loading, ul_lr, "z",
    )
    mesh, rows, fac = generate(p)
    return mesh, rows * fac


# ----------------------------------------------------------------------
# Test A — Tri-3 membrane cantilever (doc/validation.tex:62-65)
# ----------------------------------------------------------------------


def test_a_tri_membrane_cantilever():
    mesh = mesh_from_tris(A.COORDS, A.TRIS, A.BOUNDARY_SIDES)
    u, _ = solve(mesh, A.FORCES, nu=0.25, em=30000, t=1.0)
    np.testing.assert_allclose(u[22, 0], -0.0255988, rtol=1e-5)
    np.testing.assert_allclose(u[22, 1], 0.0629549, rtol=1e-5)
    np.testing.assert_allclose(u[26, 0], -0.0342621, rtol=1e-5)
    np.testing.assert_allclose(u[26, 1], 0.1944070, rtol=1e-5)


def test_a_dense_matches_pcg():
    mesh = mesh_from_tris(A.COORDS, A.TRIS, A.BOUNDARY_SIDES)
    u1, _ = solve(mesh, A.FORCES, nu=0.25, em=30000, t=1.0, method="dense")
    u2, _ = solve(mesh, A.FORCES, nu=0.25, em=30000, t=1.0, method="pcg")
    np.testing.assert_allclose(u1, u2, atol=1e-10)


# ----------------------------------------------------------------------
# Test B — Quad-4 membrane cantilever (doc/validation.tex:133-136)
# ----------------------------------------------------------------------


def test_b_quad_membrane_cantilever():
    mesh = mesh_from_quads(B.COORDS, B.QUADS, B.BOUNDARY_SIDES)
    u, _ = solve(mesh, B.FORCES, nu=0.25, em=30000, t=1.0)
    np.testing.assert_allclose(u[22, 0], -0.0427728, rtol=1e-5)
    np.testing.assert_allclose(u[22, 1], 0.1012620, rtol=1e-5)
    np.testing.assert_allclose(u[26, 0], -0.0570728, rtol=1e-5)
    np.testing.assert_allclose(u[26, 1], 0.3160560, rtol=1e-5)


# ----------------------------------------------------------------------
# Test C — Tri-3 plate, SS square, central point load (validation.tex:197-201)
# ----------------------------------------------------------------------


@pytest.mark.parametrize("n,golden", [(4, 1.06723), (16, 1.15169)])
def test_c_tri_plate_center_deflection(n, golden):
    mesh, forces = plate_case("t", n, bcid=0, loading=1, factor=1.0, ul_lr=False)
    u, _ = solve(mesh, forces, nu=0.3, em=10.92, t=1.0)
    center = mesh.n_nodes // 2
    np.testing.assert_allclose(u[center, 2], golden, rtol=1e-5)


# ----------------------------------------------------------------------
# Test D — Quad-4 plate, SS square (validation.tex:287-293)
# ----------------------------------------------------------------------


@pytest.mark.parametrize(
    "n,golden", [(4, 0.106032), (8, 0.106405), (16, 0.106454)]
)
def test_d_quad_plate_uniform(n, golden):
    mesh, forces = plate_case("q", n, bcid=0, loading=2, factor=300.0)
    u, _ = solve(mesh, forces, nu=0.3, em=1e7, t=0.5)
    center = mesh.n_nodes // 2
    np.testing.assert_allclose(u[center, 2], golden, rtol=1e-5)


@pytest.mark.parametrize(
    "n,golden", [(4, 0.332677), (8, 0.312851), (16, 0.306664)]
)
def test_d_quad_plate_concentrated(n, golden):
    mesh, forces = plate_case("q", n, bcid=0, loading=1, factor=30000.0)
    u, _ = solve(mesh, forces, nu=0.3, em=1e7, t=0.5)
    center = mesh.n_nodes // 2
    np.testing.assert_allclose(u[center, 2], golden, rtol=1e-5)


# ----------------------------------------------------------------------
# Test E — shell I-beam under torsion pair (validation.tex:381-383)
# ----------------------------------------------------------------------


def test_e_tri_shell_ibeam():
    """NOTE on goldens: the thesis table (doc/validation.tex:381-383) gives
    node 35 = (-0.0152698, 0.0879212, 0.1543450), but the *shipped code +
    shipped fixture* produce different signs and ~1-3% different values —
    verified by assembling the global system from element matrices computed
    by the reference C++ element routines themselves and solving directly.
    We pin the code-faithful values (the thesis table predates the shipped
    code revision) and separately check thesis-table magnitudes to 5%.
    """
    mesh = mesh_from_tris(E.COORDS, E.TRIS, E.BOUNDARY_SIDES)
    u, _ = solve(mesh, E.FORCES, nu=0.25, em=10000, t=0.25)
    # code-faithful goldens (reference element routines + direct solve)
    np.testing.assert_allclose(u[35, :3], [0.01605314, 0.08948797, -0.15605938], rtol=1e-6)
    np.testing.assert_allclose(u[44, :3], [0.01544426, -0.08905332, 0.14949037], rtol=1e-6)
    # thesis-table magnitudes within 5%
    np.testing.assert_allclose(
        np.abs(u[44, :3]), [0.0152698, 0.0879212, 0.1543450], rtol=0.05
    )


def test_e_quad_shell_ibeam():
    """Quad-4 I-beam (thesis golden doc/validation.tex:388-390: node 35 =
    -0.0246001, 0.1373650, 0.2320180). As with the tri fixture the
    shipped-code solution differs from the thesis table in sign
    convention and ~1-3% in magnitude; we pin the code-faithful values
    and check thesis magnitudes to 5%."""
    mesh = mesh_from_quads(E.COORDS, E.QUADS, E.QUAD_BOUNDARY_SIDES)
    u, _ = solve(mesh, E.FORCES, nu=0.25, em=10000, t=0.25)
    np.testing.assert_allclose(
        u[35, :3], [0.02527736, 0.13915961, -0.23064233], rtol=1e-6
    )
    np.testing.assert_allclose(
        u[44, :3], [0.02527736, -0.13915961, 0.23064233], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.abs(u[35, :3]), [0.0246001, 0.1373650, 0.2320180], rtol=0.05
    )


def test_e_mixed_tri_quad_ibeam():
    """Genuinely mixed tri+quad mesh pinned against the dense oracle:
    the z=0 flanges keep the reference tri split while web + z=5
    flanges use the fused quads — 32 tris + 24 quads in one assembly."""
    from fem_shell_tpu.mesh import ShellMesh

    types, conn, bsides = [], [], []
    tri_pairs = {
        1: lambda i: ([18 + i, 19 + i, i], [19 + i, i + 1, i]),
        2: lambda i: ([i, i + 1, 27 + i], [i + 1, 28 + i, 27 + i]),
    }
    for p in range(5):
        first = len(types)
        if p in (0, 3, 4):
            for i in range(8):
                types.append(5)
                conn.append(list(E._QUAD_PANELS[p](i)))
            bsides.append([first, 3, 0])
        else:
            for i in range(8):
                t1, t2 = tri_pairs[p](i)
                types.append(3)
                conn.append(t1 + [-1])
                types.append(3)
                conn.append(t2 + [-1])
            bsides.append([first, 2, 0])
    mesh = ShellMesh(
        E.COORDS,
        np.array(types, np.int32),
        np.array(conn, np.int32),
        np.array(bsides, np.int32),
    )
    assert len(mesh.tri) == 32 and len(mesh.quad) == 24
    u_d, _ = solve(mesh, E.FORCES, nu=0.25, em=10000, t=0.25, method="dense")
    u_p, _ = solve(mesh, E.FORCES, nu=0.25, em=10000, t=0.25, method="pcg")
    np.testing.assert_allclose(u_p, u_d, atol=1e-10)
    # pinned dense-oracle goldens (tri z=0 side stiffer than quad z=5 side,
    # so the response is genuinely asymmetric between the force nodes)
    np.testing.assert_allclose(
        u_d[35, :3], [0.01584023, 0.08818383, -0.19393935], rtol=1e-6
    )
    np.testing.assert_allclose(
        u_d[44, :3], [0.02568137, -0.14142868, 0.19104298], rtol=1e-6
    )


# ----------------------------------------------------------------------
# Test F — convergence study, 1:5 plate (validation.tex:470-494)
# ----------------------------------------------------------------------

F_DOMAIN = (0, 0, 10, 2)
F_GOLDEN = {
    # (bcid, loading): {n: center_w * 1e-6}
    (0, 2): {2: 14.4005, 4: 12.6269, 8: 12.8565, 16: 12.9431, 32: 12.9640, 64: 12.9691},
    (1, 2): {2: 3.82366, 4: 2.45355, 8: 2.60137, 16: 2.60384, 32: 2.60414, 64: 2.60420},
    (0, 1): {2: 11.5204, 4: 17.3048, 8: 18.1158, 16: 17.4961, 32: 17.1495, 64: 17.0215},
    (1, 1): {2: 3.05893, 4: 6.06564, 8: 7.78902, 16: 7.66573, 32: 7.40552, 64: 7.29681},
}


@pytest.mark.parametrize("bcid", [0, 1])
@pytest.mark.parametrize("loading", [2, 1])
@pytest.mark.parametrize("n", [2, 4, 8, 16])
def test_f_convergence(bcid, loading, n):
    factor = 1e-4 if loading == 2 else 4e-4
    mesh, forces = plate_case("q", n, bcid=bcid, loading=loading, factor=factor, domain=F_DOMAIN)
    u, _ = solve(mesh, forces, nu=0.3, em=1.7472e7, t=0.01)
    center = mesh.n_nodes // 2
    golden = F_GOLDEN[(bcid, loading)][n] * 1e-6
    np.testing.assert_allclose(u[center, 2], golden, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("n", [32, 64])
@pytest.mark.parametrize("bcid", [0, 1])
@pytest.mark.parametrize("loading", [2, 1])
def test_f_convergence_large(bcid, loading, n):
    """Completes the thesis table doc/validation.tex:470-494 (all rows to
    n=64, four configurations)."""
    factor = 1e-4 if loading == 2 else 4e-4
    mesh, forces = plate_case("q", n, bcid=bcid, loading=loading, factor=factor, domain=F_DOMAIN)
    u, _ = solve(mesh, forces, nu=0.3, em=1.7472e7, t=0.01)
    center = mesh.n_nodes // 2
    golden = F_GOLDEN[(bcid, loading)][n] * 1e-6
    np.testing.assert_allclose(u[center, 2], golden, rtol=1e-4)


# ----------------------------------------------------------------------
# Test G — 64x64 plate (the shipped fixture is uniform q=300;
# validation.tex:518 golden center w)
# ----------------------------------------------------------------------


@pytest.mark.slow
def test_g_quad_64():
    mesh, forces = plate_case("q", 64, bcid=0, loading=2, factor=300.0)
    u, _ = solve(mesh, forces, nu=0.3, em=1e7, t=0.5)
    center = mesh.n_nodes // 2
    np.testing.assert_allclose(u[center, 2], 0.106465, rtol=5e-5)


@pytest.mark.slow
def test_g_tri_64():
    mesh, forces = plate_case("t", 64, bcid=0, loading=2, factor=300.0, ul_lr=False)
    u, _ = solve(mesh, forces, nu=0.3, em=1e7, t=0.5)
    center = mesh.n_nodes // 2
    np.testing.assert_allclose(u[center, 2], 0.106413, rtol=5e-5)
