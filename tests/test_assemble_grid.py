"""Scatter-free structured-grid df assembly parity (ops/assemble_grid.py).

The grid pipeline must reproduce the plain f64 SoA assembly entrywise to
~eps64 — identical contract to the strip pipeline it replaces on
structured grids (tests/test_df_assembly.py). Runs EAGERLY on CPU
(eager=True): under CPU jit LLVM FMA-contracts the error-free
transforms (ops/df.py); the jitted path is TPU-only and is covered by
the on-device parity script (tests/test_large_native.py slow markers +
bench golden check).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_shell_tpu.large import LargeShellSystem
from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.mg import detect_structured_grid
from fem_shell_tpu.ops.assemble_grid import assemble_grid_df, grid_families

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def _grid_pair(et, n, ul=True, strip_rows=None, warp=False):
    pm = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 1, 0, 1), 300.0, 2, ul, "z")
    mesh, _, _ = generate(pm)
    if warp:
        # curved structured shell: same connectivity, z = bump(x, y)
        c = np.asarray(mesh.coords, np.float64).copy()
        c[:, 2] = 0.3 * np.sin(c[:, 0]) * np.cos(0.7 * c[:, 1])
        from fem_shell_tpu.mesh import ShellMesh

        mesh = ShellMesh(c, mesh.elem_types, mesh.elem_conn, mesh.boundary_sides)
    s = LargeShellSystem(mesh, MAT, dtype=jnp.float64, chunk=64)
    grid = detect_structured_grid(mesh)
    assert grid is not None
    pair = assemble_grid_df(
        grid,
        np.asarray(mesh.coords, np.float64),
        s.free_t.astype(jnp.float32),
        s.offsets,
        s.pattern.n_pad,
        s._grid_kernel_fn(3 if et == "t" else 4),
        strip_rows=strip_rows,
        eager=True,
    )
    v64 = np.asarray(s.assemble())
    v_df = np.asarray(pair.hi, np.float64) + np.asarray(pair.lo, np.float64)
    return v64.reshape(v_df.shape), v_df


@pytest.mark.parametrize(
    "et,ul,strip_rows,warp",
    [
        ("q", True, None, False),
        ("q", True, 3, True),  # multi-strip + curved shell geometry
        ("t", True, None, False),
        ("t", False, 2, True),  # other tri diagonal, multi-strip, curved
    ],
)
def test_grid_df_matches_f64(et, ul, strip_rows, warp):
    v64, v_df = _grid_pair(et, 8, ul=ul, strip_rows=strip_rows, warp=warp)
    scale = np.abs(v64).max()
    assert np.abs(v_df - v64).max() < 1e-13 * scale


def test_grid_families_cover_all_pairs():
    """Every (la, lb) node pair of every family maps to a valid stencil
    slot, and the center slot is shared by all self-pairs."""
    from fem_shell_tpu.ops.soa import _offsets_of

    for et, ul in (("q", True), ("t", True), ("t", False)):
        pm = MeshGenParams(et, 6, 6, 0, 0, 1, 1, (0, 0, 0, 0), 1.0, 0, ul, "z")
        mesh, _, _ = generate(pm)
        offsets = _offsets_of(mesh)
        fams = grid_families(et, ul, 7, offsets)
        k0 = int(np.searchsorted(offsets, 0))
        for f in fams:
            m = len(f.corners)
            for la in range(m):
                assert f.slots[la][la] == k0
                for lb in range(m):
                    assert 0 <= f.slots[la][lb] < len(offsets)


def test_auto_method_selects_strip_on_cpu():
    pm = MeshGenParams("q", 8, 8, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, _, _ = generate(pm)
    s = LargeShellSystem(mesh, MAT, dtype=jnp.float64, chunk=64)
    pair = s.assemble_df(strip_nodes=64, chunk=32)  # must not crash on CPU
    v64 = np.asarray(s.assemble())
    v_df = np.asarray(pair.hi, np.float64) + np.asarray(pair.lo, np.float64)
    assert np.abs(v_df - v64.reshape(v_df.shape)).max() < 1e-13 * np.abs(v64).max()


@pytest.mark.parametrize("et,strip_rows", [("q", 5), ("t", 3)])
def test_grid_df_tiled_layout_matches_flat(et, strip_rows):
    """Direct tile-major assembly == flat assembly (strips crossing tile
    boundaries: n=34 -> npad 2048 = 2 tiles, strip folds straddle the
    boundary)."""
    from fem_shell_tpu.ops.assemble_grid import untile_values

    n = 34
    pm = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 1, 0, 1), 300.0, 2, True, "z")
    mesh, _, _ = generate(pm)
    s = LargeShellSystem(mesh, MAT, dtype=jnp.float64, chunk=64)
    grid = detect_structured_grid(mesh)
    kfn = s._grid_kernel_fn(3 if et == "t" else 4)
    args = (
        grid,
        np.asarray(mesh.coords, np.float64),
        s.free_t.astype(jnp.float32),
        s.offsets,
        s.pattern.n_pad,
        kfn,
    )
    flat = assemble_grid_df(*args, strip_rows=strip_rows, eager=True, layout="flat")
    tiled = assemble_grid_df(*args, strip_rows=strip_rows, eager=True, layout="tiled")
    assert tiled.hi.ndim == 4 and tiled.hi.shape[0] == s.pattern.n_pad // 1024
    for a, b in ((flat.hi, untile_values(tiled.hi)), (flat.lo, untile_values(tiled.lo))):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_tile_roundtrip_and_diagonal():
    from fem_shell_tpu.ops.assemble_grid import (
        soa_diagonal_tiled,
        tile_values,
        untile_values,
    )
    from fem_shell_tpu.ops.soa import soa_diagonal

    pm = MeshGenParams("q", 8, 8, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, _, _ = generate(pm)
    s = LargeShellSystem(mesh, MAT, dtype=jnp.float64, chunk=64)
    pair = s.assemble_df(strip_nodes=512, chunk=64)
    vt = tile_values(pair.hi)
    assert np.array_equal(np.asarray(untile_values(vt)), np.asarray(pair.hi))
    d1 = np.asarray(soa_diagonal(pair.hi, offsets=s.offsets))
    d2 = np.asarray(soa_diagonal_tiled(vt, s.offsets))
    assert np.array_equal(d1, d2)
