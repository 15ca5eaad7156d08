"""Sharded grid-df assembly (parallel/grid_asm_shard.py): per-shard row
blocks must reproduce the single-chip shifted-window pipeline
(ops/assemble_grid.py) — bitwise for one shard, to the lo-fold rounding
across shard boundaries — and the f64 SoA oracle entrywise.

Runs EAGERLY on CPU (CPU jit FMA-contracts the error-free transforms,
ops/df.py); a jitted multi-device placement check runs against the eager
oracle at f32-class tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_shell_tpu.large import LargeShellSystem
from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.mg import detect_structured_grid
from fem_shell_tpu.ops.assemble_grid import assemble_grid_df
from fem_shell_tpu.parallel.grid_asm_shard import (
    assemble_grid_df_rowblocks,
    partition_rows,
    rowblocks_diag,
    rowblocks_to_flat,
)

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def _setup(et, n, ul=True, warp=False):
    pm = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 1, 0, 1), 300.0, 2, ul, "z")
    mesh, _, _ = generate(pm)
    if warp:
        c = np.asarray(mesh.coords, np.float64).copy()
        c[:, 2] = 0.3 * np.sin(c[:, 0]) * np.cos(0.7 * c[:, 1])
        from fem_shell_tpu.mesh import ShellMesh

        mesh = ShellMesh(c, mesh.elem_types, mesh.elem_conn, mesh.boundary_sides)
    s = LargeShellSystem(mesh, MAT, dtype=jnp.float64, chunk=64)
    grid = detect_structured_grid(mesh)
    assert grid is not None
    return mesh, s, grid


def _blocks_and_ref(et, n, starts, ul=True, warp=False, strip_rows=None,
                    eager=True, devices=None):
    mesh, s, grid = _setup(et, n, ul, warp)
    kf = s._grid_kernel_fn(3 if et == "t" else 4)
    free32 = s.free_t.astype(jnp.float32)
    blocks = assemble_grid_df_rowblocks(
        grid, np.asarray(mesh.coords, np.float64), free32, s.offsets, kf,
        starts, strip_rows=strip_rows, eager=eager, devices=devices,
    )
    ref = assemble_grid_df(
        grid, np.asarray(mesh.coords, np.float64), free32, s.offsets,
        s.pattern.n_pad, kf, strip_rows=strip_rows, eager=True,
    )
    return mesh, s, grid, blocks, ref


@pytest.mark.parametrize(
    "et,warp,n_shards",
    [("q", False, 3), ("t", False, 3), ("t", True, 4), ("q", True, 2)],
)
def test_rowblocks_match_single_chip(et, warp, n_shards):
    n = 12
    starts = partition_rows(n + 1, n_shards)
    mesh, s, grid, blocks, ref = _blocks_and_ref(et, n, starts, warp=warp,
                                                 strip_rows=3)
    ncols = grid.nyp * grid.nxp
    flat = rowblocks_to_flat(blocks, s.pattern.n_pad)
    v = np.asarray(flat.hi, np.float64)[:, :ncols] + np.asarray(flat.lo, np.float64)[:, :ncols]
    vr = np.asarray(ref.hi, np.float64)[:, :ncols] + np.asarray(ref.lo, np.float64)[:, :ncols]
    scale = np.abs(vr).max()
    assert np.abs(v - vr).max() < 1e-13 * scale

    # ... and the f64 SoA oracle (same contract as the single-chip test)
    v64 = np.asarray(s.assemble()).reshape(vr.shape[0], -1)[:, :ncols]
    assert np.abs(v - v64).max() < 1e-11 * scale


def test_single_shard_bitwise():
    n = 8
    mesh, s, grid, blocks, ref = _blocks_and_ref("t", n, [0, n + 1])
    ncols = grid.nyp * grid.nxp
    assert np.array_equal(np.asarray(blocks[0].hi), np.asarray(ref.hi)[:, :ncols])
    assert np.array_equal(np.asarray(blocks[0].lo), np.asarray(ref.lo)[:, :ncols])


def test_diag_after_halo_exchange():
    """Boundary-row diagonals need both shards' contributions — extract
    from the exchanged blocks and pin against the single-chip with_diag
    epilogue."""
    n = 12
    mesh, s, grid = _setup("q", n)
    kf = s._grid_kernel_fn(4)
    free32 = s.free_t.astype(jnp.float32)
    starts = partition_rows(n + 1, 3)
    blocks = assemble_grid_df_rowblocks(
        grid, np.asarray(mesh.coords, np.float64), free32, s.offsets, kf,
        starts, eager=True,
    )
    diags = rowblocks_diag(blocks, s.offsets, len(s.offsets))
    cat = np.concatenate([np.asarray(d) for d in diags], axis=1)

    ref_flat = assemble_grid_df(
        grid, np.asarray(mesh.coords, np.float64), free32, s.offsets,
        s.pattern.n_pad, kf, eager=True,
    )
    k = len(s.offsets)
    k0 = int(np.searchsorted(np.asarray(s.offsets), 0))
    ncols = grid.nyp * grid.nxp
    ref_diag = np.stack(
        [np.asarray(ref_flat.hi)[(a * 6 + a) * k + k0, :ncols] for a in range(6)]
    )
    scale = np.abs(ref_diag).max()
    assert np.abs(cat - ref_diag).max() < 1e-13 * scale


def test_grid_sharded_df_solver_golden_and_invariance():
    """End-to-end: the sharded grid-df ASSEMBLY feeding the sharded df
    CG (GridShardedDFShellSystem) — shard-count invariant and matching
    the f64 oracle at the CPU-jit df floor (the SOLVE's EFTs are
    FMA-degraded under CPU jit; the assembly here runs eager/exact)."""
    from fem_shell_tpu.parallel.grid_asm_shard import GridShardedDFShellSystem
    from fem_shell_tpu.parallel.sharded import make_device_mesh
    from fem_shell_tpu.system import ShellSystem

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 (virtual) devices")
    p = MeshGenParams("q", 16, 64, 0, 0, 2.5, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    us = {}
    for nd in (1, 2, 4):
        sys = GridShardedDFShellSystem(mesh, MAT, make_device_mesh(nd))
        u = sys.solve(rows * fac, rtol=1e-9, maxiter=20000)
        assert sys.last_residual < 1e-9
        us[nd] = u
    scale = np.abs(us[1]).max()
    assert np.abs(us[1] - us[2]).max() < 1e-5 * scale
    assert np.abs(us[1] - us[4]).max() < 1e-5 * scale
    u64 = np.asarray(ShellSystem(mesh, MAT).solve(rows * fac))
    assert np.abs(us[1] - u64).max() < 1e-4 * np.abs(u64).max()


def test_grid_sharded_df_mg_preconditioner():
    """prec='mg': the row-sharded f32 V-cycle preconditions the sharded
    grid-df CG, with the V-cycle's FINE level smoothing directly on the
    hi part of the sharded-assembled df operator. Iterations must be
    mesh-independent-class (~22 here vs ~1000 Jacobi), shard-count
    invariant, and the solution must match the f64 oracle at the
    CPU-jit df floor."""
    from fem_shell_tpu.parallel.grid_asm_shard import GridShardedDFShellSystem
    from fem_shell_tpu.parallel.sharded import make_device_mesh
    from fem_shell_tpu.system import ShellSystem

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 (virtual) devices")
    p = MeshGenParams("q", 16, 64, 0, 0, 2.5, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    us = {}
    for nd in (1, 2, 4):
        sys = GridShardedDFShellSystem(mesh, MAT, make_device_mesh(nd), prec="mg")
        u = sys.solve(rows * fac, rtol=1e-9, maxiter=500)
        assert sys.last_residual < 1e-9
        assert sys.last_iters <= 60, sys.last_iters  # Jacobi needs ~1000
        us[nd] = u
    scale = np.abs(us[1]).max()
    assert np.abs(us[1] - us[2]).max() < 1e-5 * scale
    assert np.abs(us[1] - us[4]).max() < 1e-5 * scale
    u64 = np.asarray(ShellSystem(mesh, MAT).solve(rows * fac))
    assert np.abs(us[1] - u64).max() < 1e-4 * np.abs(u64).max()


def test_grid_sharded_refined_solve_mg_prec():
    """Sharded iterative refinement composed with the MG preconditioner:
    inner solves are V-cycle-preconditioned (few iterations), the true
    residual still drives the solution past the CPU-degraded plain-solve
    floor to 1e-6 parity vs the f64 oracle."""
    from fem_shell_tpu.parallel.grid_asm_shard import GridShardedDFShellSystem
    from fem_shell_tpu.parallel.sharded import make_device_mesh
    from fem_shell_tpu.system import ShellSystem

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 (virtual) devices")
    p = MeshGenParams("q", 16, 64, 0, 0, 2.5, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    sys = GridShardedDFShellSystem(mesh, MAT, make_device_mesh(2), prec="mg")
    u = sys.solve_refined(rows * fac, rtol=1e-10, inner_rtol=1e-6,
                          jit_residual=False)
    assert len(sys.refine_history) >= 1
    u64 = np.asarray(ShellSystem(mesh, MAT).solve(rows * fac, rtol=1e-13))
    scale = np.abs(u64).max()
    assert np.abs(u - u64).max() < 1e-6 * scale, (
        np.abs(u - u64).max() / scale, sys.refine_history)


def test_grid_sharded_refined_solve():
    """Sharded iterative refinement: distributed inner df CG solves +
    the single-device class-table TRUE residual. With the residual run
    eagerly (exact on CPU) the refinement must push the solution well
    past the CPU-degraded plain-solve floor (~1e-4): final parity vs the
    f64 oracle at 1e-6."""
    from fem_shell_tpu.parallel.grid_asm_shard import GridShardedDFShellSystem
    from fem_shell_tpu.parallel.sharded import make_device_mesh
    from fem_shell_tpu.system import ShellSystem

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 (virtual) devices")
    p = MeshGenParams("q", 16, 64, 0, 0, 2.5, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    sys = GridShardedDFShellSystem(mesh, MAT, make_device_mesh(2))
    u = sys.solve_refined(rows * fac, rtol=1e-10, inner_rtol=1e-6,
                          jit_residual=False)
    assert len(sys.refine_history) >= 1
    u64 = np.asarray(ShellSystem(mesh, MAT).solve(rows * fac, rtol=1e-13))
    scale = np.abs(u64).max()
    assert np.abs(u - u64).max() < 1e-6 * scale, (
        np.abs(u - u64).max() / scale, sys.refine_history)


def test_multi_device_placement():
    """Jitted path with per-shard device placement on the 8-CPU-device
    test mesh: blocks land on their devices and match the eager oracle at
    f32-class tolerance (CPU jit FMA-contracts the EFTs, so eps49
    parity is a TPU-only claim — tools/run_tpu_tests.py)."""
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >=4 devices (tests/conftest.py sets 8)")
    n = 12
    mesh, s, grid = _setup("t", n)
    kf = s._grid_kernel_fn(3)
    free32 = s.free_t.astype(jnp.float32)
    starts = partition_rows(n + 1, 4)
    blocks = assemble_grid_df_rowblocks(
        grid, np.asarray(mesh.coords, np.float64), free32, s.offsets, kf,
        starts, eager=False, devices=devs[:4],
    )
    for b, d in zip(blocks, devs[:4]):
        assert b.hi.devices() == {d}

    ref = assemble_grid_df(
        grid, np.asarray(mesh.coords, np.float64), free32, s.offsets,
        s.pattern.n_pad, kf, eager=True,
    )
    ncols = grid.nyp * grid.nxp
    flat = rowblocks_to_flat(blocks, s.pattern.n_pad)
    v = np.asarray(flat.hi, np.float64)[:, :ncols] + np.asarray(flat.lo, np.float64)[:, :ncols]
    vr = np.asarray(ref.hi, np.float64)[:, :ncols] + np.asarray(ref.lo, np.float64)[:, :ncols]
    scale = np.abs(vr).max()
    assert np.abs(v - vr).max() < 1e-5 * scale
