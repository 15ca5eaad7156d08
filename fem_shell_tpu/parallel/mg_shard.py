"""Sharded geometric multigrid: mesh-independent iterations on the
multi-chip halo-exchange path.

Composes the two scalable pieces of this framework into one SPMD
program (the analog of running PETSc's MG preconditioner under MPI,
reference doc/implementation.tex:403,454-521):

- every level fine enough to shard is a row-partitioned
  ShardedStencilSystem strip (shard s owns grid node rows
  [s*rows_l, (s+1)*rows_l), i.e. L_l = rows_l * nxp_l flat lanes) with
  the O(halo) ppermute stencil matvec for its damped-Jacobi smoother;
- inter-level transfers are computed SHARD-LOCALLY on each shard's own
  rows (rows_l is forced even, so local row parity equals global row
  parity and the bilinear weights are static) and combined with ONE
  psum of the small coarse-level array — cross-shard boundary-row
  contributions add up in the psum, so no hierarchy alignment between
  level partitions is ever needed;
- levels too narrow for halo strips (L < 2*ceil(halo,128)) run
  REPLICATED: every shard smooths the same full coarse grid with the
  single-device stencil ops (coarse work is tiny; replication costs no
  communication);
- the coarsest level applies a replicated dense inverse.

The outer solver is preconditioned CG with psum dot products, same
shape as ShardedStencilSystem._solve. Iteration counts match the
single-chip MultigridShellSystem (~30 on plates) independent of the
device count — the Test-G invariance property (doc/validation.tex:518)
with mesh-independent convergence on top.
"""
from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fem_shell_tpu.materials import Material
from fem_shell_tpu.mesh import ShellMesh
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.mg import _grid_conn, detect_structured_grid
from fem_shell_tpu.ops.soa import soa_diagonal, soa_matvec
from fem_shell_tpu.parallel.stencil_shard import AXIS, ShardedStencilSystem

def _even_ceil(a: int, b: int) -> int:
    c = -(-a // b)
    return c + (c % 2)


class _ShardedLevel:
    """Row-partitioned level: wraps a ShardedStencilSystem for assembly,
    halo matvec and smoothing."""

    def __init__(self, mesh_l, material, device_mesh, dtype, grid_l, mask_l, chunk):
        s = device_mesh.shape[AXIS]
        self.nxp, self.nyp = grid_l.nxp, grid_l.nyp
        self.rows = _even_ceil(self.nyp, s)
        self.l = self.rows * self.nxp
        self.sys = ShardedStencilSystem(
            mesh_l,
            material,
            device_mesh,
            dtype=dtype,
            chunk=chunk,
            l_force=self.l,
            dirichlet_mask=mask_l,
        )
        self.n_full = s * self.l  # padded full-vector length

    @property
    def args(self):
        sy = self.sys
        return (sy.coords, sy.tri_conn, sy.tri_w, sy.quad_conn, sy.quad_w, sy.free)


class _ReplicatedLevel:
    """Full-grid level evaluated identically on every shard."""

    def __init__(self, mesh_l, material, dtype, grid_l, mask_l, chunk):
        from fem_shell_tpu.large import LargeShellSystem

        self.nxp, self.nyp = grid_l.nxp, grid_l.nyp
        self.sys = LargeShellSystem(
            mesh_l, material, dtype=dtype, chunk=chunk, dirichlet_mask=mask_l, exact_geom=False
        )
        self.npad = self.sys.pattern.n_pad
        self.offsets = [int(o) for o in self.sys.offsets]
        values = self.sys.assemble()
        diag = soa_diagonal(values, offsets=self.sys.offsets)
        self.values = values
        self.inv_diag = jnp.where(diag != 0, 1.0 / diag, 1.0)
        self.free_t = self.sys.free_t
        self.dense_inv = None  # set on the coarsest level


# ----------------------------------------------------------------------
# grid-shaped transfer helpers (operate on [6, rows, nxp] blocks)
# ----------------------------------------------------------------------


def _restrict_cols(g):
    """Bilinear P^T along the row axis of each grid row: [6, R, 2m-1] -> [6, R, m]."""
    even = g[:, :, 0::2]
    odd = g[:, :, 1::2]
    out = even.at[:, :, :-1].add(0.5 * odd)
    return out.at[:, :, 1:].add(0.5 * odd)


def _prolong_cols(c):
    """[6, R, m] -> [6, R, 2m-1]."""
    mid = 0.5 * (c[:, :, :-1] + c[:, :, 1:])
    ncol = c.shape[2] + mid.shape[2]
    out = jnp.zeros((c.shape[0], c.shape[1], ncol), c.dtype)
    out = out.at[:, :, 0::2].set(c)
    return out.at[:, :, 1::2].set(mid)


def _restrict_rows_local(g):
    """Row-axis P^T on an even-aligned local block: [6, R, m] (R even,
    global start row even) -> [6, R//2 + 1, m]; the final (+1) coarse row
    collects this shard's contribution to the neighbor-owned boundary
    row, merged later by the psum."""
    even = g[:, 0::2, :]
    odd = g[:, 1::2, :]
    r2 = odd.shape[1]
    out = jnp.zeros((6, r2 + 1, g.shape[2]), g.dtype)
    out = out.at[:, :r2, :].set(even)
    out = out.at[:, :r2, :].add(0.5 * odd)
    return out.at[:, 1 : r2 + 1, :].add(0.5 * odd)


def _prolong_rows_local(cb, rows):
    """[6, R//2 + 1, m] coarse rows (incl. the shared boundary row) ->
    [6, R, m] fine rows of this shard."""
    even = cb[:, :-1, :]
    mid = 0.5 * (cb[:, :-1, :] + cb[:, 1:, :])
    out = jnp.zeros((6, rows, cb.shape[2]), cb.dtype)
    out = out.at[:, 0::2, :].set(even)
    return out.at[:, 1::2, :].set(mid)


class ShardedMGShellSystem:
    """Multi-chip shell solver: halo-sharded fine levels, psum transfers,
    replicated coarse tail, MG-preconditioned CG."""

    def __init__(
        self,
        mesh: Union[ShellMesh, MeshGenParams],
        material: Material,
        device_mesh: Mesh,
        dtype=jnp.float32,
        n_levels: Optional[int] = None,
        nu_smooth: int = 2,
        omega: float = 0.7,
        coarse_max: int = 8,
        chunk: int = 8192,
    ):
        if isinstance(mesh, MeshGenParams):
            mesh, _, _ = generate(mesh)
        grid = detect_structured_grid(mesh)
        if grid is None:
            raise ValueError("sharded multigrid requires a row-major structured grid mesh")
        self.mesh = mesh
        self.grid = grid
        self.device_mesh = device_mesh
        self.dtype = dtype
        self.nu_smooth = nu_smooth
        self.omega = omega
        self.n_shards = device_mesh.shape[AXIS]
        s = self.n_shards

        if n_levels is None:
            n_levels = 1
            nx, ny = grid.nxp - 1, grid.nyp - 1
            while nx % 2 == 0 and ny % 2 == 0 and max(nx, ny) > 2 * coarse_max:
                nx //= 2
                ny //= 2
                n_levels += 1
        self.n_levels = n_levels

        coords_g = np.asarray(mesh.coords, np.float64).reshape(grid.nyp, grid.nxp, 3)
        mask_g = mesh.dirichlet_mask().reshape(grid.nyp, grid.nxp, 6)

        import dataclasses as _dc

        self.levels: List = []
        still_sharding = True
        for l in range(n_levels):
            f = 2**l
            if (grid.nxp - 1) % f or (grid.nyp - 1) % f:
                raise ValueError(f"nx/ny not divisible by 2^{l}")
            cg, mg_ = coords_g[::f, ::f], mask_g[::f, ::f]
            nyp_l, nxp_l = cg.shape[0], cg.shape[1]
            grid_l = _dc.replace(grid, nxp=nxp_l, nyp=nyp_l)
            types_l, conn_l = _grid_conn(nxp_l, nyp_l, grid.elem_type, grid.ul_lr)
            mesh_l = (
                mesh
                if l == 0
                else ShellMesh(cg.reshape(-1, 3), types_l, conn_l, np.zeros((0, 3), np.int32))
            )
            rows_l = _even_ceil(nyp_l, s)
            l_lanes = rows_l * nxp_l
            # halo strips need L >= 2 * ceil(halo,128); narrower -> replicate
            # (and once replicated, all coarser levels stay replicated)
            w_pad = -(-(nxp_l + 2) // 128) * 128
            if still_sharding and l_lanes >= 2 * w_pad and l < n_levels - 1:
                lvl = _ShardedLevel(
                    mesh_l, material, device_mesh, dtype, grid_l, mg_.reshape(-1, 6), chunk
                )
                if self.levels and isinstance(self.levels[-1], _ShardedLevel):
                    assert 2 * lvl.rows >= self.levels[-1].rows, (
                        "coarse shard rows must cover the fine restriction window"
                    )
            else:
                still_sharding = False
                lvl = _ReplicatedLevel(mesh_l, material, dtype, grid_l, mg_.reshape(-1, 6), chunk)
            self.levels.append(lvl)
        if not isinstance(self.levels[0], _ShardedLevel):
            raise ValueError(
                "mesh too small to shard the fine level; use MultigridShellSystem"
            )
        # replicated tail starts at the first _ReplicatedLevel
        self.n_sharded = next(
            (i for i, lv in enumerate(self.levels) if isinstance(lv, _ReplicatedLevel)),
            len(self.levels),
        )
        for lv in self.levels[self.n_sharded :]:
            assert isinstance(lv, _ReplicatedLevel)

        # coarsest dense inverse (replicated)
        last = self.levels[-1]
        if isinstance(last, _ShardedLevel):
            raise ValueError("coarsest level must be replicated (raise coarse_max)")
        from fem_shell_tpu.mg import _Level, _densify

        tmp = _Level(
            values=last.values,
            offsets=tuple(last.offsets),
            free_t=last.free_t,
            inv_diag=last.inv_diag,
            nyp=last.nyp,
            nxp=last.nxp,
            npad=last.npad,
        )
        dense = np.asarray(_densify(tmp), np.float64)
        last.dense_inv = jnp.asarray(np.linalg.inv(dense), dtype)

        self._solve_jit = jax.jit(self._solve, static_argnums=(1, 2))

    # ------------------------------------------------------------------
    # pieces that run INSIDE the shard_map
    # ------------------------------------------------------------------
    def _smooth_sharded(self, lvl, vals, inv_diag, x, b, sweeps):
        for _ in range(sweeps):
            r = b - lvl.sys.matvec_spmd(vals, x)
            x = x + self.omega * inv_diag * r
        return x

    def _smooth_repl(self, lvl, x, b, sweeps):
        for _ in range(sweeps):
            r = b - soa_matvec(lvl.values, x, offsets=lvl.offsets)
            x = x + self.omega * lvl.inv_diag * r
        return x

    def _to_full_coarse(self, fine_lvl, coarse_lvl, r_l):
        """Restriction: shard-local rows -> psum'd full coarse vector.

        r_l [6, L_f] (own fine rows) -> [6, N_c_full] identical on all
        shards. N_c_full = coarse level's full padded length."""
        rows_f, nxp_f = fine_lvl.rows, fine_lvl.nxp
        nxp_c = (nxp_f + 1) // 2
        g = r_l.reshape(6, rows_f, nxp_f)
        cb = _restrict_rows_local(_restrict_cols(g))  # [6, rows_f//2+1, nxp_c]
        if isinstance(coarse_lvl, _ShardedLevel):
            n_full = coarse_lvl.n_full
        else:
            n_full = coarse_lvl.npad
        full = jnp.zeros((6, n_full), r_l.dtype)
        row0_c = jax.lax.axis_index(AXIS).astype(jnp.int32) * (rows_f // 2)
        flat = cb.reshape(6, -1)
        z = jnp.zeros((), jnp.int32)
        # clip: the last shard's boundary row may exceed the coarse grid
        pad = (rows_f // 2 + 1) * nxp_c
        full = jnp.pad(full, ((0, 0), (0, pad)))
        full = jax.lax.dynamic_update_slice(full, flat, (z, row0_c * nxp_c))
        full = full[:, :n_full]
        return jax.lax.psum(full, AXIS)

    def _from_full_coarse(self, fine_lvl, coarse_full, dtype):
        """Prolongation: full coarse vector -> this shard's fine rows."""
        rows_f, nxp_f = fine_lvl.rows, fine_lvl.nxp
        nxp_c = (nxp_f + 1) // 2
        row0_c = jax.lax.axis_index(AXIS).astype(jnp.int32) * (rows_f // 2)
        need = (rows_f // 2 + 1) * nxp_c
        padded = jnp.pad(coarse_full, ((0, 0), (0, need)))
        z = jnp.zeros((), jnp.int32)
        cb = jax.lax.dynamic_slice(padded, (z, row0_c * nxp_c), (6, need))
        cb = cb.reshape(6, rows_f // 2 + 1, nxp_c)
        g = _prolong_cols(_prolong_rows_local(cb, rows_f))  # [6, rows_f, nxp_f]
        return g.reshape(6, fine_lvl.l)

    def _coarse_slice(self, lvl: "_ShardedLevel", full):
        """Own rows of a full (replicated) vector on a sharded level."""
        i = jax.lax.axis_index(AXIS).astype(jnp.int32)
        z = jnp.zeros((), jnp.int32)
        return jax.lax.dynamic_slice(full, (z, i * lvl.l), (6, lvl.l))

    def _own_to_full(self, lvl: "_ShardedLevel", x_l):
        i = jax.lax.axis_index(AXIS).astype(jnp.int32)
        z = jnp.zeros((), jnp.int32)
        full = jnp.zeros((6, lvl.n_full), x_l.dtype)
        full = jax.lax.dynamic_update_slice(full, x_l, (z, i * lvl.l))
        return jax.lax.psum(full, AXIS)

    def _vcycle(self, li, ops, b):
        """ops[l] = (vals, inv_diag, free) for sharded levels; b is [6, L]
        for sharded levels, [6, npad] full for replicated levels."""
        lvl = self.levels[li]
        if isinstance(lvl, _ReplicatedLevel):
            if lvl.dense_inv is not None:
                n_real = lvl.nyp * lvl.nxp
                flat = (lvl.dense_inv @ b[:, :n_real].reshape(-1)).reshape(6, n_real)
                flat = jnp.pad(flat, ((0, 0), (0, lvl.npad - n_real)))
                return flat * lvl.free_t
            x = jnp.zeros_like(b)
            x = self._smooth_repl(lvl, x, b, self.nu_smooth)
            r = b - soa_matvec(lvl.values, x, offsets=lvl.offsets)
            nxt = self.levels[li + 1]
            # replicated->replicated transfer: full-grid restrict
            g = r[:, : lvl.nyp * lvl.nxp].reshape(6, lvl.nyp, lvl.nxp)
            rc_g = _restrict_cols(g)
            even = rc_g[:, 0::2, :]
            odd = rc_g[:, 1::2, :]
            rc = even.at[:, :-1, :].add(0.5 * odd).at[:, 1:, :].add(0.5 * odd)
            rc = rc.reshape(6, -1)
            rc = jnp.pad(rc, ((0, 0), (0, nxt.npad - rc.shape[1]))) * nxt.free_t
            ec = self._vcycle(li + 1, ops, rc)
            eg = ec[:, : nxt.nyp * nxt.nxp].reshape(6, nxt.nyp, nxt.nxp)
            mid = 0.5 * (eg[:, :-1, :] + eg[:, 1:, :])
            ep = jnp.zeros((6, lvl.nyp, nxt.nxp), eg.dtype)
            ep = ep.at[:, 0::2, :].set(eg)
            ep = ep.at[:, 1::2, :].set(mid)
            e = _prolong_cols(ep).reshape(6, -1)
            e = jnp.pad(e, ((0, 0), (0, lvl.npad - e.shape[1]))) * lvl.free_t
            x = x + e
            return self._smooth_repl(lvl, x, b, self.nu_smooth)

        vals, inv_diag, free_l = ops[li]
        x = jnp.zeros_like(b)
        x = self._smooth_sharded(lvl, vals, inv_diag, x, b, self.nu_smooth)
        r = b - lvl.sys.matvec_spmd(vals, x)
        nxt = self.levels[li + 1]
        rc_full = self._to_full_coarse(lvl, nxt, r)
        if isinstance(nxt, _ShardedLevel):
            rc = self._coarse_slice(nxt, rc_full) * ops[li + 1][2]
            ec_l = self._vcycle(li + 1, ops, rc)
            ec_full = self._own_to_full(nxt, ec_l)
        else:
            rc_full = rc_full[:, : nxt.npad] * nxt.free_t
            ec_full = self._vcycle(li + 1, ops, rc_full)
            ec_full = jnp.pad(ec_full, ((0, 0), (0, max(0, nxt.npad - ec_full.shape[1]))))
        e_l = self._from_full_coarse(lvl, ec_full, b.dtype) * free_l
        x = x + e_l
        return self._smooth_sharded(lvl, vals, inv_diag, x, b, self.nu_smooth)

    # ------------------------------------------------------------------
    def _solve(self, level_args, rtol, maxiter, forces_l):
        fine = self.levels[0]

        def spmd(*flat_args):
            # unpack: per sharded level 6 arrays, then b_l
            ops = []
            i = 0
            for li in range(self.n_sharded):
                lvl = self.levels[li]
                coords, tri_c, tri_w, quad_c, quad_w, free = flat_args[i : i + 6]
                i += 6
                tri_c, tri_w = tri_c[0], tri_w[0]
                quad_c, quad_w = quad_c[0], quad_w[0]
                free = free[0]
                vals, inv_diag = lvl.sys.assemble_vals_spmd(
                    coords, tri_c, tri_w, quad_c, quad_w, free
                )
                ops.append((vals, inv_diag, free))
            b_l = flat_args[i][0]
            free0 = ops[0][2]
            b_l = b_l * free0
            matvec = lambda x: fine.sys.matvec_spmd(ops[0][0], x)  # noqa: E731
            prec = lambda r: self._vcycle(0, ops, r)  # noqa: E731

            def pdot(a, b):
                return jax.lax.psum(jnp.sum(a * b), AXIS)

            b_norm = jnp.sqrt(pdot(b_l, b_l))
            stop = rtol * b_norm
            x = jnp.zeros_like(b_l)
            r = b_l
            zv = prec(r)
            pv = zv
            rz = pdot(r, zv)

            def cond(st):
                _, r, _, _, it = st
                return jnp.logical_and(jnp.sqrt(pdot(r, r)) > stop, it < maxiter)

            def body(st):
                x, r, pv, rz, it = st
                ap = matvec(pv)
                alpha = rz / pdot(pv, ap)
                x = x + alpha * pv
                r = r - alpha * ap
                zv = prec(r)
                rz_new = pdot(r, zv)
                pv = zv + (rz_new / rz) * pv
                return (x, r, pv, rz_new, it + 1)

            x, r, _, _, it = jax.lax.while_loop(
                cond, body, (x, r, pv, rz, jnp.zeros((), jnp.int32))
            )
            res = jnp.sqrt(pdot(r, r)) / b_norm
            return x[None], it[None], res[None]

        in_specs = []
        for _ in range(self.n_sharded):
            in_specs += [P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)]
        in_specs.append(P(AXIS))
        out = shard_map(
            spmd,
            mesh=self.device_mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(AXIS), P(AXIS), P(AXIS)),
            check_vma=False,
        )(*level_args, forces_l)
        return out

    # ------------------------------------------------------------------
    def solve(self, forces, rtol: float = 1e-8, maxiter: int = 200):
        fine = self.levels[0]
        s, l = self.n_shards, fine.l
        f = np.zeros((s * l, 6))
        f[: self.mesh.n_nodes] = np.asarray(forces)
        f_l = jnp.asarray(f.T.reshape(6, s, l).transpose(1, 0, 2), self.dtype)
        f_l = jax.device_put(f_l, NamedSharding(self.device_mesh, P(AXIS)))
        args = []
        for li in range(self.n_sharded):
            args += list(self.levels[li].args)
        with jax.default_matmul_precision("highest"):
            x, it, res = self._solve_jit(tuple(args), rtol, maxiter, f_l)
        self.last_iters = int(np.max(np.asarray(it)))
        self.last_residual = float(np.max(np.asarray(res)))
        x = np.asarray(x).transpose(1, 0, 2).reshape(6, s * l).T
        return x[: self.mesh.n_nodes]
