"""Communication-scalable SPMD for ARBITRARY (unstructured) meshes.

The reference partitions arbitrary meshes via libMesh/Metis and solves
with O(halo) per-iteration communication (doc/implementation.tex:463-486;
each rank assembles only its `active_local_elements`,
fem-shell.cpp:1197-1200, and PETSc's VecScatter moves boundary values).
The earlier any-mesh sharded path here (parallel/sharded.py) is correct
but all_gathers the FULL solution vector every CG iteration — O(N) ICI
traffic. This module closes that gap the TPU-native way:

- **Partition** (host): reverse-Cuthill-McKee order, then contiguous
  row chunks — for shell surface meshes RCM bands make chunk separators
  ~O(bandwidth), the same locality Metis buys the reference.
- **Assembly** (device, fully local): every element incident to a
  shard's rows is evaluated on that shard (boundary elements are
  evaluated by each sharing shard — the duplication is O(separator));
  each shard scatter-adds ONLY its own rows via precomputed local slot
  tables (non-owned corner rows route to a trash slot). No cross-shard
  assembly communication at all — the psum_scatter of the block
  partition path and its O(N)-per-shard staging buffer both disappear.
- **Halo exchange** (per CG iteration): each shard publishes the
  compact list of its nodes referenced by ANY other shard (its export
  interface, size B = max separator); one `all_gather` of [B, 6] moves
  S*B*6 values — communication proportional to the TOTAL PARTITION
  BOUNDARY, independent of N. Neighbor values are then static gathers
  into the operator's local ext indexing.
- **CG**: row-local vector ops, psum dot products, Jacobi
  preconditioner — iteration counts match the single-device
  Jacobi-PCG on the same operator (Test-G invariance analog,
  doc/validation.tex:518).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fem_shell_tpu.materials import Material
from fem_shell_tpu.mesh import ShellMesh, permute_nodes, rcm_order
from fem_shell_tpu.ops.assemble import build_ell_pattern
from fem_shell_tpu.ops.elements import quad_shell_stiffness, tri_shell_stiffness

AXIS = "dd"


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass
class _HaloTables:
    """Static per-shard tables (host numpy, baked into the SPMD jit)."""

    rps: int                 # owned rows per shard (padded)
    b: int                   # export slots per shard (max interface size)
    export_idx: np.ndarray   # [S, B] local row ids each shard publishes
    adj_l: np.ndarray        # [S, rps, K] ext indices (own < rps, halo >= rps)
    tri_xyz: np.ndarray      # [S, Et_l, 3, 3] per-element corner coords
    tri_lslot: np.ndarray    # [S, Et_l, 3, 3] local slots (trash = rps*K)
    quad_xyz: np.ndarray     # [S, Eq_l, 4, 3]
    quad_lslot: np.ndarray   # [S, Eq_l, 4, 4]
    free_l: np.ndarray       # [S, rps, 6] 1 = free (owned rows)
    col_free: np.ndarray     # [S, rps, K, 6] column mask per slot
    n_boundary: int          # true total export count (pre-padding)


def build_halo_tables(mesh: ShellMesh, pattern, n_shards: int) -> _HaloTables:
    n = mesh.n_nodes
    k = pattern.k_max
    rps = _ceil_to(n, n_shards) // n_shards
    n_pad = rps * n_shards

    adj = np.empty((n_pad, k), np.int64)
    adj[:n] = pattern.adj
    adj[n:] = np.arange(n, n_pad)[:, None]
    owner = adj // rps

    # exports: shard o's nodes referenced from rows it does not own
    row_owner = np.repeat(np.arange(n_shards), rps)[:, None]
    foreign = owner != row_owner
    exports: List[np.ndarray] = []
    for o in range(n_shards):
        used = np.unique(adj[foreign & (owner == o)])
        exports.append(used)
    n_boundary = int(sum(len(e) for e in exports))
    b = max(1, _ceil_to(max((len(e) for e in exports), default=1), 8))
    export_idx = np.zeros((n_shards, b), np.int32)
    pos_of = np.full(n_pad, -1, np.int64)
    for o, e in enumerate(exports):
        export_idx[o, : len(e)] = (e - o * rps).astype(np.int32)
        pos_of[e] = o * b + np.arange(len(e))

    # adjacency in local ext indexing: own -> row - row0; halo -> rps + pos
    adj_l = np.where(
        foreign, rps + pos_of[adj], adj - row_owner * rps
    ).astype(np.int32).reshape(n_shards, rps, k)

    # free masks
    free = np.ones((n_pad, 6), np.float64)
    free[:n] = ~mesh.dirichlet_mask()
    free[n:] = 0.0
    free_l = free.reshape(n_shards, rps, 6)
    col_free = free[adj].reshape(n_shards, rps, k, 6)

    # per-shard element lists: every element with >=1 owned corner
    coords = np.asarray(mesh.coords, np.float64)

    def split(conn, slot, m):
        if conn.shape[0] == 0:
            return (
                np.zeros((n_shards, 0, m, 3), np.float64),
                np.zeros((n_shards, 0, m, m), np.int32),
            )
        eo = conn // rps  # [E, m] owner per corner
        trash = rps * k
        xyz_l, slot_l = [], []
        for s in range(n_shards):
            mine = np.nonzero((eo == s).any(axis=1))[0]
            xyz = coords[conn[mine]]  # [e, m, 3]
            sl = slot[mine].astype(np.int64)  # global row*k + kslot
            # block (la, lb) scatters into corner la's row: keep it only
            # when this shard owns that row, else route to the trash slot
            owned_row = (eo[mine] == s)[:, :, None]  # [e, m, 1]
            sl_l = np.where(owned_row, sl - s * rps * k, trash).astype(np.int32)
            xyz_l.append(xyz)
            slot_l.append(sl_l)
        e_l = max(len(x) for x in xyz_l)
        xyz_p = np.zeros((n_shards, e_l, m, 3), np.float64)
        slot_p = np.full((n_shards, e_l, m, m), rps * k, np.int32)
        for s in range(n_shards):
            e = len(xyz_l[s])
            xyz_p[s, :e] = xyz_l[s]
            slot_p[s, :e] = slot_l[s]
            if e < e_l:  # padding elements: real geometry, trash slots
                xyz_p[s, e:] = xyz_l[s][0] if e else coords[conn[0]]
        return xyz_p, slot_p

    tri_xyz, tri_lslot = split(mesh.tri.astype(np.int64), pattern.tri_slot, 3)
    quad_xyz, quad_lslot = split(mesh.quad.astype(np.int64), pattern.quad_slot, 4)

    return _HaloTables(
        rps=rps, b=b, export_idx=export_idx, adj_l=adj_l,
        tri_xyz=tri_xyz, tri_lslot=tri_lslot,
        quad_xyz=quad_xyz, quad_lslot=quad_lslot,
        free_l=free_l, col_free=col_free, n_boundary=n_boundary,
    )


class HaloShardedShellSystem:
    """Arbitrary-mesh domain decomposition with O(boundary) communication.

    ``reorder='rcm'`` (default) renumbers nodes before chunking so the
    contiguous row partition has small separators; solutions are
    returned in the ORIGINAL numbering.
    """

    def __init__(
        self,
        mesh: ShellMesh,
        material: Material,
        device_mesh: Mesh,
        dtype=jnp.float64,
        reorder: Optional[str] = "rcm",
    ):
        self._order = None
        if reorder == "rcm":
            self._order = rcm_order(mesh)
            mesh = permute_nodes(mesh, self._order)
        elif reorder is not None:
            raise ValueError(f"unknown reorder {reorder!r}")
        self.mesh = mesh
        self.material = material
        self.device_mesh = device_mesh
        self.dtype = dtype
        self.n_shards = device_mesh.shape[AXIS]

        dm, dp = material.matrices()
        self.dm = jnp.asarray(dm, dtype)
        self.dp = jnp.asarray(dp, dtype)
        self.thickness = material.thickness

        self.pattern = build_ell_pattern(mesh)
        self.k = self.pattern.k_max
        t = build_halo_tables(mesh, self.pattern, self.n_shards)
        self.tables = t

        shard = NamedSharding(device_mesh, P(AXIS))
        put = lambda a, dt=None: jax.device_put(  # noqa: E731
            jnp.asarray(a) if dt is None else jnp.asarray(a, dt), shard
        )
        self.export_idx = put(t.export_idx)
        self.adj_l = put(t.adj_l)
        self.tri_xyz = put(t.tri_xyz, dtype)
        self.tri_lslot = put(t.tri_lslot)
        self.quad_xyz = put(t.quad_xyz, dtype)
        self.quad_lslot = put(t.quad_lslot)
        self.free_l = put(t.free_l, dtype)
        self.col_free = put(t.col_free, dtype)
        self._solve_jit = jax.jit(self._solve_impl, static_argnums=(9, 10))
        self.last_iters = 0
        self.last_residual = np.inf

    # ------------------------------------------------------------------
    @property
    def comm_floats_per_iter(self) -> int:
        """Per-iteration exchanged values (all shards): S * B * 6 — the
        O(boundary) evidence vs all_gather's N * 6."""
        return self.n_shards * self.tables.b * 6

    # ------------------------------------------------------------------
    def _solve_impl(self, tri_xyz, tri_lslot, quad_xyz, quad_lslot, adj_l,
                    export_idx, free_l, col_free, b_l, rtol, maxiter):
        t = self.tables
        rps, k, b = t.rps, self.k, t.b
        s_tot = self.n_shards

        def spmd(tri_xyz, tri_lslot, quad_xyz, quad_lslot, adj_l, export_idx,
                 free_l, col_free, b_l):
            tri_xyz, tri_lslot = tri_xyz[0], tri_lslot[0]
            quad_xyz, quad_lslot = quad_xyz[0], quad_lslot[0]
            adj_l, export_idx = adj_l[0], export_idx[0]
            free_l, col_free, b_l = free_l[0], col_free[0], b_l[0]

            # ---- fully local assembly into my rows (+ trash slot)
            flat = jnp.zeros((rps * k + 1, 6, 6), self.dtype)
            if tri_xyz.shape[0]:
                ke = jax.vmap(
                    lambda p: tri_shell_stiffness(p, self.dm, self.dp, self.thickness)
                )(tri_xyz)
                kb = ke.reshape(-1, 3, 6, 3, 6).transpose(0, 1, 3, 2, 4)
                flat = flat.at[tri_lslot.reshape(-1)].add(kb.reshape(-1, 6, 6))
            if quad_xyz.shape[0]:
                ke = jax.vmap(
                    lambda p: quad_shell_stiffness(p, self.dm, self.dp, self.thickness)
                )(quad_xyz)
                kb = ke.reshape(-1, 4, 6, 4, 6).transpose(0, 1, 3, 2, 4)
                flat = flat.at[quad_lslot.reshape(-1)].add(kb.reshape(-1, 6, 6))
            blocks = flat[:-1].reshape(rps, k, 6, 6)

            # ---- BC masking + unit diagonal on constrained owned rows
            blocks = blocks * free_l[:, None, :, None] * col_free[:, :, None, :]
            is_self = adj_l == jnp.arange(rps, dtype=adj_l.dtype)[:, None]
            first_self = (jnp.cumsum(is_self.astype(jnp.int32), axis=1) * is_self) == 1
            eye = jnp.eye(6, dtype=blocks.dtype)
            constrained = 1.0 - free_l
            blocks = blocks + first_self.astype(blocks.dtype)[:, :, None, None] * (
                eye[None, None] * constrained[:, None, :, None]
            )

            diag_blocks = jnp.einsum("rkaa->rka", blocks)
            diag = jnp.sum(jnp.where(first_self[..., None], diag_blocks, 0.0), axis=1)
            inv_diag = jnp.where(diag != 0, 1.0 / diag, 1.0)

            b_l = b_l * free_l

            def matvec(x_l):
                # compact-boundary halo exchange: S*B*6 values total
                buf = x_l[export_idx]  # [B, 6]
                allbuf = jax.lax.all_gather(buf, AXIS)  # [S, B, 6]
                ext = jnp.concatenate([x_l, allbuf.reshape(s_tot * b, 6)], axis=0)
                xg = ext[adj_l]  # [rps, K, 6]
                return jnp.einsum("rkab,rkb->ra", blocks, xg)

            def pdot(u, v):
                return jax.lax.psum(jnp.sum(u * v), AXIS)

            b_norm = jnp.sqrt(pdot(b_l, b_l))
            stop = rtol * b_norm

            x = jnp.zeros_like(b_l)
            r = b_l
            z = inv_diag * r
            pvec = z
            rz = pdot(r, z)

            def cond(state):
                _, r, _, _, _, it = state
                return jnp.logical_and(jnp.sqrt(pdot(r, r)) > stop, it < maxiter)

            def body(state):
                x, r, z, pv, rz, it = state
                ap = matvec(pv)
                alpha = rz / pdot(pv, ap)
                x = x + alpha * pv
                r = r - alpha * ap
                z = inv_diag * r
                rz_new = pdot(r, z)
                pv = z + (rz_new / rz) * pv
                return (x, r, z, pv, rz_new, it + 1)

            x, r, _, _, _, it = jax.lax.while_loop(
                cond, body, (x, r, z, pvec, rz, jnp.zeros((), jnp.int32))
            )
            res = jnp.sqrt(pdot(r, r)) / b_norm
            return x[None], it[None], res[None]

        return shard_map(
            spmd,
            mesh=self.device_mesh,
            in_specs=(P(AXIS),) * 9,
            out_specs=(P(AXIS), P(AXIS), P(AXIS)),
            check_vma=False,
        )(tri_xyz, tri_lslot, quad_xyz, quad_lslot, adj_l, export_idx,
          free_l, col_free, b_l)

    # ------------------------------------------------------------------
    def solve(self, forces, rtol: float = 1e-12, maxiter: int = 20000):
        t = self.tables
        f = np.zeros((self.n_shards * t.rps, 6))
        fin = np.asarray(forces)
        if self._order is not None:
            fin = fin[self._order]
        f[: self.mesh.n_nodes] = fin
        f = jnp.asarray(f, self.dtype).reshape(self.n_shards, t.rps, 6)
        f = jax.device_put(f, NamedSharding(self.device_mesh, P(AXIS)))
        with jax.default_matmul_precision("highest"):
            x, it, res = self._solve_jit(
                self.tri_xyz, self.tri_lslot, self.quad_xyz, self.quad_lslot,
                self.adj_l, self.export_idx, self.free_l, self.col_free,
                f, rtol, maxiter,
            )
        self.last_iters = int(np.max(np.asarray(it)))
        self.last_residual = float(np.max(np.asarray(res)))
        u = np.asarray(x).reshape(-1, 6)[: self.mesh.n_nodes]
        if self._order is not None:
            out = np.empty_like(u)
            out[self._order] = u
            return out
        return u
