"""SPMD sharded assembly + distributed PCG over a jax.sharding.Mesh.

This is the TPU-native replacement for the reference's MPI domain
decomposition (SURVEY.md §2.3; libMesh partitioning + PETSc MatMPIAIJ +
VecScatter halo exchange, doc/implementation.tex:463-521):

- **Assembly** is element-parallel across shards: each shard vmaps the
  element kernels over its element block (the analog of
  ``active_local_elements``, fem-shell.cpp:1197-1200), scatters 6x6 blocks
  into a full-height block-ELL buffer, and a ``psum_scatter`` both reduces
  cross-shard contributions *and* leaves each shard holding only its own
  contiguous row block — the MatMPIAIJ off-rank communication and the row
  distribution in one collective that rides ICI.
- **CG** runs row-sharded: vector ops are local, dot products are
  ``psum``-reduced partials, and the SpMV gathers remote x values via an
  ``all_gather`` over the mesh axis (the VecScatter analog; a
  halo-minimal ppermute exchange is a planned optimization — for strip
  partitions of structured meshes the gather is bandwidth-dominated by
  the two neighbor strips either way).

The whole step (assemble + solve) is ONE jitted SPMD program: XLA overlaps
the element compute with the reduce-scatter and fuses the CG body.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax import shard_map

from fem_shell_tpu.materials import Material
from fem_shell_tpu.mesh import ShellMesh
from fem_shell_tpu.ops.assemble import build_ell_pattern
from fem_shell_tpu.ops.elements import batched_quad_stiffness, batched_tri_stiffness
from fem_shell_tpu.parallel.partition import Partition, build_partition

AXIS = "dd"  # domain-decomposition mesh axis name


def make_device_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


class ShardedShellSystem:
    """Domain-decomposed shell solver over a 1D device mesh.

    Produces bit-identical solutions regardless of the shard count (the
    analog of reference Test G's process-count invariance,
    doc/validation.tex:518), because the assembled operator is a
    deterministic sum and CG reductions are ordered psums.
    """

    def __init__(
        self,
        mesh: ShellMesh,
        material: Material,
        device_mesh: Mesh,
        dtype=jnp.float64,
    ):
        self.mesh = mesh
        self.material = material
        self.device_mesh = device_mesh
        self.dtype = dtype
        self.n_shards = device_mesh.shape[AXIS]

        dm, dp = material.matrices()
        self.dm = jnp.asarray(dm, dtype)
        self.dp = jnp.asarray(dp, dtype)
        self.thickness = material.thickness

        pattern = build_ell_pattern(mesh)
        self.part = build_partition(mesh, pattern, self.n_shards)

        p = self.part
        shard = NamedSharding(device_mesh, P(AXIS))
        repl = NamedSharding(device_mesh, P())
        self.coords = jax.device_put(jnp.asarray(mesh.coords, dtype), repl)
        self.tri_shard = jax.device_put(jnp.asarray(p.tri_shard), shard)
        self.tri_weight = jax.device_put(jnp.asarray(p.tri_weight, dtype), shard)
        self.tri_slot = jax.device_put(jnp.asarray(p.tri_slot), shard)
        self.quad_shard = jax.device_put(jnp.asarray(p.quad_shard), shard)
        self.quad_weight = jax.device_put(jnp.asarray(p.quad_weight, dtype), shard)
        self.quad_slot = jax.device_put(jnp.asarray(p.quad_slot), shard)
        # row-sharded adjacency [n_pad, K]
        self.adj = jax.device_put(
            jnp.asarray(p.adj).reshape(self.n_shards, p.rows_per_shard, -1), shard
        )

        constrained = np.zeros((p.n_pad, 6), dtype=bool)
        constrained[: p.n_nodes] = mesh.dirichlet_mask()
        free = (~constrained).astype(np.float64)
        free[p.n_nodes :] = 0.0  # padded rows are fully constrained
        self.free = jax.device_put(
            jnp.asarray(free, dtype).reshape(self.n_shards, p.rows_per_shard, 6), shard
        )
        # replicated copy of the full free mask for column masking in SpMV rows
        self.free_full = jax.device_put(jnp.asarray(free, dtype), repl)

        self._solve_jit = jax.jit(self._solve, static_argnums=(2, 3))

    # ------------------------------------------------------------------
    def _assemble_local(self, coords, tri_conn, tri_w, tri_slot, quad_conn, quad_w, quad_slot):
        """Per-shard: element kernels for the local element block + scatter
        into a full-height ELL buffer (to be reduce-scattered)."""
        p = self.part
        n_pad, k = p.n_pad, p.adj.shape[1]
        flat = jnp.zeros((n_pad * k, 6, 6), dtype=self.dtype)
        if tri_conn.shape[0]:
            ke = batched_tri_stiffness(coords, tri_conn, self.dm, self.dp, self.thickness)
            ke = ke * tri_w[:, None, None]
            kb = ke.reshape(-1, 3, 6, 3, 6).transpose(0, 1, 3, 2, 4)
            flat = flat.at[tri_slot.reshape(-1)].add(kb.reshape(-1, 6, 6))
        if quad_conn.shape[0]:
            ke = batched_quad_stiffness(coords, quad_conn, self.dm, self.dp, self.thickness)
            ke = ke * quad_w[:, None, None]
            kb = ke.reshape(-1, 4, 6, 4, 6).transpose(0, 1, 3, 2, 4)
            flat = flat.at[quad_slot.reshape(-1)].add(kb.reshape(-1, 6, 6))
        return flat.reshape(n_pad, k, 6, 6)

    def _solve(self, coords, forces_padded, rtol, maxiter):
        """Full SPMD step: sharded assembly -> BC masking -> distributed PCG."""
        p = self.part
        rps, k = p.rows_per_shard, p.adj.shape[1]
        n_pad = p.n_pad

        def spmd(coords, tri_c, tri_w, tri_s, quad_c, quad_w, quad_s, adj_l, free_l, free_full, b_l):
            # drop the leading shard axis added by shard_map blocks
            tri_c, tri_w, tri_s = tri_c[0], tri_w[0], tri_s[0]
            quad_c, quad_w, quad_s = quad_c[0], quad_w[0], quad_s[0]
            adj_l, free_l, b_l = adj_l[0], free_l[0], b_l[0]

            # ---- assembly: local contributions, reduce-scatter to my rows
            flat = self._assemble_local(coords, tri_c, tri_w, tri_s, quad_c, quad_w, quad_s)
            flat = flat.reshape(n_pad * k * 36)
            local = jax.lax.psum_scatter(flat, AXIS, scatter_dimension=0, tiled=True)
            blocks = local.reshape(rps, k, 6, 6)

            # ---- Dirichlet masking on my rows (column mask via global free)
            col_free = free_full[adj_l]  # [rps, K, 6]
            blocks = blocks * free_l[:, None, :, None] * col_free[:, :, None, :]
            my_row0 = jax.lax.axis_index(AXIS) * rps
            is_self = adj_l == (my_row0 + jnp.arange(rps, dtype=adj_l.dtype))[:, None]
            first_self = (jnp.cumsum(is_self.astype(jnp.int32), axis=1) * is_self) == 1
            eye = jnp.eye(6, dtype=blocks.dtype)
            constrained = 1.0 - free_l
            blocks = blocks + first_self.astype(blocks.dtype)[:, :, None, None] * (
                eye[None, None] * constrained[:, None, :, None]
            )

            # ---- distributed Jacobi-PCG on my row block
            diag_blocks = jnp.einsum("rkaa->rka", blocks)
            diag = jnp.sum(jnp.where(is_self[..., None], diag_blocks, 0.0), axis=1)
            inv_diag = jnp.where(diag != 0, 1.0 / diag, 1.0)

            b_l = b_l * free_l

            def matvec(x_l):
                x_full = jax.lax.all_gather(x_l, AXIS, tiled=True)  # [n_pad, 6]
                xg = x_full[adj_l]  # [rps, K, 6]
                return jnp.einsum("rkab,rkb->ra", blocks, xg)

            def pdot(a, b):
                return jax.lax.psum(jnp.sum(a * b), AXIS)

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

        mesh_axes = self.device_mesh
        out = shard_map(
            spmd,
            mesh=mesh_axes,
            in_specs=(
                P(),  # coords replicated
                P(AXIS), P(AXIS), P(AXIS),  # tri conn/weight/slot
                P(AXIS), P(AXIS), P(AXIS),  # quad conn/weight/slot
                P(AXIS), P(AXIS),  # adj, free (row-sharded)
                P(),  # free_full replicated
                P(AXIS),  # rhs row-sharded
            ),
            out_specs=(P(AXIS), P(AXIS), P(AXIS)),
            check_vma=False,
        )(
            coords,
            self.tri_shard, self.tri_weight, self.tri_slot,
            self.quad_shard, self.quad_weight, self.quad_slot,
            self.adj, self.free, self.free_full,
            forces_padded,
        )
        return out

    # ------------------------------------------------------------------
    def solve(self, forces, rtol: float = 1e-12, maxiter: int = 20000):
        """forces: [N,6] host/device array -> [N,6] displacements."""
        p = self.part
        f = np.zeros((p.n_pad, 6), dtype=np.float64)
        f[: p.n_nodes] = np.asarray(forces)
        f = jnp.asarray(f, self.dtype).reshape(self.n_shards, p.rows_per_shard, 6)
        f = jax.device_put(f, NamedSharding(self.device_mesh, P(AXIS)))
        # HIGHEST matmul precision: TPU f32 matmuls otherwise run bf16 on
        # the MXU, breaking stiffness accuracy and CG convergence.
        with jax.default_matmul_precision("highest"):
            x, it, res = self._solve_jit(self.coords, f, rtol, maxiter)
        self.last_iters = int(np.max(np.asarray(it)))
        self.last_residual = float(np.max(np.asarray(res)))
        x = np.asarray(x).reshape(p.n_pad, 6)[: p.n_nodes]
        return x
