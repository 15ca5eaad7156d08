"""Halo-exchange SPMD solver: strip-partitioned stencil operator.

The scalable multi-chip design (the true analog of PETSc's VecScatter +
MatMPIAIJ over MPI, doc/implementation.tex:454-521), specialized to the
stencil (offset-addressed) SoA operator of ops/soa.py:

- nodes are strip-partitioned over the device mesh axis: shard s owns
  lanes [s*L, (s+1)*L);
- the stencil half-width W = max|offset| bounds every cross-shard
  dependency, so each CG iteration needs exactly one bidirectional
  ``ppermute`` of [6, W] halo columns over ICI — O(W) bytes instead of the
  O(N) ``all_gather`` of parallel/sharded.py;
- assembly is element-parallel with elements assigned to the strip of
  their first node; since stencil offsets bound node distance within an
  element by W, every element writes only into a local window
  [s*L - W, (s+1)*L + W), and one halo *reduction* (reverse exchange +
  add) finalizes the distributed operator — no psum over full-size
  buffers;
- wrap-around halos from the circular ppermute are harmless by
  construction: out-of-domain columns only ever multiply identically-zero
  blocks (same invariant the single-chip stencil mode relies on).

Everything (assembly, halo reduce, BC, PCG with psum dots) is one jitted
shard_map program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fem_shell_tpu.materials import Material
from fem_shell_tpu.mesh import ShellMesh
from fem_shell_tpu.ops.elements import batched_quad_stiffness, batched_tri_stiffness
from fem_shell_tpu.ops.soa import build_soa_pattern

AXIS = "dd"


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


class ShardedStencilSystem:
    """Domain-decomposed shell solver with halo-exchange stencil SpMV."""

    def __init__(
        self,
        mesh: ShellMesh,
        material: Material,
        device_mesh: Mesh,
        dtype=jnp.float32,
        chunk: int = 8192,
        l_force: int = None,
        dirichlet_mask=None,
    ):
        """``l_force`` overrides the 128-aligned strip size (the sharded
        multigrid partitions by grid ROWS, so its strips are multiples of
        the grid width instead); ``dirichlet_mask`` overrides the mesh's
        BC mask (subsampled masks on multigrid coarse levels)."""
        self.mesh = mesh
        self.material = material
        self.device_mesh = device_mesh
        self.dtype = dtype
        self.n_shards = device_mesh.shape[AXIS]
        s = self.n_shards

        pat = build_soa_pattern(mesh)
        if pat.offsets is None:
            raise ValueError(
                "mesh is not stencil-addressable; use parallel.sharded instead"
            )
        self.offsets = [int(o) for o in pat.offsets]
        self.k = pat.k
        self.w = max(abs(self.offsets[0]), abs(self.offsets[-1]))
        self.w_pad = _ceil_to(max(self.w, 1), 128)

        # strip size L: lanes per shard, 128-aligned, covering n_pad
        n = mesh.n_nodes
        if l_force is not None:
            if l_force * s < n:
                raise ValueError(f"l_force={l_force} too small for {n} nodes on {s} shards")
            self.l = int(l_force)
        else:
            self.l = _ceil_to(_ceil_to(n, 128), 128 * s) // s
        self.n_tot = self.l * s
        if self.l < 2 * self.w_pad:
            raise ValueError(
                f"strips too narrow for halo exchange: L={self.l} < 2*W={2*self.w_pad}"
            )

        dm, dp = material.matrices()
        self.dm = jnp.asarray(dm, dtype)
        self.dp = jnp.asarray(dp, dtype)
        self.thickness = material.thickness
        self.coords = jnp.asarray(mesh.coords, dtype)

        # ---- per-shard element partition by first-node strip
        def part_elems(conn):
            m = conn.shape[1] if conn.size else (3 if conn is mesh.tri else 4)
            if len(conn) == 0:
                return (
                    np.zeros((s, 0, m), np.int32),
                    np.zeros((s, 0), np.float64),
                )
            anchor_shard = conn[:, 0] // self.l
            order = np.argsort(anchor_shard, kind="stable")
            counts = np.bincount(anchor_shard, minlength=s)
            e_l = int(counts.max())
            out = np.zeros((s, e_l, m), np.int32)
            wgt = np.zeros((s, e_l), np.float64)
            sorted_conn = conn[order]
            pos = 0
            for si in range(s):
                c = counts[si]
                out[si, :c] = sorted_conn[pos : pos + c]
                wgt[si, :c] = 1.0
                if c < e_l and c > 0:
                    out[si, c:] = out[si, 0]
                elif c == 0:
                    # degenerate-free padding: reuse global element 0
                    out[si, :] = conn[0]
                pos += c
            return out, wgt

        tri_p, tri_w = part_elems(mesh.tri)
        quad_p, quad_w = part_elems(mesh.quad)

        shard = NamedSharding(device_mesh, P(AXIS))
        repl = NamedSharding(device_mesh, P())
        self.tri_conn = jax.device_put(jnp.asarray(tri_p), shard)
        self.tri_w = jax.device_put(jnp.asarray(tri_w, dtype), shard)
        self.quad_conn = jax.device_put(jnp.asarray(quad_p), shard)
        self.quad_w = jax.device_put(jnp.asarray(quad_w, dtype), shard)
        self.chunk = int(chunk)

        free = np.ones((self.n_tot, 6), dtype=np.float64)
        mask = mesh.dirichlet_mask() if dirichlet_mask is None else np.asarray(dirichlet_mask, bool)
        free[:n] = ~mask
        free[n:] = 0.0
        self.free = jax.device_put(
            jnp.asarray(free.T.reshape(6, s, self.l).transpose(1, 0, 2), dtype), shard
        )  # [S, 6, L]

        self._solve_jit = jax.jit(self._solve, static_argnums=(2, 3))

    # ------------------------------------------------------------------
    def _halo_exchange(self, x_l):
        """x_l [6, L] per shard -> x_ext [6, Wp + L + Wp] with wrap-around
        halos (harmless: they only multiply zero blocks)."""
        s = self.n_shards
        wp = self.w_pad
        right_edge = x_l[:, -wp:]  # goes to right neighbor's left halo
        left_edge = x_l[:, :wp]  # goes to left neighbor's right halo
        to_right = [(i, (i + 1) % s) for i in range(s)]
        to_left = [(i, (i - 1) % s) for i in range(s)]
        left_halo = jax.lax.ppermute(right_edge, AXIS, to_right)
        right_halo = jax.lax.ppermute(left_edge, AXIS, to_left)
        return jnp.concatenate([left_halo, x_l, right_halo], axis=1)

    def _halo_reduce(self, vals_w):
        """vals_w [C, Wp + L + Wp] window contributions -> [C, L] core with
        edge regions accumulated into/from neighbors."""
        s = self.n_shards
        wp = self.w_pad
        to_right = [(i, (i + 1) % s) for i in range(s)]
        to_left = [(i, (i - 1) % s) for i in range(s)]
        from_left = jax.lax.ppermute(vals_w[:, -wp:], AXIS, to_right)
        from_right = jax.lax.ppermute(vals_w[:, :wp], AXIS, to_left)
        core = vals_w[:, wp : wp + self.l]
        core = core.at[:, :wp].add(from_left)
        core = core.at[:, -wp:].add(from_right)
        return core

    # ------------------------------------------------------------------
    def _assemble_local(self, coords, conn, wgt, kernel, row0):
        """Element contributions of this shard into the haloed window
        [36*K, Wp+L+Wp]; window column = global_node - row0."""
        wp, l, k = self.w_pad, self.l, self.k
        width = l + 2 * wp
        flat = jnp.zeros((36 * k, width), dtype=self.dtype)
        e = conn.shape[0]
        if e == 0:
            return flat
        chunk = min(self.chunk, e)
        n_chunks = -(-e // chunk)
        e_pad = n_chunks * chunk
        conn_p = jnp.concatenate([conn, jnp.broadcast_to(conn[0], (e_pad - e, conn.shape[1]))])
        wgt_p = jnp.concatenate([wgt, jnp.zeros(e_pad - e, self.dtype)])
        m = conn.shape[1]
        off_arr = np.asarray(self.offsets)

        def body(vals, args):
            cc, wc = args
            ke = kernel(coords, cc, self.dm, self.dp, self.thickness) * wc[:, None, None]
            kb = ke.reshape(chunk, m, 6, m, 6)
            kb = jnp.transpose(kb, (2, 4, 0, 1, 3)).reshape(36, chunk * m * m)
            # slot: row = (6x6 entry, offset index); col = local window col
            diffs = cc[:, None, :] - cc[:, :, None]  # [C, m(a), m(b)] col-row
            kslot = jnp.searchsorted(jnp.asarray(off_arr), diffs)  # [C,m,m]
            col = (cc[:, :, None] - row0 + wp).astype(jnp.int32)  # [C,m,1]
            col = jnp.broadcast_to(col, diffs.shape)
            row_idx = jnp.broadcast_to(
                jnp.transpose(kslot, (0, 1, 2)), diffs.shape
            )
            flat_idx = (row_idx * width + col).reshape(-1)
            # scatter into [K, width] per 36 block entries: vals is
            # [36, K*width]; index along axis 1
            vals = vals.reshape(36, k * width).at[:, flat_idx].add(kb)
            return vals.reshape(36 * k, width), None

        flat, _ = jax.lax.scan(
            body,
            flat,
            (conn_p.reshape(n_chunks, chunk, m), wgt_p.reshape(n_chunks, chunk)),
        )
        return flat

    # ------------------------------------------------------------------
    def assemble_vals_spmd(self, coords, tri_c, tri_w, quad_c, quad_w, free_l):
        """Per-shard BC-constrained operator block [6,6,K,L] + inv_diag
        [6,L]. Must run INSIDE a shard_map over AXIS (uses axis_index and
        halo collectives). Reused by the sharded multigrid levels."""
        wp, l, k = self.w_pad, self.l, self.k
        offsets = self.offsets
        k0 = int(np.searchsorted(np.asarray(offsets), 0))
        row0 = jax.lax.axis_index(AXIS).astype(jnp.int32) * l

        win = self._assemble_local(coords, tri_c, tri_w, batched_tri_stiffness, row0)
        win = win + self._assemble_local(coords, quad_c, quad_w, batched_quad_stiffness, row0)
        vals = self._halo_reduce(win).reshape(6, 6, k, l)

        # BC masking: row mask local; col mask via halo'd free
        free_ext = self._halo_exchange(free_l)  # [6, Wp+L+Wp]
        vals = vals * free_l[:, None, None, :]
        for si, off in enumerate(offsets):
            colf = jax.lax.dynamic_slice_in_dim(free_ext, off + wp, l, axis=1)
            vals = vals.at[:, :, si, :].multiply(colf[None, :, :])
        eye = jnp.eye(6, dtype=vals.dtype)
        constrained = 1.0 - free_l
        vals = vals.at[:, :, k0, :].add(eye[:, :, None] * constrained[None, :, :])

        diag = jnp.einsum("aan->an", vals[:, :, k0, :])
        inv_diag = jnp.where(diag != 0, 1.0 / diag, 1.0)
        return vals, inv_diag

    def matvec_spmd(self, vals, x_l):
        """Halo-exchange stencil SpMV [6,L] -> [6,L] (inside shard_map)."""
        wp, l = self.w_pad, self.l
        x_ext = self._halo_exchange(x_l)
        y = jnp.zeros_like(x_l)
        for si, off in enumerate(self.offsets):
            xs = jax.lax.dynamic_slice_in_dim(x_ext, off + wp, l, axis=1)
            y = y + jnp.einsum("abn,bn->an", vals[:, :, si, :], xs)
        return y

    # ------------------------------------------------------------------
    def _solve(self, coords, forces_l, rtol, maxiter):
        def spmd(coords, tri_c, tri_w, quad_c, quad_w, free_l, b_l):
            tri_c, tri_w = tri_c[0], tri_w[0]
            quad_c, quad_w = quad_c[0], quad_w[0]
            free_l, b_l = free_l[0], b_l[0]

            vals, inv_diag = self.assemble_vals_spmd(coords, tri_c, tri_w, quad_c, quad_w, free_l)
            b_l = b_l * free_l
            matvec = lambda x_l: self.matvec_spmd(vals, x_l)  # noqa: E731

            def pdot(a, b):
                return jax.lax.psum(jnp.sum(a * b), AXIS)

            b_norm = jnp.sqrt(pdot(b_l, b_l))
            stop = rtol * b_norm
            x = jnp.zeros_like(b_l)
            r = b_l
            z = inv_diag * r
            pv = z
            rz = pdot(r, z)

            def cond(st):
                _, r, _, _, _, it = st
                return jnp.logical_and(jnp.sqrt(pdot(r, r)) > stop, it < maxiter)

            def body(st):
                x, r, z, pv, rz, it = st
                ap = matvec(pv)
                alpha = rz / pdot(pv, ap)
                x = x + alpha * pv
                r = r - alpha * ap
                z = inv_diag * r
                rz_new = pdot(r, z)
                pv = z + (rz_new / rz) * pv
                return (x, r, z, pv, rz_new, it + 1)

            x, r, _, _, _, it = jax.lax.while_loop(
                cond, body, (x, r, z, pv, rz, jnp.zeros((), jnp.int32))
            )
            res = jnp.sqrt(pdot(r, r)) / b_norm
            return x[None], it[None], res[None]

        out = shard_map(
            spmd,
            mesh=self.device_mesh,
            in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
            out_specs=(P(AXIS), P(AXIS), P(AXIS)),
            check_vma=False,
        )(coords, self.tri_conn, self.tri_w, self.quad_conn, self.quad_w, self.free, forces_l)
        return out

    # ------------------------------------------------------------------
    def solve(self, forces, rtol: float = 1e-10, maxiter: int = 20000):
        s, l = self.n_shards, self.l
        f = np.zeros((self.n_tot, 6))
        f[: self.mesh.n_nodes] = np.asarray(forces)
        f_l = jnp.asarray(f.T.reshape(6, s, l).transpose(1, 0, 2), self.dtype)
        f_l = jax.device_put(f_l, NamedSharding(self.device_mesh, P(AXIS)))
        with jax.default_matmul_precision("highest"):
            x, it, res = self._solve_jit(self.coords, f_l, rtol, maxiter)
        self.last_iters = int(np.max(np.asarray(it)))
        self.last_residual = float(np.max(np.asarray(res)))
        x = np.asarray(x).transpose(1, 0, 2).reshape(6, self.n_tot).T
        return x[: self.mesh.n_nodes]
