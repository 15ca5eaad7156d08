"""Assembly: element stiffnesses -> global sparse/dense operators.

TPU-native replacement for libMesh DofMap + PETSc MatMPIAIJ assembly
(fem-shell.cpp:1160-1233, add_matrix at :1230). Instead of a per-element
serial scatter into a distributed CSR, we:

1. build all element stiffnesses batched (``vmap``; ops/elements.py),
2. scatter-add their 6x6 node-pair blocks into a **block-ELL** operator —
   per node, a padded list of neighbor nodes and one 6x6 block each —
   with statically precomputed slot indices (pure gather/scatter, jittable),
3. run SpMV as gather + batched small matmuls (MXU/VPU friendly), or go
   fully matrix-free (recompute Ke on the fly; minimizes HBM traffic).

DOF numbering: ``dof = 6*node + var`` (node-major). The reference's
variable-major element permutation (fem-shell.cpp:1104-1109) is not needed
because we own the numbering end to end.

Dirichlet constraints follow libMesh ``constrain_element_matrix_and_vector``
semantics for zero-valued boundaries (fem-shell.cpp:1227): symmetric
row/column elimination with a unit diagonal — implemented functionally as
masks applied to the assembled blocks (or to the operator application in
the matrix-free path), which yields the identical solution.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fem_shell_tpu.mesh import ShellMesh
from fem_shell_tpu.ops.elements import batched_quad_stiffness, batched_tri_stiffness


# ----------------------------------------------------------------------
# Host-side sparsity pattern (the DofMap analog)
# ----------------------------------------------------------------------


@dataclasses.dataclass
class EllPattern:
    """Static block-ELL sparsity pattern of the node-pair graph.

    - ``adj [N, K]``: neighbor node ids per node (self included), padded
      with the node's own id (padding blocks stay zero, so self-padding is
      harmless for SpMV).
    - ``valid [N, K]``: True for real neighbors.
    - ``tri_slot [Et, 3, 3]`` / ``quad_slot [Eq, 4, 4]``: for element e and
      local node pair (i, j), the flattened destination ``adj`` row/slot of
      block (node_i, node_j) — precomputed so device assembly is a single
      scatter-add with static indices.
    """

    adj: np.ndarray
    valid: np.ndarray
    tri_slot: np.ndarray
    quad_slot: np.ndarray

    @property
    def n_nodes(self) -> int:
        return self.adj.shape[0]

    @property
    def k_max(self) -> int:
        return self.adj.shape[1]


def build_ell_pattern(mesh: ShellMesh, k_max: Optional[int] = None) -> EllPattern:
    """Build the block-ELL pattern from connectivity (host, numpy).

    A native C++ fast path (fem_shell_tpu.native) is used when available;
    this numpy implementation is the reference fallback.
    """
    try:
        from fem_shell_tpu.native import build_ell_pattern_native

        out = build_ell_pattern_native(mesh, k_max)
        if out is not None:
            return out
    except Exception:
        pass
    return _build_ell_pattern_py(mesh, k_max)


def _build_ell_pattern_py(mesh: ShellMesh, k_max: Optional[int] = None) -> EllPattern:
    n = mesh.n_nodes
    nbr_lists = mesh.node_adjacency()
    k_req = max((len(l) for l in nbr_lists), default=1)
    k = k_req if k_max is None else max(k_max, k_req)
    adj = np.empty((n, k), dtype=np.int32)
    valid = np.zeros((n, k), dtype=bool)
    lookup = {}
    for i, lst in enumerate(nbr_lists):
        adj[i, : len(lst)] = lst
        adj[i, len(lst) :] = i  # pad with self
        valid[i, : len(lst)] = True
        for s, j in enumerate(lst):
            lookup[(i, int(j))] = s

    def slots(conn):
        e, m = conn.shape
        out = np.empty((e, m, m), dtype=np.int32)
        for ei in range(e):
            row = conn[ei]
            for a in range(m):
                ia = int(row[a])
                for b in range(m):
                    out[ei, a, b] = ia * k + lookup[(ia, int(row[b]))]
        return out

    tri_slot = slots(mesh.tri) if len(mesh.tri) else np.zeros((0, 3, 3), np.int32)
    quad_slot = slots(mesh.quad) if len(mesh.quad) else np.zeros((0, 4, 4), np.int32)
    return EllPattern(adj, valid, tri_slot, quad_slot)


# ----------------------------------------------------------------------
# Device-side assembled operator
# ----------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BlockEllMatrix:
    """Assembled block-ELL operator: y = A @ x with x, y of shape [N, 6]."""

    blocks: jnp.ndarray  # [N, K, 6, 6]
    adj: jnp.ndarray  # [N, K] int32

    def tree_flatten(self):
        return (self.blocks, self.adj), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, 6] -> [N, 6] via gather + batched 6x6 matmuls."""
        xg = x[self.adj]  # [N, K, 6]
        return jnp.einsum("nkab,nkb->na", self.blocks, xg)

    def diagonal(self) -> jnp.ndarray:
        """[N, 6] diagonal (for Jacobi preconditioning). The self block is
        wherever adj[n, k] == n; padding uses self ids but zero blocks, so a
        masked sum over matching slots is exact."""
        n = self.blocks.shape[0]
        is_self = self.adj == jnp.arange(n, dtype=self.adj.dtype)[:, None]
        diag_blocks = jnp.einsum("nkaa->nka", self.blocks)  # [N, K, 6]
        return jnp.sum(jnp.where(is_self[..., None], diag_blocks, 0.0), axis=1)

    def diagonal_blocks(self) -> jnp.ndarray:
        """[N, 6, 6] self-coupling blocks (for block-Jacobi preconditioning)."""
        n = self.blocks.shape[0]
        is_self = self.adj == jnp.arange(n, dtype=self.adj.dtype)[:, None]
        first_self = (jnp.cumsum(is_self.astype(jnp.int32), axis=1) * is_self) == 1
        return jnp.sum(
            jnp.where(first_self[:, :, None, None], self.blocks, 0.0), axis=1
        )

    def to_dense(self) -> jnp.ndarray:
        n, k = self.adj.shape
        dense = jnp.zeros((n, 6, n, 6), dtype=self.blocks.dtype)
        rows = jnp.repeat(jnp.arange(n), k)
        cols = self.adj.reshape(-1)
        dense = dense.at[rows, :, cols, :].add(
            self.blocks.reshape(n * k, 6, 6)
        )
        return dense.reshape(6 * n, 6 * n)


def element_stiffnesses(mesh_arrays, dm, dp, thickness):
    """Batched element stiffness matrices for both element families.

    ``mesh_arrays`` = (coords, tri_conn, quad_conn) device arrays.
    Returns (ke_tri [Et,18,18], ke_quad [Eq,24,24]).
    """
    coords, tri_conn, quad_conn = mesh_arrays
    ke_tri = (
        batched_tri_stiffness(coords, tri_conn, dm, dp, thickness)
        if tri_conn.shape[0]
        else jnp.zeros((0, 18, 18), coords.dtype)
    )
    ke_quad = (
        batched_quad_stiffness(coords, quad_conn, dm, dp, thickness)
        if quad_conn.shape[0]
        else jnp.zeros((0, 24, 24), coords.dtype)
    )
    return ke_tri, ke_quad


def scatter_to_ell(ke_tri, ke_quad, pattern: EllPattern, tri_slot, quad_slot) -> jnp.ndarray:
    """Scatter element 6x6 blocks into the block-ELL value tensor.

    Returns ``blocks [N, K, 6, 6]``. This is the jittable analog of the
    PETSc ``MatSetValues`` loop, as one deterministic scatter-add.
    """
    n, k = pattern.adj.shape
    flat = jnp.zeros((n * k, 6, 6), dtype=ke_tri.dtype if ke_tri.size else ke_quad.dtype)
    if ke_tri.shape[0]:
        kb = ke_tri.reshape(-1, 3, 6, 3, 6).transpose(0, 1, 3, 2, 4)  # [Et,3,3,6,6]
        flat = flat.at[tri_slot.reshape(-1)].add(kb.reshape(-1, 6, 6))
    if ke_quad.shape[0]:
        kb = ke_quad.reshape(-1, 4, 6, 4, 6).transpose(0, 1, 3, 2, 4)
        flat = flat.at[quad_slot.reshape(-1)].add(kb.reshape(-1, 6, 6))
    return flat.reshape(n, k, 6, 6)


def apply_dirichlet_to_ell(blocks, adj, free_mask) -> jnp.ndarray:
    """Symmetric zero-Dirichlet elimination on the block-ELL operator.

    ``free_mask``: [N, 6] float (1 = free dof, 0 = constrained). Zeroes
    constrained rows/cols and puts 1 on constrained diagonals, matching the
    effect of libMesh's per-element constraint condensation on the solution.
    """
    n = blocks.shape[0]
    row = free_mask[:, None, :, None]  # [N,1,6,1]
    col = free_mask[adj][:, :, None, :]  # [N,K,1,6]
    blocks = blocks * row * col
    is_self = (adj == jnp.arange(n, dtype=adj.dtype)[:, None]).astype(blocks.dtype)
    # add 1 to constrained diagonal entries, only once (first matching slot)
    first_self = jnp.cumsum(is_self, axis=1) * is_self  # 1 at first self slot
    first_self = (first_self == 1).astype(blocks.dtype)
    eye = jnp.eye(6, dtype=blocks.dtype)
    constrained = 1.0 - free_mask  # [N,6]
    blocks = blocks + first_self[:, :, None, None] * (
        eye[None, None] * constrained[:, None, :, None]
    )
    return blocks


def constrained_rhs(forces, free_mask) -> jnp.ndarray:
    """RHS with constrained dofs zeroed (zero-valued Dirichlet)."""
    return forces * free_mask
