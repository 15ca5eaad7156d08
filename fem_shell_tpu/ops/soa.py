"""Structure-of-arrays block-ELL operator for large meshes.

TPU memory layouts tile the trailing two axes to (8,128) (f32), so the
natural AoS block layout ``[N, K, 6, 6]`` pads 6x6 blocks to 8x128 — a 21x
HBM blowup that OOMs around 10^6 nodes. This module keeps the *node* axis
on the lanes instead:

- operator values ``[36, K, Npad]``  (viewed as [6,6,K,Npad]; ~1.8x pad
  from K, nothing from the big axis)
- vectors ``[6, Npad]``
- adjacency transposed ``[K, Npad]``

SpMV is then K lane-gathers + a fully vectorized multiply-reduce over the
small leading axes — pure VPU work at streaming bandwidth. Assembly runs
in element chunks under ``lax.map`` so per-chunk element matrices stay in
a bounded transient footprint.

This is the production path for the >10^6-element regime; the AoS path in
ops/assemble.py remains the reference implementation (golden tests, small
meshes — where it is latency- not layout-bound).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fem_shell_tpu.ops.elements import batched_quad_stiffness, batched_tri_stiffness


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass
class SoAPattern:
    """Host-side static data for the SoA operator.

    Two column-addressing modes:
    - **stencil** (``offsets is not None``): every stored slot k holds the
      coupling to node ``n + offsets[k]``. SpMV then needs NO gather at
      all — each slot is a lane-shift (roll) of x, i.e. pure streaming.
      This is the natural mode for banded/structured meshes (the meshGen
      grids are 7/9-point stencils) and for bandwidth-reordered meshes.
    - **gather** (``offsets is None``): explicit per-node neighbor table
      ``adj_t [K, Npad]`` (general unstructured fallback).
    Out-of-range stencil targets simply address wrapped lanes whose block
    values are identically zero, so no masking is needed in the matvec.
    """

    n_nodes: int
    n_pad: int
    k: int
    adj_t: Optional[np.ndarray]  # [K, Npad]; None in stencil mode
    offsets: Optional[np.ndarray]  # [K] int64; None in gather mode
    tri_slot: np.ndarray  # [Et, 3, 3] flat slot s*Npad + n
    quad_slot: np.ndarray  # [Eq, 4, 4]


def _offsets_of(mesh) -> np.ndarray:
    offs = {0}
    for conn in (mesh.tri, mesh.quad):
        if len(conn) == 0:
            continue
        c = conn.astype(np.int64)
        m = c.shape[1]
        for a in range(m):
            for b in range(m):
                offs.update(np.unique(c[:, b] - c[:, a]).tolist())
    return np.array(sorted(offs), dtype=np.int64)


def build_soa_pattern(
    mesh, k_max: Optional[int] = None, pad_to: int = 1024, max_stencil: int = 32
) -> SoAPattern:
    # pad_to=1024 keeps Npad/128 a multiple of 8 so the Pallas SpMV kernel
    # can always use full (8,128) row tiles
    n = mesh.n_nodes
    n_pad = _ceil_to(n, pad_to)
    offsets = _offsets_of(mesh)
    if len(offsets) <= max_stencil and (k_max is None or len(offsets) <= k_max):
        k = len(offsets)
        off_index = {int(o): i for i, o in enumerate(offsets)}

        def slots(conn):
            if len(conn) == 0:
                mm = conn.shape[1]
                return np.zeros((0, mm, mm), np.int64)
            c = conn.astype(np.int64)
            m = c.shape[1]
            out = np.empty((len(c), m, m), dtype=np.int64)
            lut_keys = offsets
            for a in range(m):
                for b in range(m):
                    d = c[:, b] - c[:, a]
                    s = np.searchsorted(lut_keys, d)
                    out[:, a, b] = s * n_pad + c[:, a]
            return out

        return SoAPattern(
            n_nodes=n,
            n_pad=n_pad,
            k=k,
            adj_t=None,
            offsets=offsets,
            tri_slot=slots(mesh.tri),
            quad_slot=slots(mesh.quad),
        )

    # general gather mode
    from fem_shell_tpu.ops.assemble import build_ell_pattern

    p = build_ell_pattern(mesh, k_max=k_max)
    n, k = p.adj.shape
    adj = np.empty((n_pad, k), dtype=np.int32)
    adj[:n] = p.adj
    adj[n:] = np.arange(n, n_pad, dtype=np.int32)[:, None]

    def to_slot_major(slot):
        # AoS slots are node-major (n*k + s); the SoA flat buffer is
        # slot-major (s*n_pad + n) so that reshape -> [36, K, Npad] is a
        # no-copy view with the big axis on the lanes (no K->128 padding).
        s = slot % k
        node = slot // k
        return (s.astype(np.int64) * n_pad + node).astype(np.int64)

    return SoAPattern(
        n_nodes=n,
        n_pad=n_pad,
        k=k,
        adj_t=np.ascontiguousarray(adj.T),
        offsets=None,
        tri_slot=to_slot_major(p.tri_slot),
        quad_slot=to_slot_major(p.quad_slot),
    )


# ----------------------------------------------------------------------
# assembly
# ----------------------------------------------------------------------


def _chunked_scatter(values_flat, coords, conn, slot, kernel, dm, dp, t, chunk):
    """Scatter one element family into values_flat [36, Npad*K] in chunks."""
    e = conn.shape[0]
    if e == 0:
        return values_flat
    n_chunks = -(-e // chunk)
    e_pad = n_chunks * chunk
    # pad with element 0, weight 0
    conn_p = jnp.concatenate([conn, jnp.broadcast_to(conn[0], (e_pad - e, conn.shape[1]))])
    slot_p = jnp.concatenate([slot, jnp.broadcast_to(slot[0], (e_pad - e,) + slot.shape[1:])])
    w = jnp.concatenate(
        [jnp.ones(e, values_flat.dtype), jnp.zeros(e_pad - e, values_flat.dtype)]
    )
    m = conn.shape[1]
    conn_c = conn_p.reshape(n_chunks, chunk, m)
    slot_c = slot_p.reshape(n_chunks, chunk, m, m)
    w_c = w.reshape(n_chunks, chunk)

    def body(vals, args):
        cc, sc, wc = args
        ke = kernel(coords, cc, dm, dp, t) * wc[:, None, None]  # [C, 6m, 6m]
        kb = ke.reshape(chunk, m, 6, m, 6)
        kb = jnp.transpose(kb, (2, 4, 0, 1, 3)).reshape(36, chunk * m * m)
        vals = vals.at[:, sc.reshape(-1)].add(kb)
        return vals, None

    values_flat, _ = jax.lax.scan(body, values_flat, (conn_c, slot_c, w_c))
    return values_flat


def assemble_soa(
    pattern: SoAPattern,
    coords,
    tri_conn,
    quad_conn,
    tri_slot,
    quad_slot,
    dm,
    dp,
    thickness,
    free_t,  # [6, Npad] 1=free
    chunk: int = 16384,
):
    """Build BC-constrained SoA operator values [36, K, Npad] + adj gather
    tables, entirely on device (jit-compatible; static pattern)."""
    npad, k = pattern.n_pad, pattern.k
    dtype = coords.dtype
    flat = jnp.zeros((36, npad * k), dtype=dtype)
    flat = _chunked_scatter(
        flat, coords, tri_conn, tri_slot, batched_tri_stiffness, dm, dp, thickness, min(chunk, max(1, tri_conn.shape[0]))
    )
    flat = _chunked_scatter(
        flat, coords, quad_conn, quad_slot, batched_quad_stiffness, dm, dp, thickness, min(chunk, max(1, quad_conn.shape[0]))
    )
    # slot index = s*Npad + n, so this reshape is a free view
    return flat.reshape(36, k, npad)


def _col_values(x, adj_t, offsets, k):
    """[6, K, Npad] column values of x per stored slot: lane shifts in
    stencil mode (streaming), a gather in general mode."""
    if offsets is not None:
        return jnp.stack([jnp.roll(x, -int(o), axis=1) for o in offsets], axis=1)
    return x[:, adj_t]


def _self_mask(adj_t, offsets, k, npad, dtype):
    """[K, Npad] 1.0 at the (first) self slot of each row."""
    if offsets is not None:
        k0 = int(np.searchsorted(np.asarray(offsets), 0))
        m = np.zeros((k, npad), dtype=np.float32)
        m[k0, :] = 1.0
        return jnp.asarray(m, dtype)
    node_ids = jnp.arange(npad, dtype=adj_t.dtype)
    is_self = (adj_t == node_ids[None, :]).astype(dtype)
    return ((jnp.cumsum(is_self, axis=0) * is_self) == 1).astype(dtype)


def apply_bc_soa(values, free_t, adj_t=None, offsets=None):
    """Zero constrained rows/cols and set unit diagonals, SoA layout.
    values [36,K,Npad] viewed [6,6,K,Npad]; free_t [6,Npad]."""
    k, npad = values.shape[1], values.shape[2]
    v = values.reshape(6, 6, k, npad)
    col_free = _col_values(free_t, adj_t, offsets, k)  # [6, K, Npad]
    v = v * free_t[:, None, None, :] * col_free[None, :, :, :]
    first_self = _self_mask(adj_t, offsets, k, npad, v.dtype)
    eye = jnp.eye(6, dtype=v.dtype)
    constrained = 1.0 - free_t  # [6, Npad]
    v = v + eye[:, :, None, None] * constrained[None, :, None, :] * first_self[None, None]
    return v.reshape(36, k, npad)


def soa_diagonal(values, adj_t=None, offsets=None):
    """[6, Npad] diagonal of the SoA operator."""
    k, npad = values.shape[1], values.shape[2]
    v = values.reshape(6, 6, k, npad)
    first_self = _self_mask(adj_t, offsets, k, npad, v.dtype)
    diag_abkn = jnp.einsum("aakn->akn", v)
    return jnp.sum(diag_abkn * first_self[None], axis=1)


def soa_matvec(values, x, adj_t=None, offsets=None):
    """y = A @ x with x, y of shape [6, Npad].

    Stencil mode is gather-free: each slot contributes a lane-shifted
    multiply-add; wrapped lanes multiply identically-zero blocks.
    """
    k, npad = values.shape[1], values.shape[2]
    v = values.reshape(6, 6, k, npad)
    if offsets is not None:
        y = jnp.zeros_like(x)
        for s, o in enumerate(offsets):
            xs = jnp.roll(x, -int(o), axis=1)  # [6, Npad]
            y = y + jnp.einsum("abn,bn->an", v[:, :, s, :], xs)
        return y
    xg = x[:, adj_t]  # [6, K, Npad] — K lane-gathers
    return jnp.einsum("abkn,bkn->an", v, xg)
