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


def _centered_xyz(coords_hi, coords_lo, conn):
    """Per-element node coords, exactly re-centered about node 0.

    ``(coords_hi, coords_lo)`` is a two-float32 (df) representation of the
    f64 host coordinates. Element stiffness is translation-invariant, so
    centering is a mathematical no-op — but done EXACTLY (Knuth two_sum on
    the hi parts, lo parts subtracted at full significance) it removes the
    catastrophic global-coordinate cancellation that otherwise costs
    log2(N/h) bits in plain-f32 edge differences at large mesh sizes.

    NOTE this fixes only the GEOMETRY input error; the f32 kernels still
    round internally, and measured near-cancellation entries of Ke carry
    O(1) relative error that CG amplifies by ~kappa (8e-2 solution error
    at 64^2 already). f32 assembly is therefore a speed path for small
    systems only — accurate large-scale operators come from the strip-df
    assembly below (assemble_soa_df)."""
    from fem_shell_tpu.ops.df import two_sum

    xh = coords_hi[conn]  # [C, m, 3]
    xl = coords_lo[conn]
    s, e = two_sum(xh, -xh[:, :1])
    return s + (e + (xl - xl[:, :1]))


def _centered_tri_stiffness(coords_df, tri_conn, dm, dp, thickness):
    from fem_shell_tpu.ops.elements import tri_shell_stiffness

    xyz = _centered_xyz(coords_df[0], coords_df[1], tri_conn)
    return jax.vmap(lambda p: tri_shell_stiffness(p, dm, dp, thickness))(xyz)


def _centered_quad_stiffness(coords_df, quad_conn, dm, dp, thickness):
    from fem_shell_tpu.ops.elements import quad_shell_stiffness

    xyz = _centered_xyz(coords_df[0], coords_df[1], quad_conn)
    return jax.vmap(lambda p: quad_shell_stiffness(p, dm, dp, thickness))(xyz)


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
    tables, entirely on device (jit-compatible; static pattern).

    ``coords`` is either a plain [N,3] array (kernels see global coords,
    bit-compatible with the AoS reference path) or a two-float32 pair
    ``(hi, lo)`` — then each element is exactly re-centered before the f32
    kernel evaluation (see _centered_xyz)."""
    npad, k = pattern.n_pad, pattern.k
    if isinstance(coords, tuple):
        dtype = coords[0].dtype
        tri_kernel, quad_kernel = _centered_tri_stiffness, _centered_quad_stiffness
    else:
        dtype = coords.dtype
        tri_kernel, quad_kernel = batched_tri_stiffness, batched_quad_stiffness
    flat = jnp.zeros((36, npad * k), dtype=dtype)
    flat = _chunked_scatter(
        flat, coords, tri_conn, tri_slot, tri_kernel, dm, dp, thickness, min(chunk, max(1, tri_conn.shape[0]))
    )
    flat = _chunked_scatter(
        flat, coords, quad_conn, quad_slot, quad_kernel, dm, dp, thickness, min(chunk, max(1, quad_conn.shape[0]))
    )
    # slot index = s*Npad + n, so this reshape is a free view
    return flat.reshape(36, k, npad)


# ----------------------------------------------------------------------
# strip-wise double-float assembly (the multi-million-element path)
# ----------------------------------------------------------------------
#
# A df (two-float32) CG solve needs the OPERATOR accurate to f64 class:
# eps32-level entrywise noise in K is amplified by ~kappa into the
# solution (measured: 8e-2 relative at 64^2, growing ~n^4). Full-f64
# assembly is exact but materializes [36,K,Npad] f64 — at 4.2M nodes
# that is 10.9 GB, and converting it to a df pair doubles the peak. The
# strip pipeline below keeps f64 STRICTLY LOCAL: elements are bucketed by
# node strip on the host; each strip scatters its (emulated-f64) element
# matrices into a small [36,K,W] f64 buffer, converts to two-f32, and
# df-adds into the persistent df carry. Peak = df pair + one strip.


@dataclasses.dataclass
class StripPlan:
    """Host-side strip bucketing of one element family."""

    conn: np.ndarray  # [B, n_sub, chunk, m] int32
    slot: np.ndarray  # [B, n_sub, chunk, m, m] int32 local s*W + (node-start)
    weight: np.ndarray  # [B, n_sub, chunk] f32 (0 = padding)
    starts: np.ndarray  # [B] int32 strip start node
    width: int  # W = strip_nodes + band
    carry_width: int  # >= max(starts) + W and >= n_pad


def build_strip_plan(
    pattern: SoAPattern, conn_np: np.ndarray, slot_np: np.ndarray, strip_nodes: int, chunk: int
) -> Optional[StripPlan]:
    """Bucket elements of one family by the strip of their minimum node.

    An element writes only rows equal to its own node ids, so all its
    writes land in [min_node, min_node + band]; with W = strip + band each
    bucket's scatter fits the local buffer. Buckets are padded (weight 0,
    slot 0) to a uniform [n_sub, chunk] shape for lax.scan."""
    e = len(conn_np)
    if e == 0:
        return None
    npad = pattern.n_pad
    conn_np = np.asarray(conn_np, np.int64)
    slot_np = np.asarray(slot_np, np.int64)
    emin = conn_np.min(axis=1)
    band = int((conn_np.max(axis=1) - emin).max())
    s = int(strip_nodes)
    w = s + band
    bucket = emin // s
    n_b = int(bucket.max()) + 1
    counts = np.bincount(bucket, minlength=n_b)
    n_sub = max(1, -(-int(counts.max()) // chunk))
    eb = n_sub * chunk
    m = conn_np.shape[1]

    conn_out = np.zeros((n_b, eb, m), np.int32)
    slot_out = np.zeros((n_b, eb, m, m), np.int32)
    w_out = np.zeros((n_b, eb), np.float32)
    order = np.argsort(bucket, kind="stable")
    starts_np = (np.arange(n_b, dtype=np.int64) * s).astype(np.int32)
    pos = 0
    slot_s = slot_np // npad  # slot index
    slot_n = slot_np % npad  # row node
    for b in range(n_b):
        c = int(counts[b])
        ids = order[pos : pos + c]
        pos += c
        conn_out[b, :c] = conn_np[ids]
        local = slot_s[ids] * w + (slot_n[ids] - int(starts_np[b]))
        slot_out[b, :c] = local
        w_out[b, :c] = 1.0
        if c < eb:  # padding rows reuse element 0 of the family (weight 0)
            conn_out[b, c:] = conn_np[0]
    carry_w = max(npad, int(starts_np[-1]) + w)
    return StripPlan(
        conn=conn_out.reshape(n_b, n_sub, chunk, m),
        slot=slot_out.reshape(n_b, n_sub, chunk, m, m),
        weight=w_out.reshape(n_b, n_sub, chunk),
        starts=starts_np,
        width=w,
        carry_width=carry_w,
    )


def _strip_scan(hi, lo, coords64, plan_arrays, width, k, kernel, dm, dp, thickness):
    """Scan one family's strip buckets into the df carry (hi, lo)."""
    from fem_shell_tpu.ops.df import two_sum

    conn_b, slot_b, w_b, starts = plan_arrays
    chunk, m = conn_b.shape[2], conn_b.shape[3]

    def step(carry, xs):
        hi, lo = carry
        conn_s, slot_s, w_s, start = xs

        def sub(local, sub_xs):
            cc, sc, wc = sub_xs
            ke = kernel(coords64, cc, dm, dp, thickness) * wc[:, None, None].astype(jnp.float64)
            kb = ke.reshape(chunk, m, 6, m, 6)
            kb = jnp.transpose(kb, (2, 4, 0, 1, 3)).reshape(36, chunk * m * m)
            return local.at[:, sc.reshape(-1)].add(kb), None

        local = jnp.zeros((36, k * width), jnp.float64)
        local, _ = jax.lax.scan(sub, local, (conn_s, slot_s, w_s))
        local = local.reshape(36, k, width)
        seg_hi = local.astype(jnp.float32)
        seg_lo = (local - seg_hi.astype(jnp.float64)).astype(jnp.float32)

        z = jnp.zeros((), start.dtype)
        cur_hi = jax.lax.dynamic_slice(hi, (z, z, start), (36, k, width))
        cur_lo = jax.lax.dynamic_slice(lo, (z, z, start), (36, k, width))
        s_, e_ = two_sum(cur_hi, seg_hi)
        e_ = e_ + (cur_lo + seg_lo)
        n_hi, n_lo = two_sum(s_, e_)
        hi = jax.lax.dynamic_update_slice(hi, n_hi, (z, z, start))
        lo = jax.lax.dynamic_update_slice(lo, n_lo, (z, z, start))
        return (hi, lo), None

    (hi, lo), _ = jax.lax.scan(step, (hi, lo), (conn_b, slot_b, w_b, starts))
    return hi, lo


def assemble_soa_df(
    pattern: SoAPattern,
    coords64,
    tri_plan: Optional[StripPlan],
    quad_plan: Optional[StripPlan],
    tri_arrays,
    quad_arrays,
    dm64,
    dp64,
    thickness,
):
    """Strip-assembled df operator values (hi, lo) of shape [36, K, Npad].

    ``*_plan`` carry static strip metadata; ``*_arrays`` the corresponding
    device arrays (conn, slot, weight, starts) passed as jit ARGUMENTS
    (big tables must not become HLO constants — remote-compile size limit,
    see LargeShellSystem). Entrywise accuracy ~eps64: kernels run in
    emulated f64, strip conversion to two-f32 is exact rounding, cross-
    strip overlap (the band region) folds in with two_sum renormalization.
    """
    from fem_shell_tpu.ops.elements import batched_quad_stiffness, batched_tri_stiffness

    npad, k = pattern.n_pad, pattern.k
    carry_w = max(
        tri_plan.carry_width if tri_plan else 0,
        quad_plan.carry_width if quad_plan else 0,
        npad,
    )
    hi = jnp.zeros((36, k, carry_w), jnp.float32)
    lo = jnp.zeros((36, k, carry_w), jnp.float32)
    if tri_plan is not None:
        hi, lo = _strip_scan(
            hi, lo, coords64, tri_arrays, tri_plan.width, k, batched_tri_stiffness, dm64, dp64, thickness
        )
    if quad_plan is not None:
        hi, lo = _strip_scan(
            hi, lo, coords64, quad_arrays, quad_plan.width, k, batched_quad_stiffness, dm64, dp64, thickness
        )
    return hi[:, :, :npad], lo[:, :, :npad]


def apply_bc_soa_df(values_hi, values_lo, free_t32, adj_t=None, offsets=None):
    """BC masking of a df operator: multiplying by the 0/1 free masks is
    exact on hi and lo separately; the unit diagonal goes into hi only
    (the masked hi there is exactly zero)."""
    k, npad = values_hi.shape[1], values_hi.shape[2]
    col_free = _col_values(free_t32, adj_t, offsets, k)  # [6, K, Npad]
    mask = free_t32[:, None, None, :] * col_free[None, :, :, :]
    vh = values_hi.reshape(6, 6, k, npad) * mask
    vl = values_lo.reshape(6, 6, k, npad) * mask
    first_self = _self_mask(adj_t, offsets, k, npad, vh.dtype)
    eye = jnp.eye(6, dtype=vh.dtype)
    constrained = 1.0 - free_t32
    vh = vh + eye[:, :, None, None] * constrained[None, :, None, :] * first_self[None, None]
    return vh.reshape(36, k, npad), vl.reshape(36, k, npad)


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


def soa_self_blocks(values, adj_t=None, offsets=None):
    """[Npad, 6, 6] per-node diagonal (self-coupling) blocks — the
    block-Jacobi preconditioner source (PETSc -pc_type bjacobi analog)."""
    k, npad = values.shape[1], values.shape[2]
    v = values.reshape(6, 6, k, npad)
    first_self = _self_mask(adj_t, offsets, k, npad, v.dtype)
    return jnp.einsum("abkn,kn->nab", v, first_self)


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
