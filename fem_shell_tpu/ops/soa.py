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
    mesh, k_max: Optional[int] = None, pad_to: int = 4096, max_stencil: int = 32
) -> SoAPattern:
    # pad_to=4096 keeps Npad/128 a multiple of 32: the Pallas SpMV kernels
    # always get full (8,128) row tiles AND the tile count stays divisible
    # by 4 so the df pair kernel can batch multiple tiles per grid step
    # (per-step overhead halved the measured 426 GB/s at 1024^2, r3)
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
    slot 0) to a uniform [n_sub, chunk] shape. The LAST strip's start is
    clamped so the carry never extends past n_pad (local indices stay
    valid because its elements' min nodes are >= the unclamped start)."""
    e = len(conn_np)
    if e == 0:
        return None
    npad = pattern.n_pad
    conn_np = np.asarray(conn_np, np.int64)
    slot_np = np.asarray(slot_np, np.int64)
    emin = conn_np.min(axis=1)
    band = int((conn_np.max(axis=1) - emin).max())
    s = int(strip_nodes)
    w = min(s + band, npad)
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
    starts_np = np.minimum(np.arange(n_b, dtype=np.int64) * s, npad - w).astype(np.int32)
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
    return StripPlan(
        conn=conn_out.reshape(n_b, n_sub, chunk, m),
        slot=slot_out.reshape(n_b, n_sub, chunk, m, m),
        weight=w_out.reshape(n_b, n_sub, chunk),
        starts=starts_np,
        width=w,
        carry_width=npad,
    )


_STRIP_STEP_CACHE = {}


def _make_strip_step(k: int, width: int, chunk: int, m: int, kernel, thickness, offsets, halo: int):
    """One donated-in-place strip update of the FLAT df carry [36K, Npad].

    Python-driven (one jitted call per strip) rather than lax.scan:
    buffer DONATION guarantees the multi-GB df carry updates in place —
    inside a while-loop XLA kept a second copy of the carry alive, which
    OOMed at 4.2M nodes — and the per-strip graph compiles once per
    family instead of one giant scan graph. The flat [36K, Npad] layout
    avoids (8,128) tile padding of a 36-sublane axis (1.11x = ~1.2 GB on
    a 4.2M-node df pair). BC row/col masks are applied per strip (masks
    are idempotent 0/1 multipliers, so band-overlap regions masked twice
    stay correct); the constrained-diagonal 1s are added afterwards by
    add_unit_diagonal_df. Steps are memoized by their static config so
    repeated assemblies (benchmark reps, coupling steps) reuse the traced
    jit instead of re-tracing."""
    key = (k, width, chunk, m, kernel, float(thickness), tuple(offsets), halo)
    if key in _STRIP_STEP_CACHE:
        return _STRIP_STEP_CACHE[key]

    def step(hi, lo, coords64, dm, dp, free_pad, conn_s, slot_s, w_s, start):
        from fem_shell_tpu.ops.df import two_sum

        # python-unrolled sub-chunk loop (NOT lax.scan): under scan XLA
        # rematerialized the element-matrix batch across steps as one
        # [n_sub, chunk, m, m, 6, 6] temp whose (6,6) trailing axes
        # tile-pad 28x (observed 4 GB at 4.2M nodes)
        local = jnp.zeros((36, k * width), jnp.float64)
        for i in range(conn_s.shape[0]):
            cc, sc, wc = conn_s[i], slot_s[i], w_s[i]
            ke = kernel(coords64, cc, dm, dp, thickness) * wc[:, None, None].astype(jnp.float64)
            kb = ke.reshape(chunk, m, 6, m, 6)
            kb = jnp.transpose(kb, (2, 4, 0, 1, 3)).reshape(36, chunk * m * m)
            local = local.at[:, sc.reshape(-1)].add(kb)
        local = local.reshape(36 * k, width)
        seg_hi = local.astype(jnp.float32)
        seg_lo = (local - seg_hi.astype(jnp.float64)).astype(jnp.float32)

        z = jnp.zeros((), start.dtype)
        # free_pad is [6, halo + Npad + halo]; windowed row/col masks
        row_free = jax.lax.dynamic_slice(free_pad, (z, start + halo), (6, width))
        col_free = [
            jax.lax.dynamic_slice(free_pad, (z, start + halo + int(offsets[s])), (6, width))
            for s in range(k)
        ]
        mask = jnp.stack(
            [
                row_free[a] * col_free[s][b]
                for a in range(6)
                for b in range(6)
                for s in range(k)
            ]
        )  # [36K, width]
        seg_hi = seg_hi * mask
        seg_lo = seg_lo * mask

        cur_hi = jax.lax.dynamic_slice(hi, (z, start), (36 * k, width))
        cur_lo = jax.lax.dynamic_slice(lo, (z, start), (36 * k, width))
        s_, e_ = two_sum(cur_hi, seg_hi)
        e_ = e_ + (cur_lo + seg_lo)
        n_hi, n_lo = two_sum(s_, e_)
        hi = jax.lax.dynamic_update_slice(hi, n_hi, (z, start))
        lo = jax.lax.dynamic_update_slice(lo, n_lo, (z, start))
        return hi, lo

    fn = jax.jit(step, donate_argnums=(0, 1))
    _STRIP_STEP_CACHE[key] = fn
    return fn


def add_unit_diagonal_df(hi, free_t32, offsets, k):
    """Set the constrained DOFs' diagonal to exactly 1 (hi only; their lo
    is exactly zero after masking). hi is flat [36K, Npad]; donated."""
    k0 = int(np.searchsorted(np.asarray(offsets), 0))
    constrained = 1.0 - free_t32  # [6, Npad]
    for a in range(6):
        hi = hi.at[(a * 6 + a) * k + k0, :].add(constrained[a])
    return hi


def assemble_soa_df(
    pattern: SoAPattern,
    coords64,
    tri_plan: Optional[StripPlan],
    quad_plan: Optional[StripPlan],
    dm64,
    dp64,
    thickness,
    free_t32,
):
    """Strip-assembled, BC-constrained df operator values (hi, lo), each
    FLAT [36*K, Npad] f32 (row = (6a+b)*K + s).

    Entrywise accuracy ~eps64: kernels run in emulated f64 one strip at a
    time, strip conversion to two-f32 is exact rounding, cross-strip
    overlap (the band region) folds in with two_sum renormalization.
    Peak device memory = the df pair + ONE strip's f64 buffer + one
    strip's element tables (uploaded per call; they never persist).
    Stencil mode only (offsets required for the windowed column masks)."""
    from fem_shell_tpu.ops.elements import batched_quad_stiffness, batched_tri_stiffness

    if pattern.offsets is None:
        raise NotImplementedError("strip-df assembly requires stencil mode")
    npad, k = pattern.n_pad, pattern.k
    offsets = [int(o) for o in pattern.offsets]
    halo = max(abs(offsets[0]), abs(offsets[-1]))
    free_pad = jnp.pad(free_t32.astype(jnp.float32), ((0, 0), (halo, halo)))

    hi = jnp.zeros((36 * k, npad), jnp.float32)
    lo = jnp.zeros((36 * k, npad), jnp.float32)
    for plan, kernel in ((tri_plan, batched_tri_stiffness), (quad_plan, batched_quad_stiffness)):
        if plan is None:
            continue
        chunk, m = plan.conn.shape[2], plan.conn.shape[3]
        step = _make_strip_step(k, plan.width, chunk, m, kernel, thickness, offsets, halo)
        for b in range(plan.conn.shape[0]):
            hi, lo = step(
                hi,
                lo,
                coords64,
                dm64,
                dp64,
                free_pad,
                jnp.asarray(plan.conn[b]),
                jnp.asarray(plan.slot[b]),
                jnp.asarray(plan.weight[b]),
                jnp.asarray(plan.starts[b]),
            )
    hi = _add_diag_jit()(hi, free_t32.astype(jnp.float32), tuple(offsets), k)
    return hi, lo


_ADD_DIAG_JIT = None


def _add_diag_jit():
    """One cached wrapper: a fresh jax.jit per assemble call re-compiles
    every time (the remote axon platform bypasses the persistent compile
    cache — fresh wrappers cost minutes per warm reassemble)."""
    global _ADD_DIAG_JIT
    if _ADD_DIAG_JIT is None:
        _ADD_DIAG_JIT = jax.jit(
            add_unit_diagonal_df, static_argnums=(2, 3), donate_argnums=0
        )
    return _ADD_DIAG_JIT


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
    """[6, Npad] diagonal of the SoA operator (either values layout)."""
    rows, k, npad = _slot_rows(values, adj_t, offsets)
    first_self = _self_mask(adj_t, offsets, k, npad, values.dtype)
    return jnp.stack(
        [sum(rows(a, a, s) * first_self[s] for s in range(k)) for a in range(6)]
    )


def _slot_rows(values, adj_t, offsets):
    """(accessor, k, npad) for operator values in either layout: FLAT
    [36K, N] (production df path — indexing keeps the efficient 2D
    argument layout, no reshape) or [36, K, N]."""
    k = len(offsets) if offsets is not None else adj_t.shape[0]
    npad = values.shape[-1]
    if values.ndim == 2:
        return (lambda a, b, s: values[(a * 6 + b) * k + s]), k, npad
    v4 = values.reshape(6, 6, k, npad)
    return (lambda a, b, s: v4[a, b, s]), k, npad


def soa_self_blocks(values, adj_t=None, offsets=None):
    """[Npad, 6, 6] per-node diagonal (self-coupling) blocks — the
    block-Jacobi preconditioner source (PETSc -pc_type bjacobi analog)."""
    rows, k, npad = _slot_rows(values, adj_t, offsets)
    first_self = _self_mask(adj_t, offsets, k, npad, values.dtype)
    blocks = jnp.stack(
        [
            jnp.stack([sum(rows(a, b, s) * first_self[s] for s in range(k)) for b in range(6)])
            for a in range(6)
        ]
    )  # [6, 6, Npad]
    return jnp.transpose(blocks, (2, 0, 1))


def soa_matvec(values, x, adj_t=None, offsets=None):
    """y = A @ x with x, y of shape [6, Npad].

    Stencil mode is gather-free: each slot contributes a lane-shifted
    multiply-add; wrapped lanes multiply identically-zero blocks.
    Values may be [36, K, Npad] or flat [36K, Npad]."""
    rows, k, npad = _slot_rows(values, adj_t, offsets)
    y = jnp.zeros_like(x)
    if offsets is not None:
        for s, o in enumerate(offsets):
            xs = jnp.roll(x, -int(o), axis=1)  # [6, Npad]
            for b in range(6):
                vb = jnp.stack([rows(a, b, s) for a in range(6)])
                y = y + vb * xs[b]
        return y
    xg = x[:, adj_t]  # [6, K, Npad] — K lane-gathers
    for s in range(k):
        for b in range(6):
            vb = jnp.stack([rows(a, b, s) for a in range(6)])
            y = y + vb * xg[b, s]
    return y
