"""Sharded scatter-free grid-df assembly: per-device row blocks.

This closes the last single-chip admission in the multi-chip story: the
shifted-window df assembly pipeline (ops/assemble_grid.py — the
production operator builder on structured grids, reference hot-loop
analog fem-shell.cpp:1160-1233) here runs PER SHARD on a 1D node-row
partition of the grid, host-orchestrated exactly like the single-chip
strip loop but with each shard's donated carry living on its own device
(the per-shard loops dispatch asynchronously, so devices assemble
concurrently; on a real multi-host pod each host drives only its local
shards — same code).

Decomposition. Node rows are partitioned [row_starts[s], row_starts[s+1]).
Shard ``s`` runs the element rows aligned with its owned node rows; an
element row ``e`` contributes to node rows ``e`` and ``e+1``, so every
non-last shard accumulates ONE extra bottom halo node row. After the
local strip loops a single [36K, nxp] operator-row block per boundary is
moved to the downstream neighbor and folded with the same renormalized
two_sum used by the strip carry — the cross-shard node rows stay
df-exact, and the concatenated blocks reproduce the single-chip operator
(bitwise for one shard; to the lo-fold rounding ~2^-49|A| otherwise —
parity-tested in tests/test_grid_asm_shard.py).

BC handling needs no special casing: the strip steps mask rows/columns
with idempotent 0/1 freedom factors (including the halo row, whose
freedoms are its REAL global ones), and the constrained unit diagonal is
placed in each shard's carry INIT for owned rows only — halo
contributions to constrained entries arrive as exact zeros.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fem_shell_tpu.ops.assemble_grid import _make_grid_step
from fem_shell_tpu.ops.df import DF
from fem_shell_tpu.ops.dfk import two_sum
from fem_shell_tpu.ops.soa import add_unit_diagonal_df


def partition_rows(nyp: int, n_shards: int) -> List[int]:
    """Balanced node-row starts over the ny = nyp-1 element rows; every
    shard gets >=1 element row (n_shards is clamped down if needed)."""
    ny = nyp - 1
    n_shards = max(1, min(n_shards, ny))
    base, rem = divmod(ny, n_shards)
    starts = [0]
    for s in range(n_shards):
        starts.append(starts[-1] + base + (1 if s < rem else 0))
    starts[-1] = nyp  # last shard also owns the final node row
    return starts


def _halo_fold(hi, lo, add_h, add_l, nxp: int):
    """two_sum-renormalized fold of a neighbor's [36K, nxp] halo block
    into the first node row of this shard's carry (same fold as the
    strip steps)."""
    cur_h = hi[:, :nxp]
    cur_l = lo[:, :nxp]
    s_, e_ = two_sum(cur_h, add_h)
    e_ = e_ + (cur_l + add_l)
    n_h, n_l = two_sum(s_, e_)
    hi = jax.lax.dynamic_update_slice(hi, n_h, (0, 0))
    lo = jax.lax.dynamic_update_slice(lo, n_l, (0, 0))
    return hi, lo


_halo_fold_jit = jax.jit(_halo_fold, static_argnums=(4,), donate_argnums=(0, 1))


def assemble_grid_df_rowblocks(
    grid,  # mg.GridInfo
    coords64: np.ndarray,  # [nyp*nxp, 3] f64 host coords
    free_t32,  # [6, Npad] f32 (1 = free), global flat layout
    offsets,
    kernel_fn,
    row_starts: Sequence[int],
    strip_rows: Optional[int] = None,
    eager: bool = False,
    devices: Optional[Sequence] = None,
) -> List[DF]:
    """Per-shard BC-constrained df operator row blocks.

    Returns ``blocks[s]`` = DF ``[36K, owned_rows_s * nxp]`` — the exact
    rows of the global flat operator (ops/soa.py layout) for shard s's
    owned node rows. ``devices[s]`` (optional) pins shard s's carry and
    strip dispatches to that device; default = the process default
    (still correct, used by the CPU tests).

    ``eager=True`` skips all jits (CPU tests only: CPU jit FMA-contracts
    the error-free transforms, see ops/df.py)."""
    nyp, nxp = grid.nyp, grid.nxp
    nx, ny = nxp - 1, nyp - 1
    k = len(offsets)
    offsets = tuple(int(o) for o in offsets)
    row_starts = [int(r) for r in row_starts]
    n_shards = len(row_starts) - 1
    assert row_starts[0] == 0 and row_starts[-1] == nyp
    if devices is not None:
        assert len(devices) == n_shards

    c64 = np.asarray(coords64, np.float64).reshape(nyp, nxp, 3).transpose(2, 0, 1)
    ch_all = c64.astype(np.float32)
    cl_all = (c64 - ch_all.astype(np.float64)).astype(np.float32)

    free_np = np.asarray(free_t32, np.float32)
    free_grid = free_np[:, : nyp * nxp].reshape(6, nyp, nxp)
    free_pad_all = np.pad(free_grid, ((0, 0), (1, 1), (1, 1)))

    if strip_rows is None:
        strip_rows = max(1, min(ny, 65536 // max(nx, 1)))

    def put(a, s):
        a = jnp.asarray(a)
        return jax.device_put(a, devices[s]) if devices is not None else a

    carries: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    owned_rows: List[int] = []
    for s in range(n_shards):
        ns, ns1 = row_starts[s], row_starts[s + 1]
        last = s == n_shards - 1
        e_rows = (ny - ns) if last else (ns1 - ns)
        assert e_rows >= 1, f"shard {s} owns no element rows ({row_starts})"
        local_rows = e_rows + 1  # owned rows + (bottom halo unless last)
        n_owned = (ns1 - ns) if not last else local_rows
        owned_rows.append(n_owned)
        npad_l = local_rows * nxp

        # constrained unit diagonal on OWNED rows only; the halo row is
        # marked free (diag owned by the downstream shard)
        free_l = np.ones((6, npad_l), np.float32)
        free_l[:, : n_owned * nxp] = free_grid[:, ns : ns + n_owned].reshape(6, -1)

        def _init(f32):
            h = jnp.zeros((36 * k, npad_l), jnp.float32)
            return add_unit_diagonal_df(h, f32, offsets, k)

        f32_l = put(free_l, s)
        hi = _init(f32_l) if eager else jax.jit(_init)(f32_l)
        lo = jnp.zeros_like(hi)

        ch_l = put(ch_all[:, ns : ns + e_rows + 1], s)
        cl_l = put(cl_all[:, ns : ns + e_rows + 1], s)
        fp_l = put(free_pad_all[:, ns : ns + e_rows + 3], s)

        r0 = 0
        while r0 < e_rows:
            rows_e = min(strip_rows, e_rows - r0)
            step = _make_grid_step(
                kernel_fn, grid.elem_type, grid.ul_lr, rows_e, nx, nxp, k,
                offsets, npad_l, tiled=False, finalize=False,
            )
            if eager:
                step = step.__wrapped__
            hi, lo = step(hi, lo, ch_l, cl_l, fp_l, jnp.asarray(r0, jnp.int32))
            r0 += rows_e
        carries.append((hi, lo))

    # halo-row exchange: shard s's bottom (non-owned) row -> shard s+1
    blocks: List[DF] = []
    for s in range(n_shards):
        hi, lo = carries[s]
        if s > 0:
            ph, pl = carries[s - 1]
            cut = owned_rows[s - 1] * nxp
            add_h, add_l = ph[:, cut : cut + nxp], pl[:, cut : cut + nxp]
            if devices is not None:
                add_h = jax.device_put(add_h, devices[s])
                add_l = jax.device_put(add_l, devices[s])
            if eager:
                hi, lo = _halo_fold(hi, lo, add_h, add_l, nxp)
            else:
                hi, lo = _halo_fold_jit(hi, lo, add_h, add_l, nxp)
            carries[s] = (hi, lo)
        blocks.append(DF(hi[:, : owned_rows[s] * nxp], lo[:, : owned_rows[s] * nxp]))
    return blocks


def rowblocks_to_flat(blocks: Sequence[DF], npad: int) -> DF:
    """Concatenate per-shard row blocks into the global flat [36K, Npad]
    pair (zero-padded; padding diagonal NOT set — test/integration
    helper; production per-shard solvers consume the blocks directly)."""
    hi = np.concatenate([np.asarray(b.hi) for b in blocks], axis=1)
    lo = np.concatenate([np.asarray(b.lo) for b in blocks], axis=1)
    pad = npad - hi.shape[1]
    assert pad >= 0
    return DF(jnp.asarray(np.pad(hi, ((0, 0), (0, pad)))),
              jnp.asarray(np.pad(lo, ((0, 0), (0, pad)))))


def rowblocks_diag(blocks: Sequence[DF], offsets, k: int) -> List[jnp.ndarray]:
    """Per-shard operator diagonal [6, rows_s*nxp] (hi part), extracted
    AFTER the halo exchange so boundary rows carry both shards'
    contributions."""
    k0 = int(np.searchsorted(np.asarray(offsets), 0))
    return [
        jnp.stack([b.hi[(a * 6 + a) * k + k0] for a in range(6)]) for b in blocks
    ]
