"""Scatter-free df assembly for structured grid meshes.

The production operator for multi-million-element solves is the flat
[36K, Npad] two-float32 pair (ops/soa.py:assemble_soa_df). The generic
strip pipeline building it runs the element kernels in TPU-emulated f64
(0.015 Melem/s measured — it dominates end-to-end assembly) and
scatters with duplicate indices. On a detected row-major structured
grid (mg.py:detect_structured_grid) both costs disappear:

- element stiffnesses come from the df-jaxpr kernels (ops/dfk.py):
  two-float32 error-free-transform arithmetic at f32 VPU speed,
  entrywise ~1e-13-relative vs native f64;
- scatter becomes SHIFTED-WINDOW df adds: on a grid, the elements
  incident to a node sit at fixed 2D offsets, so accumulating
  ke[la*6+a, lb*6+b] into operator row (a*6+b)*K + slot(la,lb) is a
  static slice-add on the [rows, nxp] node grid — no gather/scatter
  anywhere (reference hot loop analog: fem-shell.cpp:1160-1233).

The strip structure (python-driven, donated carry) is kept from
assemble_soa_df: peak memory = the df pair + one strip's element
matrices; each strip folds into the carry with renormalized two_sum
adds, so cross-strip node rows stay df-exact.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fem_shell_tpu.ops.df import DF
from fem_shell_tpu.ops.dfk import d_add, df_function_bl, two_sum


# corner (dy, dx) tables per element family, matching mg.py:_grid_conn
_QUAD_CORNERS = ((0, 0), (0, 1), (1, 1), (1, 0))
_TRI_FAMS = {
    True: (((0, 0), (0, 1), (1, 0)), ((0, 1), (1, 1), (1, 0))),  # ul_lr
    False: (((0, 0), (1, 1), (0, 1)), ((1, 1), (0, 0), (1, 0))),
}


@dataclasses.dataclass(frozen=True)
class GridFamily:
    corners: Tuple[Tuple[int, int], ...]  # (dy, dx) per local node
    slots: Tuple[Tuple[int, ...], ...]  # [m][m] -> stencil slot index


def grid_families(elem_type: str, ul_lr: bool, nxp: int, offsets) -> List[GridFamily]:
    off_index = {int(o): i for i, o in enumerate(offsets)}
    fams = []
    corner_sets = (_QUAD_CORNERS,) if elem_type == "q" else _TRI_FAMS[ul_lr]
    for corners in corner_sets:
        m = len(corners)
        slots = tuple(
            tuple(
                off_index[
                    (corners[lb][0] - corners[la][0]) * nxp
                    + (corners[lb][1] - corners[la][1])
                ]
                for lb in range(m)
            )
            for la in range(m)
        )
        fams.append(GridFamily(corners=corners, slots=slots))
    return fams


_GRID_STEP_CACHE = {}


_TILE = 1024  # r=8 x 128 lanes — the production Pallas tile


def _make_grid_step(
    kernel_fn,
    elem_type: str,
    ul_lr: bool,
    rows_e: int,
    nx: int,
    nxp: int,
    k: int,
    offsets: Tuple[int, ...],
    npad: int,
    tiled: bool = False,
    finalize: bool = False,
    elem_pallas: bool = False,
):
    """One donated strip update of the flat df carry [36K, Npad].

    Static config -> jitted step(hi, lo, ch, cl, free_pad, r0[, free32]):
    - element coords sliced from the [3, nyp, nxp] df coordinate grid
      (pure dynamic_slice, no gather),
    - df element kernels (ops/dfk.py) on [m, 3, rows_e*nx],
    - 2D shifted-window df accumulation into a [36K, rows_n*nxp] strip,
    - BC row/col masking via windows of the 1-halo-padded free grid
      (masks are idempotent 0/1 factors; overlap rows masked twice stay
      correct),
    - renormalized two_sum fold into the carry (donated in place).

    ``finalize=True`` (the LAST strip) additionally takes free32
    [6, Npad], sets the constrained unit diagonal and extracts the
    operator diagonal INSIDE the same donated executable, returning
    (hi, lo, diag) — a separate epilogue executable forces a relayout
    copy of the multi-GB pair on this toolchain (OOM at 10M elements).
    """
    key = (kernel_fn, elem_type, ul_lr, rows_e, nx, nxp, k, offsets, npad, tiled,
           finalize, elem_pallas)
    if key in _GRID_STEP_CACHE:
        return _GRID_STEP_CACHE[key]

    fams = grid_families(elem_type, ul_lr, nxp, offsets)
    rows_n = rows_e + 1
    e_strip = rows_e * nx
    # 2D (dy, dx) decomposition of each stencil offset for column masks
    off_2d = []
    for o in offsets:
        dy = int(np.round(o / nxp))
        dx = int(o - dy * nxp)
        assert abs(dx) <= 1 and abs(dy) <= 1, (o, nxp)
        off_2d.append((dy, dx))

    # batch-last interpretation: the element axis stays on the 128 lanes
    # of EVERY intermediate (a vmapped trace batches axis 0, whose small
    # trailing dims tile-pad up to ~40x — the 10M-element OOM)
    dfn = df_function_bl(kernel_fn)
    if elem_pallas:
        # Pallas-resident element kernels (ops/pallas_elem.py): the
        # whole df-jaxpr runs inside one Mosaic kernel, VMEM-resident —
        # the strip pads to the tile multiple with edge-replicated
        # coords (real geometry: no NaN work) and slices back.
        from fem_shell_tpu.ops.pallas_elem import elem_stiffness_pallas

        m_fam = 4 if elem_type == "q" else 3
        pe_call = elem_stiffness_pallas(kernel_fn, m_fam, tile_e=min(_TILE, 1024))
        e_pallas_pad = -(-e_strip // _TILE) * _TILE - e_strip

    def step(hi, lo, ch, cl, free_pad_h, r0, *maybe_free32):
        z = jnp.zeros((), r0.dtype)
        cwin_h = jax.lax.dynamic_slice(ch, (z, r0, z), (3, rows_n, nxp))
        cwin_l = jax.lax.dynamic_slice(cl, (z, r0, z), (3, rows_n, nxp))

        # per-slot contribution lists: (corner, DF [36, rows_e, nx]) with
        # the leading axis ordered a*6+b — vectorized over all 36 (a, b)
        # block entries so each (la, lb) pair is ONE padded window add,
        # not 36 (graph size / remote-compile time)
        contribs = {}  # slot -> list of (dy, dx, DF [36, rows_e, nx])
        for fam in fams:
            m = len(fam.corners)
            xyz_h = jnp.stack(
                [
                    cwin_h[:, dy : dy + rows_e, dx : dx + nx].reshape(3, e_strip)
                    for dy, dx in fam.corners
                ]
            )  # [m, 3, E]
            xyz_l = jnp.stack(
                [
                    cwin_l[:, dy : dy + rows_e, dx : dx + nx].reshape(3, e_strip)
                    for dy, dx in fam.corners
                ]
            )
            if elem_pallas:
                pad_cfg = ((0, 0), (0, 0), (0, e_pallas_pad))
                ke = pe_call(
                    DF(
                        jnp.pad(xyz_h, pad_cfg, mode="edge"),
                        jnp.pad(xyz_l, pad_cfg, mode="edge"),
                    )
                )
                ke = DF(ke.hi[:, :, :e_strip], ke.lo[:, :, :e_strip])
            else:
                (ke,) = dfn(DF(xyz_h, xyz_l))  # DF [6m, 6m, E]
            keh = ke.hi.reshape(m, 6, m, 6, rows_e, nx)
            kel = ke.lo.reshape(m, 6, m, 6, rows_e, nx)
            for la in range(m):
                dy, dx = fam.corners[la]
                for lb in range(m):
                    s = fam.slots[la][lb]
                    contribs.setdefault(s, []).append(
                        (
                            dy,
                            dx,
                            DF(
                                keh[la, :, lb].reshape(36, rows_e, nx),
                                kel[la, :, lb].reshape(36, rows_e, nx),
                            ),
                        )
                    )

        # one padded tree-reduction per slot: pad each window to the
        # strip grid, df-add pairwise — no read-modify-write chains
        # (an incremental .at[].set formulation serializes XLA into
        # per-update buffer passes)
        def padded(dy, dx, w):
            pad = ((0, 0), (dy, rows_n - rows_e - dy), (dx, nxp - nx - dx))
            return DF(jnp.pad(w.hi, pad), jnp.pad(w.lo, pad))

        slot_out = []
        for s in range(k):
            cs = contribs.get(s)
            if cs is None:
                zero = jnp.zeros((36, rows_n, nxp), jnp.float32)
                slot_out.append(DF(zero, zero))
                continue
            terms = [padded(dy, dx, w) for dy, dx, w in cs]
            while len(terms) > 1:
                terms = [
                    d_add(terms[i], terms[i + 1]) if i + 1 < len(terms) else terms[i]
                    for i in range(0, len(terms), 2)
                ]
            slot_out.append(terms[0])
        # [K][36, rows_n, nxp] -> [36K, rows_n, nxp] with row = (a6+b)*K + s
        acc_h = jnp.stack([t.hi for t in slot_out], axis=1).reshape(36 * k, rows_n, nxp)
        acc_l = jnp.stack([t.lo for t in slot_out], axis=1).reshape(36 * k, rows_n, nxp)

        # BC masks: free_pad_h is [6, nyp+2, nxp+2] (1-node halo). Row
        # window at (r0+1, 1); column windows additionally shifted by the
        # slot's 2D offset.
        row_free = jax.lax.dynamic_slice(
            free_pad_h, (z, r0 + 1, jnp.ones((), r0.dtype)), (6, rows_n, nxp)
        )
        col_free = [
            jax.lax.dynamic_slice(
                free_pad_h,
                (z, r0 + 1 + dy, jnp.asarray(1 + dx, r0.dtype)),
                (6, rows_n, nxp),
            )
            for dy, dx in off_2d
        ]
        colf = jnp.moveaxis(jnp.stack(col_free), 0, 1)  # [6, K, rows_n, nxp]
        mask = (row_free[:, None, None] * colf[None]).reshape(
            36 * k, rows_n, nxp
        )  # row (a*6+b)*K + s = row_free[a] * col_free[s][b]
        acc_h = (acc_h * mask).reshape(36 * k, rows_n * nxp)
        acc_l = (acc_l * mask).reshape(36 * k, rows_n * nxp)

        start = r0 * nxp
        if not tiled:
            cur_h = jax.lax.dynamic_slice(hi, (z, start), (36 * k, rows_n * nxp))
            cur_l = jax.lax.dynamic_slice(lo, (z, start), (36 * k, rows_n * nxp))
            s_, e_ = two_sum(cur_h, acc_h)
            e_ = e_ + (cur_l + acc_l)
            n_h, n_l = two_sum(s_, e_)
            hi = jax.lax.dynamic_update_slice(hi, n_h, (z, start))
            lo = jax.lax.dynamic_update_slice(lo, n_l, (z, start))
            return _finish(hi, lo, maybe_free32)

        # tile-major fold: hi/lo are [ntiles, 36K, 8, 128] (the Pallas
        # production layout, ops/pallas_spmv*.py) — assembling straight
        # into it avoids a 2x-memory relayout of the finished pair. The
        # strip's column window [start, start+W) is re-registered into a
        # tile-aligned buffer at dynamic offset, then df-added into the
        # covered tile range with ONE dynamic slice/update pair.
        w_cols = rows_n * nxp
        ntiles = hi.shape[0]
        # covered tiles incl. alignment slack (capped: a single strip may
        # span the whole array, where start == 0 and no slack is needed)
        n_t = min(-(-w_cols // _TILE) + 1, ntiles)
        t0 = jnp.minimum(start // _TILE, jnp.asarray(ntiles - n_t, start.dtype))
        off = start - t0 * _TILE  # in [0, n_t*_TILE - w_cols]

        def align(a):
            buf = jnp.zeros((36 * k, n_t * _TILE), jnp.float32)
            return (
                jax.lax.dynamic_update_slice(buf, a, (z, off))
                .reshape(36 * k, n_t, 8, 128)
                .transpose(1, 0, 2, 3)
            )

        acc_ht = align(acc_h)
        acc_lt = align(acc_l)
        cur_h = jax.lax.dynamic_slice(hi, (t0, z, z, z), (n_t, 36 * k, 8, 128))
        cur_l = jax.lax.dynamic_slice(lo, (t0, z, z, z), (n_t, 36 * k, 8, 128))
        s_, e_ = two_sum(cur_h, acc_ht)
        e_ = e_ + (cur_l + acc_lt)
        n_h, n_l = two_sum(s_, e_)
        hi = jax.lax.dynamic_update_slice(hi, n_h, (t0, z, z, z))
        lo = jax.lax.dynamic_update_slice(lo, n_l, (t0, z, z, z))
        return _finish(hi, lo, maybe_free32)

    def _finish(hi, lo, maybe_free32):
        # NB: the constrained unit diagonal is placed in the carry
        # INITIALIZATION (assemble_grid_df) — constrained contributions
        # are masked to exact zeros, so every two_sum fold preserves it.
        # Adding it here via at[].add cost a full extra copy of the pair
        # in XLA buffer assignment (temp 5.6 GB at the 10M scale).
        if not finalize:
            return hi, lo
        k0 = int(np.searchsorted(np.asarray(offsets), 0))
        if tiled:
            diag = jnp.stack(
                [hi[:, (a * 6 + a) * k + k0, :, :].reshape(-1) for a in range(6)]
            )
        else:
            diag = jnp.stack([hi[(a * 6 + a) * k + k0] for a in range(6)])
        return hi, lo, diag

    fn = jax.jit(step, donate_argnums=(0, 1))
    _GRID_STEP_CACHE[key] = fn
    return fn


_INIT_CACHE = {}


def _init_pair_fn(npad: int, k: int, offsets, tiled: bool, jit: bool = True):
    """Memoized jitted pair-initializer (zeros + constrained unit
    diagonal): fresh jax.jit wrappers per assemble call would re-compile
    per level per reassemble on the remote platform (its AOT compiles
    bypass the persistent cache)."""
    offsets = tuple(int(o) for o in offsets)
    key = (npad, k, offsets, tiled, jit)
    fn = _INIT_CACHE.get(key)
    if fn is not None:
        return fn
    if tiled:
        def _init(f32):
            h = jnp.zeros((npad // _TILE, 36 * k, 8, 128), jnp.float32)
            return add_unit_diagonal_df_tiled(h, f32, offsets, k)
    else:
        def _init(f32):
            from fem_shell_tpu.ops.soa import add_unit_diagonal_df

            h = jnp.zeros((36 * k, npad), jnp.float32)
            return add_unit_diagonal_df(h, f32, offsets, k)

    fn = jax.jit(_init) if jit else _init
    _INIT_CACHE[key] = fn
    return fn


def add_unit_diagonal_df_tiled(hi_t, free32, offsets, k):
    """Tiled-layout variant of soa.add_unit_diagonal_df: set constrained
    DOFs' diagonal to 1 in hi [ntiles, 36K, 8, 128] (donated)."""
    k0 = int(np.searchsorted(np.asarray(offsets), 0))
    ntiles = hi_t.shape[0]
    constrained = (1.0 - free32).reshape(6, ntiles, 8, 128)
    for a in range(6):
        hi_t = hi_t.at[:, (a * 6 + a) * k + k0, :, :].add(constrained[a])
    return hi_t


def assemble_grid_df(
    grid,  # mg.GridInfo
    coords64: np.ndarray,  # [nyp*nxp, 3] f64 host coords
    free_t32,  # [6, Npad] f32 (1 = free)
    offsets,
    npad: int,
    kernel_fn,
    strip_rows: Optional[int] = None,
    eager: bool = False,
    layout: str = "flat",
    with_diag: bool = False,
    elem_pallas: bool = False,
) -> DF:
    """BC-constrained df operator values (hi, lo) f32, built without
    scatter or emulated f64. ``layout``:

    - ``flat``  [36K, Npad] — ops/soa.py:assemble_soa_df-compatible;
    - ``tiled`` [Npad/1024, 36K, 8, 128] — the Pallas SpMV production
      layout (ops/pallas_spmv*.py), written DIRECTLY so the pair never
      needs a second-copy relayout (it is most of HBM at scale).

    ``kernel_fn`` is the SINGLE-ELEMENT stiffness (batch-last df
    interpretation, large.py:_grid_kernel_fn). ``eager=True`` skips the
    per-strip jit — CPU tests only (CPU jit FMA-contracts the EFTs,
    ops/df.py). ``with_diag=True`` (tiled only) additionally returns the
    operator diagonal [6, Npad], extracted inside the donated epilogue —
    a separate eager extraction OOMs when the pair nearly fills HBM."""
    nyp, nxp = grid.nyp, grid.nxp
    nx, ny = nxp - 1, nyp - 1
    k = len(offsets)
    offsets = tuple(int(o) for o in offsets)
    tiled = layout == "tiled"
    if tiled:
        assert npad % _TILE == 0

    c64 = np.asarray(coords64, np.float64).reshape(nyp, nxp, 3).transpose(2, 0, 1)
    ch = c64.astype(np.float32)
    cl = (c64 - ch.astype(np.float64)).astype(np.float32)

    free_grid = np.asarray(free_t32, np.float32)[:, : nyp * nxp].reshape(6, nyp, nxp)
    free_pad = np.pad(free_grid, ((0, 0), (1, 1), (1, 1)))

    if strip_rows is None:
        strip_rows = max(1, min(ny, 65536 // max(nx, 1)))

    free32 = jnp.asarray(np.asarray(free_t32, np.float32))

    # carry INIT already holds the constrained unit diagonal (see
    # _finish): one small jitted constructor, no donated post-pass
    init = _init_pair_fn(npad, k, offsets, tiled, jit=not eager)
    hi = init(free32)
    lo = jnp.zeros_like(hi)
    ch_j, cl_j = jnp.asarray(ch), jnp.asarray(cl)
    fp_j = jnp.asarray(free_pad)

    # dispatch throttling: each strip's executable holds a ~2 GB temp
    # arena; dispatching strips ASYNC lets the runtime overlap several
    # executions and their arenas — at the 10M-element scale (pair ~=
    # 2/3 of HBM) that OOMs even though every single step fits. A real
    # host fetch per strip serializes execution (block_until_ready is
    # optimistic on the remote platform). Synced per-strip cost measured
    # 0.11 s at 2304^2 — the sync is noise.
    pair_bytes = 2 * 36 * k * npad * 4
    throttle = pair_bytes > 4e9

    def _sync(a):
        np.asarray(a[0, 0, 0, 0] if tiled else a[0, 0])

    r0 = 0
    while r0 < ny:
        rows_e = min(strip_rows, ny - r0)
        last = r0 + rows_e >= ny
        step = _make_grid_step(
            kernel_fn, grid.elem_type, grid.ul_lr, rows_e, nx, nxp, k, offsets, npad,
            tiled=tiled, finalize=last, elem_pallas=elem_pallas,
        )
        if eager:
            step = step.__wrapped__
        extra = (free32,) if last else ()
        out = step(hi, lo, ch_j, cl_j, fp_j, jnp.asarray(r0, jnp.int32), *extra)
        if last:
            hi, lo, diag = out
        else:
            hi, lo = out
            if throttle and not eager:
                _sync(hi)
        r0 += rows_e

    if with_diag:
        return DF(hi, lo), diag
    return DF(hi, lo)




def soa_diagonal_tiled(values_t, offsets):
    """[6, Npad] diagonal from tiled values [ntiles, 36K, 8, 128].

    Static slices, NOT a fancy-index gather — an eager gather on the
    multi-GB operand triggers a whole-array relayout copy (OOMed the 10M
    run right after a successful assembly)."""
    k = len(offsets)
    k0 = int(np.searchsorted(np.asarray(offsets), 0))
    return jnp.stack(
        [values_t[:, (a * 6 + a) * k + k0, :, :].reshape(-1) for a in range(6)]
    )


def tile_values(values_flat):
    """[36K, Npad] -> [Npad/1024, 36K, 8, 128] (copies; use the direct
    tiled assembly at scale)."""
    rows, npad = values_flat.shape
    return jnp.transpose(
        values_flat.reshape(rows, npad // _TILE, 8, 128), (1, 0, 2, 3)
    )


def untile_values(values_t):
    """[ntiles, 36K, 8, 128] -> [36K, Npad]."""
    nt, rows, _, _ = values_t.shape
    return jnp.transpose(values_t, (1, 0, 2, 3)).reshape(rows, nt * _TILE)
