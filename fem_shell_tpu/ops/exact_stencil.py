"""Exact-stencil refinement operator for uniform structured grids.

Why this exists: on a uniform grid every interior node has the SAME
stencil row, so the df (two-f32, eps49) operator's representation error
is a *constant-coefficient* stencil perturbation — perfectly correlated
across the mesh. Plate bending amplifies such perturbations by the full
condition number (kappa ~ n^4), which is why the 2304^2 scale run lands
at ~kappa*eps49 ~ 1.4e-2 relative solution error with an O(1) constant
(VERDICT r1; reference accuracy context: doc/validation.tex:264-281).

The fix implemented here: compute the TRUE stencil row classes once in
extended precision on the host (np.longdouble via ops/ld_interp.py —
eps64, executed through the very same traced element kernels used by the
production assembly), and evaluate iterative-refinement residuals

    r = b - A_true x

on the TPU with error-free f32 transforms: Dekker products against a
triple-f32 representation of the true stencil and a 4-level compensated
accumulator. The systematic residual error lands at ~2^-70 * sum|c x|,
i.e. a solution-accuracy floor around 1e-8..1e-9 at n=2304 — far below
both the df operator floor (1.4e-2) and even a hypothetical exact-f64
assembly floor (~kappa*eps53 ~ 3e-3).

Row classes: a node's stencil row depends only on its clamped boundary
distances (0, 1, >=2 per side) — element incidence is complete at
distance >=1 and Dirichlet column elimination only reaches distance 1
(meshgen constrains boundary edge nodes only). A 6x6-node patch with the
big grid's spacing and BC pattern therefore reproduces every row class
exactly; interior redundancy (patch nodes 2 and 3 per axis) doubles as a
consistency check.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from fem_shell_tpu.ops.ld_interp import LD, ld_function

_P = 6  # patch nodes per dimension (classes 0, 1, interior, interior, -2, -1)


# ----------------------------------------------------------------------
# host-side construction
# ----------------------------------------------------------------------


def _class_idx(n: int) -> np.ndarray:
    """Class index per grid position: 0,1 near the low edge, 2 (or the
    redundant 3) interior, 4,5 near the high edge."""
    ix = np.arange(n)
    cls = np.full(n, 2, np.int32)
    cls[ix < 2] = ix[ix < 2]
    hi = n - 1 - ix
    cls[hi < 3] = 5 - hi[hi < 3]
    cls[ix == 2] = 2
    return cls


def _split_offsets(offsets, nxp: int):
    """Flat SoA offsets -> [(dy, dx)] with dy, dx in {-1, 0, 1}."""
    out = []
    for o in offsets:
        o = int(o)
        for dy in (-1, 0, 1):
            dx = o - dy * nxp
            if abs(dx) <= 1:
                out.append((dy, dx))
                break
        else:
            raise ValueError(f"offset {o} is not a 9-point neighbor for nxp={nxp}")
    return tuple(out)


def _material_ld(nu: float, em: float, thickness: float):
    nu = LD(nu)
    em = LD(em)
    t = LD(thickness)
    base = np.array(
        [[LD(1), nu, LD(0)], [nu, LD(1), LD(0)], [LD(0), LD(0), (LD(1) - nu) / LD(2)]],
        dtype=LD,
    )
    dm = base * (em / (LD(1) - nu * nu))
    dp = base * (em * t**3 / (LD(12) * (LD(1) - nu * nu)))
    return dm, dp


_KERNEL_LD_CACHE: dict = {}


def _cached_kernel_ld(kern, thickness: float):
    """LdFunction per (kernel, thickness): rebuilds re-use the traced
    jaxpr and the gather/scatter index maps instead of re-tracing."""
    key = (kern, thickness)
    fn = _KERNEL_LD_CACHE.get(key)
    if fn is None:
        fn = ld_function(lambda p, dm, dp: kern(p, dm, dp, thickness))
        _KERNEL_LD_CACHE[key] = fn
    return fn


@dataclasses.dataclass
class ExactStencil:
    """Triple-f32 true stencil tables + class maps for one structured
    grid system. ``t0+t1+t2`` represents the longdouble row-class table
    to ~2^-72 relative."""

    offsets: tuple  # flat SoA offsets (ints)
    offs2d: tuple  # [(dy, dx)] per offset
    t0: np.ndarray  # [K, 6, 6, P, P] f32
    t1: np.ndarray
    t2: np.ndarray
    cy_idx: np.ndarray  # [nyp] int32
    cx_idx: np.ndarray  # [nxp] int32
    nyp: int
    nxp: int

    def device_args(self):
        return (
            jnp.asarray(self.t0),
            jnp.asarray(self.t1),
            jnp.asarray(self.t2),
            jnp.asarray(self.cy_idx),
            jnp.asarray(self.cx_idx),
        )


def build_exact_stencil(mesh, material, offsets, dirichlet_mask=None,
                        timings=None, grid=None) -> ExactStencil:
    """Host-side: longdouble patch assembly -> row-class tables.

    ``mesh`` must be a uniform structured grid (meshGen product or
    equivalent): coords affine in (ix, iy) to f64 rounding. Raises
    ValueError when the preconditions fail (non-uniform geometry,
    class-inconsistent BC masks, grid smaller than the patch).
    ``timings`` (optional dict) records per-phase host wall times.
    ``grid`` (optional GridInfo) skips the O(n_elements) connectivity
    reverification when the caller already detected the grid.
    """
    import time as _time

    from fem_shell_tpu.mg import _grid_conn, detect_structured_grid
    from fem_shell_tpu.ops.elements import quad_shell_stiffness, tri_shell_stiffness

    _t = _time.perf_counter()

    def _mark(name):
        nonlocal _t
        if timings is not None:
            t = _time.perf_counter()
            timings[name] = t - _t
            _t = t

    if grid is None:
        grid = detect_structured_grid(mesh)
    if grid is None:
        raise ValueError("exact stencil requires a structured grid mesh")
    nxp, nyp = grid.nxp, grid.nyp
    if nxp < _P or nyp < _P:
        raise ValueError(f"grid {nyp}x{nxp} smaller than the {_P}x{_P} class patch")
    _mark("grid_detect")

    coords = np.asarray(mesh.coords, np.float64).reshape(nyp, nxp, 3)
    # uniformity check in plain f64 (the O(N) longdouble evaluation of
    # the ideal grid cost seconds at 2304^2 and adds nothing: the f64
    # evaluation's own rounding is ~3 ulp, far inside the 64-eps gate)
    c64 = coords
    ex64 = (c64[0, -1] - c64[0, 0]) / (nxp - 1)
    ey64 = (c64[-1, 0] - c64[0, 0]) / (nyp - 1)
    iy, ix = np.meshgrid(np.arange(nyp), np.arange(nxp), indexing="ij")
    ideal64 = (
        c64[0, 0][None, None, :]
        + ix[:, :, None] * ex64[None, None, :]
        + iy[:, :, None] * ey64[None, None, :]
    )
    scale = float(np.max(np.abs(coords)))
    dev = float(np.max(np.abs(ideal64 - coords)))
    if dev > 64 * np.finfo(np.float64).eps * max(scale, 1.0):
        raise ValueError(f"mesh is not a uniform grid (max deviation {dev:.3e})")
    c00 = coords[0, 0].astype(LD)
    ex = (coords[0, -1].astype(LD) - c00) / LD(nxp - 1)
    ey = (coords[-1, 0].astype(LD) - c00) / LD(nyp - 1)
    _mark("ideal_check")

    mask = np.asarray(
        mesh.dirichlet_mask() if dirichlet_mask is None else dirichlet_mask, bool
    ).reshape(nyp, nxp, 6)
    cy_idx = _class_idx(nyp)
    cx_idx = _class_idx(nxp)
    rep_y = np.array([0, 1, 2, nyp - 3, nyp - 2, nyp - 1])
    rep_x = np.array([0, 1, 2, nxp - 3, nxp - 2, nxp - 1])
    mask_patch = mask[rep_y][:, rep_x]  # [P, P, 6]
    if not (mask == mask_patch[cy_idx][:, cx_idx]).all():
        raise ValueError("Dirichlet mask is not class-consistent with the patch")
    _mark("mask_check")

    # ---- longdouble patch assembly --------------------------------------
    dm_ld, dp_ld = _material_ld(material.nu, material.em, material.thickness)
    types, conn4 = _grid_conn(_P, _P, grid.elem_type, grid.ul_lr)
    m = 3 if grid.elem_type == "t" else 4
    conn = conn4[:, :m]
    pyy, pxx = np.meshgrid(np.arange(_P), np.arange(_P), indexing="ij")
    pc = (
        pxx[:, :, None].astype(LD) * ex[None, None, :]
        + pyy[:, :, None].astype(LD) * ey[None, None, :]
    ).reshape(_P * _P, 3)

    kern = tri_shell_stiffness if m == 3 else quad_shell_stiffness
    kernel_ld = _cached_kernel_ld(kern, float(material.thickness))
    ndof = _P * _P * 6
    kmat = np.zeros((ndof, ndof), LD)
    for e in range(len(conn)):
        nodes = conn[e]
        ke = kernel_ld(pc[nodes], dm_ld, dp_ld)
        for i, ni in enumerate(nodes):
            for j, nj in enumerate(nodes):
                kmat[6 * ni : 6 * ni + 6, 6 * nj : 6 * nj + 6] += ke[
                    6 * i : 6 * i + 6, 6 * j : 6 * j + 6
                ]
    cdof = np.nonzero(mask_patch.reshape(-1))[0]
    kmat[cdof, :] = LD(0)
    kmat[:, cdof] = LD(0)
    kmat[cdof, cdof] = LD(1)
    _mark("patch_ld_assembly")

    # ---- extract class tables ------------------------------------------
    offs2d = _split_offsets(offsets, nxp)
    k = len(offs2d)
    table = np.zeros((k, 6, 6, _P, _P), LD)
    for s, (dy, dx) in enumerate(offs2d):
        for py in range(_P):
            for px in range(_P):
                qy, qx = py + dy, px + dx
                if 0 <= qy < _P and 0 <= qx < _P:
                    q = py * _P + px
                    qq = qy * _P + qx
                    table[s, :, :, py, px] = kmat[
                        6 * q : 6 * q + 6, 6 * qq : 6 * qq + 6
                    ]
    # interior redundancy check: patch columns/rows 2 and 3 are both
    # interior representatives and must agree to longdouble rounding
    tnorm = float(np.max(np.abs(table.astype(np.float64)))) or 1.0
    dx_err = float(np.max(np.abs((table[:, :, :, 2:4, 2] - table[:, :, :, 2:4, 3]).astype(np.float64))))
    dy_err = float(np.max(np.abs((table[:, :, :, 2, 2:4] - table[:, :, :, 3, 2:4]).astype(np.float64))))
    if max(dx_err, dy_err) > 1e-14 * tnorm:
        raise AssertionError(
            f"patch interior rows inconsistent ({dx_err:.3e}, {dy_err:.3e})"
        )

    t0 = table.astype(np.float32)
    rem = table - t0.astype(LD)
    t1 = rem.astype(np.float32)
    t2 = (rem - t1.astype(LD)).astype(np.float32)
    _mark("table_extract")
    return ExactStencil(
        offsets=tuple(int(o) for o in offsets),
        offs2d=offs2d,
        t0=t0,
        t1=t1,
        t2=t2,
        cy_idx=cy_idx,
        cx_idx=cx_idx,
        nyp=nyp,
        nxp=nxp,
    )


# ----------------------------------------------------------------------
# device-side residual (TPU EFT arithmetic; eager-only on CPU)
# ----------------------------------------------------------------------


def _acc4_add(acc, big, mids, small):
    """Add (big, mids..., small) into the 4-level compensated
    accumulator; each ~2^-24-level ``mids`` term gets its own exact
    two_sum (pre-adding them in plain f32 would round at 2^-48 of the
    term scale and degrade the whole evaluation to plain-df accuracy).
    All drops are bounded by ~2^-72 of the largest partial magnitude."""
    from fem_shell_tpu.ops.df import two_sum

    a0, a1, a2, a3 = acc
    s0, c0 = two_sum(a0, big)
    s1, c1 = two_sum(a1, c0)
    lo = small
    for m in mids:
        s1, cm = two_sum(s1, m)
        lo = lo + cm
    s2, c3 = two_sum(a2, lo + c1)
    return (s0, s1, s2, a3 + c3)


def exact_residual_df(t0, t1, t2, cy_idx, cx_idx, x, b, offs2d, nyp: int, nxp: int):
    """r = b - A_true x with x, b, r as DF [6, Npad] (flat SoA layout).

    A_true is the triple-f32 class-table stencil; every product against
    x.hi and the t1*x.hi / t0*x.lo cross terms are Dekker-exact, and the
    accumulation is 4-level compensated — systematic error ~2^-70 of the
    term magnitudes, i.e. far below the cancellation floor that matters
    at kappa ~ 2^45.
    """
    from fem_shell_tpu.ops.df import DF, two_prod, two_sum

    npad = x.hi.shape[1]
    n = nyp * nxp
    xg_hi = x.hi[:, :n].reshape(6, nyp, nxp)
    xg_lo = x.lo[:, :n].reshape(6, nyp, nxp)
    zero = jnp.zeros((6, nyp, nxp), jnp.float32)
    acc = (
        b.hi[:, :n].reshape(6, nyp, nxp),
        b.lo[:, :n].reshape(6, nyp, nxp),
        zero,
        zero,
    )
    for s, (dy, dx) in enumerate(offs2d):
        # roll wraps are harmless: table entries are identically zero at
        # classes whose neighbor falls outside the grid
        xs_hi = jnp.roll(xg_hi, (-dy, -dx), axis=(1, 2))
        xs_lo = jnp.roll(xg_lo, (-dy, -dx), axis=(1, 2))
        for bb in range(6):
            c0 = t0[s, :, bb][:, cy_idx][:, :, cx_idx]  # [6, nyp, nxp]
            c1 = t1[s, :, bb][:, cy_idx][:, :, cx_idx]
            c2 = t2[s, :, bb][:, cy_idx][:, :, cx_idx]
            xh = xs_hi[bb][None]
            xl = xs_lo[bb][None]
            p0, e0 = two_prod(c0, xh)
            p1, e1 = two_prod(c0, xl)
            p2, e2 = two_prod(c1, xh)
            p3 = c1 * xl + c2 * xh
            acc = _acc4_add(acc, -p0, (-e0, -p1, -p2), -((e1 + e2) + p3))
    s0, s1, s2, s3 = acc
    h1, e1_ = two_sum(s0, s1)
    h2, e2_ = two_sum(h1, s2)
    lo = (e1_ + e2_) + s3
    rh, rl = two_sum(h2, lo)
    pad = npad - n
    return DF(
        jnp.pad(rh.reshape(6, n), ((0, 0), (0, pad))),
        jnp.pad(rl.reshape(6, n), ((0, 0), (0, pad))),
    )


def class_flat_tables(stencil: ExactStencil):
    """(tfl0, tfl1, tfl2, cls_flat): tables reshaped to the SoA row order
    (row = (a*6+b)*K + s, matching ops/soa.py value layout) as
    [36K, P*P] f32, plus the per-node class index [nyp*nxp] int32."""
    k = len(stencil.offs2d)

    def tfl(t):
        return np.ascontiguousarray(
            np.transpose(t, (1, 2, 0, 3, 4)).reshape(36 * k, _P * _P)
        )

    cls_flat = (
        stencil.cy_idx[:, None] * _P + stencil.cx_idx[None, :]
    ).reshape(-1).astype(np.int32)
    return tfl(stencil.t0), tfl(stencil.t1), tfl(stencil.t2), cls_flat


def class_pair_flat(tfl0, tfl1, cls_flat, npad: int):
    """Device: class-consistent df operator pair in FLAT [36K, Npad]
    layout, generated from the (t0, t1) tables. By construction
    hi + lo differs from the true stencil by exactly the t2 table —
    which is what makes the E-correction in the refinement residual a
    pure class-table term."""
    n = cls_flat.shape[0]
    pad = npad - n

    def gen(t):
        return jnp.pad(t[:, cls_flat], ((0, 0), (0, pad)))

    return gen(tfl0), gen(tfl1)


def class_pair_tiled(tfl0, tfl1, cls_flat, npad: int, r_tile: int):
    """Device: class-consistent df pair directly in the Pallas tile-major
    layout [ntiles, 36K, r, 128] — generated tile-by-tile (lax.map) so no
    flat-layout copy is ever materialized (the pair is most of HBM at
    the 10M-element scale). Padded rows use a sentinel all-zero class
    (matching class_pair_flat's zero padding)."""
    lanes = 128
    n = cls_flat.shape[0]
    # sentinel class P*P -> appended zero column
    cls_pad = jnp.pad(cls_flat, (0, npad - n), constant_values=_P * _P)
    ntiles = npad // (r_tile * lanes)
    cls_tiled = cls_pad.reshape(ntiles, r_tile, lanes)

    def gen(t):
        tz = jnp.pad(t, ((0, 0), (0, 1)))
        return jax.lax.map(lambda c: tz[:, c], cls_tiled)

    return gen(tfl0), gen(tfl1)


def class_stencil_matvec_f32(tfl, cls_flat, offs2d, xg, nyp: int, nxp: int,
                             strip_rows: int = 128):
    """y = T x in plain f32 (no EFT): the E-correction term of the
    refinement residual. |E| ~ 2^-49 |A|, so plain f32 arithmetic keeps
    its error ~2^-72 of the main-term magnitudes. ``tfl`` [36K, P*P],
    ``xg`` [6, nyp, nxp] f32. Returns [6, nyp, nxp].

    Row-strip chunked (fori_loop): the whole-grid form unrolls
    6*K per-node coefficient gathers of [6, nyp, nxp] each — at 2304^2
    XLA buffer assignment wants several such 128 MB temps live next to
    the 10.7 GB operator pair and the compile itself OOMs. Strips bound
    the live set to [6, strip_rows, nxp] temps; the last strip is
    clamped (overlapping rows recompute identical values, set
    idempotently)."""
    k = len(offs2d)
    v = tfl.reshape(6, 6, k, _P * _P)
    cls2 = cls_flat.reshape(nyp, nxp)

    if nyp <= strip_rows:
        y = jnp.zeros((6, nyp, nxp), jnp.float32)
        for s, (dy, dx) in enumerate(offs2d):
            xs = jnp.roll(xg, (-dy, -dx), axis=(1, 2))
            for bb in range(6):
                c = v[:, bb, s][:, cls2]  # [6, nyp, nxp]
                y = y + c * xs[bb][None]
        return y

    rows = strip_rows
    n_strips = -(-nyp // rows)
    # 1-row halo: dy in {-1, 0, 1} for the 2D stencils here
    xp = jnp.pad(xg, ((0, 0), (1, 1), (0, 0)))

    def body(i, ycar):
        r0 = jnp.minimum(i * rows, nyp - rows).astype(jnp.int32)
        xs_full = jax.lax.dynamic_slice(
            xp, (jnp.int32(0), r0, jnp.int32(0)), (6, rows + 2, nxp)
        )
        cl = jax.lax.dynamic_slice(cls2, (r0, jnp.int32(0)), (rows, nxp))
        ystrip = jnp.zeros((6, rows, nxp), jnp.float32)
        for s, (dy, dx) in enumerate(offs2d):
            xs = jax.lax.slice(xs_full, (0, 1 + dy, 0), (6, 1 + dy + rows, nxp))
            xs = jnp.roll(xs, -dx, axis=2)
            for bb in range(6):
                c = v[:, bb, s][:, cl]  # [6, rows, nxp]
                ystrip = ystrip + c * xs[bb][None]
        return jax.lax.dynamic_update_slice(ycar, ystrip, (jnp.int32(0), r0, jnp.int32(0)))

    return jax.lax.fori_loop(
        0, n_strips, body, jnp.zeros((6, nyp, nxp), jnp.float32)
    )


def exact_matvec_f64(stencil: ExactStencil, x64):
    """Host/CPU oracle: y = A_true x in longdouble via the class tables
    (for tests; x64 [6, n] numpy). Returns longdouble [6, n]."""
    nyp, nxp = stencil.nyp, stencil.nxp
    t = (
        stencil.t0.astype(LD) + stencil.t1.astype(LD) + stencil.t2.astype(LD)
    )  # [K,6,6,P,P]
    xg = np.asarray(x64).astype(LD).reshape(6, nyp, nxp)
    y = np.zeros((6, nyp, nxp), LD)
    for s, (dy, dx) in enumerate(stencil.offs2d):
        xs = np.zeros_like(xg)
        ys0, ys1 = max(0, -dy), min(nyp, nyp - dy)
        xs0, xs1 = max(0, -dx), min(nxp, nxp - dx)
        xs[:, ys0:ys1, xs0:xs1] = xg[:, ys0 + dy : ys1 + dy, xs0 + dx : xs1 + dx]
        coeff = t[s][:, :, stencil.cy_idx][:, :, :, stencil.cx_idx]  # [6,6,nyp,nxp]
        y += np.einsum("abyx,byx->ayx", coeff, xs)
    return y.reshape(6, nyp * nxp)
