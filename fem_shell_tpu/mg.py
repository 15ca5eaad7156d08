"""Geometric multigrid preconditioner for structured shell meshes.

Jacobi-class preconditioning leaves CG iteration counts growing ~O(n^2)
on plates (bending is a 4th-order operator); this module builds a
rediscretization V-cycle on a structured grid hierarchy:

- levels are re-assembled shell operators on every-2nd-node subsampled
  grids (SoA stencil form, ops/soa.py) — works for any row-major
  structured ``ShellMesh`` (loaded .xda/.msh or meshGen product), flat
  or curved, detected from the connectivity (detect_structured_grid),
- transfers are bilinear node-grid prolongation P and its transpose
  (FEM load-vector restriction) applied per dof component,
- smoothing is damped Jacobi (symmetric pre/post, so the V-cycle is an
  SPD preconditioner valid inside CG),
- the coarsest level is solved exactly with a precomputed dense inverse.

Usage: ``MultigridShellSystem(mesh, material).solve(forces)`` with any
structured mesh (``MeshGenParams`` still accepted); nx, ny must be
divisible by 2^(levels-1). With ``dtype=float32`` the levels assemble
directly in f32 via exact-geometry centered kernels (no emulated-f64
stage) and ``solve_df`` runs df CG over the f32 fine operator — the
multi-million-element production configuration.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from fem_shell_tpu.materials import Material
from fem_shell_tpu.mesh import ShellMesh, XDA_QUAD4, XDA_TRI3
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.ops.soa import (
    apply_bc_soa,
    build_soa_pattern,
    soa_diagonal,
    soa_matvec,
)
from fem_shell_tpu.solver import CGResult, pcg


# ----------------------------------------------------------------------
# structured-grid detection (any row-major grid mesh, not just meshGen's)
# ----------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GridInfo:
    """Row-major structured grid: node = iy*nxp + ix."""

    nxp: int  # nodes per row
    nyp: int  # node rows
    elem_type: str  # 'q' | 't'
    ul_lr: bool  # tri diagonal orientation (meshGen main_all.cpp:163-224)


def _grid_conn(nxp: int, nyp: int, elem_type: str, ul_lr: bool):
    """(elem_types, elem_conn) of the canonical row-major grid mesh —
    the same numbering meshgen.generate emits."""
    nx, ny = nxp - 1, nyp - 1
    yy, xx = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    n_id = (xx + yy * nxp).reshape(-1).astype(np.int64)
    if elem_type == "q":
        conn = np.stack([n_id, n_id + 1, n_id + nxp + 1, n_id + nxp], axis=1)
        types = np.full(len(n_id), XDA_QUAD4, dtype=np.int32)
        conn4 = conn.astype(np.int32)
    else:
        if ul_lr:
            tri1 = np.stack([n_id, n_id + 1, n_id + nxp], axis=1)
            tri2 = np.stack([n_id + 1, n_id + nxp + 1, n_id + nxp], axis=1)
        else:
            tri1 = np.stack([n_id, n_id + nxp + 1, n_id + 1], axis=1)
            tri2 = np.stack([n_id + nxp + 1, n_id, n_id + nxp], axis=1)
        both = np.stack([tri1, tri2], axis=1).reshape(-1, 3)
        conn4 = np.hstack([both, np.full((len(both), 1), -1, dtype=np.int64)]).astype(np.int32)
        types = np.full(len(both), XDA_TRI3, dtype=np.int32)
    return types, conn4


def detect_structured_grid(mesh: ShellMesh) -> Optional[GridInfo]:
    """Recognize a row-major structured grid from the connectivity alone.

    Candidate row widths come from the stencil offsets; each candidate is
    VERIFIED by reconstructing the full canonical connectivity and
    comparing arrays (tri stencils are ambiguous — {1, w-1, w} matches
    both diagonal orientations — so verification, not heuristics)."""
    n = mesh.n_nodes
    if len(mesh.tri) and len(mesh.quad):
        return None
    elem_type = "q" if len(mesh.quad) else "t"
    conn = mesh.quad if elem_type == "q" else mesh.tri
    if len(conn) == 0:
        return None
    from fem_shell_tpu.ops.soa import _offsets_of

    offs = _offsets_of(mesh)
    top = int(offs[-1])
    if elem_type == "q":
        cands = [(top - 1, True)]  # quad offsets peak at nxp + 1
    else:
        cands = [(top, True), (top - 1, False)]  # ul_lr diag=nxp-1 | diag=nxp+1
    for nxp, ul_lr in cands:
        if nxp < 2 or n % nxp:
            continue
        nyp = n // nxp
        if nyp < 2:
            continue
        n_cells = (nxp - 1) * (nyp - 1)
        expect_e = n_cells if elem_type == "q" else 2 * n_cells
        if len(conn) != expect_e:
            continue
        types, conn4 = _grid_conn(nxp, nyp, elem_type, ul_lr)
        want = conn4[:, :4] if elem_type == "q" else conn4[:, :3]
        if conn.shape == want.shape and (conn == want).all():
            return GridInfo(nxp, nyp, elem_type, ul_lr)
    return None


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class _Level:
    """One grid level. Registered as a pytree (arrays = children, grid
    metadata = aux) so level stacks can be passed as jit ARGUMENTS — as
    closure constants they would be embedded into the HLO, which blows
    past the remote-compile request size limit at scale."""

    values: jnp.ndarray  # [36, K, Npad] | flat [36K, Npad] | tiled 4D
    offsets: tuple
    free_t: jnp.ndarray  # [6, Npad]
    inv_diag: jnp.ndarray  # [6, Npad]
    nyp: int  # node rows
    nxp: int  # node cols
    npad: int
    dense_inv: Optional[jnp.ndarray] = None  # coarsest level only
    omega: Optional[jnp.ndarray] = None  # per-level Jacobi damping (scalar array)
    chol: Optional[jnp.ndarray] = None  # coarsest: Cholesky of scaled dense
    chol_scale: Optional[jnp.ndarray] = None  # d^-1/2 for the scaled factor
    lam: Optional[jnp.ndarray] = None  # lambda_max(D^-1 A) estimate (Chebyshev)
    cparts: Optional[object] = None  # matrix-free class-table operator (uniform grids)

    def tree_flatten(self):
        return (
            (self.values, self.free_t, self.inv_diag, self.dense_inv, self.omega,
             self.chol, self.chol_scale, self.lam, self.cparts),
            (self.offsets, self.nyp, self.nxp, self.npad),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        (values, free_t, inv_diag, dense_inv, omega, chol, chol_scale, lam,
         cparts) = children
        offsets, nyp, nxp, npad = aux
        return cls(values, offsets, free_t, inv_diag, nyp, nxp, npad, dense_inv,
                   omega, chol, chol_scale, lam, cparts)


class _RebuildProf:
    """Stage profiler for reassemble(): each mark() FETCHES one element
    of every listed array (block_until_ready is optimistic on the remote
    axon platform — only a device->host fetch drains the stream), then
    records the wall-time since the previous mark."""

    def __init__(self, on: bool):
        self.on = on
        self.rows: list = []
        self._t = time.perf_counter() if on else 0.0

    def mark(self, name: str, *arrs):
        if not self.on:
            return
        for a in arrs:
            if a is None:
                continue
            for leaf in jax.tree_util.tree_leaves(a):
                if hasattr(leaf, "ndim") and leaf.ndim >= 0:
                    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))
        t = time.perf_counter()
        self.rows.append((name, t - self._t))
        self._t = t

    def absorb(self, prefix: str, timings: dict):
        if not self.on:
            return
        for k, v in timings.items():
            self.rows.append((f"{prefix}{k}", v))

    def report(self):
        if not self.on:
            return
        tot = sum(d for n, d in self.rows if not n.startswith("  "))
        for name, d in self.rows:
            print(f"  rebuild-prof {name:36s} {d:8.3f} s", flush=True)
        print(f"  rebuild-prof {'TOTAL':36s} {tot:8.3f} s", flush=True)


def _to_grid(x, lvl: _Level):
    return x[:, : lvl.nyp * lvl.nxp].reshape(6, lvl.nyp, lvl.nxp)


def _from_grid(g, lvl: _Level):
    flat = g.reshape(6, lvl.nyp * lvl.nxp)
    return jnp.pad(flat, ((0, 0), (0, lvl.npad - lvl.nyp * lvl.nxp)))


def _prolong(gc):
    """Bilinear coarse->fine on node grids: [6, nc, mc] -> [6, 2nc-1, 2mc-1]."""
    c = gc
    # interleave rows
    row_mid = 0.5 * (c[:, :-1, :] + c[:, 1:, :])
    nr = c.shape[1] + row_mid.shape[1]
    rows = jnp.zeros((6, nr, c.shape[2]), c.dtype)
    rows = rows.at[:, 0::2, :].set(c)
    rows = rows.at[:, 1::2, :].set(row_mid)
    # interleave cols
    col_mid = 0.5 * (rows[:, :, :-1] + rows[:, :, 1:])
    ncl = rows.shape[2] + col_mid.shape[2]
    out = jnp.zeros((6, rows.shape[1], ncl), rows.dtype)
    out = out.at[:, :, 0::2].set(rows)
    out = out.at[:, :, 1::2].set(col_mid)
    return out


def _restrict(gf):
    """P^T on node grids: [6, 2nc-1, 2mc-1] -> [6, nc, mc]."""
    # transpose of the prolongation above: each coarse node collects its own
    # fine value + 1/2 of edge-midpoint neighbors + 1/4 of cell centers
    f = gf
    # columns first (transpose of col interleave)
    even = f[:, :, 0::2]
    odd = f[:, :, 1::2]
    cols = even.at[:, :, :-1].add(0.5 * odd)
    cols = cols.at[:, :, 1:].add(0.5 * odd)
    even_r = cols[:, 0::2, :]
    odd_r = cols[:, 1::2, :]
    out = even_r.at[:, :-1, :].add(0.5 * odd_r)
    out = out.at[:, 1:, :].add(0.5 * odd_r)
    return out


def _is_planar(coords, tol: float = 1e-6) -> bool:
    """True when the node cloud lies in one plane (within tol, relative
    to the largest in-plane extent) — flat plates keep the cheap
    rediscretized coarse levels; curved shells get Galerkin RAP."""
    c = np.asarray(coords, np.float64)
    c = c - c.mean(axis=0)
    w = np.linalg.eigvalsh(c.T @ c)
    if w[-1] <= 0:
        return True
    return float(np.sqrt(max(w[0], 0.0) / w[-1])) <= tol


def _offset_dydx(off: int, nxp: int):
    """Linear node offset -> (dy, dx) on a row-major grid, |dx| <= 1."""
    for dy in (-1, 0, 1):
        dx = off - dy * nxp
        if abs(dx) <= 1:
            return dy, dx
    raise ValueError(f"offset {off} not within the 3x3 stencil of nxp={nxp}")


def grid_rap_offsets(nxp_c: int):
    """The 9-point coarse stencil offsets stencil_rap emits."""
    return tuple(dy * nxp_c + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1))


def stencil_rap(values, free_c, offsets_f, nyp_f, nxp_f, npad_c):
    """Galerkin coarse operator C = P^T A P in stencil space.

    ``values`` is a fine-level SoA stencil ([36, K, Npad] or flat
    [36K, Npad], the _densify convention: block A(i, i+off_s) =
    v[a, b, s, i]); P is the bilinear node-grid prolongation (_prolong).
    With P's 3x3 support and A's 3x3 reach, C closes within the 3x3
    coarse stencil (|2O + d2 - d1| <= 1 with |d1|,|d2| <= 1 forces
    |O| <= 1), so the result is a [36*9, npad_c] stencil over
    ``grid_rap_offsets`` — directly usable by the same smoother /
    Pallas-SpMV / coarse-Cholesky machinery as a rediscretized level.

    Why it exists: rediscretizing coarse levels on subsampled CURVED
    grids (Scordelis-Lo roof) yields a coarse polyhedral surface whose
    inextensional-bending near-nullspace no longer matches the fine
    facet model — the V-cycle stagnates (roof 32x32, f64: residual
    2.6e-2 after 300 CG iterations). The Galerkin operator inherits the
    fine energy by construction (same experiment: 1e-10 in 112
    iterations), which is the standard variational-MG guarantee.

    Dirichlet: fine ``values`` are already BC-eliminated (zero
    rows/cols, unit diag). The RAP spreads those unit diagonals, so the
    coarse stencil is re-masked against ``free_c`` ([6, npad_c]) and
    given unit diagonals on constrained dofs — the exact convention the
    assemblers produce.
    """
    k = len(offsets_f)
    n_f = nyp_f * nxp_f
    nyc, nxc = (nyp_f + 1) // 2, (nxp_f + 1) // 2
    n_c = nyc * nxc
    S = values.reshape(6, 6, k, -1)[:, :, :, :n_f].reshape(6, 6, k, nyp_f, nxp_f)
    # zero-pad by 1 so sampling at fine node 2I + d1 is a static slice
    Sp = jnp.pad(S, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1)))
    w = {-1: 0.5, 0: 1.0, 1: 0.5}
    acc = {(oy, ox): None for oy in (-1, 0, 1) for ox in (-1, 0, 1)}
    for s, off in enumerate(offsets_f):
        oy, ox = _offset_dydx(int(off), nxp_f)
        for d1y in (-1, 0, 1):
            ty = oy + d1y
            for d1x in (-1, 0, 1):
                tx = ox + d1x
                # S[o] sampled at fine (2Iy+d1y, 2Ix+d1x), strided slice
                samp = Sp[
                    :, :, s,
                    d1y + 1 : d1y + 2 * nyc : 2,
                    d1x + 1 : d1x + 2 * nxc : 2,
                ]
                for Oy in range((ty - 1 + 1) // 2, (ty + 1) // 2 + 1):
                    d2y = ty - 2 * Oy
                    if abs(d2y) > 1:
                        continue
                    for Ox in range((tx - 1 + 1) // 2, (tx + 1) // 2 + 1):
                        d2x = tx - 2 * Ox
                        if abs(d2x) > 1:
                            continue
                        wt = w[d1y] * w[d1x] * w[d2y] * w[d2x]
                        t = wt * samp
                        prev = acc[(Oy, Ox)]
                        acc[(Oy, Ox)] = t if prev is None else prev + t
    out = jnp.stack(
        [acc[(oy, ox)] for oy in (-1, 0, 1) for ox in (-1, 0, 1)], axis=2
    )  # [6, 6, 9, nyc, nxc]
    # re-apply coarse Dirichlet elimination: zero rows/cols, unit diag
    fg = free_c[:, :n_c].reshape(6, nyc, nxc).astype(out.dtype)
    fgp = jnp.pad(fg, ((0, 0), (1, 1), (1, 1)))
    nb = jnp.stack(
        [
            fgp[:, 1 + oy : 1 + oy + nyc, 1 + ox : 1 + ox + nxc]
            for oy in (-1, 0, 1)
            for ox in (-1, 0, 1)
        ],
        axis=1,
    )  # [6, 9, nyc, nxc] — free mask of the neighbor each slot points at
    out = out * fg[:, None, None] * nb[None, :, :]
    one = jnp.ones((nyc, nxc), out.dtype)
    for a in range(6):
        out = out.at[a, a, 4].set(jnp.where(fg[a] > 0, out[a, a, 4], one))
    flat = out.reshape(36 * 9, n_c)
    return jnp.pad(flat, ((0, 0), (0, npad_c - n_c)))


class MultigridShellSystem:
    """Shell solver with a geometric V-cycle preconditioner (any row-major
    structured grid mesh; nx, ny divisible by 2^(levels-1))."""

    def __init__(
        self,
        mesh: Union[ShellMesh, MeshGenParams],
        material: Material,
        dtype=jnp.float64,
        n_levels: Optional[int] = None,
        nu_smooth: int = 3,
        omega: Optional[float] = None,
        coarse_max: int = 8,
        chunk: int = 16384,
        df_operator: bool = False,
        strip_nodes: int = 65536,
        use_pallas: Optional[bool] = None,
        assemble: bool = True,
        smoother: str = "jacobi",
        elem_pallas: bool = False,
        class_operator: Optional[bool] = None,
        coarse_op: Optional[str] = None,
        cycle: Optional[str] = None,
        sym_spmv: Optional[bool] = None,
        df_cycle: bool = False,
        k_depth: Optional[int] = None,
    ):
        """``df_operator=True`` is the multi-million-element configuration:
        every level is strip-assembled into a df (two-f32) operator
        (LargeShellSystem.assemble_df) — f64-class entry accuracy with no
        full-size f64 buffer; the fine-level df pair drives the outer df
        CG while the V-cycle smooths on the (free) hi parts. Use with
        dtype=jnp.float32 and solve via solve_df.

        ``class_operator`` (df mode, UNIFORM grids): replace the fine
        level's materialized operator with the matrix-free class-table
        matvec (ops/class_matvec.py) — the fine pair (10.7 GB at the 10M
        element scale) is never assembled or stored. None = auto (on when
        the exact-stencil class builder accepts the mesh), False = force
        the materialized pair, True = require (raises on non-uniform).

        ``coarse_op``: how levels l >= 1 get their operators.
        "rediscretize" re-assembles the shell kernels on the subsampled
        grid (cheap, matches the r1/r2 behavior); "galerkin" computes
        the variational C = P^T A P in stencil space (stencil_rap). None
        = auto: galerkin when the mesh is non-planar (CURVED structured
        shells — rediscretized coarse facet surfaces stagnate the
        V-cycle, see stencil_rap's docstring), rediscretize on flat
        meshes (identical goldens/iteration counts to previous rounds).

        ``df_cycle`` (df_operator mode): apply the WHOLE cycle in df
        (two-f32) arithmetic — level operators kept as df pairs (Galerkin
        levels via mg_df.stencil_rap_df), level vectors/residuals/
        transfers df-accumulated, coarsest solved by an f64 dense
        inverse of the df pair.  This is the precision the
        near-inextensional curved shells need: the f32 cycle application
        stalls the roof CG five decades short even with exact coarse
        operators (r4 tools/roof_prec_probe.py), while TPU-emulated f64
        cycles are unavailable at scale (worker crash >=66k nodes).
        Costs ~2x the f32 cycle per application (df matvec streams the
        pair)."""
        if isinstance(mesh, MeshGenParams):
            mesh, _, _ = generate(mesh)
        self.material = material
        self.dtype = dtype
        self.df_operator = df_operator
        if df_cycle and not df_operator:
            raise ValueError("df_cycle requires df_operator=True (the df "
                             "level pairs come from the df assembly)")
        self.df_cycle = bool(df_cycle)
        self.nu_smooth = nu_smooth
        # omega None = per-level auto-damping: lambda_max(D^-1 A) is
        # estimated by power iteration and omega = 4/(3 lambda_max) — the
        # classic optimal damping for Jacobi smoothing of the upper half
        # spectrum. The quad stencil lands at ~0.7 (the old hand-tuned
        # value); the TRI stencil needs ~0.5: at the fixed 0.7 its
        # V-cycle loses mesh independence (88/158/279 iterations at
        # 64/128/256 — and at omega=0.9 it diverges outright).
        self.omega = omega
        # smoother="chebyshev": degree-nu_smooth Chebyshev polynomial in
        # D^-1 A over [0.25*lam_max, 1.05*lam_max] — same matvec count
        # per sweep as Jacobi but a flat spectral damping profile, which
        # keeps V-cycle iteration counts from creeping at depth (Jacobi:
        # 54 -> 86 iterations from 256^2 to 2304^2 on the tri plate).
        if smoother not in ("jacobi", "chebyshev"):
            raise ValueError(f"unknown smoother {smoother!r}")
        self.smoother = smoother
        # chebyshev smoothing interval = [cheby_lo, 1.05] * lam_max.
        # 0.25 is the classic AMG choice (assumes coarse correction
        # handles the lowest quarter); curved shells (Scordelis-Lo roof)
        # have fine bending modes the coarse FACET surface represents
        # poorly — widening the interval (smaller cheby_lo, higher
        # degree) trades smoothing work for V-cycle strength there.
        self.cheby_lo = 0.25
        if cycle not in (None, "V", "W", "K"):
            raise ValueError(f"unknown cycle {cycle!r}")
        self.cycle = cycle  # None = auto, resolved once coarse_op is known
        # k_depth: deepest level index that still gets the K-cycle's
        # 2-step FCG coarse solve; levels below it fall back to plain V
        # visits (still SPD — truncation only weakens, never breaks, the
        # preconditioner). WHY: the K-cycle's traced program doubles per
        # level (2 cycle visits per FCG step), i.e. 2^(n_levels-2)
        # coarsest bodies — the full-depth df K at roof-512^2 (6 levels)
        # produced a 41.5 MB MLIR module that OOM-killed the remote
        # compile helper (r5). None = unbounded (small hierarchies).
        self.k_depth = k_depth
        _n_elem_fine = len(mesh.tri) + len(mesh.quad)
        # "big" regime: grid-df assembly + Pallas matvecs win above
        # ~10^5 elements; below, the per-dispatch overhead of the
        # barrier-segmented kernels loses to the small-mesh strip/XLA
        # paths (measured: 128^2 pallas solve 0.26 s vs 0.18 s XLA,
        # 512^2 0.65 s vs 1.09 s)
        self._big = _n_elem_fine >= 65536
        # Pallas stencil kernels (f32 smoother + df outer matvec): real
        # accelerator only — CPU Pallas is interpret-only, and f64 levels
        # keep the XLA path (no f64 inside Pallas). Plain tile-major
        # layouts: no relayout copies, which matters when the fine df
        # pair is most of HBM.
        if use_pallas is None:
            use_pallas = (
                jax.devices()[0].platform != "cpu"
                and (df_operator or dtype == jnp.float32)
                and self._big
            )
        self.use_pallas = use_pallas
        # symmetric-storage df CG matvec: stream only the off >= 0 half
        # of the fine pair (each block serves its direct AND transposed
        # term) — 645 vs 484 GB/s matvec-equivalent on the v5e (r3
        # probe). Pair-path only (the class path streams no values).
        self.sym_spmv = use_pallas if sym_spmv is None else bool(sym_spmv)
        # Pallas-resident df element kernels inside the grid assembly
        # (ops/pallas_elem.py): accelerator-only, opt-in
        self.elem_pallas = bool(elem_pallas) and jax.devices()[0].platform != "cpu"

        grid = detect_structured_grid(mesh)
        if grid is None:
            raise ValueError(
                "multigrid requires a row-major structured grid mesh "
                "(detect_structured_grid failed)"
            )
        self.grid = grid

        if coarse_op is None:
            coarse_op = "rediscretize" if _is_planar(mesh.coords) else "galerkin"
        if coarse_op not in ("rediscretize", "galerkin"):
            raise ValueError(f"unknown coarse_op {coarse_op!r}")
        self.coarse_op = coarse_op
        if self.cycle is None:
            # Auto = V everywhere. Curved (Galerkin) hierarchies weaken
            # FAST with depth (roof two-grid rho 0.77 -> 0.93 at depth 3
            # -> 0.98 at depth 4, tools/roof_depth_probe.py) and W
            # (gamma=2) recovers ~two-grid quality in exact arithmetic —
            # but the composed coarse solver 2M - MAM is SPD only while
            # lambda_max(AM) < 2, and on the deep (6-7 level) roof-1024
            # f32 hierarchy that margin is gone: both production W runs
            # diverged (residual 1.3e5, then 6.1e5 AFTER the Ritz
            # upper-bound lambda fix) where the V run on identical
            # kernels reached 2e-5 (r3, ROOF_SCALE history). V keeps the
            # preconditioner SPD as long as each smoother contracts and
            # the coarsest factor is SPD — cap hierarchy depth
            # (n_levels) instead to buy strength on curved grids.
            self.cycle = "V"
        if coarse_op == "galerkin" and class_operator:
            raise ValueError(
                "coarse_op='galerkin' needs materialized fine values as the "
                "RAP source; class_operator=True stores none"
            )
        if coarse_op == "galerkin":
            class_operator = False

        if n_levels is None:
            n_levels = 1
            nx, ny = grid.nxp - 1, grid.nyp - 1
            while nx % 2 == 0 and ny % 2 == 0 and max(nx, ny) > 2 * coarse_max:
                nx //= 2
                ny //= 2
                n_levels += 1
        self.n_levels = n_levels

        from fem_shell_tpu.large import LargeShellSystem

        # level geometry/BC: every-2nd-node subsampling of the FINE grid —
        # no meshGen parameters needed, curved structured shells included
        coords_g = np.asarray(mesh.coords, np.float64).reshape(grid.nyp, grid.nxp, 3)
        mask_g = mesh.dirichlet_mask().reshape(grid.nyp, grid.nxp, 6)

        self.levels: List[_Level] = []
        self._systems: List = []  # per-level assemblers, kept for reassemble()
        self._cdf = None  # matrix-free class operator (set by the l==0 branch)
        self._fine_df = None
        # df_cycle: per-level df value pairs (fine entry None — the fine
        # pair is self._fine_df, passed to jit once; coarse entries flat)
        self._pairs: List[Optional[object]] = []
        for l in range(n_levels):
            f = 2**l
            if (grid.nxp - 1) % f or (grid.nyp - 1) % f:
                raise ValueError(f"nx/ny not divisible by 2^{l}")
            cg, mg_ = coords_g[::f, ::f], mask_g[::f, ::f]
            nyp_l, nxp_l = cg.shape[0], cg.shape[1]
            types_l, conn_l = _grid_conn(nxp_l, nyp_l, grid.elem_type, grid.ul_lr)
            mesh_l = (
                mesh
                if l == 0
                else ShellMesh(cg.reshape(-1, 3), types_l, conn_l, np.zeros((0, 3), np.int32))
            )
            sys_l = LargeShellSystem(
                mesh_l,
                material,
                dtype=dtype,
                chunk=chunk if l == 0 else min(chunk, 4096),
                dirichlet_mask=mg_.reshape(-1, 6),
            )
            if sys_l.offsets is None:
                raise ValueError("multigrid requires stencil-addressable grids")
            galerkin_l = l > 0 and self.coarse_op == "galerkin"
            if not assemble:
                # lazy construction (solve_fused assembles every level
                # inside its single jitted program per call)
                if self.df_cycle:
                    raise ValueError("df_cycle requires assembled levels")
                self._systems.append(sys_l)
                self._pairs.append(None)
                self.levels.append(
                    _Level(
                        values=None,
                        offsets=(
                            grid_rap_offsets(nxp_l)
                            if galerkin_l
                            else tuple(int(o) for o in sys_l.offsets)
                        ),
                        free_t=sys_l.free_t,
                        inv_diag=None,
                        nyp=nyp_l,
                        nxp=nxp_l,
                        npad=sys_l.pattern.n_pad,
                    )
                )
                continue
            if galerkin_l:
                self._systems.append(sys_l)
                pair_l = None
                if self.df_cycle:
                    prev_pair = self._fine_df if l == 1 else self._pairs[l - 1]
                    pair_l, diag, offs = self._rap_level_df(
                        prev_pair, self.levels[l - 1], sys_l
                    )
                    values = pair_l.hi
                else:
                    values, diag, offs = self._rap_level(self.levels[l - 1], sys_l, l)
                lvl = _Level(
                    values=values,
                    offsets=offs,
                    free_t=sys_l.free_t,
                    inv_diag=jnp.where(diag != 0, 1.0 / diag, 1.0),
                    nyp=nyp_l,
                    nxp=nxp_l,
                    npad=sys_l.pattern.n_pad,
                )
                om, lam = self._level_omega(lvl)
                self.levels.append(dataclasses.replace(lvl, omega=om, lam=lam))
                self._pairs.append(pair_l)
                continue
            if (df_operator and l == 0 and class_operator is not False
                    and n_levels > 1 and not self.df_cycle):
                # matrix-free fine level: exact-stencil class tables
                # instead of a materialized pair (uniform grids only —
                # build_exact_stencil raises on anything else)
                try:
                    cparts, diag = self._build_class_level(mesh, sys_l)
                except ValueError:
                    if class_operator:
                        raise
                    cparts, diag = None, None
                if cparts is not None:
                    self._cdf = cparts
                    self._fine_df = None
                    self._systems.append(sys_l)
                    self._pairs.append(None)
                    lvl = _Level(
                        values=None,
                        offsets=tuple(int(o) for o in sys_l.offsets),
                        free_t=sys_l.free_t,
                        inv_diag=jnp.where(diag != 0, 1.0 / diag, 1.0),
                        nyp=nyp_l,
                        nxp=nxp_l,
                        npad=sys_l.pattern.n_pad,
                        cparts=cparts,
                    )
                    om, lam = self._level_omega(lvl)
                    self.levels.append(dataclasses.replace(lvl, omega=om, lam=lam))
                    continue
            if df_operator:
                # every level goes through the donated pipeline (peak
                # memory = running levels + ONE pair); only the fine level
                # keeps its lo part — the outer CG operator needs eps64
                # entries, coarse levels are preconditioner-only and keep
                # just hi (the temporary DF drops lo by refcount). With
                # Pallas on, non-coarsest levels are assembled DIRECTLY in
                # the tile-major kernel layout (the coarsest stays flat —
                # _densify needs it, and it never smooths).
                layout = "tiled" if (self.use_pallas and l < n_levels - 1) else "flat"
                # at scale, every level is a grid by construction: force
                # the grid pipeline on accelerators regardless of level
                # size (the emulated-f64 strip path's unthrottled dispatch
                # overlaps multi-GB temp arenas next to the resident fine
                # pair); small systems keep the latency-friendly auto path
                method = (
                    "grid"
                    if (self._big and jax.devices()[0].platform != "cpu")
                    else "auto"
                )
                pair, diag = sys_l.assemble_df(
                    strip_nodes=strip_nodes,
                    chunk=min(chunk, 8192),
                    layout=layout,
                    with_diag=True,
                    method=method,
                    elem_pallas=self.elem_pallas and method == "grid",
                )
                if l == 0:
                    self._fine_df = pair
                values = pair.hi
            else:
                pair = None
                values = sys_l.assemble()
                diag = None
            self._systems.append(sys_l)
            # df_cycle coarse levels keep their full pair (the fine pair
            # lives in self._fine_df; everyone else drops lo by refcount)
            self._pairs.append(pair if (self.df_cycle and l > 0) else None)
            if diag is None:
                diag = self._diag_of(values, sys_l.offsets)
            lvl = _Level(
                values=values,
                offsets=tuple(int(o) for o in sys_l.offsets),
                free_t=sys_l.free_t,
                inv_diag=jnp.where(diag != 0, 1.0 / diag, 1.0),
                nyp=nyp_l,
                nxp=nxp_l,
                npad=sys_l.pattern.n_pad,
            )
            om, lam = self._level_omega(lvl)
            lvl = dataclasses.replace(lvl, omega=om, lam=lam)
            self.levels.append(lvl)
        self._fine_mesh = mesh
        self._fine = self.levels[0]
        self._df_strip_nodes = strip_nodes
        self._df_chunk = min(chunk, 8192)
        if assemble:
            self._build_fine_sym()

        if assemble:
            if self.df_cycle:
                cpair = self._pairs[-1] if n_levels > 1 else self._fine_df
                self.levels[-1] = self._coarse_factor_df(self.levels[-1], cpair)
            else:
                self.levels[-1] = self._coarse_factor(self.levels[-1])

        self._solve_jit = jax.jit(self._solve_impl, static_argnums=(2, 3))

    # ------------------------------------------------------------------
    def _coarse_factor(self, c: _Level) -> _Level:
        """Coarsest-level direct-solve factors. f32 (production) mode:
        device-resident Cholesky of the diagonally scaled dense operator
        — no host round trip (the densify fetch + host inv + re-upload
        cost ~2.3 s per rebuild over the tunneled remote platform, r3
        profile). f64 mode keeps the host inverse (golden/CPU paths; TPU
        lacks dense LU and f64 Cholesky would run emulated)."""
        if self.dtype == jnp.float32:
            if not hasattr(self, "_chol_jit"):
                def _factor(lvl):
                    dense = _densify(lvl)
                    d = jnp.diagonal(dense)
                    s = jnp.where(d > 0, jax.lax.rsqrt(d), 1.0)
                    scaled = (dense * s[None, :] * s[:, None]).astype(jnp.float32)
                    # eps cascade: after a deep f32 Galerkin RAP chain
                    # (roof 1024^2 = 6 RAPs) the coarsest operator can
                    # drift a hair non-SPD and the factor goes NaN —
                    # which poisons EVERY V-cycle (r3: roof-scale CG
                    # died at iteration 1). The scaled operator has unit
                    # diagonal, so the shifts are relative; the first
                    # finite factor wins. A 1e-3 shift on a
                    # preconditioner-only coarse solve is harmless.
                    eye = jnp.eye(scaled.shape[0], dtype=jnp.float32)
                    chol = jnp.linalg.cholesky(scaled)
                    for eps in (1e-5, 1e-3):
                        c_eps = jnp.linalg.cholesky(scaled + eps * eye)
                        chol = jnp.where(jnp.isfinite(chol).all(), chol, c_eps)
                    return chol, s.astype(jnp.float32)

                self._chol_jit = jax.jit(_factor)
            chol, s = self._chol_jit(c)
            return dataclasses.replace(c, chol=chol, chol_scale=s, dense_inv=None)
        dense = np.asarray(_densify(c), np.float64)
        inv = np.linalg.inv(dense)
        return dataclasses.replace(c, dense_inv=jnp.asarray(inv, self.dtype))

    # ------------------------------------------------------------------
    def _build_fine_sym(self):
        """Symmetric-storage copy of the fine df pair for the outer CG
        matvec (ops/pallas_spmv_df.stencil_spmv_pallas_df_sym): only the
        off >= 0 slots are kept, so the CG streams ~55% of the operator
        bytes per iteration. The full hi stays resident for the V-cycle
        smoother and Galerkin RAP; net fine-operator memory goes from
        2.0x hi (hi+lo) to ~2.14x."""
        self._fine_sym = None
        if not (
            self.sym_spmv
            and self._fine_df is not None
            and self._fine_df.hi.ndim == 4
        ):
            return
        offsets = self.levels[0].offsets
        if sorted(-o for o in offsets) != sorted(offsets):
            return  # structurally asymmetric stencil: keep full storage
        # the sym kernel's cross-tile carry reaches one grid step ahead:
        # halo rows must fit the per-step payload (tps * r_tile rows)
        ntiles, _, r_tile, _ = self._fine_df.hi.shape
        tps = 2 if ntiles % 2 == 0 else 1
        if max(offsets) // 128 + 1 > tps * r_tile:
            return
        from fem_shell_tpu.ops.assemble_grid import untile_values
        from fem_shell_tpu.ops.df import DF
        from fem_shell_tpu.ops.pallas_spmv_df import prepare_tiled_values_df_sym

        if not hasattr(self, "_sym_jit"):
            def _conv(hi, lo, offs):
                flat = DF(untile_values(hi), untile_values(lo))
                vh, vl, _ = prepare_tiled_values_df_sym(flat, offs)
                return vh, vl

            self._sym_jit = jax.jit(_conv, static_argnums=(2,))
        self._fine_sym = self._sym_jit(
            self._fine_df.hi, self._fine_df.lo, offsets
        )

    # ------------------------------------------------------------------
    def _rap_level(self, prev: _Level, sys_l, l: int):
        """Galerkin level operator from the previous (finer) level:
        stencil_rap on the flat values, re-tiled for the Pallas smoother
        where the rediscretized path would have assembled tiled."""
        from fem_shell_tpu.ops.assemble_grid import tile_values, untile_values

        pv = prev.values
        if pv is None:
            raise ValueError("galerkin coarse levels need materialized values")
        if pv.ndim == 4:
            pv = untile_values(pv)
        if not hasattr(self, "_rap_jit"):
            self._rap_jit = jax.jit(stencil_rap, static_argnums=(2, 3, 4, 5))
        npad_c = sys_l.pattern.n_pad
        flat = self._rap_jit(
            pv,
            sys_l.free_t.astype(pv.dtype),
            prev.offsets,
            prev.nyp,
            prev.nxp,
            npad_c,
        )
        nxp_l = prev.nxp // 2 + 1
        offs = grid_rap_offsets(nxp_l)
        tiled = (
            self.df_operator and self.use_pallas and l < self.n_levels - 1
        )
        values = tile_values(flat) if tiled else flat
        diag = self._diag_of(values, offs)
        return values, diag, offs

    # ------------------------------------------------------------------
    def _rap_level_df(self, prev_pair, prev: _Level, sys_l):
        """df Galerkin level from the previous level's df PAIR
        (mg_df.stencil_rap_df): the coarse operator keeps ~eps49 of the
        fine pair's value instead of the f32 RAP's accumulated
        cancellation error. Tiled (4D) pairs are untiled INSIDE the
        jitted program so the flat copy is a compiler-managed
        temporary."""
        from fem_shell_tpu.mg_df import stencil_rap_df
        from fem_shell_tpu.ops.df import DF

        if not hasattr(self, "_rap_df_jit"):
            def _rap_df(hi, lo, free_c, offs, nyp, nxp, npad_c):
                if hi.ndim == 4:
                    from fem_shell_tpu.ops.assemble_grid import untile_values

                    hi, lo = untile_values(hi), untile_values(lo)
                return stencil_rap_df(DF(hi, lo), free_c, offs, nyp, nxp, npad_c)

            self._rap_df_jit = jax.jit(_rap_df, static_argnums=(3, 4, 5, 6))
        pair = self._rap_df_jit(
            prev_pair.hi,
            prev_pair.lo,
            sys_l.free_t.astype(jnp.float32),
            prev.offsets,
            prev.nyp,
            prev.nxp,
            sys_l.pattern.n_pad,
        )
        offs = grid_rap_offsets(prev.nxp // 2 + 1)
        diag = self._diag_of(pair.hi, offs)
        return pair, diag, offs

    # ------------------------------------------------------------------
    def _coarse_factor_df(self, c: _Level, pair) -> _Level:
        """Coarsest-level factor for the df cycle: f64 HOST inverse of
        the FULL df pair (hi + lo). The production f32 Cholesky is
        exactly the precision the df cycle exists to avoid, and on the
        roof the inverse's entries span the f32 range (see _vcycle's
        dense_inv comment). The coarsest is coarse_max-bounded, so the
        host round trip is negligible."""
        if pair.hi.ndim == 4:
            from fem_shell_tpu.ops.assemble_grid import untile_values
            from fem_shell_tpu.ops.df import DF

            pair = DF(untile_values(pair.hi), untile_values(pair.lo))
        dh = np.asarray(_densify(dataclasses.replace(c, values=pair.hi)), np.float64)
        dl = np.asarray(_densify(dataclasses.replace(c, values=pair.lo)), np.float64)
        inv = np.linalg.inv(dh + dl)
        return dataclasses.replace(
            c,
            dense_inv=jnp.asarray(inv, jnp.float64),
            chol=None,
            chol_scale=None,
        )

    # ------------------------------------------------------------------
    def _build_class_level(self, mesh, sys_l, timings: Optional[dict] = None):
        """Host: exact-stencil tables -> matrix-free class operator parts
        for the fine level (raises ValueError off uniform grids)."""
        from fem_shell_tpu.ops.class_matvec import build_class_parts
        from fem_shell_tpu.ops.exact_stencil import build_exact_stencil

        st = build_exact_stencil(mesh, self.material, sys_l.offsets,
                                 timings=timings, grid=self.grid)
        self._exact_st = st
        t0 = time.perf_counter()
        out = build_class_parts(st, sys_l.pattern.n_pad)
        if timings is not None:
            timings["class_parts"] = time.perf_counter() - t0
        return out

    # ------------------------------------------------------------------
    def _diag_of(self, values, offsets):
        if values.ndim == 4:  # tile-major Pallas layout
            from fem_shell_tpu.ops.assemble_grid import soa_diagonal_tiled

            return soa_diagonal_tiled(values, offsets)
        return soa_diagonal(values, offsets=offsets)

    def reassemble(self, profile: bool = False):
        """Re-run every level's operator assembly (steady-state: all jits
        and strip plans are cached). Benchmarks use this so 'overall time'
        covers assembly + solve like the reference's Test-G timing
        (doc/validation.tex:500-537); coupled drivers would use it when
        geometry changes. ``profile=True`` prints a per-stage wall-time
        breakdown (each stage synced by a device->host fetch)."""
        prof = _RebuildProf(profile)
        for l, sys_l in enumerate(self._systems):
            if l == 0 and self._cdf is not None:
                # matrix-free class level: re-derive the tables from the
                # mesh (the honest per-rep "assembly" of this path)
                if hasattr(self, "_exact_st"):
                    del self._exact_st
                tim: Optional[dict] = {} if profile else None
                cparts, diag = self._build_class_level(
                    self._fine_mesh, sys_l, timings=tim
                )
                if tim:
                    prof.absorb("  class/", tim)
                prof.mark("class/build+upload", cparts, diag)
                self._cdf = cparts
                lvl = dataclasses.replace(
                    self.levels[0],
                    values=None,
                    cparts=cparts,
                    inv_diag=jnp.where(diag != 0, 1.0 / diag, 1.0),
                )
                prof.mark("class/inv_diag", lvl.inv_diag)
                om, lam = self._level_omega(lvl)
                prof.mark("class/omega", om, lam)
                self.levels[0] = dataclasses.replace(lvl, omega=om, lam=lam)
                continue
            if l > 0 and self.coarse_op == "galerkin":
                self.levels[l] = dataclasses.replace(self.levels[l], values=None)
                if self.df_cycle:
                    self._pairs[l] = None  # release before rebuilding
                    prev_pair = self._fine_df if l == 1 else self._pairs[l - 1]
                    pair_l, diag, offs = self._rap_level_df(
                        prev_pair, self.levels[l - 1], sys_l
                    )
                    self._pairs[l] = pair_l
                    values = pair_l.hi
                else:
                    values, diag, offs = self._rap_level(self.levels[l - 1], sys_l, l)
                prof.mark(f"L{l}/rap", values, diag)
                lvl = dataclasses.replace(
                    self.levels[l],
                    values=values,
                    offsets=offs,
                    inv_diag=jnp.where(diag != 0, 1.0 / diag, 1.0),
                )
                om, lam = self._level_omega(lvl)
                prof.mark(f"L{l}/omega", om, lam)
                self.levels[l] = dataclasses.replace(lvl, omega=om, lam=lam)
                continue
            # release the old operator FIRST: at the largest scale two df
            # pairs cannot coexist in HBM
            self.levels[l] = dataclasses.replace(self.levels[l], values=None)
            if self._pairs and l < len(self._pairs):
                self._pairs[l] = None
            if self.df_operator:
                layout = (
                    "tiled" if (self.use_pallas and l < self.n_levels - 1) else "flat"
                )
                if l == 0:
                    self._fine_df = None
                method = (
                    "grid"
                    if (self._big and jax.devices()[0].platform != "cpu")
                    else "auto"
                )
                pair, diag = sys_l.assemble_df(
                    strip_nodes=self._df_strip_nodes,
                    chunk=self._df_chunk,
                    layout=layout,
                    with_diag=True,
                    method=method,
                    elem_pallas=self.elem_pallas and method == "grid",
                )
                if l == 0:
                    self._fine_df = pair
                elif self.df_cycle:
                    self._pairs[l] = pair
                values = pair.hi
            else:
                values = sys_l.assemble()
                diag = None
            prof.mark(f"L{l}/assemble", values, diag)
            if diag is None:
                diag = self._diag_of(values, sys_l.offsets)
            lvl = dataclasses.replace(
                self.levels[l],
                values=values,
                inv_diag=jnp.where(diag != 0, 1.0 / diag, 1.0),
            )
            prof.mark(f"L{l}/inv_diag", lvl.inv_diag)
            om, lam = self._level_omega(lvl)
            prof.mark(f"L{l}/omega", om, lam)
            self.levels[l] = dataclasses.replace(lvl, omega=om, lam=lam)
        if self.df_cycle:
            cpair = self._pairs[-1] if self.n_levels > 1 else self._fine_df
            c = self._coarse_factor_df(self.levels[-1], cpair)
        else:
            c = self._coarse_factor(self.levels[-1])
        self.levels[-1] = c
        prof.mark("coarse/factor", c.chol if c.chol is not None else c.dense_inv)
        self._fine = self.levels[0]
        self._build_fine_sym()
        prof.mark("fine/sym", *(self._fine_sym or ()))
        prof.report()
        if hasattr(self, "_levels32"):
            del self._levels32  # stale f32 copies of the old values
        # the fine pair is now the ASSEMBLED one again; solve_df_refined
        # must regenerate the class-consistent pair or its E-correction
        # (exact only vs class-table rounding) would silently be wrong
        self._class_pair_done = False

    # ------------------------------------------------------------------
    def _mv(self, lvl: _Level, x):
        """Level matvec: matrix-free class-table operator when the level
        carries one, Pallas stencil kernel on tile-major f32 operators
        (real accelerator), XLA soa_matvec otherwise."""
        if lvl.values is None and lvl.cparts is not None:
            from fem_shell_tpu.ops.class_matvec import class_matvec_f32

            return class_matvec_f32(lvl.cparts, x)
        if lvl.values.ndim == 4:  # tile-major => Pallas
            from fem_shell_tpu.ops.pallas_spmv import stencil_spmv_pallas_tiled

            return stencil_spmv_pallas_tiled(lvl.values, x, lvl.offsets)
        if self.use_pallas and lvl.values.dtype == jnp.float32:
            from fem_shell_tpu.ops.pallas_spmv import stencil_spmv_pallas

            k = len(lvl.offsets)
            return stencil_spmv_pallas(
                lvl.values.reshape(36, k, lvl.npad), x, lvl.offsets
            )
        return soa_matvec(lvl.values, x, offsets=lvl.offsets)

    def _level_omega(self, lvl: _Level):
        """Per-level Jacobi damping: omega = 4 / (3 lambda_max(D^-1 A)),
        lambda_max from a short power iteration — the optimal damping for
        smoothing the upper half spectrum. Fixed-omega history: 0.7 suits
        the quad stencil (lambda_max ~ 1.9) but the tri stencil has
        lambda_max ~ 2.6 and loses mesh-independence (even diverges at
        0.9). ``omega=<float>`` in the constructor overrides."""
        # ONE cached jit wrapper for all levels and all reassemble()
        # calls: a fresh jax.jit(...) per call re-traces AND re-compiles
        # (the remote axon AOT bypasses the persistent compile cache —
        # measured ~45 s/level at 2304^2, the bulk of the 376 s warm
        # rebuild in SCALE_RUN_r02.log)
        if not hasattr(self, "_power_jit"):
            self._power_jit = jax.jit(self._power_lambda)
        if self.omega is not None:
            lam = self._power_jit(lvl) if self.smoother == "chebyshev" else None
            return jnp.asarray(self.omega, lvl.inv_diag.dtype), lam
        lam = self._power_jit(lvl)
        # clip both ends: degenerate lam (all-constrained level) must not
        # produce a huge or NaN omega — any finite value is harmless there
        return jnp.clip(4.0 / (3.0 * lam), 0.2, 1.0).astype(lvl.inv_diag.dtype), lam

    def _power_lambda(self, lvl: _Level):
        """Traceable lambda_max(D^-1 A) UPPER estimate for one level.

        Power iteration on the symmetrized S = D^-1/2 A D^-1/2 (same
        spectrum as D^-1 A), returning the Rayleigh quotient theta PLUS
        the Ritz residual norm ||S v - theta v||. A plain power/norm
        estimate is a LOWER bound on lambda_max, and the Chebyshev
        polynomial explodes outside its interval — at roof-1024^2 the
        15-iter estimate was ~6%+ low on the Galerkin levels, which made
        the smoother (hence the whole variational cycle) divergent
        (stationary rho 2.7; the W-cycle run then blew up to residual
        1.3e5 — r3, tools/roof_lam_probe.py). theta + ||r|| covers the
        convergence gap and collapses to the exact lambda_max as the
        iterate converges, so the smoothing interval stays near-optimal
        on easy levels and safe on hard ones."""
        n = lvl.npad
        i = jnp.arange(6 * n, dtype=lvl.inv_diag.dtype).reshape(6, n)
        v = (jnp.sin(i * 0.7311) + 0.1) * lvl.free_t
        tiny = jnp.asarray(1e-30, lvl.inv_diag.dtype)
        # guard: a level whose DOFs are all constrained (free_t == 0)
        # would otherwise hit 0/0 and poison omega with NaN
        v = v / jnp.maximum(jnp.sqrt(jnp.sum(v * v)), tiny)
        dis = jnp.sqrt(lvl.inv_diag)

        def smv(v):
            return dis * self._mv(lvl, dis * v)

        def body(_, v):
            w = smv(v)
            return w / jnp.maximum(jnp.sqrt(jnp.sum(w * w)), tiny)

        v = jax.lax.fori_loop(0, 20, body, v)
        w = smv(v)
        vn2 = jnp.maximum(jnp.sum(v * v), tiny)
        theta = jnp.sum(v * w) / vn2
        resid = jnp.sqrt(
            jnp.maximum(jnp.sum((w - theta * v) ** 2) / vn2, 0.0)
        )
        return jnp.maximum(theta + resid, tiny)

    def _smooth(self, lvl: _Level, x, b, sweeps):
        if self.smoother == "chebyshev" and lvl.lam is not None:
            return self._smooth_cheby(lvl, x, b, sweeps)
        omega = self.omega if lvl.omega is None else lvl.omega
        for _ in range(sweeps):
            r = b - self._mv(lvl, x)
            x = x + omega * lvl.inv_diag * r
        return x

    def _smooth_cheby(self, lvl: _Level, x, b, deg):
        """Degree-``deg`` Chebyshev smoothing on D^-1 A over
        [0.25, 1.05]*lam_max (standard AMG smoothing range). A fixed
        real polynomial in the D^-1-preconditioned operator, so the
        V-cycle remains an SPD preconditioner for CG."""
        lam = lvl.lam.astype(lvl.inv_diag.dtype) * 1.05
        lmin = self.cheby_lo * lam
        theta = 0.5 * (lam + lmin)
        delta = 0.5 * (lam - lmin)
        sigma = theta / delta
        rho = 1.0 / sigma
        z = lvl.inv_diag * (b - self._mv(lvl, x))
        p = z / theta
        x = x + p
        for _ in range(deg - 1):
            rho_new = 1.0 / (2.0 * sigma - rho)
            z = lvl.inv_diag * (b - self._mv(lvl, x))
            p = (rho_new * rho) * p + (2.0 * rho_new / delta) * z
            x = x + p
            rho = rho_new
        return x

    def _vcycle(self, levels, li: int, b):
        lvl = levels[li]
        if (
            li == 0
            and lvl.cparts is not None
            and self.use_pallas
            and lvl.values is None
        ):
            # matrix-free class fine level on a real accelerator: run the
            # whole level visit in the persistent padded kernel layout —
            # the per-sweep flat<->grid relayouts otherwise cost ~4
            # full-vector copies per smoother application (~70% of
            # measured level-0 time at 1024^2, r3 probe)
            return self._vcycle_fine_pad(levels, b)
        if lvl.chol is not None:
            # device-resident coarse solve: Cholesky of the diagonally
            # scaled dense operator (scaling tames the drilling-DOF
            # conditioning so an f32 factor is accurate enough for a
            # preconditioner component)
            n_real = lvl.nyp * lvl.nxp
            rhs = (lvl.chol_scale * b[:, :n_real].reshape(-1))[:, None]
            y = jax.lax.linalg.triangular_solve(
                lvl.chol, rhs, left_side=True, lower=True, transpose_a=False
            )
            z = jax.lax.linalg.triangular_solve(
                lvl.chol, y, left_side=True, lower=True, transpose_a=True
            )
            flat = (lvl.chol_scale * z[:, 0]).reshape(6, n_real)
            flat = jnp.pad(flat, ((0, 0), (0, lvl.npad - n_real)))
            return flat * lvl.free_t
        if lvl.dense_inv is not None:
            n_real = lvl.nyp * lvl.nxp
            # apply in the inverse's own dtype and cast the RESULT: an
            # ill-conditioned coarsest (roof: cond ~1e14) has inverse
            # ENTRIES spanning the f32 range — casting the factor down
            # is noise (r4 tools/roof_prec_probe.py f32cast: 800 iters
            # res 37 vs 162 with the f64 inverse kept), while the
            # correction vector itself casts harmlessly
            rhs = b[:, :n_real].reshape(-1).astype(lvl.dense_inv.dtype)
            flat = (lvl.dense_inv @ rhs).reshape(6, n_real).astype(b.dtype)
            flat = jnp.pad(flat, ((0, 0), (0, lvl.npad - n_real)))
            return flat * lvl.free_t
        x = jnp.zeros_like(b)
        x = self._smooth(lvl, x, b, self.nu_smooth)
        r = b - self._mv(lvl, x)
        nxt = levels[li + 1]
        rc = _from_grid(_restrict(_to_grid(r, lvl)), nxt) * nxt.free_t
        ec = self._coarse_visit(levels, li + 1, rc)
        x = x + _from_grid(_prolong(_to_grid(ec, nxt)), lvl) * lvl.free_t
        x = self._smooth(lvl, x, b, self.nu_smooth)
        return x

    def _coarse_visit(self, levels, li: int, rc):
        """Coarse-level solve dispatch for the cycle type.

        "V": one recursive visit. "W" (gamma=2): a second visit on the
        updated residual — the composed solver 2M - MAM stays symmetric
        but is SPD only while lambda_max(AM) < 2 (the r3 roof
        divergence; see __init__). "K" (Notay K-cycle, AGMG-style): the
        coarse problem is solved by 2 truncated-FCG steps preconditioned
        by the cycle visit at that level — near-two-grid quality at any
        depth, each application SPD (a positive polynomial in A_c), but
        nonlinear in rc, so the OUTER CG must run flexible (solver.py /
        solver_df.py ``flexible=True``; the solve paths set it from
        self.cycle automatically)."""
        nxt = levels[li]
        direct = nxt.chol is not None or nxt.dense_inv is not None
        if (
            self.cycle == "K"
            and li < len(levels) - 1
            and not direct
            and (self.k_depth is None or li <= self.k_depth)
        ):
            return self._ksolve(levels, li, rc)
        ec = self._vcycle(levels, li, rc)
        if self.cycle == "W" and li < len(levels) - 1:
            rc2 = rc - self._mv(nxt, ec) * nxt.free_t
            ec = ec + self._vcycle(levels, li, rc2)
        return ec

    def _ksolve(self, levels, li: int, b):
        """Two truncated-FCG steps on A_li e = b, preconditioned by the
        cycle visit at this level (which recurses through _coarse_visit,
        so every level below gets the same Krylov acceleration). The
        0-guarded divisions keep a zero residual from poisoning the
        trace with 0/0."""
        lvl = levels[li]
        mask = lvl.free_t

        def mv(x):
            return self._mv(lvl, x) * mask

        def sdiv(a, d):
            return a / jnp.where(d == 0, jnp.ones_like(d), d)

        z1 = self._vcycle(levels, li, b)
        q1 = mv(z1)
        zq1 = jnp.sum(z1 * q1)
        alpha1 = sdiv(jnp.sum(z1 * b), zq1)
        r = b - alpha1 * q1
        z2 = self._vcycle(levels, li, r)
        q2 = mv(z2)
        beta = sdiv(jnp.sum(z2 * q1), zq1)
        p = z2 - beta * z1
        qp = q2 - beta * q1
        alpha2 = sdiv(jnp.sum(p * r), jnp.sum(p * qp))
        return alpha1 * z1 + alpha2 * p

    # ------------------------------------------------------------------
    # df-valued cycle (df_cycle=True): the f32 cycle application is the
    # precision bottleneck on near-inextensional curved hierarchies —
    # see mg_df.py's header for the r4 evidence. Level vectors are DF
    # pairs end-to-end; structure mirrors _vcycle/_coarse_visit/_ksolve.
    def _mv_df(self, lvl: _Level, pair, x):
        from fem_shell_tpu.ops.df import df_stencil_matvec

        if pair.hi.ndim == 4:  # tile-major pair => Pallas df kernel
            from fem_shell_tpu.ops.pallas_spmv_df import stencil_spmv_pallas_df

            return stencil_spmv_pallas_df(pair.hi, pair.lo, x, lvl.offsets)
        return df_stencil_matvec(pair, x, lvl.offsets)

    def _smooth_df(self, lvl: _Level, pair, x, b, sweeps):
        from fem_shell_tpu.mg_df import smooth_cheby_df, smooth_jacobi_df

        mv = lambda v: self._mv_df(lvl, pair, v)  # noqa: E731
        if self.smoother == "chebyshev" and lvl.lam is not None:
            return smooth_cheby_df(
                mv, x, b, lvl.inv_diag, lvl.lam, self.cheby_lo, sweeps
            )
        omega = self.omega if lvl.omega is None else lvl.omega
        return smooth_jacobi_df(mv, x, b, omega * lvl.inv_diag, sweeps)

    def _vcycle_df(self, levels, pairs, li: int, b):
        from fem_shell_tpu.mg_df import (
            from_grid_df,
            mask_df,
            prolong_df,
            restrict_df,
            to_grid_df,
        )
        from fem_shell_tpu.ops.df import (
            df_add,
            df_from_f64,
            df_neg,
            df_zeros_like,
        )

        lvl = levels[li]
        if lvl.dense_inv is not None:
            # f64 dense inverse of the full df coarsest pair
            # (_coarse_factor_df); the rhs folds hi+lo losslessly into
            # f64 and the correction splits back into a df pair
            n_real = lvl.nyp * lvl.nxp
            dt = lvl.dense_inv.dtype
            rhs = (
                b.hi[:, :n_real].astype(dt) + b.lo[:, :n_real].astype(dt)
            ).reshape(-1)
            z64 = (lvl.dense_inv @ rhs).reshape(6, n_real)
            z = df_from_f64(jnp.pad(z64, ((0, 0), (0, lvl.npad - n_real))))
            return mask_df(z, lvl.free_t)
        x = df_zeros_like(b)
        x = self._smooth_df(lvl, pairs[li], x, b, self.nu_smooth)
        r = df_add(b, df_neg(self._mv_df(lvl, pairs[li], x)))
        nxt = levels[li + 1]
        rc = mask_df(
            from_grid_df(restrict_df(to_grid_df(r, lvl.nyp, lvl.nxp)), nxt.npad),
            nxt.free_t,
        )
        ec = self._coarse_visit_df(levels, pairs, li + 1, rc)
        corr = mask_df(
            from_grid_df(prolong_df(to_grid_df(ec, nxt.nyp, nxt.nxp)), lvl.npad),
            lvl.free_t,
        )
        x = df_add(x, corr)
        x = self._smooth_df(lvl, pairs[li], x, b, self.nu_smooth)
        return x

    def _coarse_visit_df(self, levels, pairs, li: int, rc):
        from fem_shell_tpu.mg_df import mask_df
        from fem_shell_tpu.ops.df import df_add, df_neg

        nxt = levels[li]
        direct = nxt.chol is not None or nxt.dense_inv is not None
        if (
            self.cycle == "K"
            and li < len(levels) - 1
            and not direct
            and (self.k_depth is None or li <= self.k_depth)
        ):
            return self._ksolve_df(levels, pairs, li, rc)
        ec = self._vcycle_df(levels, pairs, li, rc)
        if self.cycle == "W" and li < len(levels) - 1:
            rc2 = df_add(
                rc, df_neg(mask_df(self._mv_df(nxt, pairs[li], ec), nxt.free_t))
            )
            ec = df_add(ec, self._vcycle_df(levels, pairs, li, rc2))
        return ec

    def _ksolve_df(self, levels, pairs, li: int, b):
        """df twin of _ksolve: 2 truncated-FCG steps on A_li e = b
        preconditioned by the df cycle visit; scalars in (emulated) f64
        via df_dot_f64 — the same O(1)-per-level cost class as the df
        outer CG's recurrence."""
        from fem_shell_tpu.mg_df import mask_df
        from fem_shell_tpu.ops.df import (
            df_add,
            df_dot_f64,
            df_scale,
            df_scalar_from_f64,
        )

        lvl = levels[li]

        def mv(x):
            return mask_df(self._mv_df(lvl, pairs[li], x), lvl.free_t)

        def sdiv(a, d):
            return a / jnp.where(d == 0, jnp.ones_like(d), d)

        z1 = self._vcycle_df(levels, pairs, li, b)
        q1 = mv(z1)
        zq1 = df_dot_f64(z1, q1)
        alpha1 = sdiv(df_dot_f64(z1, b), zq1)
        r = df_add(b, df_scale(q1, df_scalar_from_f64(-alpha1)))
        z2 = self._vcycle_df(levels, pairs, li, r)
        q2 = mv(z2)
        beta = sdiv(df_dot_f64(z2, q1), zq1)
        nbeta = df_scalar_from_f64(-beta)
        p = df_add(z2, df_scale(z1, nbeta))
        qp = df_add(q2, df_scale(q1, nbeta))
        alpha2 = sdiv(df_dot_f64(p, r), df_dot_f64(p, qp))
        return df_add(
            df_scale(z1, df_scalar_from_f64(alpha1)),
            df_scale(p, df_scalar_from_f64(alpha2)),
        )

    def _vcycle_fine_pad(self, levels, b):
        """Level-0 V-cycle segment in the padded pallas layout
        (ops/pallas_class.py pad-grid machinery): pad in once, smooth /
        residual / correct / smooth with zero relayout copies, unpad
        once. Identical math to the flat path (zero-ring vs wrap-ring
        out-of-range convention — both exact, class_matvec.py)."""
        from fem_shell_tpu.ops.pallas_class import (
            _PadGridSpec,
            from_pad_grid,
            to_pad_grid,
        )

        lvl = levels[0]
        pg = _PadGridSpec(lvl.nyp, lvl.nxp)
        x2 = self._vcycle_pad_carry(levels, to_pad_grid(pg, b))
        return from_pad_grid(pg, x2, lvl.npad)

    def _vcycle_pad_carry(self, levels, b2):
        """Carry-in/carry-out core of the pad-layout fine V-cycle
        (``b2`` [8, nr+2hr, 128] with clean ring; returns x2 carry)."""
        from fem_shell_tpu.ops.pallas_class import (
            _PadGridSpec,
            class_matvec_f32_pad,
            class_smooth_f32_pad,
            pad_core,
            to_pad_grid,
        )

        lvl = levels[0]
        cp = lvl.cparts
        pg = _PadGridSpec(lvl.nyp, lvl.nxp)
        nyp, nxp, q, hr = pg.nyp, pg.nxp, pg.q, pg.hr
        omega = self.omega if lvl.omega is None else lvl.omega

        b_c = pad_core(pg, b2)
        wd_c = pad_core(pg, to_pad_grid(pg, lvl.inv_diag))

        def smooth(x2):
            if self.smoother == "chebyshev" and lvl.lam is not None:
                return self._smooth_cheby_pad(cp, pg, x2, b_c, wd_c, lvl)
            return class_smooth_f32_pad(cp, pg, x2, b_c, wd_c * omega,
                                        self.nu_smooth)

        x2 = smooth(jnp.zeros_like(b2))
        y = class_matvec_f32_pad(cp, pg, x2)
        r_c = b_c - y
        rg = r_c.reshape(6, pg.pyp_pad, pg.pxq)[:, 1 : 1 + nyp, 1 : 1 + nxp]
        nxt = levels[1]
        rc = _from_grid(_restrict(rg), nxt) * nxt.free_t
        ec = self._coarse_visit(levels, 1, rc)
        corr = _prolong(_to_grid(ec, nxt))
        n = nyp * nxp
        free_g = lvl.free_t[:, :n].reshape(6, nyp, nxp)
        corr_q = jnp.pad(corr * free_g, ((0, 0), (0, 0), (1, pg.pxq - nxp - 1)))
        x2 = x2.at[:6, hr + q : hr + q + nyp * q, :].add(
            corr_q.reshape(6, nyp * q, 128)
        )
        return smooth(x2)

    def _smooth_cheby_pad(self, cp, pg, x2, b_c, wd_c, lvl):
        """Chebyshev smoothing in the padded layout (same recurrence as
        _smooth_cheby; all vector ops on the compact core)."""
        from fem_shell_tpu.ops.pallas_class import class_matvec_f32_pad

        deg = self.nu_smooth
        lam = lvl.lam.astype(jnp.float32) * 1.05
        lmin = self.cheby_lo * lam
        theta = 0.5 * (lam + lmin)
        delta = 0.5 * (lam - lmin)
        sigma = theta / delta
        rho = 1.0 / sigma

        def add_core(a, p_c):
            return a.at[:6, pg.hr : pg.hr + pg.nr, :].add(p_c)

        z = wd_c * (b_c - class_matvec_f32_pad(cp, pg, x2))
        p = z / theta
        x2 = add_core(x2, p)
        for _ in range(deg - 1):
            rho_new = 1.0 / (2.0 * sigma - rho)
            z = wd_c * (b_c - class_matvec_f32_pad(cp, pg, x2))
            p = (rho_new * rho) * p + (2.0 * rho_new / delta) * z
            x2 = add_core(x2, p)
            rho = rho_new
        return x2

    def _solve_impl(self, levels, forces_t, rtol, maxiter):
        lvl = levels[0]
        b = forces_t * lvl.free_t
        mv = lambda x: self._mv(lvl, x)  # noqa: E731
        prec = lambda r: self._vcycle(levels, 0, r)  # noqa: E731
        return pcg(mv, b, rtol=rtol, maxiter=maxiter, apply_prec=prec,
                     flexible=self.cycle == "K")

    def solve(self, forces, rtol: float = 1e-10, maxiter: int = 2000):
        lvl = self._fine
        f = np.zeros((lvl.npad, 6))
        f[: lvl.nyp * lvl.nxp] = np.asarray(forces)
        f_t = jnp.asarray(f.T, self.dtype)
        with jax.default_matmul_precision("highest"):
            res = self._solve_jit(self.levels, f_t, rtol, maxiter)
        self.last_cg = res
        return np.asarray(res.x).T[: lvl.nyp * lvl.nxp]

    # ------------------------------------------------------------------
    # df outer CG + f32 V-cycle preconditioner: the preconditioner only
    # needs to be a fixed SPD operator, so it runs entirely in cheap f32
    # while the CG recurrence keeps df (f64-class) accuracy. TPU-only
    # (see ops/df.py on CPU FMA contraction).
    def _ensure_f32_levels(self):
        if hasattr(self, "_levels32"):
            return
        self._levels32 = [
            dataclasses.replace(
                l,
                values=l.values.astype(jnp.float32),
                free_t=l.free_t.astype(jnp.float32),
                inv_diag=l.inv_diag.astype(jnp.float32),
                # dense_inv stays f64: its entries span the f32 range on
                # ill-conditioned coarsest operators (see _vcycle)
                dense_inv=l.dense_inv,
                # omega/lam are f64 scalars in f64 mode — left uncast
                # they promote the smoother update (and thence the CG
                # carry) to f64 under x64
                omega=None if l.omega is None else l.omega.astype(jnp.float32),
                lam=None if l.lam is None else l.lam.astype(jnp.float32),
            )
            for l in self.levels
        ]

    def _solve_df_impl(self, fine, levels32, forces_t64, rtol, maxiter):
        from fem_shell_tpu.ops.df import DF, df_from_f64, df_stencil_matvec, df_to_f64
        from fem_shell_tpu.solver_df import pcg_df

        b64 = forces_t64 * fine.free_t
        values_df = df_from_f64(fine.values)
        b = df_from_f64(b64)
        mv = lambda x: df_stencil_matvec(values_df, x, fine.offsets)  # noqa: E731

        def prec(r: "DF"):
            z32 = self._vcycle(levels32, 0, r.hi)
            return DF(z32, jnp.zeros_like(z32))

        res = pcg_df(mv, b, rtol=rtol, maxiter=maxiter, apply_prec=prec,
                     flexible=self.cycle == "K")
        return df_to_f64(res.x), res.iters, res.residual

    def _solve_df_impl_f32(self, fine, levels, forces_t64, rtol, maxiter):
        """df outer CG directly over the f32-assembled fine operator
        (exact-geometry centered kernels): no emulated-f64 stage anywhere,
        half the fine-level HBM, and the V-cycle shares the same values —
        the multi-million-element production path."""
        from fem_shell_tpu.ops.df import DF, df_from_f64, df_stencil_matvec_f32v, df_to_f64
        from fem_shell_tpu.solver_df import pcg_df

        b = df_from_f64(forces_t64 * fine.free_t.astype(jnp.float64))
        mv = lambda x: df_stencil_matvec_f32v(fine.values, x, fine.offsets)  # noqa: E731

        def prec(r: "DF"):
            z32 = self._vcycle(levels, 0, r.hi)
            return DF(z32, jnp.zeros_like(z32))

        res = pcg_df(mv, b, rtol=rtol, maxiter=maxiter, apply_prec=prec,
                     flexible=self.cycle == "K")
        return df_to_f64(res.x), res.iters, res.residual

    def _solve_df_impl_pair(self, fine_df, fine_sym, levels, forces_t64, rtol, maxiter):
        """df outer CG over a strip-assembled df operator pair: f64-class
        operator accuracy at two-f32 storage/bandwidth.

        ``levels[0].values`` arrives as None and is REBOUND to fine_df.hi
        here: passing the fine hi as two separate jit arguments makes the
        compiler budget it twice (observed: 'Used 20.39G of 15.75G hbm'
        at the 10M-element scale even though both args alias one buffer).

        ``fine_sym`` (optional (vh, vl)): symmetric-storage copy of the
        pair — the CG matvec streams only the off >= 0 half (645 vs 484
        GB/s matvec-equivalent, r3 probe)."""
        from fem_shell_tpu.ops.df import DF, df_from_f64, df_stencil_matvec, df_to_f64
        from fem_shell_tpu.solver_df import pcg_df

        fine = dataclasses.replace(levels[0], values=fine_df.hi)
        levels = [fine] + list(levels[1:])

        b = df_from_f64(forces_t64 * fine.free_t.astype(jnp.float64))
        if fine_sym is not None:
            from fem_shell_tpu.ops.pallas_spmv_df import stencil_spmv_pallas_df_sym

            mv = lambda x: stencil_spmv_pallas_df_sym(fine_sym[0], fine_sym[1], x, fine.offsets)  # noqa: E731
        elif fine_df.hi.ndim == 4:  # tile-major pair => Pallas df kernel
            from fem_shell_tpu.ops.pallas_spmv_df import stencil_spmv_pallas_df

            mv = lambda x: stencil_spmv_pallas_df(fine_df.hi, fine_df.lo, x, fine.offsets)  # noqa: E731
        elif self.use_pallas:
            from fem_shell_tpu.ops.pallas_spmv_df import stencil_spmv_pallas_df_flat

            mv = lambda x: stencil_spmv_pallas_df_flat(fine_df, x, fine.offsets)  # noqa: E731
        else:
            mv = lambda x: df_stencil_matvec(fine_df, x, fine.offsets)  # noqa: E731

        def prec(r: "DF"):
            z32 = self._vcycle(levels, 0, r.hi)
            return DF(z32, jnp.zeros_like(z32))

        res = pcg_df(mv, b, rtol=rtol, maxiter=maxiter, apply_prec=prec,
                     flexible=self.cycle == "K")
        return df_to_f64(res.x), res.iters, res.residual

    def _solve_df_impl_dfcycle(
        self, fine_df, fine_sym, levels, pairs, forces_t64, rtol, maxiter
    ):
        """df outer CG with a df-VALUED cycle preconditioner
        (df_cycle=True): prec(r) returns a full df correction instead of
        DF(f32-cycle, 0) — the configuration for near-inextensional
        curved hierarchies (mg_df.py). Fine pair/levels rebinding follows
        _solve_df_impl_pair (single HBM budget for the fine hi)."""
        from fem_shell_tpu.ops.df import df_from_f64, df_to_f64
        from fem_shell_tpu.solver_df import pcg_df

        fine = dataclasses.replace(levels[0], values=fine_df.hi)
        levels = [fine] + list(levels[1:])
        pairs = [fine_df] + list(pairs[1:])

        b = df_from_f64(forces_t64 * fine.free_t.astype(jnp.float64))
        if fine_sym is not None:
            from fem_shell_tpu.ops.pallas_spmv_df import stencil_spmv_pallas_df_sym

            mv = lambda x: stencil_spmv_pallas_df_sym(fine_sym[0], fine_sym[1], x, fine.offsets)  # noqa: E731
        else:
            mv = lambda x: self._mv_df(fine, fine_df, x)  # noqa: E731

        def prec(r: "DF"):
            return self._vcycle_df(levels, pairs, 0, r)

        res = pcg_df(mv, b, rtol=rtol, maxiter=maxiter, apply_prec=prec,
                     flexible=self.cycle == "K")
        return df_to_f64(res.x), res.iters, res.residual

    def _solve_df_impl_class(self, levels, forces_t64, rtol, maxiter):
        """df outer CG over the matrix-free class-table operator
        (ops/class_matvec.py): no fine-level operator storage at all —
        the 10M-element configuration's production solve. On real
        accelerators the WHOLE CG runs in the padded kernel layout
        (ops/pallas_class.py): vectors, matvec, and the fine V-cycle
        level share one layout, so the per-iteration relayout copies of
        the flat path disappear."""
        from fem_shell_tpu.ops.class_matvec import class_matvec_df
        from fem_shell_tpu.ops.df import DF, df_from_f64, df_to_f64
        from fem_shell_tpu.solver_df import pcg_df

        fine = levels[0]
        b = df_from_f64(forces_t64 * fine.free_t.astype(jnp.float64))
        if self.use_pallas:
            from fem_shell_tpu.ops.pallas_class import (
                _PadGridSpec,
                class_matvec_df_pad,
                from_pad_grid,
                pad_embed,
                pad_ring_mask,
                to_pad_grid,
            )

            pg = _PadGridSpec(fine.nyp, fine.nxp)
            ring = pad_ring_mask(pg)
            b2 = DF(to_pad_grid(pg, b.hi), to_pad_grid(pg, b.lo))

            def mv(x):
                y = class_matvec_df_pad(fine.cparts, pg, x, ring)
                return DF(pad_embed(pg, y.hi), pad_embed(pg, y.lo))

            def prec(r):
                z2 = self._vcycle_pad_carry(levels, r.hi)
                return DF(z2, jnp.zeros_like(z2))

            res = pcg_df(mv, b2, rtol=rtol, maxiter=maxiter, apply_prec=prec,
                     flexible=self.cycle == "K")
            x64 = from_pad_grid(pg, res.x.hi, fine.npad).astype(jnp.float64) + \
                from_pad_grid(pg, res.x.lo, fine.npad).astype(jnp.float64)
            return x64, res.iters, res.residual
        mv = lambda x: class_matvec_df(fine.cparts, x)  # noqa: E731

        def prec(r: "DF"):
            z32 = self._vcycle(levels, 0, r.hi)
            return DF(z32, jnp.zeros_like(z32))

        res = pcg_df(mv, b, rtol=rtol, maxiter=maxiter, apply_prec=prec,
                     flexible=self.cycle == "K")
        return df_to_f64(res.x), res.iters, res.residual

    def solve_df(self, forces, rtol: float = 1e-9, maxiter: int = 2000,
                 return_device: bool = False):
        if self.df_operator:
            # the df pair is ~2x the operator size — it MUST cross the jit
            # boundary as an ARGUMENT (closure constants are embedded into
            # the serialized HLO; remote-compile size limit)
            if not hasattr(self, "_solve_df_jit"):
                if self._cdf is not None:
                    impl, nstat = self._solve_df_impl_class, 2
                elif self.df_cycle:
                    impl, nstat = self._solve_df_impl_dfcycle, 5
                else:
                    impl, nstat = self._solve_df_impl_pair, 4
                self._solve_df_jit = jax.jit(
                    impl, static_argnums=(nstat, nstat + 1)
                )
            lvl = self._fine
            f_t = self._staged_forces(forces)
            with jax.default_matmul_precision("highest"):
                if self._cdf is not None:
                    x64, iters, res = self._solve_df_jit(
                        self.levels, f_t, rtol, maxiter
                    )
                elif self.df_cycle:
                    levels_arg = [
                        dataclasses.replace(self.levels[0], values=None)
                    ] + list(self.levels[1:])
                    pairs_arg = [None] + list(self._pairs[1:])
                    x64, iters, res = self._solve_df_jit(
                        self._fine_df, getattr(self, "_fine_sym", None),
                        levels_arg, pairs_arg, f_t, rtol, maxiter
                    )
                else:
                    levels_arg = [
                        dataclasses.replace(self.levels[0], values=None)
                    ] + list(self.levels[1:])
                    x64, iters, res = self._solve_df_jit(
                        self._fine_df, getattr(self, "_fine_sym", None),
                        levels_arg, f_t, rtol, maxiter
                    )
            self.last_iters = int(iters)
            self.last_residual = float(res)
            if return_device:
                return x64
            return np.asarray(x64).T[: lvl.nyp * lvl.nxp]
        if self.dtype == jnp.float32:
            levels32 = self.levels
            impl = self._solve_df_impl_f32
        else:
            assert self.dtype == jnp.float64
            self._ensure_f32_levels()
            levels32 = self._levels32
            impl = self._solve_df_impl
        if not hasattr(self, "_solve_df_jit"):
            self._solve_df_jit = jax.jit(impl, static_argnums=(3, 4))
        lvl = self._fine
        f = np.zeros((lvl.npad, 6))
        f[: lvl.nyp * lvl.nxp] = np.asarray(forces)
        f_t = jnp.asarray(f.T, jnp.float64)
        with jax.default_matmul_precision("highest"):
            x64, iters, res = self._solve_df_jit(self.levels[0], levels32, f_t, rtol, maxiter)
        self.last_iters = int(iters)
        self.last_residual = float(res)
        return np.asarray(x64).T[: lvl.nyp * lvl.nxp]

    # ------------------------------------------------------------------
    # exact-stencil iterative refinement (uniform structured grids).
    # The df operator's correlated eps49 representation/accumulation
    # noise is amplified by the plate's kappa ~ n^4 to ~1e-2 at the
    # 10M-element scale; refinement against the longdouble class-table
    # stencil (ops/exact_stencil.py) restores ~1e-8-class accuracy at df
    # speed. Requires df_operator mode.
    def _ensure_exact_stencil(self):
        if hasattr(self, "_tabs"):
            return
        from fem_shell_tpu.ops.exact_stencil import build_exact_stencil, class_flat_tables

        if hasattr(self, "_exact_st"):
            st = self._exact_st
        else:
            st = build_exact_stencil(
                self._fine_mesh, self.material, self.levels[0].offsets,
                grid=self.grid,
            )
        self._exact_st = st
        tfl0, tfl1, tfl2, cls_flat = class_flat_tables(st)
        self._tabs = {
            "tfl0": jnp.asarray(tfl0),
            "tfl1": jnp.asarray(tfl1),
            "tfl2": jnp.asarray(tfl2),
            "cls": jnp.asarray(cls_flat),
            "t0": jnp.asarray(st.t0),
            "t1": jnp.asarray(st.t1),
            "t2": jnp.asarray(st.t2),
            "cy": jnp.asarray(st.cy_idx),
            "cx": jnp.asarray(st.cx_idx),
        }

    def _ensure_class_pair(self):
        """Replace the assembled fine df pair with the class-table
        generated one (identical physics, class-consistent rounding): the
        refinement correction operator E = A_true - A_df then equals the
        t2 table exactly."""
        if getattr(self, "_class_pair_done", False):
            return
        self._ensure_exact_stencil()
        from fem_shell_tpu.ops.df import DF
        from fem_shell_tpu.ops.exact_stencil import class_pair_flat, class_pair_tiled

        fine = self.levels[0]
        tiled = self._fine_df.hi.ndim == 4
        r_tile = int(self._fine_df.hi.shape[2]) if tiled else 0
        npad, offsets = fine.npad, fine.offsets
        # free the assembled pair BEFORE generating: two pairs cannot
        # coexist in HBM at the 10M-element scale. EVERY reference to the
        # old hi must drop — self._fine, levels[0].values, _fine_df, AND
        # the local `fine` (each retained alias measured as a 2304^2
        # RESOURCE_EXHAUSTED: old hi 5.5 GB + new pair 11 GB > 16 GB HBM).
        self.levels[0] = dataclasses.replace(fine, values=None)
        self._fine = self.levels[0]
        self._fine_df = None
        del fine
        # cached wrappers: fresh jax.jit per call would re-compile on
        # every reassemble()+solve cycle (remote compiles are minutes)
        if not hasattr(self, "_class_pair_jits"):
            self._class_pair_jits = {
                "tiled": jax.jit(class_pair_tiled, static_argnums=(3, 4)),
                "flat": jax.jit(class_pair_flat, static_argnums=(3,)),
            }
        if tiled:
            hi, lo = self._class_pair_jits["tiled"](
                self._tabs["tfl0"], self._tabs["tfl1"], self._tabs["cls"],
                npad, r_tile,
            )
        else:
            hi, lo = self._class_pair_jits["flat"](
                self._tabs["tfl0"], self._tabs["tfl1"], self._tabs["cls"], npad
            )
        self._fine_df = DF(hi, lo)
        diag = self._diag_of(hi, offsets)
        self.levels[0] = dataclasses.replace(
            self.levels[0],
            inv_diag=jnp.where(diag != 0, 1.0 / diag, 1.0),
        )
        self._fine = self.levels[0]
        self._class_pair_done = True
        # the sym CG copy must track the swapped-in pair (else a later
        # solve_df would run CG on the stale assembled operator)
        self._build_fine_sym()

    def _inner_df_impl(self, fine_df, levels, b, rtol, maxiter, tf=False):
        """MG-preconditioned df CG with a df RHS (shared by the initial
        solve and every refinement correction solve). ``tf=True`` routes
        the CG matvec through the 4-level compensated accumulator; it is
        NOT used by the refinement loop — measured at 512^2 it leaves the
        refinement history bit-identical, because the stall is the df
        representation floor of x itself (see solve_df_refined), not
        matvec accumulation noise."""
        from fem_shell_tpu.ops.df import DF, df_stencil_matvec
        from fem_shell_tpu.solver_df import pcg_df

        if fine_df is None:  # matrix-free class-table operator
            from fem_shell_tpu.ops.class_matvec import class_matvec_df

            fine = levels[0]
            if self.use_pallas:
                # pad-layout CG (see _solve_df_impl_class); b arrives as
                # a flat DF and the result returns flat for the
                # refinement loop's residual machinery
                from fem_shell_tpu.ops.pallas_class import (
                    _PadGridSpec,
                    class_matvec_df_pad,
                    from_pad_grid,
                    pad_embed,
                    pad_ring_mask,
                    to_pad_grid,
                )

                pg = _PadGridSpec(fine.nyp, fine.nxp)
                ring = pad_ring_mask(pg)
                b2 = DF(to_pad_grid(pg, b.hi), to_pad_grid(pg, b.lo))

                def mv(x):
                    y = class_matvec_df_pad(fine.cparts, pg, x, ring)
                    return DF(pad_embed(pg, y.hi), pad_embed(pg, y.lo))

                def prec(r):
                    z2 = self._vcycle_pad_carry(levels, r.hi)
                    return DF(z2, jnp.zeros_like(z2))

                res = pcg_df(mv, b2, rtol=rtol, maxiter=maxiter,
                             apply_prec=prec,
                             flexible=self.cycle == "K")
                x_flat = DF(
                    from_pad_grid(pg, res.x.hi, fine.npad),
                    from_pad_grid(pg, res.x.lo, fine.npad),
                )
                return x_flat, res.iters, res.residual
            mv = lambda x: class_matvec_df(fine.cparts, x)  # noqa: E731

            def prec(r):
                z32 = self._vcycle(levels, 0, r.hi)
                return DF(z32, jnp.zeros_like(z32))

            res = pcg_df(mv, b, rtol=rtol, maxiter=maxiter, apply_prec=prec,
                     flexible=self.cycle == "K")
            return res.x, res.iters, res.residual

        fine = dataclasses.replace(levels[0], values=fine_df.hi)
        levels = [fine] + list(levels[1:])
        if fine_df.hi.ndim == 4:
            from fem_shell_tpu.ops.pallas_spmv_df import stencil_spmv_pallas_df

            mv = lambda x: stencil_spmv_pallas_df(fine_df.hi, fine_df.lo, x, fine.offsets, tf=tf)  # noqa: E731
        elif self.use_pallas:
            from fem_shell_tpu.ops.pallas_spmv_df import stencil_spmv_pallas_df_flat

            mv = lambda x: stencil_spmv_pallas_df_flat(fine_df, x, fine.offsets, tf=tf)  # noqa: E731
        else:
            mv = lambda x: df_stencil_matvec(fine_df, x, fine.offsets)  # noqa: E731

        def prec(r):
            z32 = self._vcycle(levels, 0, r.hi)
            return DF(z32, jnp.zeros_like(z32))

        res = pcg_df(mv, b, rtol=rtol, maxiter=maxiter, apply_prec=prec,
                     flexible=self.cycle == "K")
        return res.x, res.iters, res.residual

    def _refine_residual_impl(self, fine_df, cdf, tabs, x, b):
        """True residual r = b - A_true x and its relative norm. Pallas
        path: tf (compensated) SpMV on the class pair + plain-f32 t2
        correction; XLA path: full class-table EFT residual."""
        from fem_shell_tpu.ops.df import DF, df_add, df_dot_f64, df_neg
        from fem_shell_tpu.ops.exact_stencil import (
            class_stencil_matvec_f32,
            exact_residual_df,
        )

        fine = self.levels[0]
        nyp, nxp, npad = fine.nyp, fine.nxp, fine.npad
        offs2d = self._exact_st.offs2d
        if cdf is not None:  # matrix-free class-table operator
            from fem_shell_tpu.ops.class_matvec import class_ecorr_f32, class_matvec_df

            y = class_matvec_df(cdf, x)
            r = df_add(b, df_neg(y))
            e = class_ecorr_f32(cdf, x.hi)
            r = df_add(r, DF(-e, jnp.zeros_like(e)))
        elif self.use_pallas:
            if fine_df.hi.ndim == 4:
                from fem_shell_tpu.ops.pallas_spmv_df import stencil_spmv_pallas_df

                y = stencil_spmv_pallas_df(fine_df.hi, fine_df.lo, x, fine.offsets, tf=True)
            else:
                from fem_shell_tpu.ops.pallas_spmv_df import stencil_spmv_pallas_df_flat

                y = stencil_spmv_pallas_df_flat(fine_df, x, fine.offsets, tf=True)
            r = df_add(b, df_neg(y))
            n = nyp * nxp
            xg = x.hi[:, :n].reshape(6, nyp, nxp)
            ey = class_stencil_matvec_f32(tabs["tfl2"], tabs["cls"], offs2d, xg, nyp, nxp)
            eyf = jnp.pad(ey.reshape(6, n), ((0, 0), (0, npad - n)))
            r = df_add(r, DF(-eyf, jnp.zeros_like(eyf)))
        else:
            r = exact_residual_df(
                tabs["t0"], tabs["t1"], tabs["t2"], tabs["cy"], tabs["cx"],
                x, b, offs2d, nyp, nxp,
            )
        rn = jnp.sqrt(df_dot_f64(r, r))
        bn = jnp.sqrt(df_dot_f64(b, b))
        return r, rn / bn

    # -- device-resident force/solution staging -----------------------
    # On the remote accelerator the HOST<->DEVICE round trip of a full
    # field costs more than the entire 1024^2 device solve (measured:
    # 52 MB f64 uploads ~1.2 s, downloads 1.6-5.5 s through the tunnel,
    # vs 55 x 27 ms of CG iterations). A coupled driver's steady state
    # never needs that trip: force mapping and interface extraction are
    # jax ops, so the full fields can stay on device across timesteps
    # (the reference's analog: PETSc vectors stay in device/process
    # memory; only interface values cross, fem-shell_precice.cpp).
    def stage_forces(self, forces):
        """Upload a host [n, 6] force field once; returns the [6, npad]
        f64 device array that solve_df / solve_df_refined accept in
        place of host forces."""
        fine = self._fine
        n = fine.nyp * fine.nxp
        f = np.zeros((fine.npad, 6))
        f[:n] = np.asarray(forces)
        return jnp.asarray(f.T, jnp.float64)

    def _staged_forces(self, forces):
        """Pass through a pre-staged [6, npad] device array; build one
        from host data otherwise."""
        fine = self._fine
        if isinstance(forces, jax.Array) and forces.shape == (6, fine.npad):
            return forces
        return self.stage_forces(forces)

    def fetch_solution(self, x_t):
        """Host [n, 6] view of a device-resident [6, npad] solution."""
        fine = self._fine
        return np.asarray(x_t).T[: fine.nyp * fine.nxp]

    def solve_df_refined(
        self,
        forces,
        rtol: float = 1e-9,
        maxiter: int = 600,
        n_refine: int = 6,
        inner_rtol: float = 1e-5,
        inner_maxiter: int = 200,
        verbose: bool = False,
        return_device: bool = False,
    ):
        """df MG-CG + exact-stencil iterative refinement: drive the TRUE
        residual (vs the longdouble class-table operator) toward ``rtol``.
        The inner solves only need ``inner_rtol`` — refinement contracts
        the error per outer pass, so the total iteration count is
        comparable to one tight solve.

        Attainable TRUE-residual floor: ~kappa*eps49 of ||b|| — the df
        (two-f32) REPRESENTATION of x itself limits ||b - A x|| to
        ~||A||*eps49*||x||, measured 1.2e-5 at 512^2 (= 6.9e9 * 2^-49).
        This floor is BENIGN for forward error: at the floor x is
        pointwise-correct to eps49 relative, so the center-deflection
        goldens see only discretization error. The loop detects the
        floor via the contraction stall and stops."""
        if not self.df_operator:
            raise ValueError("solve_df_refined requires df_operator=True")
        if self._cdf is None:
            # materialized-pair path: swap in the class-consistent pair so
            # the E-correction is exact; the class-operator path needs no
            # pair at all (its matvec IS class-consistent by construction)
            self._ensure_class_pair()
        if os.environ.get("FEMSHELL_MEMDUMP"):
            import collections

            tot = collections.Counter()
            for a in jax.live_arrays():
                tot[(a.shape, str(a.dtype))] += a.nbytes
            for key, v in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
                print(f"  memdump {v / 1e9:7.3f} GB  {key}", flush=True)
            print(f"  memdump TOTAL {sum(tot.values()) / 1e9:.3f} GB", flush=True)
        from fem_shell_tpu.ops.df import df_add, df_from_f64, df_to_f64

        fine = self._fine
        n = fine.nyp * fine.nxp
        f_t = self._staged_forces(forces)
        if not hasattr(self, "_inner_df_jit"):
            # rtol/maxiter stay DYNAMIC (traced scalars): the initial
            # solve and every refinement solve share ONE compiled CG
            # program — remote compiles cost minutes each
            self._inner_df_jit = jax.jit(self._inner_df_impl)
            self._residual_jit = jax.jit(self._refine_residual_impl)
            self._b_jit = jax.jit(
                lambda ft, free: df_from_f64(ft * free.astype(jnp.float64))
            )
            self._xadd_jit = jax.jit(df_add)
            self._to64_jit = jax.jit(df_to_f64)
        levels_arg = [dataclasses.replace(self.levels[0], values=None)] + list(
            self.levels[1:]
        )
        with jax.default_matmul_precision("highest"):
            b = self._b_jit(f_t, fine.free_t)
            del f_t  # 255 MB f64 forces buffer — HBM is pair-dominated
            x, it0, _ = self._inner_df_jit(
                self._fine_df, levels_arg, b, float(inner_rtol), int(maxiter)
            )
            total = int(it0)
            hist = []
            for _ in range(n_refine):
                r, rn = self._residual_jit(
                    self._fine_df, self._cdf, getattr(self, "_tabs", None), x, b
                )
                rn = float(rn)
                hist.append(rn)
                if verbose:
                    print(f"  refine: true residual {rn:.3e} ({total} inner iters)",
                          flush=True)
                if rn < rtol or not np.isfinite(rn):
                    break
                # floor detection: a HEALTHY refinement pass with
                # inner_rtol=1e-5 contracts the true residual by orders
                # of magnitude; an improvement below 10x only happens at
                # the df representation floor (r4, 1024^2: passes went
                # 1.9e-3 -> 9.717e-4 -> 9.718e-4 — the old 0.7 factor
                # needed one extra ~25-iteration pass to notice)
                if len(hist) > 1 and rn > 0.1 * hist[-2]:
                    break  # stalled at the representation floor (benign)
                d, itk, _ = self._inner_df_jit(
                    self._fine_df, levels_arg, r, float(inner_rtol), int(inner_maxiter)
                )
                x = self._xadd_jit(x, d)
                total += int(itk)
            x64 = self._to64_jit(x)
        self.last_iters = total
        self.last_residual = hist[-1] if hist else float("nan")
        self.refine_history = hist
        if return_device:
            return x64  # [6, npad] on device; see fetch_solution
        return np.asarray(x64).T[:n]

    # ------------------------------------------------------------------
    # fused single-dispatch path (small structured meshes): ONE jitted
    # program per call re-assembles every level in emulated f64, builds
    # the full preconditioner (Jacobi diagonals, per-level omega power
    # iterations, device-resident coarse Cholesky), and runs the df CG.
    # On the remote accelerator the per-stage host round-trips dominate
    # Test-G-class wall time; this path has exactly one dispatch and one
    # fetch per rep (reference timing scope: assembly + solver,
    # doc/validation.tex:500-537).
    def _fused_impl(self, coords_list, tables_list, forces_t, rtol, maxiter, arith):
        from fem_shell_tpu.ops.df import DF, df_from_f64, df_stencil_matvec, df_to_f64
        from fem_shell_tpu.solver_df import pcg_df

        levels32 = []
        fine_df = None
        fine64 = None
        prev_v64 = None
        for l, sys_l in enumerate(self._systems):
            base = self.levels[l]
            if l > 0 and self.coarse_op == "galerkin":
                prev_lvl = self.levels[l - 1]
                v64 = stencil_rap(
                    prev_v64,
                    base.free_t,
                    prev_lvl.offsets,
                    prev_lvl.nyp,
                    prev_lvl.nxp,
                    base.npad,
                )
            else:
                v64 = sys_l._assemble_impl(coords_list[l], tables_list[l])
            diag = soa_diagonal(v64, offsets=base.offsets)
            prev_v64 = v64
            if l == 0:
                fine64 = v64
                if arith == "df":
                    fine_df = df_from_f64(v64)
            lvl = dataclasses.replace(
                base,
                values=v64.astype(jnp.float32),
                free_t=base.free_t.astype(jnp.float32),
                inv_diag=jnp.where(diag != 0, 1.0 / diag, 1.0).astype(jnp.float32),
            )
            if l == self.n_levels - 1:
                n_real = lvl.nyp * lvl.nxp
                dense = _densify(dataclasses.replace(lvl, values=v64))
                d = jnp.diagonal(dense)
                s = jnp.where(d > 0, 1.0 / jnp.sqrt(d), 1.0)
                scaled = (dense * s[None, :] * s[:, None]).astype(jnp.float32)
                lvl = dataclasses.replace(
                    lvl,
                    chol=jnp.linalg.cholesky(scaled),
                    chol_scale=s.astype(jnp.float32),
                )
            else:
                lam = self._power_lambda(lvl)
                lvl = dataclasses.replace(
                    lvl, omega=jnp.clip(4.0 / (3.0 * lam), 0.2, 1.0), lam=lam
                )
            levels32.append(lvl)

        fine = levels32[0]
        b64 = forces_t * self.levels[0].free_t
        if arith == "df":
            b = df_from_f64(b64)
            mv = lambda x: df_stencil_matvec(fine_df, x, fine.offsets)  # noqa: E731

            def prec(r):
                z32 = self._vcycle(levels32, 0, r.hi)
                return DF(z32, jnp.zeros_like(z32))

            res = pcg_df(mv, b, rtol=rtol, maxiter=maxiter, apply_prec=prec,
                     flexible=self.cycle == "K")
            return df_to_f64(res.x), res.iters, res.residual
        # f64 CG fallback: platforms whose compiler breaks the barrier-free
        # EFT chains (CPU LLVM FMA contraction) still exercise the whole
        # fused program — assembly, omega, coarse Cholesky, V-cycle.
        mv64 = lambda x: soa_matvec(fine64, x, offsets=fine.offsets)  # noqa: E731

        def prec64(r):
            return self._vcycle(levels32, 0, r.astype(jnp.float32)).astype(jnp.float64)

        res = pcg(mv64, b64, rtol=rtol, maxiter=maxiter, apply_prec=prec64,
                  flexible=self.cycle == "K")
        return res.x, res.iters, res.residual

    def _ensure_fused(self, arith: str):
        if getattr(self, "_fused_ready", None) == arith:
            return
        import functools

        if self.dtype != jnp.float64:
            raise ValueError("solve_fused assembles levels in f64: construct "
                             "MultigridShellSystem(..., dtype=jnp.float64, assemble=False)")
        self._fused_coords = [s.coords for s in self._systems]
        self._fused_tables = [s._tables for s in self._systems]
        self._fused_jit = jax.jit(
            functools.partial(self._fused_impl, arith=arith), static_argnums=(4,)
        )
        self._fused_ready = arith

    def solve_fused(self, forces, rtol: float = 1e-9, maxiter: int = 400,
                    arith: str = "df"):
        """Assembly + preconditioner setup + solve in a single jitted
        dispatch. ``arith='df'`` (TPU) runs the double-float CG over the
        df pair of the f64-assembled fine operator; ``arith='f64'`` runs
        plain f64 CG (CPU-safe). Returns displacements [n_nodes, 6]."""
        self._ensure_fused(arith)
        lvl = self._fine
        f = np.zeros((lvl.npad, 6))
        f[: lvl.nyp * lvl.nxp] = np.asarray(forces)
        f_t = jnp.asarray(f.T, jnp.float64)
        with jax.default_matmul_precision("highest"):
            x64, iters, res = self._fused_jit(
                self._fused_coords, self._fused_tables, f_t, rtol, maxiter
            )
        self.last_iters = int(iters)
        self.last_residual = float(res)
        return np.asarray(x64).T[: lvl.nyp * lvl.nxp]


def _densify(lvl: _Level) -> jnp.ndarray:
    """Dense matrix over the REAL nodes of a (small) stencil level
    (padded rows are decoupled identity and stay out of the dense solve).
    Accepts [36, K, Npad] or flat [36K, Npad] values."""
    n = lvl.nyp * lvl.nxp
    k = len(lvl.offsets)
    v = lvl.values.reshape(6, 6, k, lvl.npad)[:, :, :, :n]
    dense = jnp.zeros((6, n, 6, n), lvl.values.dtype)
    cols = jnp.arange(n)
    for s, off in enumerate(lvl.offsets):
        tgt = cols + off
        ok = (tgt >= 0) & (tgt < n)
        tgt_c = jnp.clip(tgt, 0, n - 1)
        block = jnp.where(ok[None, None, :], v[:, :, s, :], 0.0)  # [6,6,n]
        dense = dense.at[:, cols, :, tgt_c].add(jnp.transpose(block, (2, 0, 1)))
    # SoA vectors flatten component-major ([6, n].reshape(-1) = a*n + i),
    # so [6, n, 6, n] reshapes directly into the matching matrix layout
    return dense.reshape(6 * n, 6 * n)
