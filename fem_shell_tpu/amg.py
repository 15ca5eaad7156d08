"""Smoothed-aggregation AMG over the 6x6 block structure — the
mesh-independent preconditioner for UNSTRUCTURED shell meshes.

The geometric multigrid (mg.py) needs a detected row-major grid; libMesh
+PETSc handle arbitrary meshes as the default
(/root/reference/doc/implementation.tex:11,463-486). This module closes
that gap the algebraic way:

- setup (host, numpy): greedy node aggregation on the block-sparsity
  graph; tentative prolongator from the per-aggregate QR of the rigid-
  body-mode nullspace (6 candidates: 3 translations + 3 rotations, the
  shell analog of elasticity SA); Jacobi-smoothed P; Galerkin RAP by
  sorted key reduction (chunked — no scipy dependency);
- solve (device, jit): V-cycle with damped block-Jacobi(6x6) smoothing,
  gather-based P / scatter-based P^T, dense-Cholesky coarsest level, as
  an SPD preconditioner inside CG.

Usage: ``AMGShellSystem(mesh, material).solve(forces)`` for any mesh the
gather-mode SoA assembler accepts (ops/soa.py general mode).
"""
from __future__ import annotations

import dataclasses
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fem_shell_tpu.materials import Material
from fem_shell_tpu.mesh import ShellMesh
from fem_shell_tpu.solver import CGResult, pcg


# ----------------------------------------------------------------------
# host-side setup
# ----------------------------------------------------------------------


def _block_graph(adj, n):
    """Neighbor lists (excluding self) from the ELL adjacency [n, K]."""
    nbrs = []
    for i in range(n):
        row = adj[i]
        nbrs.append(row[(row != i) & (row < n)])
    return nbrs


def _strong_graph(lvl: "_HostLevel", theta: float):
    """Strength-filtered neighbor lists: keep edge (i, j) when
    ||A_ij||_F >= theta * sqrt(||A_ii||_F ||A_jj||_F)."""
    n = lvl.n
    fro = np.sqrt((lvl.blocks**2).sum(axis=(2, 3)))  # [n, K]
    self_slot = np.argmax(lvl.adj == np.arange(n)[:, None], axis=1)
    dia = fro[np.arange(n), self_slot]
    dia = np.where(dia > 0, dia, 1.0)
    nbrs = []
    for i in range(n):
        row = lvl.adj[i]
        ok = (row != i) & (row < n)
        j = row[ok]
        s = fro[i, ok] >= theta * np.sqrt(dia[i] * dia[j])
        nbrs.append(j[s])
    return nbrs


def aggregate(adj, n, nbrs=None) -> np.ndarray:
    """Greedy root aggregation (standard SA): pass 1 seeds aggregates at
    nodes whose neighborhood is untouched; pass 2 attaches leftovers to
    an adjacent aggregate; pass 3 makes singletons."""
    agg = np.full(n, -1, np.int64)
    n_agg = 0
    if nbrs is None:
        nbrs = _block_graph(adj, n)
    for i in range(n):
        if agg[i] < 0 and (agg[nbrs[i]] < 0).all():
            agg[i] = n_agg
            agg[nbrs[i]] = n_agg
            n_agg += 1
    for i in range(n):
        if agg[i] < 0:
            owned = agg[nbrs[i]]
            owned = owned[owned >= 0]
            if len(owned):
                agg[i] = owned[0]
    for i in range(n):
        if agg[i] < 0:
            agg[i] = n_agg
            n_agg += 1
    return agg, n_agg


def _rigid_modes(coords) -> np.ndarray:
    """[n, 6, 6] rigid-body nullspace candidates (about the origin):
    columns = (Tx, Ty, Tz, Rx, Ry, Rz); rows = (u, v, w, tx, ty, tz)."""
    n = len(coords)
    b = np.zeros((n, 6, 6))
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    for c in range(3):
        b[:, c, c] = 1.0  # translations
        b[:, 3 + c, 3 + c] = 1.0  # rotations map to rotations
    # u += Ry*z - Rz*y ; v += Rz*x - Rx*z ; w += Rx*y - Ry*x
    b[:, 0, 4] = z
    b[:, 0, 5] = -y
    b[:, 1, 5] = x
    b[:, 1, 3] = -z
    b[:, 2, 3] = y
    b[:, 2, 4] = -x
    return b


def _tentative(nullspace, agg, n_agg):
    """Per-aggregate QR of the stacked nullspace rows.

    Returns (p0_blocks [n, 6, 6], coarse nullspace [n_agg, 6, 6]):
    P0[i] maps aggregate-coarse dofs -> node i dofs; rank-deficient
    aggregates (rare tiny ones) get the economy Q with zeroed defect
    columns."""
    n = len(nullspace)
    order = np.argsort(agg, kind="stable")
    counts = np.bincount(agg, minlength=n_agg)
    p0 = np.zeros((n, 6, 6))
    nc = np.zeros((n_agg, 6, 6))
    pos = 0
    for a in range(n_agg):
        c = counts[a]
        idx = order[pos : pos + c]
        pos += c
        stack = nullspace[idx].reshape(c * 6, 6)
        q, r = np.linalg.qr(stack)
        # fix signs for determinism (diagonal of R >= 0)
        s = np.sign(np.diag(r))
        s[s == 0] = 1.0
        q = q * s[None, :]
        r = r * s[:, None]
        p0[idx] = q.reshape(c, 6, 6)
        nc[a] = r
    return p0, nc


@dataclasses.dataclass
class _HostLevel:
    adj: np.ndarray  # [n, K] block column ids (self included)
    blocks: np.ndarray  # [n, K, 6, 6]
    n: int


def _ell_matvec(lvl: _HostLevel, x):
    return np.einsum("nkab,nkb->na", lvl.blocks, x[lvl.adj])


def _lam_max(lvl: _HostLevel, inv_diag, iters=12, seed=7):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((lvl.n, 6))
    v /= np.linalg.norm(v)
    lam = 1.0
    for _ in range(iters):
        w = np.einsum("nab,nb->na", inv_diag, _ell_matvec(lvl, v))
        lam = np.linalg.norm(w)
        v = w / max(lam, 1e-30)
    return lam


def _block_inv_diag(lvl: _HostLevel):
    self_slot = np.argmax(lvl.adj == np.arange(lvl.n)[:, None], axis=1)
    d = lvl.blocks[np.arange(lvl.n), self_slot]
    # regularize empty/constrained blocks
    bad = np.abs(np.diagonal(d, axis1=1, axis2=2)).max(axis=1) == 0
    d[bad] = np.eye(6)
    return np.linalg.inv(d)


def _smooth_p(lvl: _HostLevel, p0, agg, omega, inv_diag):
    """P = (I - omega D^-1 A) P0 as block COO (rows -> per-row lists)."""
    n = lvl.n
    k = lvl.adj.shape[1]
    # candidate coarse columns per row: own agg + neighbor aggs
    cols = agg[lvl.adj]  # [n, K]
    dinva = np.einsum("nab,nkbc->nkac", inv_diag, lvl.blocks)
    contrib = -omega * np.einsum("nkab,nkbc->nkac", dinva, p0[lvl.adj])
    # add the identity term at each row's self slot: += p0[i]
    self_mask = lvl.adj == np.arange(n)[:, None]
    self_slot = np.argmax(self_mask, axis=1)
    has_self = self_mask.any(axis=1)
    rows_s = np.nonzero(has_self)[0]
    contrib[rows_s, self_slot[rows_s]] += p0[rows_s]
    # dedupe columns per row
    order = np.argsort(cols, axis=1, kind="stable")
    cols_s = np.take_along_axis(cols, order, axis=1)
    contrib_s = np.take_along_axis(contrib, order[..., None, None], axis=1)
    new_col = np.ones_like(cols_s, bool)
    new_col[:, 1:] = cols_s[:, 1:] != cols_s[:, :-1]
    slot = np.cumsum(new_col, axis=1) - 1
    pk = int(slot.max()) + 1
    pcol = np.zeros((n, pk), np.int64)
    pblk = np.zeros((n, pk, 6, 6))
    rows = np.repeat(np.arange(n), k)
    np.maximum.at(pcol, (rows, slot.reshape(-1)), cols_s.reshape(-1))
    np.add.at(pblk, (rows, slot.reshape(-1)), contrib_s.reshape(-1, 6, 6))
    valid = np.zeros((n, pk), bool)
    valid[rows, slot.reshape(-1)] = True
    pcol[~valid] = 0  # padded entries carry zero blocks already
    return pcol, pblk


def _rap(lvl: _HostLevel, pcol, pblk, n_agg, chunk=65536):
    """C = P^T A P by chunked sorted-key reduction (block COO).

    Per chunk: AP's K*PK candidate coarse columns are deduped PER ROW
    first (sorted-segment reduction, the _smooth_p trick) so the outer
    P^T product and the key reduction run over the ~Q unique columns
    (Q ~ 9-16) instead of all K*PK ~ 36-72 candidates — the triple
    product was the setup's dominant cost (r5 profile: ~42% at 56k
    DOF, einsum-bound). Broadcast matmul replaces np.einsum for the
    6x6 block products (BLAS beats the naive einsum loop ~1.6x)."""
    n, k = lvl.adj.shape
    pk = pcol.shape[1]
    keys_all = []
    vals_all = []
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        C = e - s
        # AP over the chunk, then per-row column dedupe
        j = lvl.adj[s:e]  # [C, K]
        ap_col = pcol[j].reshape(C, k * pk)
        ap_blk = np.matmul(lvl.blocks[s:e][:, :, None], pblk[j]).reshape(
            C, k * pk, 6, 6
        )
        order = np.argsort(ap_col, axis=1, kind="stable")
        col_s = np.take_along_axis(ap_col, order, axis=1)
        blk_s = np.take_along_axis(ap_blk, order[..., None, None], axis=1)
        new = np.ones_like(col_s, bool)
        new[:, 1:] = col_s[:, 1:] != col_s[:, :-1]
        slot = np.cumsum(new, axis=1) - 1
        q = int(slot.max()) + 1
        apc = np.zeros((C, q), np.int64)
        apb = np.zeros((C, q, 6, 6))
        rows = np.repeat(np.arange(C), k * pk)
        np.maximum.at(apc, (rows, slot.reshape(-1)), col_s.reshape(-1))
        np.add.at(apb, (rows, slot.reshape(-1)), blk_s.reshape(-1, 6, 6))
        # unused trailing slots (rows with < q unique columns) carry
        # zero blocks at column 0 — same as the padded-P convention,
        # pruned by the magnitude filter below
        # P^T(i) x AP(i): [C, PK, 6, 6]^T @ [C, Q, 6, 6] -> [C, PK, Q]
        left = np.matmul(
            np.swapaxes(pblk[s:e], -1, -2)[:, :, None], apb[:, None]
        )
        kI = np.broadcast_to(pcol[s:e][:, :, None], (C, pk, q))
        kJ = np.broadcast_to(apc[:, None, :], (C, pk, q))
        key = (kI.astype(np.int64) * n_agg + kJ).reshape(-1)
        val = left.reshape(-1, 6, 6)
        uk, inv = np.unique(key, return_inverse=True)
        red = np.zeros((len(uk), 6, 6))
        np.add.at(red, inv, val)
        keys_all.append(uk)
        vals_all.append(red)
    key = np.concatenate(keys_all)
    val = np.concatenate(vals_all)
    uk, inv = np.unique(key, return_inverse=True)
    red = np.zeros((len(uk), 6, 6))
    np.add.at(red, inv, val)
    # prune numerically-zero couplings: padded P slots (zero blocks at
    # column 0) otherwise give every aggregate a fake edge to aggregate
    # 0, whose neighborhood then swallows the whole next aggregation
    mag = np.abs(red).max(axis=(1, 2))
    keep = mag > 1e-13 * max(mag.max(), 1e-300)
    uk, red = uk[keep], red[keep]
    ci = (uk // n_agg).astype(np.int64)
    cj = (uk % n_agg).astype(np.int64)
    # to block ELL
    counts = np.bincount(ci, minlength=n_agg)
    kc = int(counts.max())
    adj_c = np.tile(np.arange(n_agg)[:, None], (1, kc))
    blk_c = np.zeros((n_agg, kc, 6, 6))
    slot = np.zeros(n_agg, np.int64)
    order = np.argsort(ci, kind="stable")
    for t in order:
        i = ci[t]
        adj_c[i, slot[i]] = cj[t]
        blk_c[i, slot[i]] = red[t]
        slot[i] += 1
    return _HostLevel(adj_c, blk_c, n_agg)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class _DeviceLevel:
    """Registered as a pytree (arrays = children, omega/n_coarse = aux)
    so the level stack can cross the jit boundary as an ARGUMENT — as
    closure constants the hierarchy is embedded into the serialized HLO,
    which blows the remote-compile request size limit at ~1M DOF
    (HTTP 413, r3 AMG scale probe)."""

    adj: jnp.ndarray  # [n, K]
    blocks: jnp.ndarray  # [n, K, 6, 6]
    inv_diag: jnp.ndarray  # [n, 6, 6] block-Jacobi inverse
    omega: float
    pcol: Optional[jnp.ndarray] = None  # [n, PK] (to the NEXT level)
    pblk: Optional[jnp.ndarray] = None  # [n, PK, 6, 6]
    n_coarse: int = 0
    chol: Optional[jnp.ndarray] = None  # coarsest
    chol_scale: Optional[jnp.ndarray] = None

    _CHILDREN = ("adj", "blocks", "inv_diag", "pcol", "pblk", "chol",
                 "chol_scale")

    def tree_flatten(self):
        return (
            tuple(getattr(self, f) for f in self._CHILDREN),
            (self.omega, self.n_coarse),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        kw = dict(zip(cls._CHILDREN, children))
        return cls(omega=aux[0], n_coarse=aux[1], **kw)


class AMGShellSystem:
    """Shell solver with a smoothed-aggregation AMG preconditioner
    (arbitrary meshes; 6-dof block aggregation with rigid-mode
    tentative prolongation)."""

    def __init__(
        self,
        mesh: ShellMesh,
        material: Material,
        dtype=jnp.float64,
        coarse_max: int = 200,
        max_levels: int = 12,
        nu_smooth: int = 3,
        omega_sa: float = 4.0 / 3.0,
        strength: float = 0.06,
        cycle: str = "W",
        reorder: Optional[str] = "rcm",
        df: bool = False,
        verbose_setup: bool = False,
    ):
        """``df=True`` builds the hierarchy on the symmetrically
        diagonal-scaled operator (drilling dofs are 1000x softer — the
        same equilibration large.py's df solves need to keep compensated
        summation at the ~1e-12 level) and keeps a two-float32 split of
        the scaled fine operator for :meth:`solve_df` — the df outer CG
        preconditioned by this (f32-recommended) AMG cycle. Pass
        dtype=jnp.float32 with it for the TPU production configuration."""
        from fem_shell_tpu.large import LargeShellSystem

        self.mesh = mesh
        self.material = material
        self.dtype = dtype
        self.nu_smooth = nu_smooth
        if cycle not in ("V", "W"):
            raise ValueError(f"unknown cycle {cycle!r}")
        # W-cycle: visit each coarse level twice — the SA hierarchy's
        # coarse-grid correction is weaker than geometric MG's, and the
        # extra coarse sweeps (cheap: levels shrink ~9x) flatten the
        # iteration growth with depth
        self.cycle = cycle
        # per-stage setup wall times (seconds): the host-bound setup is
        # the documented cost of the unstructured path (AMG_SCALE.json
        # setup_s) — this breakdown is the timing discipline for it.
        # Totals accumulate over levels; "upload" is the device transfer
        # (dominated by the tunnel bandwidth on the remote platform).
        self.setup_timings = {
            k: 0.0
            for k in ("assemble", "strong", "aggregate", "tentative",
                      "smooth_p", "rap", "upload", "total")
        }
        _t_all = time.perf_counter()
        _t0 = time.perf_counter()
        # fine operator via the gather-mode assembler (k_max=1 forces the
        # general path even for stencil-addressable meshes)
        self.sys = LargeShellSystem(mesh, material, dtype=jnp.float64, reorder=reorder)
        # fine f64 assembly on the HOST CPU backend when the default
        # device is an accelerator: the hierarchy build consumes vals as
        # host numpy anyway, and the full-height f64 gather-mode scatter
        # OOMs the remote TPU's HBM at ~1M DOF (r3: 16.08G of 15.75G) —
        # setup is the documented host-bound stage of AMG, the df SOLVE
        # stays on the accelerator
        try:
            cpu0 = jax.devices("cpu")[0]
        except Exception:
            cpu0 = None
        if cpu0 is not None and jax.devices()[0].platform != "cpu":
            with jax.default_device(cpu0):
                vals = np.asarray(self.sys.assemble(), np.float64)
        else:
            vals = np.asarray(self.sys.assemble(), np.float64)
        self.setup_timings["assemble"] = time.perf_counter() - _t0
        pat = self.sys.pattern
        n = mesh.n_nodes
        if pat.offsets is not None:
            # stencil mode: reconstruct the ELL adjacency from offsets
            offs = np.asarray(pat.offsets)
            adj = (np.arange(pat.n_pad)[:, None] + offs[None, :]).clip(0, pat.n_pad - 1)
            k = len(offs)
            blocks = np.transpose(
                vals.reshape(6, 6, k, pat.n_pad), (3, 2, 0, 1)
            )  # [Npad, K, 6, 6]
            # zero out-of-range (clipped) couplings
            raw = np.arange(pat.n_pad)[:, None] + offs[None, :]
            blocks[(raw < 0) | (raw >= pat.n_pad)] = 0.0
        else:
            adj = np.asarray(pat.adj_t.T if hasattr(pat.adj_t, "T") else pat.adj_t)
            adj = np.asarray(self.sys.adj_t).T  # [Npad, K]
            k = adj.shape[1]
            blocks = np.transpose(
                vals.reshape(6, 6, k, pat.n_pad), (3, 2, 0, 1)
            )
        lvl0 = _HostLevel(adj[:n].astype(np.int64).clip(0, n - 1), blocks[:n], n)

        coords = np.asarray(self.sys.mesh.coords, np.float64)  # post-reorder
        nullspace = _rigid_modes(coords)

        self._s_df = None
        self._fine_df = None
        if df:
            # per-DOF diagonal (self-block) of the BC-applied operator;
            # constrained rows carry the unit diagonal -> s = 1 there
            self_mask = lvl0.adj == np.arange(n)[:, None]
            dblk = (lvl0.blocks * self_mask[:, :, None, None]).sum(1)
            d = np.einsum("naa->na", dblk).copy()
            d[d <= 0] = 1.0
            s = 1.0 / np.sqrt(d)  # [n, 6]
            lvl0.blocks = lvl0.blocks * s[:, None, :, None] * s[lvl0.adj][:, :, None, :]
            # nullspace of S A S is S^-1 B
            nullspace = nullspace / s[:, :, None]
            self._s_df = s
            from fem_shell_tpu.ops.df import DF as _DF

            hi = lvl0.blocks.astype(np.float32)
            lo = (lvl0.blocks - hi.astype(np.float64)).astype(np.float32)
            self._fine_df = _DF(jnp.asarray(hi), jnp.asarray(lo))
            self._adj0 = jnp.asarray(lvl0.adj)
            # df representation error of the scaled operator (f32 keeps
            # it to ~2^-73 |A|) — drives solve_df_refined's true residual
            e32 = (lvl0.blocks - hi.astype(np.float64)
                   - lo.astype(np.float64)).astype(np.float32)
            self._e32 = jnp.asarray(e32)

        self.h_levels: List[_HostLevel] = [lvl0]
        self.transfers = []  # (pcol, pblk, n_coarse)
        lvl = lvl0
        tm = self.setup_timings

        def _mark(key, t0):
            t1 = time.perf_counter()
            tm[key] += t1 - t0
            return t1

        while lvl.n > coarse_max and len(self.h_levels) < max_levels:
            _t0 = time.perf_counter()
            nbrs = _strong_graph(lvl, strength) if strength > 0 else None
            _t0 = _mark("strong", _t0)
            agg, n_agg = aggregate(lvl.adj, lvl.n, nbrs)
            _t0 = _mark("aggregate", _t0)
            if n_agg >= lvl.n:  # no coarsening progress
                break
            p0, nullspace = _tentative(nullspace, agg, n_agg)
            _t0 = _mark("tentative", _t0)
            inv_diag = _block_inv_diag(lvl)
            lam = _lam_max(lvl, inv_diag)
            pcol, pblk = _smooth_p(lvl, p0, agg, omega_sa / max(lam, 1e-30), inv_diag)
            _t0 = _mark("smooth_p", _t0)
            nxt = _rap(lvl, pcol, pblk, n_agg)
            _mark("rap", _t0)
            self.transfers.append((pcol, pblk, n_agg))
            self.h_levels.append(nxt)
            lvl = nxt

        # device levels
        _t0 = time.perf_counter()
        self.levels: List[_DeviceLevel] = []
        for li, hl in enumerate(self.h_levels):
            inv_d = _block_inv_diag(hl)
            lam = _lam_max(hl, inv_d)
            dl = _DeviceLevel(
                adj=jnp.asarray(hl.adj),
                blocks=jnp.asarray(hl.blocks, dtype),
                inv_diag=jnp.asarray(inv_d, dtype),
                omega=float(4.0 / (3.0 * max(lam, 1e-30))),
            )
            if li < len(self.transfers):
                pcol, pblk, n_agg = self.transfers[li]
                dl.pcol = jnp.asarray(pcol)
                dl.pblk = jnp.asarray(pblk, dtype)
                dl.n_coarse = n_agg
            else:
                dense = np.zeros((hl.n * 6, hl.n * 6))
                for i in range(hl.n):
                    for s in range(hl.adj.shape[1]):
                        j = hl.adj[i, s]
                        dense[6 * i : 6 * i + 6, 6 * j : 6 * j + 6] += hl.blocks[i, s]
                d = np.diagonal(dense).copy()
                d[d <= 0] = 1.0
                sc = 1.0 / np.sqrt(d)
                scaled = dense * sc[:, None] * sc[None, :]
                # exact symmetrization guard + relative shift before
                # Cholesky. The factor stays f64 REGARDLESS of the cycle
                # dtype: curved shells can leave the SA coarsest
                # near-singular (Scordelis-Lo roof: cond 5.1e14 — the
                # free straight edges leave near-rigid modes weakly
                # constrained), so an f32 factor is pure noise and
                # poisons every cycle (r4: f32 W-cycle NaN at iteration
                # 11, V diverged to residual 3.5e3 where the f64 cycle
                # converges in 47). Two f64 triangular solves of
                # <= 6*coarse_max dofs are negligible even emulated on
                # TPU; _vcycle casts the correction back to the cycle
                # dtype.
                scaled = 0.5 * (scaled + scaled.T) + 1e-10 * np.eye(len(d))
                dl.chol = jnp.asarray(np.linalg.cholesky(scaled), jnp.float64)
                dl.chol_scale = jnp.asarray(sc, jnp.float64)
            self.levels.append(dl)
        jax.block_until_ready([dl.blocks for dl in self.levels])
        tm["upload"] = time.perf_counter() - _t0
        tm["total"] = time.perf_counter() - _t_all
        if verbose_setup:
            print("# amg setup timings: "
                  + " ".join(f"{k}={v:.2f}s" for k, v in tm.items()),
                  flush=True)

        self._solve_jit = jax.jit(self._solve_impl, static_argnums=(2, 3))

    # ------------------------------------------------------------------
    # device-side pieces
    # ------------------------------------------------------------------
    def _mv(self, dl: _DeviceLevel, x):
        return jnp.einsum("nkab,nkb->na", dl.blocks, x[dl.adj])

    def _smooth(self, dl: _DeviceLevel, x, b, sweeps):
        for _ in range(sweeps):
            r = b - self._mv(dl, x)
            x = x + dl.omega * jnp.einsum("nab,nb->na", dl.inv_diag, r)
        return x

    def _vcycle(self, levels, li, b):
        dl = levels[li]
        if dl.chol is not None:
            # f64 coarsest solve (see the factor's comment), cast back
            rhs = (dl.chol_scale * b.reshape(-1).astype(dl.chol.dtype))[:, None]
            y = jax.lax.linalg.triangular_solve(
                dl.chol, rhs, left_side=True, lower=True, transpose_a=False
            )
            z = jax.lax.linalg.triangular_solve(
                dl.chol, y, left_side=True, lower=True, transpose_a=True
            )
            return (dl.chol_scale * z[:, 0]).astype(b.dtype).reshape(b.shape)
        x = jnp.zeros_like(b)
        x = self._smooth(dl, x, b, self.nu_smooth)
        r = b - self._mv(dl, x)
        # restrict: r_c = P^T r
        contrib = jnp.einsum("npab,na->npb", dl.pblk, r)
        rc = jnp.zeros((dl.n_coarse, 6), b.dtype)
        rc = rc.at[dl.pcol.reshape(-1)].add(contrib.reshape(-1, 6))
        ec = self._vcycle(levels, li + 1, rc)
        if self.cycle == "W" and levels[li + 1].chol is None:
            # second coarse visit on the updated residual
            rc2 = rc - self._mv(levels[li + 1], ec)
            ec = ec + self._vcycle(levels, li + 1, rc2)
        # prolong: e = P e_c
        e = jnp.einsum("npab,npb->na", dl.pblk, ec[dl.pcol])
        x = x + e
        return self._smooth(dl, x, b, self.nu_smooth)

    def _solve_impl(self, levels, b, rtol, maxiter):
        dl = levels[0]
        mv = lambda x: self._mv(dl, x)  # noqa: E731
        prec = lambda r: self._vcycle(levels, 0, r)  # noqa: E731
        return pcg(mv, b, rtol=rtol, maxiter=maxiter, apply_prec=prec)

    # ------------------------------------------------------------------
    # df production path: two-f32 outer CG on the scaled operator,
    # AMG cycle (in self.dtype, f32 recommended) as the preconditioner
    # ------------------------------------------------------------------
    def _mv_df(self, vals, adj, x):
        from fem_shell_tpu.ops.df import DF, df_add, two_prod

        k = adj.shape[1]
        xg_h = x.hi[adj]  # [n, K, 6]
        xg_l = x.lo[adj]
        acc = DF(jnp.zeros_like(x.hi), jnp.zeros_like(x.lo))
        for s in range(k):
            for b in range(6):
                vh = vals.hi[:, s, :, b]  # [n, 6]
                vl = vals.lo[:, s, :, b]
                xh = xg_h[:, s, b][:, None]
                xl = xg_l[:, s, b][:, None]
                p, pe = two_prod(vh, xh)
                pe = pe + (vh * xl + vl * xh)
                acc = df_add(acc, DF(p, pe))
        return acc

    def _solve_df_impl(self, fine_df, adj, levels, b, rtol, maxiter):
        from fem_shell_tpu.ops.df import DF
        from fem_shell_tpu.solver_df import pcg_df

        def prec(r):
            z = self._vcycle(levels, 0, r.hi.astype(self.dtype))
            return DF(z.astype(jnp.float32), jnp.zeros_like(r.lo))

        mv = lambda x: self._mv_df(fine_df, adj, x)  # noqa: E731
        return pcg_df(mv, b, rtol=rtol, maxiter=maxiter,
                      apply_prec=prec)

    def solve_df(self, forces, rtol: float = 1e-10, maxiter: int = 2000):
        """df (two-float32) solve of the scaled system with the AMG
        preconditioner — f64-class accuracy with mesh-independent-ish
        iterations on arbitrary meshes (construct with df=True)."""
        from fem_shell_tpu.ops.df import df_from_f64, df_to_f64

        if self._fine_df is None:
            raise ValueError("construct AMGShellSystem with df=True for solve_df")
        if not hasattr(self, "_solve_df_jit"):
            self._solve_df_jit = jax.jit(self._solve_df_impl, static_argnums=(5,))
        n = self.mesh.n_nodes
        f = self.sys._forces_in(forces)[:n]
        free = np.asarray(self.sys.free_t.T[:n], bool)
        b64 = jnp.asarray(f * free * self._s_df, jnp.float64)
        with jax.default_matmul_precision("highest"):
            res = self._solve_df_jit(self._fine_df, self._adj0, self.levels, df_from_f64(b64), rtol, maxiter)
        self.last_iters = int(res.iters)
        self.last_residual = float(res.residual)
        x64 = np.asarray(df_to_f64(res.x)) * self._s_df
        return self.sys._solution_out(x64)

    # ------------------------------------------------------------------
    def _resid_df_impl(self, fine_df, adj, e32, x, b):
        """True residual r = b - A_df x - E x against the f64 scaled
        operator (E-corrected, see large.solve_df_refined)."""
        from fem_shell_tpu.ops.df import DF, df_add, df_dot_f64, df_neg

        y = self._mv_df(fine_df, adj, x)
        r = df_add(b, df_neg(y))
        ey = jnp.einsum("nkab,nkb->na", e32, x.hi[adj])
        r = df_add(r, DF(-ey, jnp.zeros_like(ey)))
        rn = jnp.sqrt(df_dot_f64(r, r))
        bn = jnp.sqrt(df_dot_f64(b, b))
        return r, rn / bn

    def solve_df_refined(
        self,
        forces,
        rtol: float = 1e-9,
        n_refine: int = 6,
        inner_rtol: float = 1e-5,
        inner_maxiter: int = 2000,
        jit_residual: bool = True,
        verbose: bool = False,
    ):
        """AMG-df + E-corrected iterative refinement: f64-class accuracy
        at AMG-preconditioned iteration counts on ARBITRARY meshes —
        the unstructured composition of mg.solve_df_refined.
        ``jit_residual=False`` for CPU tests (jit FMA-contracts EFTs)."""
        from fem_shell_tpu.ops.df import df_add, df_from_f64, df_to_f64

        if self._fine_df is None:
            raise ValueError("construct AMGShellSystem with df=True")
        if not hasattr(self, "_solve_df_jit"):
            self._solve_df_jit = jax.jit(self._solve_df_impl, static_argnums=(5,))
        if jit_residual:
            if not hasattr(self, "_resid_df_jit"):
                self._resid_df_jit = jax.jit(self._resid_df_impl)
            res_fn = self._resid_df_jit
        else:
            res_fn = self._resid_df_impl

        n = self.mesh.n_nodes
        f = self.sys._forces_in(forces)[:n]
        free = np.asarray(self.sys.free_t.T[:n], bool)
        b = df_from_f64(jnp.asarray(f * free * self._s_df, jnp.float64))
        with jax.default_matmul_precision("highest"):
            res = self._solve_df_jit(self._fine_df, self._adj0, self.levels, b, float(inner_rtol), int(inner_maxiter))
            x, total = res.x, int(res.iters)
            hist = []
            for _ in range(n_refine):
                r, rn = res_fn(self._fine_df, self._adj0, self._e32, x, b)
                rn = float(rn)
                hist.append(rn)
                if verbose:
                    print(f"  refine[amg]: true residual {rn:.3e} "
                          f"({total} inner iters)", flush=True)
                if rn < rtol or not np.isfinite(rn):
                    break
                # floor detection: a healthy refinement pass with
                # inner_rtol=1e-5 contracts the true residual by orders
                # of magnitude; <10x improvement only happens at the df
                # representation floor (see mg.solve_df_refined, r4)
                if len(hist) > 1 and rn > 0.1 * hist[-2]:
                    break  # representation floor (benign)
                dres = self._solve_df_jit(self._fine_df, self._adj0, self.levels, r, float(inner_rtol), int(inner_maxiter))
                x = df_add(x, dres.x)
                total += int(dres.iters)
            x64 = np.asarray(df_to_f64(x)) * self._s_df
        self.last_iters = total
        self.last_residual = hist[-1] if hist else float("nan")
        self.refine_history = hist
        return self.sys._solution_out(x64)

    # ------------------------------------------------------------------
    def solve(self, forces, rtol: float = 1e-10, maxiter: int = 1000):
        f = self.sys._forces_in(forces)  # applies reorder + free mask shape
        n = self.mesh.n_nodes
        b = jnp.asarray(f[:n], self.dtype)
        free = np.asarray(self.sys.free_t.T[:n], bool)
        b = b * jnp.asarray(free, self.dtype)
        if self._s_df is not None:  # hierarchy is scaled (df=True)
            b = b * jnp.asarray(self._s_df, self.dtype)
        with jax.default_matmul_precision("highest"):
            res: CGResult = self._solve_jit(self.levels, b, rtol, maxiter)
        self.last_cg = res
        self.last_iters = int(res.iters)
        self.last_residual = float(res.residual)
        u = np.asarray(res.x)
        if self._s_df is not None:
            u = u * self._s_df
        return self.sys._solution_out(u)
