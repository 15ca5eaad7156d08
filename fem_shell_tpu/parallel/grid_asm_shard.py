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

from fem_shell_tpu.ops.assemble_grid import _init_pair_fn, _make_grid_step
from fem_shell_tpu.ops.df import DF
from fem_shell_tpu.ops.dfk import two_sum
from fem_shell_tpu.parallel.stencil_shard import AXIS as _DF_AXIS


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

        f32_l = put(free_l, s)
        hi = _init_pair_fn(npad_l, k, offsets, tiled=False, jit=not eager)(f32_l)
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


# ----------------------------------------------------------------------
# end-to-end: sharded grid-df assembly feeding the sharded df solver
# ----------------------------------------------------------------------


class GridShardedDFShellSystem:
    """Multi-chip production solver on structured grids where the
    OPERATOR, too, is built by the sharded shifted-window df pipeline —
    no per-shard emulated-f64 element loop anywhere (the last f64 stage
    of the sharded path).

    Row partition: R = ceil(nyp / n_shards) node rows per shard (the
    last shard takes the remainder + lane padding), so the per-shard
    strip length is ``l = R * nxp`` — a contiguous flat partition that
    matches ShardedStencilSystem's strip semantics exactly, and the df
    CG machinery of parallel/df_shard.py (halo-exchange df matvec,
    psum dots) is reused verbatim on the reshaped row blocks.

    ``prec="mg"`` swaps the scalar-Jacobi preconditioner for the
    row-sharded f32 multigrid V-cycle (parallel/mg_shard.py) — the
    mesh-independent-iteration production configuration (the reference's
    PETSc-MG analog, doc/implementation.tex:463-521). The row partition
    then adopts the V-cycle's even-aligned fine-level rows, the V-cycle
    smooths the FINE level directly on the hi part of the sharded
    grid-df operator (no f32 fine re-assembly), and only the tiny
    coarser levels assemble per shard inside the same shard_map."""

    def __init__(self, mesh, material, device_mesh, use_pallas=None,
                 eager_asm: Optional[bool] = None, prec: str = "jacobi",
                 mg_kw: Optional[dict] = None):
        from fem_shell_tpu.mg import detect_structured_grid
        from fem_shell_tpu.parallel.df_shard import ShardedDFShellSystem
        from fem_shell_tpu.ops.elements import (
            quad_shell_stiffness,
            tri_shell_stiffness,
        )

        grid = detect_structured_grid(mesh)
        if grid is None:
            raise ValueError(
                "GridShardedDFShellSystem requires a structured grid mesh"
            )
        if prec not in ("jacobi", "mg"):
            raise ValueError(f"prec must be 'jacobi' or 'mg', got {prec!r}")
        self.grid = grid
        self._prec = prec
        s = int(np.prod(list(device_mesh.shape.values())))
        nyp, nxp = grid.nyp, grid.nxp
        if prec == "mg":
            # row-sharded f32 V-cycle preconditioner (parallel/mg_shard.py):
            # adopt ITS fine-level row partition (_even_ceil rows, so the
            # restriction windows stay even-aligned) — the grid-df row
            # blocks then live in exactly the layout the V-cycle consumes,
            # no re-sharding between operator and preconditioner.
            from fem_shell_tpu.parallel.mg_shard import ShardedMGShellSystem

            self.mgp = ShardedMGShellSystem(
                mesh, material, device_mesh, dtype=jnp.float32,
                **(mg_kw or {}),
            )
            r_rows = self.mgp.levels[0].rows
        else:
            self.mgp = None
            r_rows = -(-nyp // s)
        if (s - 1) * r_rows > nyp - 2:
            raise ValueError(
                f"grid too small for {s} shards: {nyp} node rows need "
                f">=1 element row on the last shard (R={r_rows})"
            )
        # the guard above ensures i*r_rows < nyp for every shard, so the
        # row starts need no clamping
        self._row_starts = [i * r_rows for i in range(s)] + [nyp]
        self.sys = ShardedDFShellSystem(
            mesh, material, device_mesh, l_force=r_rows * nxp,
            use_pallas=use_pallas,
        )
        if self.mgp is not None:
            # layout-contract checks: a misaligned partition would build a
            # wrong-but-converging preconditioner, so these must survive
            # python -O (ValueError, not assert)
            fine = self.mgp.levels[0]
            if fine.l != self.sys.l:
                raise ValueError(
                    f"MG fine partition l={fine.l} != df partition l={self.sys.l}"
                )
            if tuple(fine.sys.offsets) != tuple(self.sys.offsets):
                raise ValueError("MG fine stencil offsets != df system offsets")
            # the fine V-cycle level smooths directly on the grid-df hi
            # part (see _solve_impl); the ShardedStencilSystem's own
            # O(n_elements) assembly arrays are never consumed — drop
            # them so the fine mesh isn't held twice at scale
            fine.sys.tri_conn = None
            fine.sys.tri_w = None
            fine.sys.quad_conn = None
            fine.sys.quad_w = None
            fine.sys.coords = None
        dm64, dp64 = material.matrices()
        dm = jnp.asarray(dm64, jnp.float64)
        dp = jnp.asarray(dp64, jnp.float64)
        base = tri_shell_stiffness if grid.elem_type == "t" else quad_shell_stiffness
        t = material.thickness
        self._kernel_fn = lambda p: base(p, dm, dp, t)  # noqa: E731
        if eager_asm is None:
            eager_asm = jax.devices()[0].platform == "cpu"
        self._eager_asm = eager_asm
        self.last_iters = 0
        self.last_residual = np.inf
        self._vals = None

    # ------------------------------------------------------------------
    def assemble(self):
        """Sharded row-block assembly -> per-shard [36K, l] df pair as a
        device-sharded global array pair [(s, 36K, l)]."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        sys = self.sys
        s, l, k = sys.n_shards, sys.l, sys.k
        nxp = self.grid.nxp
        devs = list(sys.device_mesh.devices.flat)
        free_flat = np.asarray(sys.free).transpose(1, 0, 2).reshape(6, sys.n_tot)
        blocks = assemble_grid_df_rowblocks(
            self.grid, np.asarray(sys.mesh.coords, np.float64),
            free_flat.astype(np.float32), tuple(sys.offsets),
            self._kernel_fn, self._row_starts,
            eager=self._eager_asm, devices=devs,
        )
        # pad the last shard's block to l; padded (absent) nodes get the
        # unit diagonal, matching assemble_vals_spmd's constrained rows
        k0 = int(np.searchsorted(np.asarray(sys.offsets), 0))
        padded = []
        for b in blocks:
            pad = l - b.hi.shape[1]
            if pad == 0:
                padded.append(b)
                continue
            hi = jnp.pad(b.hi, ((0, 0), (0, pad)))
            lo = jnp.pad(b.lo, ((0, 0), (0, pad)))
            for a in range(6):
                hi = hi.at[(a * 6 + a) * k + k0, l - pad:].add(1.0)
            padded.append(DF(hi, lo))

        sharding = NamedSharding(sys.device_mesh, P(_DF_AXIS))

        def mk(get):
            return jax.make_array_from_single_device_arrays(
                (s, 36 * k, l), sharding, [get(b)[None] for b in padded]
            )

        self._vals = (mk(lambda b: b.hi), mk(lambda b: b.lo))
        return self._vals

    # ------------------------------------------------------------------
    def _solve_impl(self, hi_s, lo_s, forces_l, rtol, maxiter, *level_args):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from fem_shell_tpu.ops.df import df_scalar_from_f64  # noqa: F401
        from fem_shell_tpu.parallel.df_shard import make_df_matvec, pcg_df_spmd

        sys = self.sys
        mgp = self.mgp
        k, l = sys.k, sys.l

        def spmd(hi_l, lo_l, free_l, b_l, *flat):
            hi_l, lo_l = hi_l[0], lo_l[0]
            free_l, b_l = free_l[0], b_l[0]
            vals_df = DF(hi_l.reshape(6, 6, k, l), lo_l.reshape(6, 6, k, l))
            k0 = int(np.searchsorted(np.asarray(sys.offsets), 0))
            diag = jnp.einsum("aan->an", vals_df.hi[:, :, k0, :])
            inv_diag = jnp.where(diag != 0, 1.0 / diag, 1.0).astype(jnp.float32)
            matvec = make_df_matvec(sys, vals_df, sys.use_pallas)
            b64 = (b_l * free_l).astype(jnp.float64)
            bh = b64.astype(jnp.float32)
            b = DF(bh, (b64 - bh.astype(jnp.float64)).astype(jnp.float32))
            if mgp is not None:
                # V-cycle fine level: the hi part of the sharded grid-df
                # operator IS the f32 fine operator (same [6,6,K,L]
                # layout as assemble_vals_spmd) — no f32 element
                # re-assembly on the fine grid; coarser sharded levels
                # assemble per shard (preconditioner-only, tiny)
                ops = [(vals_df.hi, inv_diag, free_l.astype(jnp.float32))]
                i = 0
                for li in range(1, mgp.n_sharded):
                    lvl = mgp.levels[li]
                    coords, tri_c, tri_w, quad_c, quad_w, free = flat[i : i + 6]
                    i += 6
                    vals, inv_d = lvl.sys.assemble_vals_spmd(
                        coords, tri_c[0], tri_w[0], quad_c[0], quad_w[0], free[0]
                    )
                    ops.append((vals, inv_d, free[0]))
                prec = lambda r: DF(  # noqa: E731
                    mgp._vcycle(0, ops, r.hi), jnp.zeros_like(r.lo)
                )
            else:
                prec = lambda r: DF(inv_diag * r.hi, inv_diag * r.lo)  # noqa: E731
            x64, it, res = pcg_df_spmd(matvec, b, prec, rtol, maxiter)
            return x64[None], it[None], res[None]

        in_specs = [P(_DF_AXIS)] * 4
        if mgp is not None:
            for _ in range(1, mgp.n_sharded):
                in_specs += [P(), P(_DF_AXIS), P(_DF_AXIS), P(_DF_AXIS),
                             P(_DF_AXIS), P(_DF_AXIS)]
        return shard_map(
            spmd,
            mesh=sys.device_mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(_DF_AXIS), P(_DF_AXIS), P(_DF_AXIS)),
            check_vma=False,
        )(hi_s, lo_s, sys.free, forces_l, *level_args)

    # ------------------------------------------------------------------
    def solve_refined(
        self,
        forces,
        rtol: float = 1e-9,
        n_refine: int = 6,
        inner_rtol: float = 1e-5,
        inner_maxiter: int = 20000,
        jit_residual: bool = True,
        verbose: bool = False,
    ):
        """Multi-chip iterative refinement on UNIFORM grids: the inner
        df CG solves run fully sharded (sharded assembly + sharded
        matvec/dots), while the 3-6 TRUE-residual evaluations reuse the
        single-chip class-table machinery (ops/class_matvec.py) on the
        default device — O(vector) memory (the class operator never
        materializes the pair), so even the 31.9M-DOF scale fits one
        chip for this step. Same accuracy contract as
        mg.solve_df_refined (residual systematic error ~2^-72 |A||x|).

        ``jit_residual=False`` runs the residual eagerly — CPU tests
        (CPU jit FMA-contracts the EFTs; on the TPU keep it jitted)."""
        from fem_shell_tpu.ops.class_matvec import (
            build_class_parts,
            class_ecorr_f32,
            class_matvec_df,
        )
        from fem_shell_tpu.ops.df import (
            df_add,
            df_dot_f64,
            df_from_f64,
            df_neg,
            df_to_f64,
        )
        from fem_shell_tpu.ops.exact_stencil import build_exact_stencil

        sys = self.sys
        grid = self.grid
        n = grid.nyp * grid.nxp
        st = build_exact_stencil(sys.mesh, sys.material, sys.offsets,
                                 grid=self.grid)
        cdf, _ = build_class_parts(st, n)

        free_flat = (
            np.asarray(sys.free).transpose(1, 0, 2).reshape(6, sys.n_tot)[:, :n]
        )
        b64 = np.zeros((6, n))
        b64[:] = np.asarray(forces).T * free_flat

        def _residual(cdf_, x_, b_):
            y = class_matvec_df(cdf_, x_)
            r = df_add(b_, df_neg(y))
            e = class_ecorr_f32(cdf_, x_.hi)
            r = df_add(r, DF(-e, jnp.zeros_like(e)))
            rn = jnp.sqrt(df_dot_f64(r, r))
            bn = jnp.sqrt(df_dot_f64(b_, b_))
            return r, rn / bn

        # cache the jitted residual across solve_refined calls (fresh
        # jax.jit wrappers re-compile on the remote platform)
        if jit_residual:
            if not hasattr(self, "_resid_jit"):
                self._resid_jit = jax.jit(_residual)
            res_fn = self._resid_jit
        else:
            res_fn = _residual

        with jax.default_matmul_precision("highest"):
            b = df_from_f64(jnp.asarray(b64))
            u = self.solve(forces, rtol=inner_rtol, maxiter=inner_maxiter)
            total = self.last_iters
            x = df_from_f64(jnp.asarray(np.asarray(u).T, jnp.float64))
            hist = []
            for _ in range(n_refine):
                r, rn = res_fn(cdf, x, b)
                rn = float(rn)
                hist.append(rn)
                if verbose:
                    print(f"  refine[sharded]: true residual {rn:.3e} "
                          f"({total} inner iters)", flush=True)
                if rn < rtol or not np.isfinite(rn):
                    break
                if len(hist) > 1 and rn > 0.7 * hist[-2]:
                    break  # representation floor (benign, see mg)
                r_nodes = np.asarray(df_to_f64(r)).T  # [n, 6]
                d = self.solve(r_nodes, rtol=inner_rtol, maxiter=inner_maxiter)
                total += self.last_iters
                x = df_add(x, df_from_f64(jnp.asarray(np.asarray(d).T, jnp.float64)))
        self.last_iters = total
        self.last_residual = hist[-1] if hist else float("nan")
        self.refine_history = hist
        return np.asarray(df_to_f64(x)).T

    # ------------------------------------------------------------------
    def solve(self, forces, rtol: float = 1e-10, maxiter: int = 20000):
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        sys = self.sys
        if self._vals is None:
            self.assemble()
        hi_s, lo_s = self._vals
        s, l = sys.n_shards, sys.l
        f = np.zeros((sys.n_tot, 6))
        f[: sys.mesh.n_nodes] = np.asarray(forces)
        f_l = jnp.asarray(f.T.reshape(6, s, l).transpose(1, 0, 2), jnp.float64)
        f_l = jax.device_put(f_l, NamedSharding(sys.device_mesh, P(_DF_AXIS)))
        level_args = []
        if self.mgp is not None:
            for li in range(1, self.mgp.n_sharded):
                level_args += list(self.mgp.levels[li].args)
        if not hasattr(self, "_solve_jit"):
            self._solve_jit = jax.jit(self._solve_impl, static_argnums=(3, 4))
        with jax.default_matmul_precision("highest"):
            x, it, res = self._solve_jit(hi_s, lo_s, f_l, rtol, maxiter,
                                         *level_args)
        self.last_iters = int(np.max(np.asarray(it)))
        self.last_residual = float(np.max(np.asarray(res)))
        x = np.asarray(x).transpose(1, 0, 2).reshape(6, sys.n_tot).T
        return x[: sys.mesh.n_nodes]
