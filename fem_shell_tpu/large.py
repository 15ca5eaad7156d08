"""LargeShellSystem — production solve path for multi-million-element
meshes, built on the SoA block-ELL operator (ops/soa.py) whose layouts
map cleanly onto TPU (8,128) tiling. Functionally identical to
ShellSystem (same elements, BCs, PCG); verified against it in tests.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fem_shell_tpu.materials import Material
from fem_shell_tpu.mesh import ShellMesh
from fem_shell_tpu.ops.soa import (
    apply_bc_soa,
    assemble_soa,
    build_soa_pattern,
    soa_diagonal,
    soa_matvec,
)
from fem_shell_tpu.solver import pcg


class LargeShellSystem:
    def __init__(
        self,
        mesh: ShellMesh,
        material: Material,
        dtype=jnp.float32,
        k_max: Optional[int] = None,
        chunk: int = 16384,
        exact_geom: Optional[bool] = None,
        dirichlet_mask: Optional[np.ndarray] = None,
        reorder: Optional[str] = None,
    ):
        """``exact_geom`` (default: on for f32) stores coordinates as a
        two-float32 pair and re-centers each element exactly before the f32
        kernels (ops/soa.py:_centered_xyz) — f64-class element geometry with
        no emulated-f64 stage. ``dirichlet_mask`` overrides the mesh's own
        BC mask (multigrid coarse levels pass subsampled fine masks).
        ``reorder='rcm'`` renumbers nodes by reverse Cuthill-McKee before
        building the operator (bandwidth/locality for unstructured meshes;
        solutions are returned in the ORIGINAL numbering)."""
        self._order = None
        if reorder == "rcm":
            from fem_shell_tpu.mesh import permute_nodes, rcm_order

            self._order = rcm_order(mesh)
            if dirichlet_mask is not None:
                dirichlet_mask = np.asarray(dirichlet_mask)[self._order]
            mesh = permute_nodes(mesh, self._order)
        elif reorder is not None:
            raise ValueError(f"unknown reorder {reorder!r} (use 'rcm' or None)")
        self.mesh = mesh
        self.material = material
        self.dtype = dtype
        self.chunk = int(chunk)
        self.exact_geom = (dtype == jnp.float32) if exact_geom is None else bool(exact_geom)
        dm, dp = material.matrices()
        self.dm = jnp.asarray(dm, dtype)
        self.dp = jnp.asarray(dp, dtype)
        self.thickness = material.thickness

        self.pattern = build_soa_pattern(mesh, k_max=k_max)
        p = self.pattern
        self.offsets = p.offsets  # host-side ints (stencil mode) or None
        self.adj_t = jnp.asarray(p.adj_t) if p.adj_t is not None else None

        free = np.ones((p.n_pad, 6), dtype=np.float64)
        mask = mesh.dirichlet_mask() if dirichlet_mask is None else np.asarray(dirichlet_mask, bool)
        free[: p.n_nodes] = ~mask
        free[p.n_nodes :] = 0.0
        self.free_t = jnp.asarray(free.T, dtype)  # [6, Npad]

        # Pallas stencil SpMV: f32 + stencil mode + real accelerator only
        # (f64 is an XLA-level emulation; CPU Pallas is interpret-only)
        self._use_pallas = (
            dtype == jnp.float32
            and self.pattern.offsets is not None
            and jax.devices()[0].platform != "cpu"
        )

        self._assemble_jit = jax.jit(self._assemble_impl)
        self._solve_jit = jax.jit(self._solve_impl, static_argnums=(3, 4, 5))
        self._tables_cache = None
        self._coords_cache = None

    # device tables/coords are LAZY: the grid-df pipeline never touches
    # them on device, and the eager connectivity/slot uploads (tri_slot
    # is int64 [E,3,3] = 0.76 GB at 10M elements) tipped the 10M-element
    # assembly over HBM. The AoS/scatter paths upload on first use.
    @property
    def coords(self):
        if self._coords_cache is None:
            if self.exact_geom:
                c64 = np.asarray(self.mesh.coords, np.float64)
                hi = c64.astype(np.float32)
                lo = (c64 - hi).astype(np.float32)
                self._coords_cache = (jnp.asarray(hi), jnp.asarray(lo))
            else:
                self._coords_cache = jnp.asarray(self.mesh.coords, self.dtype)
        return self._coords_cache

    @property
    def _tables(self):
        # big static tables (connectivity, slots, masks) must cross the
        # jit boundary as ARGUMENTS — as closure constants they get
        # embedded in the serialized HLO and blow the remote-compile
        # size limit at scale
        if self._tables_cache is None:
            p = self.pattern
            self._tables_cache = {
                "tri_conn": jnp.asarray(self.mesh.tri),
                "quad_conn": jnp.asarray(self.mesh.quad),
                "tri_slot": jnp.asarray(p.tri_slot),
                "quad_slot": jnp.asarray(p.quad_slot),
                "free_t": self.free_t,
                "adj_t": self.adj_t,
            }
        return self._tables_cache

    # ------------------------------------------------------------------
    def _assemble_impl(self, coords, tables):
        values = assemble_soa(
            self.pattern,
            coords,
            tables["tri_conn"],
            tables["quad_conn"],
            tables["tri_slot"],
            tables["quad_slot"],
            self.dm,
            self.dp,
            self.thickness,
            tables["free_t"],
            chunk=self.chunk,
        )
        return apply_bc_soa(values, tables["free_t"], adj_t=tables["adj_t"], offsets=self.offsets)

    def _solve_impl(self, coords, tables, forces_t, rtol, maxiter, precond="jacobi"):
        values = self._assemble_impl(coords, tables)
        b = forces_t * tables["free_t"]
        if self._use_pallas:
            from fem_shell_tpu.ops.pallas_spmv import (
                prepare_tiled_values,
                stencil_spmv_pallas_tiled,
            )

            vt, _ = prepare_tiled_values(values)  # one relayout, reused by all iters
            matvec = lambda x: stencil_spmv_pallas_tiled(vt, x, self.offsets)  # noqa: E731
        else:
            matvec = lambda x: soa_matvec(values, x, adj_t=tables["adj_t"], offsets=self.offsets)  # noqa: E731
        if precond == "block_jacobi":
            from fem_shell_tpu.ops.soa import soa_self_blocks

            inv = jnp.linalg.inv(soa_self_blocks(values, adj_t=tables["adj_t"], offsets=self.offsets))
            prec = lambda r: jnp.einsum("nab,bn->an", inv, r)  # noqa: E731
            return pcg(matvec, b, rtol=rtol, maxiter=maxiter, apply_prec=prec)
        diag = soa_diagonal(values, adj_t=tables["adj_t"], offsets=self.offsets)
        return pcg(matvec, b, diag=diag, rtol=rtol, maxiter=maxiter)

    # ------------------------------------------------------------------
    def assemble(self):
        with jax.default_matmul_precision("highest"):
            return self._assemble_jit(self.coords, self._tables)

    # ------------------------------------------------------------------
    # strip-wise df assembly: f64-class operator accuracy with df (two-f32)
    # storage and only strip-local f64 buffers — the multi-million-element
    # path (full-f64 assembly OOMs around 10^6 nodes; f32 assembly loses
    # ~kappa * eps32 solution accuracy — see ops/soa.py strip section).
    def _strip_inputs(self, strip_nodes: int, chunk: int):
        from fem_shell_tpu.ops.soa import build_strip_plan

        key = (strip_nodes, chunk)
        if getattr(self, "_strip_key", None) == key:
            return self._strip_cache
        p = self.pattern
        dm64, dp64 = self.material.matrices()
        self._strip_cache = {
            "tri_plan": build_strip_plan(p, self.mesh.tri, p.tri_slot, strip_nodes, chunk),
            "quad_plan": build_strip_plan(p, self.mesh.quad, p.quad_slot, strip_nodes, chunk),
            "coords64": jnp.asarray(self.mesh.coords, jnp.float64),
            "dm64": jnp.asarray(dm64, jnp.float64),
            "dp64": jnp.asarray(dp64, jnp.float64),
        }
        self._strip_key = key
        return self._strip_cache

    def _grid_kernel_fn(self, m: int):
        """SINGLE-ELEMENT stiffness fn (xyz [m,3] -> ke [6m,6m]) for the
        batch-last df-jaxpr grid assembly (ops/dfk.py:df_function_bl);
        cached so the per-strip jit memoizes."""
        fn = getattr(self, "_grid_kfns", {}).get(m)
        if fn is not None:
            return fn
        from fem_shell_tpu.ops.elements import quad_shell_stiffness, tri_shell_stiffness

        dm64, dp64 = self.material.matrices()
        dm = jnp.asarray(dm64, jnp.float64)
        dp = jnp.asarray(dp64, jnp.float64)
        t = self.thickness
        base = tri_shell_stiffness if m == 3 else quad_shell_stiffness
        fn = lambda p: base(p, dm, dp, t)  # noqa: E731
        if not hasattr(self, "_grid_kfns"):
            self._grid_kfns = {}
        self._grid_kfns[m] = fn
        return fn

    def assemble_df(
        self,
        strip_nodes: int = 65536,
        chunk: int = 8192,
        method: str = "auto",
        layout: str = "flat",
        with_diag: bool = False,
        elem_pallas: bool = False,
    ):
        """BC-constrained df operator values (hi, lo), each FLAT
        [36K, Npad] f32 (see ops/soa.py:assemble_soa_df for the layout
        and memory rationale); entrywise accurate to ~eps64.

        Two pipelines:
        - ``grid`` (auto-selected for detected row-major structured
          grids): df-jaxpr element kernels + scatter-free shifted-window
          accumulation (ops/assemble_grid.py) — f32-VPU speed, no
          emulated f64 anywhere;
        - ``strip`` (general meshes): emulated-f64 kernels + strip
          scatter (ops/soa.py:assemble_soa_df).

        ``layout='tiled'`` returns the pair in the Pallas SpMV tile-major
        layout [Npad/1024, 36K, 8, 128]; the grid pipeline writes it
        DIRECTLY (no relayout copy — the pair is most of HBM at scale).
        """
        from fem_shell_tpu.ops.df import DF

        if method == "auto":
            # grid path is TPU-only: under CPU jit LLVM FMA-contracts the
            # barrier-free EFTs (ops/df.py) — CPU keeps the strip pipeline
            # (whose "emulated f64" is native f64 there anyway)
            method = "strip"
            n_elem = len(self.mesh.tri) + len(self.mesh.quad)
            # grid pipeline wins above ~10^5 elements (27x at 1M); below
            # that its per-strip launch overhead (the EFT barriers keep
            # the graph in thousands of small fusions) loses to the
            # emulated-f64 strip path, which is latency-bound anyway
            if (
                self.offsets is not None
                and n_elem >= 65536
                and jax.devices()[0].platform != "cpu"
            ):
                from fem_shell_tpu.mg import detect_structured_grid

                grid = detect_structured_grid(self.mesh)
                if grid is not None:
                    self._grid_info = grid
                    method = "grid"
        if method == "grid":
            from fem_shell_tpu.ops.assemble_grid import assemble_grid_df

            grid = getattr(self, "_grid_info", None)
            if grid is None:
                from fem_shell_tpu.mg import detect_structured_grid

                grid = detect_structured_grid(self.mesh)
                self._grid_info = grid
            if grid is None:
                raise ValueError(
                    "method='grid' requires a detected structured grid "
                    "(detect_structured_grid returned None for this mesh)"
                )
            m = 3 if grid.elem_type == "t" else 4
            with jax.default_matmul_precision("highest"):
                return assemble_grid_df(
                    grid,
                    np.asarray(self.mesh.coords, np.float64),
                    self.free_t.astype(jnp.float32),
                    self.offsets,
                    self.pattern.n_pad,
                    self._grid_kernel_fn(m),
                    # strip_nodes is a NODE budget (shared with the strip
                    # pipeline API); the grid pipeline buckets by element
                    # rows
                    strip_rows=max(1, strip_nodes // grid.nxp),
                    layout=layout,
                    with_diag=with_diag,
                    # Pallas-resident df element kernels: accelerator
                    # only (CPU pallas is interpret-only)
                    elem_pallas=elem_pallas,
                )

        from fem_shell_tpu.ops.soa import assemble_soa_df

        c = self._strip_inputs(strip_nodes, chunk)
        free32 = self.free_t.astype(jnp.float32)
        with jax.default_matmul_precision("highest"):
            hi, lo = assemble_soa_df(
                self.pattern,
                c["coords64"],
                c["tri_plan"],
                c["quad_plan"],
                c["dm64"],
                c["dp64"],
                self.thickness,
                free32,
            )
        if layout == "tiled":
            from fem_shell_tpu.ops.assemble_grid import soa_diagonal_tiled, tile_values

            pair = DF(tile_values(hi), tile_values(lo))
            if with_diag:
                return pair, soa_diagonal_tiled(pair.hi, self.offsets)
            return pair
        if with_diag:
            from fem_shell_tpu.ops.soa import soa_diagonal

            return DF(hi, lo), soa_diagonal(hi, offsets=self.offsets)
        return DF(hi, lo)

    def free_strip_cache(self):
        """Drop the (assembly-only) strip plans/coords."""
        self._strip_cache = None
        self._strip_key = None

    # ------------------------------------------------------------------
    # double-float solve: f64 assembly (one-time) -> df operator/vectors ->
    # VPU-native df-PCG. Requires dtype=float64 for the assembly precision.
    def _solve_df_impl(self, coords, tables, forces_t64, rtol, maxiter):
        """Symmetrically diagonal-scaled df solve.

        The raw shell operator's diagonal spans ~7 decades (drilling dofs
        are 1000x softer by construction), which multiplies the df
        matvec's compensated-summation error by the scaling spread and
        stalls CG around 1e-6 relative. Solving
        D^-1/2 K D^-1/2 (D^1/2 x) = D^-1/2 b instead — identical to
        Jacobi-PCG in exact arithmetic — equilibrates the terms so the df
        error stays at the ~1e-12 level, and makes the preconditioner the
        identity. Scaling happens once in f64; the loop is pure df/f32.
        """
        from fem_shell_tpu.ops.df import (
            df_from_f64,
            df_gather_matvec,
            df_stencil_matvec,
            df_to_f64,
        )
        from fem_shell_tpu.solver_df import pcg_df

        values64 = self._assemble_impl(coords, tables)
        diag64 = soa_diagonal(values64, adj_t=tables["adj_t"], offsets=self.offsets)
        s = jnp.where(diag64 > 0, jax.lax.rsqrt(diag64), 1.0)  # [6, Npad]
        k, npad = values64.shape[1], values64.shape[2]
        v4 = values64.reshape(6, 6, k, npad)
        v4 = v4 * s[:, None, None, :]
        if self.offsets is not None:
            for si, off in enumerate(self.offsets):
                col_s = jnp.roll(s, -int(off), axis=1)
                v4 = v4.at[:, :, si, :].multiply(col_s[None, :, :])
        else:
            v4 = v4 * s[:, tables["adj_t"]][None, :, :, :]
        values = df_from_f64(v4.reshape(36, k, npad))

        free = (tables["free_t"] != 0).astype(forces_t64.dtype)
        b = df_from_f64(forces_t64 * free * s)

        ones = jnp.ones_like(s, jnp.float32)
        if self.offsets is not None:
            matvec = lambda x: df_stencil_matvec(values, x, self.offsets)  # noqa: E731
        else:
            matvec = lambda x: df_gather_matvec(values, x, tables["adj_t"])  # noqa: E731
        res = pcg_df(matvec, b, ones, rtol=rtol, maxiter=maxiter)
        return df_to_f64(res.x) * s, res.iters, res.residual

    def _solve_df_impl_f32(self, coords, tables, forces_t64, rtol, maxiter):
        """df solve over a DIRECTLY f32-assembled operator (exact-geometry
        centered kernels): no emulated-f64 assembly stage, half the operator
        HBM. Same symmetric diagonal scaling as the f64 variant (see
        _solve_df_impl docstring); here the scaling runs in f32, an
        eps32-relative system perturbation of the same order as the f32
        kernel evaluation itself."""
        from fem_shell_tpu.ops.df import df_from_f64, df_stencil_matvec_f32v, df_to_f64
        from fem_shell_tpu.solver_df import pcg_df

        values = self._assemble_impl(coords, tables)  # [36,K,Npad] f32
        diag = soa_diagonal(values, adj_t=tables["adj_t"], offsets=self.offsets)
        s = jnp.where(diag > 0, jax.lax.rsqrt(diag), jnp.float32(1.0))  # [6,Npad]
        k, npad = values.shape[1], values.shape[2]
        v4 = values.reshape(6, 6, k, npad) * s[:, None, None, :]
        for si, off in enumerate(self.offsets):
            col_s = jnp.roll(s, -int(off), axis=1)
            v4 = v4.at[:, :, si, :].multiply(col_s[None, :, :])
        values = v4.reshape(36, k, npad)

        s64 = s.astype(jnp.float64)
        free = (tables["free_t"] != 0).astype(jnp.float64)
        b = df_from_f64(forces_t64 * free * s64)
        ones = jnp.ones_like(s)
        matvec = lambda x: df_stencil_matvec_f32v(values, x, self.offsets)  # noqa: E731
        res = pcg_df(matvec, b, ones, rtol=rtol, maxiter=maxiter)
        return df_to_f64(res.x) * s64, res.iters, res.residual

    def solve_df(self, forces, rtol: float = 1e-10, maxiter: int = 20000):
        """Double-float solve: f64-class accuracy from pure-f32 VPU work.
        Two operator sources: dtype=float64 (emulated-f64 assembly, exact
        reference arithmetic) or dtype=float32 with exact_geom (direct f32
        assembly with exactly-centered geometry — the large-scale path)."""
        if self.dtype == jnp.float32:
            if self.offsets is None:
                raise NotImplementedError("f32 df solves currently require stencil mode")
            assert self.exact_geom, "f32 df solves need exact_geom=True assembly"
            impl = self._solve_df_impl_f32
        else:
            assert self.dtype == jnp.float64, "construct with dtype=float64 or float32"
            impl = self._solve_df_impl
        if not hasattr(self, "_solve_df_jit"):
            self._solve_df_jit = jax.jit(impl, static_argnums=(3, 4))
        p = self.pattern
        f = np.zeros((p.n_pad, 6))
        f[: p.n_nodes] = self._forces_in(forces)
        f_t = jnp.asarray(f.T, jnp.float64)
        with jax.default_matmul_precision("highest"):
            x64, iters, res = self._solve_df_jit(self.coords, self._tables, f_t, rtol, maxiter)
        self.last_iters = int(iters)
        self.last_residual = float(res)
        return self._solution_out(np.asarray(x64).T[: p.n_nodes])

    # ------------------------------------------------------------------
    # iterative refinement for ARBITRARY meshes (gather or stencil mode):
    # the emulated-f64 assembly is the accuracy reference, its df
    # representation error E = A64 - (hi + lo) is stored as one f32 array
    # (|E| ~ 2^-49 |A|, so f32 keeps it to ~2^-73 |A|), and the TRUE
    # residual r = b - A_df x - E x drives the outer loop. This removes
    # the CORRELATED operator-representation error that kappa amplifies
    # (the 1.4e-2-at-31.9M-DOF failure mode, see ops/exact_stencil.py) on
    # meshes that have no class structure; the remaining floor is the
    # matvec's uncorrelated rounding (~2^-47 |A||x|), which kappa does
    # not coherently amplify.
    # ------------------------------------------------------------------
    def _refined_parts_impl(self, coords, tables):
        """(scaled df operator, f32 E-correction, scaling s) in one
        jitted program — same symmetric diagonal scaling as
        _solve_df_impl."""
        from fem_shell_tpu.ops.df import df_from_f64

        values64 = self._assemble_impl(coords, tables)
        diag64 = soa_diagonal(values64, adj_t=tables["adj_t"], offsets=self.offsets)
        s = jnp.where(diag64 > 0, jax.lax.rsqrt(diag64), 1.0)
        k, npad = values64.shape[1], values64.shape[2]
        v4 = values64.reshape(6, 6, k, npad)
        v4 = v4 * s[:, None, None, :]
        if self.offsets is not None:
            for si, off in enumerate(self.offsets):
                col_s = jnp.roll(s, -int(off), axis=1)
                v4 = v4.at[:, :, si, :].multiply(col_s[None, :, :])
        else:
            v4 = v4 * s[:, tables["adj_t"]][None, :, :, :]
        v = v4.reshape(36, k, npad)
        values = df_from_f64(v)
        e32 = (v - values.hi.astype(jnp.float64)
               - values.lo.astype(jnp.float64)).astype(jnp.float32)
        return values, e32, s

    def _refined_resid_impl(self, values, e32, tables, x, b):
        from fem_shell_tpu.ops.df import (
            DF,
            df_add,
            df_dot_f64,
            df_gather_matvec,
            df_neg,
            df_stencil_matvec,
        )

        if self.offsets is not None:
            y = df_stencil_matvec(values, x, self.offsets)
        else:
            y = df_gather_matvec(values, x, tables["adj_t"])
        r = df_add(b, df_neg(y))
        ey = soa_matvec(e32, x.hi, adj_t=tables["adj_t"], offsets=self.offsets)
        r = df_add(r, DF(-ey, jnp.zeros_like(ey)))
        rn = jnp.sqrt(df_dot_f64(r, r))
        bn = jnp.sqrt(df_dot_f64(b, b))
        return r, rn / bn

    def _refined_inner_impl(self, values, tables, b, rtol, maxiter):
        from fem_shell_tpu.ops.df import df_gather_matvec, df_stencil_matvec
        from fem_shell_tpu.solver_df import pcg_df

        if self.offsets is not None:
            matvec = lambda x: df_stencil_matvec(values, x, self.offsets)  # noqa: E731
        else:
            matvec = lambda x: df_gather_matvec(values, x, tables["adj_t"])  # noqa: E731
        ones = jnp.ones((6, values.hi.shape[-1]), jnp.float32)
        res = pcg_df(matvec, b, ones, rtol=rtol, maxiter=maxiter)
        return res.x, res.iters, res.residual

    def solve_df_refined(
        self,
        forces,
        rtol: float = 1e-9,
        n_refine: int = 6,
        inner_rtol: float = 1e-5,
        inner_maxiter: int = 20000,
        jit_residual: bool = True,
        verbose: bool = False,
    ):
        """df CG + E-corrected iterative refinement on ANY mesh
        (requires dtype=float64 — the emulated-f64 assembly is the
        accuracy reference). Same outer contraction/stall logic as
        mg.solve_df_refined; ``jit_residual=False`` evaluates the
        residual eagerly (CPU tests — CPU jit FMA-contracts the EFTs)."""
        from fem_shell_tpu.ops.df import df_add, df_from_f64, df_to_f64

        assert self.dtype == jnp.float64, "solve_df_refined requires dtype=float64"
        if not hasattr(self, "_refined_parts_jit"):
            self._refined_parts_jit = jax.jit(self._refined_parts_impl)
            self._refined_inner_jit = jax.jit(
                self._refined_inner_impl, static_argnums=(4,)
            )
            self._refined_resid_jit = jax.jit(self._refined_resid_impl)
        res_fn = self._refined_resid_jit if jit_residual else self._refined_resid_impl

        p = self.pattern
        f = np.zeros((p.n_pad, 6))
        f[: p.n_nodes] = self._forces_in(forces)
        f_t = jnp.asarray(f.T, jnp.float64)
        tables = self._tables
        with jax.default_matmul_precision("highest"):
            values, e32, s = self._refined_parts_jit(self.coords, tables)
            free = (np.asarray(tables["free_t"]) != 0).astype(np.float64)
            b = df_from_f64(f_t * jnp.asarray(free) * s)
            x, it0, _ = self._refined_inner_jit(
                values, tables, b, float(inner_rtol), int(inner_maxiter)
            )
            total = int(it0)
            hist = []
            for _ in range(n_refine):
                r, rn = res_fn(values, e32, tables, x, b)
                rn = float(rn)
                hist.append(rn)
                if verbose:
                    print(f"  refine[E]: true residual {rn:.3e} "
                          f"({total} inner iters)", flush=True)
                if rn < rtol or not np.isfinite(rn):
                    break
                # floor detection: a healthy refinement pass with
                # inner_rtol=1e-5 contracts the true residual by orders
                # of magnitude; <10x improvement only happens at the df
                # representation floor (see mg.solve_df_refined, r4)
                if len(hist) > 1 and rn > 0.1 * hist[-2]:
                    break  # floor (benign — see mg.solve_df_refined)
                d, itk, _ = self._refined_inner_jit(
                    values, tables, r, float(inner_rtol), int(inner_maxiter)
                )
                x = df_add(x, d)
                total += int(itk)
            x64 = df_to_f64(x) * s
        self.last_iters = total
        self.last_residual = hist[-1] if hist else float("nan")
        self.refine_history = hist
        return self._solution_out(np.asarray(x64).T[: p.n_nodes])

    # ------------------------------------------------------------------
    def _forces_in(self, forces) -> np.ndarray:
        forces = np.asarray(forces)
        return forces[self._order] if self._order is not None else forces

    def _solution_out(self, u: np.ndarray) -> np.ndarray:
        if self._order is None:
            return u
        out = np.empty_like(u)
        out[self._order] = u
        return out

    def solve(self, forces, rtol: float = 1e-10, maxiter: int = 20000, precond: str = "jacobi"):
        p = self.pattern
        f = np.zeros((p.n_pad, 6))
        f[: p.n_nodes] = self._forces_in(forces)
        f_t = jnp.asarray(f.T, self.dtype)
        with jax.default_matmul_precision("highest"):
            res = self._solve_jit(self.coords, self._tables, f_t, rtol, maxiter, precond)
        self.last_cg = res
        return self._solution_out(np.asarray(res.x).T[: p.n_nodes])
