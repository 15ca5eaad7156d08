"""Halo-exchange SPMD solver running the PRODUCTION df machinery.

parallel/stencil_shard.py proves the halo-partition design with
dtype-generic XLA operators; this module runs the same strip partition
with the production double-float (two-f32) operator and CG:

- per-shard assembly reuses ShardedStencilSystem.assemble_vals_spmd in
  f64 (element kernels + O(halo) halo reduction; native f64 on CPU,
  XLA-emulated on TPU — the same entry accuracy class as the
  single-chip strip-df pipeline), then splits into a df pair;
- the CG recurrence carries DF vectors; every halo exchange moves the
  hi AND lo components (one ppermute of [12, Wp] per direction per
  iteration — still O(halo) ICI bytes);
- the per-iteration matvec is the df stencil contraction on the
  halo-extended window: on a real accelerator it runs the Pallas df
  SpMV kernel (ops/pallas_spmv_df.py) per shard — the single-chip
  production kernel, unchanged, inside shard_map; elsewhere the XLA
  df window matvec;
- scalar dots are emulated-f64 with jax.lax.psum across shards.

Reference analog: PETSc MatMPIAIJ/VecScatter scaling the *production*
solve over MPI (doc/implementation.tex:463-521) — this is the df
solver's distributed form, not a separate correctness path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from fem_shell_tpu.ops.df import DF, df_scalar_from_f64, two_prod, two_sum
from fem_shell_tpu.parallel.stencil_shard import AXIS, ShardedStencilSystem


def _df_add(x: DF, y: DF) -> DF:
    s, e = two_sum(x.hi, y.hi)
    e = e + (x.lo + y.lo)
    return DF(*two_sum(s, e))


def _df_scale(x: DF, a: DF) -> DF:
    p, e = two_prod(x.hi, a.hi)
    e = e + (x.hi * a.lo + x.lo * a.hi)
    s, e2 = two_sum(p, e)
    return DF(s, e2)


def halo_exchange_df(sys: ShardedStencilSystem, x: DF) -> DF:
    """One exchange for both df components: stack hi/lo so each
    direction is a single ppermute of [12, Wp] columns."""
    both = jnp.concatenate([x.hi, x.lo], axis=0)  # [12, L]
    ext = sys._halo_exchange(both)  # [12, Wp+L+Wp]
    return DF(ext[:6], ext[6:])


def df_matvec_window(sys: ShardedStencilSystem, vals_df: DF, x_ext: DF) -> DF:
    """y = A x on the halo-extended window, full-df accumulation (XLA
    path; mirrors ops/df.py:df_stencil_matvec with dynamic-slice windows
    instead of rolls)."""
    wp, l = sys.w_pad, sys.l
    acc = DF(jnp.zeros((6, l), jnp.float32), jnp.zeros((6, l), jnp.float32))
    for si, off in enumerate(sys.offsets):
        xh = jax.lax.dynamic_slice_in_dim(x_ext.hi, off + wp, l, axis=1)
        xl = jax.lax.dynamic_slice_in_dim(x_ext.lo, off + wp, l, axis=1)
        for b in range(6):
            vh = vals_df.hi[:, b, si, :]  # [6, L]
            vl = vals_df.lo[:, b, si, :]
            p, pe = two_prod(vh, xh[b])
            pe = pe + (vh * xl[b] + vl * xh[b])
            acc = _df_add(acc, DF(p, pe))
    return acc


def df_matvec_pallas(sys: ShardedStencilSystem, flat_hi, flat_lo, x_ext: DF) -> DF:
    """Per-shard Pallas df SpMV on the extended window: the window
    [6, Wp+L+Wp] is lane-padded and fed as a full vector with the
    operator's halo columns zeroed; the core [*, wp:wp+L] is exact and
    the halo outputs are discarded."""
    from fem_shell_tpu.ops.pallas_spmv_df import stencil_spmv_pallas_df_flat

    wp, l = sys.w_pad, sys.l
    y = stencil_spmv_pallas_df_flat(DF(flat_hi, flat_lo), x_ext, sys.offsets)
    return DF(
        jax.lax.dynamic_slice_in_dim(y.hi, wp, l, axis=1),
        jax.lax.dynamic_slice_in_dim(y.lo, wp, l, axis=1),
    )


def split_df_vals(vals64):
    """f64 per-shard operator block -> (DF pair, f32 values)."""
    hi = vals64.astype(jnp.float32)
    lo = (vals64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return DF(hi, lo)


def make_df_matvec(sys: ShardedStencilSystem, vals_df: DF, use_pallas: bool):
    """Per-iteration df matvec closure [DF [6,L] -> DF [6,L]] including
    the halo exchange."""
    if use_pallas:
        wp, l, k = sys.w_pad, sys.l, sys.k
        flat = jnp.zeros((36 * k, wp + l + wp), jnp.float32)
        fh = jax.lax.dynamic_update_slice_in_dim(
            flat, vals_df.hi.reshape(36 * k, l), wp, axis=1
        )
        fl = jax.lax.dynamic_update_slice_in_dim(
            flat, vals_df.lo.reshape(36 * k, l), wp, axis=1
        )
        return lambda pv: df_matvec_pallas(sys, fh, fl, halo_exchange_df(sys, pv))
    return lambda pv: df_matvec_window(sys, vals_df, halo_exchange_df(sys, pv))


def pcg_df_spmd(matvec, b: DF, prec, rtol, maxiter, axis=AXIS):
    """Distributed df PCG (inside shard_map): df vectors per shard,
    emulated-f64 psum dots, arbitrary SPD preconditioner on the hi part.
    ``axis`` may be a mesh-axis name or a tuple (2D process grids)."""

    def pdot(x: DF, y: DF):
        x64 = x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)
        y64 = y.hi.astype(jnp.float64) + y.lo.astype(jnp.float64)
        return jax.lax.psum(jnp.sum(x64 * y64), axis)

    b_norm = jnp.sqrt(pdot(b, b))
    stop = rtol * b_norm
    x = DF(jnp.zeros_like(b.hi), jnp.zeros_like(b.lo))
    r = b
    z = prec(r)
    pv = z
    rz = pdot(r, z)

    def cond(st):
        _, r, _, _, it = st
        return jnp.logical_and(jnp.sqrt(pdot(r, r)) > stop, it < maxiter)

    def body(st):
        x, r, pv, rz, it = st
        ap = matvec(pv)
        alpha = rz / pdot(pv, ap)
        a_df = df_scalar_from_f64(alpha)
        x = _df_add(x, _df_scale(pv, a_df))
        r = _df_add(r, _df_scale(ap, df_scalar_from_f64(-alpha)))
        z = prec(r)
        rz_new = pdot(r, z)
        beta = df_scalar_from_f64(rz_new / rz)
        pv = _df_add(z, _df_scale(pv, beta))
        return (x, r, pv, rz_new, it + 1)

    st = (x, r, pv, rz, jnp.zeros((), jnp.int32))
    x, r, _, _, it = jax.lax.while_loop(cond, body, st)
    res = jnp.sqrt(pdot(r, r)) / b_norm
    x64 = x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)
    return x64, it, res


class ShardedDFShellSystem(ShardedStencilSystem):
    """Strip-partitioned double-float shell solver (production operators
    under shard_map), Jacobi-preconditioned."""

    def __init__(self, mesh, material, device_mesh, chunk: int = 8192,
                 l_force=None, dirichlet_mask=None, use_pallas=None):
        super().__init__(
            mesh, material, device_mesh, dtype=jnp.float64, chunk=chunk,
            l_force=l_force, dirichlet_mask=dirichlet_mask,
        )
        if use_pallas is None:
            use_pallas = jax.devices()[0].platform not in ("cpu",)
        self.use_pallas = use_pallas

    # ------------------------------------------------------------------
    def _solve_df(self, coords, forces_l, rtol, maxiter):
        def spmd(coords, tri_c, tri_w, quad_c, quad_w, free_l, b_l):
            tri_c, tri_w = tri_c[0], tri_w[0]
            quad_c, quad_w = quad_c[0], quad_w[0]
            free_l, b_l = free_l[0], b_l[0]

            vals64, _ = self.assemble_vals_spmd(
                coords, tri_c, tri_w, quad_c, quad_w, free_l
            )
            vals_df = split_df_vals(vals64)
            k0 = int(np.searchsorted(np.asarray(self.offsets), 0))
            diag = jnp.einsum("aan->an", vals64[:, :, k0, :])
            inv_diag = jnp.where(diag != 0, 1.0 / diag, 1.0).astype(jnp.float32)

            matvec = make_df_matvec(self, vals_df, self.use_pallas)
            b64 = (b_l * free_l).astype(jnp.float64)
            bh = b64.astype(jnp.float32)
            b = DF(bh, (b64 - bh.astype(jnp.float64)).astype(jnp.float32))
            prec = lambda r: DF(inv_diag * r.hi, inv_diag * r.lo)  # noqa: E731
            x64, it, res = pcg_df_spmd(matvec, b, prec, rtol, maxiter)
            return x64[None], it[None], res[None]

        return shard_map(
            spmd,
            mesh=self.device_mesh,
            in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
            out_specs=(P(AXIS), P(AXIS), P(AXIS)),
            check_vma=False,
        )(coords, self.tri_conn, self.tri_w, self.quad_conn, self.quad_w,
          self.free, forces_l)

    # ------------------------------------------------------------------
    def solve(self, forces, rtol: float = 1e-10, maxiter: int = 20000):
        s, l = self.n_shards, self.l
        if not hasattr(self, "_solve_df_jit"):
            self._solve_df_jit = jax.jit(self._solve_df, static_argnums=(2, 3))
        f = np.zeros((self.n_tot, 6))
        f[: self.mesh.n_nodes] = np.asarray(forces)
        f_l = jnp.asarray(f.T.reshape(6, s, l).transpose(1, 0, 2), jnp.float64)
        f_l = jax.device_put(f_l, NamedSharding(self.device_mesh, P(AXIS)))
        with jax.default_matmul_precision("highest"):
            x, it, res = self._solve_df_jit(self.coords, f_l, rtol, maxiter)
        self.last_iters = int(np.max(np.asarray(it)))
        self.last_residual = float(np.max(np.asarray(res)))
        x = np.asarray(x).transpose(1, 0, 2).reshape(6, self.n_tot).T
        return x[: self.mesh.n_nodes]


class ShardedMGDFShellSystem:
    """Multi-chip PRODUCTION solver: df outer CG over the f64-assembled
    fine operator pair, preconditioned by the row-sharded f32 multigrid
    V-cycle (parallel/mg_shard.py) — the distributed form of
    mg.MultigridShellSystem.solve_df. Per CG iteration: one [12, Wp]
    halo ppermute + per-shard df SpMV (Pallas kernel on real
    accelerators) + the sharded V-cycle's O(halo) transfers."""

    def __init__(self, mesh, material, device_mesh, use_pallas=None, **kw):
        from fem_shell_tpu.parallel.mg_shard import ShardedMGShellSystem

        self.mg = ShardedMGShellSystem(
            mesh, material, device_mesh, dtype=jnp.float32, **kw
        )
        self.mesh = self.mg.mesh
        self.device_mesh = device_mesh
        self.n_shards = self.mg.n_shards
        self.n_levels = self.mg.n_levels
        self.n_sharded = self.mg.n_sharded
        fine = self.mg.levels[0]
        self.fine64 = ShardedStencilSystem(
            self.mesh, material, device_mesh, dtype=jnp.float64, l_force=fine.l
        )
        assert self.fine64.l == fine.sys.l
        assert tuple(self.fine64.offsets) == tuple(fine.sys.offsets)
        if use_pallas is None:
            use_pallas = jax.devices()[0].platform not in ("cpu",)
        self.use_pallas = use_pallas

    def _solve_impl(self, level_args, f64_args, rtol, maxiter, forces_l):
        mg = self.mg

        def spmd(*flat):
            ops = []
            i = 0
            for li in range(mg.n_sharded):
                lvl = mg.levels[li]
                coords, tri_c, tri_w, quad_c, quad_w, free = flat[i : i + 6]
                i += 6
                vals, inv_diag = lvl.sys.assemble_vals_spmd(
                    coords, tri_c[0], tri_w[0], quad_c[0], quad_w[0], free[0]
                )
                ops.append((vals, inv_diag, free[0]))
            coords64, tri_c, tri_w, quad_c, quad_w, free64 = flat[i : i + 6]
            i += 6
            vals64, _ = self.fine64.assemble_vals_spmd(
                coords64, tri_c[0], tri_w[0], quad_c[0], quad_w[0], free64[0]
            )
            b_l = flat[i][0]
            vals_df = split_df_vals(vals64)
            matvec = make_df_matvec(self.fine64, vals_df, self.use_pallas)
            b64 = (b_l * free64[0]).astype(jnp.float64)
            bh = b64.astype(jnp.float32)
            b = DF(bh, (b64 - bh.astype(jnp.float64)).astype(jnp.float32))

            def prec(r: DF) -> DF:
                z = mg._vcycle(0, ops, r.hi)
                return DF(z, jnp.zeros_like(r.lo))

            x64, it, res = pcg_df_spmd(matvec, b, prec, rtol, maxiter)
            return x64[None], it[None], res[None]

        in_specs = []
        for _ in range(mg.n_sharded + 1):
            in_specs += [P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)]
        in_specs.append(P(AXIS))
        return shard_map(
            spmd,
            mesh=self.device_mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(AXIS), P(AXIS), P(AXIS)),
            check_vma=False,
        )(*level_args, *f64_args, forces_l)

    def solve_df(self, forces, rtol: float = 1e-9, maxiter: int = 300):
        mg = self.mg
        fine = mg.levels[0]
        s, l = self.n_shards, fine.l
        if not hasattr(self, "_solve_jit"):
            self._solve_jit = jax.jit(self._solve_impl, static_argnums=(2, 3))
        f = np.zeros((s * l, 6))
        f[: self.mesh.n_nodes] = np.asarray(forces)
        f_l = jnp.asarray(f.T.reshape(6, s, l).transpose(1, 0, 2), jnp.float64)
        f_l = jax.device_put(f_l, NamedSharding(self.device_mesh, P(AXIS)))
        args = []
        for li in range(mg.n_sharded):
            args += list(mg.levels[li].args)
        sy = self.fine64
        f64_args = (sy.coords, sy.tri_conn, sy.tri_w, sy.quad_conn, sy.quad_w, sy.free)
        with jax.default_matmul_precision("highest"):
            x, it, res = self._solve_jit(tuple(args), f64_args, rtol, maxiter, f_l)
        self.last_iters = int(np.max(np.asarray(it)))
        self.last_residual = float(np.max(np.asarray(res)))
        x = np.asarray(x).transpose(1, 0, 2).reshape(6, s * l).T
        return x[: self.mesh.n_nodes]
