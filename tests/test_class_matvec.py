"""Matrix-free class-table operator (ops/class_matvec.py): parity with
the longdouble exact-stencil oracle, and the MG wiring that routes the
fine level through it.

On CPU the df accumulation is FMA-contaminated under jit (see ops/df.py),
so the df tolerances here are loose relative to the 1e-12-class parity
the TPU runner asserts (tools/run_tpu_tests.py, check "class-mv").
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fem_shell_tpu.large import LargeShellSystem
from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.ops.class_matvec import (
    build_class_parts,
    class_ecorr_f32,
    class_matvec_df,
    class_matvec_f32,
)
from fem_shell_tpu.ops.df import DF
from fem_shell_tpu.ops.exact_stencil import build_exact_stencil, exact_matvec_f64

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def _setup(et, n):
    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, et == "q", "z")
    mesh, rows, fac = generate(p)
    sys_ = LargeShellSystem(mesh, MAT, dtype=jnp.float64)
    st = build_exact_stencil(mesh, MAT, sys_.offsets)
    npad = sys_.pattern.n_pad
    cp, diag = build_class_parts(st, npad)
    return mesh, rows * fac, st, cp, diag, npad


def _rand_x(st, npad, seed=0):
    rng = np.random.default_rng(seed)
    x64 = rng.standard_normal((6, st.nyp * st.nxp))
    xh = x64.astype(np.float32)
    xl = (x64 - xh.astype(np.float64)).astype(np.float32)
    pad = npad - st.nyp * st.nxp
    return x64, DF(
        jnp.asarray(np.pad(xh, ((0, 0), (0, pad)))),
        jnp.asarray(np.pad(xl, ((0, 0), (0, pad)))),
    )


# n=12: bands well-separated; n=17: odd size (asymmetric interior)
@pytest.mark.parametrize("et,n", [("t", 12), ("q", 12), ("t", 17), ("q", 17)])
def test_class_matvec_vs_ld_oracle(et, n):
    """df matvec + E-correction reproduces the longdouble class-table
    operator; the f32 matvec reproduces the t0 (hi) table."""
    _, _, st, cp, diag, npad = _setup(et, n)
    n_nodes = st.nyp * st.nxp
    x64, x = _rand_x(st, npad)

    y = jax.jit(class_matvec_df)(cp, x)
    e = jax.jit(class_ecorr_f32)(cp, x.hi)
    tot = (
        np.asarray(y.hi, np.float64) + np.asarray(y.lo, np.float64)
        + np.asarray(e, np.float64)
    )[:, :n_nodes]
    x_exact = np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)
    y_ref = np.asarray(exact_matvec_f64(st, x_exact[:, :n_nodes]), np.float64)
    scale = np.abs(y_ref).max()
    assert np.abs(tot - y_ref).max() < 2e-6 * scale  # CPU-FMA-bounded

    st0 = st.__class__(
        offsets=st.offsets, offs2d=st.offs2d, t0=st.t0,
        t1=np.zeros_like(st.t0), t2=np.zeros_like(st.t0),
        cy_idx=st.cy_idx, cx_idx=st.cx_idx, nyp=st.nyp, nxp=st.nxp,
    )
    yh = np.asarray(jax.jit(class_matvec_f32)(cp, x.hi), np.float64)[:, :n_nodes]
    yh_ref = np.asarray(exact_matvec_f64(st0, np.asarray(x.hi, np.float64)[:, :n_nodes]), np.float64)
    assert np.abs(yh - yh_ref).max() < 1e-6 * max(np.abs(yh_ref).max(), 1e-30)

    # padding region must stay exactly zero (CG dot products include it)
    assert not np.any(np.asarray(y.hi)[:, n_nodes:])
    assert not np.any(np.asarray(e)[:, n_nodes:])


@pytest.mark.parametrize("et", ["t", "q"])
def test_class_diag_matches_tables(et):
    _, _, st, cp, diag, npad = _setup(et, 12)
    k0 = st.offs2d.index((0, 0))
    aa = np.arange(6)
    d_ref = (
        (st.t0.astype(np.float64) + st.t1 + st.t2)[k0, aa, aa]
        [:, st.cy_idx, :][:, :, st.cx_idx].reshape(6, -1).astype(np.float32)
    )
    got = np.asarray(diag)[:, : st.nyp * st.nxp]
    assert np.array_equal(got, d_ref)
    assert not np.any(np.asarray(diag)[:, st.nyp * st.nxp:])


@pytest.mark.parametrize("et,n", [("t", 12), ("q", 12), ("t", 17)])
def test_class_pallas_interpret_matches_xla(et, n):
    """Pallas scalar-stencil interior kernel (ops/pallas_class.py) vs
    the XLA class matvec, interpret mode / eager (CPU jit FMA-contracts
    the EFTs, see ops/df.py): df, f32 smoother table, and E-term."""
    _, _, st, cp, diag, npad = _setup(et, n)
    assert cp.nzmask is not None and len(cp.nzmask) < 36 * len(cp.offs2d)
    _, x = _rand_x(st, npad, seed=3)

    ref = class_matvec_df(cp, x, use_pallas=False)
    got = class_matvec_df(cp, x, use_pallas=True, interpret=True)
    r64 = np.asarray(ref.hi, np.float64) + np.asarray(ref.lo, np.float64)
    g64 = np.asarray(got.hi, np.float64) + np.asarray(got.lo, np.float64)
    assert np.abs(g64 - r64).max() < 1e-13 * np.abs(r64).max()
    assert not np.any(np.asarray(got.hi)[:, st.nyp * st.nxp:])

    # f32 tables: plain-f32 rounding parity only (the interpreter's CPU
    # backend FMA-contracts mul+add; same 1e-6 bound as the f32 SpMV
    # kernel parity tests)
    for fn in (class_matvec_f32, class_ecorr_f32):
        ref = np.asarray(fn(cp, x.hi, use_pallas=False), np.float64)
        got = np.asarray(fn(cp, x.hi, use_pallas=True, interpret=True), np.float64)
        scale = max(np.abs(ref).max(), 1e-30)
        assert np.abs(got - ref).max() < 1e-6 * scale


def test_mg_routes_fine_level_through_class_operator():
    """df MG on a uniform grid auto-selects the matrix-free fine level:
    no materialized fine pair, and solve_df converges to the pair-path
    answer."""
    from fem_shell_tpu.mg import MultigridShellSystem

    p = MeshGenParams("q", 32, 32, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    mg_c = MultigridShellSystem(mesh, MAT, dtype=jnp.float32, df_operator=True)
    assert mg_c._cdf is not None and mg_c._fine_df is None
    assert mg_c.levels[0].values is None and mg_c.levels[0].cparts is not None
    u_c = mg_c.solve_df(rows * fac, rtol=1e-8)

    mg_p = MultigridShellSystem(
        mesh, MAT, dtype=jnp.float32, df_operator=True, class_operator=False
    )
    assert mg_p._cdf is None and mg_p._fine_df is not None
    u_p = mg_p.solve_df(rows * fac, rtol=1e-8)
    scale = np.abs(u_p).max()
    # CPU-degraded EFTs (ops/df.py) bound cross-path agreement to ~1e-4
    # relative; the TPU runner's class-mv check pins operator exactness
    assert np.abs(u_c - u_p).max() < 2e-4 * scale

    # reassemble keeps the class level matrix-free and the solve intact
    mg_c.reassemble()
    assert mg_c.levels[0].values is None
    u_r = mg_c.solve_df(rows * fac, rtol=1e-8)
    assert np.abs(u_r - u_p).max() < 2e-4 * scale


def test_class_operator_rejects_nonuniform_when_forced():
    from fem_shell_tpu.mg import MultigridShellSystem

    p = MeshGenParams("q", 32, 32, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, _, _ = generate(p)
    import dataclasses

    coords = np.asarray(mesh.coords).copy()
    coords[:, 0] += 0.05 * np.sin(coords[:, 1])  # non-affine warp
    mesh2 = dataclasses.replace(mesh, coords=coords)
    with pytest.raises(ValueError):
        MultigridShellSystem(
            mesh2, MAT, dtype=jnp.float32, df_operator=True, class_operator=True
        )
    # auto mode falls back to the materialized pair silently
    mg = MultigridShellSystem(mesh2, MAT, dtype=jnp.float32, df_operator=True)
    assert mg._cdf is None and mg._fine_df is not None


@pytest.mark.parametrize("et,n", [("t", 12), ("q", 17)])
def test_pad_layout_matvec_and_smoother(et, n):
    """Padded-kernel-layout machinery (ops/pallas_class.py pad-grid):
    round trip, matvec parity with the XLA class path (zero-ring vs
    wrap-ring conventions are both exact, so results agree to f32
    accumulation noise), and the fused Jacobi smoother vs the reference
    recurrence."""
    from fem_shell_tpu.ops.pallas_class import (
        _PadGridSpec,
        class_matvec_f32_pad,
        class_smooth_f32_pad,
        from_pad_grid,
        pad_core,
        to_pad_grid,
    )

    _, _, st, cp, diag, npad = _setup(et, n)
    x64, x = _rand_x(st, npad)
    xf = x.hi
    pg = _PadGridSpec(st.nyp, st.nxp)

    # round trip
    x2 = to_pad_grid(pg, xf)
    back = np.asarray(from_pad_grid(pg, x2, npad))
    np.testing.assert_array_equal(back, np.asarray(xf))

    # matvec parity (interpret-mode pallas on CPU)
    y_pad = class_matvec_f32_pad(cp, pg, x2, interpret=True)
    y_flat = np.asarray(
        from_pad_grid(pg, jnp.zeros_like(x2).at[:6, pg.hr:pg.hr + pg.nr, :].set(y_pad), npad)
    )
    y_ref = np.asarray(class_matvec_f32(cp, xf, use_pallas=False))
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y_flat, y_ref, atol=3e-6 * scale)

    # fused smoother vs reference recurrence (2 sweeps, omega=0.7).
    # Parity is checked on FREE dofs with a per-component bound tied to
    # the class decomposition's intrinsic cancellation noise: at
    # edge-class nodes the generic interior row (|c| ~ 1e8 for this
    # material) is cancelled by band deltas, so EACH path carries
    # ~eps32*|c|*|x| absolute noise before the wd scaling; constrained
    # dofs (wd = 1) see it fully but are a decoupled identity subsystem.
    mesh = _setup(et, n)[0]
    inv_diag = jnp.asarray(np.where(np.asarray(diag) != 0, 1.0 / np.asarray(diag), 1.0),
                           jnp.float32)
    b2 = to_pad_grid(pg, xf)
    wd_c = pad_core(pg, to_pad_grid(pg, inv_diag)) * np.float32(0.7)
    x2s = class_smooth_f32_pad(cp, pg, jnp.zeros_like(b2), pad_core(pg, b2),
                               wd_c, 2, interpret=True)
    got = np.asarray(from_pad_grid(pg, x2s, npad))

    xs = jnp.zeros_like(xf)
    for _ in range(2):
        r = xf - class_matvec_f32(cp, xs, use_pallas=False)
        xs = xs + 0.7 * inv_diag * r
    ref = np.asarray(xs)

    n_nodes = st.nyp * st.nxp
    free = (~mesh.dirichlet_mask()).T  # [6, n]
    noise = (
        128.0 * np.finfo(np.float32).eps
        * float(np.abs(np.asarray(cp.ih)).max())
        * float(np.abs(ref).max())
    )
    inv_d = np.asarray(inv_diag)
    for c in range(6):
        wd_free = 0.7 * float((inv_d[c, :n_nodes] * free[c]).max())
        dc = np.abs(got[c, :n_nodes] - ref[c, :n_nodes]) * free[c]
        assert dc.max() <= max(noise * wd_free, 1e-12), (c, dc.max(), noise * wd_free)
