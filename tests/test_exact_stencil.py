"""Exact-stencil refinement machinery (ops/exact_stencil.py, ld_interp).

CPU scope: table construction vs f64 assembly, class-pair generation,
E-term matvec, the EAGER EFT residual vs the longdouble oracle, and the
refined-solve driver structure. The full EFT accuracy claims are
TPU-only (CPU LLVM breaks jitted EFTs — see CLAUDE.md) and are covered
by tools/run_tpu_tests.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fem_shell_tpu.large import LargeShellSystem
from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.ops.df import DF, df_from_f64
from fem_shell_tpu.ops.exact_stencil import (
    build_exact_stencil,
    class_flat_tables,
    class_pair_flat,
    class_pair_tiled,
    class_stencil_matvec_f32,
    exact_matvec_f64,
    exact_residual_df,
)
from fem_shell_tpu.ops.soa import soa_matvec

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def _case(et, n=12, bc=(0, 0, 0, 0)):
    p = MeshGenParams(et, n, n, 0, 0, 10, 10, bc, 300.0, 2, et == "q", "z")
    mesh, rows, fac = generate(p)
    return mesh, rows * fac


@pytest.mark.parametrize("et", ["t", "q"])
def test_tables_match_f64_assembly(et):
    mesh, _ = _case(et)
    sys = LargeShellSystem(mesh, MAT, dtype=jnp.float64)
    vals = np.asarray(sys.assemble())
    st = build_exact_stencil(mesh, MAT, sys.offsets)
    k = len(sys.offsets)
    npad = sys.pattern.n_pad
    v4 = vals.reshape(6, 6, k, npad)[:, :, :, : mesh.n_nodes]
    tab = st.t0.astype(np.float64) + st.t1 + st.t2
    full = tab[:, :, :, st.cy_idx][:, :, :, :, st.cx_idx].reshape(k, 6, 6, mesh.n_nodes)
    scale = np.max(np.abs(vals))
    assert np.max(np.abs(np.transpose(v4, (2, 0, 1, 3)) - full)) < 1e-13 * scale


@pytest.mark.parametrize("et", ["t", "q"])
def test_matvec_oracle(et):
    mesh, _ = _case(et)
    sys = LargeShellSystem(mesh, MAT, dtype=jnp.float64)
    vals = sys.assemble()
    st = build_exact_stencil(mesh, MAT, sys.offsets)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((6, mesh.n_nodes))
    npad = sys.pattern.n_pad
    xp = jnp.asarray(np.pad(x, ((0, 0), (0, npad - mesh.n_nodes))))
    y64 = np.asarray(soa_matvec(vals, xp, offsets=sys.offsets))[:, : mesh.n_nodes]
    y_ld = exact_matvec_f64(st, x).astype(np.float64)
    assert np.max(np.abs(y_ld - y64)) < 1e-12 * np.max(np.abs(y64))


def test_class_pair_layouts_agree():
    mesh, _ = _case("t", 16)
    sys = LargeShellSystem(mesh, MAT, dtype=jnp.float64)
    st = build_exact_stencil(mesh, MAT, sys.offsets)
    tfl0, tfl1, tfl2, cls = class_flat_tables(st)
    npad = sys.pattern.n_pad
    hi_f, lo_f = class_pair_flat(jnp.asarray(tfl0), jnp.asarray(tfl1), jnp.asarray(cls), npad)
    r = 8
    npad_t = -(-npad // (r * 128)) * r * 128
    hi_t, lo_t = class_pair_tiled(
        jnp.asarray(tfl0), jnp.asarray(tfl1), jnp.asarray(cls), npad_t, r
    )
    k = len(sys.offsets)
    nr = npad_t // 128
    untile = lambda v: np.transpose(np.asarray(v), (1, 0, 2, 3)).reshape(36 * k, npad_t)  # noqa: E731
    assert np.array_equal(untile(hi_t)[:, :npad], np.asarray(hi_f))
    assert np.array_equal(untile(lo_t)[:, :npad], np.asarray(lo_f))
    # hi+lo must reproduce the true table to ~t2 magnitude
    tab = (tfl0.astype(np.float64) + tfl1)[:, cls]
    assert np.array_equal(np.asarray(hi_f, np.float64)[:, : len(cls)] + np.asarray(lo_f, np.float64)[:, : len(cls)], tab)


def test_e_term_matvec():
    mesh, _ = _case("q", 10)
    sys = LargeShellSystem(mesh, MAT, dtype=jnp.float64)
    st = build_exact_stencil(mesh, MAT, sys.offsets)
    tfl0, tfl1, tfl2, cls = class_flat_tables(st)
    rng = np.random.default_rng(2)
    xg = rng.standard_normal((6, st.nyp, st.nxp)).astype(np.float32)
    y = np.asarray(
        class_stencil_matvec_f32(
            jnp.asarray(tfl2), jnp.asarray(cls), st.offs2d, jnp.asarray(xg), st.nyp, st.nxp
        )
    )
    # oracle: dense t2 stencil matvec in f64
    st2 = st.__class__(
        offsets=st.offsets, offs2d=st.offs2d,
        t0=st.t2, t1=np.zeros_like(st.t2), t2=np.zeros_like(st.t2),
        cy_idx=st.cy_idx, cx_idx=st.cx_idx, nyp=st.nyp, nxp=st.nxp,
    )
    y_ref = exact_matvec_f64(st2, xg.astype(np.float64).reshape(6, -1)).astype(np.float64)
    scale = max(np.max(np.abs(y_ref)), 1e-30)
    assert np.max(np.abs(y.reshape(6, -1) - y_ref)) < 1e-5 * scale


@pytest.mark.parametrize("et", ["t", "q"])
def test_e_term_matvec_strips_vs_oracle(et):
    """The row-strip-chunked path (compile-OOM fix for 2304^2) against
    the dense f64 oracle. strip_rows < nyp forces the fori_loop path,
    with a non-dividing strip count to cover the clamped last strip
    (idempotent overlap rows). Boundary rows validate the zero-padded
    halo: real class stencils zero the coefficients that would reach
    across the y wrap, so the oracle (which never wraps) pins them.
    Values differ from the whole-grid path only by FMA contraction
    inside the jitted loop body (~1 ulp of the E term, i.e. ~2^-73 of
    the main operator — immaterial to the refinement)."""
    mesh, _ = _case(et, 13)
    sys = LargeShellSystem(mesh, MAT, dtype=jnp.float64)
    st = build_exact_stencil(mesh, MAT, sys.offsets)
    tfl0, tfl1, tfl2, cls = class_flat_tables(st)
    rng = np.random.default_rng(4)
    xg = rng.standard_normal((6, st.nyp, st.nxp)).astype(np.float32)
    y = np.asarray(
        class_stencil_matvec_f32(
            jnp.asarray(tfl2), jnp.asarray(cls), st.offs2d, jnp.asarray(xg),
            st.nyp, st.nxp, strip_rows=5,
        )
    )
    st2 = st.__class__(
        offsets=st.offsets, offs2d=st.offs2d,
        t0=st.t2, t1=np.zeros_like(st.t2), t2=np.zeros_like(st.t2),
        cy_idx=st.cy_idx, cx_idx=st.cx_idx, nyp=st.nyp, nxp=st.nxp,
    )
    y_ref = exact_matvec_f64(st2, xg.astype(np.float64).reshape(6, -1)).astype(np.float64)
    scale = max(np.max(np.abs(y_ref)), 1e-30)
    assert np.max(np.abs(y.reshape(6, -1) - y_ref)) < 1e-5 * scale


def test_eager_residual_vs_oracle():
    """EAGER (unjitted) EFT residual on CPU is honestly rounded; compare
    against the longdouble oracle at better than df accuracy."""
    mesh, forces = _case("t", 8)
    sys = LargeShellSystem(mesh, MAT, dtype=jnp.float64)
    st = build_exact_stencil(mesh, MAT, sys.offsets)
    n = mesh.n_nodes
    npad = sys.pattern.n_pad
    rng = np.random.default_rng(3)
    x64 = rng.standard_normal((6, npad)) * 1e-3
    b64 = rng.standard_normal((6, npad))
    x = df_from_f64(jnp.asarray(x64))
    b = df_from_f64(jnp.asarray(b64))
    r = exact_residual_df(
        jnp.asarray(st.t0), jnp.asarray(st.t1), jnp.asarray(st.t2),
        jnp.asarray(st.cy_idx), jnp.asarray(st.cx_idx),
        x, b, st.offs2d, st.nyp, st.nxp,
    )
    r64 = np.asarray(r.hi, np.float64) + np.asarray(r.lo, np.float64)
    # oracle in longdouble on the EXACT df values of x
    x_exact = np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)
    y_ld = exact_matvec_f64(st, x_exact[:, :n])
    r_ld = b64[:, :n] - y_ld.astype(np.float64)
    term_scale = float(np.max(np.abs(y_ld).astype(np.float64)))
    err = np.max(np.abs(r64[:, :n] - r_ld))
    assert err < 1e-13 * term_scale, (err, term_scale)


@pytest.mark.parametrize("et", ["t", "q"])
def test_refined_solve_cpu(et):
    """Driver structure on CPU: converges and hits golden to ~1e-4 even
    with CPU-degraded EFTs (TPU accuracy is checked by the TPU runner)."""
    golden = {"t": 0.106413, "q": 0.106465}[et]
    p = MeshGenParams(et, 32, 32, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, et == "q", "z")
    mesh, rows, fac = generate(p)
    from fem_shell_tpu.mg import MultigridShellSystem

    mg = MultigridShellSystem(mesh, MAT, dtype=jnp.float32, df_operator=True)
    u = mg.solve_df_refined(rows * fac, rtol=1e-8)
    w = float(u[mesh.n_nodes // 2, 2])
    # n=32 discretization sits between the n=16 and n=64 golden rows;
    # generous window. NOTE: under CPU jit the EFT floor is platform- and
    # device-count-dependent (LLVM vectorization breaks two_sum; observed
    # ~5e-3 true-residual floor with the 8-device CPU backend), so only
    # the golden window and driver mechanics are asserted here — the
    # accuracy contract (true residual < rtol) is validated on TPU by
    # tools/run_tpu_tests.py.
    assert abs(w - golden) / golden < 2e-3
    assert len(mg.refine_history) >= 1 and np.isfinite(mg.refine_history[-1])


def test_fused_solve_f64_golden():
    p = MeshGenParams("q", 32, 32, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    from fem_shell_tpu.mg import MultigridShellSystem

    mg = MultigridShellSystem(mesh, MAT, dtype=jnp.float64, assemble=False)
    u = mg.solve_fused(rows * fac, rtol=1e-9, arith="f64")
    w = float(u[mesh.n_nodes // 2, 2])
    assert mg.last_residual < 1e-9
    # Test-D n=32 sits between 0.106405 (n=8) and 0.106454 (n=16) row
    # trend toward 0.1064045; just pin the physical window tightly
    assert abs(w - 0.106460) < 5e-5


def test_non_uniform_grid_rejected():
    mesh, _ = _case("t", 8)
    coords = np.asarray(mesh.coords).copy()
    coords[10, 0] += 0.01
    from fem_shell_tpu.mesh import ShellMesh

    mesh2 = ShellMesh(coords, mesh.elem_types, mesh.elem_conn, mesh.boundary_sides)
    sys = LargeShellSystem(mesh2, MAT, dtype=jnp.float64)
    with pytest.raises(ValueError):
        build_exact_stencil(mesh2, MAT, sys.offsets)
