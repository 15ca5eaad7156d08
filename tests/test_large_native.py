"""SoA large-mesh operator + native graph-builder tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.system import ShellSystem

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


@pytest.mark.parametrize("et,n", [("q", 16), ("t", 12)])
def test_soa_matches_aos(et, n):
    from fem_shell_tpu.large import LargeShellSystem

    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, et == "q", "z")
    mesh, rows, fac = generate(p)
    forces = rows * fac
    ref = np.asarray(ShellSystem(mesh, MAT).solve(forces))
    big = LargeShellSystem(mesh, MAT, dtype=jnp.float64, chunk=64)
    u = big.solve(forces)
    assert np.abs(u - ref).max() < 1e-12 * np.abs(ref).max()


def test_soa_chunking_invariance():
    from fem_shell_tpu.large import LargeShellSystem

    p = MeshGenParams("q", 8, 8, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    forces = rows * fac
    u1 = LargeShellSystem(mesh, MAT, dtype=jnp.float64, chunk=7).solve(forces)
    u2 = LargeShellSystem(mesh, MAT, dtype=jnp.float64, chunk=64).solve(forces)
    np.testing.assert_allclose(u1, u2, atol=1e-12)


def test_native_pattern_matches_python():
    from fem_shell_tpu.native import build_ell_pattern_native
    from fem_shell_tpu.ops.assemble import _build_ell_pattern_py

    p = MeshGenParams("t", 12, 9, 0, 0, 4, 3, (0, 1, 2, -1), 1.0, 1, True, "z")
    mesh, _, _ = generate(p)
    a = _build_ell_pattern_py(mesh)
    b = build_ell_pattern_native(mesh)
    if b is None:
        pytest.skip("native toolchain unavailable")
    assert (a.adj == b.adj).all()
    assert (a.valid == b.valid).all()
    assert (a.tri_slot == b.tri_slot).all()
    assert (a.quad_slot == b.quad_slot).all()


def test_profiling_and_checkpoint(tmp_path):
    from fem_shell_tpu.checkpoint import CoupledState, latest_checkpoint
    from fem_shell_tpu.utils.profiling import PerfLog

    perf = PerfLog()
    with perf.scope("x"):
        pass
    with perf.scope("x"):
        pass
    assert perf.stats("x")["n"] == 2
    assert "x" in perf.report()

    st = CoupledState(3, 0.03, np.ones((5, 6)), np.zeros((2, 2)))
    path = str(tmp_path / "ck" / "ckpt_3.npz")
    st.save(path)
    st2 = CoupledState.load(path)
    assert st2.timestep == 3 and st2.time == 0.03
    np.testing.assert_allclose(st2.pre_sols, st.pre_sols)
    assert latest_checkpoint(str(tmp_path / "ck")) == path
