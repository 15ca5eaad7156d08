"""Pallas stencil SpMV kernel tests.

Two layers of protection for the flagship perf kernel (the PETSc-SpMV
analog, reference doc/implementation.tex:403):

1. Interpret-mode parity (CPU): the kernel semantics — halo windowing,
   lane-rotate shifts, DMA double buffering — checked against the XLA
   ``soa_matvec`` reference on real assembled operators (quad 9-point and
   tri 7-point stencils), every test run.
2. A regression guard on the dispatch flag: LargeShellSystem must select
   the Pallas path exactly when (f32, stencil mode, real accelerator) —
   a silent fallback to the XLA path is a perf bug nothing else notices.

The on-device parity run lives in the slow marker (spawned as a separate
process because the test session pins the CPU platform, and the remote
TPU allows only one client process).
"""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.large import LargeShellSystem
from fem_shell_tpu.ops.soa import soa_matvec
from fem_shell_tpu.ops.pallas_spmv import (
    prepare_tiled_values,
    stencil_spmv_pallas,
    stencil_spmv_pallas_tiled,
)

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def _operator(et: str, n: int):
    pm = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, et == "q", "z")
    mesh, _, _ = generate(pm)
    sys32 = LargeShellSystem(mesh, MAT, dtype=jnp.float32)
    with jax.default_matmul_precision("highest"):
        values = sys32.assemble()
    return sys32, values


@pytest.mark.parametrize("et", ["q", "t"])
def test_pallas_interpret_matches_soa(et):
    sys32, values = _operator(et, 16)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(6, sys32.pattern.n_pad)), jnp.float32)
    ref = np.asarray(soa_matvec(values, x, offsets=sys32.offsets))
    got = np.asarray(stencil_spmv_pallas(values, x, sys32.offsets, interpret=True))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 1e-6 * scale


def test_pallas_tiled_interpret_matches_soa():
    sys32, values = _operator("q", 16)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(6, sys32.pattern.n_pad)), jnp.float32)
    ref = np.asarray(soa_matvec(values, x, offsets=sys32.offsets))
    vt, _ = prepare_tiled_values(values)
    got = np.asarray(stencil_spmv_pallas_tiled(vt, x, sys32.offsets, interpret=True))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 1e-6 * scale


def test_use_pallas_dispatch_flag():
    """(f32, stencil, accelerator) => Pallas; anything else => XLA path."""
    pm = MeshGenParams("q", 8, 8, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, _, _ = generate(pm)
    on_cpu = jax.devices()[0].platform == "cpu"
    s32 = LargeShellSystem(mesh, MAT, dtype=jnp.float32)
    assert s32.offsets is not None  # stencil mode expected for meshGen grids
    assert s32._use_pallas == (not on_cpu)
    s64 = LargeShellSystem(mesh, MAT, dtype=jnp.float64)
    assert not s64._use_pallas  # f64 keeps the XLA implementation


_TPU_PARITY_SCRIPT = r"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax
import jax.numpy as jnp
import numpy as np
if jax.devices()[0].platform == "cpu":
    print("SKIP: no accelerator")
    raise SystemExit(0)
from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.large import LargeShellSystem
from fem_shell_tpu.ops.soa import soa_matvec
from fem_shell_tpu.ops.pallas_spmv import (
    prepare_tiled_values, stencil_spmv_pallas, stencil_spmv_pallas_tiled)
pm = MeshGenParams("q", 64, 64, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
mesh, _, _ = generate(pm)
s = LargeShellSystem(mesh, Material(0.3, 1e7, 0.5), dtype=jnp.float32)
assert s._use_pallas, "Pallas dispatch flag must be on (f32+stencil+TPU)"
with jax.default_matmul_precision("highest"):
    values = s.assemble()
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(6, s.pattern.n_pad)), jnp.float32)
ref = np.asarray(jax.jit(lambda v, x: soa_matvec(v, x, offsets=s.offsets))(values, x))
got = np.asarray(jax.jit(lambda v, x: stencil_spmv_pallas(v, x, s.offsets))(values, x))
vt, _ = prepare_tiled_values(values)
got_t = np.asarray(jax.jit(lambda v, x: stencil_spmv_pallas_tiled(v, x, s.offsets))(vt, x))
scale = np.abs(ref).max()
for name, g in (("plain", got), ("tiled", got_t)):
    err = np.abs(g - ref).max() / scale
    assert err < 1e-5, f"{name} kernel mismatch: {err}"
    print(f"{name}: rel err {err:.2e}")
print("OK")
"""


@pytest.mark.slow
def test_pallas_tpu_parity_on_device():
    """Real-hardware parity vs the XLA stencil path (subprocess: the test
    session pins CPU; the remote TPU is single-client)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # NB: a PYTHONPATH entry breaks the axon TPU plugin registration on
    # this box; cwd + `-c` puts the repo on sys.path instead.
    env.pop("PYTHONPATH", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        out = subprocess.run(
            [sys.executable, "-c", _TPU_PARITY_SCRIPT],
            env=env,
            capture_output=True,
            text=True,
            timeout=1200,
            cwd=repo,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("TPU busy/unreachable (timeout)")
    if "SKIP" in out.stdout:
        pytest.skip("no accelerator in subprocess")
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr[-2000:]}"
    assert "OK" in out.stdout


def test_pallas_df_interpret_matches_xla_df():
    """df (two-f32) Pallas kernel vs the XLA df matvec, interpret mode.
    Both run EAGERLY (no jit): CPU jit FMA-contracts the EFTs (ops/df.py)."""
    from fem_shell_tpu.ops.df import DF, df_stencil_matvec
    from fem_shell_tpu.ops.pallas_spmv_df import (
        prepare_tiled_values_df,
        stencil_spmv_pallas_df,
    )

    sys64, _ = _operator("q", 16)
    import jax.numpy as jnp2

    s = LargeShellSystem(sys64.mesh, MAT, dtype=jnp2.float64, chunk=64)
    pair = s.assemble_df(strip_nodes=512, chunk=64)
    npad = s.pattern.n_pad
    rng = np.random.default_rng(9)
    x = DF(
        jnp.asarray(rng.normal(size=(6, npad)), jnp.float32),
        jnp.asarray(rng.normal(size=(6, npad)) * 1e-8, jnp.float32),
    )
    ref = df_stencil_matvec(pair, x, s.offsets)
    vh_t, vl_t, _ = prepare_tiled_values_df(pair)
    got = stencil_spmv_pallas_df(vh_t, vl_t, x, s.offsets, interpret=True)
    r64 = np.asarray(ref.hi, np.float64) + np.asarray(ref.lo, np.float64)
    g64 = np.asarray(got.hi, np.float64) + np.asarray(got.lo, np.float64)
    scale = np.abs(r64).max()
    assert np.abs(g64 - r64).max() < 1e-13 * scale


def test_pallas_df_flat_interpret_matches_xla_df():
    """Flat-layout df Pallas kernel (no tile relayout) parity, interpret
    mode / eager (see CPU FMA caveat)."""
    from fem_shell_tpu.ops.df import DF, df_stencil_matvec
    from fem_shell_tpu.ops.pallas_spmv_df import stencil_spmv_pallas_df_flat

    import jax.numpy as jnp2

    sys64, _ = _operator("q", 16)
    s = LargeShellSystem(sys64.mesh, MAT, dtype=jnp2.float64, chunk=64)
    pair = s.assemble_df(strip_nodes=512, chunk=64)
    npad = s.pattern.n_pad
    rng = np.random.default_rng(11)
    x = DF(
        jnp.asarray(rng.normal(size=(6, npad)), jnp.float32),
        jnp.asarray(rng.normal(size=(6, npad)) * 1e-8, jnp.float32),
    )
    ref = df_stencil_matvec(pair, x, s.offsets)
    got = stencil_spmv_pallas_df_flat(pair, x, s.offsets, interpret=True)
    r64 = np.asarray(ref.hi, np.float64) + np.asarray(ref.lo, np.float64)
    g64 = np.asarray(got.hi, np.float64) + np.asarray(got.lo, np.float64)
    assert np.abs(g64 - r64).max() < 1e-13 * np.abs(r64).max()


def test_pallas_df_sym_interpret_matches_xla_df():
    """Symmetric-storage df kernel (upper-half slots only, transposed
    contributions + cross-tile carry) vs the XLA df matvec, interpret
    mode, quad (9-offset) and tri (7-offset) stencils."""
    from fem_shell_tpu.ops.df import DF, df_stencil_matvec
    from fem_shell_tpu.ops.pallas_spmv_df import (
        prepare_tiled_values_df_sym,
        stencil_spmv_pallas_df_sym,
    )

    import jax.numpy as jnp2

    # quad with tps=1 (4 grid steps: maximum cross-tile carry action),
    # tri with tps=2 (multi-tile payload; 7-offset stencil) — interpret
    # mode costs ~90 s per kernel run, so one configuration each
    for et, tps in (("q", 1), ("t", 2)):
        sys64, _ = _operator(et, 16)
        s = LargeShellSystem(sys64.mesh, MAT, dtype=jnp2.float64, chunk=64)
        pair = s.assemble_df(strip_nodes=512, chunk=64)
        npad = s.pattern.n_pad
        rng = np.random.default_rng(11)
        x = DF(
            jnp.asarray(rng.normal(size=(6, npad)), jnp.float32),
            jnp.asarray(rng.normal(size=(6, npad)) * 1e-8, jnp.float32),
        )
        ref = df_stencil_matvec(pair, x, s.offsets)
        vh_u, vl_u, _ = prepare_tiled_values_df_sym(pair, s.offsets)
        got = stencil_spmv_pallas_df_sym(vh_u, vl_u, x, s.offsets,
                                         interpret=True, tps=tps)
        r64 = np.asarray(ref.hi, np.float64) + np.asarray(ref.lo, np.float64)
        g64 = np.asarray(got.hi, np.float64) + np.asarray(got.lo, np.float64)
        scale = np.abs(r64).max()
        assert np.abs(g64 - r64).max() < 1e-13 * scale, (et, tps)
