"""df-jaxpr element kernel tests (ops/dfk.py).

The interpreter re-executes the traced f64 element kernels in two-f32
arithmetic; these tests pin (1) the scalar df op building blocks and
(2) full element-stiffness parity against native f64 on CPU.

Everything here runs EAGERLY: under CPU jit LLVM contracts a*b+c into
FMAs, which silently breaks the error-free transforms (see ops/df.py).
The kernels are exercised jitted on real TPU by the production assembly
path (tests/test_df_assembly.py strip parity + the bench golden check).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_shell_tpu.materials import Material
from fem_shell_tpu.ops.dfk import (
    DF,
    d_add,
    d_div,
    d_dot_general,
    d_from_f64,
    d_integer_pow,
    d_max,
    d_mul,
    d_reduce_sum,
    d_sqrt,
    d_sub,
    d_to_f64,
    df_function,
)

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def _rand(shape, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=shape) * scale


def _relerr(got_df, want64):
    got = np.asarray(d_to_f64(got_df), np.float64)
    want = np.asarray(want64, np.float64)
    scale = np.abs(want).max() + 1e-300
    return np.abs(got - want).max() / scale


def test_scalar_ops_eps49():
    a64 = _rand((256,), 0, 1e3)
    b64 = _rand((256,), 1, 1e3) + 2000.0  # keep b away from 0 for div
    a, b = d_from_f64(a64), d_from_f64(b64)
    assert _relerr(d_add(a, b), a64 + b64) < 1e-14
    assert _relerr(d_sub(a, b), a64 - b64) < 1e-14
    assert _relerr(d_mul(a, b), a64 * b64) < 1e-14
    assert _relerr(d_div(a, b), a64 / b64) < 1e-14
    assert _relerr(d_sqrt(d_from_f64(np.abs(a64))), np.sqrt(np.abs(a64))) < 1e-14
    assert _relerr(d_integer_pow(a, 3), a64**3) < 1e-14
    # df carries ~49 mantissa bits: representation floor ~2^-48 relative
    assert _relerr(d_max(a, b), np.maximum(a64, b64)) < 1e-14


def test_sqrt_of_zero_is_zero():
    z = d_from_f64(np.array([0.0, 4.0]))
    out = np.asarray(d_to_f64(d_sqrt(z)))
    assert out[0] == 0.0 and abs(out[1] - 2.0) < 1e-14


def test_reduce_sum_cancellation():
    # alternating large terms: naive f32 summation loses everything
    x64 = np.array([1e8, 1.0, -1e8, 1e-3, 3.0, -2.0, 7e7, -7e7, 0.125])
    got = float(d_to_f64(d_reduce_sum(d_from_f64(x64), (0,))))
    # df keeps ~2^-49 of the LARGEST intermediate (~1e8 -> ~2e-7 floor);
    # single f32 pairwise summation would be off by O(1) here
    assert abs(got - x64.sum()) < 1e-6


def test_dot_general_matches_f64():
    a64 = _rand((4, 3, 5), 2)
    b64 = _rand((4, 5, 2), 3)
    dn = (((2,), (1,)), ((0,), (0,)))  # batch dim 0, contract 5
    want = jax.lax.dot_general(jnp.asarray(a64), jnp.asarray(b64), dn)
    got = d_dot_general(d_from_f64(a64), d_from_f64(b64), dn)
    assert _relerr(got, np.asarray(want)) < 1e-13


@pytest.mark.parametrize("et", ["quad", "tri"])
def test_df_element_kernels_match_f64(et):
    """Full element stiffness: df re-execution vs native f64 (CPU),
    random warped 3D elements — the production assembly kernel parity."""
    from fem_shell_tpu.ops.elements import quad_shell_stiffness, tri_shell_stiffness

    fn, m = (quad_shell_stiffness, 4) if et == "quad" else (tri_shell_stiffness, 3)
    dm, dp = (np.asarray(a, np.float64) for a in MAT.matrices())
    rng = np.random.default_rng(7)
    E = 4
    corners = (
        np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float64)
        if m == 4
        else np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
    )
    xyz = rng.normal(size=(E, 1, 3)) * 5 + corners[None] + 0.1 * rng.normal(size=(E, m, 3))
    xyz_t = np.transpose(xyz, (1, 2, 0))  # [m, 3, E] — elements on lanes

    f = jax.vmap(
        lambda p: fn(p, jnp.asarray(dm), jnp.asarray(dp), MAT.thickness),
        in_axes=2,
        out_axes=2,
    )
    ref = np.asarray(f(jnp.asarray(xyz_t, jnp.float64)))
    (out,) = df_function(f)(d_from_f64(xyz_t))
    assert _relerr(out, ref) < 2e-13


def test_df_function_integer_args_pass_through():
    def g(x, idx):
        return x[idx] * 2.0

    x64 = _rand((8, 3), 5)
    idx = np.array([2, 0, 7], np.int32)
    (out,) = df_function(g)(d_from_f64(x64), jnp.asarray(idx))
    assert _relerr(out, x64[idx] * 2.0) < 1e-14


_TPU_PARITY_SCRIPT = r"""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
if jax.devices()[0].platform == "cpu":
    print("SKIP: no accelerator")
    raise SystemExit(0)
from fem_shell_tpu.materials import Material
from fem_shell_tpu.ops.dfk import d_from_f64, df_function
from fem_shell_tpu.ops.elements import quad_shell_stiffness, tri_shell_stiffness

MAT = Material(nu=0.3, em=1e7, thickness=0.5)
dm, dp = (np.asarray(a, np.float64) for a in MAT.matrices())

# self-contained golden prep: when the pytest wrapper has not produced
# the CPU f64 reference files (e.g. tools/run_tpu_tests.py standalone,
# or /tmp cleaned between rounds), generate them here on the host CPU
# backend — identical arrays (same seed and code path as the wrapper).
if not all(
    os.path.exists(f"/tmp/dfk_parity_{n}_{k}.npy")
    for n in ("quad", "tri") for k in ("ref", "xyz")
):
    rng = np.random.default_rng(3)
    cpu = jax.devices("cpu")[0]
    for name, m in (("quad", 4), ("tri", 3)):
        fn = quad_shell_stiffness if m == 4 else tri_shell_stiffness
        corners = (
            np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float64)
            if m == 4
            else np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
        )
        xyz = (rng.normal(size=(64, 1, 3)) * 5 + corners[None]
               + 0.1 * rng.normal(size=(64, m, 3)))
        xyz_t = np.ascontiguousarray(xyz.transpose(1, 2, 0))
        with jax.default_device(cpu):
            f64 = jax.jit(jax.vmap(
                lambda p, fn=fn: fn(p, jnp.asarray(dm), jnp.asarray(dp),
                                    MAT.thickness),
                in_axes=2, out_axes=2,
            ))
            ref = np.asarray(f64(jnp.asarray(xyz_t)))
        np.save(f"/tmp/dfk_parity_{name}_ref.npy", ref)
        np.save(f"/tmp/dfk_parity_{name}_xyz.npy", xyz_t)

for name, m in (("quad", 4), ("tri", 3)):
    ref = np.load(f"/tmp/dfk_parity_{name}_ref.npy")
    xyz_t = np.load(f"/tmp/dfk_parity_{name}_xyz.npy")
    fn = quad_shell_stiffness if m == 4 else tri_shell_stiffness
    f = jax.vmap(lambda p: fn(p, jnp.asarray(dm), jnp.asarray(dp), MAT.thickness),
                 in_axes=2, out_axes=2)
    dfn = df_function(f)
    jf = jax.jit(lambda x: dfn(x)[0])
    with jax.default_matmul_precision("highest"):
        got = jf(d_from_f64(xyz_t))
    g = np.asarray(got.hi, np.float64) + np.asarray(got.lo, np.float64)
    err = np.abs(g - ref).max() / np.abs(ref).max()
    print(f"{name}: rel err {err:.3e}")
    assert err < 1e-12, f"{name} df kernel drift on device: {err} (EFT rewrite?)"
print("OK")
"""


@pytest.mark.slow
def test_dfk_tpu_kernel_parity_on_device():
    """Jitted-on-TPU df kernels vs CPU f64 — guards the EFT rewrite
    hazard (an XLA toolchain that re-simplifies the protected two_sum
    would silently lose ~6 digits; bisected on-device in r1)."""
    import os
    import subprocess
    import sys as _sys

    from fem_shell_tpu.ops.elements import quad_shell_stiffness, tri_shell_stiffness

    dm, dp = (np.asarray(a, np.float64) for a in MAT.matrices())
    rng = np.random.default_rng(3)
    for name, fn, m in (("quad", quad_shell_stiffness, 4), ("tri", tri_shell_stiffness, 3)):
        corners = (
            np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float64)
            if m == 4
            else np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
        )
        xyz = rng.normal(size=(64, 1, 3)) * 5 + corners[None] + 0.1 * rng.normal(size=(64, m, 3))
        xyz_t = np.ascontiguousarray(xyz.transpose(1, 2, 0))
        f = jax.jit(
            jax.vmap(
                lambda p: fn(p, jnp.asarray(dm), jnp.asarray(dp), MAT.thickness),
                in_axes=2,
                out_axes=2,
            )
        )
        np.save(f"/tmp/dfk_parity_{name}_ref.npy", np.asarray(f(jnp.asarray(xyz_t))))
        np.save(f"/tmp/dfk_parity_{name}_xyz.npy", xyz_t)

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # NB: do NOT add the repo via PYTHONPATH — on this box a PYTHONPATH
    # entry breaks the axon TPU plugin registration. cwd + `-c` puts the
    # repo on sys.path already.
    env.pop("PYTHONPATH", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        out = subprocess.run(
            [_sys.executable, "-c", _TPU_PARITY_SCRIPT],
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
