"""Pallas-resident df element kernel tests (ops/pallas_elem.py).

The module re-executes the element-stiffness jaxpr inside a Pallas
kernel, rewriting gathers/scatters into slices/pads and routing constant
arrays through kernel inputs (reference hot-loop analog:
fem-shell.cpp:1160-1233, Ke evaluation). Two protection layers:

1. BIT-parity of the interpreter rewrite (CPU, eager): df_eval_jaxpr_pl
   evaluated eagerly (op-by-op — no XLA fusion, so the error-free
   transforms are exact on CPU, see ops/df.py) must produce EXACTLY the
   same hi/lo pairs as the production df_function_bl interpretation.
   This pins the gather->strided-slice, scatter->mask+spread, and
   constant-folding rewrites as value-preserving.
2. Interpret-mode pallas_call (CPU): end-to-end through the kernel
   machinery (ConstPool inputs, BlockSpecs, tiling) against the f64
   vmapped oracle at the CPU-contraction tolerance (compiled CPU code
   FMA-contracts the EFTs; exact parity is asserted on device by
   tools/run_tpu_tests.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_shell_tpu.materials import Material
from fem_shell_tpu.ops.df import DF
from fem_shell_tpu.ops.dfk import df_function_bl
from fem_shell_tpu.ops.elements import quad_shell_stiffness, tri_shell_stiffness

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def _kernel_fn(m):
    dm64, dp64 = MAT.matrices()
    dm = jnp.asarray(dm64, jnp.float64)
    dp = jnp.asarray(dp64, jnp.float64)
    base = tri_shell_stiffness if m == 3 else quad_shell_stiffness
    return lambda p: base(p, dm, dp, 0.5)


def _coords(m, e, seed=0):
    rng = np.random.default_rng(seed)
    xyz = np.zeros((m, 3, e))
    if m == 3:
        xyz[:, 0, :] = rng.uniform(0.0, 10.0, (m, e))
        xyz[:, 1, :] = rng.uniform(0.0, 10.0, (m, e))
    else:
        base = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
        xyz[:, 0, :] = base[:, 0:1] * 4 + rng.uniform(0, 0.5, (m, e))
        xyz[:, 1, :] = base[:, 1:2] * 4 + rng.uniform(0, 0.5, (m, e))
    hi = xyz.astype(np.float32)
    lo = (xyz - hi.astype(np.float64)).astype(np.float32)
    return xyz, hi, lo


@pytest.mark.parametrize("m", [3, 4])
def test_pl_interpreter_bit_parity_eager(m):
    """The pallas-mode jaxpr rewrites are value-preserving: eager
    (unjitted, EFT-exact on CPU) evaluation must match df_function_bl
    bit for bit."""
    from fem_shell_tpu.ops import pallas_elem as pe

    kfn = _kernel_fn(m)
    e = 8
    _, hi, lo = _coords(m, e)
    x = DF(jnp.asarray(hi), jnp.asarray(lo))

    (ref,) = df_function_bl(kfn)(x)

    closed = jax.make_jaxpr(kfn)(jax.ShapeDtypeStruct((m, 3), jnp.float64))
    pool = pe.ConstPool()
    pe._POOL = pool
    try:
        (got,) = pe.df_eval_jaxpr_pl(closed.jaxpr, list(closed.consts), x)
    finally:
        pe._POOL = None

    np.testing.assert_array_equal(np.asarray(got.hi), np.asarray(ref.hi))
    np.testing.assert_array_equal(np.asarray(got.lo), np.asarray(ref.lo))


@pytest.mark.slow
@pytest.mark.parametrize("m", [3])
def test_pallas_elem_interpret_matches_oracle(m):
    """End-to-end pallas_call machinery in interpret mode vs the f64
    oracle (loose tolerance: compiled CPU FMA-contracts the EFTs)."""
    from fem_shell_tpu.ops.pallas_elem import elem_stiffness_pallas

    kfn = _kernel_fn(m)
    e = 128
    xyz, hi, lo = _coords(m, e)
    call = elem_stiffness_pallas(kfn, m, tile_e=128, interpret=True)
    ke = call(DF(jnp.asarray(hi), jnp.asarray(lo)))
    assert ke.hi.shape == (6 * m, 6 * m, e)

    ke64 = jax.vmap(kfn)(jnp.asarray(np.moveaxis(xyz, 2, 0)))
    ref = np.moveaxis(np.asarray(ke64), 0, 2)
    got = np.asarray(ke.hi, np.float64) + np.asarray(ke.lo, np.float64)
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 1e-5, err
