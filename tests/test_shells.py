"""Scordelis-Lo roof — curved-shell golden benchmark
(fem_shell_tpu/shells.py; BASELINE.json configs[2] names this family).

Flat-facet shell elements converge to the MacNeal-Harder target 0.3024
from below; the pinned per-mesh values are the code-faithful regression
goldens and the Richardson extrapolation checks the physics lands on
the canonical number.
"""
import numpy as np
import pytest

from fem_shell_tpu.shells import (
    SCORDELIS_LO_GOLDEN_W,
    SCORDELIS_LO_MATERIAL,
    scordelis_lo,
)
from fem_shell_tpu.system import ShellSystem

# code-faithful midside deflections (DKQ facet roof, this implementation)
PINNED = {8: -0.28523, 16: -0.29379, 32: -0.29844}


def _solve(n, method="pcg"):
    mesh, forces, mid = scordelis_lo(n)
    sys = ShellSystem(mesh, SCORDELIS_LO_MATERIAL)
    u = sys.solve(forces, method=method, rtol=1e-12, maxiter=100000)
    return float(u[mid, 2])


@pytest.mark.parametrize("n", [8, 16])
def test_scordelis_lo_golden(n):
    w = _solve(n)
    np.testing.assert_allclose(w, PINNED[n], rtol=1e-4)
    # converging from below toward the canonical value, inside 6%
    assert SCORDELIS_LO_GOLDEN_W < w < 0.94 * SCORDELIS_LO_GOLDEN_W


def test_scordelis_lo_mg_matches_direct():
    """The geometric MG production path accepts the CURVED structured
    grid (rediscretized coarse levels on subsampled curved coords) and
    reproduces the direct solve."""
    import jax.numpy as jnp

    from fem_shell_tpu.mg import MultigridShellSystem

    mesh, forces, mid = scordelis_lo(16)
    mg = MultigridShellSystem(mesh, SCORDELIS_LO_MATERIAL, dtype=jnp.float64)
    u = mg.solve(forces, rtol=1e-11)
    np.testing.assert_allclose(float(u[mid, 2]), PINNED[16], rtol=1e-4)
    assert mg.last_cg.iters < 200


@pytest.mark.slow
def test_scordelis_lo_richardson():
    """Mesh halving gains ~2x accuracy; Richardson extrapolation of the
    16/32 pair must land within 1% of the canonical 0.3024."""
    w16, w32 = _solve(16), _solve(32)
    extrap = w32 + (w32 - w16)
    assert abs(extrap - SCORDELIS_LO_GOLDEN_W) < 0.01 * abs(SCORDELIS_LO_GOLDEN_W)
