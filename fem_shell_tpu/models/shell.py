"""Flagship model wrapper: a jittable 'forward step' view of the shell
solver, for harnesses that expect (fn, example_args) entry points.

The 'model' of this framework is the linear shell boundary-value problem;
its 'forward step' is assemble+solve: forces -> displacements given node
coordinates (both differentiable — the whole pipeline is pure JAX, so
jax.grad through the solve gives force/shape sensitivities for free, a
capability the reference C++ stack does not have).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.system import ShellSystem


def make_plate_system(
    n: int = 16,
    elem_type: str = "q",
    dtype=jnp.float32,
    material: Material | None = None,
) -> Tuple[ShellSystem, np.ndarray]:
    """Reference Test-D/G style simply-supported plate under uniform load."""
    material = material or Material(nu=0.3, em=1e7, thickness=0.5)
    p = MeshGenParams(
        elem_type, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, elem_type == "q", "z"
    )
    mesh, rows, fac = generate(p)
    return ShellSystem(mesh, material, dtype=dtype), (rows * fac)


def forward_step_fn(system: ShellSystem, rtol: float = 1e-6, maxiter: int = 500):
    """A jittable fn(coords, forces) -> displacements for the given system."""

    def fn(coords, forces):
        x, _ = system._solve_pcg_impl(coords, forces, rtol, maxiter)
        return x

    return fn
