"""Element kernels, assembly and sparse operators (the numerical core)."""

from fem_shell_tpu.ops.elements import (
    quad_shell_stiffness,
    tri_shell_stiffness,
    batched_quad_stiffness,
    batched_tri_stiffness,
)

__all__ = [
    "tri_shell_stiffness",
    "quad_shell_stiffness",
    "batched_tri_stiffness",
    "batched_quad_stiffness",
]
