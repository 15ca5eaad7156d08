"""fem_shell_tpu — a TPU-native flat-shell finite-element framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
reference C++/libMesh/PETSc/preCICE solver ``fem-shell``
(see /root/reference; README.md:4-13): linear-elastic flat shell elements
(Tri-3 = CST membrane + Specht plate, Quad-4 = bilinear membrane + DKQ
plate, 6 DOF/node with stabilized drilling DOF), assembled and solved
end-to-end on TPU via vmapped element kernels, block-ELL sparse operators,
Jacobi-preconditioned CG under ``jax.jit``, and SPMD domain decomposition
with ``shard_map`` over a ``jax.sharding.Mesh`` (the MPI analog).

Subsystems
----------
- :mod:`fem_shell_tpu.mesh`      — device-array mesh (libMesh Mesh analog)
- :mod:`fem_shell_tpu.meshgen`   — structured mesh generator (meshGen analog)
- :mod:`fem_shell_tpu.ops`       — element stiffness kernels + assembly + SpMV
- :mod:`fem_shell_tpu.solver`    — dense & PCG linear solvers (PETSc KSP analog)
- :mod:`fem_shell_tpu.system`    — ShellSystem orchestration (EquationSystems analog)
- :mod:`fem_shell_tpu.parallel`  — partitioning + sharded assembly/solve (MPI analog)
- :mod:`fem_shell_tpu.coupling`  — partitioned FSI coupling (preCICE analog)
- :mod:`fem_shell_tpu.io`        — XDA/VTK I/O (libMesh I/O analog)
- :mod:`fem_shell_tpu.utils`     — CLI, profiling, logging
"""

__version__ = "0.1.0"

from fem_shell_tpu.materials import Material, material_matrices
from fem_shell_tpu.mesh import ShellMesh, read_forces, read_xda

__all__ = [
    "Material",
    "material_matrices",
    "ShellMesh",
    "read_xda",
    "read_forces",
    "ShellSystem",
    "__version__",
]


def __getattr__(name):
    # Lazy: ShellSystem pulls in jax; mesh/meshgen-only users (and the
    # meshgen CLI) must not pay for (or depend on) accelerator init.
    if name == "ShellSystem":
        from fem_shell_tpu.system import ShellSystem

        return ShellSystem
    raise AttributeError(f"module 'fem_shell_tpu' has no attribute {name!r}")
