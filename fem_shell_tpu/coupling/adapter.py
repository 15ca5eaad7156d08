"""Coupled structure solver — the ``FEM-shell-precice`` analog
(fem-shell_precice.cpp:18-419).

Runs the shell solver inside an implicit coupling loop: discovers the
coupling interface from boundary ids {2, 20, 21}
(fem-shell_precice.cpp:62-70), registers interface vertices with dead-axis
handling (:89-145), exchanges delta displacements / forces per coupling
iteration (:282-323 — including the forces-read-at-end-of-iteration lag),
and writes per-timestep output with displaced geometry (:377-408).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np

from fem_shell_tpu.coupling.api import (
    Participant,
    action_read_iteration_checkpoint,
    action_write_initial_data,
    action_write_iteration_checkpoint,
)
from fem_shell_tpu.coupling.m2n import Transport
from fem_shell_tpu.materials import Material
from fem_shell_tpu.mesh import ShellMesh

_AXIS_COLS = {
    # dead axis -> the two global coordinate columns of the 2D coupling plane
    "z": (0, 1),  # xy-plane (fem-shell_precice.cpp:122-126)
    "y": (0, 2),  # xz-plane (:127-131)
    "x": (1, 2),  # yz-plane (:132-136)
}


@dataclasses.dataclass
class CoupledRunResult:
    timesteps: int
    solutions: np.ndarray  # [T, N, 6] per-timestep converged solutions
    iterations: list


def run_structure(
    mesh: ShellMesh,
    material: Material,
    config,
    dt: float = 0.01,
    dead_axis: str = "y",
    solver_name: str = "STRUCTURE",
    transport: Optional[Transport] = None,
    on_timestep: Optional[Callable[[int, np.ndarray], None]] = None,
    rtol: float = 1e-10,
    maxiter: int = 20000,
    max_timesteps: Optional[int] = None,
    dtype=None,
    devices: int = 1,
) -> CoupledRunResult:
    """Execute the coupled structure solve until the coupling ends.

    ``on_timestep(t, sols)`` is invoked after each converged timestep with the
    full [N,6] solution (the per-timestep output hook,
    fem-shell_precice.cpp:377-408).
    """
    import jax.numpy as jnp

    from fem_shell_tpu.system import ShellSystem

    interface = Participant(solver_name, config, 0, 1, transport=transport)
    dims = interface.get_dimensions()

    # ---- interface discovery (bc ids 2/20/21), sorted by node id
    iface_nodes = mesh.coupling_node_ids()
    n_iface = len(iface_nodes)
    if dims == 2:
        if dead_axis not in _AXIS_COLS:
            raise ValueError(
                "coupling is 2D but no valid dead axis given (allowed: x/y/z)"
            )
        cols = _AXIS_COLS[dead_axis]
        grid = mesh.coords[iface_nodes][:, cols]
    else:
        grid = mesh.coords[iface_nodes]

    mesh_id = interface.get_mesh_id("Structure_Nodes")
    displ_id = interface.get_data_id("Displacements", mesh_id)
    force_id = interface.get_data_id("Stresses", mesh_id)
    vertex_ids = interface.set_mesh_vertices(mesh_id, grid)

    interface.initialize()
    displ = np.zeros((n_iface, dims))
    if interface.is_action_required(action_write_initial_data()):
        interface.write_block_vector_data(displ_id, vertex_ids, displ)
        interface.fulfilled_action(action_write_initial_data())
    interface.initialize_data()
    iface_forces = np.zeros((n_iface, dims))
    if interface.is_read_data_available():
        iface_forces = interface.read_block_vector_data(force_id, vertex_ids)

    dtype = dtype if dtype is not None else jnp.float64
    if devices > 1:
        # device-parallel structure participant — the analog of the
        # reference's MPI-parallel solver under preCICE master mode
        # (precice_config_mpi.xml, doc/coupling.tex:178-224): the coupling
        # surface stays whole on the host; the solve is SPMD inside.
        from fem_shell_tpu.parallel.sharded import ShardedShellSystem, make_device_mesh

        sharded = ShardedShellSystem(mesh, material, make_device_mesh(devices), dtype=dtype)

        def repeat_solve(f):
            u = sharded.solve(f, rtol=rtol, maxiter=maxiter)
            return u, sharded.last_iters, sharded.last_residual

        system = sharded
    else:
        system = ShellSystem(mesh, material, dtype=dtype)
        # geometry is fixed across the whole coupled run: assemble + factor
        # the preconditioner ONCE instead of per coupling iteration (the
        # reference re-assembles in every equation_systems.solve(),
        # fem-shell_precice.cpp:271)
        repeat_solve = system.make_repeat_solver(rtol=rtol, maxiter=maxiter)

    n = mesh.n_nodes
    pre_sols = np.zeros((n, 6))
    solutions = []
    iters = []
    t = 0

    while interface.is_coupling_ongoing():
        if interface.is_action_required(action_write_iteration_checkpoint()):
            # solver is quasi-static/stateless — nothing to checkpoint
            # (fem-shell_precice.cpp:259-265)
            interface.fulfilled_action(action_write_iteration_checkpoint())

        # scatter current interface forces into the [N,6] load vector
        forces = np.zeros((n, 6))
        if dims == 3:
            forces[iface_nodes, 0:3] = iface_forces
        else:
            c0, c1 = _AXIS_COLS[dead_axis]
            forces[iface_nodes, c0] = iface_forces[:, 0]
            forces[iface_nodes, c1] = iface_forces[:, 1]

        u, n_it, _res = repeat_solve(forces)
        sols = np.asarray(u)
        iters.append(int(n_it))

        # delta displacements on the interface (fem-shell_precice.cpp:282-317)
        if dims == 3:
            displ = sols[iface_nodes, 0:3] - pre_sols[iface_nodes, 0:3]
        else:
            c0, c1 = _AXIS_COLS[dead_axis]
            displ = np.stack(
                [
                    sols[iface_nodes, c0] - pre_sols[iface_nodes, c0],
                    sols[iface_nodes, c1] - pre_sols[iface_nodes, c1],
                ],
                axis=1,
            )
        interface.write_block_vector_data(displ_id, vertex_ids, displ)
        interface.advance(dt)
        iface_forces = interface.read_block_vector_data(force_id, vertex_ids)

        if interface.is_action_required(action_read_iteration_checkpoint()):
            interface.fulfilled_action(action_read_iteration_checkpoint())  # iterate
        else:
            # timestep complete: update preSols on interface dofs only
            # (fem-shell_precice.cpp:336-374)
            if dims == 3:
                pre_sols[iface_nodes, 0:3] = sols[iface_nodes, 0:3]
            else:
                c0, c1 = _AXIS_COLS[dead_axis]
                pre_sols[iface_nodes, c0] = sols[iface_nodes, c0]
                pre_sols[iface_nodes, c1] = sols[iface_nodes, c1]
            solutions.append(sols)
            if on_timestep is not None:
                on_timestep(t, sols)
            t += 1
            if max_timesteps is not None and t >= max_timesteps:
                break

    interface.finalize()
    return CoupledRunResult(timesteps=t, solutions=np.array(solutions), iterations=iters)
