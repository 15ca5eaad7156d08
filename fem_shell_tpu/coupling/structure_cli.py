"""Coupled structure solver CLI — the ``FEM-shell-precice`` executable
analog (fem-shell_precice.cpp:428-526 flag surface):
  -nu -e -t -mesh [-out] [-d] -config -dt [-axis x|y|z]

Connects to the FLUID participant over the configured m2n (TCP sockets)
and runs the implicit coupling loop, writing per-timestep VTU output when
-out is given (out_%04d.vtu, displaced geometry;
fem-shell_precice.cpp:1526-1561).
"""
from __future__ import annotations

import sys
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="fem-shell-precice")
    ap.add_argument("-nu", type=float, required=True)
    ap.add_argument("-e", type=float, required=True)
    ap.add_argument("-t", type=float, required=True)
    ap.add_argument("-mesh", required=True)
    ap.add_argument("-out", default=None)
    ap.add_argument("-d", type=int, default=0)
    ap.add_argument("-config", required=True, help="coupling XML configuration")
    ap.add_argument("-dt", type=float, required=True)
    ap.add_argument("-axis", default="0", help="dead axis for 2D coupling (x|y|z)")
    ap.add_argument("--rtol", type=float, default=1e-10)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--devices", type=int, default=1,
                    help="device-parallel structure solve (MPI-participant analog)")
    args = ap.parse_args(sys.argv[1:] if argv is None else argv)

    import jax

    jax.config.update("jax_enable_x64", True)

    from fem_shell_tpu.coupling.adapter import run_structure
    from fem_shell_tpu.io.vtk import write_vtu
    from fem_shell_tpu.materials import Material
    from fem_shell_tpu.mesh import load_mesh_and_forces

    print("Starting Structure Solver...")
    mesh, _ = load_mesh_and_forces(args.mesh)
    print(
        f"Mesh: {mesh.n_nodes} nodes, {mesh.n_elems} elements, "
        f"{len(mesh.coupling_node_ids())} coupling interface nodes"
    )

    def on_timestep(t, sols):
        print(f"Advancing in time, finished timestep: {t}")
        if args.out:
            write_vtu(mesh, f"{args.out}_{t:04d}.vtu", displacement=sols, displace=True)

    result = run_structure(
        mesh,
        Material(nu=args.nu, em=args.e, thickness=args.t),
        args.config,
        dt=args.dt,
        dead_axis=args.axis,
        on_timestep=on_timestep,
        rtol=args.rtol,
        max_timesteps=args.steps,
        devices=args.devices,
    )
    print(f"Exiting Structure Solver ({result.timesteps} timesteps)")
    print("All done :)")
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
