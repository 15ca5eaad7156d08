"""Stand-alone solver CLI — the ``FEM-shell`` executable analog.

Mirrors the reference flag surface (fem-shell.cpp:194-267):
  -nu    Poisson's ratio (required)
  -e     Young's modulus E (required)
  -t     thickness (required)
  -mesh  input mesh file (*.xda, required; *_f force file by convention)
  -out   output file base name (optional; writes <out>.vtu + <out>.vtk)
  -d     debug output 1|0

plus TPU-native extras:
  --rtol      linear solver relative tolerance (default 1e-10; the
              -ksp_rtol analog of the PETSc flag pass-through layer,
              doc/implementation.tex:69-72)
  --maxiter   CG iteration cap (-ksp_max_it analog)
  --method    pcg | dense
  --precond   block_jacobi | jacobi | mg (geometric multigrid, structured
              grids) | amg (smoothed-aggregation AMG, arbitrary meshes)
  --f32       solve in float32 (TPU-native speed; f64 is the default for
              golden-accurate results)
  --df        double-float solve (two-f32 error-free arithmetic on the
              VPU: f64-class accuracy at ~2x emulated-f64 speed; TPU only)
  --refined   df solve + iterative refinement against the exact operator
              (with --precond mg: class tables on uniform grids; else the
              E-correction variant on any mesh)
  --devices   shard the solve over the first N local devices (SPMD domain
              decomposition; the mpirun -n N analog)

Output format follows the reference: per-node solution print
(fem-shell.cpp:156-176), then displaced-mesh export.
"""
from __future__ import annotations

import sys
from typing import List, Optional


def _parse(argv: List[str]):
    import argparse

    ap = argparse.ArgumentParser(
        prog="fem-shell",
        description="TPU-native flat-shell FEM solver (fem-shell analog)",
    )
    ap.add_argument("-nu", type=float, required=True, help="Poisson's ratio")
    ap.add_argument("-e", type=float, required=True, help="Young's modulus E")
    ap.add_argument("-t", type=float, required=True, help="thickness")
    ap.add_argument("-mesh", required=True, help="input mesh (*.xda)")
    ap.add_argument("-out", default=None, help="output base name (optional)")
    ap.add_argument("-d", type=int, default=0, help="debug messages 1|0")
    ap.add_argument("--rtol", type=float, default=1e-10)
    ap.add_argument("--maxiter", type=int, default=20000)
    ap.add_argument("--method", choices=("pcg", "dense"), default="pcg")
    ap.add_argument(
        "--precond",
        choices=("block_jacobi", "jacobi", "mg", "amg"),
        default="block_jacobi",
        help="mg = geometric multigrid V-cycle (structured grid meshes; "
        "mesh-independent iteration counts — the best preconditioner here); "
        "amg = smoothed-aggregation algebraic multigrid (arbitrary meshes)",
    )
    ap.add_argument(
        "--reorder",
        choices=("rcm",),
        default=None,
        help="bandwidth-reduce the node numbering (reverse Cuthill-McKee) "
        "before solving — unstructured meshes get SoA-operator locality",
    )
    ap.add_argument(
        "--stress",
        action="store_true",
        help="recover element stresses (membrane sigma, bending moments, "
        "surface von Mises) and add them to the -out files",
    )
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--df", action="store_true")
    ap.add_argument(
        "--refined",
        action="store_true",
        help="df solve + iterative refinement against the exact operator "
        "(class tables on uniform grids via --precond mg, E-correction "
        "on any mesh otherwise); implies --df",
    )
    ap.add_argument("--devices", type=int, default=1)
    return ap.parse_args(argv)


def main(argv: Optional[List[str]] = None) -> int:
    args = _parse(sys.argv[1:] if argv is None else argv)

    import jax

    if not args.f32 or args.df or args.refined or args.precond == "amg":
        # df/refined need x64 for their (cheap, O(N)) f64 scalar/boundary
        # stages; the AMG hierarchy is built in f64
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from fem_shell_tpu.io.vtk import write_legacy_vtk, write_vtu
    from fem_shell_tpu.materials import Material
    from fem_shell_tpu.mesh import load_mesh_and_forces
    from fem_shell_tpu.system import ShellSystem

    print(
        f"Run program with parameters: debug messages = "
        f"{'true' if args.d else 'false'}, nu = {args.nu}, E = {args.e}, "
        f"t = {args.t}, mesh file = {args.mesh}"
        + (f", out-file = {args.out}" if args.out else "")
    )
    mesh, forces = load_mesh_and_forces(args.mesh)
    print(
        f"Mesh: {mesh.n_nodes} nodes, {mesh.n_elems} elements "
        f"({len(mesh.tri)} tri, {len(mesh.quad)} quad), {mesh.n_dofs} dofs"
    )
    if not np.any(forces):
        print(
            "WARNING: all nodal loads are zero (missing or empty "
            f"'{args.mesh.rsplit('.',1)[0]}_f' force file?) — solution will be zero."
        )
    material = Material(nu=args.nu, em=args.e, thickness=args.t)
    dtype = jnp.float32 if args.f32 else jnp.float64

    if args.devices > 1:
        from fem_shell_tpu.parallel.sharded import ShardedShellSystem, make_device_mesh

        if args.precond == "mg":
            from fem_shell_tpu.parallel.mg_shard import ShardedMGShellSystem

            system = ShardedMGShellSystem(
                mesh, material, make_device_mesh(args.devices), dtype=dtype
            )
        else:
            system = ShardedShellSystem(mesh, material, make_device_mesh(args.devices), dtype=dtype)
        u = np.asarray(system.solve(forces, rtol=args.rtol, maxiter=args.maxiter))
        iters, res = system.last_iters, system.last_residual
    elif args.precond == "mg":
        from fem_shell_tpu.mg import MultigridShellSystem, detect_structured_grid

        if detect_structured_grid(mesh) is None:
            print("ERROR: --precond mg needs a row-major structured grid mesh.")
            return 2
        mg_dtype = (
            jnp.float32 if (args.f32 or args.df or args.refined) else jnp.float64
        )
        system = MultigridShellSystem(
            mesh, material, dtype=mg_dtype, df_operator=args.refined
        )
        if args.refined:
            u = np.asarray(
                system.solve_df_refined(forces, rtol=args.rtol, maxiter=args.maxiter)
            )
            iters, res = system.last_iters, system.last_residual
        elif args.df:
            u = np.asarray(system.solve_df(forces, rtol=args.rtol, maxiter=args.maxiter))
            iters, res = system.last_iters, system.last_residual
        else:
            u = np.asarray(system.solve(forces, rtol=args.rtol, maxiter=args.maxiter))
            iters, res = int(system.last_cg.iters), float(system.last_cg.residual)
    elif args.precond == "amg":
        from fem_shell_tpu.amg import AMGShellSystem

        use_df = args.df or args.refined
        amg_dtype = jnp.float32 if (args.f32 or use_df) else jnp.float64
        system = AMGShellSystem(
            mesh, material, dtype=amg_dtype, df=use_df,
            reorder=args.reorder or "rcm",
        )
        if args.refined:
            # the eager residual path is required on CPU (LLVM's FMA
            # contraction breaks the error-free transforms there)
            u = np.asarray(
                system.solve_df_refined(
                    forces, rtol=args.rtol, inner_maxiter=args.maxiter,
                    jit_residual=jax.devices()[0].platform != "cpu",
                )
            )
        elif args.df:
            u = np.asarray(system.solve_df(forces, rtol=args.rtol, maxiter=args.maxiter))
        else:
            u = np.asarray(system.solve(forces, rtol=args.rtol, maxiter=args.maxiter))
        iters, res = system.last_iters, system.last_residual
    elif args.df or args.refined or args.reorder:
        from fem_shell_tpu.large import LargeShellSystem

        system = LargeShellSystem(mesh, material, dtype=jnp.float64, reorder=args.reorder)
        if args.refined:
            u = np.asarray(
                system.solve_df_refined(
                    forces, rtol=args.rtol, inner_maxiter=args.maxiter
                )
            )
            iters, res = system.last_iters, system.last_residual
        elif args.df:
            u = np.asarray(system.solve_df(forces, rtol=args.rtol, maxiter=args.maxiter))
            iters, res = system.last_iters, system.last_residual
        else:
            pc = args.precond if args.precond in ("jacobi", "block_jacobi") else "block_jacobi"
            u = np.asarray(system.solve(forces, rtol=args.rtol, maxiter=args.maxiter, precond=pc))
            iters, res = int(system.last_cg.iters), float(system.last_cg.residual)
    else:
        system = ShellSystem(mesh, material, dtype=dtype)
        u = np.asarray(
            system.solve(
                forces,
                method=args.method,
                rtol=args.rtol,
                maxiter=args.maxiter,
                precond=args.precond,
            )
        )
        if args.method == "pcg":
            iters, res = int(system.last_cg.iters), float(system.last_cg.residual)
        else:
            iters, res = 0, 0.0
    if args.method == "pcg":
        print(f"Linear solve: {iters} CG iterations, relative residual {res:.3e}")
        import math

        if not math.isfinite(res):
            print("ERROR: linear solve diverged (non-finite residual) — "
                  "check material parameters and boundary conditions.")
            return 2
        if res > args.rtol * 10:
            print(f"WARNING: solver stopped above the requested tolerance "
                  f"({res:.2e} > {args.rtol:.0e}); increase --maxiter.")

    if args.d:
        print("Solution: u_vec = [")
        for i in range(mesh.n_nodes):
            print(
                f"u= {u[i,0]:.6g}, v= {u[i,1]:.6g}, w= {u[i,2]:.6g}, "
                f"tx= {u[i,3]:.6g}, ty= {u[i,4]:.6g}, tz= {u[i,5]:.6g}"
            )
        print("]")

    if args.out:
        point_data = {}
        cell_data = {}
        if args.stress:
            from fem_shell_tpu.ops.recovery import (
                recover_stresses,
                recover_stresses_nodal,
                to_mesh_order,
            )

            field = recover_stresses(mesh, material, u)
            nodal = recover_stresses_nodal(mesh, material, u)
            point_data["von_mises"] = nodal.vm
            point_data["moments"] = nodal.moments
            point_data["sigma_membrane"] = nodal.sigma_m
            cell_data["von_mises"] = to_mesh_order(mesh, field.vm)
            cell_data["moments"] = to_mesh_order(mesh, field.moments)
            cell_data["sigma_membrane"] = to_mesh_order(mesh, field.sigma_m)
            print(f"Stress recovery: peak von Mises {nodal.vm.max():.6g} "
                  f"(nodal), {field.vm.max():.6g} (element centers)")
        write_vtu(
            mesh,
            args.out + ".vtu",
            displacement=u,
            displace=True,
            point_data=point_data,
            cell_data=cell_data,
        )
        write_legacy_vtk(
            mesh, args.out + ".vtk", displacement=u, displace=True, point_data=point_data
        )
        wrote = [args.out + ".vtu", args.out + ".vtk"]
        try:
            from fem_shell_tpu.io.exodus import write_exodus

            write_exodus(mesh, args.out + ".e", displacements=u)
            wrote.append(args.out + ".e")
        except RuntimeError:
            pass  # scipy unavailable; VTK outputs cover visualization
        print("Wrote " + " and ".join(wrote))

    print("All done :)")
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
