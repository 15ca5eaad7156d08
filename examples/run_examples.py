#!/usr/bin/env python3
"""Run the reference's canonical examples A-G end-to-end — the
run_examples.sh analog (src/fem-shell/run_examples.sh:35-48).

Generates every mesh (structured ones via the meshgen analog, hand-made
A/B/E from embedded data), runs the solver CLI with the reference's
material parameters, writes ParaView outputs to examples/out/, and prints
the computed key displacements next to the reference golden values.

Usage:  python examples/run_examples.py [--with-g]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# the reference executables run in double precision; without this the
# examples silently solve in f32 (borderline on B/D, NaN on the
# t=0.01 Test-F plate whose kappa is far beyond f32 PCG)
jax.config.update("jax_enable_x64", True)

import numpy as np


def build_meshes(mesh_dir: str):
    from fem_shell_tpu.data import test_a, test_b, test_e
    from fem_shell_tpu.mesh import ShellMesh, write_forces, write_xda
    from fem_shell_tpu.meshgen import MeshGenParams, write_files

    os.makedirs(mesh_dir, exist_ok=True)

    def emit_data(mod, name, tris=None, quads=None):
        conn = tris if tris is not None else quads
        m = conn.shape[1]
        ne = conn.shape[0]
        if m == 3:
            conn4 = np.hstack([conn, np.full((ne, 1), -1, np.int32)])
            types = np.full(ne, 3, np.int32)
        else:
            conn4, types = conn, np.full(ne, 5, np.int32)
        mesh = ShellMesh(mod.COORDS, types, conn4, mod.BOUNDARY_SIDES)
        base = os.path.join(mesh_dir, name)
        write_xda(mesh, base + ".xda")
        write_forces(base + "_f", mesh.n_nodes, 1.0, mod.FORCES)
        return base

    paths = {}
    paths["A"] = emit_data(test_a, "test_A_uv_t", tris=test_a.TRIS)
    paths["B"] = emit_data(test_b, "test_B_uv_q", quads=test_b.QUADS)
    paths["E"] = emit_data(test_e, "test_E_uvw_t", tris=test_e.TRIS)
    gen = {
        "C": MeshGenParams("t", 16, 16, 0, 0, 10, 10, (0, 0, 0, 0), 1.0, 1, False, "z"),
        "D": MeshGenParams("q", 16, 16, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z"),
        "F": MeshGenParams("q", 32, 32, 0, 0, 10, 2, (0, 0, 0, 0), 1e-4, 2, True, "z"),
        "G": MeshGenParams("q", 64, 64, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z"),
    }
    names = {
        "C": "test_C_w_tA16",
        "D": "test_D_w_q_uni16",
        "F": "test_F_032_ss_uni",
        "G": "test_G_mpi_64_q",
    }
    for key, p in gen.items():
        base = os.path.join(mesh_dir, names[key])
        write_files(p, base)
        paths[key] = base
    return paths


CASES = {
    # key: (nu, E, t, description, [(node, dof, golden)])
    "A": (0.25, 30000, 1.0, "Tri-3 membrane cantilever",
          [(22, 0, -0.0255988), (22, 1, 0.0629549), (26, 0, -0.0342621), (26, 1, 0.1944070)]),
    "B": (0.25, 30000, 1.0, "Quad-4 membrane cantilever",
          [(22, 0, -0.0427728), (22, 1, 0.1012620), (26, 0, -0.0570728), (26, 1, 0.3160560)]),
    "C": (0.3, 10.92, 1.0, "Tri-3 plate (Specht), center point load",
          [(144, 2, 1.15169)]),
    "D": (0.3, 1e7, 0.5, "Quad-4 plate (DKQ), uniform load",
          [(144, 2, 0.106454)]),
    "E": (0.25, 10000, 0.25, "Shell I-beam under torsion pair",
          [(35, 0, 0.0160531), (35, 1, 0.0894880), (35, 2, -0.1560594)]),
    "F": (0.3, 1.7472e7, 0.01, "Convergence plate 1:5, 32x32 SS uniform",
          [(544, 2, 12.9640e-6)]),
    "G": (0.3, 1e7, 0.5, "64x64 plate (25,350 dof)",
          [(2112, 2, 0.106465)]),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--with-g", action="store_true", help="include the large Test G")
    ap.add_argument("--devices", type=int, default=1)
    args = ap.parse_args()

    from fem_shell_tpu.materials import Material
    from fem_shell_tpu.mesh import load_mesh_and_forces
    from fem_shell_tpu.system import ShellSystem
    from fem_shell_tpu.io.vtk import write_vtu

    here = os.path.dirname(os.path.abspath(__file__))
    mesh_dir = os.path.join(here, "meshes")
    out_dir = os.path.join(here, "out")
    os.makedirs(out_dir, exist_ok=True)
    paths = build_meshes(mesh_dir)

    keys = [k for k in "ABCDEF"] + (["G"] if args.with_g else [])
    failures = 0

    # Scordelis-Lo roof (curved-shell benchmark; fem_shell_tpu/shells.py)
    from fem_shell_tpu.shells import SCORDELIS_LO_MATERIAL, scordelis_lo

    mesh_r, forces_r, mid = scordelis_lo(16)
    sys_r = ShellSystem(mesh_r, SCORDELIS_LO_MATERIAL)
    u_r = np.asarray(sys_r.solve(forces_r, rtol=1e-12, maxiter=100000))
    write_vtu(mesh_r, os.path.join(out_dir, "test_roof.vtu"),
              displacement=u_r, displace=True)
    w_r = u_r[mid, 2]
    rel_r = abs(w_r - (-0.29379)) / 0.29379
    ok_r = rel_r < 1e-3
    failures += 0 if ok_r else 1
    print("Test roof: Scordelis-Lo barrel vault 16x16 (canonical -0.3024 "
          "at convergence)")
    print(f"  midside w: {w_r:+.6f}  (16x16 golden -0.293790, rel diff "
          f"{rel_r:.1e}) {'OK' if ok_r else 'MISMATCH'}")

    for key in keys:
        nu, em, t, desc, checks = CASES[key]
        mesh, forces = load_mesh_and_forces(paths[key] + ".xda")
        system = ShellSystem(mesh, Material(nu, em, t))
        u = np.asarray(system.solve(forces))
        write_vtu(mesh, os.path.join(out_dir, f"test_{key}.vtu"), displacement=u, displace=True)
        print(f"Test {key}: {desc}")
        for node, dof, golden in checks:
            got = u[node, dof]
            rel = abs(got - golden) / max(abs(golden), 1e-30)
            ok = rel < 1e-4
            failures += 0 if ok else 1
            print(
                f"  node {node} dof {dof}: {got:+.7g}  (reference {golden:+.7g}, "
                f"rel diff {rel:.1e}) {'OK' if ok else 'MISMATCH'}"
            )
    print("....all examples finished!" + ("" if not failures else f"  ({failures} MISMATCHES)"))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
