"""Solver CLI + VTK writer tests (the run_examples.sh analog surface)."""
import os
import re
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from fem_shell_tpu.meshgen import MeshGenParams, write_files
from fem_shell_tpu.utils.cli import main as cli_main


@pytest.fixture()
def plate(tmp_path):
    p = MeshGenParams("q", 8, 8, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    base = str(tmp_path / "plate")
    write_files(p, base)
    return base


def test_cli_solve_and_export(plate, capsys):
    rc = cli_main(["-nu", "0.3", "-e", "1e7", "-t", "0.5", "-mesh", plate + ".xda", "-out", plate])
    assert rc == 0
    out = capsys.readouterr().out
    assert "All done :)" in out
    assert "CG iterations" in out

    tree = ET.parse(plate + ".vtu")
    assert tree.getroot().tag == "VTKFile"
    txt = open(plate + ".vtu").read()
    m = re.search(r'Name="displacement"[^>]*>\n(.*?)</DataArray>', txt, re.S)
    vals = np.array([[float(v) for v in l.split()] for l in m.group(1).strip().split("\n")])
    # golden: Test-D 8x8 uniform center deflection 0.106405
    assert abs(np.abs(vals[:, 2]).max() - 0.106405) < 1e-4
    assert os.path.exists(plate + ".vtk")


def test_cli_zero_force_warning(plate, capsys):
    os.remove(plate + "_f")
    cli_main(["-nu", "0.3", "-e", "1e7", "-t", "0.5", "-mesh", plate + ".xda"])
    out = capsys.readouterr().out
    assert "WARNING: all nodal loads are zero" in out


def test_cli_dense_method(plate, capsys):
    rc = cli_main(
        ["-nu", "0.3", "-e", "1e7", "-t", "0.5", "-mesh", plate + ".xda", "--method", "dense", "-d", "1"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "u= " in out  # debug solution print (fem-shell.cpp:156-176 analog)


def test_legacy_vtk_content(plate, tmp_path):
    from fem_shell_tpu.io.vtk import write_legacy_vtk
    from fem_shell_tpu.mesh import read_xda

    mesh = read_xda(plate + ".xda")
    u = np.zeros((mesh.n_nodes, 6))
    u[:, 2] = 1.0
    path = str(tmp_path / "o.vtk")
    write_legacy_vtk(mesh, path, displacement=u, displace=True)
    txt = open(path).read()
    assert "DATASET UNSTRUCTURED_GRID" in txt
    assert "VECTORS displacement double" in txt
    assert f"POINTS {mesh.n_nodes} double" in txt


def test_cli_amg_precond(plate, capsys):
    """--precond amg drives AMGShellSystem on an arbitrary mesh through
    the reference-compatible driver (unstructured production path)."""
    rc = cli_main(
        ["-nu", "0.3", "-e", "1e7", "-t", "0.5", "-mesh", plate + ".xda",
         "--precond", "amg", "-out", plate]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "All done :)" in out
    txt = open(plate + ".vtu").read()
    m = re.search(r'Name="displacement"[^>]*>\n(.*?)</DataArray>', txt, re.S)
    vals = np.array([[float(v) for v in l.split()] for l in m.group(1).strip().split("\n")])
    assert abs(np.abs(vals[:, 2]).max() - 0.106405) < 1e-4


def test_cli_amg_refined(plate, capsys):
    """--precond amg --refined: AMG-df + E-corrected refinement through
    the CLI (f64-class accuracy on any mesh)."""
    rc = cli_main(
        ["-nu", "0.3", "-e", "1e7", "-t", "0.5", "-mesh", plate + ".xda",
         "--precond", "amg", "--refined", "-out", plate]
    )
    assert rc == 0
    txt = open(plate + ".vtu").read()
    m = re.search(r'Name="displacement"[^>]*>\n(.*?)</DataArray>', txt, re.S)
    vals = np.array([[float(v) for v in l.split()] for l in m.group(1).strip().split("\n")])
    assert abs(np.abs(vals[:, 2]).max() - 0.106405) < 1e-4
