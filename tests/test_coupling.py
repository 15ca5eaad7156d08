"""Coupling subsystem tests — the reference Test-H analog
(doc/validation.tex:717-786) plus unit tests for the IQN-ILS
acceleration, NN mapping, config parser, and socket m2n transport."""
import os
import threading

import numpy as np
import pytest

from fem_shell_tpu.coupling.accel import IQNILS, ConstantRelaxation
from fem_shell_tpu.coupling.config import parse_config
from fem_shell_tpu.coupling.demo import CONFIG, run_demo, tower_mesh
from fem_shell_tpu.coupling.m2n import InProcessTransport, SocketTransport
from fem_shell_tpu.coupling.mapping import NearestNeighborMapping


# ----------------------------------------------------------------------
# unit pieces
# ----------------------------------------------------------------------


def test_config_parser():
    cfg = parse_config(CONFIG)
    assert cfg.dimensions == 2
    assert set(cfg.meshes) == {"Fluid_Nodes", "Structure_Nodes"}
    assert cfg.scheme.kind == "serial-implicit"
    assert cfg.scheme.first == "FLUID" and cfg.scheme.second == "STRUCTURE"
    assert cfg.scheme.max_time == 4.0 and cfg.scheme.dt == 0.01
    assert cfg.scheme.max_iterations == 40
    assert cfg.scheme.acceleration.initial_relaxation == 0.001
    assert cfg.scheme.acceleration.timesteps_reused == 5
    assert any(ex.initialize for ex in cfg.scheme.exchanges)
    fluid = cfg.participants["FLUID"]
    assert len(fluid.mappings) == 2


def test_parse_reference_format_quirks(tmp_path):
    """The parser accepts colon-prefixed tags without namespace decls."""
    cfg = parse_config(CONFIG)
    conv = cfg.scheme.convergence
    assert len(conv) == 1 and conv[0].limit == 1e-5


def test_nn_mapping_exact_match():
    src = np.array([[0.0, 0], [1, 0], [2, 0]])
    dst = np.array([[2.0, 0], [0, 0]])
    m = NearestNeighborMapping(src, dst)
    vals = np.array([[10.0, 1], [20, 2], [30, 3]])
    np.testing.assert_allclose(m.apply(vals), [[30, 3], [10, 1]])


def test_iqnils_converges_linear_fixed_point():
    """IQN-ILS must solve x = A x + b (spectral radius < 1 not required —
    quasi-Newton handles even mildly divergent fixed points)."""
    rng = np.random.default_rng(0)
    n = 8
    a = rng.normal(size=(n, n))
    a = 1.2 * a / np.abs(np.linalg.eigvals(a)).max()  # divergent Picard
    b = rng.normal(size=n)
    x_star = np.linalg.solve(np.eye(n) - a, b)

    acc = IQNILS(initial_relaxation=0.1)
    x = np.zeros(n)
    for _ in range(60):
        x_out = a @ x + b
        x = acc.accelerate(x_out)
    assert np.linalg.norm(x - x_star) < 1e-8 * max(1, np.linalg.norm(x_star))


def test_constant_relaxation():
    acc = ConstantRelaxation(0.5)
    x = acc.accelerate(np.array([2.0]))
    np.testing.assert_allclose(x, [2.0])
    x = acc.accelerate(np.array([4.0]))
    np.testing.assert_allclose(x, [3.0])


def test_socket_transport_roundtrip():
    result = {}

    def server():
        t = SocketTransport.listen("127.0.0.1", 50901)
        result["got"] = t.recv()
        t.send({"pong": np.arange(3)})
        t.close()

    th = threading.Thread(target=server, daemon=True)
    th.start()
    c = SocketTransport.connect("127.0.0.1", 50901)
    c.send({"ping": np.ones((2, 2))})
    back = c.recv()
    c.close()
    th.join(timeout=10)
    np.testing.assert_allclose(result["got"]["ping"], np.ones((2, 2)))
    np.testing.assert_allclose(back["pong"], [0, 1, 2])


# ----------------------------------------------------------------------
# coupled runs (Test-H analog)
# ----------------------------------------------------------------------


def test_tower_interface_matches_fluid_grid():
    from fem_shell_tpu.coupling.fluid_dummy import tower_grid

    mesh = tower_mesh()
    iface = mesh.coupling_node_ids()
    assert len(iface) == 43  # fluid_solver.cpp:47 hard-codes 43
    spos = mesh.coords[iface][:, [0, 2]]  # dead axis y
    fpos = tower_grid(2)
    # identical point sets (different orderings)
    d2 = ((spos[:, None] - fpos[None]) ** 2).sum(-1)
    assert d2.min(axis=1).max() < 1e-12


def test_coupled_demo_30_steps():
    res, hist = run_demo(max_timesteps=30, verbose=False)
    assert res.timesteps == 30
    assert len(hist) == 30
    # implicit scheme iterates but converges well under the 40-iteration cap
    per_step = len(res.iterations) / res.timesteps
    assert 1.0 <= per_step < 10.0
    # displacement tracks the quasi-static force 1 + sin(t/25.01)
    ux = res.solutions[:, :, 0]
    tip = np.abs(ux).max(axis=1)
    force = 1.0 + np.sin(np.arange(30) / 25.01)
    corr = np.corrcoef(tip, force)[0, 1]
    assert corr > 0.999


@pytest.mark.slow
def test_coupled_demo_full_400_steps():
    """Full Test-H run: 400 timesteps, smooth oscillation
    (doc/validation.tex:770)."""
    res, hist = run_demo(max_timesteps=None, verbose=False)
    assert res.timesteps == 400
    tip = np.abs(res.solutions[:, :, 0]).max(axis=1)
    force = 1.0 + np.sin(np.arange(400) / 25.01)
    corr = np.corrcoef(tip, force)[0, 1]
    assert corr > 0.999  # smooth quasi-static oscillation
    # smoothness: step-to-step change bounded by force slew rate
    dtip = np.abs(np.diff(tip))
    assert dtip.max() < 0.12 * tip.max()


@pytest.mark.slow
def test_coupled_over_sockets_matches_inprocess():
    """Same protocol over the TCP m2n — results identical to in-process."""
    from fem_shell_tpu.coupling.adapter import run_structure
    from fem_shell_tpu.coupling.fluid_dummy import run_fluid
    from fem_shell_tpu.materials import Material

    ref, _ = run_demo(max_timesteps=10, verbose=False)

    mesh = tower_mesh()
    out = {}

    def fluid():
        out["hist"] = run_fluid(CONFIG, max_timesteps=10)

    th = threading.Thread(target=fluid, daemon=True)
    th.start()
    res = run_structure(
        mesh,
        Material(nu=0.3, em=1e6, thickness=0.1),
        CONFIG,
        dt=0.01,
        dead_axis="y",
        max_timesteps=10,
    )
    th.join(timeout=60)
    assert res.timesteps == 10
    np.testing.assert_allclose(res.solutions, ref.solutions, atol=1e-12)


def test_coupled_parallel_structure_matches_serial():
    """Test-H parallel==serial analog (doc/validation.tex:770): the
    device-parallel structure participant reproduces the serial run."""
    import jax.numpy as jnp

    from fem_shell_tpu.coupling.adapter import run_structure
    from fem_shell_tpu.coupling.fluid_dummy import run_fluid
    from fem_shell_tpu.coupling.m2n import InProcessTransport
    from fem_shell_tpu.materials import Material

    ref, _ = run_demo(max_timesteps=8, verbose=False)

    mesh = tower_mesh()
    ts, tf = InProcessTransport.pair()
    th = threading.Thread(target=lambda: run_fluid(CONFIG, transport=tf, max_timesteps=8), daemon=True)
    th.start()
    res = run_structure(
        mesh,
        Material(nu=0.3, em=1e6, thickness=0.1),
        CONFIG,
        dt=0.01,
        dead_axis="y",
        transport=ts,
        max_timesteps=8,
        devices=4,
    )
    th.join(timeout=120)
    assert res.timesteps == 8
    np.testing.assert_allclose(res.solutions, ref.solutions, atol=1e-9)
