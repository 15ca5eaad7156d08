"""Embedded hand-made example meshes (tests A/B/E fixtures).

The structured meshes (C/D/F/G, FSI tower) are regenerated from parameters
by fem_shell_tpu.meshgen; only the hand-made cantilever (A/B) and I-beam
(E) geometries are carried as data, transcribed from the reference test
fixtures (coordinates/connectivity/BCs/loads — data, not code).
"""
from fem_shell_tpu.data import test_a, test_b, test_e  # noqa: F401
