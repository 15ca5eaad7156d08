"""Structured-grid df assembly: TPU parity + speed probe.

Usage:
  python tools/grid_asm_probe.py ref 128          # CPU: save f64 reference operator
  python tools/grid_asm_probe.py tpu 128 512 1024 # TPU: parity at 128, time the rest
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODE = sys.argv[1]
SIZES = [int(a) for a in sys.argv[2:]]

if MODE == "ref":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from fem_shell_tpu.large import LargeShellSystem
from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def build(et, n):
    pm = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 1, 0, 1), 300.0, 2, et == "q", "z")
    mesh, _, _ = generate(pm)
    return mesh


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    if MODE == "ref":
        n = SIZES[0]
        for et in ("q", "t"):
            mesh = build(et, n)
            s = LargeShellSystem(mesh, MAT, dtype=jnp.float64, chunk=4096)
            v64 = np.asarray(s.assemble(), np.float64)
            np.save(f"/tmp/grid_ref_{et}{n}.npy", v64)
            print(f"saved /tmp/grid_ref_{et}{n}.npy {v64.shape}", flush=True)
        return

    # TPU: parity at SIZES[0] against the CPU reference
    n0 = SIZES[0]
    for et in ("q", "t"):
        mesh = build(et, n0)
        s = LargeShellSystem(mesh, MAT, dtype=jnp.float64, chunk=4096)
        pair = s.assemble_df()
        v_df = np.asarray(pair.hi, np.float64) + np.asarray(pair.lo, np.float64)
        ref = np.load(f"/tmp/grid_ref_{et}{n0}.npy").reshape(v_df.shape)
        scale = np.abs(ref).max()
        err = np.abs(v_df - ref).max() / scale
        print(f"{et}{n0}: grid-df vs CPU f64 entry rel err = {err:.3e}", flush=True)
        del pair, s

    # timing at the larger sizes (quad)
    for n in SIZES[1:]:
        mesh = build("q", n)
        s = LargeShellSystem(mesh, MAT, dtype=jnp.float64, chunk=4096)
        e = n * n

        def asm():
            d = s.assemble_df()
            np.asarray(d.hi[0, :8])
            return d

        t0 = time.perf_counter()
        asm()
        print(f"q{n}: compile+first {time.perf_counter() - t0:.1f} s", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            asm()
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"q{n}: grid-df assembly {t:.3f} s  ->  {e / t / 1e6:.3f} Melem/s", flush=True)
        del s


if __name__ == "__main__":
    main()
