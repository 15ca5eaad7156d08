"""MG-df solve on TPU: Pallas vs XLA matvecs — correctness + time.

Usage: python tools/mg_pallas_probe.py [n ...]   (default 128 512)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.mg import MultigridShellSystem

MAT = Material(nu=0.3, em=1e7, thickness=0.5)
GOLDEN = 0.1064045  # exact Kirchhoff alpha*q*a^4/D (doc/validation.tex:264-281)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [128, 512]
    print(f"device={jax.devices()[0]}", flush=True)
    for n in sizes:
        pm = MeshGenParams("q", n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
        mesh, rows, fac = generate(pm)
        forces = rows * fac
        center = mesh.n_nodes // 2
        for pallas in (True, False):
            mg = MultigridShellSystem(
                pm, MAT, dtype=jnp.float32, df_operator=True, use_pallas=pallas
            )
            u = mg.solve_df(forces, rtol=1e-9, maxiter=400)  # compile+warm
            w = float(u[center, 2])
            t0 = time.perf_counter()
            u = mg.solve_df(forces, rtol=1e-9, maxiter=400)
            t_solve = time.perf_counter() - t0
            t0 = time.perf_counter()
            mg.reassemble()
            t_asm = time.perf_counter() - t0
            print(
                f"n={n} pallas={pallas}: solve {t_solve:.3f} s  asm {t_asm:.3f} s  "
                f"iters={mg.last_iters} res={mg.last_residual:.2e} "
                f"w={w:.6f} err={(abs(w - GOLDEN) / GOLDEN):.2e}",
                flush=True,
            )
            del mg


if __name__ == "__main__":
    main()
