"""Fine-level-only memory probe at the 10M-element scale."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fem_shell_tpu.large import LargeShellSystem
from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate


def stats(tag):
    d = jax.devices()[0]
    try:
        s = d.memory_stats()
        used = s.get("bytes_in_use", -1)
        peak = s.get("peak_bytes_in_use", -1)
        print(f"[{tag}] in_use={used/1e9:.2f} GB peak={peak/1e9:.2f} GB", flush=True)
    except Exception as ex:
        print(f"[{tag}] memory_stats unavailable: {type(ex).__name__}", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2304
    mat = Material(nu=0.3, em=1e7, thickness=0.5)
    pm = MeshGenParams("t", n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(pm)
    print(f"{len(mesh.tri)} elements, {mesh.n_nodes} nodes", flush=True)
    stats("start")
    s = LargeShellSystem(mesh, mat, dtype=jnp.float32, chunk=8192)
    stats("system built")
    t0 = time.perf_counter()
    sn = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    layout = sys.argv[3] if len(sys.argv) > 3 else "tiled"
    pair, diag = s.assemble_df(layout=layout, with_diag=True, strip_nodes=sn)
    np.asarray(diag[:, :4])
    print(f"assembled in {time.perf_counter() - t0:.1f} s", flush=True)
    stats("after fine pair")
    # release and re-assemble (reassemble scenario)
    z = jnp.zeros((3, 3), jnp.float32)
    np.asarray(z)
    stats("small alloc ok")


if __name__ == "__main__":
    main()
