import os, sys
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
from fem_shell_tpu.ops.assemble_grid import untile_values

MAT = Material(nu=0.3, em=1e7, thickness=0.5)

def parity(et, layout, sn):
    n = 512
    pm = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, et == "q", "z")
    mesh, _, _ = generate(pm)
    s = LargeShellSystem(mesh, MAT, dtype=jnp.float32, chunk=8192)
    pair = s.assemble_df(layout=layout, method="grid", strip_nodes=sn)
    if layout == "tiled":
        flat = np.asarray(untile_values(pair.hi), np.float64) + np.asarray(untile_values(pair.lo), np.float64)
    else:
        flat = np.asarray(pair.hi, np.float64) + np.asarray(pair.lo, np.float64)
    ref = np.load(f"/tmp/grid_ref_{et}512.npy").reshape(flat.shape)
    rel = np.abs(flat - ref).max() / np.abs(ref).max()
    # locate worst row/col
    idx = np.unravel_index(np.abs(flat - ref).argmax(), flat.shape)
    print(f"{et}512 {layout} sn={sn}: rel={rel:.3e} worst@row={idx[0]} col={idx[1]} "
          f"(node {idx[1]}, grid iy={idx[1] // 513} ix={idx[1] % 513})", flush=True)
    del s, pair

parity("t", "flat", 65536)
parity("t", "tiled", 65536)
parity("t", "tiled", 32768)
parity("q", "tiled", 65536)
