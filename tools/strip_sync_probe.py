"""Tiled fold with a blocking sync per strip: find the OOM strip."""
import os, sys, time
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
from fem_shell_tpu.mg import detect_structured_grid
from fem_shell_tpu.ops.assemble_grid import _TILE, _make_grid_step

n = int(sys.argv[1]) if len(sys.argv) > 1 else 2304
mat = Material(nu=0.3, em=1e7, thickness=0.5)
pm = MeshGenParams("t", n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
mesh, _, _ = generate(pm)
s = LargeShellSystem(mesh, mat, dtype=jnp.float32, chunk=8192)
grid = detect_structured_grid(mesh)
k = len(s.offsets)
npad = s.pattern.n_pad
offsets = tuple(int(o) for o in s.offsets)
nxp, nyp = grid.nxp, grid.nyp
ny = nyp - 1
rows_e = max(1, 65536 // nxp)
kfn = s._grid_kernel_fn(3)

c64 = np.asarray(mesh.coords, np.float64).reshape(nyp, nxp, 3).transpose(2, 0, 1)
ch = jnp.asarray(c64.astype(np.float32))
cl = jnp.asarray((c64 - np.asarray(ch, np.float64)).astype(np.float32))
free_grid = np.asarray(s.free_t, np.float32)[:, : nyp * nxp].reshape(6, nyp, nxp)
fp = jnp.asarray(np.pad(free_grid, ((0, 0), (1, 1), (1, 1))))

hi = jnp.zeros((npad // _TILE, 36 * k, 8, 128), jnp.float32)
lo = jnp.zeros_like(hi)
r0 = 0
i = 0
while r0 < ny:
    re_ = min(rows_e, ny - r0)
    step = _make_grid_step(kfn, grid.elem_type, grid.ul_lr, re_, nxp - 1, nxp, k, offsets, npad, tiled=True)
    t0 = time.perf_counter()
    hi, lo = step(hi, lo, ch, cl, fp, jnp.asarray(r0, jnp.int32))
    v = float(hi[0, 0, 0, 0])  # blocking sync
    print(f"strip {i} rows [{r0},{r0+re_}) ok  {time.perf_counter()-t0:.2f} s", flush=True)
    r0 += re_
    i += 1
print("ALL STRIPS OK", flush=True)
