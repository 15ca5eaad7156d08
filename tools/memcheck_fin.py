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
from fem_shell_tpu.mg import detect_structured_grid
from fem_shell_tpu.ops.assemble_grid import _make_grid_step, _TILE

n = 2304
mat = Material(nu=0.3, em=1e7, thickness=0.5)
pm = MeshGenParams("t", n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
mesh, _, _ = generate(pm)
s = LargeShellSystem(mesh, mat, dtype=jnp.float32, chunk=8192)
grid = detect_structured_grid(mesh)
k = len(s.offsets)
npad = s.pattern.n_pad
offsets = tuple(int(o) for o in s.offsets)
nxp = grid.nxp

for rows_e, fin in ((8, True), (28, False)):
    step = _make_grid_step(s._grid_kernel_fn(3), grid.elem_type, grid.ul_lr, rows_e, nxp - 1, nxp, k, offsets, npad, tiled=True, finalize=fin)
    hi = jax.ShapeDtypeStruct((npad // _TILE, 36 * k, 8, 128), jnp.float32)
    ch = jax.ShapeDtypeStruct((3, grid.nyp, nxp), jnp.float32)
    fp = jax.ShapeDtypeStruct((6, grid.nyp + 2, nxp + 2), jnp.float32)
    r0 = jax.ShapeDtypeStruct((), jnp.int32)
    args = (hi, hi, ch, ch, fp, r0) + ((jax.ShapeDtypeStruct((6, npad), jnp.float32),) if fin else ())
    ma = step.lower(*args).compile().memory_analysis()
    print(f"rows={rows_e} finalize={fin}: args={ma.argument_size_in_bytes/1e9:.2f} out={ma.output_size_in_bytes/1e9:.2f} temp={ma.temp_size_in_bytes/1e9:.2f} alias={ma.alias_size_in_bytes/1e9:.2f} GB", flush=True)
