"""Bisect the tri-plate df leak on TPU: barriered vs barrier-free EFTs."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import fem_shell_tpu.ops.dfk as dfk
import fem_shell_tpu.ops.df as dfb
from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.ops.elements import _tri_frame, _tri_plate

MAT = Material(nu=0.3, em=1e7, thickness=0.5)
dm64, dp64 = (np.asarray(x, np.float64) for x in MAT.matrices())
pm = MeshGenParams("t", 128, 128, 0, 0, 10, 10, (0, 1, 0, 1), 300.0, 2, True, "z")
mesh, _, _ = generate(pm)
conn = np.asarray(mesh.tri[:4096], np.int64)
xyz = np.asarray(mesh.coords, np.float64)[conn]
xyz_t = np.ascontiguousarray(xyz.transpose(1, 2, 0))
ref = np.load("/tmp/tri_stage_plate.npy")
scale = np.abs(ref).max()

def stage_plate(p):
    trafo, dphi, area = _tri_frame(p)
    return _tri_plate(dphi, area, jnp.asarray(dp64))

v = jax.vmap(stage_plate, in_axes=2, out_axes=2)

def run(tag):
    dfn = dfk.df_function(v)
    jf = jax.jit(lambda x: dfn(x)[0])
    got = jf(dfk.d_from_f64(xyz_t))
    g = np.asarray(got.hi, np.float64) + np.asarray(got.lo, np.float64)
    print(f"{tag}: rel err {np.abs(g - ref).max() / scale:.3e}", flush=True)

run("barrier-free")

# patch in barriered EFTs
orig = (dfk.two_sum, dfk.fast_two_sum, dfk.two_prod)
dfk.two_sum = dfb.two_sum
dfk.fast_two_sum = dfb.fast_two_sum
dfk.two_prod = dfb.two_prod
run("barriered   ")
dfk.two_sum, dfk.fast_two_sum, dfk.two_prod = orig

# barrier only the adds
dfk.two_sum = dfb.two_sum
run("barrier adds")
dfk.two_sum = orig[0]

# barrier only the prods
dfk.two_prod = dfb.two_prod
run("barrier prod")
dfk.two_prod = orig[2]
