"""CPU reference stages for dfop_probe (f64)."""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.ops.elements import _tri_frame, _tri_membrane, _tri_plate, tri_shell_stiffness

MAT = Material(nu=0.3, em=1e7, thickness=0.5)
dm64, dp64 = (np.asarray(x, np.float64) for x in MAT.matrices())
pm = MeshGenParams("t", 128, 128, 0, 0, 10, 10, (0, 1, 0, 1), 300.0, 2, True, "z")
mesh, _, _ = generate(pm)
conn = np.asarray(mesh.tri[:4096], np.int64)
xyz = np.asarray(mesh.coords, np.float64)[conn]
xyz_t = np.ascontiguousarray(xyz.transpose(1, 2, 0))

def stage_membrane(p):
    trafo, dphi, area = _tri_frame(p)
    return _tri_membrane(dphi, area, jnp.asarray(dm64), MAT.thickness)
def stage_plate(p):
    trafo, dphi, area = _tri_frame(p)
    return _tri_plate(dphi, area, jnp.asarray(dp64))
def stage_full(p):
    return tri_shell_stiffness(p, jnp.asarray(dm64), jnp.asarray(dp64), MAT.thickness)

for tag, fn in [("membrane", stage_membrane), ("plate", stage_plate), ("full", stage_full)]:
    v = jax.jit(jax.vmap(fn, in_axes=2, out_axes=2))
    np.save(f"/tmp/tri_stage_{tag}.npy", np.asarray(v(jnp.asarray(xyz_t))))
    print("saved", tag, flush=True)
