"""TPU op-level df exactness probe: d_div / d_sqrt / d_mul / tri stages.

Compares jitted-on-TPU df ops against host f64. Bisects the tri-kernel
2.9e-9 parity leak.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fem_shell_tpu.ops.df import DF
from fem_shell_tpu.ops.dfk import d_div, d_from_f64, d_mul, d_sqrt, d_to_f64, df_function

rng = np.random.default_rng(0)
N = 65536
a64 = rng.normal(size=(N,)) * np.exp(rng.normal(size=(N,)) * 3)
b64 = (rng.normal(size=(N,)) + 3.5) * np.exp(rng.normal(size=(N,)) * 3)


def relerr(tag, got_df, want64):
    got = np.asarray(got_df.hi, np.float64) + np.asarray(got_df.lo, np.float64)
    err = np.abs(got - want64) / np.maximum(np.abs(want64), 1e-300)
    print(f"{tag}: max rel err {err.max():.3e}", flush=True)


a = d_from_f64(a64)
b = d_from_f64(b64)

mul = jax.jit(lambda x, y: d_mul(x, y))
div = jax.jit(lambda x, y: d_div(x, y))
sqrtf = jax.jit(lambda x: d_sqrt(x))

relerr("d_mul", mul(a, b), a64 * b64)
relerr("d_div", div(a, b), a64 / b64)
relerr("d_sqrt", sqrtf(DF(jnp.abs(a.hi), jnp.where(a.hi < 0, -a.lo, a.lo))), np.sqrt(np.abs(a64)))

# raw f32 div / sqrt / rsqrt rounding on TPU vs correctly-rounded host
af = a64.astype(np.float32)
bf = b64.astype(np.float32)
fdiv = jax.jit(lambda x, y: x / y)
fsqrt = jax.jit(lambda x: jnp.sqrt(x))
g_div = np.asarray(fdiv(jnp.asarray(af), jnp.asarray(bf)), np.float64)
g_sqrt = np.asarray(fsqrt(jnp.abs(jnp.asarray(af))), np.float64)
w_div = (af.astype(np.float64) / bf.astype(np.float64))
w_sqrt = np.sqrt(np.abs(af).astype(np.float64))
ulp_div = np.abs(g_div - w_div) / np.spacing(np.abs(w_div).astype(np.float32)).astype(np.float64)
ulp_sqrt = np.abs(g_sqrt - w_sqrt) / np.spacing(np.abs(w_sqrt).astype(np.float32)).astype(np.float64)
print(f"raw f32 div  max ulp err vs exact: {ulp_div.max():.3f}", flush=True)
print(f"raw f32 sqrt max ulp err vs exact: {ulp_sqrt.max():.3f}", flush=True)

# --- tri kernel stage bisect on the structured-grid geometry
from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.ops.elements import _tri_frame, _tri_membrane, _tri_plate, tri_shell_stiffness

MAT = Material(nu=0.3, em=1e7, thickness=0.5)
dm64, dp64 = (np.asarray(x, np.float64) for x in MAT.matrices())
pm = MeshGenParams("t", 128, 128, 0, 0, 10, 10, (0, 1, 0, 1), 300.0, 2, True, "z")
mesh, _, _ = generate(pm)
conn = np.asarray(mesh.tri[:4096], np.int64)
xyz = np.asarray(mesh.coords, np.float64)[conn]  # [E,3,3]
xyz_t = np.ascontiguousarray(xyz.transpose(1, 2, 0))

def stage_frame(p):
    trafo, dphi, area = _tri_frame(p)
    return trafo, dphi, area

def stage_membrane(p):
    trafo, dphi, area = _tri_frame(p)
    return _tri_membrane(dphi, area, jnp.asarray(dm64), MAT.thickness)

def stage_plate(p):
    trafo, dphi, area = _tri_frame(p)
    return _tri_plate(dphi, area, jnp.asarray(dp64))

def stage_full(p):
    return tri_shell_stiffness(p, jnp.asarray(dm64), jnp.asarray(dp64), MAT.thickness)

for tag, fn in [("frame", stage_frame), ("membrane", stage_membrane), ("plate", stage_plate), ("full", stage_full)]:
    v = jax.vmap(fn, in_axes=2, out_axes=2 if tag != "frame" else (2, 2, 0))
    dfn = df_function(v)
    jf = jax.jit(lambda x: tuple(dfn(x)) if tag == "frame" else dfn(x)[0])
    got = jf(d_from_f64(xyz_t))
    # f64 reference on host is awkward for tuple outputs; compute with CPU numpy via f64 jax? compare on hi+lo vs emulated... use jnp f64 on TPU? noisy.
    # Instead compare against CPU-precomputed values shipped via numpy:
    import jax.numpy as jnp2
    ref = None
    if tag == "frame":
        # reference computed in host numpy (exact f64 semantics of the same formulas)
        outs = []
        for e in range(xyz.shape[0]):
            A, B, C = xyz[e]
            u = B - A; v2 = C - A
            w = np.cross(u, v2)
            area = 0.5 * np.linalg.norm(w)
            ex = u / np.linalg.norm(u)
            ez = w / np.linalg.norm(w)
            ey = np.cross(ez, ex)
            outs.append(area)
        ref = np.array(outs)
        got_a = np.asarray(got[2].hi, np.float64) + np.asarray(got[2].lo, np.float64)
        err = np.abs(got_a - ref) / np.abs(ref)
        print(f"tri frame area: max rel err {err.max():.3e}", flush=True)
        continue
    # membrane/plate/full: reference via CPU jax is unavailable in this TPU process;
    # use host numpy only for 'full' via saved file if present
    path = f"/tmp/tri_stage_{tag}.npy"
    if os.path.exists(path):
        ref = np.load(path)
        g = np.asarray(got.hi, np.float64) + np.asarray(got.lo, np.float64)
        scale = np.abs(ref).max()
        print(f"tri {tag}: max rel err {np.abs(g - ref).max() / scale:.3e}", flush=True)
    else:
        print(f"tri {tag}: no reference at {path} (run dfop_ref first)", flush=True)
