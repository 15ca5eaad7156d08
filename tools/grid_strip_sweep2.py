import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fem_shell_tpu.large import LargeShellSystem
from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate

MAT = Material(nu=0.3, em=1e7, thickness=0.5)
pm = MeshGenParams("q", 1024, 1024, 0, 0, 10, 10, (0, 1, 0, 1), 300.0, 2, True, "z")
mesh, _, _ = generate(pm)
for sn in (16384, 32768):
    s = LargeShellSystem(mesh, MAT, dtype=jnp.float64, chunk=4096)
    def asm():
        d = s.assemble_df(strip_nodes=sn)
        np.asarray(d.hi[0, :8]); return d
    t0 = time.perf_counter(); asm()
    print(f"q1024 sn={sn}: compile+first {time.perf_counter()-t0:.1f} s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); asm(); ts.append(time.perf_counter()-t0)
    print(f"q1024 sn={sn}: {min(ts):.3f} s -> {1048576/min(ts)/1e6:.3f} Melem/s", flush=True)
    del s
