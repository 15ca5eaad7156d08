import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

rows = int(float(sys.argv[1]) * 1e9 / 4 / 65536) if len(sys.argv) > 1 else int(9e9 / 4 / 65536)
n = rows  # 2D shape keeps per-dim indices under 32 bits
print(f"allocating {rows*65536*4/1e9:.1f} GB", flush=True)
x = jnp.zeros((rows, 65536), jnp.float32)
f = jax.jit(lambda a: a + 1.0, donate_argnums=0)
for i in range(3):
    x = f(x)
print("sum head:", float(jnp.sum(x[0, :8])), flush=True)
print("DONATION OK (no OOM with a", f"{rows*65536*4/1e9:.1f} GB buffer updated in place)", flush=True)
