import sys, os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from fem_shell_tpu.ops.df import two_sum, two_prod  # barriered versions

SPLIT = jnp.float32(4097.0)
def two_sum_nb(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)
def two_prod_nb(a, b):
    p = a * b
    c = SPLIT * a
    ah = c - (c - a); al = a - ah
    d = SPLIT * b
    bh = d - (d - b); bl = b - bh
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err

def chain(ts, tp, a, b):
    acc_h = jnp.zeros_like(a); acc_l = jnp.zeros_like(a)
    x = a; y = b
    for i in range(64):
        x = x * jnp.float32(1.0000001); y = y * jnp.float32(0.9999999)
        ph, pl_ = tp(x, y)
        sh, sl = ts(acc_h, ph)
        sl = sl + (acc_l + pl_)
        acc_h, acc_l = ts(sh, sl)
    return acc_h, acc_l

@jax.jit
def both(a, b):
    h1, l1 = chain(two_sum_nb, two_prod_nb, a, b)
    h2, l2 = chain(two_sum, two_prod, a, b)
    d = (h1.astype(jnp.float64) + l1.astype(jnp.float64)) - (h2.astype(jnp.float64) + l2.astype(jnp.float64))
    ref = h2.astype(jnp.float64) + l2.astype(jnp.float64)
    return jnp.max(jnp.abs(d)), jnp.max(jnp.abs(ref))

rng = np.random.default_rng(0)
a = jnp.asarray(rng.normal(size=(4096,)).astype(np.float32) * 1e3)
b = jnp.asarray(rng.normal(size=(4096,)).astype(np.float32) * 1e-2)
d, r = both(a, b)
print("barrier-free vs barriered chain diff:", float(d), " scale:", float(r), " rel:", float(d)/float(r))
