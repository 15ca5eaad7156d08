"""Test configuration: CPU backend, float64, 8 virtual devices.

Golden-value tests need exact f64 (TPU f64 is software-emulated with
~1e-8 relative noise on the axon remote device), and the sharding tests
need a multi-device mesh; both come from the host CPU platform with
``--xla_force_host_platform_device_count=8``.

NOTE: this environment's sitecustomize force-registers the axon TPU
platform and pins ``jax_platforms='axon,cpu'`` from inside ``register()``,
which overrides the JAX_PLATFORMS env var — so the override must be done
via ``jax.config`` after import, not via the environment alone.
"""
import os

# must be set before the first backend initialization
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
