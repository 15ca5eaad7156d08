"""Backend bring-up guard for user-facing entry points.

This environment pins an experimental accelerator platform via env var;
if its registration fails (plugin error, device held by another process),
jax cannot fall back on its own and every array op raises. User-facing
CLIs should degrade to CPU with a notice instead of a traceback.
"""
from __future__ import annotations


def ensure_backend(verbose: bool = True) -> str:
    """Return the usable platform name, falling back to CPU if the
    configured accelerator backend cannot initialize."""
    import jax

    try:
        return jax.devices()[0].platform
    except RuntimeError as e:
        if verbose:
            print(f"NOTE: accelerator backend unavailable ({e}); using CPU.")
        jax.config.update("jax_platforms", "cpu")
        return jax.devices()[0].platform
