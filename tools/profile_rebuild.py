"""Stage-profile the warm operator rebuild (mg.reassemble) on real TPU.

Reproduces the bench_scale timing scope (bench.py:bench_scale): build the
production df MG system, warm it with one solve_df_refined + one
reassemble (compiles cached in-process), then run a PROFILED reassemble
whose stages are each drained by a device->host fetch
(mg._RebuildProf). This attributes the 42 s (1024^2) / 376 s (2304^2)
operator_rebuild_s from SCALE_BENCH to concrete stages.

Run STANDALONE (single TPU client):
  nohup python tools/profile_rebuild.py 1024 t > /tmp/profile_rebuild.log 2>&1 &
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    et = sys.argv[2] if len(sys.argv) > 2 else "t"
    print(f"# device={jax.devices()[0]}  n={n} et={et}", flush=True)

    from fem_shell_tpu.mg import MultigridShellSystem

    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, et == "q", "z")
    mesh, rows, fac = generate(p)
    forces = rows * fac

    t0 = time.perf_counter()
    mg = MultigridShellSystem(p, MAT, dtype=jnp.float32, df_operator=True)
    print(f"# construct: {time.perf_counter() - t0:.1f} s", flush=True)

    t0 = time.perf_counter()
    mg.solve_df_refined(forces, rtol=1e-9)
    print(f"# warm solve_df_refined: {time.perf_counter() - t0:.1f} s", flush=True)

    # warm reassemble (matches bench: all reassemble-path jits compiled)
    t0 = time.perf_counter()
    mg.reassemble()
    print(f"# warm reassemble: {time.perf_counter() - t0:.1f} s", flush=True)

    # profiled rebuild x2 (the second shows steady state)
    for i in range(2):
        t0 = time.perf_counter()
        mg.reassemble(profile=True)
        print(f"# profiled reassemble[{i}]: {time.perf_counter() - t0:.1f} s",
              flush=True)

    vcycle_profile(mg)


def _chain(fn, x0, iters=20):
    """Honest per-application ms: chained normalized applications in one
    jit + a scalar fetch (remote block_until_ready is optimistic)."""

    @jax.jit
    def run(levels, x):
        def body(i, c):
            y = fn(levels, c)
            s = jnp.max(jnp.abs(y)) + 1e-30
            return y / s

        y = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(y)

    return run


def vcycle_profile(mg):
    """Per-level matvec + whole-V-cycle latency: locates the 74 ms/iter
    vs 12.8 ms fine-matvec gap (VERDICT r2 weak #3)."""
    with jax.default_matmul_precision("highest"):
        levels = mg.levels
        for li, lvl in enumerate(levels):
            x0 = jnp.zeros((6, lvl.npad), jnp.float32) + 1e-3
            if lvl.dense_inv is not None or lvl.chol is not None:
                fn = lambda ls, x, li=li: mg._vcycle(ls, li, x)  # coarse solve
                label = f"L{li}/coarse_solve"
            else:
                fn = lambda ls, x, li=li: mg._mv(ls[li], x)
                label = f"L{li}/matvec_f32"
            run = _chain(fn, x0)
            float(run(levels, x0))  # compile+warm
            t0 = time.perf_counter()
            float(run(levels, x0))
            dt = (time.perf_counter() - t0) / 20 * 1e3
            print(f"# vcycle-prof {label:24s} {dt:8.3f} ms  "
                  f"({lvl.nyp}x{lvl.nxp})", flush=True)

            # one full smoother sweep at this level (nu=1)
            if lvl.dense_inv is None and lvl.chol is None:
                fn_s = lambda ls, x, li=li: mg._smooth(ls[li], x, x, 1)
                run = _chain(fn_s, x0)
                float(run(levels, x0))
                t0 = time.perf_counter()
                float(run(levels, x0))
                dt = (time.perf_counter() - t0) / 20 * 1e3
                print(f"# vcycle-prof L{li}/smooth1        {dt:8.3f} ms",
                      flush=True)

        fine = levels[0]
        x0 = jnp.zeros((6, fine.npad), jnp.float32) + 1e-3
        run = _chain(lambda ls, x: mg._vcycle(ls, 0, x), x0, iters=5)
        float(run(levels, x0))
        t0 = time.perf_counter()
        float(run(levels, x0))
        dt = (time.perf_counter() - t0) / 5 * 1e3
        print(f"# vcycle-prof FULL_VCYCLE          {dt:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
