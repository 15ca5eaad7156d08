"""Benchmark: reference Test-G workload end-to-end on the local accelerator.

Workload (BASELINE.md): 64x64 simply-supported square plate, uniform load
q=300, E=1e7, nu=0.3, t=0.5 -> Quad-4: 4096 elements / 4225 nodes /
25,350 DOF (Tri-3 variant: 8192 elements). The reference's overall time
(assembly + PETSc solve, 1 process, avg of 5) is 34.83 s for Quad-4 and
52.52 s for Tri-3 (doc/validation.tex:523-539).

We time the same thing with the fused single-dispatch configuration
(mg.solve_fused): every timed rep is ONE jitted program that
re-assembles every multigrid level in emulated f64, rebuilds the full
preconditioner (Jacobi diagonals, per-level damping power iterations,
device-resident coarse Cholesky), and runs the double-float MG-CG —
"overall" covers the same work as the reference's assembly+solver
timers with exactly one dispatch + one device->host fetch per rep (the
honest timing scope for this remote platform). The center deflection is
verified against the golden value before reporting. Falls back to the
multi-dispatch MG-df path, then Jacobi-df, then emulated f64, if the
preferred path fails on this device/toolchain.

Prints ONE JSON line:
  {"metric": "testG_quad_overall_s", "value": <s>, "unit": "s",
   "vs_baseline": <speedup factor>}
(the Tri-3 line is reported on stderr).
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate

BASELINES = {"q": 34.83, "t": 52.52}  # doc/validation.tex:523-539, 1 proc
GOLDEN = {"q": 0.106465, "t": 0.106413}  # doc/validation.tex:518
RTOL = 1e-9
REPS = 5
MAT = Material(nu=0.3, em=1e7, thickness=0.5)


def bench_case(et: str):
    """(mean overall seconds, center_w, iters, residual) for one element
    type, MG-df preferred; returns the solver label actually used."""
    p = MeshGenParams(et, 64, 64, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, et == "q", "z")
    mesh, rows, fac = generate(p)
    forces = rows * fac
    center = mesh.n_nodes // 2

    def run_fused():
        from fem_shell_tpu.mg import MultigridShellSystem

        mg = MultigridShellSystem(mesh, MAT, dtype=jnp.float64, assemble=False)
        mg.solve_fused(forces, rtol=RTOL, maxiter=400)  # warm-up/compile

        def rep():
            return mg.solve_fused(forces, rtol=RTOL, maxiter=400)

        return rep, mg

    def run_mg():
        from fem_shell_tpu.mg import MultigridShellSystem

        mg = MultigridShellSystem(p, MAT, dtype=jnp.float32, df_operator=True)
        mg.solve_df(forces, rtol=RTOL, maxiter=400)  # warm-up/compile

        def rep():
            mg.reassemble()
            return mg.solve_df(forces, rtol=RTOL, maxiter=400)

        return rep, mg

    def run_jacobi_df():
        from fem_shell_tpu.large import LargeShellSystem

        system = LargeShellSystem(mesh, MAT, dtype=jnp.float64, chunk=4096)

        def rep():
            return system.solve_df(forces, rtol=1e-10, maxiter=20000)

        rep()
        return rep, system

    def run_f64():
        from fem_shell_tpu.large import LargeShellSystem

        system = LargeShellSystem(mesh, MAT, dtype=jnp.float64, chunk=4096)

        def rep():
            u = system.solve(forces, rtol=1e-10, maxiter=20000)
            system.last_iters = int(system.last_cg.iters)
            system.last_residual = float(system.last_cg.residual)
            return u

        rep()
        return rep, system

    for label, factory in (
        ("fused-mg-df", run_fused),
        ("mg-df", run_mg),
        ("jacobi-df", run_jacobi_df),
        ("f64", run_f64),
    ):
        try:
            rep, holder = factory()
            u = rep()
            w = float(u[center, 2])
            err = abs(w - GOLDEN[et]) / GOLDEN[et]
            if err >= 1e-4:
                print(f"# {et}/{label}: center w {w} fails golden ({err:.1e})", file=sys.stderr)
                continue
            times = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                u = rep()
                times.append(time.perf_counter() - t0)
            print(
                f"# {et}/{label}: times={[f'{x:.3f}' for x in times]} "
                f"iters={holder.last_iters} residual={holder.last_residual:.2e} "
                f"center_w={w:.6f} golden_err={err:.2e}",
                file=sys.stderr,
            )
            return float(np.mean(times)), label
        except Exception as e:  # pragma: no cover - device-specific fallback
            print(f"# {et}/{label} unavailable ({type(e).__name__}: {e})", file=sys.stderr)
    raise RuntimeError(f"no solver path produced a golden-accurate Test-G ({et})")


def bench_scale(n: int = 1024, et: str = "t"):
    """Large-scale metrics (SURVEY §7 step 7), all honest-timed (chained
    device work + host fetch):
      - production refined solve (matrix-free class-table fine operator):
        operator-rebuild time, solve time, inner iterations, golden error
      - grid-df assembly throughput (Melem/s) on the fine mesh — the
        general-structured-grid pipeline, probed explicitly since the
        uniform-grid production path no longer materializes the pair
      - Pallas df SpMV streaming bandwidth on that probe pair
      - class-table df matvec latency (the production CG operator)
    Returns a dict for the JSON line; raises on any failure (caller
    degrades gracefully)."""
    from fem_shell_tpu.mg import MultigridShellSystem
    from fem_shell_tpu.ops.class_matvec import class_matvec_df
    from fem_shell_tpu.ops.df import DF, df_from_f64

    golden = 0.1064045  # analytic Kirchhoff (doc/validation.tex:264-281)
    p = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, et == "q", "z")
    mesh, rows, fac = generate(p)
    forces = rows * fac
    n_elem = len(mesh.tri) + len(mesh.quad)
    # chebyshev/nu=3 smoother: TPU-proven on this exact workload
    # (tools/cheby_probe.py, r3: solve 5.52 s / 75 inner iters vs
    # jacobi 7.71 s / 127 — same golden err 5.8e-4, same 9.7e-4 df
    # refinement floor)
    mg = MultigridShellSystem(p, MAT, dtype=jnp.float32, df_operator=True,
                              smoother="chebyshev")
    # Steady-state force/solution fields stay DEVICE-RESIDENT (the
    # coupled-driver contract: force mapping and interface extraction
    # are jax ops, so only interface values ever cross the host link —
    # mg.stage_forces / return_device / fetch_solution). The full-field
    # tunnel round trip costs more than the whole 1024^2 device solve
    # (52 MB f64: upload ~1.2 s, download 1.6-5.5 s measured r5) and is
    # reported separately as solve_io_s for transparency.
    f_dev = mg.stage_forces(forces)
    mg.solve_df_refined(f_dev, rtol=1e-9, return_device=True)  # warm-up
    # steady-state (rebuild, solve) alternation — the repeating cost a
    # coupled driver pays per timestep. The FIRST rebuild after the warm
    # solve is a one-time transition (old solve/assembly buffers still
    # live -> allocator churn + program reloads: 24-65 s at 1024^2 where
    # the steady state is ~2 s; r4 tools/solve_decomp_probe.py cycles
    # rebuild 39.7/2.3/1.7 s). Cycle twice and report the second;
    # the transition cost is kept as *_first_s for transparency.
    ctr = mesh.n_nodes // 2
    t0 = time.perf_counter()
    mg.reassemble()
    t_asm_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    x_dev = mg.solve_df_refined(f_dev, rtol=1e-9, return_device=True)
    float(x_dev[2, ctr])  # device sync: a value only the finished solve has
    t_solve_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    mg.reassemble()
    t_asm = time.perf_counter() - t0
    t0 = time.perf_counter()
    x_dev = mg.solve_df_refined(f_dev, rtol=1e-9, return_device=True)
    w = float(x_dev[2, ctr])
    t_solve = time.perf_counter() - t0
    # one full host round trip (stage + fetch), timed for transparency
    t0 = time.perf_counter()
    f_dev2 = mg.stage_forces(forces)
    jax.block_until_ready(f_dev2)
    u = mg.fetch_solution(x_dev)
    t_io = time.perf_counter() - t0
    del f_dev2
    assert abs(float(u[ctr, 2]) - w) < 1e-12  # fetched field == synced scalar
    err = abs(w - golden) / golden
    fine = mg._fine
    out = {
        "n": n,
        "elem_type": et,
        "elements": n_elem,
        "dofs": 6 * mesh.n_nodes,
        "operator_rebuild_s": round(t_asm, 3),
        "solve_s": round(t_solve, 3),
        "solve_io_s": round(t_solve + t_io, 3),
        "operator_rebuild_first_s": round(t_asm_first, 3),
        "solve_first_s": round(t_solve_first, 3),
        "inner_iters": mg.last_iters,
        "true_residual": float(f"{mg.last_residual:.3e}"),
        "golden_err": float(f"{err:.3e}"),
        "fine_operator": "class" if mg._cdf is not None else "pair",
    }

    # class-table df matvec latency: chained matvecs in one jit + fetch
    if mg._cdf is not None:
        iters = 20
        x0 = df_from_f64(jnp.zeros((6, fine.npad), jnp.float64) + 1e-3)

        @jax.jit
        def chain_c(cp, x):
            def body(i, c):
                y = class_matvec_df(cp, c)
                s = jnp.max(jnp.abs(y.hi))
                return DF(y.hi / s, y.lo / s)

            y = jax.lax.fori_loop(0, iters, body, x)
            return jnp.sum(y.hi)

        float(chain_c(mg._cdf, x0))  # warm
        t0 = time.perf_counter()
        float(chain_c(mg._cdf, x0))
        dt = time.perf_counter() - t0
        out["class_mv_ms"] = round(dt / iters * 1e3, 3)

    # grid-df assembly Melem/s + Pallas df SpMV GB/s on a probe pair
    # (assembled transiently: the production solve above never builds it)
    sys0 = mg._systems[0]
    kw = dict(strip_nodes=mg._df_strip_nodes, chunk=mg._df_chunk,
              layout="tiled" if mg.use_pallas else "flat", with_diag=True,
              method="grid" if jax.devices()[0].platform != "cpu" else "auto")
    pair, _diag = sys0.assemble_df(**kw)  # warm/compile
    t0 = time.perf_counter()
    pair, _diag = sys0.assemble_df(**kw)
    t_grid = time.perf_counter() - t0
    out["assembly_s"] = round(t_grid, 3)
    out["assembly_melem_s"] = round(n_elem / t_grid / 1e6, 3)

    from fem_shell_tpu.ops.pallas_spmv_df import (
        stencil_spmv_pallas_df,
        stencil_spmv_pallas_df_flat,
    )

    iters = 20
    x0 = df_from_f64(jnp.zeros((6, fine.npad), jnp.float64) + 1e-3)

    @jax.jit
    def chain(vh, vl, x):
        def body(i, c):
            if vh.ndim == 4:
                y = stencil_spmv_pallas_df(vh, vl, c, fine.offsets)
            else:
                y = stencil_spmv_pallas_df_flat(DF(vh, vl), c, fine.offsets)
            s = jnp.max(jnp.abs(y.hi))
            return DF(y.hi / s, y.lo / s)

        y = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(y.hi)

    float(chain(pair.hi, pair.lo, x0))  # warm
    t0 = time.perf_counter()
    float(chain(pair.hi, pair.lo, x0))
    dt = time.perf_counter() - t0
    nbytes = pair.hi.size * 4 * 2  # hi + lo streamed per matvec
    # corrected accounting: the matvec also reads x (hi+lo) and writes
    # y (hi+lo) every application — true bytes moved per matvec
    nbytes_true = nbytes + x0.hi.size * 4 * 2 * 2
    out["pallas_df_spmv_gbs"] = round(iters * nbytes / dt / 1e9, 1)
    out["pallas_df_spmv_gbs_true"] = round(iters * nbytes_true / dt / 1e9, 1)

    # symmetric-storage kernel (the production CG matvec on pair-path
    # systems): streams only the off >= 0 slots, each block serving its
    # direct AND transposed term. "eq" = full-pair bytes + x + y over
    # the measured time — what a full-storage kernel would have to
    # stream to match it (the roofline-comparable number).
    from fem_shell_tpu.ops.assemble_grid import untile_values
    from fem_shell_tpu.ops.pallas_spmv_df import (
        prepare_tiled_values_df_sym,
        stencil_spmv_pallas_df_sym,
    )

    if pair.hi.ndim == 4:
        flat = DF(untile_values(pair.hi), untile_values(pair.lo))
    else:
        flat = pair
    vh_u, vl_u, _ = jax.jit(
        lambda f: prepare_tiled_values_df_sym(f, fine.offsets)
    )(flat)
    del flat

    @jax.jit
    def chain_s(vh, vl, x):
        def body(i, c):
            y = stencil_spmv_pallas_df_sym(vh, vl, c, fine.offsets)
            s = jnp.max(jnp.abs(y.hi))
            return DF(y.hi / s, y.lo / s)

        y = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(y.hi)

    float(chain_s(vh_u, vl_u, x0))  # warm
    t0 = time.perf_counter()
    float(chain_s(vh_u, vl_u, x0))
    dt = time.perf_counter() - t0
    out["pallas_df_spmv_sym_gbs_eq"] = round(iters * nbytes_true / dt / 1e9, 1)
    out["pallas_df_spmv_sym_gbs_phys"] = round(
        iters * (vh_u.size * 4 * 2 + x0.hi.size * 4 * 2 * 2) / dt / 1e9, 1
    )

    # full-field accuracy evidence (VERDICT r2 weak #4): the max-norm
    # relative error of the refined TPU solve vs a longdouble-refined CPU
    # reference is measured offline by tools/fullfield_audit.py (the CPU
    # reference needs its own pure-host process — see the tool's
    # docstring); pass the freshest/largest audit artifact through so the
    # scale row carries full-field, not center-only, evidence.
    import glob as _glob
    import json as _json

    audits = []
    here = os.path.dirname(os.path.abspath(__file__))
    for path in _glob.glob(os.path.join(here, "FULLFIELD_AUDIT_*.json")):
        try:
            with open(path) as f:
                audits.append(_json.load(f))
        except Exception:
            pass
    if audits:
        best = max(audits, key=lambda a: a.get("n", 0))
        out["fullfield_err"] = best["fullfield_err"]
        out["fullfield_audit_n"] = best["n"]
    return out


def _supervise(child_cmd=None):
    """Run the real bench as a CHILD process and retry once if it wedges
    before the headline JSON line. ``child_cmd`` overrides the child
    argv (tests inject a stub child; production uses this file).

    Rationale (observed r2 scale section AND r3 Test-G): the remote TPU
    worker occasionally wedges mid-compile — a blocked RPC that never
    returns, with the client frozen at ~0 CPU. The wedge is tied to the
    client process/tunnel: killing the client and reconnecting restores
    service within seconds (verified r3: a fresh jax.devices() returned
    immediately after killing a client that had been blocked 24 min).
    In-process watchdogs can only abort, losing the round's metric; a
    supervisor can kill the wedged child, probe the tunnel, and rerun.

    stdout passes through unchanged (the harness parses the JSON line
    from it); a retry is attempted only while no headline has been
    emitted, so a metric can never be printed twice."""
    import subprocess
    import threading

    headline_budget = float(
        os.environ.get("FEMSHELL_BENCH_HEADLINE_TIMEOUT", "2400")
    )
    env = dict(os.environ, FEMSHELL_BENCH_SUPERVISE="0")
    if child_cmd is None:
        child_cmd = [sys.executable, os.path.abspath(__file__)]
    attempts = 2
    for attempt in range(1, attempts + 1):
        child = subprocess.Popen(
            child_cmd, env=env, stdout=subprocess.PIPE, text=True,
        )
        headline = threading.Event()

        def _pump(stream=child.stdout):
            for line in stream:
                sys.stdout.write(line)
                sys.stdout.flush()
                if line.lstrip().startswith('{"metric"'):
                    headline.set()

        pump = threading.Thread(target=_pump, daemon=True)
        pump.start()
        deadline = time.time() + headline_budget
        poll_s = min(5.0, max(headline_budget / 10.0, 0.2))
        while (time.time() < deadline and child.poll() is None
               and not headline.is_set()):
            time.sleep(poll_s)
        if headline.is_set():
            # metric delivered — the scale section carries its own
            # in-child watchdogs; just wait it out
            rc = child.wait()
            pump.join(timeout=30)
            sys.exit(rc)
        # re-check right before killing: the child may have emitted the
        # headline just as the deadline hit / just before exiting — a
        # kill+retry then would print the metric twice
        if headline.is_set():
            rc = child.wait()
            pump.join(timeout=30)
            sys.exit(rc)
        if child.poll() is None:
            print(
                f"# no headline after {headline_budget:.0f} s — killing "
                f"wedged bench child (attempt {attempt}/{attempts})",
                file=sys.stderr, flush=True,
            )
            child.kill()
        rc = child.wait()
        pump.join(timeout=30)
        # the pump thread may have seen the headline while we were
        # waiting/killing — if it did, the metric is already on stdout;
        # retrying would duplicate it
        if headline.is_set():
            sys.exit(0)
        if attempt >= attempts:
            sys.exit(rc if rc != 0 else 1)
        # the tunnel can stay stuck briefly after the client dies —
        # probe with short-lived subprocesses until discovery returns
        for _ in range(10):
            try:
                p = subprocess.run(
                    [sys.executable, "-c", "import jax; jax.devices()"],
                    timeout=90, env=env,
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                )
                if p.returncode == 0:
                    break
            except subprocess.TimeoutExpired:
                pass
            time.sleep(15)
        print("# retrying bench after wedge", file=sys.stderr, flush=True)


def main():
    # Process-level watchdog: device discovery itself can block forever
    # when the remote TPU worker is wedged (observed r2). Guarantee
    # termination: no JSON line is emitted in that case (exit 1) so the
    # harness sees a failed run rather than a hang or a bogus metric.
    import threading

    total = float(os.environ.get("FEMSHELL_BENCH_TOTAL_TIMEOUT", "7200"))

    def _abort():  # pragma: no cover - wedged remote worker
        print(f"# bench timed out after {total:.0f} s (TPU unreachable or "
              f"wedged remote compile)", file=sys.stderr, flush=True)
        os._exit(1)

    killer = threading.Timer(total, _abort)
    killer.daemon = True
    killer.start()

    # Fail fast when the TPU is unreachable: device discovery either
    # returns in seconds or blocks indefinitely (stuck tunnel) — don't
    # burn the whole budget on it.
    disco = float(os.environ.get("FEMSHELL_BENCH_DISCOVERY_TIMEOUT", "600"))

    def _disco_abort():  # pragma: no cover - unreachable TPU
        print(f"# device discovery blocked for {disco:.0f} s — TPU "
              f"unreachable; aborting", file=sys.stderr, flush=True)
        os._exit(1)

    disco_killer = threading.Timer(disco, _disco_abort)
    disco_killer.daemon = True
    disco_killer.start()
    print(f"# device={jax.devices()[0]}", file=sys.stderr)
    disco_killer.cancel()
    t_tri, label_tri = bench_case("t")
    print(
        f"# tri-3 overall: {t_tri:.4f} s via {label_tri} "
        f"(vs baseline {BASELINES['t']} s -> {BASELINES['t'] / t_tri:.1f}x)",
        file=sys.stderr,
    )
    t_quad, label_quad = bench_case("q")
    print(f"# quad-4 overall: {t_quad:.4f} s via {label_quad}", file=sys.stderr)
    payload = {
        "metric": "testG_quad_overall_s",
        "value": round(t_quad, 4),
        "unit": "s",
        "vs_baseline": round(BASELINES["q"] / t_quad, 2),
    }
    # Emit the headline line FIRST and flushed: the scale section below
    # pays ~1 h of remote compiles on this machine (the axon AOT path
    # bypasses the persistent JAX cache) and a harness timeout there
    # must not be able to lose the primary metric.
    print(json.dumps(payload), flush=True)
    if os.environ.get("FEMSHELL_BENCH_SCALE", "1") != "0":
        # Watchdog: the remote TPU worker has been observed to wedge
        # mid-compile (a blocked RPC that never returns, seen r2); run
        # the scale section in a daemon thread and hard-exit on timeout
        # so this process can never hang the harness. The headline line
        # above is already flushed either way.
        import threading

        budget = float(os.environ.get("FEMSHELL_BENCH_SCALE_TIMEOUT", "4500"))
        result: dict = {}

        def _run():
            try:
                result["scale"] = bench_scale()
            except Exception as e:  # pragma: no cover
                result["error"] = f"{type(e).__name__}: {e}"

        th = threading.Thread(target=_run, daemon=True)
        th.start()
        th.join(budget)
        if th.is_alive():  # pragma: no cover - wedged remote worker
            print(f"# scale bench timed out after {budget:.0f} s (wedged "
                  f"remote compile?); see SCALE_BENCH.json from a prior run",
                  file=sys.stderr, flush=True)
            os._exit(0)
        if "scale" in result:
            print(f"# scale: {result['scale']}", file=sys.stderr)
            path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "SCALE_BENCH.json")
            with open(path, "w") as f:
                json.dump({"metric": "scale_1024_tri", **result["scale"]}, f)
                f.write("\n")
        else:  # pragma: no cover
            print(f"# scale bench unavailable ({result.get('error')})",
                  file=sys.stderr)


if __name__ == "__main__":
    if os.environ.get("FEMSHELL_BENCH_SUPERVISE", "1") != "0":
        _supervise()
    else:
        main()
