"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline (BASELINE.md): column-solves/s/chip at 100 ppm convergence on
the BASELINE config-5 sweep — a batched sweep over (µ0, ground albedo,
τ*_aer, ω_aer) with the FWC tabulated cloud phase function on a
production sweep grid (nb_angles=64 → 128 µ points, nb_layers=128),
f32, one chip.  Target: ≥ 1e5 column-solves/s/chip (vs_baseline = value/1e5).

The sweep runs the mega engine with ``outputs='summary'``: every column
is solved to 100 ppm on-chip; only the TOA/surface rows and stats leave
the device (what config-5 consumers — forcing/critical-albedo sweeps —
read; full fields via outputs='full').  BASELINE.md records the
output-mode alongside each measurement.

Secondary metrics (stderr): canonical-grid (501 angles × 800 layers)
single-column solve latency; on-TPU mega-vs-reference parity
(max rel err over TOA/surface rows — the compiled-kernel correctness
artifact, VERDICT r2 item 4).

Robustness (r3 lesson: BENCH_r03 recorded NO metric because every mega
compile failed fresh and the ladder had no fallback):
- a COMPILE SMOKE runs first: it traces+lowers+compiles the mega kernel
  at a tiny shape in ~1 min, so a toolchain break (e.g. the r3 Mosaic
  "Invalid relayout") is detected by name up front and the ladder skips
  straight to the fused/reference fallbacks instead of burning four
  2300 s timeouts;
- a GUARANTEED-EMIT stage runs before the big ladder: a small sweep
  whose compile is minutes-bounded; its metric is printed immediately,
  so the driver always captures a real number even if a later stage (or
  the driver's own timeout) kills the rest; a better ladder result is
  emitted after (the driver's parser takes a JSON metric line — both
  lines carry the same schema, the LAST reflects the best measurement);
- every stage runs in a fresh subprocess with a hard timeout killing the
  whole process group (the TPU relay's compile service has minutes-scale
  variance, and an orphaned TPU-plugin helper wedges the device);
- a persistent compilation cache (.jax_cache) is shared across processes
  and rounds — but no stage RELIES on a warm cache.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
TARGET = 1e5
N_MU0 = 64          # distinct solar angles in the µ0 sweep axis


def _enable_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sweep_inputs(batch: int):
    """The config-5 batch — THE production definition from
    sos_rt_tpu.sweep.build_sweep_batch (identical PRNG draws/ranges;
    the benchmark measures exactly what the CLI sweep runs)."""
    from sos_rt_tpu.presets import get_preset
    from sos_rt_tpu.sweep import build_sweep_batch

    p = get_preset("fwc_sweep")
    scenes, tables = build_sweep_batch(p, batch, seed=0, mu0_pool=N_MU0)
    return scenes, tables, p.grid


def bench_smoke():
    """Compile-only gate: lower + compile the mega kernel at a tiny
    shape (B=256, C=128) with a FRESH in-memory cache path — catches
    Mosaic lowering breaks (r3: 'Invalid relayout') in ~1 min, without
    masking by the persistent cache (compile goes through the cache but
    a broken kernel fails before any cache hit can exist for new
    toolchains).  Prints 'SMOKE OK' on success; any compile error
    propagates with the Mosaic message in the traceback."""
    import jax

    from sos_rt_tpu.config import SolverOptions
    from sos_rt_tpu.fused import solve_batch_mega

    if os.environ.get("SOS_BENCH_FORCE_SMOKE_FAIL"):
        # test hook: simulate a toolchain-broken mega kernel so the
        # fallback ladder can be exercised end-to-end (VERDICT r3 item
        # 2's done-criterion)
        raise RuntimeError("smoke failure forced by SOS_BENCH_FORCE_SMOKE_FAIL")
    opts = SolverOptions(surface="lambertian", dtype="float32",
                         max_orders=100, scan_impl="sequential")
    scenes, tables, grid = _sweep_inputs(256)
    fn = jax.jit(lambda s, t: solve_batch_mega(
        s, t, grid, opts, outputs="summary", cols_per_block=128,
        allow_small=False, sort=False))
    t0 = time.perf_counter()
    fn.lower(scenes, tables).compile()
    log(f"smoke: mega kernel compiled in {time.perf_counter()-t0:.1f}s")
    print("SMOKE OK", flush=True)


def bench_sweep(batch=65536, reps=4, buckets=4, engine="mega", block_b=128,
                cols_per_block=None):
    """Measured on v5e (BASELINE.md, r4): best operating points
    B=131072/C=128/bk=4 → 142.3k col/s, B=262144/bk=8 → 143.3k (flat
    beyond 131k), B=65536/bk=8 → 139.7k, B=32768/C=256 → 115.7–117.3k;
    relay-window variance ±15%; C=512 exceeds the 128 MB VMEM budget
    and C=192 violates Mosaic's lane-divisibility rule."""
    if cols_per_block is None:
        cols_per_block = 128 if batch >= 65536 else 256
    if batch % buckets:
        buckets = 1
    import jax
    import jax.numpy as jnp

    from sos_rt_tpu.config import SolverOptions
    from sos_rt_tpu.parallel import solve_batch

    opts = SolverOptions(surface="lambertian", dtype="float32",
                         max_orders=100, scan_impl="sequential")
    scenes, tables, grid = _sweep_inputs(batch)
    outputs = "summary" if engine == "mega" else "full"

    def run(i):
        sc = dataclasses.replace(scenes, grd_alb=scenes.grd_alb + i * 1e-7)
        # sort='predict' (r5): coarse-grid order-count pre-solve as the
        # block sort key — measured +8% at B=131072 net of the
        # predictor's own cost (135.6k → 146.2k col/s, same window)
        sol = solve_batch(sc, tables, grid, opts, buckets=buckets,
                          engine=engine, block_b=block_b, outputs=outputs,
                          cols_per_block=cols_per_block,
                          sort="predict" if engine == "mega" else "score")
        i_toa = sol.i_toa if outputs == "summary" else sol.i_total[:, 0, :]
        chk = float(jnp.sum(i_toa))     # forces the whole dispatch queue
        stats = (int(jnp.max(sol.n_orders)),
                 float(jnp.mean(sol.n_orders.astype(jnp.float32))),
                 int(jnp.sum(sol.converged)))
        return stats, chk

    t0 = time.perf_counter()
    (o_max, o_mean, n_conv), _ = run(0)
    log(f"sweep[{engine}] compile+first run: {time.perf_counter()-t0:.1f}s; "
        f"orders max={o_max} mean={o_mean:.1f} "
        f"converged={n_conv}/{batch}")
    times = []
    for i in range(1, reps + 1):
        t0 = time.perf_counter()
        run(i)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    rate = batch / dt
    # roofline context (VERDICT r4 item 2): the dominant FLOPs are the
    # per-order stacked Jₙ source matmul, (L, 4Mp) @ (4Mp, 2Mp) per
    # column (ops/megakernel.py); bf16x3 runs each pass 3× on the MXU.
    # v5e peak ≈ 197 TFLOP/s bf16.  The pass model is the MEGA engine's
    # — the fallback engines run different kernels/precisions, so no
    # utilization estimate is emitted for them.
    if engine != "mega":
        log(f"sweep[{engine}]: {batch} columns in {dt*1e3:.1f} ms "
            f"-> {rate:,.0f} col/s")
        return rate, grid, engine, None
    from sos_rt_tpu.ops import megakernel as mk

    mp = mk.pad_angles(grid.nb_angles)
    flops_col = o_mean * 2.0 * grid.nb_layers * (4 * mp) * (2 * mp)
    tflops = rate * flops_col / 1e12
    mxu_tflops = 3.0 * tflops          # bf16x3: 3 MXU passes per dot
    log(f"sweep[{engine}]: {batch} columns in {dt*1e3:.1f} ms "
        f"-> {rate:,.0f} col/s | Jn-matmul {tflops:.1f} eff TFLOP/s "
        f"({mxu_tflops:.1f} MXU TFLOP/s at bf16x3, "
        f"{100 * mxu_tflops / 197:.1f}% of v5e bf16 peak)")
    return rate, grid, engine, round(mxu_tflops / 197, 4)


def bench_canonical():
    import jax
    import jax.numpy as jnp

    from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
    from sos_rt_tpu.ops.sweeps import build_stencils
    from sos_rt_tpu.solver import PhaseTables, solve_column

    grid = GridSpec(nb_angles=501, nb_layers=800)
    opts = SolverOptions(surface="lambertian", dtype="float32", max_orders=40)
    tables = PhaseTables.from_models(grid, 0.5, atm=("rayleigh", {}),
                                     aer=("hg", {"g": 0.7}), dtype=jnp.float32)
    stencils = build_stencils(grid.mu(), grid.nb_angles)
    scene = Scene(mu0=0.5, grd_alb=0.15)

    fn = jax.jit(lambda s, t: solve_column(s, t, grid, opts, stencils))
    t0 = time.perf_counter()
    sol = fn(scene, tables)
    jax.block_until_ready(sol.i_total)
    log(f"canonical compile+first: {time.perf_counter()-t0:.1f}s "
        f"(orders={int(sol.n_orders)})")
    t0 = time.perf_counter()
    sol = fn(scene, tables)
    jax.block_until_ready(sol.i_total)
    dt = time.perf_counter() - t0
    log(f"canonical single-column solve: {dt*1e3:.1f} ms")

    # canonical BATCHED throughput via the HBM-streaming mega engine
    # (VERDICT r4 item 1; r5 measured 801 col/s at B=128/bf16x3 vs the
    # r4 fused fallback's 302) — recorded every round beside the
    # single-column latency
    from sos_rt_tpu.fused import solve_batch_mega
    from sos_rt_tpu.parallel import broadcast_scene

    B = 256
    scenes = dataclasses.replace(
        broadcast_scene(Scene(), B),
        grd_alb=jnp.linspace(0.05, 0.6, B),
        tau_star_aer=jnp.linspace(0.05, 0.3, B),
        alb_aer=jnp.linspace(0.8, 1.0, B))
    bopts = SolverOptions(surface="lambertian", dtype="float32",
                          max_orders=40, mm="bf16x3")
    bfn = jax.jit(lambda s, t: solve_batch_mega(
        s, t, grid, bopts, outputs="summary", allow_small=True))
    t0 = time.perf_counter()
    summ = bfn(scenes, tables)
    n_conv = int(jnp.sum(summ.converged))
    log(f"canonical stream batch compile+first: "
        f"{time.perf_counter()-t0:.1f}s (converged {n_conv}/{B})")
    times = []
    for i in range(1, 3):
        t0 = time.perf_counter()
        summ = bfn(dataclasses.replace(
            scenes, grd_alb=scenes.grd_alb + i * 1e-7), tables)
        float(jnp.sum(summ.i_toa))
        times.append(time.perf_counter() - t0)
    bdt = min(times)
    log(f"canonical stream batch B={B}: {bdt*1e3:.1f} ms -> "
        f"{B/bdt:,.0f} col/s (501x800, f32/bf16x3, summary)")
    return dt


def _oracle_rows(scenes, tables, grid, n):
    """f64 NumPy-oracle TOA/surface rows + order counts for the first
    ``n`` sweep columns (the measured 'f32 floor' anchor — VERDICT r4
    item 5)."""
    import numpy as np

    from sos_rt_tpu.oracle import oracle_solve

    sc = {k: np.asarray(getattr(scenes, k), np.float64)
          for k in ("mu0", "grd_alb", "alb_atm", "alb_aer",
                    "tau_star_atm", "tau_star_aer", "z0", "z_up", "z_down")}
    p_atm = np.asarray(tables.p_atm, np.float64)
    p_aer = np.asarray(tables.p_aer, np.float64)
    p0_atm = np.asarray(tables.p0_atm, np.float64)
    p0_aer = np.asarray(tables.p0_aer, np.float64)
    toa, srf, orders = [], [], []
    for i in range(n):
        r = oracle_solve(
            surface="lambertian", nb_layers=grid.nb_layers,
            nb_angles=grid.nb_angles,
            p0_atm=p0_atm[i] if p0_atm.ndim == 2 else p0_atm, p_atm=p_atm,
            p0_aer=p0_aer[i] if p0_aer.ndim == 2 else p0_aer, p_aer=p_aer,
            **{k: float(v[i]) for k, v in sc.items()})
        toa.append(r["I"][0])
        srf.append(r["I"][-1])
        orders.append(r["n_orders"])
    return np.stack(toa), np.stack(srf), np.asarray(orders)


def bench_parity(batch=256, engine="mega", n_oracle=128):
    """On-TPU compiled kernel vs the reference engine AND both engines
    vs the f64 NumPy oracle: rel-err tails (p50/p99/max) over the
    TOA/surface rows + order-count agreement.  The side-by-side oracle
    tails make 'the compiled kernel is at the f32 floor' a measured
    per-round artifact, not a BASELINE.md recollection (VERDICT r4
    item 5)."""
    import jax.numpy as jnp
    import numpy as np

    from sos_rt_tpu.config import SolverOptions
    from sos_rt_tpu.parallel import solve_batch

    scenes, tables, grid = _sweep_inputs(batch)
    ref_opts = SolverOptions(surface="lambertian", dtype="float32",
                             max_orders=100, scan_impl="sequential")
    ref = solve_batch(scenes, tables, grid, ref_opts, engine="reference")
    ref_toa = np.asarray(ref.i_total[:, 0, :])
    ref_srf = np.asarray(ref.i_total[:, -1, :])
    ref_n = np.asarray(ref.n_orders)
    scale = max(np.abs(ref_toa).max(), np.abs(ref_srf).max())

    def rows(mm):
        opts = dataclasses.replace(ref_opts, mm=mm)
        if engine == "mega":
            fast = solve_batch(scenes, tables, grid, opts, engine="mega",
                               outputs="summary", block_b=64)
            return (np.asarray(fast.i_toa), np.asarray(fast.i_surface),
                    np.asarray(fast.n_orders))
        fast = solve_batch(scenes, tables, grid, opts, engine=engine)
        return (np.asarray(fast.i_total[:, 0, :]),
                np.asarray(fast.i_total[:, -1, :]),
                np.asarray(fast.n_orders))

    def one(mm):
        fast_toa, fast_srf, fast_n = rows(mm)
        per_col = np.maximum(
            np.abs(fast_toa - ref_toa).max(axis=1),
            np.abs(fast_srf - ref_srf).max(axis=1)) / scale
        eq = fast_n == ref_n
        n_eq = int(eq.sum())
        err_eq = float(per_col[eq].max()) if n_eq else float("nan")
        log(f"tpu {engine} parity (mm={mm or 'default'}) over {batch} "
            f"columns (TOA+surface rows, vs reference engine): order "
            f"counts equal {n_eq}/{batch}; max rel err "
            f"{per_col.max():.3e} (all), {err_eq:.3e} (equal-order "
            f"columns), p50 {np.median(per_col):.3e}")
        return err_eq, (fast_toa, fast_srf, fast_n)

    # accuracy mode = the kernel-correctness artifact (f32 floor);
    # default bf16x3 = the documented throughput-mode bound (its dot
    # residual flips the smoothing walk's 1e-4 threshold occasionally —
    # see config.SolverOptions.mm)
    err, _ = one("bf16x5" if engine == "mega" else None)
    fast_rows = None
    if engine == "mega":
        _, fast_rows = one(None)

    # f32-floor artifact: BOTH f32 engines vs the f64 oracle, tails
    # side by side — engine-independence of the tails is re-proven
    # every round instead of remembered.
    if n_oracle:
        n_oracle = min(n_oracle, batch)
        t0 = time.perf_counter()
        orc_toa, orc_srf, orc_n = _oracle_rows(scenes, tables, grid, n_oracle)
        log(f"oracle: {n_oracle} f64 column solves in "
            f"{time.perf_counter()-t0:.1f}s")
        oscale = max(np.abs(orc_toa).max(), np.abs(orc_srf).max())

        def tails(toa, srf, n_ord, name):
            per_col = np.maximum(
                np.abs(toa[:n_oracle] - orc_toa).max(axis=1),
                np.abs(srf[:n_oracle] - orc_srf).max(axis=1)) / oscale
            n_eq = int((n_ord[:n_oracle] == orc_n).sum())
            log(f"vs f64 oracle [{name}] over {n_oracle} columns: "
                f"p50 {np.median(per_col):.3e} "
                f"p99 {np.percentile(per_col, 99):.3e} "
                f"max {per_col.max():.3e}; order counts equal "
                f"{n_eq}/{n_oracle}")
            return float(np.median(per_col))

        p50_ref = tails(ref_toa, ref_srf, ref_n, "reference f32")
        if fast_rows is not None:
            p50_fast = tails(*fast_rows, engine + " f32")
            log(f"f32-floor check: {engine} p50 / reference p50 = "
                f"{p50_fast / p50_ref:.2f} (≈1 ⇒ kernel at the f32 "
                f"accuracy floor)")
    return err


def _emit(rate: float, grid=None, engine: str = "mega", mfu=None):
    gs = f"{grid.nb_angles}x{grid.nb_layers}" if grid is not None else "64x128"
    rec = {
        "metric": (f"column-solves/s/chip (config-5 sweep mu0+alb+tau, "
                   f"grid {gs}, 100ppm, f32, "
                   f"{'summary' if engine == 'mega' else 'full'} outputs, "
                   f"engine={engine})"),
        "value": round(rate, 1),
        "unit": "columns/s",
        "vs_baseline": round(rate / TARGET, 4),
    }
    if mfu is not None:
        rec["mxu_util_est"] = mfu     # Jn-matmul MXU fraction of v5e peak
    print(json.dumps(rec), flush=True)


def _stage(argv, timeout, retries=1):
    """Run one bench stage in a fresh subprocess (a TPU
    RESOURCE_EXHAUSTED poisons the whole JAX client, and relay stalls
    need hard timeouts + retries — see module docstring).

    The stage runs in its own session and a timeout kills the WHOLE
    process group: the TPU plugin forks helper children, and an orphaned
    helper keeps the device wedged for every later stage (the likely
    mechanism behind the r2 canonical timeout chain)."""
    import signal
    import subprocess

    for attempt in range(retries + 1):
        p = subprocess.Popen([sys.executable, __file__] + argv,
                             stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                             text=True, start_new_session=True)
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            log(f"stage {argv} attempt {attempt + 1} timed out after "
                f"{timeout}s; killing its process group")
            try:
                os.killpg(os.getpgid(p.pid), signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
            try:
                out, err = p.communicate(timeout=30)
            except subprocess.TimeoutExpired:
                out, err = "", ""
            if err:
                sys.stderr.write(err)
            continue
        sys.stderr.write(err)
        if p.returncode == 0:
            return subprocess.CompletedProcess(p.args, 0, out, err)
        log(f"stage {argv} attempt {attempt + 1} failed rc={p.returncode}")
    return None


def _stage_metric(argv, timeout, retries=0):
    """Run a --sweep stage and return its parsed metric dict (or None)."""
    r = _stage(argv, timeout, retries)
    if r is None:
        return None
    for line in reversed(r.stdout.strip().splitlines()):
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def main():
    # 1. compile smoke: is the mega kernel compilable under the current
    #    toolchain?  (~1 min warm relay; the r3 Mosaic break surfaced
    #    here as a named failure instead of four dead 2300 s stages)
    mega_ok = _stage(["--smoke"], timeout=900, retries=1) is not None
    log(f"mega compile smoke: {'OK' if mega_ok else 'FAILED'}")
    # 2. canonical: cheap (≤ 1 min warm-cache) secondary latency metric
    _stage(["--canonical"], timeout=720, retries=1)
    # 3. guaranteed-emit: a small sweep whose cold compile is bounded;
    #    falls back fused → reference so SOME real metric always parses.
    #    Its JSON is printed immediately (see module docstring).
    best = None
    # fallback order measured r4 on the sweep grid (B=8192, buckets=8):
    # reference engine 9.8k col/s (pure XLA — no Mosaic dependency, the
    # most robust path), fused 8.4k (layer-major kernels; its remaining
    # cost is the lane-axis smoothing reductions — the angle-major mega
    # kernel is the engine that solves that, hence no third rewrite)
    ladder = ([["--sweep", "32768", "--buckets", "1"]] if mega_ok else []) + [
        ["--sweep", "8192", "--buckets", "8", "--engine", "reference"],
        ["--sweep", "8192", "--buckets", "8", "--engine", "fused"],
    ]
    for argv in ladder:
        m = _stage_metric(argv, timeout=1800, retries=0)
        if m is not None:
            best = m
            print(json.dumps(m), flush=True)
            break
        log(f"guaranteed stage {argv} produced no metric; trying fallback")
    # 4. headline ladder (mega only — the fused/reference engines cannot
    #    approach the target; no point burning their compile time twice).
    #    Best measured operating points r4: B=131072/bk=4 -> 142.3k,
    #    B=262144/bk=8 -> 143.3k (flat beyond 131072), B=65536/bk=8 ->
    #    139.7k; C=128 via the bench_sweep default.
    #    The TOP TWO points are both measured and the better one emitted
    #    (VERDICT r4 item 2: one relay-window draw of the first config
    #    recorded a headline ~10% under the tuned best; two configs ≈
    #    two windows); on failures the ladder walks the fallback list
    #    until one success.
    #    A FAILED smoke still gets ONE mega attempt here (after a
    #    fallback metric is already banked): the relay sporadically
    #    stalls a whole stage for ~10 min (BASELINE relay notes), and a
    #    stalled smoke must not lock the round to the 9.8k fallback
    #    when the kernel itself is fine.
    top2 = [(131072, 4), (262144, 8)] if mega_ok else []
    fallback = ([(65536, 8), (65536, 4), (32768, 1)]
                if mega_ok else [(65536, 4)])
    if mega_ok or best is not None:
        n_ok = 0
        for batch, buckets in top2:
            m = _stage_metric(["--sweep", str(batch), "--buckets",
                               str(buckets)], timeout=2300, retries=0)
            if m is None:
                log(f"sweep batch={batch} buckets={buckets} failed")
                continue
            n_ok += 1
            if best is None or m["value"] > best["value"]:
                best = m
                print(json.dumps(m), flush=True)
        if n_ok == 0:
            for batch, buckets in fallback:
                m = _stage_metric(["--sweep", str(batch), "--buckets",
                                   str(buckets)], timeout=2300, retries=0)
                if m is not None:
                    if best is None or m["value"] > best["value"]:
                        best = m
                        print(json.dumps(m), flush=True)
                    break
                log(f"sweep batch={batch} buckets={buckets} failed; "
                    f"next config")
    if best is None:
        _emit(0.0)
    # 5. parity artifact (never hurts the headline)
    _stage(["--parity"] + ([] if mega_ok else ["--engine", "fused"]),
           timeout=1500, retries=0)


def _arg(flag, default):
    return (sys.argv[sys.argv.index(flag) + 1]
            if flag in sys.argv else default)


if __name__ == "__main__":
    if "--sweep" in sys.argv:
        _enable_cache()
        import jax

        log(f"devices: {jax.devices()}")
        rate, grid, engine, mfu = bench_sweep(
            batch=int(_arg("--sweep", 65536)), reps=3,
            buckets=int(_arg("--buckets", 4)),
            engine=_arg("--engine", "mega"))
        _emit(rate, grid, engine, mfu)
    elif "--smoke" in sys.argv:
        _enable_cache()
        bench_smoke()
    elif "--canonical" in sys.argv:
        _enable_cache()
        bench_canonical()
    elif "--parity" in sys.argv:
        _enable_cache()
        bench_parity(engine=_arg("--engine", "mega"))
    else:
        sys.exit(main())
