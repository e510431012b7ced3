"""Command-line driver: `python -m sos_rt_tpu <command>`.

Replaces the reference's "edit the driver file and run it" workflow
(README.md:63-85) with explicit commands:

  run              solve a scenario preset (or overridden parameters),
                   write results to .npz, optionally plot
  critical-albedo  Haywood critical-albedo search over τ*_aer values
  sweep            batched column sweep (columns × parameters)
  list             show presets and phase models

All outputs are relative paths (the reference hardcodes
``D:\\Polytechnique\\...``, SOS_Aer_graphe.py:23 etc.).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np


def _build(preset, dtype):
    import jax.numpy as jnp

    from sos_rt_tpu.solver import PhaseTables

    return PhaseTables.from_models(
        preset.grid, float(np.asarray(preset.scene.mu0)),
        atm=preset.atm, aer=preset.aer,
        dtype=jnp.float64 if dtype == "float64" else jnp.float32)


def _scene_overrides(scene, args):
    over = {}
    for f in ("mu0", "grd_alb", "alb_atm", "alb_aer", "tau_star_atm",
              "tau_star_aer", "z0", "z_up", "z_down"):
        v = getattr(args, f, None)
        if v is not None:
            over[f] = v
    return dataclasses.replace(scene, **over) if over else scene


def cmd_run(args):
    import jax
    import jax.numpy as jnp

    from sos_rt_tpu import outputs
    from sos_rt_tpu.config import GridSpec, SolverOptions
    from sos_rt_tpu.presets import get_preset
    from sos_rt_tpu.solver import solve_column

    p = get_preset(args.preset)
    grid = p.grid
    if args.nb_angles or args.nb_layers:
        grid = GridSpec(nb_angles=args.nb_angles or grid.nb_angles,
                        nb_layers=args.nb_layers or grid.nb_layers)
        p = dataclasses.replace(p, grid=grid)
    opts = p.opts
    if args.surface:
        opts = dataclasses.replace(opts, surface=args.surface)
    if args.dtype:
        opts = dataclasses.replace(opts, dtype=args.dtype)
    if getattr(args, "mm", None):
        opts = dataclasses.replace(opts, mm=args.mm)
    if opts.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    scene = _scene_overrides(p.scene, args)

    print(f"[sos] building {p.atm[0]}/{p.aer[0]} tables "
          f"(grid {grid.nb_angles}x{grid.nb_layers})...", file=sys.stderr)
    tables = _build(dataclasses.replace(p, scene=scene), opts.dtype)
    t0 = time.perf_counter()
    sol = jax.jit(solve_column, static_argnums=(2, 3))(scene, tables, grid, opts)
    jax.block_until_ready(sol.i_total)
    dt = time.perf_counter() - t0
    print(f"[sos] solved in {dt:.2f}s: {int(sol.n_orders)} orders, "
          f"converged={bool(sol.converged)}", file=sys.stderr)

    mu = jnp.asarray(grid.mu(), sol.i_total.dtype)
    w = jnp.asarray(grid.trapz_weights(), sol.i_total.dtype)
    z = jnp.linspace(scene.z0, 0.0, grid.nb_layers)
    fu, fd = outputs.flux_up_down(sol.i_total, mu, w, sol.tau, scene.mu0,
                                  scene.grd_alb, grid.nb_angles)
    nf = outputs.net_flux(sol.i_total, mu, w, sol.tau, scene.mu0,
                          scene.grd_alb)       # graphe_flux convention
    dif = outputs.diffusivity(sol.i_total, mu, w)
    hr = outputs.heating_rate(sol.i_total, mu, w, sol.tau, z, scene.mu0,
                              scene.grd_alb, grid.nb_angles,
                              sol.idx_up, sol.idx_down)
    out = args.output or f"sos_{p.name}.npz"
    np.savez_compressed(
        out, I=np.asarray(sol.i_total), I1=np.asarray(sol.i1),
        tau=np.asarray(sol.tau), mu=np.asarray(mu), z=np.asarray(z),
        flux_up=np.asarray(fu), flux_down=np.asarray(fd),
        net_flux=np.asarray(nf),
        diffusivity=np.asarray(dif), heating_rate=np.asarray(hr),
        n_orders=int(sol.n_orders))
    print(f"[sos] wrote {out}", file=sys.stderr)
    if args.save_orders:
        _save_orders(scene, tables, grid, opts, out, z)
    if args.plot:
        _plot(out)


def _save_orders(scene, tables, grid, opts, out, z):
    """Per-order artifacts: Iₙ fields + per-order diffusivity + plot.

    The reference's ``graphe_successive_dif`` (SOS_Aer_graphe.py:118-149)
    plots µ̄(z) for each scattering order from the driver's ``I_saved``
    list (SOS_Aer_main_lambertian.py:460).
    """
    import jax
    import jax.numpy as jnp

    from sos_rt_tpu import outputs
    from sos_rt_tpu.solver import solve_column_orders

    _, buf, valid = jax.jit(solve_column_orders, static_argnums=(2, 3))(
        scene, tables, grid, opts)
    n = int(np.sum(np.asarray(valid)))
    i_orders = np.asarray(buf)[:n]
    mu = jnp.asarray(grid.mu(), buf.dtype)
    w = jnp.asarray(grid.trapz_weights(), buf.dtype)
    dif_orders = np.asarray(outputs.per_order_diffusivity(
        jnp.asarray(i_orders), mu, w))
    path = out.replace(".npz", "_orders.npz")
    np.savez_compressed(path, I_orders=i_orders,
                        diffusivity_orders=dif_orders, z=np.asarray(z))
    print(f"[sos] wrote {path} ({n} orders)", file=sys.stderr)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 5))
    for k in range(n):
        ax.plot(dif_orders[k], np.asarray(z), label=f"order {k + 1}",
                alpha=0.8)
    ax.set_xlabel(r"per-order diffusivity $\bar{\mu}$")
    ax.set_ylabel("Altitude (km)")
    ax.grid(True)
    if n <= 12:
        ax.legend(fontsize=7)
    png = path.replace(".npz", ".png")
    fig.tight_layout(), fig.savefig(png, dpi=150)
    print(f"[sos] wrote {png}", file=sys.stderr)


def _plot(path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with np.load(path) as z:
        fig, axes = plt.subplots(1, 3, figsize=(13, 4))
        axes[0].plot(z["flux_up"], z["z"], label="flux up")
        axes[0].plot(z["flux_down"], z["z"], label="flux down")
        if "net_flux" in z.files:
            axes[0].plot(z["net_flux"], z["z"], label="net (graphe)",
                         ls="--")
        axes[0].set_xlabel("Flux"), axes[0].legend()
        axes[1].plot(z["diffusivity"], z["z"])
        axes[1].set_xlabel(r"Diffusivity $\bar{\mu}$")
        axes[2].plot(z["heating_rate"], z["z"])
        axes[2].set_xlabel("Heating rate")
        for ax in axes:
            ax.set_ylabel("Altitude (km)"), ax.grid(True)
        png = path.replace(".npz", ".png")
        fig.tight_layout(), fig.savefig(png, dpi=150)
        print(f"[sos] wrote {png}", file=sys.stderr)


def cmd_critical_albedo(args):
    """Haywood critical-albedo curve over a τ*_aer list.

    The reference sweeps τ*_aer serially, two full SOS solves per
    bisection step per τ (SOS_Aer_critical_albedo.py:485-503).  Here
    every τ value is one lane of a batched scene: the whole sweep
    compiles once and each bisection step solves all τ lanes together.
    """
    import jax
    import jax.numpy as jnp

    from sos_rt_tpu.forcing import critical_albedo, critical_albedo_batch
    from sos_rt_tpu.parallel import broadcast_scene
    from sos_rt_tpu.presets import get_preset

    p = get_preset(args.preset)
    if args.engine == "mega" and p.opts.dtype != "float32":
        # the production batched path is the f32 engine; the f64
        # per-column path (--engine column) is the verification twin
        p = dataclasses.replace(
            p, opts=dataclasses.replace(p.opts, dtype="float32"))
        print("[sos] --engine mega: using float32 (production path); "
              "--engine column keeps the preset dtype", file=sys.stderr)
    if p.opts.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    tables = _build(p, p.opts.dtype)
    taus = np.array([float(x) for x in args.tau_aer.split(",")])
    if args.num and args.num > len(taus):
        # densify between the min/max of --tau-aer — the Haywood-curve
        # batch demo (VERDICT r4 item 3).  Geometric spacing needs a
        # positive lower endpoint (geomspace raises on 0); fall back to
        # linear when the list starts at τ*_aer ≤ 0.
        lo, hi = float(taus.min()), float(taus.max())
        hi = max(hi, lo + 1e-6)
        if lo > 0:
            taus = np.geomspace(lo, hi, args.num)
        else:
            taus = np.linspace(lo, hi, args.num)
    t0 = time.perf_counter()
    scenes = dataclasses.replace(broadcast_scene(p.scene, len(taus)),
                                 tau_star_aer=jnp.asarray(taus))
    if args.engine == "column":
        albs = np.asarray(critical_albedo(scenes, tables, p.grid, p.opts))
    else:
        albs = np.asarray(critical_albedo_batch(scenes, tables, p.grid,
                                                p.opts, engine=args.engine))
    dt = time.perf_counter() - t0
    results = {float(t): float(a) for t, a in zip(taus, albs)}
    for t, a in results.items():
        print(f"[sos] tau*_aer={t}: critical albedo = {a:.4f}",
              file=sys.stderr)
    print(f"[sos] {len(taus)}-point curve in {dt:.2f}s (one compile, "
          f"batched bisection)", file=sys.stderr)
    out = args.output or "critical_albedo.json"
    with open(out, "w") as f:
        json.dump({"preset": args.preset, "critical_albedo": results}, f,
                  indent=2)
    print(f"[sos] wrote {out}", file=sys.stderr)
    if args.plot and len(taus) > 1:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(taus, albs, "o-")
        ax.set_xlabel(r"$\tau^*_{aer}$")
        ax.set_ylabel(r"critical albedo $\omega_c$")
        ax.grid(True)
        png = out.rsplit(".", 1)[0] + ".png"
        fig.tight_layout(), fig.savefig(png, dpi=150)
        print(f"[sos] wrote {png}", file=sys.stderr)


def cmd_sweep(args):
    """Batched column sweep — the BASELINE config-5 headline workload.

    Defaults reproduce the headline benchmark path outside bench.py
    (VERDICT r2 item 6): mega engine, summary outputs, µ0 drawn from a
    64-value pool for sweep presets.  With ``--chunk`` + ``--output DIR``
    results are written as resumable per-chunk shards (``--resume``
    skips completed ones).
    """
    import json as _json

    from sos_rt_tpu import sweep as _sweep
    from sos_rt_tpu.parallel import make_mesh
    from sos_rt_tpu.presets import get_preset

    p = get_preset(args.preset)
    if getattr(args, "mm", None):
        p = dataclasses.replace(
            p, opts=dataclasses.replace(p.opts, mm=args.mm))
    if getattr(args, "dtype", None):
        p = dataclasses.replace(
            p, opts=dataclasses.replace(p.opts, dtype=args.dtype))
    batch = args.batch or p.batch or 1024
    engine = args.engine or ("mega" if p.batch else "reference")
    outputs = "full" if (args.full or engine != "mega") else "summary"
    mu0_pool = args.mu0_pool if args.mu0_pool is not None else (
        64 if p.batch else 0)
    mesh = make_mesh() if args.mesh else None
    # --output without --chunk = one shard covering the whole batch
    chunk = args.chunk or (batch if args.output else 0)
    log = lambda m: print(f"[sos] {m}", file=sys.stderr)
    m = _sweep.run_sweep(
        p, batch, seed=args.seed, mu0_pool=mu0_pool, engine=engine,
        outputs=outputs, buckets=args.buckets, block_b=args.block_b,
        chunk=chunk, out_dir=args.output,
        resume=args.resume, mesh=mesh, log=log,
        save_orders=args.save_orders, sort=args.sort)
    m["preset"], m["batch_requested"] = args.preset, batch
    if "col_per_s" in m:
        log(f"{batch} columns: {m.get('wall_s', 0):.2f}s "
            f"({m['col_per_s']:,.0f} col/s), engine={engine}/{outputs}")
    print(_json.dumps({"sweep_metrics": m}), flush=True)
    if args.metrics:
        with open(args.metrics, "w") as f:
            _json.dump(m, f, indent=2)
        log(f"wrote {args.metrics}")


def cmd_list(_args):
    from sos_rt_tpu.models import available_models
    from sos_rt_tpu.presets import PRESETS

    print("presets:", ", ".join(sorted(PRESETS)))
    print("phase models:", ", ".join(available_models()))


def main(argv=None):
    # multi-host launch: JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    # JAX_PROCESS_ID in the environment initialize the distributed
    # runtime (no-op otherwise) — see parallel/distributed.py
    from sos_rt_tpu.parallel.distributed import init_distributed

    init_distributed()
    ap = argparse.ArgumentParser(prog="sos_rt_tpu", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="solve one scenario")
    run.add_argument("--preset", default="eva")
    run.add_argument("--surface", choices=["lambertian", "specular"])
    run.add_argument("--dtype", choices=["float32", "float64"])
    run.add_argument("--mm", choices=["bf16x3", "bf16x5", "highest"],
                     help="matmul precision mode (config.SolverOptions.mm)")
    run.add_argument("--nb-angles", type=int, dest="nb_angles")
    run.add_argument("--nb-layers", type=int, dest="nb_layers")
    for f in ("mu0", "grd_alb", "alb_atm", "alb_aer", "tau_star_atm",
              "tau_star_aer", "z0", "z_up", "z_down"):
        run.add_argument(f"--{f.replace('_', '-')}", type=float, dest=f)
    run.add_argument("--output", "-o")
    run.add_argument("--plot", action="store_true")
    run.add_argument("--save-orders", action="store_true", dest="save_orders",
                     help="also write per-order fields + per-order "
                          "diffusivity (npz + png)")
    run.set_defaults(fn=cmd_run)

    ca = sub.add_parser("critical-albedo", help="Haywood critical albedo")
    ca.add_argument("--preset", default="eva")
    ca.add_argument("--tau-aer", default="0.120", dest="tau_aer",
                    help="comma-separated τ*_aer values (batched as lanes)")
    ca.add_argument("--num", type=int, default=0,
                    help="densify to N geometric τ*_aer lanes between "
                         "min/max of --tau-aer (Haywood-curve batch mode)")
    ca.add_argument("--engine", choices=["mega", "reference", "column"],
                    default="mega",
                    help="forcing evaluator per bisection step: 'mega' = "
                         "one batched summary solve (~1e5 col/s, f32), "
                         "'reference' = batched GSPMD engine, 'column' = "
                         "per-column vmap solve (f64-capable twin)")
    ca.add_argument("--plot", action="store_true")
    ca.add_argument("--output", "-o")
    ca.set_defaults(fn=cmd_critical_albedo)

    sw = sub.add_parser("sweep", help="batched column sweep")
    sw.add_argument("--preset", default="fwc_sweep")
    sw.add_argument("--batch", type=int)
    sw.add_argument("--seed", type=int, default=0)
    sw.add_argument("--engine", choices=["reference", "fused", "mega"],
                    help="solver engine (default: mega for sweep presets)")
    sw.add_argument("--full", action="store_true",
                    help="keep full (B, L, 2M) fields instead of "
                         "TOA/surface summary rows")
    sw.add_argument("--mu0-pool", type=int, dest="mu0_pool",
                    help="draw per-column mu0 from N distinct values "
                         "(default 64 for sweep presets; 0 = fixed mu0)")
    sw.add_argument("--buckets", type=int, default=1,
                    help="convergence-homogeneous bucketing")
    sw.add_argument("--block-b", type=int, default=16, dest="block_b")
    sw.add_argument("--sort", choices=["predict", "score"],
                    default="predict",
                    help="mega-engine convergence-sort key: 'predict' = "
                         "coarse-grid order pre-solve (+8%% headline), "
                         "'score' = closed-form proxy")
    sw.add_argument("--dtype", choices=["float32", "float64"],
                    help="override the preset compute dtype (batched "
                         "sweeps of f64 presets, e.g. eva, want float32 "
                         "on TPU — the production engines' dtype)")
    sw.add_argument("--save-orders", action="store_true",
                    dest="save_orders",
                    help="record per-order TOA/surface rows + validity "
                         "per column in the shard files (the reference's"
                         " I_saved read-set; runs the per-column "
                         "reference engine — slower than mega)")
    sw.add_argument("--mm", choices=["bf16x3", "bf16x5", "highest"],
                    help="matmul precision mode (config.SolverOptions.mm)")
    sw.add_argument("--chunk", type=int, default=0,
                    help="columns per resumable shard (with --output DIR)")
    sw.add_argument("--resume", action="store_true",
                    help="skip shards already in --output/index.json")
    sw.add_argument("--metrics", help="write aggregated metrics JSON here")
    sw.add_argument("--mesh", action="store_true",
                    help="shard over all visible devices")
    sw.add_argument("--output", "-o",
                    help="shard output DIRECTORY (npz shards + index.json)")
    sw.set_defaults(fn=cmd_sweep)

    ls = sub.add_parser("list", help="list presets and models")
    ls.set_defaults(fn=cmd_list)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
