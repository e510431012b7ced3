"""Production batched sweeps: the BASELINE config-5 workload as a library.

The reference's only sweep driver is the critical-albedo script's serial
τ* loop (SOS_Aer_critical_albedo.py:485-503).  This module is the
framework's production sweep path (BASELINE.json configs[4]: 1e5 columns
over randomized (µ0, ground albedo, τ*_aer, ω_aer) with the FWC cloud
phase table):

- :func:`build_sweep_batch` — deterministic randomized scene batch + the
  µ0-pooled phase tables (P0(µ, µ0) built per distinct µ0 and gathered
  per column; the P matrices are shared).
- :func:`run_sweep` — chunked, **resumable** execution (SURVEY.md §5
  checkpoint row): results are written as per-chunk npz shards with an
  index JSON; a re-run with ``resume=True`` skips completed shards, so a
  killed 1e5-column sweep loses at most one chunk.  Emits structured
  metrics (sos_rt_tpu.metrics) per chunk and aggregated.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np

from sos_rt_tpu import metrics as _metrics
from sos_rt_tpu.config import GridSpec, Scene, SolverOptions


def build_sweep_batch(preset, batch: int, seed: int = 0, mu0_pool: int = 0,
                      dtype=None):
    """Randomized config-5-style scene batch from a preset.

    Randomizes (grd_alb, τ*_aer, ω_aer) per column and, with
    ``mu0_pool > 0``, draws each column's µ0 from that many distinct
    values in [0.2, 0.95] (tables built once per distinct value via
    ``PhaseTables.from_models_batched_mu0``).  Deterministic in ``seed``.
    Returns (scenes, tables).
    """
    import jax
    import jax.numpy as jnp

    from sos_rt_tpu.parallel import broadcast_scene
    from sos_rt_tpu.solver import PhaseTables

    if dtype is None:
        dtype = jnp.float64 if preset.opts.dtype == "float64" else jnp.float32
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    scenes = dataclasses.replace(
        broadcast_scene(preset.scene, batch),
        grd_alb=jax.random.uniform(k1, (batch,), minval=0.0, maxval=0.9),
        tau_star_aer=jax.random.uniform(k2, (batch,), minval=0.01,
                                        maxval=0.4),
        alb_aer=jax.random.uniform(k3, (batch,), minval=0.7, maxval=1.0))
    if mu0_pool > 0:
        pool = np.linspace(0.2, 0.95, mu0_pool)
        idx = jax.random.randint(k4, (batch,), 0, mu0_pool)
        scenes = dataclasses.replace(
            scenes, mu0=jnp.asarray(pool, dtype)[idx])
        tables = PhaseTables.from_models_batched_mu0(
            preset.grid, pool, atm=preset.atm, aer=preset.aer, dtype=dtype)
        tables = dataclasses.replace(tables, p0_atm=tables.p0_atm[idx],
                                     p0_aer=tables.p0_aer[idx])
    else:
        tables = PhaseTables.from_models(
            preset.grid, float(np.asarray(preset.scene.mu0)),
            atm=preset.atm, aer=preset.aer, dtype=dtype)
    return scenes, tables


def _shard_path(out_dir: str, i: int) -> str:
    return os.path.join(out_dir, f"shard_{i:05d}.npz")


def _summary_arrays(sol) -> Dict[str, np.ndarray]:
    """Reduced per-column outputs for shard files (TOA/surface rows —
    what config-5 consumers read; full fields stay on-device)."""
    if hasattr(sol, "i_toa"):
        i_toa, i_surface = sol.i_toa, sol.i_surface
    else:
        i_toa, i_surface = sol.i_total[:, 0, :], sol.i_total[:, -1, :]
    return {
        "i_toa": np.asarray(i_toa),
        "i_surface": np.asarray(i_surface),
        "n_orders": np.asarray(sol.n_orders),
        "converged": np.asarray(sol.converged),
    }


def run_sweep(preset, batch: int, seed: int = 0, mu0_pool: int = 0,
              engine: str = "mega", outputs: str = "summary",
              buckets: int = 1, block_b: int = 16, chunk: int = 0,
              out_dir: Optional[str] = None, resume: bool = False,
              mesh=None, stop_after_chunks: int = 0,
              log=None, save_orders: bool = False,
              sort: str = "predict") -> Dict[str, Any]:
    """Run a (resumable) sweep; returns the aggregated metrics dict.

    ``chunk > 0`` with ``out_dir``: solve ``chunk`` columns at a time,
    write one npz shard per chunk plus ``index.json``; ``resume=True``
    skips shards already recorded in the index (kill-and-resume safe:
    the index is rewritten atomically after each shard).
    ``stop_after_chunks > 0`` stops early after that many *newly solved*
    chunks (used by the kill-and-resume test).

    ``save_orders``: additionally record the per-order TOA/surface rows
    + validity per column (the reference's ``I_saved`` read-set,
    main_lambertian.py:460) — solved through
    :func:`sos_rt_tpu.solver.solve_batch_orders` (the vmapped reference
    engine; ``engine``/``buckets`` are ignored, throughput is the
    per-column path's).

    ``sort``: convergence-sort key for the mega engine — 'predict'
    (default: coarse-grid order-count pre-solve, +8% measured on the
    headline batch; falls back to the proxy when inapplicable) or
    'score' (the closed-form proxy).  Meshed runs use 'score'.
    """
    import jax

    from sos_rt_tpu.parallel import solve_batch
    from sos_rt_tpu.solver import solve_batch_orders

    def _log(msg):
        if log:
            log(msg)

    def _solve(part, part_tbl):
        """→ (solution, extra per-column shard arrays)."""
        if save_orders:
            sol, orders, valid = solve_batch_orders(
                part, part_tbl, preset.grid, preset.opts)
            return sol, {"orders_toa": np.asarray(orders[:, :, 0, :]),
                         "orders_surface": np.asarray(orders[:, :, 1, :]),
                         "order_valid": np.asarray(valid)}
        return solve_batch(part, part_tbl, preset.grid, preset.opts,
                           engine=engine, outputs=outputs, buckets=buckets,
                           block_b=block_b, mesh=mesh,
                           sort=sort if mesh is None else "score"), {}

    if save_orders and (chunk <= 0 or out_dir is None):
        # the per-order arrays only leave through the shard files — a
        # run that computes then discards them is a caller mistake
        raise ValueError("save_orders=True requires chunk > 0 and an "
                         "out_dir (the per-order arrays are written to "
                         "the npz shards)")
    scenes, tables = build_sweep_batch(preset, batch, seed, mu0_pool)
    p0b = getattr(tables.p0_atm, "ndim", np.ndim(tables.p0_atm)) == 2
    # per-chip throughput divides by the devices actually used — the
    # mesh's, not the host's (a single-chip solve on a multi-chip host
    # must not understate col/s/chip)
    n_devices = int(mesh.devices.size) if mesh is not None else 1
    if chunk <= 0 or out_dir is None:
        t0 = time.perf_counter()
        sol, _extra = _solve(scenes, tables)
        sol = _metrics.block_until_ready(sol)
        m = _metrics.solution_metrics(sol, time.perf_counter() - t0,
                                      n_devices=n_devices)
        m["engine"] = "orders" if save_orders else engine
        m["outputs"] = outputs
        return m

    os.makedirs(out_dir, exist_ok=True)
    index_path = os.path.join(out_dir, "index.json")
    # the spec pins everything that shapes a shard's physics/layout —
    # resuming into an out_dir written under a same-named but modified
    # preset (different grid/opts) must be rejected, not silently mixed
    g, o = preset.grid, preset.opts
    spec = {"preset": preset.name, "batch": batch, "seed": seed,
            "mu0_pool": mu0_pool, "chunk": chunk, "engine": engine,
            "outputs": outputs, "save_orders": bool(save_orders),
            "grid": {"nb_angles": g.nb_angles, "nb_layers": g.nb_layers,
                     "spacing": getattr(g, "spacing", "uniform")},
            "opts": {"surface": o.surface, "dtype": o.dtype,
                     "tol": float(o.tol), "max_orders": int(o.max_orders)}}
    done: set[int] = set()
    if resume and os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        if index.get("spec") != spec:
            raise ValueError(
                f"resume spec mismatch: index has {index.get('spec')}, "
                f"requested {spec}; use a fresh --output dir")
        done = {i for i in index.get("completed", [])
                if os.path.exists(_shard_path(out_dir, i))}
        _log(f"resuming: {len(done)} shard(s) already complete")

    n_chunks = -(-batch // chunk)
    wall = 0.0
    solved_now = 0
    solved_cols = 0
    take = lambda x, s: jax.tree_util.tree_map(lambda a: a[s], x)
    for i in range(n_chunks):
        if i in done:
            continue
        sl = slice(i * chunk, min((i + 1) * chunk, batch))
        part_size = sl.stop - sl.start
        part = take(scenes, sl)
        part_tbl = tables
        if p0b:
            part_tbl = dataclasses.replace(
                tables, p0_atm=tables.p0_atm[sl], p0_aer=tables.p0_aer[sl])
        if part_size < chunk:
            # pad the final partial chunk to the full chunk shape (repeat
            # the last column) so it reuses the already-compiled solve —
            # a fresh batch shape means a fresh minutes-scale compile
            # (measured r4: the 82,496-column tail of a 1e6 sweep cost
            # 42 s vs 0.93 s per full shard); results are sliced back
            pad_n = chunk - part_size
            import jax.numpy as jnp
            padf = lambda a: jnp.concatenate(
                [jnp.asarray(a),
                 jnp.broadcast_to(jnp.asarray(a)[-1:],
                                  (pad_n,) + np.shape(a)[1:])])
            part = jax.tree_util.tree_map(padf, part)
            if p0b:
                part_tbl = dataclasses.replace(
                    part_tbl, p0_atm=padf(part_tbl.p0_atm),
                    p0_aer=padf(part_tbl.p0_aer))
        t0 = time.perf_counter()
        sol, extra = _solve(part, part_tbl)
        sol = _metrics.block_until_ready(sol)
        if part_size < chunk:
            sol = take(sol, slice(0, part_size))
            extra = {k: v[:part_size] for k, v in extra.items()}
        dt = time.perf_counter() - t0
        wall += dt
        solved_cols += part_size
        arrays = _summary_arrays(sol)
        arrays.update(extra)
        # np.savez appends .npz if missing — keep the suffix on the temp
        tmp = _shard_path(out_dir, i)[:-4] + ".tmp.npz"
        np.savez_compressed(tmp, **arrays)
        os.replace(tmp, _shard_path(out_dir, i))
        done.add(i)
        index = {"spec": spec, "n_chunks": n_chunks,
                 "completed": sorted(done)}
        tmp_idx = index_path + ".tmp"
        with open(tmp_idx, "w") as f:
            json.dump(index, f)
        os.replace(tmp_idx, index_path)
        cm = _metrics.solution_metrics(sol, dt, n_devices=n_devices)
        _log(f"shard {i + 1}/{n_chunks}: {cm['batch']} columns in "
             f"{dt:.2f}s ({cm.get('col_per_s', 0):,.0f} col/s), "
             f"orders max {cm['orders_max']}")
        solved_now += 1
        if stop_after_chunks and solved_now >= stop_after_chunks:
            break

    m: Dict[str, Any] = {"engine": "orders" if save_orders else engine,
                         "outputs": outputs,
                         "n_chunks": n_chunks,
                         "n_completed": len(done),
                         "complete": len(done) == n_chunks}
    if len(done) == n_chunks:
        orders = []
        conv = 0
        n_tot = 0
        for i in range(n_chunks):
            with np.load(_shard_path(out_dir, i)) as z:
                orders.append(z["n_orders"])
                conv += int(z["converged"].sum())
                n_tot += int(z["n_orders"].shape[0])
        orders = np.concatenate(orders)
        m.update(batch=n_tot, orders_max=int(orders.max()),
                 orders_mean=float(orders.mean()),
                 n_converged=conv, n_unconverged=n_tot - conv)
    if wall > 0 and solved_now:
        m["wall_s"] = round(wall, 4)
        m["col_per_s"] = round(solved_cols / wall, 1)
    return m


def load_sweep(out_dir: str) -> Dict[str, np.ndarray]:
    """Concatenate a completed sweep's shards into one result dict."""
    with open(os.path.join(out_dir, "index.json")) as f:
        index = json.load(f)
    n = index["n_chunks"]
    missing = [i for i in range(n)
               if not os.path.exists(_shard_path(out_dir, i))]
    if missing:
        raise ValueError(f"sweep incomplete: missing shards {missing}")
    parts = []
    for i in range(n):
        with np.load(_shard_path(out_dir, i)) as z:
            parts.append({k: z[k] for k in z.files})
    return {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
