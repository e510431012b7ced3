"""Multi-chip batched solving: columns data-parallel over a device mesh.

The reference is single-machine NumPy with one multiprocessing.Pool
(SOS_Aer_phase_func.py:573); everything here is new capability per the
north star (SURVEY.md §2 "Parallelism & communication"):

- **DP ('data' axis)** — the primary scaling axis: batches of independent
  atmospheric columns (varying µ0, albedo, τ*, aerosol) sharded across
  all chips.  Phase tables are replicated.
- **TP ('model' axis)** — optional sharding of the angle axis of the Jₙ
  matmul operators for very high angular resolution: the (2M, 2M)
  operators are laid out P(None, 'model') and XLA/GSPMD inserts the
  collectives.
- **Convergence reduction** — the 100 ppm criterion's global
  `any(ratio >= tol)` inside `lax.while_loop` becomes an all-reduce over
  the sharded lane axis, emitted by XLA over ICI (the reference criterion
  main_lambertian.py:311 as a cross-chip pmax).

Per-column results are bit-identical to unbatched solves: lanes mask
their accumulation once converged (see solver.body).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
from sos_rt_tpu.ops.sweeps import build_stencils
from sos_rt_tpu.solver import PhaseTables, solve_column


def make_mesh(mesh_shape: Optional[tuple] = None,
              axis_names: tuple = ("data", "model")) -> Mesh:
    """Mesh over all visible devices; default puts everything on 'data'."""
    n = len(jax.devices())
    if mesh_shape is None:
        mesh_shape = (n, 1)
    # Auto axis types: classic GSPMD propagation (the solver is written
    # sharding-agnostically; XLA places the collectives)
    axis_types = tuple(jax.sharding.AxisType.Auto for _ in axis_names)
    return jax.make_mesh(mesh_shape, axis_names, axis_types=axis_types)


def broadcast_scene(scene: Scene, batch: int) -> Scene:
    """Broadcast every scalar Scene field to a (batch,) array."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x, jnp.result_type(float)),
                                   (batch,) + jnp.shape(jnp.asarray(x))),
        scene)


def order_count_score(scenes: Scene):
    """Monotone proxy for the expected number of scattering orders.

    Orders grow with total optical depth, single-scattering albedo and
    surface reflectivity; used only to sort columns into buckets.
    """
    tau_tot = jnp.asarray(scenes.tau_star_atm) + jnp.asarray(scenes.tau_star_aer)
    omega = 0.5 * (jnp.asarray(scenes.alb_atm) + jnp.asarray(scenes.alb_aer))
    return tau_tot * omega + 0.3 * jnp.asarray(scenes.grd_alb)


import functools


@functools.lru_cache(maxsize=32)
def _batched_solver(grid: GridSpec, opts: SolverOptions,
                    p0_batched: bool = False):
    """Cached jitted vmapped solver — reused across solve_batch calls so
    repeated sweeps (and every bucket) hit the same compiled executable.

    ``p0_batched``: the P0(µ, µ0) tables carry a leading batch axis (one
    row per column's µ0 — only P0 depends on µ0, the P matrices are
    shared), enabling µ0 sweeps (BASELINE config 5).
    """
    stencils = build_stencils(grid.mu(), grid.nb_angles)

    def one(scene, tbl):
        return solve_column(scene, tbl, grid, opts, stencils)

    table_axes = PhaseTables(p0_atm=0 if p0_batched else None, p_atm=None,
                             p0_aer=0 if p0_batched else None, p_aer=None)
    return jax.jit(jax.vmap(one, in_axes=(0, table_axes)))


@functools.lru_cache(maxsize=32)
def _fused_solver(grid: GridSpec, opts: SolverOptions, block_b: int):
    """Cached jitted Pallas-fused batched solver (sos_rt_tpu.fused)."""
    from sos_rt_tpu.fused import solve_batch_fused

    return jax.jit(lambda s, t: solve_batch_fused(s, t, grid, opts,
                                                  block_b=block_b))


@functools.lru_cache(maxsize=32)
def _mega_solver(grid: GridSpec, opts: SolverOptions,
                 cols_per_block: Optional[int] = None,
                 outputs: str = "full", allow_small: bool = False,
                 sort="score"):
    """Cached jitted whole-solve mega-kernel solver (ops/megakernel.py)."""
    from sos_rt_tpu.fused import solve_batch_mega

    return jax.jit(lambda s, t: solve_batch_mega(
        s, t, grid, opts, cols_per_block=cols_per_block, outputs=outputs,
        allow_small=allow_small,
        sort="predict" if sort == "predict" else True))


def mega_small_ok(scenes: Scene, grid: GridSpec) -> bool:
    """Eager (concrete-values) check that the mega kernel may run a grid
    with small-µ columns: for EVERY column, both region band choices
    (band_choice(τ[idx_up-1]) and band_choice(τ[idx_down]),
    main_lambertian.py:344-349) select a polyfit band that covers the
    whole small-µ set — then the windowed/Taylor values are overwritten
    by the band extrapolation in the reference path too, and skipping
    them is exact (megakernel.py scope note).  Trivially True for grids
    without small-µ columns.
    """
    from sos_rt_tpu.ops.megakernel import band_covers_small
    from sos_rt_tpu.ops.sweeps import stencils_for

    stencils = stencils_for(grid)
    if stencils.small_cols.size == 0:
        return True
    ok = {c for c in range(4) if band_covers_small(stencils, c)}
    if len(ok) == 4:
        return True

    ca, cb = _band_choices_fn(grid.nb_layers)(
        jnp.asarray(scenes.tau_star_atm), jnp.asarray(scenes.tau_star_aer),
        jnp.asarray(scenes.z0), jnp.asarray(scenes.z_up),
        jnp.asarray(scenes.z_down))
    choices = set(np.unique(np.asarray(ca))) | set(np.unique(np.asarray(cb)))
    return choices.issubset(ok)


@functools.lru_cache(maxsize=32)
def _bucketed_solver(grid: GridSpec, opts: SolverOptions, engine: str,
                     buckets: int, outputs: str, block_b: int,
                     cols_per_block: Optional[int], p0_batched: bool,
                     allow_small: bool, sort="score"):
    """One jitted function for the whole convergence-bucketed pipeline:
    sort by the order-count key, solve equal-size chunks (each bucket
    exits its own while_loop at its local worst column), unsort.

    ``sort='predict'`` keys the sort on a coarse-grid order-count
    pre-solve instead of the closed-form proxy (fused.
    predict_order_count — measured ~20% less per-block straggler cost
    on the headline batch, BASELINE r5); falls back to the proxy when
    prediction does not apply."""
    from sos_rt_tpu.fused import (predict_order_count, solve_batch_fused,
                                  solve_batch_mega)

    if engine == "mega":
        # sort=False: the pipeline already sorted globally by the same
        # proxy, so each bucket is a contiguous sorted chunk
        one = lambda s, t: solve_batch_mega(
            s, t, grid, opts, cols_per_block=cols_per_block,
            outputs=outputs, allow_small=allow_small, sort=False)
    elif engine == "fused":
        one = lambda s, t: solve_batch_fused(s, t, grid, opts,
                                             block_b=block_b)
    else:
        stencils = build_stencils(grid.mu(), grid.nb_angles)
        table_axes = PhaseTables(p0_atm=0 if p0_batched else None,
                                 p_atm=None,
                                 p0_aer=0 if p0_batched else None,
                                 p_aer=None)
        one = jax.vmap(lambda sc, tbl: solve_column(sc, tbl, grid, opts,
                                                    stencils),
                       in_axes=(0, table_axes))

    def run(scenes, tables):
        b = jnp.shape(jnp.asarray(scenes.mu0))[0]
        chunk = b // buckets
        key = None
        if sort == "predict":
            key = predict_order_count(scenes, tables, grid, opts)
        if key is None:
            key = order_count_score(scenes)
        else:
            # count-primary, score-secondary (1024 gap keeps the score
            # term above f32 ulp — see fused.solve_batch_mega)
            key = (key.astype(jnp.float32) * 1024.0
                   + order_count_score(scenes))
        perm = jnp.argsort(key)
        scenes = jax.tree_util.tree_map(lambda x: x[perm], scenes)
        if p0_batched:
            tables_s = dataclasses.replace(
                tables, p0_atm=tables.p0_atm[perm],
                p0_aer=tables.p0_aer[perm])
        else:
            tables_s = tables
        outs = []
        for i in range(buckets):
            sl = slice(i * chunk, (i + 1) * chunk)
            part = jax.tree_util.tree_map(lambda x: x[sl], scenes)
            part_tbl = tables_s
            if p0_batched:
                part_tbl = dataclasses.replace(
                    tables_s, p0_atm=tables_s.p0_atm[sl],
                    p0_aer=tables_s.p0_aer[sl])
            outs.append(one(part, part_tbl))
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        inv = jnp.argsort(perm)
        return jax.tree_util.tree_map(lambda x: x[inv], stacked)

    return jax.jit(run)


@functools.lru_cache(maxsize=8)
def _band_choices_fn(nb_layers: int):
    from sos_rt_tpu.grids import tau_profile
    from sos_rt_tpu.ops.sweeps import band_choice

    def refs(ta, tr, z0, zu, zd):
        tau, iu, idn = tau_profile(ta, tr, z0, zu, zd, nb_layers)
        return band_choice(tau[iu - 1]), band_choice(tau[idn])

    return jax.jit(jax.vmap(refs))


@functools.lru_cache(maxsize=32)
def _sharded_engine_solver(grid: GridSpec, opts: SolverOptions, mesh: Mesh,
                           engine: str, outputs: str, block_b: int,
                           p0_batched: bool, allow_small: bool = False,
                           cols_per_block: Optional[int] = None):
    """Pallas engines composed with the mesh: `shard_map` over 'data'.

    GSPMD cannot propagate shardings *through* a `pallas_call`, so the
    fast engines shard explicitly: each device runs the whole kernel on
    its local column shard (columns are independent — no collectives in
    the solve itself).  Per-column results equal the unsharded engine's.
    """
    from sos_rt_tpu.fused import solve_batch_fused, solve_batch_mega

    # interpret from the MESH's devices, not jax.default_backend(): a
    # CPU-simulated mesh on a machine whose default backend is a TPU
    # plugin (the dryrun/test environment) must run the kernels in
    # interpreter mode
    interpret = mesh.devices.flat[0].platform != "tpu"
    if engine == "mega":
        local = lambda s, t: solve_batch_mega(s, t, grid, opts,
                                              outputs=outputs,
                                              allow_small=allow_small,
                                              cols_per_block=cols_per_block,
                                              interpret=interpret)
    else:
        local = lambda s, t: solve_batch_fused(s, t, grid, opts,
                                               block_b=block_b,
                                               interpret=interpret)
    d = P("data")
    tbl_specs = PhaseTables(p0_atm=d if p0_batched else P(), p_atm=P(),
                            p0_aer=d if p0_batched else P(), p_aer=P())
    fn = jax.shard_map(local, mesh=mesh, in_specs=(d, tbl_specs),
                       out_specs=d, check_vma=False)
    return jax.jit(fn)


def solve_batch(scenes: Scene, tables: PhaseTables, grid: GridSpec,
                opts: SolverOptions, mesh: Optional[Mesh] = None,
                shard_tables: bool = False, buckets: int = 1,
                engine: str = "reference", block_b: int = 16,
                outputs: str = "full",
                cols_per_block: Optional[int] = None,
                sort: str = "score"):
    """Solve a batch of columns; optionally sharded over ``mesh``.

    scenes: Scene pytree with (B,) leaves (see :func:`broadcast_scene`).
    With a mesh, B must be divisible by the 'data' axis size.

    ``buckets > 1`` sorts columns by an order-count heuristic and solves
    equal-size chunks separately, so quickly-converging columns are not
    dragged through the slowest column's `while_loop` trip count.
    Per-column results are unchanged (solver lanes mask their own
    convergence); only wall-clock improves.

    ``outputs='summary'`` (mega engine) returns a
    :class:`sos_rt_tpu.fused.SweepSummary` — TOA/surface rows + stats
    only, the full field never leaves the chips.

    ``cols_per_block`` (mega engine) overrides the kernel's per-block
    column count (VMEM-heuristic default; measured sweet spots in
    BASELINE.md: 128 at B=65536, 256 at B=32768).

    ``sort='predict'`` (mega engine, unsharded) keys the convergence
    sort/bucketing on a coarse-grid order-count pre-solve instead of
    the closed-form proxy — ~20% less per-block straggler cost on the
    headline batch (fused.predict_order_count; falls back to the proxy
    when prediction does not apply).
    """
    if engine not in ("reference", "fused", "mega"):
        raise ValueError(f"unknown engine {engine!r}; "
                         "expected 'reference', 'fused' or 'mega'")
    if outputs != "full" and engine != "mega":
        raise ValueError("outputs='summary' requires engine='mega'")
    # eager small-µ eligibility for the mega kernel (concrete scenes
    # here; inside the jit everything is traced) — see mega_small_ok
    allow_small = (engine == "mega"
                   and not isinstance(jnp.asarray(scenes.mu0),
                                      jax.core.Tracer)
                   and mega_small_ok(scenes, grid))
    if buckets > 1:
        b = jnp.shape(jnp.asarray(scenes.mu0))[0]
        if b % buckets:
            raise ValueError(f"batch {b} not divisible by buckets {buckets}")
        if mesh is None:
            # whole pipeline (sort → per-bucket solves → unsort) as ONE
            # jitted dispatch — the eager argsort/gather/concat chain
            # costs a ~35 ms relay RPC each (BASELINE.md)
            p0b = jnp.ndim(tables.p0_atm) == 2
            return _bucketed_solver(grid, opts, engine, buckets, outputs,
                                    block_b, cols_per_block, p0b,
                                    allow_small, sort)(scenes, tables)
        perm = jnp.argsort(order_count_score(scenes))
        sorted_scenes = jax.tree_util.tree_map(lambda x: x[perm], scenes)
        p0b = jnp.ndim(tables.p0_atm) == 2
        sorted_tables = tables
        if p0b:
            sorted_tables = dataclasses.replace(
                tables, p0_atm=tables.p0_atm[perm], p0_aer=tables.p0_aer[perm])
        chunk = b // buckets
        outs = []
        for i in range(buckets):
            part = jax.tree_util.tree_map(
                lambda x: x[i * chunk:(i + 1) * chunk], sorted_scenes)
            part_tbl = sorted_tables
            if p0b:
                part_tbl = dataclasses.replace(
                    sorted_tables,
                    p0_atm=sorted_tables.p0_atm[i * chunk:(i + 1) * chunk],
                    p0_aer=sorted_tables.p0_aer[i * chunk:(i + 1) * chunk])
            outs.append(solve_batch(part, part_tbl, grid, opts, mesh=mesh,
                                    shard_tables=shard_tables,
                                    engine=engine, block_b=block_b,
                                    outputs=outputs,
                                    cols_per_block=cols_per_block))
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        inv = jnp.argsort(perm)
        return jax.tree_util.tree_map(lambda x: x[inv], stacked)

    if mesh is None:
        if engine == "mega":
            return _mega_solver(grid, opts, cols_per_block, outputs=outputs,
                                allow_small=allow_small,
                                sort=sort)(scenes, tables)
        if engine == "fused":
            return _fused_solver(grid, opts, block_b)(scenes, tables)
        return _batched_solver(grid, opts,
                               jnp.ndim(tables.p0_atm) == 2)(scenes, tables)

    p0b = jnp.ndim(tables.p0_atm) == 2
    if engine in ("mega", "fused"):
        # Pallas engines: explicit shard_map over 'data' (each device
        # solves its local columns with the whole kernel); TP table
        # sharding is a GSPMD-path feature only
        if shard_tables:
            raise ValueError("shard_tables (TP) requires engine='reference'")
        fn = _sharded_engine_solver(grid, opts, mesh, engine, outputs,
                                    block_b, p0b, allow_small,
                                    cols_per_block)
        data_sh = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        scene_sh = jax.tree_util.tree_map(lambda _: data_sh, scenes)
        table_sh = PhaseTables(p0_atm=data_sh if p0b else repl, p_atm=repl,
                               p0_aer=data_sh if p0b else repl, p_aer=repl)
        with jax.set_mesh(mesh):
            scenes = jax.device_put(scenes, scene_sh)
            tables = jax.device_put(tables, table_sh)
            return fn(scenes, tables)

    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    tbl_mat = NamedSharding(mesh, P(None, "model")) if shard_tables else repl
    scene_sh = jax.tree_util.tree_map(lambda _: data_sh, scenes)
    table_sh = PhaseTables(p0_atm=data_sh if p0b else repl, p_atm=tbl_mat,
                           p0_aer=data_sh if p0b else repl, p_aer=tbl_mat)
    with jax.set_mesh(mesh):
        scenes = jax.device_put(scenes, scene_sh)
        tables = jax.device_put(tables, table_sh)
        # sharding comes from the committed inputs; the cached jitted fn
        # is shared with the unsharded path
        return _batched_solver(grid, opts, p0b)(scenes, tables)
