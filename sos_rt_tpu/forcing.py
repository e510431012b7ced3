"""Radiative forcing and the Haywood critical-albedo search (C17).

Reference: SOS_Aer_critical_albedo.py:20-410.  Two deviations, both
documented reference defects:

1. The reference's "aerosol-free" baseline call passes *identical*
   arguments except the ``tauStar_aer`` flag (critical_albedo.py:388) —
   the baseline solve equals the perturbed solve, so ΔF ≡ 0 and the
   bisection always terminates immediately.  Here the baseline is a real
   aerosol-free solve (``tau_star_aer = 0`` → pure molecular profile).
2. The reference reads the module-global ``tauStar_tot`` inside the
   function (critical_albedo.py:39 vs 486, SURVEY.md quirk) — everything
   is passed explicitly here.

The bisection stays a host loop (its trip count is tiny and data
dependent) around the jitted batched solver; each evaluation solves the
whole batch of scenes at once on device.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from sos_rt_tpu.config import (GridSpec, MATMUL_PRECISION, Scene,
                               SolverOptions)
from sos_rt_tpu.outputs import toa_net_flux
from sos_rt_tpu.solver import PhaseTables, solve_column

FORCING_TOL = 1e-3       # |ΔF| acceptance (critical_albedo.py:402)
BRACKET_TOL = 0.1        # bisection bracket width (critical_albedo.py:397)


@functools.lru_cache(maxsize=16)
def _forcing_fn_cached(grid: GridSpec, opts: SolverOptions, batched: bool):
    """One jitted forcing executable per (grid, opts, batched?).

    Caching the *wrapper* keeps the executable alive across
    critical_albedo calls (VERDICT r1 weak #8: a fresh jax.jit per call
    recompiled every τ sweep point).  ``batched``: scenes carry (B,)
    leaves — every bisection step solves all lanes in one batch.
    """
    def one(scene, tables):
        return radiative_forcing(scene, tables, grid, opts)

    return jax.jit(jax.vmap(one, in_axes=(0, None)) if batched else one)


def _toa_net(scene: Scene, tables: PhaseTables, grid: GridSpec,
             opts: SolverOptions):
    sol = solve_column(scene, tables, grid, opts)
    mu = jnp.asarray(grid.mu(), sol.i_total.dtype)
    w_mu = jnp.asarray(grid.trapz_weights(), sol.i_total.dtype)
    return toa_net_flux(sol.i_total, mu, w_mu, sol.tau, scene.mu0,
                        scene.grd_alb, grid.nb_angles)


def radiative_forcing(scene: Scene, tables: PhaseTables, grid: GridSpec,
                      opts: SolverOptions):
    """ΔF = net TOA flux (with aerosol) − net TOA flux (aerosol-free)."""
    base = dataclasses.replace(
        scene, tau_star_aer=jnp.zeros_like(jnp.asarray(scene.tau_star_aer)))
    return _toa_net(scene, tables, grid, opts) - _toa_net(base, tables, grid, opts)


def toa_net_from_summary(summ, scenes: Scene, grid: GridSpec):
    """TOA net flux (critical-albedo convention, critical_albedo.py:
    377-382) from a :class:`sos_rt_tpu.fused.SweepSummary` — only the
    TOA radiance row is needed, so the summary path suffices."""
    from sos_rt_tpu.outputs import _beam_scale

    m = grid.nb_angles
    dtype = summ.i_toa.dtype
    mu = jnp.asarray(grid.mu(), dtype)
    w_mu = jnp.asarray(grid.trapz_weights(), dtype)
    mu0 = jnp.asarray(scenes.mu0, dtype)
    f0 = jnp.pi / mu0
    scale = _beam_scale("heating", f0, mu0)
    tau_star = summ.tau[:, -1]
    # full f32 dot precision: forcing is a small difference of two
    # fluxes, so the default (bf16-ish) TPU dot precision is not enough
    # (and outputs.flux_up_down, which this mirrors, uses the same)
    down_diff = jnp.einsum("bm,m,m->b", summ.i_toa[:, :m], mu[:m], w_mu[:m],
                           precision=MATMUL_PRECISION)
    up_diff = jnp.einsum("bm,m,m->b", summ.i_toa[:, m:], mu[m:], w_mu[m:],
                         precision=MATMUL_PRECISION)
    flux_down0 = down_diff - scale                      # e^{-0/µ0} = 1
    flux_up0 = (up_diff + jnp.asarray(scenes.grd_alb, dtype) * scale
                * jnp.exp(-2.0 * tau_star / mu0))
    return -flux_down0 - flux_up0


def _net_generic(sol, scenes: Scene, grid: GridSpec):
    """TOA net flux from either a SweepSummary or a full solution."""
    if hasattr(sol, "i_toa"):
        return toa_net_from_summary(sol, scenes, grid)
    mu = jnp.asarray(grid.mu(), sol.i_total.dtype)
    w_mu = jnp.asarray(grid.trapz_weights(), sol.i_total.dtype)
    return toa_net_flux(sol.i_total, mu, w_mu, sol.tau, scenes.mu0,
                        scenes.grd_alb, grid.nb_angles)


def _solve_net(scenes: Scene, tables: PhaseTables, grid: GridSpec,
               opts: SolverOptions, engine: str):
    from sos_rt_tpu.parallel import solve_batch

    sol = solve_batch(scenes, tables, grid, opts, engine=engine,
                      outputs="summary" if engine == "mega" else "full")
    return _net_generic(sol, scenes, grid)


def radiative_forcing_batch(scenes: Scene, tables: PhaseTables,
                            grid: GridSpec, opts: SolverOptions,
                            engine: str = "mega"):
    """Batched ΔF through the production engines: two summary-mode
    solves (with aerosol / aerosol-free); only TOA rows leave the chip.
    For large forcing sweeps this is the same ~1e5 col/s path as the
    headline benchmark (two solves per column)."""
    base = dataclasses.replace(
        scenes, tau_star_aer=jnp.zeros_like(jnp.asarray(scenes.tau_star_aer)))
    return (_solve_net(scenes, tables, grid, opts, engine)
            - _solve_net(base, tables, grid, opts, engine))


def make_batched_forcing_fn(engine: str = "mega"):
    """Fast ``forcing_fn`` for :func:`critical_albedo`, built on the
    production batched engines (VERDICT r4 item 3).

    Two wins over the default per-step path:

    1. each evaluation is ONE batched summary-mode solve through
       :func:`sos_rt_tpu.parallel.solve_batch` (the ~1e5 col/s mega
       path) instead of a vmap of ``solve_column``;
    2. the aerosol-free baseline does not depend on the bisection
       variable ω_aer, so its net flux is solved once on the first call
       and reused for every subsequent bisection step (the default path
       re-solves it each step).

    The returned closure caches the baseline per scene-batch identity —
    build a fresh closure per :func:`critical_albedo` call (the CLI and
    :func:`critical_albedo_batch` do)."""
    cache = {}

    def forcing_fn(trial: Scene, tables: PhaseTables, grid: GridSpec,
                   opts: SolverOptions):
        if "net0" not in cache:
            base = dataclasses.replace(
                trial,
                tau_star_aer=jnp.zeros_like(jnp.asarray(trial.tau_star_aer)))
            cache["net0"] = _solve_net(base, tables, grid, opts, engine)
        return (_solve_net(trial, tables, grid, opts, engine)
                - cache["net0"])

    return forcing_fn


def critical_albedo_batch(scenes: Scene, tables: PhaseTables,
                          grid: GridSpec, opts: SolverOptions,
                          engine: str = "mega"):
    """Haywood critical-albedo search over a (B,)-lane scene batch via
    the production engines: one batched summary solve per bisection
    step + one baseline solve total.  A 1024-lane curve costs ~6 batched
    solves (~6·B/1e5 s on one chip).  The per-column
    :func:`critical_albedo` default path (f64-capable ``solve_column``)
    is the verification twin — lane-parity is asserted in
    tests/test_outputs_forcing.py."""
    return critical_albedo(scenes, tables, grid, opts,
                           forcing_fn=make_batched_forcing_fn(engine))


def critical_albedo(scene: Scene, tables: PhaseTables, grid: GridSpec,
                    opts: SolverOptions, forcing_fn=None):
    """Bisection on the aerosol single-scattering albedo ω_aer ∈ [0, 1]
    until |ΔF| < 1e-3 or the bracket narrows below 0.1
    (critical_albedo.py:394-410).  Works on batched scenes: each lane
    maintains its own bracket; every step is one batched forcing solve.
    """
    shape = jnp.shape(jnp.asarray(scene.mu0))
    if forcing_fn is None:
        cached = _forcing_fn_cached(grid, opts, batched=len(shape) > 0)
        forcing_fn = lambda s, t, _g, _o: cached(s, t)
    alb_min = jnp.zeros(shape)
    alb_max = jnp.ones(shape)
    result = jnp.full(shape, jnp.nan)
    # bracket halves each step: ≤ ceil(log2(1/0.1)) + 1 = 5 steps
    while True:
        width = alb_max - alb_min
        if not bool(jnp.any((width > BRACKET_TOL) & jnp.isnan(result))):
            break
        alb_test = 0.5 * (alb_max + alb_min)
        trial = dataclasses.replace(scene, alb_aer=alb_test)
        delta_f = forcing_fn(trial, tables, grid, opts)
        hit = (jnp.abs(delta_f) < FORCING_TOL) & jnp.isnan(result)
        result = jnp.where(hit, alb_test, result)
        alb_min = jnp.where(delta_f > 0, alb_test, alb_min)
        alb_max = jnp.where(delta_f <= 0, alb_test, alb_max)
    return jnp.where(jnp.isnan(result), 0.5 * (alb_max + alb_min), result)
