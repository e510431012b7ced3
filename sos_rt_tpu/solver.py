"""The pure, jittable SOS column solver.

``solve_column(scene, tables, grid, opts)`` is the product (SURVEY.md §7
"Design shape"): one pure function over one atmospheric column.  Batch by
``jax.vmap`` over a leading axis of ``Scene`` fields; shard with
``shard_map`` over a device mesh (sos_rt_tpu.parallel).

Per order (the reference's while-loop body, main_lambertian.py:311-460):
  1. Jₙ — two (L,2M)@(2M,2M) matmuls, blended in the aerosol layer;
  2. downward sweep — one forward affine scan + windowed small-µ columns
     + the µ→0⁻ polyfit band;
  3. upward sweep — surface BC (Lambertian dot / specular mirror gather),
     one reverse affine scan, smoothing-delta chaining at the two region
     joins, and the µ→0⁺ smoothing walk on every row;
  4. convergence ratio at TOA-up and surface-down (100 ppm criterion),
     per-column masked accumulation so vmapped lanes stop at exactly the
     order the reference would.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
from sos_rt_tpu.grids import tau_profile
from sos_rt_tpu.ops.first_order import first_order
from sos_rt_tpu.ops.source import source_function, source_operator
from sos_rt_tpu.ops.sweeps import (
    SweepStencils,
    band_choice,
    build_stencils,
    down_small_mu,
    down_sweep_scan,
    polyfit_band_values,
    smooth_up_rows,
    up_sweep_scan,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PhaseTables:
    """Replicated phase-function tables (device arrays)."""

    p0_atm: Any
    p_atm: Any
    p0_aer: Any
    p_aer: Any

    @classmethod
    def from_models(cls, grid: GridSpec, mu0: float, atm=("rayleigh", {}),
                    aer=("rayleigh", {}), dtype=jnp.float64):
        from sos_rt_tpu.models import build_phase_tables

        mu = grid.mu()
        p0a, pa = build_phase_tables(atm[0], mu, mu0, **atm[1])
        p0r, pr = build_phase_tables(aer[0], mu, mu0, **aer[1])
        return cls(*(jnp.asarray(x, dtype) for x in (p0a, pa, p0r, pr)))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Solution:
    """Radiance solution for one column (or a batch, with leading axis)."""

    i_total: Any       # (L, 2M) total radiance field
    i1: Any            # (L, 2M) first order
    n_orders: Any      # scalar int
    converged: Any     # scalar bool
    tau: Any           # (L,)
    idx_up: Any
    idx_down: Any


def _ratio(in_cur, i_tot, nb_angles):
    """Convergence criterion (main_lambertian.py:311)."""
    m = nb_angles
    r_toa = jnp.max(in_cur[0, m:] / i_tot[0, m:])
    r_srf = jnp.max(in_cur[-1, :m] / i_tot[-1, :m])
    return jnp.maximum(r_toa, r_srf)


def solve_column(scene: Scene, tables: PhaseTables, grid: GridSpec,
                 opts: SolverOptions, stencils: SweepStencils = None):
    if stencils is None:
        stencils = build_stencils(grid.mu(), grid.nb_angles)
    dtype = jnp.dtype(opts.dtype)
    L, M = grid.nb_layers, grid.nb_angles
    mu = jnp.asarray(grid.mu(), dtype)
    w_mu = jnp.asarray(grid.trapz_weights(), dtype)

    tau, idx_up, idx_down = tau_profile(
        scene.tau_star_atm, scene.tau_star_aer, scene.z0, scene.z_up,
        scene.z_down, L)
    tau = tau.astype(dtype)
    # mixing weights — reference defines dtau_atm = τ*_atm/nb_layers
    # (main_lambertian.py:53), NOT the grid spacing τ*_atm/(L-1)
    dtau_aer = scene.tau_star_aer / (idx_down + 1 - idx_up)
    dtau_atm = scene.tau_star_atm / L
    w_atm = dtau_atm / (dtau_atm + dtau_aer)
    w_aer = dtau_aer / (dtau_atm + dtau_aer)

    i1 = first_order(opts.surface, tau, mu, M, scene.mu0, scene.grd_alb,
                     scene.alb_atm, scene.alb_aer, tables.p0_atm,
                     tables.p_atm, tables.p0_aer, tables.p_aer,
                     idx_up, idx_down, w_atm, w_aer, w_mu)

    a_atm = source_operator(tables.p_atm.astype(dtype), w_mu)
    a_aer = source_operator(tables.p_aer.astype(dtype), w_mu)

    # polyfit band choices: region A keys on τ[idx_up-1], regions B/C on
    # τ[idx_down] (main_lambertian.py:344/363/382)
    choice_a = band_choice(tau[idx_up - 1])
    choice_bc = band_choice(tau[idx_down])
    small_cols = jnp.asarray(stencils.small_cols)
    taylor_mask = jnp.asarray(stencils.taylor_mask)
    band_cols = M - 1 - jnp.arange(stencils.band_max)
    t_idx = jnp.arange(L)
    mirror_up = 2 * M - 1 - jnp.arange(M + 1, 2 * M)

    def compute_down(jn):
        raw = down_sweep_scan(jn[:, :M], tau, mu[:M])
        if stencils.small_cols.size:
            small = down_small_mu(jn[:, small_cols], tau, mu[small_cols],
                                  taylor_mask, idx_up, idx_down)
            raw = raw.at[:, small_cols].set(small)
        # µ=0⁻ column: untouched by the reference's loops → 0 before band
        raw = raw.at[:, M - 1].set(0.0)
        poly_a, valid_a = polyfit_band_values(raw, stencils, choice_a)
        poly_bc, valid_bc = polyfit_band_values(raw, stencils, choice_bc)
        in_a = (t_idx < idx_up)[:, None]
        poly = jnp.where(in_a, poly_a, poly_bc)
        valid = jnp.where(in_a, valid_a[None, :], valid_bc[None, :])
        cur = raw[:, band_cols]
        return raw.at[:, band_cols].set(jnp.where(valid, poly, cur))

    def compute_up(jn, down_final):
        mu_u = mu[M + 1:]
        if opts.surface == "lambertian":
            f_down = -jnp.sum(w_mu[:M] * down_final[L - 1] * mu[:M])
            bc = jnp.full((M - 1,), 2.0 * scene.grd_alb * f_down, dtype)
        else:
            bc = scene.grd_alb * down_final[L - 1][mirror_up]
        raw = up_sweep_scan(jn[:, M + 1:], tau, mu_u, bc, idx_up, idx_down)

        # full (L, 2M) working field: down cols 0, µ=0⁺ = Jn, up cols = raw
        # (concat keeps sharding inference happy under vmap+GSPMD)
        field = jnp.concatenate(
            [jnp.zeros_like(jn[:, :M]), jn[:, M:M + 1], raw], axis=1)

        # region-join chaining of SMOOTHED boundary rows:
        # r1 = idx_down+1 feeds t <= idx_down; r2 = idx_up feeds t < idx_up
        def delta_at(field_now, row):
            r = field_now[row][None, :]
            sm = smooth_up_rows(r, mu, M)[0]
            return (sm - field_now[row])[M + 1:]

        d1 = delta_at(field, idx_down + 1)
        att1 = jnp.exp(-jnp.maximum(tau[idx_down + 1] - tau, 0.0)[:, None]
                       / mu_u[None, :])
        corr1 = jnp.where((t_idx <= idx_down)[:, None], d1[None, :] * att1, 0.0)
        field = field.at[:, M + 1:].add(corr1)

        d2 = delta_at(field, idx_up)
        att2 = jnp.exp(-jnp.maximum(tau[idx_up] - tau, 0.0)[:, None]
                       / mu_u[None, :])
        corr2 = jnp.where((t_idx < idx_up)[:, None], d2[None, :] * att2, 0.0)
        field = field.at[:, M + 1:].add(corr2)

        return smooth_up_rows(field, mu, M)

    def order_step(in_prev):
        jn = source_function(in_prev, a_atm, a_aer, scene.alb_atm,
                             scene.alb_aer, w_atm, w_aer, idx_up, idx_down)
        down = compute_down(jn)
        up = compute_up(jn, down)
        return jnp.concatenate([down[:, :M], up[:, M:]], axis=1)

    tol = jnp.asarray(opts.tol, dtype)

    def cond(carry):
        _, _, ratio, n = carry
        return jnp.any(ratio >= tol) & (n < opts.max_orders)

    def body(carry):
        in_prev, i_tot, ratio, n = carry
        in_new = order_step(in_prev)
        active = ratio >= tol
        i_tot = jnp.where(active, i_tot + in_new, i_tot)
        in_prev = jnp.where(active, in_new, in_prev)
        new_ratio = _ratio(in_new, i_tot, M)
        ratio = jnp.where(active, new_ratio, ratio)
        n = n + jnp.where(active, 1, 0)
        return in_prev, i_tot, ratio, n

    ratio0 = _ratio(jnp.ones_like(i1), i1, M)
    carry = (i1, i1, ratio0, jnp.asarray(1, jnp.int32))
    in_last, i_tot, ratio, n = jax.lax.while_loop(cond, body, carry)

    return Solution(i_total=i_tot, i1=i1, n_orders=n,
                    converged=ratio < tol, tau=tau,
                    idx_up=idx_up, idx_down=idx_down)
