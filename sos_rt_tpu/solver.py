"""The pure, jittable SOS column solver.

``solve_column(scene, tables, grid, opts)`` is the product (SURVEY.md §7
"Design shape"): one pure function over one atmospheric column.  Batch by
``jax.vmap`` over a leading axis of ``Scene`` fields; shard with GSPMD
over a device mesh (sos_rt_tpu.parallel).

Per order (the reference's while-loop body, main_lambertian.py:311-460):
  1. Jₙ — two (L,2M)@(2M,2M) matmuls, blended in the aerosol layer;
  2. downward sweep — one forward affine scan + the windowed small-µ
     prefix-difference + the µ→0⁻ polyfit band;
  3. upward sweep — surface BC (Lambertian dot / specular mirror gather),
     one reverse affine scan, smoothing-delta chaining at the two region
     joins, and the µ→0⁺ smoothing walk on every row;
  4. convergence ratio at TOA-up and surface-down (100 ppm criterion),
     per-column masked accumulation so vmapped lanes stop at exactly the
     order the reference would.

Everything that does not depend on Jₙ (attenuation factors, quadrature
coefficients, region masks, polyfit selections, small-µ window indices,
smoothing-join attenuations, BC weights) is precomputed once before the
`lax.while_loop` — the loop body is matmuls + scans + cheap fused
elementwise work.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sos_rt_tpu.config import (GridSpec, MATMUL_PRECISION, Scene,
                               SolverOptions)
from sos_rt_tpu.grids import tau_profile
from sos_rt_tpu.ops.first_order import first_order
from sos_rt_tpu.ops.source import source_operator
from sos_rt_tpu.ops.sweeps import (
    EXP_CLAMP,
    SweepStencils,
    _affine_scan,
    band_choice,
    build_stencils,
    polyfit_band_variants,
    select_band_choice,
    smooth_up_rows,
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

    @classmethod
    def from_models_batched_mu0(cls, grid: GridSpec, mu0_values,
                                atm=("rayleigh", {}), aer=("rayleigh", {}),
                                dtype=jnp.float64):
        """Tables for a µ0 sweep: P0 gets a leading (B,) axis (one row per
        column's µ0 — P0(µ,µ0) is the only µ0-dependent table), the P
        matrices are built once and shared.  Repeated µ0 values hit the
        content-addressed cache.
        """
        import numpy as np

        from sos_rt_tpu.models import build_phase_tables

        mu = grid.mu()
        mu0_values = np.asarray(mu0_values, dtype=np.float64)
        _, pa = build_phase_tables(atm[0], mu, float(mu0_values[0]), **atm[1])
        _, pr = build_phase_tables(aer[0], mu, float(mu0_values[0]), **aer[1])
        p0a = np.stack([build_phase_tables(atm[0], mu, float(m0), **atm[1])[0]
                        for m0 in mu0_values])
        p0r = np.stack([build_phase_tables(aer[0], mu, float(m0), **aer[1])[0]
                        for m0 in mu0_values])
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
    """Convergence criterion (main_lambertian.py:311); 0/0 → 0 so a
    degenerate scene's zero-radiance angles count as converged instead
    of poisoning the max with NaN."""
    m = nb_angles
    div = lambda a, b: jnp.where(b != 0, a / jnp.where(b != 0, b, 1.0), 0.0)
    r_toa = jnp.max(div(in_cur[0, m:], i_tot[0, m:]))
    r_srf = jnp.max(div(in_cur[-1, :m], i_tot[-1, :m]))
    return jnp.maximum(r_toa, r_srf)


def _setup_column(scene: Scene, tables: PhaseTables, grid: GridSpec,
                  opts: SolverOptions, stencils: SweepStencils = None):
    """Shared setup: returns (i1, order_step, tau, idx_up, idx_down)."""
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

    with jax.named_scope("sos.first_order"):
        i1 = first_order(opts.surface, tau, mu, M, scene.mu0, scene.grd_alb,
                         scene.alb_atm, scene.alb_aer, tables.p0_atm,
                         tables.p_atm, tables.p0_aer, tables.p_aer,
                         idx_up, idx_down, w_atm, w_aer, w_mu)

    a_atm = source_operator(tables.p_atm.astype(dtype), w_mu)
    a_aer = source_operator(tables.p_aer.astype(dtype), w_mu)

    # ---------------- loop-invariant precomputation ----------------
    t_idx = jnp.arange(L)
    dtau_g = jnp.diff(tau)
    mu_d = mu[:M]
    safe_mu_d = jnp.where(mu_d == 0, -1.0, mu_d)
    att_d = jnp.exp(dtau_g[:, None] / safe_mu_d[None, :])        # (L-1, M)
    mu_u = mu[M + 1:]
    att_u = jnp.exp(-dtau_g[:, None] / mu_u[None, :])            # (L-1, M-1)
    join = ((t_idx[:-1] == idx_down) | (t_idx[:-1] == idx_up - 1))[:, None]
    c_up = jnp.where(join, 0.0, 0.5 * dtau_g[:, None] / mu_u[None, :])
    ones_d = jnp.ones((1, M), dtype)
    zeros_d = jnp.zeros((1, M), dtype)
    a_down_full = jnp.concatenate([ones_d, att_d])
    a_up_full = jnp.concatenate([att_u, jnp.ones((1, M - 1), dtype)])

    # source blending mask (main_lambertian.py:322)
    in_layer = ((t_idx >= idx_up) & (t_idx <= idx_down))[:, None]

    # small-µ window indices (loop-invariant; see ops.sweeps.down_small_mu)
    small_cols = jnp.asarray(stencils.small_cols)
    has_small = stencils.small_cols.size > 0
    if has_small:
        mu_s = mu[small_cols]
        taylor_mask = jnp.asarray(stencils.taylor_mask)
        region_start = jnp.where(t_idx < idx_up, 0,
                                 jnp.where(t_idx <= idx_down, idx_up,
                                           idx_down + 1))
        cutoff = tau[:, None] - 5.0 * jnp.abs(mu_s)[None, :]
        first_k = jnp.searchsorted(tau, cutoff.T, side="left").T
        k0 = jnp.minimum(jnp.maximum(first_k, region_start[:, None]),
                         t_idx[:, None])
        tau_k0 = jnp.take_along_axis(
            jnp.broadcast_to(tau[:, None], (L, mu_s.shape[0])), k0, axis=0)
        att_k0 = jnp.exp(jnp.clip((tau[:, None] - tau_k0) / mu_s[None, :],
                                  EXP_CLAMP, 0.0))
        prev_t = jnp.clip(t_idx - 1, 0, L - 1)
        taylor_den = jnp.where(t_idx[:, None] > 0, (tau - tau[prev_t])[:, None],
                               1.0)
        taylor_on = (t_idx > region_start)[:, None]

    # polyfit band selection (loop-invariant masks)
    choice_a = band_choice(tau[idx_up - 1])
    choice_bc = band_choice(tau[idx_down])
    valid_a = select_band_choice(
        jnp.stack([jnp.asarray(stencils.poly_mask[c]) for c in range(4)]),
        choice_a)
    valid_bc = select_band_choice(
        jnp.stack([jnp.asarray(stencils.poly_mask[c]) for c in range(4)]),
        choice_bc)
    in_a_col = (t_idx < idx_up)[:, None]
    band_valid = jnp.where(in_a_col, valid_a[None, :], valid_bc[None, :])
    band_cols = M - 1 - jnp.arange(stencils.band_max)

    # upward BC machinery
    mirror_up = 2 * M - 1 - jnp.arange(M + 1, 2 * M)
    lamb_w = w_mu[:M] * mu[:M]
    # smoothing-join chain attenuations (region joins r1=idx_down+1, r2=idx_up)
    att_join1 = jnp.exp(-jnp.maximum(tau[idx_down + 1] - tau, 0.0)[:, None]
                        / mu_u[None, :])
    att_join2 = jnp.exp(-jnp.maximum(tau[idx_up] - tau, 0.0)[:, None]
                        / mu_u[None, :])
    mask_join1 = (t_idx <= idx_down)[:, None]
    mask_join2 = (t_idx < idx_up)[:, None]

    # optional split-dot precision mode (ops/precision.py) — same modes
    # as the Pallas engines; default (None) keeps the 6-pass HIGHEST
    # fidelity dots
    mm = opts.mm if dtype == jnp.dtype(jnp.float32) else None
    if mm in ("bf16x3", "bf16x5"):
        from sos_rt_tpu.ops.precision import make_split_dot

        dot_atm = make_split_dot(a_atm, mm, dtype)
        dot_aer = make_split_dot(a_aer, mm, dtype)
    else:
        dot_atm = lambda x: jnp.dot(x, a_atm, precision=MATMUL_PRECISION)
        dot_aer = lambda x: jnp.dot(x, a_aer, precision=MATMUL_PRECISION)

    def source_fn(in_prev):
        with jax.named_scope("sos.source_jn"):
            jn_atm = (scene.alb_atm / 4.0) * dot_atm(in_prev)
            jn_aer = (scene.alb_aer / 4.0) * dot_aer(in_prev)
            return jnp.where(in_layer, w_atm * jn_atm + w_aer * jn_aer,
                             jn_atm)

    def compute_down(jn):
        jn_d = jn[:, :M]
        b = jnp.concatenate([zeros_d,
                             0.5 * dtau_g[:, None] * (jn_d[:-1] * att_d
                                                      + jn_d[1:])])
        s = _affine_scan(a_down_full, b, method=opts.scan_impl)
        raw = -s / safe_mu_d[None, :]
        if has_small:
            raw_s = raw[:, small_cols]
            windowed = raw_s - att_k0 * jnp.take_along_axis(raw_s, k0, axis=0)
            jn_s = jn_d[:, small_cols]
            dj = jnp.where(taylor_on, (jn_s - jn_s[prev_t]) / taylor_den, 0.0)
            taylor = -jn_s + mu_s[None, :] * dj
            small = jnp.where(taylor_mask[None, :], taylor, windowed)
            raw = raw.at[:, small_cols].set(small)
        raw = raw.at[:, M - 1].set(0.0)
        polys, _ = polyfit_band_variants(raw, stencils)
        poly = jnp.where(in_a_col, select_band_choice(polys, choice_a),
                         select_band_choice(polys, choice_bc))
        cur = raw[:, band_cols]
        return raw.at[:, band_cols].set(jnp.where(band_valid, poly, cur))

    def compute_up(jn, down_final):
        if opts.surface == "lambertian":
            f_down = -jnp.sum(lamb_w * down_final[L - 1])
            bc = jnp.full((M - 1,), 2.0 * scene.grd_alb * f_down, dtype)
        else:
            bc = scene.grd_alb * down_final[L - 1][mirror_up]
        jn_u = jn[:, M + 1:]
        c = c_up * (jn_u[:-1] + jn_u[1:] * att_u)
        b = jnp.concatenate([c, bc[None, :]])
        raw = _affine_scan(a_up_full, b, reverse=True, method=opts.scan_impl)

        field = jnp.concatenate(
            [jnp.zeros_like(jn[:, :M]), jn[:, M:M + 1], raw], axis=1)

        # region-join chaining of SMOOTHED boundary rows
        def delta_at(field_now, row):
            r = field_now[row][None, :]
            return (smooth_up_rows(r, mu, M)[0] - field_now[row])[M + 1:]

        d1 = delta_at(field, idx_down + 1)
        field = field.at[:, M + 1:].add(
            jnp.where(mask_join1, d1[None, :] * att_join1, 0.0))
        d2 = delta_at(field, idx_up)
        field = field.at[:, M + 1:].add(
            jnp.where(mask_join2, d2[None, :] * att_join2, 0.0))
        return smooth_up_rows(field, mu, M)

    def order_step(in_prev):
        jn = source_fn(in_prev)
        with jax.named_scope("sos.down_sweep"):
            down = compute_down(jn)
        with jax.named_scope("sos.up_sweep_bc"):
            up = compute_up(jn, down)
        return jnp.concatenate([down[:, :M], up[:, M:]], axis=1)

    return i1, order_step, tau, idx_up, idx_down


def solve_column(scene: Scene, tables: PhaseTables, grid: GridSpec,
                 opts: SolverOptions, stencils: SweepStencils = None):
    dtype = jnp.dtype(opts.dtype)
    M = grid.nb_angles
    i1, order_step, tau, idx_up, idx_down = _setup_column(
        scene, tables, grid, opts, stencils)
    tol = jnp.asarray(opts.tol, dtype)

    def cond(carry):
        _, _, ratio, n = carry
        return jnp.any(ratio >= tol) & (n < opts.max_orders)

    def body(carry):
        in_prev, i_tot, ratio, n = carry
        in_new = order_step(in_prev)
        active = ratio >= tol
        # inactive lanes keep iterating on in_new but never accumulate —
        # i_tot and ratio are frozen, so results equal the per-lane stop
        i_tot = jnp.where(active, i_tot + in_new, i_tot)
        new_ratio = _ratio(in_new, i_tot, M)
        ratio = jnp.where(active, new_ratio, ratio)
        n = n + jnp.where(active, 1, 0)
        return in_new, i_tot, ratio, n

    # explicit above-tol seed (loop must take at least one step);
    # _ratio(ones, i1) would be inf for any zero I1 entry.  Dtype follows
    # i1 (scene leaves may be wider than opts.dtype under x64).
    ratio0 = jnp.asarray(2.0 * opts.tol, i1.dtype)
    carry = (i1, i1, ratio0, jnp.asarray(1, jnp.int32))
    in_last, i_tot, ratio, n = jax.lax.while_loop(cond, body, carry)

    return Solution(i_total=i_tot, i1=i1, n_orders=n,
                    converged=ratio < tol, tau=tau,
                    idx_up=idx_up, idx_down=idx_down)


def solve_column_orders(scene: Scene, tables: PhaseTables, grid: GridSpec,
                        opts: SolverOptions, stencils: SweepStencils = None,
                        save_rows=None):
    """Solve keeping the per-order fields Iₙ (the reference's ``I_saved``
    list, main_lambertian.py:306-460, used by graphe_successive_dif).

    Returns (Solution, i_orders, order_valid (max_orders,)) — slot k
    holds order k+1, masked by validity.  Uses a static
    ``opts.max_orders`` buffer (fori_loop, no early exit).

    ``save_rows``: None keeps the full (max_orders, L, 2M) fields;
    a static tuple of layer indices (negatives allowed) keeps only
    those rows per order — (max_orders, len(save_rows), 2M) — so
    batched sweeps can record the per-order read-set without
    materializing B·K full fields (see :func:`solve_batch_orders`).
    """
    dtype = jnp.dtype(opts.dtype)
    M = grid.nb_angles
    i1, order_step, tau, idx_up, idx_down = _setup_column(
        scene, tables, grid, opts, stencils)
    tol = jnp.asarray(opts.tol, dtype)
    K = opts.max_orders

    if save_rows is None:
        sel = lambda f: f
    else:
        ridx = np.asarray([r % grid.nb_layers for r in save_rows])
        sel = lambda f: f[ridx]
    buf = jnp.zeros((K,) + sel(i1).shape, dtype).at[0].set(sel(i1))
    valid = jnp.zeros((K,), bool).at[0].set(True)
    ratio0 = jnp.asarray(2.0 * opts.tol, i1.dtype)

    def body(k, carry):
        in_prev, i_tot, ratio, n, buf, valid = carry
        in_new = order_step(in_prev)
        active = ratio >= tol
        i_tot = jnp.where(active, i_tot + in_new, i_tot)
        buf = buf.at[k].set(jnp.where(active, sel(in_new), 0.0))
        valid = valid.at[k].set(active)
        new_ratio = _ratio(in_new, i_tot, M)
        ratio = jnp.where(active, new_ratio, ratio)
        n = n + jnp.where(active, 1, 0)
        return in_new, i_tot, ratio, n, buf, valid

    carry = (i1, i1, ratio0, jnp.asarray(1, jnp.int32), buf, valid)
    _, i_tot, ratio, n, buf, valid = jax.lax.fori_loop(1, K, body, carry)
    sol = Solution(i_total=i_tot, i1=i1, n_orders=n, converged=ratio < tol,
                   tau=tau, idx_up=idx_up, idx_down=idx_down)
    return sol, buf, valid


def solve_batch_orders(scenes: Scene, tables: PhaseTables, grid: GridSpec,
                       opts: SolverOptions, rows=(0, -1),
                       stencils: SweepStencils = None):
    """Batched per-order read-set (VERDICT r4 item 7): the one reference
    output a batched user previously could not get — per-order rows for
    every column of a sweep (the reference keeps ``I_saved`` for every
    run, main_lambertian.py:460, and plots per-order diffusivity from
    it, SOS_Aer_graphe.py:118-149).

    Vmapped :func:`solve_column_orders` with ``save_rows=rows`` (default
    TOA + surface — per-order TOA fluxes/diffusivity derive from these);
    ``rows=None`` keeps full per-order fields (B·K·L·2M — small batches
    only).  Returns (Solution with (B, ...) leaves, orders
    (B, max_orders, len(rows), 2M), valid (B, max_orders)).
    """
    p0b = jnp.ndim(jnp.asarray(tables.p0_atm)) == 2
    p0_ax = 0 if p0b else None

    def one(scene, p0a, p0r):
        tbl = tables if not p0b else dataclasses.replace(
            tables, p0_atm=p0a, p0_aer=p0r)
        return solve_column_orders(scene, tbl, grid, opts, stencils,
                                   save_rows=rows)

    return jax.vmap(one, in_axes=(0, p0_ax, p0_ax))(
        scenes, tables.p0_atm, tables.p0_aer)
