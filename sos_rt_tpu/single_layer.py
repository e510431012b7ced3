"""Single-layer SOS solver (Duan–Min recursion, absorbing surface).

The reference's cleanest statement of the SOS algorithm is the library
form ``I1_NumInt`` / ``Jn_NumInt`` / ``In_NumInt``
(/root/reference/SOS_Aer_I1_In.py:13-130), documented as the Duan–Min
single-layer variant with an absorbing surface (ρ=0) and the Van de
Hulst normalization I·π/µ0 (SOS_Single_layer/README.md:103-145).  It is
the configuration the reference validates against Van de Hulst's
published tables (SOS_Single_layer/README.md:8, 40-49) — one
homogeneous slab, one phase function, direct solar beam at TOA.

This module is the TPU-native equivalent: the same math expressed as
the framework's affine scans and static small-µ stencils
(sos_rt_tpu/ops/sweeps.py), batched per-order fields kept so the
per-scattering-order VdH table comparison is possible
(tests/test_vdh.py; validation anchors in sos_rt_tpu/validation/vdh.py).

Deviations from the reference library file, both documented:
- the τ*/µ ≥ 50 "different normalization" branch (SOS_Aer_I1_In.py:95)
  is a mathematical no-op (reassociation of e^{-Δτ/µ}/µ); the scan form
  already evaluates the stable grouping.
- convergence: 100 ppm on Iₙ/I at TOA (µ>0) and the surface (µ<0),
  the criterion of the multi-layer drivers
  (SOS_Aer_main_lambertian.py:311) — vdh_hg_comparison.py is absent
  from the snapshot, README states "default accuracy of 100 ppm".
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sos_rt_tpu.config import GridSpec, MU0_RESONANCE_TOL, SolverOptions
from sos_rt_tpu.ops.source import source_operator
from sos_rt_tpu.ops.sweeps import (
    band_choice,
    build_stencils,
    down_small_mu,
    down_sweep_scan,
    polyfit_band_variants,
    select_band_choice,
    smooth_up_rows,
    up_sweep_scan,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SingleLayerSolution:
    """VdH-normalized radiance fields of one homogeneous slab."""

    i_total: Any       # (L, 2M) total field, I·π/µ0
    i_orders: Any      # (K, L, 2M) per-order fields (slot k = order k+1)
    order_valid: Any   # (K,) bool — slot accumulated before convergence
    n_orders: Any      # scalar int
    converged: Any     # scalar bool


def first_order_single(tau, mu, nb_angles, mu0, alb, p0):
    """Closed-form I₁ for one slab over an absorbing surface.

    Reference: I1_NumInt (SOS_Aer_I1_In.py:13-58) /
    SOS_Single_layer/README.md "1st order radiance field", with
    F0 = 1 and the final ·π/µ0 VdH normalization applied by the caller.
    """
    m = nb_angles
    dtype = tau.dtype
    tau_star = tau[-1]
    e0 = jnp.exp(-tau / mu0)[:, None]                     # (L, 1)
    pref = (alb / (4.0 * jnp.pi)) * (mu0 / (mu0 + mu))[None, :] * p0[None, :]

    mu_d = mu[:m]
    safe_d = jnp.where(mu_d == 0, -1.0, mu_d)
    down = pref[:, :m] * (e0 - jnp.exp(tau[:, None] / safe_d[None, :]))
    # µ=0⁻ (grid index M-1): I₁ = (ω/4π)·P0·e^{-τ/µ0}  (I1_In.py:39)
    down = down.at[:, m - 1].set((alb / (4.0 * jnp.pi)) * p0[m - 1] * e0[:, 0])
    # |µ| = µ0 resonance → linear-in-τ limit (I1_In.py:41-43)
    res = jnp.abs(mu_d + mu0) < MU0_RESONANCE_TOL
    down = jnp.where(res[None, :],
                     (alb / (4.0 * jnp.pi)) * p0[None, :m] * e0
                     * tau[:, None] / mu0, down)

    mu_u = mu[m:]
    safe_u = jnp.where(mu_u == 0, 1.0, mu_u)
    e_star = jnp.exp(-tau_star / mu0)
    up = pref[:, m:] * (e0 - e_star
                        * jnp.exp(-(tau_star - tau)[:, None] / safe_u[None, :]))
    # µ=0⁺ (grid index M): same closed form as µ=0⁻ (I1_In.py:50)
    up = up.at[:, 0].set((alb / (4.0 * jnp.pi)) * p0[m] * e0[:, 0])
    return jnp.concatenate([down, up], axis=1).astype(dtype)


def solve_single_layer(mu0, tau_star, tables, grid: GridSpec,
                       opts: SolverOptions, alb=1.0, stencils=None):
    """SOS solve of one slab: per-order fields + total, VdH-normalized.

    ``tables``: (P0 (2M,), P (2M, 2M)) for the slab's phase function.
    ``alb``: single-scattering albedo ω.  Returns
    :class:`SingleLayerSolution` with every field carrying the
    reference's I·π/µ0 normalization (SOS_Aer_I1_In.py:58).
    """
    if stencils is None:
        stencils = build_stencils(grid.mu(), grid.nb_angles)
    dtype = jnp.dtype(opts.dtype)
    L, M = grid.nb_layers, grid.nb_angles
    mu = jnp.asarray(grid.mu(), dtype)
    w_mu = jnp.asarray(grid.trapz_weights(), dtype)
    mu0 = jnp.asarray(mu0, dtype)
    alb = jnp.asarray(alb, dtype)
    tau_star = jnp.asarray(tau_star, dtype)
    p0, p = (jnp.asarray(t, dtype) for t in tables)

    tau = jnp.linspace(0.0, 1.0, L, dtype=dtype) * tau_star
    i1 = first_order_single(tau, mu, M, mu0, alb, p0) * (jnp.pi / mu0)

    a_op = source_operator(p, w_mu)
    mu_d = mu[:M]
    mu_u = mu[M + 1:]
    small_cols = jnp.asarray(stencils.small_cols)
    has_small = stencils.small_cols.size > 0
    choice = band_choice(tau_star)
    band_valid = select_band_choice(
        jnp.stack([jnp.asarray(stencils.poly_mask[c]) for c in range(4)]),
        choice)
    band_cols = M - 1 - jnp.arange(stencils.band_max)
    # no region joins, no surface reflection: idx sentinels out of range
    no_join = jnp.asarray(-5)
    bc_zero = jnp.zeros((M - 1,), dtype)

    def order_step(in_prev):
        jn = (alb / 4.0) * jnp.dot(in_prev, a_op)
        raw = down_sweep_scan(jn[:, :M], tau, mu_d, method=opts.scan_impl)
        if has_small:
            small = down_small_mu(jn[:, small_cols], raw[:, small_cols], tau,
                                  mu[small_cols],
                                  jnp.asarray(stencils.taylor_mask),
                                  L + 1, L + 2)
            raw = raw.at[:, small_cols].set(small)
        raw = raw.at[:, M - 1].set(0.0)
        polys, _ = polyfit_band_variants(raw, stencils)
        poly = select_band_choice(polys, choice)
        cur = raw[:, band_cols]
        down = raw.at[:, band_cols].set(
            jnp.where(band_valid[None, :], poly, cur))
        up_raw = up_sweep_scan(jn[:, M + 1:], tau, mu_u, bc_zero,
                               no_join, no_join, method=opts.scan_impl)
        field = jnp.concatenate([down, jn[:, M:M + 1], up_raw], axis=1)
        return smooth_up_rows(field, mu, M)

    tol = jnp.asarray(opts.tol, dtype)
    K = opts.max_orders

    def ratio_of(in_new, i_tot):
        # zero-guard: degenerate scenes (ω=0, zero phase-table entries at
        # a TOA/surface angle) would otherwise make the ratio inf/NaN and
        # poison convergence (ADVICE r2); treat 0/0 as converged (0)
        div = lambda a, b: jnp.where(b != 0, a / jnp.where(b != 0, b, 1.0),
                                     0.0)
        r_toa = jnp.max(div(in_new[0, M:], i_tot[0, M:]))
        r_srf = jnp.max(div(in_new[-1, :M], i_tot[-1, :M]))
        return jnp.maximum(r_toa, r_srf)

    buf = jnp.zeros((K, L, 2 * M), dtype).at[0].set(i1)
    valid = jnp.zeros((K,), bool).at[0].set(True)

    def body(k, carry):
        in_prev, i_tot, ratio, n, buf, valid = carry
        in_new = order_step(in_prev)
        active = ratio >= tol
        i_tot = jnp.where(active, i_tot + in_new, i_tot)
        buf = buf.at[k].set(jnp.where(active, in_new, 0.0))
        valid = valid.at[k].set(active)
        ratio = jnp.where(active, ratio_of(in_new, i_tot), ratio)
        n = n + jnp.where(active, 1, 0)
        return in_new, i_tot, ratio, n, buf, valid

    # explicit above-tol seed: the loop must take at least one step, and
    # max(1/I1) would be inf for any zero I1 entry (ADVICE r2)
    ratio0 = jnp.asarray(2.0 * opts.tol, dtype)
    carry = (i1, i1, ratio0, jnp.asarray(1, jnp.int32), buf, valid)
    _, i_tot, ratio, n, buf, valid = jax.lax.fori_loop(1, K, body, carry)
    return SingleLayerSolution(i_total=i_tot, i_orders=buf,
                               order_valid=valid, n_orders=n,
                               converged=ratio < tol)


def vdh_extract(i_field, grid: GridSpec,
                mu_values=(0.0, 0.1, 0.3, 0.5, 0.7, 0.9, 1.0)):
    """Up/down radiances at Van de Hulst's viewing angles.

    Replaces the absent ``SOS_Aer_vdh_extract.py`` (imported by the
    drivers, SOS_Aer_main_lambertian.py:8; described at
    SOS_Single_layer/README.md:44): returns (I_up(µ), I_down(−µ)) at
    µ ∈ {0, 0.1, 0.3, 0.5, 0.7, 0.9, 1}, interpolated on the grid.
    i_field: (L, 2M); uses row 0 (TOA) for up, row L-1 (surface) down.
    """
    m = grid.nb_angles
    mu = np.asarray(grid.mu(), np.float64)
    mv = np.asarray(mu_values, np.float64)
    up = np.interp(mv, mu[m:], np.asarray(i_field[0, m:], np.float64))
    down = np.interp(-mv[::-1], mu[:m],
                     np.asarray(i_field[-1, :m], np.float64))[::-1]
    return up, down
