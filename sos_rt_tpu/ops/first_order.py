"""Closed-form first scattering order I₁, branchless (jit/vmap-safe).

Reproduces the oracle's 3-region construction
(sos_rt_tpu/oracle/solver.py::_first_order; reference:
SOS_Aer_main_specular.py:104-292, README.md:122-238 for Lambertian with
the documented deviations).  Region boundary chaining becomes two dynamic
row gathers; each region's elementwise formula is evaluated for every
layer and selected by masks — exponents of the selected region are
always ≤ 0, so out-of-region overflow is clamped away harmlessly.

The Lambertian surface integrals over µ' are separable:
    surf[t,m] = Σ_k A[m,k]·e_t[t,k] − lam_att[t,m]·Σ_k A[m,k]·c_k
(two matmuls) instead of an (L, M, M) tensor; the removable singularity
at µ'=µ in the upward integral is excised from A and added back as its
analytic limit.

Batching note (the production sweep path vmaps this over 10³–10⁵
columns): every quantity entering a matmul is factored as
``fixed operator × per-column scalar``.  The A operators depend only on
the grid and the (shared) P tables, never on the column, so under vmap
the dots stay single large (B·L, M) @ (M, M') MXU matmuls instead of B
small batched ones; the single-scattering albedos and the aerosol-layer
mixing weights (SOS_Aer_main_lambertian.py:149-151) recombine the two
species' dot results as scalars afterwards (the mix is linear in P).
The shared e^{-(τ*-τ)/µ'} table is likewise hoisted and computed once.
"""
from __future__ import annotations

import jax.numpy as jnp

from sos_rt_tpu.config import MATMUL_PRECISION, MU0_RESONANCE_TOL


def _clamp_exp(x):
    return jnp.exp(jnp.minimum(x, 0.0))


def _dot(a, b):
    return jnp.dot(a, b, precision=MATMUL_PRECISION)


def first_order(surface, tau, mu, nb_angles, mu0, grd_alb, alb_atm, alb_aer,
                p0_atm, p_atm, p0_aer, p_aer, idx_up, idx_down,
                w_atm, w_aer, w_mu):
    """I₁ (L, 2M).  ``w_mu``: trapz weights of the full µ grid."""
    L = tau.shape[0]
    M = nb_angles
    dtype = tau.dtype
    f0 = jnp.pi / mu0
    tau_star = tau[L - 1]
    e0 = jnp.exp(-tau / mu0)
    es = jnp.exp(-tau_star / mu0)
    e_s0 = jnp.exp(-(tau_star - tau) / mu0)      # shared by all surf_pairs
    rho = grd_alb
    t_idx = jnp.arange(L)
    in_a = t_idx < idx_up
    in_b = (t_idx >= idx_up) & (t_idx <= idx_down)

    # species coefficient pairs: pure-atm regions (A, C) vs the dτ-weighted
    # aerosol-layer mix (region B, SOS_Aer_main_lambertian.py:149-151)
    ca_ac, cr_ac = alb_atm, jnp.zeros((), dtype)
    ca_b, cr_b = alb_atm * w_atm, alb_aer * w_aer

    def mix2(xa, xr, region):
        if region == "B":
            return ca_b * xa + cr_b * xr
        return ca_ac * xa + cr_ac * xr

    tau_iu1 = tau[idx_up - 1]
    tau_iu = tau[idx_up]
    tau_id = tau[idx_down]
    tau_id1 = tau[idx_down + 1]

    # row index sets (columns of the output field)
    md = jnp.arange(M - 1)
    mu_m = mu[md]
    res_dn = jnp.abs(mu_m + mu0) < MU0_RESONANCE_TOL
    mue = jnp.arange(M + 1, 2 * M)
    mu_u = mu[mue]
    res_up = jnp.abs(mu_u - mu0) < MU0_RESONANCE_TOL
    mirror_up = 2 * M - 1 - mue

    # ---- Lambertian surface-integral operators (shared by both sweeps) ----
    if surface == "lambertian":
        mu_p = mu[M:]                                  # µ' ∈ [0, 1]
        wp = w_mu[M:]                                  # trapz weights on µ'
        const = rho * es / 4.0
        mirror_cols = 2 * M - 1 - jnp.arange(M, 2 * M)  # P(µ, -µ') columns
        guard = (mu_p > 0).astype(dtype)                # drop µ'=0 endpoint
        wg = wp * guard
        safe_p = jnp.where(mu_p > 0, mu_p, 1.0)

        # e^{-(τ*-τ_t)/µ'} — ONE table reused by every region (L, M)
        et = jnp.where(mu_p[None, :] > 0,
                       jnp.exp(-(tau_star - tau[:, None]) / safe_p[None, :]),
                       0.0)

        def ck_of(tref):
            # reference-level constant e^{-(τ*-tref)/µ'} (M,)
            return jnp.where(mu_p > 0, jnp.exp(-(tau_star - tref) / safe_p),
                             0.0)

        # fixed (column-independent) operators — alb/mix recombined later
        pm_atm = p_atm[:, mirror_cols]                  # raw P(µ, -µ')
        pm_aer = p_aer[:, mirror_cols]
        ratio_dn = mu_p[None, :] / (mu_p[None, :] - mu_m[:, None])
        a_dn_atm = ratio_dn * pm_atm[md] * wg[None, :]  # (M-1, M)
        a_dn_aer = ratio_dn * pm_aer[md] * wg[None, :]
        e_dn_atm = _dot(et, a_dn_atm.T)                 # (L, M-1), shared
        e_dn_aer = _dot(et, a_dn_aer.T)

        denom_u = mu_p[None, :] - mu_u[:, None]
        ratio_up = mu_p[None, :] / jnp.where(denom_u == 0, 1.0, denom_u)
        sing_k = mue - M                     # local index of µ' == µ in mu_p
        k_cols = jnp.arange(M)[None, :]
        sing_mask = k_cols == sing_k[:, None]
        a_up_atm = jnp.where(sing_mask, 0.0,
                             ratio_up * pm_atm[mue] * wg[None, :])
        a_up_aer = jnp.where(sing_mask, 0.0,
                             ratio_up * pm_aer[mue] * wg[None, :])
        e_up_atm = _dot(et, a_up_atm.T)                 # (L, M-1), shared
        e_up_aer = _dot(et, a_up_aer.T)
        # excised-singularity data for the analytic limit
        pk_atm = jnp.take_along_axis(pm_atm[mue], sing_k[:, None], axis=1)[:, 0]
        pk_aer = jnp.take_along_axis(pm_aer[mue], sing_k[:, None], axis=1)[:, 0]
        wk = wg[sing_k]
        # µ=0 rows (down col M-1 uses P row M-1; up col M uses row M)
        e_dz_atm = _dot(et, pm_atm[M - 1] * wg)         # (L,)
        e_dz_aer = _dot(et, pm_aer[M - 1] * wg)
        e_uz_atm = _dot(et, pm_atm[M] * wg)
        e_uz_aer = _dot(et, pm_aer[M] * wg)

        def lam_surf(e_atm, e_aer, a_atm, a_aer, ck, lam_att, region):
            s_et = mix2(e_atm, e_aer, region)
            s_ck = mix2(_dot(a_atm, ck), _dot(a_aer, ck), region)
            return const * (s_et - lam_att * s_ck[None, :])

    # ======================= downward columns 0..M-1 =======================

    def down_region(region):
        if region == "A":
            p0d = alb_atm * p0_atm[md]
            p0m = alb_atm * p0_atm[2 * M - 1 - md]
            att = _clamp_exp(tau[:, None] / mu_m[None, :])
            dir_pair = e0[:, None] - att
            res_lin = tau[:, None] / mu0
            surf_pair = e_s0[:, None] - es * att
            lam_ref = jnp.zeros((), dtype)
            lam_att = att
        elif region == "B":
            p0d = mix2(p0_atm[md], p0_aer[md], "B")
            p0m = mix2(p0_atm[2 * M - 1 - md], p0_aer[2 * M - 1 - md], "B")
            att_b = _clamp_exp((tau[:, None] - tau_iu1) / mu_m[None, :])
            dir_pair = e0[:, None] - e0[idx_up - 1] * att_b
            res_lin = (tau[:, None] - tau_iu1) / mu0
            att_s = _clamp_exp((tau[:, None] - tau_iu) / mu_m[None, :])
            surf_pair = (e_s0[:, None]
                         - jnp.exp(-(tau_star - tau_iu) / mu0) * att_s)
            lam_ref = tau_iu
            lam_att = att_s
            att = att_b
        else:
            p0d = alb_atm * p0_atm[md]
            p0m = alb_atm * p0_atm[2 * M - 1 - md]
            att_b = _clamp_exp((tau[:, None] - tau_id) / mu_m[None, :])
            dir_pair = e0[:, None] - e0[idx_down] * att_b
            res_lin = (tau[:, None] - tau_id) / mu0
            att_s = _clamp_exp((tau[:, None] - tau_id1) / mu_m[None, :])
            surf_pair = (e_s0[:, None]
                         - jnp.exp(-(tau_star - tau_id1) / mu0) * att_s)
            lam_ref = tau_id1
            lam_att = att_s
            att = att_b

        direct = (mu0 / (mu0 + mu_m))[None, :] * p0d[None, :] / (4 * jnp.pi) * f0 * dir_pair
        d_res = p0d[None, :] / (4 * jnp.pi) * f0 * e0[:, None] * res_lin
        direct = jnp.where(res_dn[None, :], d_res, direct)
        if surface == "specular":
            surf = ((mu0 / (mu0 - mu_m))[None, :] * p0m[None, :] / (4 * jnp.pi)
                    * (f0 * rho * es) * surf_pair)
        else:
            surf = lam_surf(e_dn_atm, e_dn_aer, a_dn_atm, a_dn_aer,
                            ck_of(lam_ref), lam_att, region)
        return att, direct + surf

    att_a, vals_a = down_region("A")
    row_a = vals_a[idx_up - 1]
    att_b, vals_b = down_region("B")
    vals_b = vals_b + row_a[None, :] * att_b
    row_b = vals_b[idx_down]
    att_c, vals_c = down_region("C")
    vals_c = vals_c + row_b[None, :] * att_c
    down_general = jnp.where(in_a[:, None], vals_a,
                             jnp.where(in_b[:, None], vals_b, vals_c))

    # µ = 0⁻ column (index M-1): before=0, drop e^{τ/µ} terms
    def down_zero(region):
        if region == "B":
            p0d0 = mix2(p0_atm[M - 1], p0_aer[M - 1], "B")
            p0m0 = mix2(p0_atm[M], p0_aer[M], "B")
        else:
            p0d0 = alb_atm * p0_atm[M - 1]
            p0m0 = alb_atm * p0_atm[M]
        d0 = p0d0 / (4 * jnp.pi) * f0 * e0
        if surface == "specular":
            s0 = p0m0 / (4 * jnp.pi) * (f0 * rho * es) * e_s0
        else:
            s0 = const * mix2(e_dz_atm, e_dz_aer, region)
        return d0 + s0

    z_ab = down_zero("A")          # regions A and C share the pure-atm form
    z_b = down_zero("B")
    down_zero_col = jnp.where(in_b, z_b, z_ab)

    # ======================= upward columns M..2M-1 ========================
    if surface == "lambertian":
        # diffuse BC from the downward field at τ*: +2ρ ∫₀¹ I1↓ µ' dµ'
        i1_down_surf = jnp.concatenate([down_general[L - 1], down_zero_col[L - 1:L]])
        f1_down = -jnp.sum(w_mu[:M] * i1_down_surf * mu[:M])
        bc_lam = 2.0 * rho * f1_down

    def up_region(region):
        if region == "C":
            p0d = alb_atm * p0_atm[mue]
            p0m = alb_atm * p0_atm[mirror_up]
            att_b = _clamp_exp(-(tau[L - 1] - tau[:, None]) / mu_u[None, :])
            dir_pair = e0[:, None] - e0[L - 1] * att_b
            lam_att = att_b                   # (τ_{L-1} = τ*)
            surf_pair = e_s0[:, None] - lam_att
            res_lin = (tau_star - tau[:, None]) / mu0
            lam_ref = tau_star
        elif region == "B":
            p0d = mix2(p0_atm[mue], p0_aer[mue], "B")
            p0m = mix2(p0_atm[mirror_up], p0_aer[mirror_up], "B")
            att_b = _clamp_exp(-(tau_id1 - tau[:, None]) / mu_u[None, :])
            dir_pair = e0[:, None] - e0[idx_down + 1] * att_b
            att_s = _clamp_exp(-(tau_id - tau[:, None]) / mu_u[None, :])
            surf_pair = (e_s0[:, None]
                         - jnp.exp(-(tau_star - tau_id) / mu0) * att_s)
            res_lin = (tau_id - tau[:, None]) / mu0
            lam_ref = tau_id
            lam_att = att_s
        else:
            p0d = alb_atm * p0_atm[mue]
            p0m = alb_atm * p0_atm[mirror_up]
            att_b = _clamp_exp(-(tau_iu - tau[:, None]) / mu_u[None, :])
            dir_pair = e0[:, None] - e0[idx_up] * att_b
            att_s = _clamp_exp(-(tau_iu1 - tau[:, None]) / mu_u[None, :])
            surf_pair = (e_s0[:, None]
                         - jnp.exp(-(tau_star - tau_iu1) / mu0) * att_s)
            res_lin = (tau_iu1 - tau[:, None]) / mu0
            lam_ref = tau_iu1
            lam_att = att_s

        direct = (mu0 / (mu0 + mu_u))[None, :] * p0d[None, :] / (4 * jnp.pi) * f0 * dir_pair
        if surface == "specular":
            surf = ((mu0 / (mu0 - mu_u))[None, :] * p0m[None, :] / (4 * jnp.pi)
                    * (f0 * rho * es) * surf_pair)
            s_res = (p0m[None, :] / (4 * jnp.pi) * (f0 * rho * es)
                     * e_s0[:, None] * res_lin)
            surf = jnp.where(res_up[None, :], s_res, surf)
        else:
            # excised µ'=µ singularity added back as its analytic limit:
            # (1/µ)·e^{-(τ*-τ)/µ}·(lam_ref-τ)·[ωP]·const·w'
            pk = mix2(pk_atm, pk_aer, region)
            lim = ((1.0 / mu_u)[None, :]
                   * _clamp_exp(-(tau_star - tau[:, None]) / mu_u[None, :])
                   * (lam_ref - tau[:, None]) * pk[None, :] * const * wk[None, :])
            surf = lam_surf(e_up_atm, e_up_aer, a_up_atm, a_up_aer,
                            ck_of(lam_ref), lam_att, region) + lim
        return att_b, direct + surf

    att_c_u, vals_c_u = up_region("C")
    if surface == "specular":
        # mirror gather of the downward surface row (spec BC: ρ·I1↓(τ*, -µ))
        down_surf_row = jnp.concatenate(
            [down_general[L - 1], down_zero_col[L - 1:L]])
        bc = rho * down_surf_row[mirror_up]
    else:
        bc = jnp.full((M - 1,), bc_lam, dtype)
    vals_c_u = vals_c_u + bc[None, :] * att_c_u
    row_c = vals_c_u[idx_down + 1]
    att_b_u, vals_b_u = up_region("B")
    vals_b_u = vals_b_u + row_c[None, :] * att_b_u
    row_b_u = vals_b_u[idx_up]
    att_a_u, vals_a_u = up_region("A")
    vals_a_u = vals_a_u + row_b_u[None, :] * att_a_u
    up_general = jnp.where(in_a[:, None], vals_a_u,
                           jnp.where(in_b[:, None], vals_b_u, vals_c_u))

    # µ = 0⁺ column (index M): before = 0, drop e^{-Δ/µ} terms
    def up_zero(region):
        if region == "B":
            p0d0 = mix2(p0_atm[M], p0_aer[M], "B")
            p0m0 = mix2(p0_atm[M - 1], p0_aer[M - 1], "B")
        else:
            p0d0 = alb_atm * p0_atm[M]
            p0m0 = alb_atm * p0_atm[M - 1]
        d0 = (mu0 / (mu0 + mu[M])) * p0d0 / (4 * jnp.pi) * f0 * e0
        if surface == "specular":
            s0 = p0m0 / (4 * jnp.pi) * (f0 * rho * es) * e_s0
        else:
            s0 = const * mix2(e_uz_atm, e_uz_aer, region)
        return d0 + s0

    uz_ab = up_zero("A")
    uz_b = up_zero("B")
    up_zero_col = jnp.where(in_b, uz_b, uz_ab)

    # columns are contiguous: [0..M-2 | M-1 | M | M+1..2M-1]
    return jnp.concatenate(
        [down_general, down_zero_col[:, None], up_zero_col[:, None],
         up_general], axis=1)
