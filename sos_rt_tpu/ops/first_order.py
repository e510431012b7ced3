"""Closed-form first scattering order I₁, branchless (jit/vmap-safe).

Reproduces the oracle's 3-region construction
(sos_rt_tpu/oracle/solver.py::_first_order; reference:
SOS_Aer_main_specular.py:104-292, README.md:122-238 for Lambertian with
the documented deviations).

Formulation: every region's closed form differs only in a handful of
per-layer REFERENCE SCALARS (the region's boundary optical depth and
the attenuations anchored there, SOS_Aer_main_lambertian.py:113-294's
three code blocks).  Those scalars are select-ed per layer first
((L,)-sized wheres), and each exponential is then evaluated ONCE over
(L, M) — instead of evaluating all three regions' (L, M) exponentials
and selecting afterwards.  Region boundary chaining evaluates the same
parameterized formula at the single boundary layer (identical
arithmetic to gathering the row from the full field, but it never
forces the per-region (L, M) arrays to materialize).  Under a 10³–10⁵
column vmap this is the difference between ~6 and ~25 HBM passes of
(B, L, M) traffic (measured 110 ms → see BASELINE.md).

The Lambertian surface integrals over µ' are separable:
    surf[t,m] = Σ_k A[m,k]·e_t[t,k] − lam_att[t,m]·Σ_k A[m,k]·c_k
(two matmuls) instead of an (L, M, M) tensor; the removable singularity
at µ'=µ in the upward integral is excised from A and added back as its
analytic limit.  The A operators depend only on the grid and the shared
P tables, so under vmap the dots stay single large MXU matmuls.
"""
from __future__ import annotations

import jax.numpy as jnp

from sos_rt_tpu.config import MATMUL_PRECISION, MU0_RESONANCE_TOL


def _clamp_exp(x):
    return jnp.exp(jnp.minimum(x, 0.0))


def _dot(a, b):
    return jnp.dot(a, b, precision=MATMUL_PRECISION)


def _sel3(in_a, in_b, va, vb, vc):
    """Per-layer 3-region select (broadcasts over trailing axes)."""
    return jnp.where(in_a, va, jnp.where(in_b, vb, vc))


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
    e_s0 = jnp.exp(-(tau_star - tau) / mu0)
    rho = grd_alb
    t_idx = jnp.arange(L)
    in_a = (t_idx < idx_up)[:, None]                 # (L, 1) region masks
    in_b = ((t_idx >= idx_up) & (t_idx <= idx_down))[:, None]

    # species coefficients per layer: pure-atm (regions A, C) vs the
    # dτ-weighted aerosol-layer mix (region B, main_lambertian.py:149-151)
    zero = jnp.zeros((), dtype)
    ca_col = jnp.where(in_b, alb_atm * w_atm, alb_atm)      # (L, 1)
    cr_col = jnp.where(in_b, alb_aer * w_aer, zero)
    ca_b, cr_b = alb_atm * w_atm, alb_aer * w_aer           # region-B pair

    tau_iu1 = tau[idx_up - 1]
    tau_iu = tau[idx_up]
    tau_id = tau[idx_down]
    tau_id1 = tau[idx_down + 1]

    md = jnp.arange(M - 1)
    mu_m = mu[md]
    res_dn = (jnp.abs(mu_m + mu0) < MU0_RESONANCE_TOL)[None, :]
    mue = jnp.arange(M + 1, 2 * M)
    mu_u = mu[mue]
    res_up = (jnp.abs(mu_u - mu0) < MU0_RESONANCE_TOL)[None, :]
    mirror_up = 2 * M - 1 - mue

    p0d_dn = ca_col * p0_atm[md][None, :] + cr_col * p0_aer[md][None, :]
    p0m_dn = (ca_col * p0_atm[2 * M - 1 - md][None, :]
              + cr_col * p0_aer[2 * M - 1 - md][None, :])
    p0d_up = ca_col * p0_atm[mue][None, :] + cr_col * p0_aer[mue][None, :]
    p0m_up = (ca_col * p0_atm[mirror_up][None, :]
              + cr_col * p0_aer[mirror_up][None, :])

    # ---- Lambertian surface-integral operators (shared by both sweeps) ----
    if surface == "lambertian":
        mu_p = mu[M:]                                  # µ' ∈ [0, 1]
        wp = w_mu[M:]
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
        pk_atm = jnp.take_along_axis(pm_atm[mue], sing_k[:, None], axis=1)[:, 0]
        pk_aer = jnp.take_along_axis(pm_aer[mue], sing_k[:, None], axis=1)[:, 0]
        wk = wg[sing_k]
        # µ=0 rows (down col M-1 uses P row M-1; up col M uses row M)
        e_dz_atm = _dot(et, pm_atm[M - 1] * wg)         # (L,)
        e_dz_aer = _dot(et, pm_aer[M - 1] * wg)
        e_uz_atm = _dot(et, pm_atm[M] * wg)
        e_uz_aer = _dot(et, pm_aer[M] * wg)

        # the per-region surface constants Σ_k A[m,k]·ck(region) — three
        # (M-1,) rows each, selected per layer (tiny dots, never (L,·))
        def sck3(a_atm, a_aer, ca, cr, trefs):
            rows = [ca * _dot(a_atm, ck_of(tr)) + cr * _dot(a_aer, ck_of(tr))
                    for tr in trefs]
            return rows

        def pick_rows(rows_ac, row_b):
            return _sel3(in_a, in_b, rows_ac[0][None, :], row_b[None, :],
                         rows_ac[1][None, :])

    # =================== downward field, parameterized =====================
    # per-layer reference scalars (the three blocks of
    # main_lambertian.py:113-201 differ only in these)
    tr_b_dn = _sel3(in_a, in_b, zero, tau_iu1, tau_id)          # att ref
    e0r_dn = _sel3(in_a, in_b, jnp.ones((), dtype), e0[idx_up - 1],
                   e0[idx_down])
    tr_s_dn = _sel3(in_a, in_b, zero, tau_iu, tau_id1)          # surf ref
    esr_dn = jnp.exp(-(tau_star - tr_s_dn) / mu0)

    att_b_dn = _clamp_exp((tau[:, None] - tr_b_dn) / mu_m[None, :])
    att_s_dn = _clamp_exp((tau[:, None] - tr_s_dn) / mu_m[None, :])

    # resonance-safe denominator: at |µ+µ0| < tol the direct term is
    # replaced by its linear-in-τ limit below, but the raw division would
    # still emit inf·0 = NaN in the discarded branch (jax_debug_nans gate)
    den_dn = jnp.where(res_dn[0], 1.0, mu0 + mu_m)

    def down_vals(att_b, att_s, tau_col, tr_b, e0r, esr, e0_col, es0_col,
                  p0d, p0m, sck_sel=None, row_sel=None):
        direct = ((mu0 / den_dn)[None, :] * p0d / (4 * jnp.pi) * f0
                  * (e0_col - e0r * att_b))
        d_res = (p0d / (4 * jnp.pi) * f0 * e0_col
                 * (tau_col - tr_b) / mu0)
        direct = jnp.where(res_dn, d_res, direct)
        if surface == "specular":
            surf = ((mu0 / (mu0 - mu_m))[None, :] * p0m / (4 * jnp.pi)
                    * (f0 * rho * es) * (es0_col - esr * att_s))
        else:
            surf = const * (row_sel - att_s * sck_sel)
        return direct + surf

    if surface == "lambertian":
        # region-selected Σ A·ck rows and the shared s_et table rows
        rows_dn = sck3(a_dn_atm, a_dn_aer, alb_atm, zero, (zero, tau_id1))
        row_dn_b = (ca_b * _dot(a_dn_atm, ck_of(tau_iu))
                    + cr_b * _dot(a_dn_aer, ck_of(tau_iu)))
        sck_dn = pick_rows(rows_dn, row_dn_b)
        set_dn = ca_col * e_dn_atm + cr_col * e_dn_aer      # Σ A·et (L, M-1)
        lam_kw = dict(sck_sel=sck_dn, row_sel=set_dn)
    else:
        lam_kw = dict()

    base_dn = down_vals(att_b_dn, att_s_dn, tau[:, None], tr_b_dn, e0r_dn,
                        esr_dn, e0[:, None], e_s0[:, None], p0d_dn, p0m_dn,
                        **lam_kw)

    # boundary rows: the SAME parameterized formula at the boundary layer
    # (scalar τ), chained with the in-region attenuations
    def down_row(t_row, tr_b, e0r, tr_s, region):
        tau_r = tau[t_row]
        att_b = _clamp_exp((tau_r - tr_b) / mu_m)[None, :]
        att_s = _clamp_exp((tau_r - tr_s) / mu_m)[None, :]
        if region == "B":
            ca, cr = ca_b, cr_b
        else:
            ca, cr = alb_atm, zero
        p0d = (ca * p0_atm[md] + cr * p0_aer[md])[None, :]
        p0m = (ca * p0_atm[2 * M - 1 - md] + cr * p0_aer[2 * M - 1 - md])[None, :]
        if surface == "lambertian":
            sck = (ca * _dot(a_dn_atm, ck_of(tr_s))
                   + cr * _dot(a_dn_aer, ck_of(tr_s)))[None, :]
            row = (ca * e_dn_atm[t_row] + cr * e_dn_aer[t_row])[None, :]
            kw = dict(sck_sel=sck, row_sel=row)
        else:
            kw = dict()
        esr = jnp.exp(-(tau_star - tr_s) / mu0)
        return down_vals(att_b, att_s, tau_r, tr_b, e0r, esr, e0[t_row],
                         e_s0[t_row], p0d, p0m, **kw)[0]

    row_a = down_row(idx_up - 1, zero, jnp.ones((), dtype), zero, "A")
    row_b = (down_row(idx_down, tau_iu1, e0[idx_up - 1], tau_iu, "B")
             + row_a * _clamp_exp((tau_id - tau_iu1) / mu_m))

    before_dn = _sel3(in_a, in_b, jnp.zeros((M - 1,), dtype)[None, :],
                      row_a[None, :], row_b[None, :])
    down_general = base_dn + before_dn * att_b_dn

    # µ = 0⁻ column (index M-1): before=0, drop e^{τ/µ} terms
    p0dz = ca_col[:, 0] * p0_atm[M - 1] + cr_col[:, 0] * p0_aer[M - 1]
    p0mz = ca_col[:, 0] * p0_atm[M] + cr_col[:, 0] * p0_aer[M]
    dz = p0dz / (4 * jnp.pi) * f0 * e0
    if surface == "specular":
        dz = dz + p0mz / (4 * jnp.pi) * (f0 * rho * es) * e_s0
    else:
        dz = dz + const * (ca_col[:, 0] * e_dz_atm + cr_col[:, 0] * e_dz_aer)
    down_zero_col = dz

    # ==================== upward field, parameterized ======================
    if surface == "lambertian":
        i1_down_surf = jnp.concatenate([down_general[L - 1],
                                        down_zero_col[L - 1:L]])
        f1_down = -jnp.sum(w_mu[:M] * i1_down_surf * mu[:M])
        bc = jnp.full((M - 1,), 2.0 * rho * f1_down, dtype)
    else:
        down_surf_row = jnp.concatenate(
            [down_general[L - 1], down_zero_col[L - 1:L]])
        bc = rho * down_surf_row[mirror_up]

    tr_b_up = _sel3(in_a, in_b, tau_iu, tau_id1, tau_star)
    e0r_up = _sel3(in_a, in_b, e0[idx_up], e0[idx_down + 1], e0[L - 1])
    tr_s_up = _sel3(in_a, in_b, tau_iu1, tau_id, tau_star)
    esr_up = jnp.exp(-(tau_star - tr_s_up) / mu0)

    att_b_up = _clamp_exp(-(tr_b_up - tau[:, None]) / mu_u[None, :])
    att_s_up = _clamp_exp(-(tr_s_up - tau[:, None]) / mu_u[None, :])

    den_up = jnp.where(res_up[0], 1.0, mu0 - mu_u)   # resonance-safe (µ=µ0)

    def up_vals(att_b, att_s, tau_col, tr_s, e0r, esr, e0_col, es0_col,
                p0d, p0m, ts_exp=None, sck_sel=None, row_sel=None,
                pk_sel=None):
        direct = ((mu0 / (mu0 + mu_u))[None, :] * p0d / (4 * jnp.pi) * f0
                  * (e0_col - e0r * att_b))
        if surface == "specular":
            surf = ((mu0 / den_up)[None, :] * p0m / (4 * jnp.pi)
                    * (f0 * rho * es) * (es0_col - esr * att_s))
            s_res = (p0m / (4 * jnp.pi) * (f0 * rho * es) * es0_col
                     * (tr_s - tau_col) / mu0)
            surf = jnp.where(res_up, s_res, surf)
        else:
            # excised µ'=µ singularity added back as its analytic limit
            lim = ((1.0 / mu_u)[None, :] * ts_exp * (tr_s - tau_col)
                   * pk_sel * const * wk[None, :])
            surf = const * (row_sel - att_s * sck_sel) + lim
        return direct + surf

    if surface == "lambertian":
        ts_exp = _clamp_exp(-(tau_star - tau[:, None]) / mu_u[None, :])
        rows_up = sck3(a_up_atm, a_up_aer, alb_atm, zero, (tau_iu1, tau_star))
        row_up_b = (ca_b * _dot(a_up_atm, ck_of(tau_id))
                    + cr_b * _dot(a_up_aer, ck_of(tau_id)))
        sck_up = pick_rows(rows_up, row_up_b)
        set_up = ca_col * e_up_atm + cr_col * e_up_aer
        pk_sel = ca_col * pk_atm[None, :] + cr_col * pk_aer[None, :]
        lam_up = dict(ts_exp=ts_exp, sck_sel=sck_up, row_sel=set_up,
                      pk_sel=pk_sel)
    else:
        lam_up = dict()

    base_up = up_vals(att_b_up, att_s_up, tau[:, None], tr_s_up, e0r_up,
                      esr_up, e0[:, None], e_s0[:, None], p0d_up, p0m_up,
                      **lam_up)

    def up_row(t_row, tr_b, e0r, tr_s, region):
        tau_r = tau[t_row]
        att_b = _clamp_exp(-(tr_b - tau_r) / mu_u)[None, :]
        att_s = _clamp_exp(-(tr_s - tau_r) / mu_u)[None, :]
        if region == "B":
            ca, cr = ca_b, cr_b
        else:
            ca, cr = alb_atm, zero
        p0d = (ca * p0_atm[mue] + cr * p0_aer[mue])[None, :]
        p0m = (ca * p0_atm[mirror_up] + cr * p0_aer[mirror_up])[None, :]
        if surface == "lambertian":
            kw = dict(
                ts_exp=_clamp_exp(-(tau_star - tau_r) / mu_u)[None, :],
                sck_sel=(ca * _dot(a_up_atm, ck_of(tr_s))
                         + cr * _dot(a_up_aer, ck_of(tr_s)))[None, :],
                row_sel=(ca * e_up_atm[t_row] + cr * e_up_aer[t_row])[None, :],
                pk_sel=(ca * pk_atm + cr * pk_aer)[None, :])
        else:
            kw = dict()
        esr = jnp.exp(-(tau_star - tr_s) / mu0)
        return up_vals(att_b, att_s, tau_r, tr_s, e0r, esr, e0[t_row],
                       e_s0[t_row], p0d, p0m, **kw)[0]

    row_c = (up_row(idx_down + 1, tau_star, e0[L - 1], tau_star, "C")
             + bc * _clamp_exp(-(tau_star - tau_id1) / mu_u))
    row_b_u = (up_row(idx_up, tau_id1, e0[idx_down + 1], tau_id, "B")
               + row_c * _clamp_exp(-(tau_id1 - tau_iu) / mu_u))

    before_up = _sel3(in_a, in_b, row_b_u[None, :], row_c[None, :],
                      bc[None, :])
    up_general = base_up + before_up * att_b_up

    # µ = 0⁺ column (index M): before = 0, drop e^{-Δ/µ} terms
    p0dz_u = ca_col[:, 0] * p0_atm[M] + cr_col[:, 0] * p0_aer[M]
    p0mz_u = ca_col[:, 0] * p0_atm[M - 1] + cr_col[:, 0] * p0_aer[M - 1]
    uz = (mu0 / (mu0 + mu[M])) * p0dz_u / (4 * jnp.pi) * f0 * e0
    if surface == "specular":
        uz = uz + p0mz_u / (4 * jnp.pi) * (f0 * rho * es) * e_s0
    else:
        uz = uz + const * (ca_col[:, 0] * e_uz_atm + cr_col[:, 0] * e_uz_aer)
    up_zero_col = uz

    # columns are contiguous: [0..M-2 | M-1 | M | M+1..2M-1]
    return jnp.concatenate(
        [down_general, down_zero_col[:, None], up_zero_col[:, None],
         up_general], axis=1)


# ---------------------------------------------------------------------------
# In-kernel I₁ inputs for the mega path (ops/megakernel.py)
# ---------------------------------------------------------------------------
# The closed form above, regrouped for evaluation INSIDE the whole-solve
# Pallas kernel: everything (L, B)-sized or (M, B)-sized is precomputed
# here (cheap), and only the (L, B, M)-sized work — five outer-product
# exponentials and one stacked (4M, M) matmul per chunk — runs on-chip.
# This removes the (B, L, 2M) I₁ materialization + lane transposes that
# dominated the batched fixed cost (BASELINE.md round-2 measurements).

# i1c tile rows (NI, M, B); unused rows (other surface) stay zero
(T_DDA, T_DDR, T_DBA, T_DBR, T_UDA, T_UDR, T_RESDN,
 T_ROWA, T_ROWB, T_BC, T_ROWC, T_ROWBU,
 T_SCKDNA, T_SCKDNB, T_SCKDNC, T_SCKUPA, T_SCKUPB, T_SCKUPC,
 T_DMA, T_DMR, T_UMA, T_UMR, T_UBA, T_UBR, T_RESUP) = range(25)
NI_TILES = 32


def first_order_mega_inputs(surface, tau, mu, nb_angles, mu0, grd_alb,
                            alb_atm, alb_aer, p0_atm, p_atm, p0_aer, p_aer,
                            idx_up, idx_down, w_atm, w_aer, w_mu, dtype):
    """Batched I₁ inputs for the mega kernel's in-kernel first order.

    tau: (B, L); mu0/grd_alb/alb_*: (B,); p0_*: (2M,) or (B, 2M).
    Returns (pack_rows dict of (L, B), tiles (NI, M, B),
    colc_pk (2, M), const (B,), astack (4M, M) or None).
    """
    B, L = tau.shape
    M = nb_angles
    mu = jnp.asarray(mu, dtype)
    w_mu = jnp.asarray(w_mu, dtype)
    mu0 = jnp.asarray(mu0, dtype)[:, None]                  # (B, 1)
    rho = jnp.asarray(grd_alb, dtype)[:, None]
    alb_atm = jnp.asarray(alb_atm, dtype)[:, None]
    alb_aer = jnp.asarray(alb_aer, dtype)[:, None]
    w_atm = jnp.asarray(w_atm, dtype)[:, None]
    w_aer = jnp.asarray(w_aer, dtype)[:, None]
    if jnp.ndim(p0_atm) == 1:
        p0_atm = jnp.broadcast_to(p0_atm[None, :], (B, 2 * M))
        p0_aer = jnp.broadcast_to(p0_aer[None, :], (B, 2 * M))
    p0_atm = jnp.asarray(p0_atm, dtype)
    p0_aer = jnp.asarray(p0_aer, dtype)

    f0 = jnp.pi / mu0                                       # (B, 1)
    tau_star = tau[:, -1:]
    gather = lambda idx: jnp.take_along_axis(tau, idx[:, None], axis=1)
    tau_iu1 = gather(idx_up - 1)
    tau_iu = gather(idx_up)
    tau_id = gather(idx_down)
    tau_id1 = gather(idx_down + 1)
    e0_of = lambda t: jnp.exp(-t / mu0)
    es = e0_of(tau_star)

    t_idx = jnp.arange(L)[None, :]
    in_a = t_idx < idx_up[:, None]
    in_b = (t_idx >= idx_up[:, None]) & (t_idx <= idx_down[:, None])
    region = jnp.where(in_a, 0.0, jnp.where(in_b, 1.0, 2.0)).astype(dtype)

    sel3 = lambda va, vb, vc: jnp.where(in_a, va, jnp.where(in_b, vb, vc))
    tr_b_dn = sel3(jnp.zeros_like(tau_iu1), tau_iu1, tau_id)
    tr_s_dn = sel3(jnp.zeros_like(tau_iu), tau_iu, tau_id1)
    tr_b_up = sel3(tau_iu, tau_id1, tau_star)
    tr_s_up = sel3(tau_iu1, tau_id, tau_star)

    pack_rows = {
        "abdn": tau - tr_b_dn,
        "asdn": tau - tr_s_dn,
        "abup": tau - tr_b_up,
        "asup": tau - tr_s_up,
        "astar": tau - tau_star,
        "e0t": e0_of(tau),
        "es0t": jnp.exp(-(tau_star - tau) / mu0),
        "e0rdn": sel3(jnp.ones_like(tau_iu1), e0_of(tau_iu1), e0_of(tau_id)),
        "esrdn": jnp.exp(-(tau_star - tr_s_dn) / mu0),
        "e0rup": sel3(e0_of(tau_iu), e0_of(tau_id1), es),
        "esrup": jnp.exp(-(tau_star - tr_s_up) / mu0),
        "region": region,
    }
    pack_rows = {k: v.T for k, v in pack_rows.items()}       # (L, B)

    # ---- per-(angle, column) coefficient tiles (M, B) ----
    md = jnp.arange(M - 1)
    mu_m = mu[md]
    mue = jnp.arange(M + 1, 2 * M)
    mu_u = mu[mue]
    mirror_up = 2 * M - 1 - mue
    c4pi = f0 / (4 * jnp.pi)                                 # (B, 1)

    # down direct: rows 0..M-2 ratio µ0/(µ0+µ), row M-1 (µ=0) ratio 1;
    # resonance-safe denominator (the limit replaces the value, but the
    # raw division would emit NaN under the jax_debug_nans gate)
    res_m = jnp.abs(mu_m[None, :] + mu0) < MU0_RESONANCE_TOL
    ratio_dn = jnp.concatenate(
        [mu0 / jnp.where(res_m, 1.0, mu0 + mu_m[None, :]),
         jnp.ones((B, 1), dtype)], axis=1)
    dd = lambda p0: (ratio_dn * p0[:, :M] * c4pi).T          # (M, B)
    db = lambda p0: (p0[:, :M] * c4pi / mu0).T
    res_dn = jnp.concatenate(
        [(jnp.abs(mu_m[None, :] + mu0) < MU0_RESONANCE_TOL),
         jnp.zeros((B, 1), bool)], axis=1).astype(dtype).T

    # up direct: row 0 (µ=0⁺, grid index M) ratio µ0/(µ0+0)=1
    ratio_up = jnp.concatenate(
        [jnp.ones((B, 1), dtype), mu0 / (mu0 + mu_u[None, :])], axis=1)
    ud = lambda p0: (ratio_up * p0[:, M:] * c4pi).T

    tiles = jnp.zeros((NI_TILES, M, B), dtype)
    tiles = tiles.at[T_DDA].set(dd(p0_atm))
    tiles = tiles.at[T_DDR].set(dd(p0_aer))
    tiles = tiles.at[T_DBA].set(db(p0_atm))
    tiles = tiles.at[T_DBR].set(db(p0_aer))
    tiles = tiles.at[T_UDA].set(ud(p0_atm))
    tiles = tiles.at[T_UDR].set(ud(p0_aer))
    tiles = tiles.at[T_RESDN].set(res_dn)

    ca_b, cr_b = alb_atm * w_atm, alb_aer * w_aer            # (B, 1)
    zero_b = jnp.zeros_like(ca_b)

    if surface == "lambertian":
        mu_p = mu[M:]
        wp = w_mu[M:]
        const = (rho * es / 4.0)[:, 0]
        mirror_cols = 2 * M - 1 - jnp.arange(M, 2 * M)
        guard = (mu_p > 0).astype(dtype)
        wg = wp * guard
        safe_p = jnp.where(mu_p > 0, mu_p, 1.0)
        pm_atm = jnp.asarray(p_atm, dtype)[:, mirror_cols]
        pm_aer = jnp.asarray(p_aer, dtype)[:, mirror_cols]
        rdn = mu_p[None, :] / (mu_p[None, :] - mu_m[:, None])
        # full-M down operator: rows 0..M-2 the µ′-integral, row M-1 the
        # µ=0⁻ special row (pm[M-1]·wg) — folds down_zero into the form
        a_dn = lambda pm: jnp.concatenate(
            [rdn * pm[md] * wg[None, :], (pm[M - 1] * wg)[None, :]], axis=0)
        denom_u = mu_p[None, :] - mu_u[:, None]
        rup = mu_p[None, :] / jnp.where(denom_u == 0, 1.0, denom_u)
        sing_k = mue - M
        sing_mask = jnp.arange(M)[None, :] == sing_k[:, None]
        # full-M up operator: row 0 the µ=0⁺ special row (pm[M]·wg)
        a_up = lambda pm: jnp.concatenate(
            [(pm[M] * wg)[None, :],
             jnp.where(sing_mask, 0.0, rup * pm[mue] * wg[None, :])], axis=0)
        a_dn_atm, a_dn_aer = a_dn(pm_atm), a_dn(pm_aer)
        a_up_atm, a_up_aer = a_up(pm_atm), a_up(pm_aer)
        astack = jnp.concatenate([a_dn_atm, a_dn_aer, a_up_atm, a_up_aer])
        # excised-singularity rows (per-angle): row 0 → 0 (1/µ·0 anyway)
        pk_row = lambda pm: jnp.concatenate(
            [jnp.zeros((1,), dtype),
             jnp.take_along_axis(pm[mue], sing_k[:, None], axis=1)[:, 0]
             * wg[sing_k]])
        colc_pk = jnp.stack([pk_row(pm_atm), pk_row(pm_aer)])

        # region surface constants sck_r = Σ_k A[m,k]·e^{-(τ*-tref_r)/µ'_k}
        # — (M, B) per region per sweep, mixed by the region's (ca, cr)
        def ck_of(tref):                                     # (B, M)
            return jnp.where(mu_p[None, :] > 0,
                             jnp.exp(-(tau_star - tref) / safe_p[None, :]),
                             0.0)

        def sck(a_atm, a_aer, ca, cr, tref):
            ck = ck_of(tref)                                 # (B, M)
            return (ca.T * _dot(a_atm, ck.T) + cr.T * _dot(a_aer, ck.T))

        z = jnp.zeros_like(tau_star)
        tiles = tiles.at[T_SCKDNA].set(sck(a_dn_atm, a_dn_aer, alb_atm, zero_b, z))
        tiles = tiles.at[T_SCKDNB].set(sck(a_dn_atm, a_dn_aer, ca_b, cr_b, tau_iu))
        tiles = tiles.at[T_SCKDNC].set(sck(a_dn_atm, a_dn_aer, alb_atm, zero_b, tau_id1))
        tiles = tiles.at[T_SCKUPA].set(sck(a_up_atm, a_up_aer, alb_atm, zero_b, tau_iu1))
        tiles = tiles.at[T_SCKUPB].set(sck(a_up_atm, a_up_aer, ca_b, cr_b, tau_id))
        tiles = tiles.at[T_SCKUPC].set(sck(a_up_atm, a_up_aer, alb_atm, zero_b, tau_star))
    else:
        const = jnp.zeros((B,), dtype)
        astack = None
        colc_pk = jnp.zeros((2, M), dtype)
        # specular mirror-surface coefficient tiles
        frs = f0 * rho * es / (4 * jnp.pi)                   # (B, 1)
        rm_dn = jnp.concatenate(
            [mu0 / (mu0 - mu_m[None, :]), jnp.ones((B, 1), dtype)], axis=1)
        p0m_dn = lambda p0: jnp.concatenate(
            [p0[:, 2 * M - 1 - md], p0[:, M:M + 1]], axis=1)
        res_u = jnp.abs(mu_u[None, :] - mu0) < MU0_RESONANCE_TOL
        rm_up = jnp.concatenate(
            [jnp.ones((B, 1), dtype),
             mu0 / jnp.where(res_u, 1.0, mu0 - mu_u[None, :])], axis=1)
        p0m_up = lambda p0: jnp.concatenate(
            [p0[:, M - 1:M], p0[:, mirror_up]], axis=1)
        tiles = tiles.at[T_DMA].set((rm_dn * p0m_dn(p0_atm) * frs).T)
        tiles = tiles.at[T_DMR].set((rm_dn * p0m_dn(p0_aer) * frs).T)
        tiles = tiles.at[T_UMA].set((rm_up * p0m_up(p0_atm) * frs).T)
        tiles = tiles.at[T_UMR].set((rm_up * p0m_up(p0_aer) * frs).T)
        tiles = tiles.at[T_UBA].set((p0m_up(p0_atm) * frs / mu0).T)
        tiles = tiles.at[T_UBR].set((p0m_up(p0_aer) * frs / mu0).T)
        res_up = jnp.concatenate(
            [jnp.zeros((B, 1), bool),
             jnp.abs(mu_u[None, :] - mu0) < MU0_RESONANCE_TOL],
            axis=1).astype(dtype).T
        tiles = tiles.at[T_RESUP].set(res_up)

    # ---- boundary "before" rows, evaluated batched at scalar layers ----
    # (same parameterized closed form as the kernel's general formula)
    def dn_at(tau_r, tr_b, e0r, tr_s, ca, cr):
        """(B, M) downward row at per-column scalar layer tau_r."""
        att_b = _clamp_exp((tau_r - tr_b) / mu_m[None, :])
        att_s = _clamp_exp((tau_r - tr_s) / mu_m[None, :])
        e0_r = e0_of(tau_r)
        p0d = ca * p0_atm[:, :M - 1] + cr * p0_aer[:, :M - 1]
        res = jnp.abs(mu_m[None, :] + mu0) < MU0_RESONANCE_TOL
        direct = (mu0 / jnp.where(res, 1.0, mu0 + mu_m[None, :])) \
            * p0d * c4pi * (e0_r - e0r * att_b)
        d_res = p0d * c4pi * e0_r * (tau_r - tr_b) / mu0
        direct = jnp.where(res, d_res, direct)
        if surface == "lambertian":
            et_r = ck_of(tau_r)                              # (B, M)
            row = (ca * _dot(et_r, a_dn_atm[:M - 1].T)
                   + cr * _dot(et_r, a_dn_aer[:M - 1].T))
            sck_r = (ca * _dot(ck_of(tr_s), a_dn_atm[:M - 1].T)
                     + cr * _dot(ck_of(tr_s), a_dn_aer[:M - 1].T))
            surf = const[:, None] * (row - att_s * sck_r)
        else:
            p0m = ca * p0_atm[:, 2 * M - 1 - md] + cr * p0_aer[:, 2 * M - 1 - md]
            esr = jnp.exp(-(tau_star - tr_s) / mu0)
            surf = ((mu0 / (mu0 - mu_m[None, :])) * p0m * frs
                    * (jnp.exp(-(tau_star - tau_r) / mu0) - esr * att_s))
        return direct + surf                                 # (B, M-1)

    def up_at(tau_r, tr_b, e0r, tr_s, ca, cr):
        att_b = _clamp_exp(-(tr_b - tau_r) / mu_u[None, :])
        att_s = _clamp_exp(-(tr_s - tau_r) / mu_u[None, :])
        e0_r = e0_of(tau_r)
        es0_r = jnp.exp(-(tau_star - tau_r) / mu0)
        p0d = ca * p0_atm[:, mue] + cr * p0_aer[:, mue]
        direct = (mu0 / (mu0 + mu_u[None, :])) * p0d * c4pi * (
            e0_r - e0r * att_b)
        if surface == "lambertian":
            et_r = ck_of(tau_r)
            row = (ca * _dot(et_r, a_up_atm[1:].T)
                   + cr * _dot(et_r, a_up_aer[1:].T))
            sck_r = (ca * _dot(ck_of(tr_s), a_up_atm[1:].T)
                     + cr * _dot(ck_of(tr_s), a_up_aer[1:].T))
            pk = (ca * jnp.asarray(colc_pk[0][1:], dtype)[None, :]
                  + cr * jnp.asarray(colc_pk[1][1:], dtype)[None, :])
            lim = ((1.0 / mu_u)[None, :]
                   * _clamp_exp(-(tau_star - tau_r) / mu_u[None, :])
                   * (tr_s - tau_r) * pk * const[:, None])
            surf = const[:, None] * (row - att_s * sck_r) + lim
        else:
            p0m = ca * p0_atm[:, mirror_up] + cr * p0_aer[:, mirror_up]
            esr = jnp.exp(-(tau_star - tr_s) / mu0)
            res = jnp.abs(mu_u[None, :] - mu0) < MU0_RESONANCE_TOL
            surf = ((mu0 / jnp.where(res, 1.0, mu0 - mu_u[None, :]))
                    * p0m * frs * (es0_r - esr * att_s))
            s_res = p0m * frs * es0_r * (tr_s - tau_r) / mu0
            surf = jnp.where(res, s_res, surf)
        return direct + surf                                 # (B, M-1)

    one_b = jnp.ones_like(tau_star)
    pad_last = lambda r: jnp.concatenate(
        [r, jnp.zeros((B, 1), dtype)], axis=1).T             # (M, B), µ=0→0
    pad_first = lambda r: jnp.concatenate(
        [jnp.zeros((B, 1), dtype), r], axis=1).T

    row_a = dn_at(tau_iu1, jnp.zeros_like(tau_iu1), one_b,
                  jnp.zeros_like(tau_iu1), alb_atm, zero_b)
    row_b = (dn_at(tau_id, tau_iu1, e0_of(tau_iu1), tau_iu, ca_b, cr_b)
             + row_a * _clamp_exp((tau_id - tau_iu1) / mu_m[None, :]))
    tiles = tiles.at[T_ROWA].set(pad_last(row_a))
    tiles = tiles.at[T_ROWB].set(pad_last(row_b))

    # surface BC from the full downward row at τ* (general + µ=0 col).
    # The pure-atm coefficients (alb_atm, zero) are valid only under the
    # idx_down <= L-2 invariant (aerosol layer strictly above the surface
    # layer, guaranteed by grids.tau_profile's z_down > 0 clamp) — the
    # tau[idx_down+1] gathers above rely on it too (ADVICE r2).
    dn_surf = dn_at(tau_star, tau_id, e0_of(tau_id), tau_id1,
                    alb_atm, zero_b) + row_b * _clamp_exp(
        (tau_star - tau_id) / mu_m[None, :])
    # µ=0⁻ surface value (att terms vanish; lambertian surf row M-1)
    p0dz = alb_atm * p0_atm[:, M - 1:M] + zero_b * p0_aer[:, M - 1:M]
    dz_surf = (p0dz * c4pi * es)[:, 0]
    if surface == "lambertian":
        ez = (_dot(ck_of(tau_star), (pm_atm[M - 1] * wg)))
        dz_surf = dz_surf + const * alb_atm[:, 0] * ez
        i1_surf = jnp.concatenate([dn_surf, dz_surf[:, None]], axis=1)
        f1_down = -jnp.sum(w_mu[:M][None, :] * i1_surf * mu[:M][None, :],
                           axis=1)
        bc = jnp.broadcast_to((2.0 * rho[:, 0] * f1_down)[:, None],
                              (B, M - 1))
    else:
        p0mz = alb_atm * p0_atm[:, M:M + 1]
        dz_surf = dz_surf + (p0mz * frs)[:, 0]
        i1_surf = jnp.concatenate([dn_surf, dz_surf[:, None]], axis=1)
        bc = rho * i1_surf[:, mirror_up]
    tiles = tiles.at[T_BC].set(pad_first(bc))

    row_c = (up_at(tau_id1, tau_star, es, tau_star, alb_atm, zero_b)
             + bc * _clamp_exp(-(tau_star - tau_id1) / mu_u[None, :]))
    row_bu = (up_at(tau_iu, tau_id1, e0_of(tau_id1), tau_id, ca_b, cr_b)
              + row_c * _clamp_exp(-(tau_id1 - tau_iu) / mu_u[None, :]))
    tiles = tiles.at[T_ROWC].set(pad_first(row_c))
    tiles = tiles.at[T_ROWBU].set(pad_first(row_bu))

    return pack_rows, tiles, colc_pk, const, astack
