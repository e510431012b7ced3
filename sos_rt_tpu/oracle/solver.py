"""Faithful NumPy SOS solver (the M0 oracle).

Reproduces the reference's 3-region successive-orders-of-scattering solve:

- first order I1, closed form per region:
  specular surface  → SOS_Aer_main_specular.py:104-292 (internally
  consistent driver), Lambertian surface → README.md:122-238 formula
  blocks (the snapshot's main_lambertian.py is partially specular-edited
  and its Lambertian surface term does not even broadcast,
  main_lambertian.py:275-276 — see SURVEY.md §3.2);
- source function Jn (main_lambertian.py:317-325);
- downward sweep with small-µ asymptotics and polyfit band
  (main_lambertian.py:332-387, SOS_Aer_In_limit.py:70-141);
- upward sweep with surface boundary condition and µ→0⁺ smoothing walk
  (main_lambertian.py:393-451);
- 100 ppm convergence loop (main_lambertian.py:311).

Two deliberate, documented deviations from the snapshot:

1. Lambertian diffuse reflection uses the *positive* reflected radiance
   +2ρ ∫₀¹ I↓(τ*) µ' dµ'.  The snapshot's expression
   (main_lambertian.py:399-401, README.md:215) evaluates to a negative
   upward boundary radiance for positive downward fields — a sign slip in
   an abandoned code path (the driver itself was switched to
   surface_type='specular', main_lambertian.py:46).

2. The Lambertian first-order surface integrals over µ' use the full
   upward µ grid with the removable singularity at µ'=µ replaced by its
   analytic limit (the snapshot's integrand divides by zero there).

3. The Lambertian first-order reflected-beam coefficient is the
   energy-consistent ρ e^{-τ*/µ0}/4 (reflected isotropic radiance
   I_r = 2ρ·F_beam↓ scattered through the standard (ω/4)∫P dµ' operator)
   instead of the README's 2F0ρe^{-τ*/µ0}/4π (README.md:131), which is
   2/µ0 times larger and violates flux conservation — the specular twin
   (ρF0, README.md:251) *is* conservation-consistent, and with this choice
   a conservative atmosphere (ω=1) conserves net flux to discretization
   accuracy for both surface types (verified in tests/test_oracle.py).
"""
from __future__ import annotations

import numpy as np

from sos_rt_tpu.config import (
    MU0_RESONANCE_TOL,
    MU_EXTREME_THRESHOLD,
    MU_THRESHOLD,
    MU_VERY_SMALL_THRESHOLD,
    trapz_weights,
)

__all__ = ["oracle_solve", "polyfit_band_width", "smooth_up_row"]


def polyfit_band_width(tau_ref: float, nb_angles: int) -> int:
    """µ→0⁻ extrapolation band width (main_lambertian.py:344-347)."""
    if tau_ref <= 0.0625:
        return int(0.005 * nb_angles)
    if tau_ref <= 1:
        return int(0.02 * nb_angles)
    if tau_ref < 4:
        return int(0.04 * nb_angles)
    return int(0.06 * nb_angles)


def _improved_limit_mu_down(row, mu_down, idx, i):
    """Quadratic-polyfit extrapolation to µ→0⁻ (SOS_Aer_In_limit.py:113-141)."""
    n_points = min(5, idx)
    if n_points < 2:
        slope = (row[-idx - 2] - row[-idx - 1]) / (mu_down[-idx - 2] - mu_down[-idx - 1])
        return slope * (mu_down[-i - 1] - mu_down[-idx - 1]) + row[-idx - 1]
    x = np.asarray(mu_down[-(idx + n_points):-idx], dtype=np.float64)
    y = np.asarray(row[-(idx + n_points):-idx], dtype=np.float64)
    if len(x) >= 3:
        coeffs = np.polyfit(x, y, min(2, len(x) - 1))
        return np.polyval(coeffs, float(mu_down[-i - 1]))
    slope = (y[-1] - y[0]) / (x[-1] - x[0])
    return y[0] + slope * (mu_down[-i - 1] - x[0])


def _improved_asymptotic_down(jn_slice, tau_slice, tau_t, mu):
    """Windowed/Taylor small-µ downward radiance (SOS_Aer_In_limit.py:70-109)."""
    if len(tau_slice) == 0:
        return 0.0
    if abs(mu) < MU_EXTREME_THRESHOLD or abs(mu) < MU_VERY_SMALL_THRESHOLD:
        if len(tau_slice) > 1:
            dj = (jn_slice[-1] - jn_slice[-2]) / (tau_slice[-1] - tau_slice[-2])
        else:
            dj = 0.0
        return -jn_slice[-1] + mu * dj
    significant = np.where(tau_slice >= (tau_t - 5 * abs(mu)))[0]
    if len(significant) == 0:
        return -jn_slice[-1]
    ts = tau_slice[significant]
    js = jn_slice[significant]
    integrand = js * np.exp((tau_t - ts) / mu)
    if np.any(np.isinf(integrand)) or np.any(np.isnan(integrand)):
        return -jn_slice[-1]
    return -np.trapezoid(integrand, ts) / mu


def smooth_up_row(row, mu, nb_angles):
    """µ→0⁺ second-difference smoothing walk (main_lambertian.py:405-411).

    ``row`` is one layer's full radiance row (2M,), modified in place.
    """
    m2 = len(mu)
    idx = nb_angles + 1
    while idx + 2 < m2 and abs((row[idx] - row[idx + 1]) - (row[idx + 1] - row[idx + 2])) > 0.0001:
        idx += 1
    idx += 1
    for m in range(nb_angles + 1, min(idx, m2 - 1)):
        w = mu[m] / mu[idx]
        row[m] = (1 - w) * row[nb_angles] + w * row[idx]
    return row


def _first_order(surface, tau, mu, nb_angles, mu0, f0, grd_alb, alb_atm, alb_aer,
                 p0_atm, p_atm, p0_aer, p_aer, idx_up, idx_down, w_atm, w_aer):
    """Closed-form I1 for the three regions, both sweep directions."""
    L = len(tau)
    M = nb_angles
    tau_star = tau[L - 1]
    i1 = np.zeros((L, 2 * M))
    e0 = np.exp(-tau / mu0)                       # e^{-τ_t/µ0}
    es = np.exp(-tau_star / mu0)                  # e^{-τ*/µ0}
    rho = grd_alb

    def mix(p_atm_vec, p_aer_vec):
        return alb_atm * p_atm_vec * w_atm + alb_aer * p_aer_vec * w_aer

    t_all = np.arange(L)
    in_a = t_all < idx_up
    in_b = (t_all >= idx_up) & (t_all <= idx_down)
    in_c = t_all > idx_down

    # ---------------- downward (columns 0..M-1, µ <= 0) ----------------
    m_arr = np.arange(M - 1)
    mu_m = mu[m_arr]
    res_mask = np.abs(mu_m + mu0) < MU0_RESONANCE_TOL

    with np.errstate(over="ignore", divide="ignore", invalid="ignore"):
        for region, tsel in (("A", in_a), ("B", in_b), ("C", in_c)):
            ts = t_all[tsel]
            if len(ts) == 0:
                continue
            tt = tau[ts][:, None]
            if region == "A":
                before = np.zeros((len(ts), M - 1))
                p0d, p0m = alb_atm * p0_atm[m_arr], alb_atm * p0_atm[2 * M - 1 - m_arr]
                p0d0, p0m0 = alb_atm * p0_atm[M - 1], alb_atm * p0_atm[M]
                dir_pair = e0[ts][:, None] - np.exp(tt / mu_m)
                dir_res_lin = tau[ts][:, None] / mu0
                surf_pair = (np.exp(-(tau_star - tt) / mu0)
                             - es * np.exp(tt / mu_m))
                lam_ref = tau_star  # attenuation reference for Lambertian ∫dµ'
                lam_att = None      # e^{(τ_t-τ_ref)/µ} factor (None → term e^{τ_t/µ})
            elif region == "B":
                tb = tau[idx_up - 1]
                att = np.exp((tt - tb) / mu_m)
                before = i1[idx_up - 1, m_arr][None, :] * att
                p0d = mix(p0_atm[m_arr], p0_aer[m_arr])
                p0m = mix(p0_atm[2 * M - 1 - m_arr], p0_aer[2 * M - 1 - m_arr])
                p0d0 = mix(p0_atm[M - 1], p0_aer[M - 1])
                p0m0 = mix(p0_atm[M], p0_aer[M])
                dir_pair = e0[ts][:, None] - e0[idx_up - 1] * att
                dir_res_lin = (tau[ts][:, None] - tb) / mu0
                surf_pair = (np.exp(-(tau_star - tt) / mu0)
                             - np.exp(-(tau_star - tau[idx_up]) / mu0)
                             * np.exp((tt - tau[idx_up]) / mu_m))
                lam_ref = tau[idx_up]
                lam_att = np.exp((tt - tau[idx_up]) / mu_m)
            else:
                tb = tau[idx_down]
                att = np.exp((tt - tb) / mu_m)
                before = i1[idx_down, m_arr][None, :] * att
                p0d, p0m = alb_atm * p0_atm[m_arr], alb_atm * p0_atm[2 * M - 1 - m_arr]
                p0d0, p0m0 = alb_atm * p0_atm[M - 1], alb_atm * p0_atm[M]
                dir_pair = e0[ts][:, None] - e0[idx_down] * att
                dir_res_lin = (tau[ts][:, None] - tb) / mu0
                surf_pair = (np.exp(-(tau_star - tt) / mu0)
                             - np.exp(-(tau_star - tau[idx_down + 1]) / mu0)
                             * np.exp((tt - tau[idx_down + 1]) / mu_m))
                lam_ref = tau[idx_down + 1]
                lam_att = np.exp((tt - tau[idx_down + 1]) / mu_m)

            direct = (mu0 / (mu0 + mu_m)) * p0d / (4 * np.pi) * f0 * dir_pair
            if surface == "specular":
                surf = ((mu0 / (mu0 - mu_m)) * p0m / (4 * np.pi)
                        * (f0 * rho * es) * surf_pair)
            else:
                # Lambertian: ∫₀¹ µ'/(µ'-µ) ωP(µ,-µ') (2F0ρe^{-τ*/µ0}/4π)
                #   (e^{-(τ*-τ_t)/µ'} - e^{-(τ*-τ_ref)/µ'} e^{(τ_t-τ_ref)/µ}) dµ'
                mu_p = mu[M:]                        # µ' ∈ [0, 1]
                pmat = (alb_atm * p_atm[m_arr][:, 2 * M - 1 - np.arange(M, 2 * M)]
                        if region != "B" else
                        mix(p_atm[m_arr][:, 2 * M - 1 - np.arange(M, 2 * M)],
                            p_aer[m_arr][:, 2 * M - 1 - np.arange(M, 2 * M)]))
                with np.errstate(over="ignore", divide="ignore", invalid="ignore"):
                    e_t = np.exp(-(tau_star - tt[:, :, None]) / mu_p)      # (T,1,M)
                    if lam_att is None:
                        e_ref = np.exp(-tau_star / mu_p) * np.exp(tt[:, :, None] / mu_m[None, :, None])
                    else:
                        e_ref = (np.exp(-(tau_star - lam_ref) / mu_p)
                                 * lam_att[:, :, None])
                    ratio = mu_p / (mu_p - mu_m[None, :, None])
                    integ = (ratio * pmat[None, :, :]
                             * (rho * es / 4.0)
                             * (e_t - e_ref))
                integ = np.where(mu_p[None, None, :] == 0.0, 0.0, integ)
                integ = np.nan_to_num(integ, nan=0.0, posinf=0.0, neginf=0.0)
                surf = np.trapezoid(integ, mu_p, axis=2)

            vals = before + direct + surf
            # resonance |µ+µ0| < tol: linear-in-τ direct limit
            if np.any(res_mask):
                d_res = p0d / (4 * np.pi) * f0 * e0[ts][:, None] * dir_res_lin
                vals[:, res_mask] = (before + d_res + surf)[:, res_mask]
            i1[np.ix_(ts, m_arr)] = vals

            # µ = 0⁻ column (index M-1): drop the e^{τ/µ} terms
            d0 = p0d0 / (4 * np.pi) * f0 * e0[ts]
            if surface == "specular":
                s0_ = p0m0 / (4 * np.pi) * (f0 * rho * es) * np.exp(-(tau_star - tau[ts]) / mu0)
            else:
                pmat0 = (alb_atm * p_atm[M - 1, 2 * M - 1 - np.arange(M, 2 * M)]
                         if region != "B" else
                         mix(p_atm[M - 1, 2 * M - 1 - np.arange(M, 2 * M)],
                             p_aer[M - 1, 2 * M - 1 - np.arange(M, 2 * M)]))
                mu_p = mu[M:]
                with np.errstate(divide="ignore", invalid="ignore"):
                    e_t = np.exp(-(tau_star - tau[ts][:, None]) / mu_p)
                    integ0 = (pmat0[None, :] * (rho * es / 4.0) * e_t)
                integ0 = np.where(mu_p[None, :] == 0.0, 0.0, integ0)
                integ0 = np.nan_to_num(integ0, nan=0.0)
                s0_ = np.trapezoid(integ0, mu_p, axis=1)
            i1[ts, M - 1] = d0 + s0_

    # ---------------- upward (columns M..2M-1, µ >= 0) ----------------
    m_arr = np.arange(M + 1, 2 * M)
    mu_m = mu[m_arr]
    res_mask = np.abs(mu_m - mu0) < MU0_RESONANCE_TOL
    mirror = 2 * M - 1 - m_arr                      # −µ indices

    # Lambertian diffuse BC from the *downward* first-order field at τ*:
    # +2ρ ∫₀¹ I1↓(τ*) µ' dµ' (deviation 1 in the module docstring).
    if surface == "lambertian":
        f1_down = -np.trapezoid(i1[L - 1, :M] * mu[:M], mu[:M])
        bc_lam = 2.0 * rho * f1_down

    with np.errstate(over="ignore", divide="ignore", invalid="ignore"):
        for region, tsel in (("C", in_c), ("B", in_b), ("A", in_a)):
            ts = t_all[tsel]
            if len(ts) == 0:
                continue
            tt = tau[ts][:, None]
            if region == "C":
                if surface == "specular":
                    before = (rho * i1[L - 1, mirror][None, :]
                              * np.exp(-(tau[L - 1] - tt) / mu_m))
                else:
                    before = bc_lam * np.exp(-(tau_star - tt) / mu_m)
                p0d = alb_atm * p0_atm[m_arr]
                p0m = alb_atm * p0_atm[mirror]
                p0d0, p0m0 = alb_atm * p0_atm[M], alb_atm * p0_atm[M - 1]
                dir_pair = (e0[ts][:, None]
                            - e0[L - 1] * np.exp(-(tau[L - 1] - tt) / mu_m))
                dir_res_pair = dir_pair
                surf_pair = (np.exp(-(tau_star - tt) / mu0)
                             - np.exp(-(tau_star - tt) / mu_m))
                surf_res_lin = (tau_star - tau[ts][:, None]) / mu0
                lam_ref = tau_star
                lam_att = np.exp(-(tau_star - tt) / mu_m)
            elif region == "B":
                before = (i1[idx_down + 1, m_arr][None, :]
                          * np.exp(-(tau[idx_down + 1] - tt) / mu_m))
                p0d = mix(p0_atm[m_arr], p0_aer[m_arr])
                p0m = mix(p0_atm[mirror], p0_aer[mirror])
                p0d0 = mix(p0_atm[M], p0_aer[M])
                p0m0 = mix(p0_atm[M - 1], p0_aer[M - 1])
                dir_pair = (e0[ts][:, None]
                            - e0[idx_down + 1] * np.exp(-(tau[idx_down + 1] - tt) / mu_m))
                dir_res_pair = dir_pair
                surf_pair = (np.exp(-(tau_star - tt) / mu0)
                             - np.exp(-(tau_star - tau[idx_down]) / mu0)
                             * np.exp(-(tau[idx_down] - tt) / mu_m))
                surf_res_lin = (tau[idx_down] - tau[ts][:, None]) / mu0
                lam_ref = tau[idx_down]
                lam_att = np.exp(-(tau[idx_down] - tt) / mu_m)
            else:
                before = (i1[idx_up, m_arr][None, :]
                          * np.exp(-(tau[idx_up] - tt) / mu_m))
                p0d = alb_atm * p0_atm[m_arr]
                p0m = alb_atm * p0_atm[mirror]
                p0d0, p0m0 = alb_atm * p0_atm[M], alb_atm * p0_atm[M - 1]
                dir_pair = (e0[ts][:, None]
                            - e0[idx_up] * np.exp(-(tau[idx_up] - tt) / mu_m))
                dir_res_pair = dir_pair
                surf_pair = (np.exp(-(tau_star - tt) / mu0)
                             - np.exp(-(tau_star - tau[idx_up - 1]) / mu0)
                             * np.exp(-(tau[idx_up - 1] - tt) / mu_m))
                surf_res_lin = (tau[idx_up - 1] - tau[ts][:, None]) / mu0
                lam_ref = tau[idx_up - 1]
                lam_att = np.exp(-(tau[idx_up - 1] - tt) / mu_m)

            direct = (mu0 / (mu0 + mu_m)) * p0d / (4 * np.pi) * f0 * dir_pair
            if surface == "specular":
                surf = ((mu0 / (mu0 - mu_m)) * p0m / (4 * np.pi)
                        * (f0 * rho * es) * surf_pair)
                surf_res = (p0m / (4 * np.pi) * (f0 * rho * es)
                            * np.exp(-(tau_star - tau[ts][:, None]) / mu0)
                            * surf_res_lin)
            else:
                mu_p = mu[M:]
                pm_cols = 2 * M - 1 - np.arange(M, 2 * M)
                pmat = (alb_atm * p_atm[m_arr][:, pm_cols]
                        if region != "B" else
                        mix(p_atm[m_arr][:, pm_cols], p_aer[m_arr][:, pm_cols]))
                with np.errstate(over="ignore", divide="ignore", invalid="ignore"):
                    e_t = np.exp(-(tau_star - tt[:, :, None]) / mu_p)
                    e_ref = (np.exp(-(tau_star - lam_ref) / mu_p)
                             * lam_att[:, :, None])
                    ratio = mu_p / (mu_p - mu_m[None, :, None])
                    integ = (ratio * pmat[None, :, :]
                             * (rho * es / 4.0)
                             * (e_t - e_ref))
                # µ' = 0 endpoint → 0; µ' = µ removable singularity → limit
                integ = np.where(mu_p[None, None, :] == 0.0, 0.0, integ)
                sing = np.isclose(mu_p[None, None, :], mu_m[None, :, None],
                                  rtol=0.0, atol=1e-14)
                lim = ((1.0 / mu_m[None, :, None])
                       * np.exp(-(tau_star - tt[:, :, None]) / mu_m[None, :, None])
                       * (lam_ref - tt[:, :, None])
                       * pmat[None, :, :] * (rho * es / 4.0))
                integ = np.where(sing, lim, integ)
                integ = np.nan_to_num(integ, nan=0.0, posinf=0.0, neginf=0.0)
                surf = np.trapezoid(integ, mu_p, axis=2)
                surf_res = None

            vals = before + direct + surf
            if surface == "specular" and np.any(res_mask):
                vals[:, res_mask] = (before + direct + surf_res)[:, res_mask]
            i1[np.ix_(ts, m_arr)] = vals

            # µ = 0⁺ column (index M): before = 0, drop e^{-Δ/µ} terms
            d0 = (mu0 / (mu0 + mu[M])) * p0d0 / (4 * np.pi) * f0 * e0[ts]
            if surface == "specular":
                s0_ = (p0m0 / (4 * np.pi) * (f0 * rho * es)
                       * np.exp(-(tau_star - tau[ts]) / mu0))
            else:
                pmat0 = (alb_atm * p_atm[M, pm_cols] if region != "B"
                         else mix(p_atm[M, pm_cols], p_aer[M, pm_cols]))
                with np.errstate(divide="ignore", invalid="ignore"):
                    e_t = np.exp(-(tau_star - tau[ts][:, None]) / mu[M:])
                    integ0 = pmat0[None, :] * (rho * es / 4.0) * e_t
                integ0 = np.where(mu[M:][None, :] == 0.0, 0.0, integ0)
                integ0 = np.nan_to_num(integ0, nan=0.0)
                s0_ = np.trapezoid(integ0, mu[M:], axis=1)
            i1[ts, M] = d0 + s0_

    return i1


def _source_function(in_prev, a_atm, a_aer, w_atm, w_aer, idx_up, idx_down):
    """Jn for every layer (main_lambertian.py:317-325) as two matmuls.

    ``a_*[k, m] = (ω/4)·w_k·P(m, 2M-1-k)`` are the trapz-weighted flipped
    phase operators, so  Jn = In_1 @ a  — identical values to the
    reference's per-layer ``np.trapz(P[:,::-1]*In_1[t,:], mu, axis=1)``.
    """
    jn_atm = in_prev @ a_atm
    jn_aer = in_prev @ a_aer
    L = in_prev.shape[0]
    t = np.arange(L)
    in_layer = ((t >= idx_up) & (t <= idx_down))[:, None]
    return np.where(in_layer, w_atm * jn_atm + w_aer * jn_aer, jn_atm)


def _down_sweep(jn, tau, mu, nb_angles, idx_up, idx_down):
    """Downward sweep for one order (main_lambertian.py:328-387)."""
    L = len(tau)
    M = nb_angles
    out = np.zeros((L, 2 * M))
    # (region start for the standard cumulative trapz, region start for the
    # asymptotic slice, polyfit-band reference τ) per region
    regions = [
        (range(0, idx_up), 0, 0, tau[idx_up - 1], False),
        (range(idx_up, idx_down + 1), idx_up - 1, idx_up, tau[idx_down], True),
        (range(idx_down + 1, L), idx_down, idx_down + 1, tau[idx_down], True),
    ]
    with np.errstate(over="ignore", divide="ignore", invalid="ignore"):
        for trange, s_std, s_asym, tau_ref, has_boundary in regions:
            band = polyfit_band_width(tau_ref, M)
            for t in trange:
                for m in range(M - 1):
                    if abs(mu[m]) < MU_THRESHOLD:
                        out[t, m] = _improved_asymptotic_down(
                            jn[s_asym:t + 1, m], tau[s_asym:t + 1], tau[t], mu[m])
                    else:
                        sl = slice(s_std, t + 1)
                        integrand = jn[sl, m] * np.exp((tau[t] - tau[sl]) / mu[m])
                        val = -np.trapezoid(integrand, tau[sl]) / mu[m]
                        if has_boundary:
                            val += out[s_std, m] * np.exp((tau[t] - tau[s_std]) / mu[m])
                        out[t, m] = val
                for i in range(band):
                    out[t, M - 1 - i] = _improved_limit_mu_down(out[t, :M], mu[:M], band, i)
    return out


def _up_sweep(surface, jn, in_down_surface_row, tau, mu, nb_angles,
              idx_up, idx_down, grd_alb):
    """Upward sweep for one order (main_lambertian.py:390-451).

    ``in_down_surface_row`` is this order's downward radiance at the
    surface, In(τ*, µ<0) — the upward boundary condition reflects it.
    """
    L = len(tau)
    M = nb_angles
    out = np.zeros((L, 2 * M))
    m_arr = np.arange(M + 1, 2 * M)
    mu_m = mu[m_arr]
    mirror = 2 * M - 1 - m_arr
    thick = tau[L - 1] / mu[M + 1] >= 50           # main_lambertian.py:398

    if surface == "lambertian":
        # +2ρ ∫₀¹ In↓(τ*) µ' dµ' (sign-corrected; see module docstring)
        f_down = -np.trapezoid(in_down_surface_row[:M] * mu[:M], mu[:M])
        bc = np.full(M - 1, 2.0 * grd_alb * f_down)
    else:
        bc = grd_alb * in_down_surface_row[mirror]

    regions = [
        (range(L - 1, idx_down, -1), L - 1, None),
        (range(idx_down, idx_up - 1, -1), idx_down + 1, idx_down + 1),
        (range(idx_up - 1, -1, -1), idx_up, idx_up),
    ]
    with np.errstate(over="ignore", divide="ignore", invalid="ignore"):
        for trange, end, bnd in regions:
            for t in trange:
                if bnd is None:
                    boundary = bc * np.exp(-(tau[L - 1] - tau[t]) / mu_m)
                    sl = slice(t, L)
                else:
                    boundary = out[bnd, m_arr] * np.exp(-(tau[bnd] - tau[t]) / mu_m)
                    sl = slice(t, end)
                tau_sl = tau[sl]
                if len(tau_sl) >= 2:
                    exp_term = np.exp(-(tau_sl[:, None] - tau[t]) / mu_m)
                    if thick:
                        quad = np.trapezoid(jn[sl, M + 1:] * (exp_term / mu_m),
                                            tau_sl, axis=0)
                    else:
                        quad = np.trapezoid(jn[sl, M + 1:] * exp_term,
                                            tau_sl, axis=0) / mu_m
                else:
                    quad = np.zeros(M - 1)
                out[t, m_arr] = boundary + quad
                out[t, M] = jn[t, M]               # µ = 0⁺
                smooth_up_row(out[t], mu, M)
    return out


def oracle_solve(*, surface, tau_star_atm, tau_star_aer, z0, z_up, z_down,
                 nb_layers, nb_angles, mu0, grd_alb, alb_atm, alb_aer,
                 p0_atm, p_atm, p0_aer, p_aer,
                 tol=1e-4, max_orders=1000, save_orders=False, mu=None):
    """Full SOS solve to the 100 ppm criterion (main_lambertian.py:303-460).

    Returns dict with I, I1, n_orders, tau, idx_up, idx_down, mu
    (and I_per_order when ``save_orders``).  ``mu`` overrides the
    reference's uniform grid (main_lambertian.py:59-61) with any 2M
    layout keeping the duplicated 0 at M-1/M — used to validate the
    Gauss–Legendre grid option; every internal stage is node-agnostic.
    """
    from sos_rt_tpu.grids import tau_profile_np

    tau, idx_up, idx_down = tau_profile_np(
        tau_star_atm, tau_star_aer, z0, z_up, z_down, nb_layers)
    L, M = nb_layers, nb_angles
    if mu is None:
        mu = np.concatenate([np.linspace(-1.0, 0.0, M),
                             np.linspace(0.0, 1.0, M)])
    mu = np.asarray(mu, np.float64)
    f0 = np.pi / mu0                       # VdH convention (main_lambertian.py:105)
    # Mixing weights — NOTE the reference defines dtau_atm = τ*_atm/nb_layers
    # (main_lambertian.py:53), not the actual grid spacing τ*_atm/(L-1).
    dtau_aer = tau_star_aer / (idx_down + 1 - idx_up)
    dtau_atm = tau_star_atm / nb_layers
    w_atm = dtau_atm / (dtau_atm + dtau_aer)
    w_aer = dtau_aer / (dtau_atm + dtau_aer)

    i1 = _first_order(surface, tau, mu, M, mu0, f0, grd_alb, alb_atm, alb_aer,
                      p0_atm, p_atm, p0_aer, p_aer, idx_up, idx_down,
                      w_atm, w_aer)

    # trapz-weighted flipped-P source operators
    w = trapz_weights(mu)
    a_atm = (alb_atm / 4.0) * (w[:, None] * p_atm[:, ::-1].T)
    a_aer = (alb_aer / 4.0) * (w[:, None] * p_aer[:, ::-1].T)

    in_prev = i1
    i_tot = i1.copy()
    per_order = [i1.copy()] if save_orders else None
    in_cur = np.ones((L, 2 * M))
    n = 1
    while _ratio(in_cur, i_tot, L, M) >= tol and n < max_orders:
        n += 1
        jn = _source_function(in_prev, a_atm, a_aer, w_atm, w_aer, idx_up, idx_down)
        down = _down_sweep(jn, tau, mu, M, idx_up, idx_down)
        up = _up_sweep(surface, jn, down[L - 1], tau, mu, M,
                       idx_up, idx_down, grd_alb)
        in_cur = down + up                 # disjoint column ranges
        in_prev = in_cur
        i_tot = i_tot + in_cur
        if save_orders:
            per_order.append(in_cur.copy())

    out = {
        "I": i_tot, "I1": i1, "n_orders": n, "tau": tau, "mu": mu,
        "idx_up": idx_up, "idx_down": idx_down,
    }
    if save_orders:
        out["I_per_order"] = per_order
    return out


def _ratio(in_cur, i_tot, L, M):
    """Convergence criterion (main_lambertian.py:311): TOA-up / surface-down."""
    with np.errstate(divide="ignore", invalid="ignore"):
        r_toa = np.max(in_cur[0, M:] / i_tot[0, M:])
        r_srf = np.max(in_cur[L - 1, :M] / i_tot[L - 1, :M])
    return max(r_toa, r_srf)
