"""Chandrasekhar H-function and doubling-adding slab solver (NumPy, f64).

Independent anchors for the SOS solvers — neither uses successive
orders of scattering:

- :func:`chandrasekhar_h` solves the nonlinear H integral equation for
  isotropic scattering (Chandrasekhar 1950 ch. V; van de Hulst 1980
  ch. 8) by the damped fixed-point iteration on the *inverse* form,

      1/H(µ) = sqrt(1−ω) + (ω/2) ∫₀¹ µ′ H(µ′) / (µ+µ′) dµ′ ,

  which is the numerically stable variant (the direct form diverges
  for ω→1).  Exact published identities checked in tests:
  ∫₀¹H(µ)dµ = 2 and ∫₀¹H(µ)µdµ = 2/√3 for ω=1, and the classic table
  value H(1) = 2.9078 (Chandrasekhar 1950, Table XI).

- :func:`semi_infinite_reflection` gives the emergent intensity of a
  semi-infinite isotropic atmosphere, I(0,µ;µ0) = (ω/4)·H(µ)H(µ0)/(µ+µ0)
  in the reference's VdH normalization (I·π/µ0 with F0 = 1,
  SOS_Aer_I1_In.py:58) — the τ*→∞ limit the single-layer SOS solve
  must approach.

- :func:`doubling_slab` computes reflection/transmission of a finite
  homogeneous slab by doubling (van de Hulst 1980 ch. 4; Hansen &
  Travis 1974 §5): exact single-scattering operators at τ*/2^k,
  then k doubling steps of the adding equations.  Works for any
  azimuth-averaged phase function p̄(µ,µ′) (normalized ∫p̄dµ′ = 2);
  error is O((τ*/2^k)²·2^k) — negligible at k≈30.

The reference's own VdH table files (vdh_iso.py, vdh_HG.py,
SOS_Single_layer/README.md:40-49) are absent from its snapshot, so the
published numbers cannot be ported; these anchors reproduce the same
theory they tabulate.
"""
from __future__ import annotations

import numpy as np


def gauss_mu(n: int):
    """Gauss–Legendre nodes/weights on (0, 1)."""
    x, w = np.polynomial.legendre.leggauss(n)
    return 0.5 * (x + 1.0), 0.5 * w


def chandrasekhar_h(mu, omega: float, n_quad: int = 256,
                    iters: int = 20000, tol: float = 1e-13):
    """H(µ) for isotropic scattering with single-scattering albedo ω.

    ``mu``: evaluation points in [0, 1].  Iterates the inverse-form
    equation on a Gauss grid until max|ΔH| < tol, then evaluates at µ.
    """
    mu = np.atleast_1d(np.asarray(mu, np.float64))
    g, w = gauss_mu(n_quad)
    s = np.sqrt(max(0.0, 1.0 - omega))
    h = np.ones_like(g)
    denom = g[:, None] + g[None, :]                    # (i, j) = µ_i + µ_j
    # 0.5-damped iteration: the undamped map oscillates for ω→1 (the
    # conservative case); damping restores contraction (≈40 iterations
    # to 1e-13 at ω=1, verified against H(1)=2.9078 and exact moments).
    converged = False
    for _ in range(iters):
        integ = (0.5 * omega) * ((w * g * h)[None, :] / denom).sum(axis=1)
        h_new = 0.5 * (h + 1.0 / (s + integ))
        if np.max(np.abs(h_new - h)) < tol:
            h = h_new
            converged = True
            break
        h = h_new
    if not converged:
        # this function is the external validation oracle — a silent
        # non-converged result would quietly weaken the anchor (ADVICE r2)
        raise RuntimeError(
            f"chandrasekhar_h: fixed point not converged to {tol} in "
            f"{iters} iterations (omega={omega})")
    integ_mu = (0.5 * omega) * ((w * g * h)[None, :]
                                / (mu[:, None] + g[None, :])).sum(axis=1)
    return 1.0 / (s + integ_mu)


def semi_infinite_reflection(mu, mu0: float, omega: float, **kw):
    """Emergent I(0, µ; µ0) of a semi-infinite isotropic slab,
    VdH-normalized (I·π/µ0, F0=1): (ω/4)·H(µ)H(µ0)/(µ+µ0)."""
    mu = np.atleast_1d(np.asarray(mu, np.float64))
    h = chandrasekhar_h(np.concatenate([mu, [mu0]]), omega, **kw)
    return 0.25 * omega * h[:-1] * h[-1] / (mu + mu0)


def hg_azimuth_avg(mu_out, mu_in, g: float, n_phi: int = 4096):
    """Azimuth-averaged Henyey–Greenstein p̄(µ_out, µ_in), ∫p̄dµ = 2.

    cosΘ = µ_out·µ_in + √(1−µ_out²)√(1−µ_in²)·cosφ, averaged over φ by
    midpoint quadrature (smooth periodic integrand → spectral accuracy).
    Signed µ: downward = negative.  g=0 reduces to isotropic p̄ ≡ 1.
    """
    mu_out = np.atleast_1d(np.asarray(mu_out, np.float64))
    mu_in = np.atleast_1d(np.asarray(mu_in, np.float64))
    phi = (np.arange(n_phi) + 0.5) * (2.0 * np.pi / n_phi)
    s_out = np.sqrt(np.maximum(0.0, 1.0 - mu_out**2))[:, None, None]
    s_in = np.sqrt(np.maximum(0.0, 1.0 - mu_in**2))[None, :, None]
    c = (mu_out[:, None, None] * mu_in[None, :, None]
         + s_out * s_in * np.cos(phi)[None, None, :])
    p = (1.0 - g * g) / (1.0 + g * g - 2.0 * g * c) ** 1.5
    return p.mean(axis=2)


def _single_scatter_ops(mu, w, p_refl, p_trans, omega, dtau):
    """Exact single-scattering operators/vured of a layer of depth dτ.

    Returns (R, T) linear maps on intensity vectors over the Gauss
    nodes: R[i,j] reflects incident diffuse intensity at µ_j into µ_i,
    T[i,j] transmits diffusely.  Quadrature weights folded in
    (I_out = R @ I_in).
    """
    mi, mj = mu[:, None], mu[None, :]
    r_kern = (1.0 - np.exp(-dtau * (1.0 / mi + 1.0 / mj))) / (mi + mj)
    dm = mj - mi
    safe = np.where(dm == 0.0, 1.0, dm)
    t_kern = (np.exp(-dtau / mj) - np.exp(-dtau / mi)) / safe
    t_diag = dtau / mu**2 * np.exp(-dtau / mu)
    t_kern = np.where(dm == 0.0, t_diag[None, :], t_kern)
    fold = (0.5 * omega) * (w * mu)[None, :]
    return fold * p_refl * r_kern, fold * p_trans * t_kern


def _single_scatter_beam(mu, p_refl0, p_trans0, omega, dtau, mu0):
    """Exact single-scattering beam responses ρ(µ), σ(µ) for a unit-F0
    beam at µ0 (same closed forms as SOS_Aer_I1_In.py:13-58, before the
    π/µ0 normalization)."""
    rho = (omega / (4.0 * np.pi)) * p_refl0 * (mu0 / (mu0 + mu)) * (
        1.0 - np.exp(-dtau * (1.0 / mu + 1.0 / mu0)))
    dm = mu0 - mu
    safe = np.where(np.abs(dm) < 1e-12, 1.0, dm)
    sig = (omega / (4.0 * np.pi)) * p_trans0 * mu0 / safe * (
        np.exp(-dtau / mu0) - np.exp(-dtau / mu))
    res = (omega / (4.0 * np.pi)) * p_trans0 * (dtau / mu0) * np.exp(-dtau / mu0)
    return rho, np.where(np.abs(dm) < 1e-12, res, sig)


def doubling_slab(tau_star: float, omega: float, mu0: float,
                  phase=None, g: float = 0.0, n_quad: int = 96,
                  n_double: int = 30):
    """Reflected/transmitted intensity of a finite homogeneous slab.

    ``phase``: callable p̄(µ_out, µ_in) (signed µ, ∫p̄dµ = 2); defaults
    to Henyey–Greenstein with asymmetry ``g`` (g=0 → isotropic).
    Returns a dict with the Gauss nodes and, in the reference's VdH
    normalization (I·π/µ0): ``i_up`` (reflected at top), ``i_down``
    (diffuse transmitted at bottom), plus flux integrals.
    """
    if phase is None:
        phase = lambda mo, mi: hg_azimuth_avg(mo, mi, g)
    mu, w = gauss_mu(n_quad)
    dtau = tau_star / (2.0 ** n_double)

    p_refl = phase(mu, -mu)                 # down −µ_j → up +µ_i
    p_trans = phase(-mu, -mu)               # down −µ_j → down −µ_i
    p_refl0 = phase(mu, -mu0)[:, 0]
    p_trans0 = phase(-mu, -mu0)[:, 0]

    r, t = _single_scatter_ops(mu, w, p_refl, p_trans, omega, dtau)
    rho, sig = _single_scatter_beam(mu, p_refl0, p_trans0, omega, dtau, mu0)
    e_beam = np.exp(-dtau / mu0)
    eye = np.eye(n_quad)

    for _ in range(n_double):
        t_full = t + np.diag(np.exp(-dtau / mu))     # diffuse + direct
        s = np.linalg.inv(eye - r @ r)
        d_beam = s @ (sig + e_beam * (r @ rho))
        u_beam = e_beam * rho + r @ d_beam
        rho = rho + t_full @ u_beam
        sig = t_full @ d_beam + e_beam * sig
        r, t = r + t_full @ r @ s @ t_full, t_full @ s @ t_full - np.diag(
            np.exp(-2.0 * dtau / mu))
        e_beam *= e_beam
        dtau *= 2.0

    norm = np.pi / mu0
    f_up = 2.0 * np.pi * np.sum(w * mu * rho)
    f_down_dif = 2.0 * np.pi * np.sum(w * mu * sig)
    return {
        "mu": mu, "w": w,
        "i_up": rho * norm, "i_down": sig * norm,
        "t_direct": e_beam,
        "albedo": f_up / mu0,                       # plane albedo
        "trans_diffuse": f_down_dif / mu0,
        "r_op": r, "t_op": t,
    }
