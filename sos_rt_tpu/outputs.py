"""Derived physical outputs: fluxes, diffusivity, heating rate.

Pure jnp reductions over the radiance field (no plotting side effects —
the reference couples these to matplotlib with hardcoded Windows save
paths, SOS_Aer_graphe.py:23,54,106,143,175).

The reference uses THREE different direct-beam scalings in its flux
outputs (a documented quirk, SURVEY.md §7):
- ``graphe_flux`` / ``graphe_flux_up_down``: beam term F0·e^{-τ/µ0}
  (graphe.py:41, 157-158);
- ``graphe_heating_rate`` and the critical-albedo driver:
  (F0/4π)·e^{-τ/µ0} (graphe.py:77-78, critical_albedo.py:380-381);
- the conservation-consistent scale in this field convention is
  (µ0F0/2π)·e^{-τ/µ0} = ½e^{-τ/µ0} (equal to F0/4π only at µ0=0.5) —
  exposed as ``beam="physical"`` and used by the energy-conservation
  tests.

All functions accept batched fields via leading axes (vmap-compatible).
"""
from __future__ import annotations

import jax.numpy as jnp

from sos_rt_tpu.config import MATMUL_PRECISION

RHO_AIR = 1.225   # kg m^-3 (graphe.py:71)
C_P = 1004.0      # J kg^-1 K^-1 (graphe.py:72)

_BEAM_SCALES = ("graphe", "heating", "physical")


def _beam_scale(beam, f0, mu0):
    if beam == "graphe":
        return f0
    if beam == "heating":
        return f0 / (4.0 * jnp.pi)
    if beam == "physical":
        return mu0 * f0 / (2.0 * jnp.pi)
    raise ValueError(f"beam must be one of {_BEAM_SCALES}")


def diffusivity(i_field, mu, w_mu):
    """Mean diffusivity µ̄(z) = −∫Iµdµ / ∫Idµ (graphe.py:6-29)."""
    num = jnp.einsum("...m,m,m->...", i_field, mu, w_mu, precision=MATMUL_PRECISION)
    den = jnp.einsum("...m,m->...", i_field, w_mu, precision=MATMUL_PRECISION)
    return -num / den


def flux_up_down(i_field, mu, w_mu, tau, mu0, grd_alb, nb_angles,
                 beam: str = "graphe"):
    """(flux_up, flux_down) profiles (graphe.py:152-181 with beam='graphe';
    graphe.py:68-78 / critical_albedo.py:380-381 with beam='heating').

    i_field: (..., L, 2M); returns two (..., L) arrays.
    """
    m = nb_angles
    f0 = jnp.pi / mu0
    scale = _beam_scale(beam, f0, mu0)
    tau_star = tau[..., -1:]
    down_diff = jnp.einsum("...tm,m,m->...t", i_field[..., :m], mu[:m], w_mu[:m], precision=MATMUL_PRECISION)
    up_diff = jnp.einsum("...tm,m,m->...t", i_field[..., m:], mu[m:], w_mu[m:], precision=MATMUL_PRECISION)
    flux_down = down_diff - scale * jnp.exp(-tau / mu0)
    flux_up = up_diff + grd_alb * scale * jnp.exp(-(2 * tau_star - tau) / mu0)
    return flux_up, flux_down


def net_flux(i_field, mu, w_mu, tau, mu0, grd_alb, beam: str = "graphe"):
    """Net flux profile (graphe.py:37-60 convention with beam='graphe')."""
    f0 = jnp.pi / mu0
    scale = _beam_scale(beam, f0, mu0)
    tau_star = tau[..., -1:]
    diff = jnp.einsum("...tm,m,m->...t", i_field, mu, w_mu, precision=MATMUL_PRECISION)
    return (diff - scale * jnp.exp(-tau / mu0)
            + grd_alb * scale * jnp.exp(-(2 * tau_star - tau) / mu0))


def heating_rate(i_field, mu, w_mu, tau, z_profile, mu0, grd_alb, nb_angles,
                 idx_up, idx_down, erase_pics: bool = True):
    """Heating-rate profile −(1/ρc_p)·dF/dz (graphe.py:68-112).

    Reproduces the boundary-spike erasure at the aerosol-layer edges
    (graphe.py:88-91) behind ``erase_pics``.
    """
    fu, fd = flux_up_down(i_field, mu, w_mu, tau, mu0, grd_alb, nb_angles,
                          beam="heating")
    flux = fu + fd
    dz = z_profile[1:] - z_profile[:-1]
    hr_body = -(flux[..., 1:] - flux[..., :-1]) / (RHO_AIR * C_P * dz)
    hr = jnp.concatenate([hr_body, hr_body[..., -1:]], axis=-1)
    if erase_pics:
        t = jnp.arange(hr.shape[-1])
        prev = jnp.where((t == idx_up - 1) | (t == idx_down), t - 1, t)
        hr = jnp.take(hr, prev, axis=-1)
    return hr


def toa_net_flux(i_field, mu, w_mu, tau, mu0, grd_alb, nb_angles):
    """−flux_down(0) − flux_up(0), as the critical-albedo driver defines
    the TOA net flux (critical_albedo.py:377-382)."""
    fu, fd = flux_up_down(i_field, mu, w_mu, tau, mu0, grd_alb, nb_angles,
                          beam="heating")
    return -fd[..., 0] - fu[..., 0]


def per_order_diffusivity(i_orders, mu, w_mu):
    """µ̄(z) per scattering order (graphe.py:118-149).

    i_orders: (N, L, 2M) stacked per-order fields.
    """
    return diffusivity(i_orders, mu, w_mu)
