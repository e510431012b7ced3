"""Vertical grid: cumulative optical-depth profile.

TPU-native re-design of the reference τ-profile builder
(SOS_Aer_tau_profile.py:5-53): a pure function (no plotting side effects,
the reference pops a blocking matplotlib window at tau_profile.py:36),
branchless so it can be jitted and vmapped over batched scenes.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def layer_indices(z0, z_up, z_down, nb_layers: int):
    """Aerosol-layer bounding indices on the altitude grid.

    Reference: z_profile = linspace(z0, 0, L); idx = argmin|z - z_bound|
    (SOS_Aer_tau_profile.py:16-18, SOS_Aer_main_lambertian.py:39-40).
    Returns (idx_up, idx_down) as traced int32 scalars.
    """
    i = jnp.arange(nb_layers)
    # z_profile[i] = z0 * (1 - i/(L-1)); avoid building via linspace so z0
    # may be a traced scalar.
    z_profile = z0 * (1.0 - i / (nb_layers - 1))
    idx_up = jnp.argmin(jnp.abs(z_profile - z_up))
    idx_down = jnp.argmin(jnp.abs(z_profile - z_down))
    return idx_up, idx_down


def tau_profile(tau_star_atm, tau_star_aer, z0, z_up, z_down, nb_layers: int):
    """Cumulative optical depth per layer, top → bottom.

    Faithful to SOS_Aer_tau_profile.py:21-27: linear molecular τ over the
    full column plus a linear aerosol ramp inside [idx_up, idx_down] and a
    constant ``tau_star_aer`` offset below.  Branchless (jnp.where) so it is
    jit/vmap-safe with traced scene parameters.

    Invariant: with z_down > 0 (every supported scene places the aerosol
    layer above the surface), idx_down <= nb_layers - 2 — the first-order
    closed forms gather tau[idx_down + 1] and treat the surface layer as
    pure-atm region C (ops/first_order.py), which relies on this.
    """
    idx_up, idx_down = layer_indices(z0, z_up, z_down, nb_layers)
    i = jnp.arange(nb_layers)
    tau_mol = i * (tau_star_atm / (nb_layers - 1))
    dtau_aer = tau_star_aer / (idx_down + 1 - idx_up)
    aer = jnp.where(
        i < idx_up,
        0.0,
        jnp.where(i <= idx_down, (i + 1 - idx_up) * dtau_aer, tau_star_aer),
    )
    return tau_mol + aer, idx_up, idx_down


def tau_profile_np(tau_star_atm, tau_star_aer, z0, z_up, z_down, nb_layers: int):
    """NumPy twin of :func:`tau_profile` (host-side / oracle use)."""
    z_profile = np.linspace(z0, 0.0, nb_layers)
    idx_up = int(np.argmin(np.abs(z_profile - z_up)))
    idx_down = int(np.argmin(np.abs(z_profile - z_down)))
    tau = np.arange(nb_layers) * tau_star_atm / (nb_layers - 1)
    dtau_aer = tau_star_aer / (idx_down + 1 - idx_up)
    for i in range(idx_up, nb_layers):
        if i <= idx_down:
            tau[i] += (i + 1 - idx_up) * dtau_aer
        else:
            tau[i] += tau_star_aer
    return tau, idx_up, idx_down
