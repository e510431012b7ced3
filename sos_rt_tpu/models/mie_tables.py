"""Mie-based phase functions: monodisperse and log-normal polydisperse.

Monodisperse (SOS_Aer_phase_func.py:299-394): kernel = unpolarized Mie
intensity at size parameter x = 2πr/λ.  The reference's "11 minutes"
build (phase_func.py:314) deduplicated µ_diff values rounded to 1e-6 and
evaluated each once through a Python dict; here the P-matrix kernel keeps
that 1e-6 dedup (same evaluation points) but runs as one vectorized
series evaluation.

Log-normal (SOS_Aer_phase_func.py:398-753): 100-point radius grid
0.01–10 µm, log-normal n(r) (normalization constant omitted exactly as in
the reference, phase_func.py:411 — tables are re-normalized anyway),
weights n(r)·Qsca(r), master intensity table over 6001 scattering angles.
KEY REDESIGN: the radius integral commutes with the linear interpolation
the reference does per (µ,µ',φ) sample, so we pre-integrate the master
table over radius once into a single 6001-point weighted kernel table —
this collapses the reference's multiprocessing.Pool over 1002 matrix
columns (phase_func.py:569-579) into a plain table interpolation with
bit-equal semantics (both operations are linear), removing the process
pool and the Windows-path .txt cache round-trip (phase_func.py:435-543).
"""
from __future__ import annotations

import numpy as np

from sos_rt_tpu.models import miecore
from sos_rt_tpu.models.phase_common import NB_PHI, azimuth_p0, azimuth_p_matrix

N_RADII = 100           # phase_func.py:404
RADIUS_RANGE = (0.01, 10.0)  # µm, phase_func.py:405
N_DIFF_ANGLES = 6001    # phase_func.py:685


def mie(mu: np.ndarray, mu0: float, indx: complex, r: float, lambda0: float):
    """Monodisperse Mie tables; r and λ in the same unit."""
    x = 2.0 * np.pi * r / lambda0

    def kernel_exact(md):
        return miecore.i_unpolarized(indx, x, np.clip(md, -1.0, 1.0)).reshape(md.shape)

    def kernel_dedup(md):
        md_r = np.round(np.clip(md, -1.0, 1.0), 6)
        uniq, inv = np.unique(md_r, return_inverse=True)
        vals = miecore.i_unpolarized(indx, x, uniq)
        return vals[inv].reshape(md.shape)

    p0 = azimuth_p0(kernel_exact, mu, mu0)
    p = azimuth_p_matrix(kernel_dedup, mu)
    return p0, p


def lognormal_weighted_kernel_table(indx: complex, wl: float, r_m: float,
                                    sig: float):
    """Radius-integrated intensity table over the 6001-point µ_diff grid."""
    radii = np.linspace(*RADIUS_RANGE, N_RADII)
    # log-normal size distribution, constant prefactor omitted
    # (phase_func.py:409-411)
    n_r = (1.0 / radii) * np.exp(
        -((np.log(radii) - np.log(r_m)) ** 2) / (2.0 * np.log(sig) ** 2)
    )
    x_list = 2.0 * np.pi * radii / wl
    _, qsca, _, _ = miecore.efficiencies(indx, x_list)
    coef_int = n_r * qsca
    md_grid = np.linspace(-1.0, 1.0, N_DIFF_ANGLES)
    p_list = np.stack([miecore.i_unpolarized(indx, x, md_grid) for x in x_list])
    wtab = np.trapezoid(coef_int[:, None] * p_list, radii, axis=0)
    return md_grid, wtab


def log_normal_mie(mu: np.ndarray, mu0: float, wl: float, indx: complex,
                   n0: float, r_m: float, sig: float):
    """Polydisperse (log-normal) Mie tables — 'eva' / 'wildfire' aerosols.

    ``n0`` (number density) does not affect the normalized tables
    (phase_func.py:411 omits the prefactor); accepted for API parity.
    """
    md_grid, wtab = lognormal_weighted_kernel_table(indx, wl, r_m, sig)

    def kernel(md):
        return np.interp(np.clip(md, -1.0, 1.0), md_grid, wtab)

    p0 = azimuth_p0(kernel, mu, mu0, NB_PHI)
    p = azimuth_p_matrix(kernel, mu, NB_PHI)
    return p0, p
