"""Scan-based radiance sweeps with static-shape small-µ stabilization.

TPU-native re-design of the reference's O(L²·M) per-layer trapezoid
integrals (SOS_Aer_main_lambertian.py:328-451):

The reference recomputes, for every layer t, a cumulative trapezoid from
the region boundary.  Because trapz is additive over subintervals, the
whole 3-region downward sweep telescopes into ONE continuous affine
recurrence over layers,

    S_t = a_t S_{t-1} + b_t,   a_t = e^{Δτ_t/µ},
    b_t = (Δτ_t/2)(J_{t-1} a_t + J_t),     I_t = -S_t/µ,

(and mirrored for the upward sweep, where the reference drops the local
quadrature at the two region joins — b=0 there).  This runs as a
`lax.associative_scan` over τ — O(L) work, O(log L) depth — instead of
O(L²), and is bit-equivalent to the reference's quadrature up to
floating-point reassociation.

Reference fidelity notes (SURVEY.md §7 "hard parts"):
- the µ→0⁻ polyfit band (SOS_Aer_In_limit.py:113-141) has only FOUR
  possible static widths (main_lambertian.py:344-347), so the np.polyfit
  stencils are precomputed host-side per width and selected by traced
  τ-thresholds;
- the windowed small-µ asymptotic integral (In_limit.py:70-109) is a
  masked quadrature over the static set of |µ|<0.01 columns;
- the µ→0⁺ smoothing walk (main_lambertian.py:405-411) becomes a
  first-index reduction + gather per row;
- the upward sweep chains *smoothed* boundary rows at the two region
  joins; we compute the raw scan and add the boundary smoothing deltas
  attenuated by e^{-(τ_b-τ_t)/µ} (exactly equivalent).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sos_rt_tpu.config import (MATMUL_PRECISION, MU_THRESHOLD,
                               MU_VERY_SMALL_THRESHOLD)

SMOOTH_TOL = 1e-4   # second-difference walk threshold (main_lambertian.py:406)
EXP_CLAMP = -80.0   # clamp for masked-out exponents


# --------------------------------------------------------------------------
# Host-side static stencils
# --------------------------------------------------------------------------

def _band_variants(nb_angles: int) -> Tuple[int, ...]:
    """The four possible polyfit band widths (main_lambertian.py:344-347)."""
    m = nb_angles
    return (int(0.005 * m), int(0.02 * m), int(0.04 * m), int(0.06 * m))


def _polyfit_stencil(mu_down: np.ndarray, band: int):
    """Linear map replicating _improved_limit_mu_down for a static band.

    Returns (src_cols, W) with  poly[i] = Σ_j W[i, j]·row[src_cols[j]]
    for targets i = 0..band-1 (target column = M-1-i).  Mirrors
    SOS_Aer_In_limit.py:113-141 (n_points and degree rules) by probing
    np.polyfit with unit vectors — extrapolation is a linear map.
    """
    m = len(mu_down)
    if band == 0:
        return np.zeros(0, dtype=np.int64), np.zeros((0, 0))
    n_points = min(5, band)
    if n_points < 2:
        src = np.array([m - band - 2, m - band - 1], dtype=np.int64)
        w = np.zeros((band, 2))
        x0, x1 = mu_down[m - band - 2], mu_down[m - band - 1]
        for i in range(band):
            s = (mu_down[m - i - 1] - x1) / (x0 - x1)
            w[i] = [s, 1.0 - s]
        return src, w
    src = np.arange(m - band - n_points, m - band, dtype=np.int64)
    x = mu_down[src]
    w = np.zeros((band, n_points))
    if n_points >= 3:
        deg = min(2, n_points - 1)
        for j in range(n_points):
            e = np.zeros(n_points)
            e[j] = 1.0
            coeffs = np.polyfit(x, e, deg)
            for i in range(band):
                w[i, j] = np.polyval(coeffs, float(mu_down[m - i - 1]))
    else:  # n_points == 2 → linear interpolation branch
        for i in range(band):
            f = (mu_down[m - i - 1] - x[0]) / (x[-1] - x[0])
            w[i] = [1.0 - f, f]
    return src, w


@dataclasses.dataclass(frozen=True)
class SweepStencils:
    """Static per-grid data for the sweeps (host-built numpy)."""

    nb_angles: int
    band_max: int
    bands: Tuple[int, ...]
    poly_w: np.ndarray            # (4, band_max, 6) padded stencil weights
    poly_src: np.ndarray          # (4, 6) source columns
    poly_mask: np.ndarray         # (4, band_max) valid targets
    small_cols: np.ndarray        # downward columns with |µ|<0.01 (static)
    taylor_mask: np.ndarray       # of small_cols: |µ|<0.001 → Taylor limit


import functools


@functools.lru_cache(maxsize=64)
def stencils_for(grid) -> SweepStencils:
    """Per-grid cached stencils (build_stencils costs ~ms of host work —
    measurable when an eager caller pays it per solve_batch dispatch)."""
    return build_stencils(grid.mu(), grid.nb_angles)


def build_stencils(mu: np.ndarray, nb_angles: int) -> SweepStencils:
    m = nb_angles
    mu_down = np.asarray(mu[:m], dtype=np.float64)
    bands = _band_variants(m)
    band_max = max(max(bands), 1)
    poly_w = np.zeros((4, band_max, 6))
    poly_src = np.zeros((4, 6), dtype=np.int64)
    poly_mask = np.zeros((4, band_max), dtype=bool)
    for c, b in enumerate(bands):
        src, w = _polyfit_stencil(mu_down, b)
        if b:
            poly_src[c, :len(src)] = src
            poly_w[c, :b, :w.shape[1]] = w
            poly_mask[c, :b] = True
    small = np.array([k for k in range(m - 1) if abs(mu_down[k]) < MU_THRESHOLD],
                     dtype=np.int64)
    taylor = np.array([abs(mu_down[k]) < MU_VERY_SMALL_THRESHOLD for k in small],
                      dtype=bool)
    return SweepStencils(nb_angles=m, band_max=band_max, bands=bands,
                         poly_w=poly_w, poly_src=poly_src, poly_mask=poly_mask,
                         small_cols=small, taylor_mask=taylor)


def band_choice(tau_ref):
    """Traced index into the four band widths (main_lambertian.py:344-347)."""
    return jnp.where(tau_ref <= 0.0625, 0,
                     jnp.where(tau_ref <= 1.0, 1,
                               jnp.where(tau_ref < 4.0, 2, 3)))


# --------------------------------------------------------------------------
# Affine scans
# --------------------------------------------------------------------------

def _affine_scan(a, b, reverse: bool = False, method: str = "associative"):
    """I_t = a_t·I_{t-1} + b_t from I_{-1}=0 (or the reversed recurrence).

    method='associative': O(log L) depth — best for a single column.
    method='sequential':  L steps of (batch, M) work — lower HBM traffic
    when the batch axis is large (vmap turns each step into a wide op).
    """
    if method == "sequential":
        def step(carry, ab):
            a_t, b_t = ab
            new = a_t * carry + b_t
            return new, new

        _, ys = jax.lax.scan(step, jnp.zeros_like(b[0]), (a, b),
                             reverse=reverse)
        return ys

    def combine(left, right):
        al, bl = left
        ar, br = right
        return al * ar, bl * ar + br

    return jax.lax.associative_scan(combine, (a, b), axis=0, reverse=reverse)[1]


def down_sweep_scan(jn_down, tau, mu_down, method: str = "associative"):
    """Downward field for all µ≤0 columns via one forward affine scan.

    Telescopes the reference's cumulative trapz + region boundary chaining
    (main_lambertian.py:332-387) exactly; the µ=0 column is garbage here
    and replaced downstream by the polyfit band.
    """
    dtau = jnp.diff(tau)
    safe_mu = jnp.where(mu_down == 0, -1.0, mu_down)
    att = jnp.exp(dtau[:, None] / safe_mu[None, :])
    n = mu_down.shape[0]
    a = jnp.concatenate([jnp.ones((1, n), att.dtype), att])
    b = jnp.concatenate([jnp.zeros((1, n), att.dtype),
                         0.5 * dtau[:, None] * (jn_down[:-1] * att + jn_down[1:])])
    s = _affine_scan(a, b, method=method)
    return -s / safe_mu[None, :]


def up_sweep_scan(jn_up, tau, mu_up, boundary, idx_up, idx_down,
                  method: str = "associative"):
    """Raw upward field (µ>0, excluding µ=0) via one reverse affine scan.

    I_t = e^{-Δτ_{t+1}/µ} I_{t+1} + c_t, with c zeroed at the two region
    joins t ∈ {idx_down, idx_up-1}: the reference's aerosol-region
    integral stops at τ_{idx_down} while its boundary value sits at
    τ_{idx_down+1} (main_lambertian.py:415-421; mirrored at the top join
    l.435-441), so those interval quadratures are dropped.
    ``boundary`` is I(τ_{L-1}, µ) — the surface BC term.
    """
    L = tau.shape[0]
    dtau = jnp.diff(tau)
    att = jnp.exp(-dtau[:, None] / mu_up[None, :])
    c = 0.5 * dtau[:, None] / mu_up[None, :] * (jn_up[:-1] + jn_up[1:] * att)
    t = jnp.arange(L - 1)
    join = (t == idx_down) | (t == idx_up - 1)
    c = jnp.where(join[:, None], 0.0, c)
    a = jnp.concatenate([att, jnp.ones((1, mu_up.shape[0]), att.dtype)])
    b = jnp.concatenate([c, boundary[None, :]])
    return _affine_scan(a, b, reverse=True, method=method)


# --------------------------------------------------------------------------
# Small-µ downward asymptotics (|µ| < MU_THRESHOLD)
# --------------------------------------------------------------------------

def down_small_mu(jn_small, raw_small, tau, mu_small, taylor_mask,
                  idx_up, idx_down):
    """Windowed/Taylor downward radiance for the static small-µ columns.

    Replicates improved_asymptotic_downward_radiance
    (SOS_Aer_In_limit.py:70-109) with the region-dependent slice starts
    the drivers use (main_lambertian.py:336/355/374: 0, idx_up,
    idx_down+1): trapezoid over the contiguous suffix of layers with
    τ_j ≥ τ_t − 5|µ|, inside the region slice.

    KEY IDENTITY: the windowed trapezoid is a prefix difference of the
    full telescoped integral the standard scan already computed —
        I_window(t) = raw(t) − e^{(τ_t−τ_{k0})/µ} · raw(k0),
    where k0 = max(region start, first layer with τ ≥ τ_t − 5|µ|) —
    so this costs O(L·S) gathers instead of an O(L²·S) masked quadrature.

    jn_small: (L, S) sources; raw_small: (L, S) standard-scan field at
    the same columns; mu_small: (S,).
    """
    L = tau.shape[0]
    t_idx = jnp.arange(L)
    region_start = jnp.where(t_idx < idx_up, 0,
                             jnp.where(t_idx <= idx_down, idx_up, idx_down + 1))
    cutoff = tau[:, None] - 5.0 * jnp.abs(mu_small)[None, :]       # (L, S)
    first = jnp.searchsorted(tau, cutoff.T, side="left").T          # (L, S)
    k0 = jnp.maximum(first, region_start[:, None])
    k0 = jnp.minimum(k0, t_idx[:, None])
    tau_k0 = jnp.take_along_axis(
        jnp.broadcast_to(tau[:, None], (L, mu_small.shape[0])), k0, axis=0)
    att = jnp.exp(jnp.clip((tau[:, None] - tau_k0) / mu_small[None, :],
                           EXP_CLAMP, 0.0))
    raw_k0 = jnp.take_along_axis(raw_small, k0, axis=0)
    windowed = raw_small - att * raw_k0

    # Taylor limit for |µ| < 0.001: I ≈ -J + µ dJ/dτ (In_limit.py:79-93)
    prev = jnp.clip(t_idx - 1, 0, L - 1)
    dj = jnp.where(
        (t_idx > region_start)[:, None],
        (jn_small - jn_small[prev]) / jnp.where(
            t_idx[:, None] > 0, (tau - tau[prev])[:, None], 1.0),
        0.0)
    taylor = -jn_small + mu_small[None, :] * dj
    return jnp.where(taylor_mask[None, :], taylor, windowed)


# --------------------------------------------------------------------------
# µ→0⁻ polyfit band and µ→0⁺ smoothing
# --------------------------------------------------------------------------

def polyfit_band_variants(i_down, stencils: SweepStencils):
    """Extrapolated band values for ALL four static band widths.

    Returns (polys (4, L, band_max), valids (4, band_max)).  Each variant
    uses *static* source columns, so no dynamic gathers reach the TPU;
    the caller selects by the traced band choice with cheap wheres.
    """
    polys, valids = [], []
    for c in range(4):
        src = jnp.asarray(stencils.poly_src[c])              # static cols
        w = jnp.asarray(stencils.poly_w[c], i_down.dtype)    # (band_max, 6)
        polys.append(jnp.dot(i_down[:, src], w.T,
                             precision=MATMUL_PRECISION))
        valids.append(jnp.asarray(stencils.poly_mask[c]))
    return jnp.stack(polys), jnp.stack(valids)


def select_band_choice(stacked, choice):
    """stacked[choice] for a traced choice ∈ {0..3}, gather-free."""
    out = stacked[0]
    for c in range(1, 4):
        out = jnp.where(choice == c, stacked[c], out)
    return out


def smooth_up_rows(i_up_rows, mu, nb_angles):
    """Vectorized µ→0⁺ smoothing walk (main_lambertian.py:405-411).

    i_up_rows: (L, 2M) full rows (only columns ≥ M are touched).
    For each row: find the first m ≥ M+1 whose second difference is
    ≤ 1e-4, set idx = m+1, and linearly blend columns (M, idx) between
    I[M] and I[idx] with weight µ/µ_idx.

    Per-row dynamic indexing is done with one-hot reductions over the
    angle axis instead of gathers (lane-axis take_along_axis serializes
    on TPU and dominated the order step before this).
    """
    m = nb_angles
    m2 = i_up_rows.shape[1]
    up = i_up_rows
    d = jnp.abs((up[:, m + 1:m2 - 2] - up[:, m + 2:m2 - 1])
                - (up[:, m + 2:m2 - 1] - up[:, m + 3:m2]))   # walk at m+1..2M-3
    ok = d <= SMOOTH_TOL
    first = jnp.argmax(ok, axis=1)                            # first stop
    stop = jnp.where(jnp.any(ok, axis=1), first + m + 1, m2 - 3)
    idx = stop + 1                                            # blend endpoint
    cols = jnp.arange(m2)[None, :]
    onehot = (cols == idx[:, None]).astype(up.dtype)
    i_val = jnp.sum(up * onehot, axis=1)
    mu_idx = jnp.sum(mu[None, :] * onehot, axis=1)
    weight = mu[None, :] / mu_idx[:, None]
    blended = (1.0 - weight) * up[:, m][:, None] + weight * i_val[:, None]
    do = (cols >= m + 1) & (cols < idx[:, None])
    return jnp.where(do, blended, up)
