"""Whole-solve Pallas TPU kernel: the entire SOS order loop per column block.

Motivation (measured on v5e): the two-kernel-per-order fused path spends
~40 ms/order at B=2048 — latency-bound on tiny (16, 64) tiles plus ~6 HBM
full-field passes per order — and its global `lax.while_loop` drags every
column to the slowest column's order count.  This kernel keeps one block
of C columns entirely in VMEM for the whole solve:

- layout: fields are (L, C, 2M) — layer on the *leading* (untiled) axis
  so the sweeps index whole (C, 2M) planes (dynamic sublane offsets are
  pathological in Mosaic; leading-dim indexing is free), C columns on
  sublanes, all 2M angles on lanes;
- the Jₙ source (SOS_Aer_main_lambertian.py:317-325) is ONE
  (L·C, 2M)@(2M, 2M) MXU matmul per species per order;
- down/up sweeps (main_lambertian.py:328-451) are in-VMEM affine
  recurrences over (C, 2M) planes — identical math to ops/sweeps.py;
- the µ→0⁻ polyfit band (SOS_Aer_In_limit.py:113-141) is applied as
  static-stencil matmuls (select + place matrices built host-side);
- the µ→0⁺ smoothing walk (main_lambertian.py:405-411) runs full-width
  with lane rolls and one-hot reductions;
- convergence (the 100 ppm criterion, main_lambertian.py:311) is
  per-BLOCK: each block of C columns exits its own `lax.while_loop`
  when *its* columns converge — no global straggler sync;
- HBM traffic per solve: read I₁ + pack once, write I_tot once
  (vs ~6 full-field passes *per order* before).

Scope: grids whose |µ| < MU_THRESHOLD set is empty (nb_angles ≤ 101,
spacing ≥ 0.01 — the production sweep grids) and band_max ≤ 32.  The
general path (sos_rt_tpu/fused.py / solver.py) covers everything else.

Per-column results are identical (up to matmul accumulation order) to
``sos_rt_tpu.solver.solve_column``; see tests/test_mega.py.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sos_rt_tpu.config import MATMUL_PRECISION
from sos_rt_tpu.ops.sweeps import SMOOTH_TOL, SweepStencils

SLOT = 32          # padded polyfit band slots per variant (band_max ≤ 32)
BIG = 1 << 30

# pack lane indices (per layer × column scalars)
PK_TAU, PK_DROP, PK_CH1, PK_CH2, PK_R1, PK_R2, PK_HDT_DN, PK_HDT_UP, \
    PK_COEF_ATM, PK_COEF_AER, PK_CHOICE_A, PK_CHOICE_BC = range(12)
PK_W = 16

# cpar lane indices (per column scalars)
CP_TAU_R1, CP_TAU_R2, CP_GRD = range(3)
CP_W = 8

# rowconst row indices ((8, 2M) per-lane constants)
RC_EMU, RC_IVDN, RC_IVUP, RC_MU = range(4)
RC_H = 8

# stats lane indices (per column outputs)
ST_N, ST_CONV, ST_RATIO = range(3)
ST_W = 128


def _smooth_tile(v, murow, m, m2, lanes):
    """µ→0⁺ smoothing walk on a (C, 2M) plane, full-width.

    Replicates ops/sweeps.py::smooth_up_rows (main_lambertian.py:405-411):
    walk lanes M+1..2M-3 for the first second-difference ≤ 1e-4, blend
    lanes (M, idx) linearly in µ between v[M] and v[idx].  Down lanes
    (< M) are untouched.
    """
    v1 = pltpu.roll(v, m2 - 1, 1)    # v1[l] = v[l+1] (wrap is masked below)
    v2 = pltpu.roll(v, m2 - 2, 1)
    d = jnp.abs(v - 2.0 * v1 + v2)
    ok = (d <= SMOOTH_TOL) & (lanes >= m + 1) & (lanes <= m2 - 3)
    first = jnp.min(jnp.where(ok, lanes, BIG), axis=1, keepdims=True)
    stop = jnp.minimum(first, m2 - 3)
    idx = stop + 1
    onehot = (lanes == idx).astype(v.dtype)
    i_val = jnp.sum(v * onehot, axis=1, keepdims=True)
    mu_idx = jnp.sum(murow * onehot, axis=1, keepdims=True)
    weight = murow / mu_idx
    base = jnp.sum(v * (lanes == m).astype(v.dtype), axis=1, keepdims=True)
    blended = (1.0 - weight) * base + weight * i_val
    do = (lanes >= m + 1) & (lanes < idx)
    return jnp.where(do, blended, v)


def _mega_kernel(pack_ref, cpar_ref, rowc_ref, aatm_ref, aaer_ref, bcmat_ref,
                 wall_ref, place_ref, valid_ref,
                 i1_ref, itot_ref, stats_ref,
                 field_ref, jn_ref, att_ref, att1_ref, att2_ref,
                 *, nb_angles: int, tol: float, max_orders: int):
    L, C, m2 = i1_ref.shape
    m = nb_angles
    dtype = i1_ref.dtype

    lanes = jax.lax.broadcasted_iota(jnp.int32, (C, m2), 1)
    is_dn = lanes < m
    is_up = lanes >= m
    lane_m = lanes == m
    e_mu = rowc_ref[RC_EMU, :][None, :]
    ivdn = rowc_ref[RC_IVDN, :][None, :]
    ivup = rowc_ref[RC_IVUP, :][None, :]
    murow = rowc_ref[RC_MU, :][None, :]
    tau_r1 = cpar_ref[:, CP_TAU_R1][:, None]
    tau_r2 = cpar_ref[:, CP_TAU_R2][:, None]
    grd = cpar_ref[:, CP_GRD][:, None]
    hdt_sign = jnp.where(is_dn, 1.0, -1.0).astype(dtype)

    # ---- loop-invariant precompute: attenuations, chain attenuations ----
    def pre(t, _):
        pk = pack_ref[t]                                  # (C, PK_W)
        hdt = jnp.where(is_dn, pk[:, PK_HDT_DN][:, None],
                        pk[:, PK_HDT_UP][:, None])
        # down lanes: e^{Δτ_t/µ}; up lanes: e^{-Δτ_{t+1}/µ}
        att_ref[t] = jnp.exp(2.0 * hdt * e_mu)
        tau_t = pk[:, PK_TAU][:, None]
        att1_ref[t] = jnp.exp(-jnp.maximum(tau_r1 - tau_t, 0.0) * ivup)
        att2_ref[t] = jnp.exp(-jnp.maximum(tau_r2 - tau_t, 0.0) * ivup)
        itot_ref[t] = i1_ref[t]
        field_ref[t] = i1_ref[t]
        return 0

    jax.lax.fori_loop(0, L, pre, 0)

    one = jnp.ones((C, m2), dtype)
    neg = jnp.full((C, 1), -jnp.inf, dtype)

    def ratio_rows(new_top, tot_top, new_bot, tot_bot):
        r_toa = jnp.max(jnp.where(is_up, new_top / tot_top, neg), axis=1,
                        keepdims=True)
        r_srf = jnp.max(jnp.where(is_dn, new_bot / tot_bot, neg), axis=1,
                        keepdims=True)
        return jnp.maximum(r_toa, r_srf)

    ratio0 = ratio_rows(one, itot_ref[0], one, itot_ref[L - 1])
    n0 = jnp.ones((C, 1), dtype)

    def cond(carry):
        ratio, n = carry
        return jnp.any(ratio >= tol) & (jnp.max(n) < max_orders)

    def body(carry):
        ratio, n = carry
        active = (ratio >= tol).astype(dtype)             # (C, 1)

        # ---- source: Jₙ = coef·(Iₙ₋₁ @ A) per species, blended ----
        fv = field_ref[:, :, :].reshape(L * C, m2)
        pk_all = pack_ref[:, :, :].reshape(L * C, PK_W)
        jn_flat = (pk_all[:, PK_COEF_ATM][:, None]
                   * jnp.dot(fv, aatm_ref[:, :], preferred_element_type=dtype,
                   precision=MATMUL_PRECISION)
                   + pk_all[:, PK_COEF_AER][:, None]
                   * jnp.dot(fv, aaer_ref[:, :], preferred_element_type=dtype,
                   precision=MATMUL_PRECISION))
        jn_ref[:, :, :] = jn_flat.reshape(L, C, m2)

        # ---- downward sweep (computed full-width; up lanes garbage) ----
        def down(t, carry):
            s, j_prev = carry
            j_t = jn_ref[t]
            a = att_ref[t]
            w = pack_ref[t][:, PK_HDT_DN][:, None]
            s = a * s + w * (j_prev * a + j_t)
            field_ref[t] = jnp.where(is_dn, -s * ivdn, 0.0)
            return s, j_t

        z = jnp.zeros((C, m2), dtype)
        jax.lax.fori_loop(0, L, down, (z, z))

        # ---- narrow fixes: µ=0⁻ zero + polyfit band (static stencils) ----
        fv = field_ref[:, :, :].reshape(L * C, m2)
        fv = jnp.where((lanes == m - 1)[:1].reshape(1, m2), 0.0, fv)
        polys = jnp.dot(fv, wall_ref[:, :], preferred_element_type=dtype,
                   precision=MATMUL_PRECISION)
        choice = jnp.where(pk_all[:, PK_CH2] > 0.5,
                           pk_all[:, PK_CHOICE_A],
                           pk_all[:, PK_CHOICE_BC])[:, None]
        band = polys[:, 0:SLOT]
        vrow = valid_ref[0, :][None, :]
        for c in range(1, 4):
            sel = choice == c
            band = jnp.where(sel, polys[:, c * SLOT:(c + 1) * SLOT], band)
            vrow = jnp.where(sel, valid_ref[c, :][None, :], vrow)
        placed = jnp.dot(band, place_ref[:, :], preferred_element_type=dtype,
                   precision=MATMUL_PRECISION)
        pvalid = jnp.dot(vrow * jnp.ones_like(band), place_ref[:, :],
                         preferred_element_type=dtype,
                   precision=MATMUL_PRECISION)
        fv = jnp.where(pvalid > 0.5, placed, fv)
        field_ref[:, :, :] = fv.reshape(L, C, m2)

        # ---- surface boundary condition ----
        surf = field_ref[L - 1]
        bc = grd * jnp.dot(jnp.where(is_dn, surf, 0.0), bcmat_ref[:, :],
                           preferred_element_type=dtype,
                   precision=MATMUL_PRECISION)
        i_surf = jnp.where(lane_m, jn_ref[L - 1], bc)

        # ---- upward sweep (reverse); accumulate the two join rows ----
        def up(r, carry):
            s, j_next, row1, row2 = carry
            t = L - 1 - r
            j_t = jn_ref[t]
            a = att_ref[t]
            pk = pack_ref[t]
            w = pk[:, PK_HDT_UP][:, None]
            drop = pk[:, PK_DROP][:, None]
            c = w * ivup * (j_t + j_next * a)
            c = jnp.where(drop > 0.5, 0.0, c)
            s = a * s + c
            s = jnp.where(lane_m, j_t, s)
            field_ref[t] = jnp.where(is_up, s, field_ref[t])
            row1 = row1 + pk[:, PK_R1][:, None] * s
            row2 = row2 + pk[:, PK_R2][:, None] * s
            return s, j_t, row1, row2

        s0 = jnp.where(lane_m, jn_ref[L - 1], i_surf)
        _, _, row1, row2 = jax.lax.fori_loop(
            0, L, up, (s0, z, jnp.zeros((C, m2), dtype),
                       jnp.zeros((C, m2), dtype)))

        # ---- smoothed-boundary chaining deltas at the two region joins ----
        d1 = _smooth_tile(row1, murow, m, m2, lanes) - row1
        att_12 = jnp.exp(-jnp.maximum(tau_r1 - tau_r2, 0.0) * ivup)
        row2c = row2 + d1 * att_12
        d2 = _smooth_tile(row2c, murow, m, m2, lanes) - row2c

        # ---- final pass: chain corrections + smoothing + accumulate ----
        def fin(t, _):
            pk = pack_ref[t]
            ch1 = pk[:, PK_CH1][:, None]
            ch2 = pk[:, PK_CH2][:, None]
            corr = ch1 * d1 * att1_ref[t] + ch2 * d2 * att2_ref[t]
            corr = jnp.where(is_up & ~lane_m, corr, 0.0)
            f = _smooth_tile(field_ref[t] + corr, murow, m, m2, lanes)
            field_ref[t] = f
            itot_ref[t] = itot_ref[t] + active * f
            return 0

        jax.lax.fori_loop(0, L, fin, 0)

        rnew = ratio_rows(field_ref[0], itot_ref[0],
                          field_ref[L - 1], itot_ref[L - 1])
        ratio = jnp.where(active > 0.5, rnew, ratio)
        n = n + active
        return ratio, n

    ratio, n = jax.lax.while_loop(cond, body, (ratio0, n0))

    st = jnp.zeros((C, ST_W), dtype)
    st_lanes = jax.lax.broadcasted_iota(jnp.int32, (C, ST_W), 1)
    st = jnp.where(st_lanes == ST_N, n, st)
    st = jnp.where(st_lanes == ST_CONV, (ratio < tol).astype(dtype), st)
    st = jnp.where(st_lanes == ST_RATIO, ratio, st)
    stats_ref[:, :] = st


def mega_supported(grid, stencils: SweepStencils) -> bool:
    """Static eligibility: no small-µ columns and band fits the slots."""
    return stencils.small_cols.size == 0 and stencils.band_max <= SLOT


def build_static_operators(grid, stencils: SweepStencils, surface: str,
                           w_mu: np.ndarray, dtype):
    """Host-built constant matrices for the kernel (numpy, per grid)."""
    m = grid.nb_angles
    m2 = 2 * m
    mu = np.asarray(grid.mu(), np.float64)

    # polyfit select (2M, 4·SLOT) and place (SLOT, 2M) matrices
    wall = np.zeros((m2, 4 * SLOT))
    valid = np.zeros((8, SLOT))
    for c in range(4):
        b = stencils.bands[c]
        src = stencils.poly_src[c]
        w = stencils.poly_w[c]                       # (band_max, 6)
        for i in range(b):
            for j in range(6):
                wall[src[j], c * SLOT + i] += w[i, j] if j < 6 else 0.0
        valid[c, :stencils.band_max] = stencils.poly_mask[c].astype(float)
    place = np.zeros((SLOT, m2))
    for i in range(min(SLOT, m)):
        place[i, m - 1 - i] = 1.0

    # surface BC matrix: bc = grd · (surf_dn @ bcmat)
    bcmat = np.zeros((m2, m2))
    if surface == "lambertian":
        for k in range(m):
            bcmat[k, m:] = -2.0 * w_mu[k] * mu[k]
    else:  # specular mirror: up lane m+k ← down lane m-1-k
        for k in range(1, m):
            bcmat[m - 1 - k, m + k] = 1.0

    # per-lane rows
    mu_dn_safe = np.where(mu[:m] == 0, -1.0, mu[:m])
    mu_up = mu[m:].copy()
    mu_up_safe = np.where(mu_up == 0, 1.0, mu_up)
    rowc = np.zeros((RC_H, m2))
    rowc[RC_EMU, :m] = 1.0 / mu_dn_safe
    rowc[RC_EMU, m:] = -1.0 / mu_up_safe
    rowc[RC_IVDN, :m] = 1.0 / mu_dn_safe
    rowc[RC_IVUP, m:] = 1.0 / mu_up_safe
    rowc[RC_MU, :] = mu
    rowc[RC_MU, m] = 0.0

    f = lambda x: jnp.asarray(x, dtype)
    return f(wall), f(valid), f(place), f(bcmat), f(rowc)


def mega_call(pack, cpar, rowc, aatm, aaer, bcmat, wall, place, valid, i1t,
              *, nb_angles: int, tol: float, max_orders: int,
              cols_per_block: int, interpret: bool = False):
    """Run the whole-solve kernel.

    pack: (L, B, PK_W); cpar: (B, CP_W); i1t: (L, B, 2M).
    Returns (itot (L, B, 2M), stats (B, ST_W)).
    """
    L, B, m2 = i1t.shape
    C = cols_per_block
    assert B % C == 0, (B, C)
    nblk = B // C
    dtype = i1t.dtype
    kern = functools.partial(_mega_kernel, nb_angles=nb_angles, tol=tol,
                             max_orders=max_orders)
    grid_spec = pl.GridSpec(
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((L, C, PK_W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, CP_W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RC_H, m2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m2, m2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m2, m2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m2, m2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m2, 4 * SLOT), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SLOT, m2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, SLOT), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, C, m2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((L, C, m2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, ST_W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((L, C, m2), dtype) for _ in range(5)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((L, B, m2), dtype),
                   jax.ShapeDtypeStruct((B, ST_W), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(pack, cpar, rowc, aatm, aaer, bcmat, wall, place, valid, i1t)
