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
  (L·C, 2M)@(2M, 4M) MXU matmul per order (both species stacked);
- down/up sweeps (main_lambertian.py:328-451) are in-VMEM affine
  recurrences over (C, 2M) planes — identical math to ops/sweeps.py;
- the µ→0⁻ polyfit band (SOS_Aer_In_limit.py:113-141) is applied as
  static-stencil matmuls (select + place matrices built host-side);
- the µ→0⁺ smoothing walk (main_lambertian.py:405-411) runs full-width
  with lane rolls and one-hot reductions;
- convergence (the 100 ppm criterion, main_lambertian.py:311) is
  per-BLOCK: each block of C columns exits its own `lax.while_loop`
  when *its* columns converge — no global straggler sync.

Order-loop structure (v2 — the whole loop is exactly TWO chunked field
passes, measured VMEM-traffic-bound on v5e):

- **pass A (forward)**: stream (G, C, 2M) chunks; Jₙ matmul, then the
  downward affine recurrence unrolled over the chunk's G layers with the
  carry in registers.  Writes two scratches (jn, r_down).
- **pass B (reverse)**: stream chunks last-to-first; extract I↓ + µ→0⁻
  fixes + surface BC, run the upward recurrence unrolled (register
  carry), apply the region-join chain corrections via two *running
  attenuation carries* (q1, q2 — see below), smooth, accumulate I_tot,
  all in one pass.

The join corrections: the reference re-chains the upward sweep from the
smoothed boundary values at the region joins t=idx_down+1 and t=idx_up
(main_lambertian.py:235-294 structure); algebraically the correction at
layer t above a join t₀ is d·e^{-(τ(t₀)-τ(t))/µ}, where d is the
smoothing delta at the join.  Since pass B walks t downward through
exactly the layers between t₀ and t, the exponential is maintained as a
running product of the per-step attenuations (q ← q·a_t), and d is
captured from the smoothing delta (sm − f) at the join layer itself —
no extra field passes, no precomputed attenuation scratches.

Scope: grids whose |µ| < MU_THRESHOLD set is empty (nb_angles ≤ 101,
spacing ≥ 0.01 — the production sweep grids) and band_max ≤ 32.  The
general path (sos_rt_tpu/fused.py / solver.py) covers everything else.

Per-column results are identical (up to matmul accumulation order and
exp-product reassociation, ≲1e-13 rel in f64) to
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
    PK_COEF_ATM, PK_COEF_AER, PK_CHOICE_A, PK_CHOICE_BC, \
    PK_CDN, PK_CUP, PK_GS, PK_CHOICE = range(16)
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

BIGF = 1e9


def _smooth_tile(v, m, m2, lanef):
    """µ→0⁺ smoothing walk on (N, 2M) rows, full-width.

    Replicates ops/sweeps.py::smooth_up_rows (main_lambertian.py:405-411):
    walk lanes M+1..2M-3 for the first second-difference ≤ 1e-4, blend
    lanes (M, idx) linearly in µ between v[M] and v[idx].  Lanes < M are
    untouched.

    Two deviations from the obvious transcription, both measured on v5e:
    - every lane-index comparison runs in FLOAT (``lanef`` is the lane
      iota pre-cast to v.dtype) — an int32 lane-min reduction lowers
      ~20x slower than the f32 one (34 µs vs ~2 µs per 4 MB pass);
    - the blend weight µ_k/µ_idx is evaluated closed-form as
      (k-M)/(idx-M), exact for the reference's uniform up-µ grid
      (SOS_Aer_main_lambertian.py:59-61, enforced by ``mega_supported``),
      removing two more cross-lane reductions.
    """
    v1 = pltpu.roll(v, m2 - 1, 1)    # v1[l] = v[l+1] (wrap is masked below)
    v2 = pltpu.roll(v, m2 - 2, 1)
    d = jnp.abs(v - 2.0 * v1 + v2)
    ok = (d <= SMOOTH_TOL) & (lanef >= m + 1) & (lanef <= m2 - 3)
    first = jnp.min(jnp.where(ok, lanef, BIGF), axis=1, keepdims=True)
    idxf = jnp.minimum(first, m2 - 3) + 1.0
    onehot = (lanef == idxf).astype(v.dtype)
    i_val = jnp.sum(v * onehot, axis=1, keepdims=True)
    base = v[:, m:m + 1]
    weight = (lanef - m) / (idxf - m)
    blended = (1.0 - weight) * base + weight * i_val
    do = (lanef >= m + 1) & (lanef < idxf)
    return jnp.where(do, blended, v)


def _mega_kernel(pack_ref, cpar_ref, rowc_ref, acat_ref, bcmat_ref,
                 wall_ref, place_ref, valid_ref,
                 i1_ref, itot_ref, stats_ref,
                 field_ref, jn_ref, rdn_ref, att_ref,
                 *, nb_angles: int, tol: float, max_orders: int,
                 ablate: str = ""):
    """Whole-solve kernel body (two field passes per order).

    Performance structure (measured on v5e, see tools/micro_ops.py and
    tools/ablate_kernel.py):

    - every wide pass streams the (L, C, 2M) field in chunks of G layers
      — a (G·C, 2M) tile is a few dozen vregs, so intermediates stay in
      VMEM without round-tripping whole 4 MB buffers between stages;
    - the sequential sweep recurrences run *inside* the chunk loops,
      unrolled over the G layers with the carry in registers — no
      separate L-step loops, no extra source/result field passes;
    - per-(layer,column) scalars come straight from the (G, C, 16) pack
      chunk and are broadcast chunk-wide in registers (one small mul),
      never materialized as (L, C, 2M) scratches;
    - the two Jₙ species matmuls run as ONE dot against the horizontally
      stacked (2M, 4M) operator.

    Scratches: field (Iₙ), jn (Jₙ), rdn (down-sweep results), att
    (per-step attenuations, loop-invariant) — 4 × (L, C, 2M).

    ``ablate``: comma-separated static flags that cut out kernel stages
    for performance attribution (tools/ablate_kernel.py) — results are
    WRONG with any flag set.  noconv: fixed order count; nosrc: skip the
    Jₙ matmuls; noloops: skip the two in-register recurrences; nopoly:
    skip the polyfit-band matmuls; nosmooth: skip the smoothing walk;
    nobc: skip the surface BC dot; nopassA/nopassB: skip whole passes;
    noratio: keep the first ratio.
    """
    ab = frozenset(ablate.split(",")) if ablate else frozenset()
    L, C, m2 = i1_ref.shape
    m = nb_angles
    dtype = i1_ref.dtype
    G = next(d for d in (8, 4, 2, 1) if L % d == 0)
    NG = L // G
    GC = G * C

    lanes = jax.lax.broadcasted_iota(jnp.int32, (C, m2), 1)
    lanes_c = jax.lax.broadcasted_iota(jnp.int32, (GC, m2), 1)
    lanef = lanes.astype(dtype)
    is_dn = lanes < m
    is_up = lanes >= m
    lane_m = lanes == m
    corr_mask = (is_up & ~lane_m).astype(dtype)
    is_dn_c = lanes_c < m
    lane_m_c = lanes_c == m
    e_mu = rowc_ref[RC_EMU, :][None, :]
    ivdn = rowc_ref[RC_IVDN, :][None, :]
    ivup = rowc_ref[RC_IVUP, :][None, :]
    grd = cpar_ref[:, CP_GRD][:, None]

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=dtype,
                       precision=MATMUL_PRECISION)

    # loop-invariant: placed polyfit validity rows (4, 2M)
    pvt = dot(valid_ref[0:4, :], place_ref[:, :])

    # ---- `pre`: per-step attenuations a_t (down lanes e^{Δτ_t/µ}, up
    # lanes e^{-Δτ_{t+1}/µ}, 0 at the µ=0⁺ lane so the up recurrence pins
    # I(µ=0)=Jₙ); field/I_tot init from I₁ ----
    def pre(g, _):
        sl = pl.ds(g * G, G)
        pk = pack_ref[sl].reshape(GC, PK_W)
        hdt = jnp.where(is_dn_c, pk[:, PK_HDT_DN:PK_HDT_DN + 1],
                        pk[:, PK_HDT_UP:PK_HDT_UP + 1])
        a = jnp.exp(2.0 * hdt * e_mu)
        att_ref[sl] = jnp.where(lane_m_c, 0.0, a).reshape(G, C, m2)
        i1g = i1_ref[sl]
        itot_ref[sl] = i1g
        field_ref[sl] = i1g
        return 0

    jax.lax.fori_loop(0, NG, pre, 0)

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
        if "noconv" in ab:
            return jnp.max(n) < max_orders
        return jnp.any(ratio >= tol) & (jnp.max(n) < max_orders)

    def body(carry):
        ratio, n = carry
        active = (ratio >= tol).astype(dtype)             # (C, 1)

        # ---- pass A (forward): Jₙ = cab·(Iₙ₋₁ @ A_atm) + crb·(Iₙ₋₁ @
        # A_aer) as one stacked dot, then the downward recurrence.  The
        # raw recurrence s_t = a_t(s_{t-1} + w_t j_{t-1}) + w_t j_t
        # (w_t = hdt_dn[t]) is substituted r_t = s_t + hdt_up[t]·j_t
        # (hdt_up[t] = hdt_dn[t+1]) giving r_t = a_t r_{t-1} + cdn_t·j_t
        # with a layer-LOCAL source — one FMA per layer, carry in
        # registers, unrolled across the chunk ----
        def passA(g, r):
            sl = pl.ds(g * G, G)
            pk3 = pack_ref[sl]                            # (G, C, PK_W)
            fv = field_ref[sl].reshape(GC, m2)
            if "nosrc" in ab:
                jn3 = (fv + 1.0).reshape(G, C, m2)
            else:
                pk = pk3.reshape(GC, PK_W)
                out = dot(fv, acat_ref[:, :])             # (GC, 4M)
                jn3 = (pk[:, PK_COEF_ATM:PK_COEF_ATM + 1] * out[:, :m2]
                       + pk[:, PK_COEF_AER:PK_COEF_AER + 1] * out[:, m2:]
                       ).reshape(G, C, m2)
            jn_ref[sl] = jn3
            src3 = pk3[:, :, PK_CDN:PK_CDN + 1] * jn3     # (G, C, 2M)
            if "noloops" in ab:
                rdn_ref[sl] = src3
                return r
            att3 = att_ref[sl]
            rs = []
            for k in range(G):
                r = att3[k] * r + src3[k]
                rs.append(r)
            rdn_ref[sl] = jnp.stack(rs, axis=0)
            return r

        if "nopassA" not in ab:
            jax.lax.fori_loop(0, NG, passA, jnp.zeros((C, m2), dtype))

        # ---- pass B (reverse): extract I↓ + narrow fixes (µ=0⁻ zero,
        # polyfit band via static-stencil matmuls), surface BC on the
        # first (deepest) chunk, upward recurrence r_t = a_t r_{t+1} +
        # cup_t·ivup·j_t (the µ=0⁺ lane rides along with a=0, cup=1,
        # src=jₙ, pinning I(µ=0)=Jₙ exactly), region-join corrections via
        # the running carries q1/q2, smoothing, accumulation ----
        def passB(grev, carry):
            r, q1, q2 = carry
            g = NG - 1 - grev
            sl = pl.ds(g * G, G)
            pk3 = pack_ref[sl]
            jn3 = jn_ref[sl]
            att3 = att_ref[sl]
            jnf = jn3.reshape(GC, m2)
            s_dn = (rdn_ref[sl].reshape(GC, m2)
                    - pk3[:, :, PK_HDT_UP:PK_HDT_UP + 1].reshape(GC, 1) * jnf)
            fv = jnp.where(is_dn_c, -s_dn * ivdn, 0.0)
            fv = jnp.where(lanes_c == m - 1, 0.0, fv)
            if "nopoly" not in ab:
                pk = pk3.reshape(GC, PK_W)
                polys = dot(fv, wall_ref[:, :])
                choice = pk[:, PK_CHOICE:PK_CHOICE + 1]
                band = polys[:, 0:SLOT]
                vsel = pvt[0][None, :]
                for c in range(1, 4):
                    sel = choice == c
                    band = jnp.where(sel, polys[:, c * SLOT:(c + 1) * SLOT],
                                     band)
                    vsel = jnp.where(sel, pvt[c][None, :], vsel)
                placed = dot(band, place_ref[:, :])
                fv = jnp.where(vsel > 0.5, placed, fv)
            fv3 = fv.reshape(G, C, m2)

            # surface BC from the deepest layer's I↓ (first chunk only)
            if "nobc" in ab:
                i_surf = jn3[G - 1]
            else:
                bc = grd * dot(jnp.where(is_dn, fv3[G - 1], 0.0),
                               bcmat_ref[:, :])
                i_surf = jnp.where(lane_m, jn3[G - 1], bc)
            first = grev == 0
            r = jnp.where(first, i_surf, r)

            # up-sweep sources, chunk-wide
            cup3 = pk3[:, :, PK_CUP:PK_CUP + 1] * ivup[None]
            cup3 = jnp.where(lane_m_c.reshape(G, C, m2), 1.0, cup3)
            src3 = cup3 * jn3
            gsv3 = (pk3[:, :, PK_GS:PK_GS + 1] * ivup[None]) * jn3
            r1m = pk3[:, :, PK_R1:PK_R1 + 1] > 0.5        # (G, C, 1)
            r2m = pk3[:, :, PK_R2:PK_R2 + 1] > 0.5

            out_rows = []
            it3 = itot_ref[sl]
            for k in range(G - 1, -1, -1):
                if "noloops" in ab:
                    r_new = src3[k]
                else:
                    r_new = att3[k] * r + src3[k]
                r = r_new
                s_up = r_new - gsv3[k]
                f = jnp.where(is_up, s_up, fv3[k])
                q1 = q1 * att3[k]
                q2 = q2 * att3[k]
                if "nofin" in ab:
                    sm = f
                else:
                    f = f + corr_mask * (q1 + q2)
                    if "nosmooth" in ab:
                        sm = f
                    else:
                        sm = _smooth_tile(f, m, m2, lanef)
                    d = sm - f
                    q1 = jnp.where(r1m[k], d, q1)
                    q2 = jnp.where(r2m[k], d, q2)
                out_rows.append(sm)
            new3 = jnp.stack(out_rows[::-1], axis=0)
            field_ref[sl] = new3
            itot_ref[sl] = it3 + active[None] * new3
            return r, q1, q2

        z = jnp.zeros((C, m2), dtype)
        if "nopassB" not in ab:
            jax.lax.fori_loop(0, NG, passB, (z, z, z))

        if "noratio" in ab:
            rnew = ratio
        else:
            rnew = ratio_rows(field_ref[0], itot_ref[0],
                              field_ref[L - 1], itot_ref[L - 1])
        ratio = jnp.where(active > 0.5, rnew, ratio)
        n = n + (1.0 if "noconv" in ab else active)
        return ratio, n

    ratio, n = jax.lax.while_loop(cond, body, (ratio0, n0))

    st = jnp.zeros((C, ST_W), dtype)
    st_lanes = jax.lax.broadcasted_iota(jnp.int32, (C, ST_W), 1)
    st = jnp.where(st_lanes == ST_N, n, st)
    st = jnp.where(st_lanes == ST_CONV, (ratio < tol).astype(dtype), st)
    st = jnp.where(st_lanes == ST_RATIO, ratio, st)
    stats_ref[:, :] = st


def mega_supported(grid, stencils: SweepStencils) -> bool:
    """Static eligibility: no small-µ columns, band fits the slots, and
    the up-µ grid is uniform (the in-kernel smoothing walk evaluates its
    blend weight µ_k/µ_idx closed-form as (k-M)/(idx-M))."""
    mu_up = np.asarray(grid.mu(), np.float64)[grid.nb_angles:]
    d = np.diff(mu_up)
    uniform = bool(np.allclose(d, d[0], rtol=1e-12, atol=1e-15))
    return (stencils.small_cols.size == 0 and stencils.band_max <= SLOT
            and uniform)


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
    # µ=0⁺ lane: ivup=0 so the up-sweep substitution r = s + gs·ivup·j is
    # the identity there and I(µ=0)=Jₙ rides through exactly
    rowc[RC_IVUP, m] = 0.0
    rowc[RC_MU, :] = mu
    rowc[RC_MU, m] = 0.0

    f = lambda x: jnp.asarray(x, dtype)
    return f(wall), f(valid), f(place), f(bcmat), f(rowc)


def mega_call(pack, cpar, rowc, acat, bcmat, wall, place, valid, i1t,
              *, nb_angles: int, tol: float, max_orders: int,
              cols_per_block: int, interpret: bool = False,
              ablate: str = ""):
    """Run the whole-solve kernel.

    pack: (L, B, PK_W); cpar: (B, CP_W); acat: the horizontally stacked
    (2M, 4M) source operator [A_atm | A_aer]; i1t: (L, B, 2M).
    Returns (itot (L, B, 2M), stats (B, ST_W)).
    """
    L, B, m2 = i1t.shape
    C = cols_per_block
    assert B % C == 0, (B, C)
    nblk = B // C
    dtype = i1t.dtype
    kern = functools.partial(_mega_kernel, nb_angles=nb_angles, tol=tol,
                             max_orders=max_orders, ablate=ablate)
    grid_spec = pl.GridSpec(
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((L, C, PK_W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, CP_W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RC_H, m2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m2, 2 * m2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
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
        scratch_shapes=[pltpu.VMEM((L, C, m2), dtype) for _ in range(4)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((L, B, m2), dtype),
                   jax.ShapeDtypeStruct((B, ST_W), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(pack, cpar, rowc, acat, bcmat, wall, place, valid, i1t)
