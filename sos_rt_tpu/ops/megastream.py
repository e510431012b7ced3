"""HBM-streaming whole-solve engine for VMEM-infeasible grids.

The angle-major mega kernel (ops/megakernel.py) keeps all eight
(NG, M, G·C) field planes in VMEM — infeasible for the reference's
canonical 501×800 production grid (SOS_Aer_main_lambertian.py:33,57),
where one plane at C=32 already exceeds the whole budget.  Until r4 that
grid streamed through the batch-fused engine at ~300 col/s (bf16x3)
against a ~900+ col/s matmul roofline: the fused kernels pay lane-axis
smoothing reductions and per-layer relayouts the mega layout was
designed to remove (VERDICT r4 item 1).

This module runs the SAME angle-major math with the half-fields
RESIDENT IN HBM, split into two grid-pipelined Pallas kernels per
scattering order:

- **pass A** (forward, grid over layer chunks): one stacked
  (4Mp, 2Mp) @ (2Mp, G·C) Jₙ source dot per chunk + the downward
  affine recurrence; the recurrence carry lives in VMEM scratch, which
  persists across the sequential grid steps.  Emits sdn (the telescoped
  down field) and jn_up.
- **pass B** (reverse grid): µ→0⁻ polyfit-band fix, upward recurrence
  with the µ=0⁺ Jₙ row riding along, region-join corrections (q1/q2
  running carries), µ→0⁺ smoothing walk on sublanes — all identical to
  the in-VMEM kernel's pass B.  The surface boundary condition is
  evaluated in-kernel at the FIRST reverse step (the chunk holding the
  surface row is in VMEM right there).
- the convergence loop (100 ppm, main_lambertian.py:311) runs at the
  XLA level per block of C columns (``lax.map`` over blocks): each
  order is two pallas_calls; only the four boundary tiles + stats are
  accumulated between orders in summary mode, so per-order HBM traffic
  is 8 field planes (read fdn/fup + write sdn/jnup in A, read sdn/jnup
  + write fdn/fup in B).  At the canonical grid that is ~13 MB/col/order
  against ~3.3 GFLOP/col/order of Jₙ matmul — compute-bound by ~20×,
  exactly what the VMEM-resident kernel is, so streaming costs ~nothing
  while lifting the grid-size ceiling entirely.

Pallas's automatic block pipelining double-buffers the HBM↔VMEM block
transfers (the hand-rolled DMA alternative buys nothing here); the grid
dimension is declared "arbitrary" = sequential, which the recurrence
carries rely on.

Numerics are the mega kernel's exactly (same operators, same _dot3
precision modes, same smoothing/correction order); see
tests/test_megastream.py for stream == mega == reference parity.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sos_rt_tpu.ops.megakernel import (
    BIGF,
    CP_CONST,
    CP_GRD,
    PK_ASTAR,
    PK_CDN,
    PK_CHOICE,
    PK_COEF_AER,
    PK_COEF_ATM,
    PK_CUP,
    PK_GS,
    PK_HDT_DN,
    PK_HDT_UP,
    PK_R1,
    PK_R2,
    RC_EMU_DN,
    RC_EMU_UP,
    RC_IVDN,
    RC_IVUP,
    RC_MUUP,
    RC_PKA,
    RC_PKR,
    _dot3,
    _smooth_up,
    band_fix_tile,
    make_i1_block,
    ratio_rows_tile,
)


def _passA_kernel(pack_ref, fdn_ref, fup_ref, colc_ref, ws_hi, ws_lo,
                  sdn_ref, jnup_ref, r_ref, *, mm: str, G: int, C: int,
                  ab: frozenset = frozenset()):
    """Forward chunk pass: Jₙ source dot + downward recurrence.

    Blocks: pack (1, PK_W, GC), fdn/fup/sdn/jnup (1, M, GC); the
    recurrence carry r (M, C) persists in scratch across grid steps."""
    g = pl.program_id(0)
    M = fdn_ref.shape[1]
    dtype = fdn_ref.dtype
    dot3 = functools.partial(_dot3, mm=mm, dtype=dtype)

    @pl.when(g == 0)
    def _():
        r_ref[:, :] = jnp.zeros_like(r_ref)

    pk = pack_ref[0]
    emu_dn = colc_ref[RC_EMU_DN, :, 0:1]                 # (M, 1)
    att = jnp.exp(2.0 * pk[PK_HDT_DN:PK_HDT_DN + 1, :] * emu_dn)
    if "nosrc" in ab:
        jnd = fdn_ref[0] + 1.0
        jnu = fup_ref[0] + 1.0
    else:
        i_full = jnp.concatenate([fdn_ref[0], fup_ref[0]], axis=0)
        out = dot3(ws_hi, ws_lo, i_full)                 # (4M, GC)
        ca = pk[PK_COEF_ATM:PK_COEF_ATM + 1, :]
        cr = pk[PK_COEF_AER:PK_COEF_AER + 1, :]
        jnd = ca * out[:M] + cr * out[2 * M:3 * M]
        jnu = ca * out[M:2 * M] + cr * out[3 * M:]
    jnup_ref[0] = jnu
    src = pk[PK_CDN:PK_CDN + 1, :] * jnd
    hup = pk[PK_HDT_UP:PK_HDT_UP + 1, :]
    if "noloops" in ab:
        sdn_ref[0] = src - hup * jnd
        return
    r = r_ref[:, :]
    for k in range(G):
        sl = slice(k * C, (k + 1) * C)
        r = att[:, sl] * r + src[:, sl]
        sdn_ref[0, :, sl] = r - hup[:, sl] * jnd[:, sl]
    r_ref[:, :] = r


def _passB_kernel(pack_ref, sdn_ref, jnup_ref, cpar_ref, colc_ref,
                  wall_hi, wall_lo, place_hi, place_lo, bc_hi, bc_lo,
                  pvt_ref, fdn_ref, fup_ref, r_ref, q1_ref, q2_ref,
                  *, mm: str, G: int, C: int, nb_angles: int,
                  ab: frozenset = frozenset()):
    """Reverse chunk pass: band fix, upward recurrence, join corrections,
    smoothing.  Grid step i processes chunk g = NG-1-i (via the index
    maps); the carries (r, q1, q2) persist in scratch.  At i == 0 the
    surface BC is evaluated in-kernel from this chunk's own sdn/jnup
    (identical formula to megakernel's hoisted BC)."""
    i = pl.program_id(0)
    M = sdn_ref.shape[1]
    GC = G * C
    mr = nb_angles
    dtype = sdn_ref.dtype
    dot3 = functools.partial(_dot3, mm=mm, dtype=dtype)
    if "nopoly" in ab:
        bandfix = lambda fv, choice, zm: jnp.where(zm, 0.0, fv)
    else:
        bandfix = functools.partial(
            band_fix_tile, wall_hi=wall_hi, wall_lo=wall_lo,
            place_hi=place_hi, place_lo=place_lo, pvt_ref=pvt_ref,
            dot3=dot3, dtype=dtype)

    rowf_c = jax.lax.broadcasted_iota(jnp.int32, (M, C), 0).astype(dtype)
    row0_c = rowf_c < 0.5
    corr_c = (rowf_c >= 0.5).astype(dtype)
    rowf_g = jax.lax.broadcasted_iota(jnp.int32, (M, GC), 0).astype(dtype)
    lastrow_g = rowf_g > mr - 1.5

    ivdn = colc_ref[RC_IVDN, :, 0:1]
    ivup = colc_ref[RC_IVUP, :, 0:1]
    emu_up = colc_ref[RC_EMU_UP, :, 0:1]
    pk = pack_ref[0]
    jnu3 = jnup_ref[0]

    @pl.when(i == 0)
    def _():
        last = slice(GC - C, GC)
        jnu_last = jnu3[:, last]
        fvs = -sdn_ref[0][:, last] * ivdn                # (M, C)
        zm_c = rowf_c > mr - 1.5
        fvs = bandfix(fvs, pk[PK_CHOICE:PK_CHOICE + 1, last], zm_c)
        grd = cpar_ref[CP_GRD:CP_GRD + 1, :]             # (1, C)
        r_ref[:, :] = jnp.where(row0_c, jnu_last,
                                grd * dot3(bc_hi, bc_lo, fvs))
        q1_ref[:, :] = jnp.zeros_like(q1_ref)
        q2_ref[:, :] = jnp.zeros_like(q2_ref)

    aup = jnp.exp(2.0 * pk[PK_HDT_UP:PK_HDT_UP + 1, :] * emu_up)
    attu3 = jnp.where(rowf_g < 0.5, 0.0, aup)

    fv = -sdn_ref[0] * ivdn                              # (M, GC)
    fv = bandfix(fv, pk[PK_CHOICE:PK_CHOICE + 1, :], lastrow_g)

    jiv = ivup * jnu3
    src3 = pk[PK_CUP:PK_CUP + 1, :] * jiv
    src3 = jnp.where(rowf_g < 0.5, jnu3, src3)           # µ=0⁺ pin
    gsv3 = pk[PK_GS:PK_GS + 1, :] * jiv
    r1row = pk[PK_R1:PK_R1 + 1, :]
    r2row = pk[PK_R2:PK_R2 + 1, :]

    r = r_ref[:, :]
    q1 = q1_ref[:, :]
    q2 = q2_ref[:, :]
    for k in range(G - 1, -1, -1):
        sl = slice(k * C, (k + 1) * C)
        if "noloops" in ab:
            r_new = src3[:, sl]
        else:
            r_new = attu3[:, sl] * r + src3[:, sl]
        r = r_new
        f = r_new - gsv3[:, sl]
        if "nofin" in ab:
            sm = f
        else:
            q1 = q1 * attu3[:, sl]
            q2 = q2 * attu3[:, sl]
            f = f + corr_c * (q1 + q2)
            if "nosmooth" in ab:
                sm = f
            else:
                sm = _smooth_up(f, rowf_c, nb_angles,
                                colc_ref[RC_MUUP, :, 0:1])
            d = sm - f
            q1 = jnp.where(r1row[:, sl] > 0.5, d, q1)
            q2 = jnp.where(r2row[:, sl] > 0.5, d, q2)
        fup_ref[0, :, sl] = sm
    r_ref[:, :] = r
    q1_ref[:, :] = q1
    q2_ref[:, :] = q2
    fdn_ref[0] = fv


def _passI_kernel(pack_ref, tiles_ref, cpar_ref, colc_ref, astk_hi, astk_lo,
                  fdn_ref, fup_ref, *, mm: str, G: int, C: int,
                  nb_angles: int, lamb: bool):
    """I₁ init pass: evaluate the closed-form first order per chunk and
    write the HBM half-field planes — the streamed twin of the resident
    kernel's ``pre`` (the host-side I₁ materialization + lane transposes
    were ~30% of the canonical solve, the r5 ablation's 'fixed' share).
    tiles (NI, M, C) are per-COLUMN constants (replicated across the
    grid); pack carries the I1_PACK_KEYS rows (i1='kernel' assembly)."""
    M = fdn_ref.shape[1]
    GC = G * C
    mr = nb_angles
    dtype = fdn_ref.dtype
    dot3 = functools.partial(_dot3, mm=mm, dtype=dtype)
    rowf_c = jax.lax.broadcasted_iota(jnp.int32, (M, C), 0).astype(dtype)
    row0_c = rowf_c < 0.5
    lastrow_c = rowf_c > mr - 1.5
    rowf_g = jax.lax.broadcasted_iota(jnp.int32, (M, GC), 0).astype(dtype)
    emu_dn = colc_ref[RC_EMU_DN, :, 0:1]
    ivup = colc_ref[RC_IVUP, :, 0:1]
    pka = colc_ref[RC_PKA, :, 0:1]
    pkr = colc_ref[RC_PKR, :, 0:1]
    constc = cpar_ref[CP_CONST:CP_CONST + 1, :]
    i1_block = make_i1_block(lambda i: tiles_ref[i], emu_dn, ivup,
                             row0_c, lastrow_c, constc, pka, pkr, lamb, M)
    pk = pack_ref[0]
    astar = pk[PK_ASTAR:PK_ASTAR + 1, :]                 # (1, GC)
    et = jnp.where(rowf_g < 0.5, 0.0, jnp.exp(astar * ivup))
    eout = dot3(astk_hi, astk_lo, et) if lamb else et
    for k in range(G):
        sl = slice(k * C, (k + 1) * C)
        i1d, i1u = i1_block(pk, eout, et, sl)
        fdn_ref[0, :, sl] = i1d
        fup_ref[0, :, sl] = i1u


def _rep(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _fwd(r):
    return pl.BlockSpec((1, r[0], r[1]), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _rev_spec(r, ng):
    return pl.BlockSpec((1, r[0], r[1]), lambda i: (ng - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)


def stream_order_loop(pack, cpar, ops, ws, i1dn=None, i1up=None, *,
                      nb_angles: int, tol: float, max_orders: int,
                      cols_per_block: int, mm: str, interpret: bool = False,
                      outputs: str = "summary", ablate: str = "",
                      i1c=None, surface: str = "lambertian"):
    """Run the streamed whole-solve order loop.

    pack: (NG, PK_W, nblk·G·C); cpar: (CP_W, B).  First-order init:
    either ``i1dn``/``i1up`` (NG, M, nblk·G·C) angle-major half fields
    (the 'host' i1 mode of fused.solve_batch_mega), or ``i1c`` — the
    in-kernel I₁ inputs dict (tiles (NI, M, B), astk split operator,
    colc_pk rows; same contract as megakernel.mega_call) evaluated by a
    streamed init pass, which removes the host-side (B, L, 2M)
    materialization + lane transposes (~30% of the canonical solve,
    r5 ablation).  Returns, like megakernel.mega_call:
    summary → (toa_dn, toa_up, srf_dn, srf_up (M, B), stats (3, B));
    full → (itot_dn, itot_up (NG, M, nblk·G·C), stats)."""
    NG, PKW, GB = pack.shape
    M = i1c["tiles"].shape[1] if i1c is not None else i1dn.shape[1]
    C = cols_per_block
    B = cpar.shape[1]
    G = GB // B
    GC = G * C
    nblk = B // C
    dtype = pack.dtype
    mr = nb_angles
    ws_hi, ws_lo = ws
    colc = ops["colc"]
    if i1c is not None:
        # append the per-angle excised-singularity columns (RC_PKA/RC_PKR)
        pk2 = jnp.broadcast_to(
            jnp.asarray(i1c["colc_pk"], dtype)[:, :, None],
            (2, colc.shape[1], colc.shape[2]))
        colc = jnp.concatenate([colc, pk2], axis=0)
        astk_hi, astk_lo = i1c["astk"]
    wall_hi, wall_lo = ops["wall"]
    place_hi, place_lo = ops["place"]
    bc_hi, bc_lo = ops["bcmat"]
    pvt = ops["pvt"]

    ab = frozenset(ablate.split(",")) if ablate else frozenset()
    kernA = functools.partial(_passA_kernel, mm=mm, G=G, C=C, ab=ab)
    kernB = functools.partial(_passB_kernel, mm=mm, G=G, C=C,
                              nb_angles=mr, ab=ab)
    kernI = functools.partial(_passI_kernel, mm=mm, G=G, C=C,
                              nb_angles=mr, lamb=surface == "lambertian")
    fshape = jax.ShapeDtypeStruct((NG, M, GC), dtype)
    cparams = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=128 * 1024 * 1024)

    def passI(pack_b, cpar_b, tiles_b):
        return pl.pallas_call(
            kernI,
            grid_spec=pl.GridSpec(
                grid=(NG,),
                in_specs=[_fwd((PKW, GC)), _rep(tiles_b.shape),
                          _rep(cpar_b.shape), _rep(colc.shape),
                          _rep(astk_hi.shape), _rep(astk_lo.shape)],
                out_specs=[_fwd((M, GC)), _fwd((M, GC))],
            ),
            out_shape=[fshape, fshape],
            compiler_params=cparams,
            interpret=interpret,
        )(pack_b, tiles_b, cpar_b, colc, astk_hi, astk_lo)

    def passA(pack_b, fdn, fup):
        return pl.pallas_call(
            kernA,
            grid_spec=pl.GridSpec(
                grid=(NG,),
                in_specs=[_fwd((PKW, GC)), _fwd((M, GC)), _fwd((M, GC)),
                          _rep(colc.shape), _rep(ws_hi.shape),
                          _rep(ws_lo.shape)],
                out_specs=[_fwd((M, GC)), _fwd((M, GC))],
                scratch_shapes=[pltpu.VMEM((M, C), dtype)],
            ),
            out_shape=[fshape, fshape],
            compiler_params=cparams,
            interpret=interpret,
        )(pack_b, fdn, fup, colc, ws_hi, ws_lo)

    def passB(pack_b, cpar_b, sdn, jnup):
        return pl.pallas_call(
            kernB,
            grid_spec=pl.GridSpec(
                grid=(NG,),
                in_specs=[_rev_spec((PKW, GC), NG), _rev_spec((M, GC), NG),
                          _rev_spec((M, GC), NG),
                          _rep(cpar_b.shape), _rep(colc.shape),
                          _rep(wall_hi.shape), _rep(wall_lo.shape),
                          _rep(place_hi.shape), _rep(place_lo.shape),
                          _rep(bc_hi.shape), _rep(bc_lo.shape),
                          _rep(pvt.shape)],
                out_specs=[_rev_spec((M, GC), NG), _rev_spec((M, GC), NG)],
                scratch_shapes=[pltpu.VMEM((M, C), dtype)] * 3,
            ),
            out_shape=[fshape, fshape],
            compiler_params=cparams,
            interpret=interpret,
        )(pack_b, sdn, jnup, cpar_b, colc, wall_hi, wall_lo,
          place_hi, place_lo, bc_hi, bc_lo, pvt)

    rowf_c = jax.lax.broadcasted_iota(jnp.int32, (M, C), 0)
    real_c = rowf_c < mr                                 # non-pad rows

    def ratio_rows(new_top, tot_top, new_bot, tot_bot):
        # shared with the resident kernel (megakernel.ratio_rows_tile)
        return ratio_rows_tile(new_top, tot_top, new_bot, tot_bot, real_c)

    full = outputs == "full"
    last = slice(GC - C, GC)

    def solve_block(blk):
        if i1c is not None:
            pack_b, cpar_b, tiles_b = blk
            fdn0, fup0 = passI(pack_b, cpar_b, tiles_b)
        else:
            pack_b, cpar_b, fdn0, fup0 = blk
        t_dn = fdn0[0][:, 0:C]
        t_up = fup0[0][:, 0:C]
        s_dn = fdn0[NG - 1][:, last]
        s_up = fup0[NG - 1][:, last]
        ratio0 = jnp.full((1, C), 2.0 * tol, dtype)
        n0 = jnp.ones((1, C), dtype)
        if full:
            acc0 = (fdn0, fup0)
        else:
            acc0 = ()

        def cond(carry):
            ratio = carry[4]
            if "sccond" in ab:
                return carry[5][0, 0] < max_orders
            if "noconv" in ab:
                return jnp.max(carry[5]) < max_orders
            return jnp.any(ratio >= tol) & (jnp.max(carry[5]) < max_orders)

        def body(carry):
            fdn, fup, tiles, acc, ratio, n = carry
            t_dn, t_up, s_dn, s_up = tiles
            active = (ratio >= tol).astype(dtype)        # (1, C)
            if "nopassA" in ab:
                sdn, jnup = fdn, fup
            else:
                sdn, jnup = passA(pack_b, fdn, fup)
            if "nopassB" in ab:
                fdn2, fup2 = sdn, jnup
            else:
                fdn2, fup2 = passB(pack_b, cpar_b, sdn, jnup)
            if "notiles" not in ab:
                t_dn = t_dn + active * fdn2[0][:, 0:C]
                t_up = t_up + active * fup2[0][:, 0:C]
                s_dn = s_dn + active * fdn2[NG - 1][:, last]
                s_up = s_up + active * fup2[NG - 1][:, last]
            if full:
                ag = jnp.tile(active, (1, G))            # (1, GC)
                acc = (acc[0] + ag * fdn2, acc[1] + ag * fup2)
            if "noratio" not in ab:
                rnew = ratio_rows(fup2[0][:, 0:C], t_up,
                                  fdn2[NG - 1][:, last], s_dn)
                ratio = jnp.where(active > 0.5, rnew, ratio)
            n = n + (1.0 if "noconv" in ab else active)
            return fdn2, fup2, (t_dn, t_up, s_dn, s_up), acc, ratio, n

        fdn, fup, tiles, acc, ratio, n = jax.lax.while_loop(
            cond, body, (fdn0, fup0, (t_dn, t_up, s_dn, s_up), acc0,
                         ratio0, n0))
        t_dn, t_up, s_dn, s_up = tiles
        stats = jnp.concatenate(
            [n, (ratio < tol).astype(dtype), ratio], axis=0)  # (3, C)
        if full:
            return acc[0], acc[1], stats
        return t_dn, t_up, s_dn, s_up, stats

    # split the batch into blocks: lanes of block i are [i·GC, (i+1)·GC)
    def blocked3(x):
        return x.reshape(x.shape[0], x.shape[1], nblk, GC).transpose(
            2, 0, 1, 3)

    blk_in = (blocked3(pack),
              cpar.reshape(cpar.shape[0], nblk, C).transpose(1, 0, 2))
    if i1c is not None:
        tiles = i1c["tiles"]                             # (NI, M, B)
        blk_in += (tiles.reshape(tiles.shape[0], M, nblk, C)
                   .transpose(2, 0, 1, 3),)
    else:
        blk_in += (blocked3(i1dn), blocked3(i1up))
    if nblk == 1:
        out = tuple(x[None] for x in solve_block(
            tuple(x[0] for x in blk_in)))
    else:
        out = jax.lax.map(solve_block, blk_in)

    def unblock2(x):                                     # (nblk, R, C) → (R, B)
        return x.transpose(1, 0, 2).reshape(x.shape[1], B)

    stats = unblock2(out[-1])
    if full:
        def unblock3(x):                                 # → (NG, M, GB)
            return x.transpose(1, 2, 0, 3).reshape(NG, M, GB)

        return unblock3(out[0]), unblock3(out[1]), stats
    return tuple(unblock2(t) for t in out[:4]) + (stats,)
