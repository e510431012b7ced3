"""Pallas TPU kernels: fused radiance sweeps.

The jnp order step is HBM-bound: ~30 full-field elementwise passes per
scattering order (scan shells, masks, smoothing, chaining).  These two
kernels collapse the *wide* work to one read of Jₙ and one write of Iₙ
per sweep direction, with everything else living in VMEM:

- ``down_sweep_pallas``: the forward affine recurrence
      S_t = e^{Δτ/µ} S_{t-1} + (Δτ/2)(J_{t-1} e^{Δτ/µ} + J_t),
      I_t = −S_t/µ
  over all µ≤0 columns (main_lambertian.py:332-387 telescoped).

- ``up_sweep_smooth_pallas``: the reverse recurrence with the surface BC,
  the region-join quadrature drops, the smoothed-boundary chaining at the
  two region joins, and the µ→0⁺ smoothing walk (main_lambertian.py:
  390-451) — all in one kernel pass.

The *narrow* small-µ and polyfit-band fixes (a handful of columns) stay
in XLA between the kernels (sos_rt_tpu/fused.py) — their tensors are
(B, L, ≤30) and cost nothing.

Performance/lowering notes:
- attenuations are precomputed VECTORIZED into VMEM scratch with an
  identity step at the boundary row, so the scan loop reads 8-row
  ALIGNED blocks only (unaligned dynamic sublane offsets make Mosaic
  compilation pathological); the J row one past the block edge is
  carried between chunk iterations;
- the scan loop is unrolled ×8 (per-iteration vector work is small,
  Mosaic loop overhead would dominate otherwise);
- the final chaining+smoothing pass is vectorized in 8-row chunks
  (bounding VMEM temporaries).

Layouts (Mosaic: dynamic offsets only on sublane axes):
- fields (bt, L, M): layers on sublanes, angles on lanes; L % 8 == 0
  required for the fused path (pad the grid otherwise);
- per-layer scalars packed as ``pack`` (bt, L, 8) lanes =
  [τ, join-drop, chain1(t≤idx_down), chain2(t<idx_up), onehot(r1),
   onehot(r2), Δτ/2 at slot t (down), Δτ/2 of [t,t+1] at slot t (up)];
- per-column scalars ``cparams`` (bt, 8) = [τ_r1, τ_r2, 0...].

The up kernel's lane 0 is the µ=0⁺ column (I = Jₙ, no recurrence);
lanes 1..M-1 are µ>0.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SMOOTH_TOL = 1e-4
BIG = 1e9
UNROLL = 8

# Largest per-kernel batch block that fits the 16 MB scoped-VMEM budget of
# one TensorCore (measured on v5e at L=128, M=64: block 16 compiles, 32
# exceeds the limit via the attenuation scratch + unroll temporaries).
# Compiled path clamps to min(this, the grid-size-aware cap below);
# interpret mode is unconstrained.
MAX_COMPILED_BLOCK_B = 16

# Per-plane allowance for the block cap.  The scoped-VMEM accounting
# covers ALL kernel buffers — double-buffered in/out windows + scratch ≈
# 5 (block, L, M) planes (measured: block 8 at 800×501 requests 43.75 MB
# against the 16 MB default) — so both kernels raise the limit to
# 100 MB via CompilerParams and the cap keeps 5 planes within it.
# Floor of 8: the kernels' 2-D blocks (cparams/bc) put the batch dim on
# sublanes, which Mosaic requires divisible by 8.
_PLANE_BUDGET = 15e6


def _block_cap(L: int, m: int) -> int:
    """Largest power-of-two block ≥ 8 with (block, L, m) f32 within the
    per-allocation scoped-VMEM budget."""
    cap = max(8, int(_PLANE_BUDGET / (L * m * 4)))
    return 1 << (cap.bit_length() - 1)


def effective_block(L: int, m: int, block_b: int, interpret: bool) -> int:
    """The batch block both sweep kernels will actually use — callers
    must pad B to a multiple of this (grid = B // block truncates!)."""
    if interpret:
        return max(1, block_b)
    return max(1, min(block_b, MAX_COMPILED_BLOCK_B, _block_cap(L, m)))

# pack lane indices
PK_TAU, PK_DROP, PK_CH1, PK_CH2, PK_R1, PK_R2, PK_HDT_DN, PK_HDT_UP = range(8)
PK_W = 8


def _down_kernel(pack_ref, mu_ref, jn_ref, out_ref, att_ref):
    bt, L, md = jn_ref.shape
    dtype = jn_ref.dtype
    inv_mu = 1.0 / mu_ref[0][None, :]            # (1, Md), µ=0 passed safe

    # att slot t = e^{Δτ_t/µ}; slot 0 = identity (a=1, and hdt[0]=0 → b=0).
    # Δτ_t = 2·(Δτ/2 pack lane) — avoids lane-axis concats, which Mosaic
    # cannot lower.
    dt0 = 2.0 * pack_ref[:, :, PK_HDT_DN]        # (bt, L)
    att_ref[:, :, :] = jnp.exp(dt0[:, :, None] * inv_mu[:, None, :])

    def chunk(ci, carry):
        s, j_prev = carry
        base = pl.multiple_of(ci * UNROLL, UNROLL)
        a_blk = att_ref[:, pl.ds(base, UNROLL), :]
        j_blk = jn_ref[:, pl.ds(base, UNROLL), :]
        w_blk = pack_ref[:, pl.ds(base, UNROLL), PK_HDT_DN]  # (bt, U)
        rows = []
        for u in range(UNROLL):
            w = w_blk[:, u][:, None]
            a = a_blk[:, u, :]
            j_t = j_blk[:, u, :]
            s = a * s + w * (j_prev * a + j_t)
            j_prev = j_t
            rows.append(-s * inv_mu[0][None, :])
        out_ref[:, pl.ds(base, UNROLL), :] = jnp.stack(rows, axis=1)
        return s, j_prev

    jax.lax.fori_loop(0, L // UNROLL, chunk,
                      (jnp.zeros((bt, md), dtype), jnp.zeros((bt, md), dtype)))


def down_sweep_pallas(jn_down, pack, mu_down_safe, block_b: int = 16,
                      interpret: bool = False):
    """jn_down: (B, L, Md); pack: (B, L, 8); mu_down_safe: (Md,), µ=0→-1.

    NOTE: on the compiled path ``block_b`` is clamped to
    min(``MAX_COMPILED_BLOCK_B``, ``_block_cap(L, M)``) — larger blocks
    exceed the scoped-VMEM budget (see the constants' comments; at the
    canonical 800×501 grid the cap is 8).  Callers tuning block sizes
    (solve_batch(engine='fused', block_b=...)) should expect requests
    above the clamp to compile at the clamp.
    """
    b, L, md = jn_down.shape
    assert L % UNROLL == 0, f"fused path requires nb_layers % {UNROLL} == 0"
    if not interpret:
        block_b = min(block_b, MAX_COMPILED_BLOCK_B, _block_cap(L, md))
    block_b = min(block_b, b)
    grid = (b // block_b,)
    return pl.pallas_call(
        _down_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, L, PK_W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, md), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, L, md), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, L, md), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, L, md), jn_down.dtype),
        scratch_shapes=[pltpu.VMEM((block_b, L, md), jn_down.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(pack, mu_down_safe[None, :], jn_down)


def _smooth_rows(row, mu_row, m):
    """µ→0⁺ smoothing walk on a (rows, M) batch; lane 0 is µ=0⁺."""
    r = row.shape[0]
    d = jnp.abs((row[:, 1:m - 2] - row[:, 2:m - 1])
                - (row[:, 2:m - 1] - row[:, 3:m]))
    ok = d <= SMOOTH_TOL
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, m - 3), 1) + 1
    first = jnp.min(jnp.where(ok, lane, jnp.int32(BIG)), axis=1)
    stop = jnp.minimum(first, m - 3)
    idx = stop + 1                                           # (rows,)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (r, m), 1)
    onehot = (lanes == idx[:, None]).astype(row.dtype)
    i_val = jnp.sum(row * onehot, axis=1)
    mu_idx = jnp.sum(mu_row * onehot, axis=1)
    weight = mu_row / mu_idx[:, None]
    blended = (1.0 - weight) * row[:, 0:1] + weight * i_val[:, None]
    do = (lanes >= 1) & (lanes < idx[:, None])
    return jnp.where(do, blended, row)


def _up_kernel(pack_ref, cpar_ref, mu_ref, jn_ref, bc_ref, out_ref,
               scratch_ref, att_ref):
    bt, L, m = jn_ref.shape
    dtype = jn_ref.dtype
    mu_row = mu_ref[0][None, :]                 # lane 0 = 0 (µ=0⁺)
    mu_safe = jnp.where(mu_row == 0, 1.0, mu_row)
    inv_mu = 1.0 / mu_safe
    lane0 = (jax.lax.broadcasted_iota(jnp.int32, (bt, m), 1) == 0)

    # att slot t = e^{-Δτ_{t+1}/µ} for t<L-1; slot L-1 = 1 (identity step;
    # pack DROP[L-1] = 1 so its local quadrature is zero).  Δτ from the
    # packed Δτ/2 lane — no lane-axis concats.
    dtp = 2.0 * pack_ref[:, :, PK_HDT_UP]
    att_ref[:, :, :] = jnp.exp(-dtp[:, :, None] * inv_mu[:, None, :])

    i_surf = jnp.where(lane0, jn_ref[:, L - 1, :], bc_ref[:, :])

    def chunk(ci, carry):
        s, j_next = carry
        base = pl.multiple_of((L // UNROLL - 1 - ci) * UNROLL, UNROLL)
        a_blk = att_ref[:, pl.ds(base, UNROLL), :]
        j_blk = jn_ref[:, pl.ds(base, UNROLL), :]
        w_blk = pack_ref[:, pl.ds(base, UNROLL), PK_HDT_UP]
        d_blk = pack_ref[:, pl.ds(base, UNROLL), PK_DROP]
        rows = []
        for u in range(UNROLL - 1, -1, -1):
            a = a_blk[:, u, :]
            w = w_blk[:, u][:, None]
            drop = d_blk[:, u][:, None]
            j_t = j_blk[:, u, :]
            c = w * inv_mu * (j_t + j_next * a)
            c = jnp.where(drop > 0.5, 0.0, c)
            s = a * s + c
            s = jnp.where(lane0, j_t, s)
            j_next = j_t
            rows.append(s)
        scratch_ref[:, pl.ds(base, UNROLL), :] = jnp.stack(rows[::-1], axis=1)
        return s, j_next

    # first processed row is t=L-1 with the identity step: a=1, drop=1,
    # carry s = i_surf so scratch[L-1] = i_surf
    jax.lax.fori_loop(0, L // UNROLL, chunk,
                      (i_surf, jnp.zeros((bt, m), dtype)))

    # vectorized join-row extraction + smoothing deltas
    scratch = scratch_ref[:, :, :]                           # (bt, L, m)
    row1 = jnp.sum(pack_ref[:, :, PK_R1][:, :, None] * scratch, axis=1)
    row2 = jnp.sum(pack_ref[:, :, PK_R2][:, :, None] * scratch, axis=1)
    tau_r1 = cpar_ref[:, 0:1]
    tau_r2 = cpar_ref[:, 1:2]
    d1 = _smooth_rows(row1, mu_row, m) - row1
    # r2 = idx_up ≤ idx_down = r1-1, so the d1 chain always reaches row r2
    att_12 = jnp.exp(-jnp.maximum(tau_r1 - tau_r2, 0.0) * inv_mu)
    row2c = row2 + d1 * att_12
    d2 = _smooth_rows(row2c, mu_row, m) - row2c

    # final pass: chaining + smoothing, in 8-row chunks (bounds VMEM temps)
    mu_rows = jnp.broadcast_to(mu_row, (bt * UNROLL, m))

    def fchunk(ci, _):
        base = pl.multiple_of(ci * UNROLL, UNROLL)
        blk = scratch_ref[:, pl.ds(base, UNROLL), :]
        tau_blk = pack_ref[:, pl.ds(base, UNROLL), PK_TAU]
        ch1 = pack_ref[:, pl.ds(base, UNROLL), PK_CH1]
        ch2 = pack_ref[:, pl.ds(base, UNROLL), PK_CH2]
        att1 = jnp.exp(-jnp.maximum(tau_r1[:, :, None] - tau_blk[:, :, None],
                                    0.0) * inv_mu[:, None, :])
        att2 = jnp.exp(-jnp.maximum(tau_r2[:, :, None] - tau_blk[:, :, None],
                                    0.0) * inv_mu[:, None, :])
        corr = (ch1[:, :, None] * d1[:, None, :] * att1
                + ch2[:, :, None] * d2[:, None, :] * att2)
        corr = jnp.where(lane0[:, None, :], 0.0, corr)
        field = blk + corr
        sm = _smooth_rows(field.reshape(bt * UNROLL, m), mu_rows, m)
        out_ref[:, pl.ds(base, UNROLL), :] = sm.reshape(bt, UNROLL, m)
        return 0

    jax.lax.fori_loop(0, L // UNROLL, fchunk, 0)


def up_sweep_smooth_pallas(jn_up, pack, cparams, mu_up_row, bc,
                           block_b: int = 16, interpret: bool = False):
    """jn_up: (B, L, M) columns M..2M-1 (lane 0 = µ=0⁺ column).

    pack: (B, L, 8) per-layer scalars; cparams: (B, 8) per-column
    scalars [τ_r1, τ_r2, ...]; bc: (B, M) with lane 0 unused.
    """
    b, L, m = jn_up.shape
    assert L % UNROLL == 0, f"fused path requires nb_layers % {UNROLL} == 0"
    if not interpret:
        block_b = min(block_b, MAX_COMPILED_BLOCK_B, _block_cap(L, m))
    block_b = min(block_b, b)
    grid = (b // block_b,)
    return pl.pallas_call(
        _up_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, L, PK_W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, L, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, L, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, L, m), jn_up.dtype),
        scratch_shapes=[pltpu.VMEM((block_b, L, m), jn_up.dtype),
                        pltpu.VMEM((block_b, L, m), jn_up.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(pack, cparams, mu_up_row[None, :], jn_up, bc)


def build_pack(tau, idx_up, idx_down, dtype):
    """(B, L, 8) per-layer pack + (B, 8) per-column scalars.

    Loop-invariant; build once per solve (see module docstring for lanes).
    DROP is forced to 1 at t = L-1 (the up kernel's identity step — the
    reverse recurrence has no interval above the surface row).
    """
    B, L = tau.shape
    t = jnp.arange(L)[None, :]
    iu = idx_up[:, None]
    idn = idx_down[:, None]
    drop = ((t == idn) | (t == iu - 1) | (t == L - 1)).astype(dtype)
    ch1 = (t <= idn).astype(dtype)
    ch2 = (t < iu).astype(dtype)
    r1 = (t == idn + 1).astype(dtype)
    r2 = (t == iu).astype(dtype)
    dt = tau[:, 1:] - tau[:, :-1]
    hdt_dn = jnp.concatenate(
        [jnp.zeros((B, 1), dtype), 0.5 * dt], axis=1).astype(dtype)
    hdt_up = jnp.concatenate(
        [0.5 * dt, jnp.zeros((B, 1), dtype)], axis=1).astype(dtype)
    pack = jnp.stack([tau.astype(dtype), drop, ch1, ch2, r1, r2,
                      hdt_dn, hdt_up], axis=-1)
    tau_r1 = jnp.sum(r1 * tau, axis=1)
    tau_r2 = jnp.sum(r2 * tau, axis=1)
    cparams = jnp.stack([tau_r1, tau_r2] + [jnp.zeros((B,), dtype)] * 6,
                        axis=-1)
    return pack, cparams
