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

Performance notes:
- attenuations / quadrature weights are precomputed VECTORIZED into VMEM
  scratch before the sequential loop (the loop body is then 4 fused
  vector ops);
- the scan loop is unrolled ×8 (per-iteration work is small, Mosaic loop
  overhead would dominate otherwise);
- the join-row extraction and the final chaining+smoothing pass are
  fully vectorized over all layers (no fori).

Layouts (Mosaic: dynamic offsets only on sublane axes):
- fields (bt, L, M): layers on sublanes, angles on lanes;
- per-layer scalars packed as ``pack`` (bt, L, 8) lanes =
  [τ, join-drop, chain1(t≤idx_down), chain2(t<idx_up), onehot(r1),
   onehot(r2), τ-halfstep, 0];
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

# pack lane indices
PK_TAU, PK_DROP, PK_CH1, PK_CH2, PK_R1, PK_R2, PK_HDT = range(7)
PK_W = 8


def _row(ref, t):
    """(bt, m) dynamic layer-row read from a (bt, L, m) ref."""
    return ref[:, pl.ds(t, 1), :][:, 0, :]


def _set_row(ref, t, val):
    ref[:, pl.ds(t, 1), :] = val[:, None, :]


def _pk(pack_ref, t, lane):
    """(bt, 1) packed per-layer scalar."""
    return pack_ref[:, pl.ds(t, 1), lane]


def _down_kernel(pack_ref, mu_ref, jn_ref, out_ref, att_ref):
    bt, L, md = jn_ref.shape
    dtype = jn_ref.dtype
    mu = mu_ref[0][None, :]                      # (1, Md), µ=0 passed safe
    inv_mu = 1.0 / mu

    # vectorized precompute: per-step attenuation into scratch
    tau = pack_ref[:, :, PK_TAU]                 # (bt, L)
    dt = tau[:, 1:] - tau[:, :-1]
    att_ref[:, 0, :] = jnp.zeros((bt, md), dtype)
    att_ref[:, 1:, :] = jnp.exp(dt[:, :, None] * inv_mu[:, None, :])
    out_ref[:, 0, :] = jnp.zeros((bt, md), dtype)

    n_chunks = (L - 1) // UNROLL

    def chunk(ci, s):
        base = 1 + ci * UNROLL
        a_blk = att_ref[:, pl.ds(base, UNROLL), :]
        j_blk = jn_ref[:, pl.ds(base - 1, UNROLL + 1), :]
        w_blk = pack_ref[:, pl.ds(base, UNROLL), PK_HDT]     # (bt, U)
        rows = []
        for u in range(UNROLL):
            w = w_blk[:, u][:, None]
            a = a_blk[:, u, :]
            s = a * s + w * (j_blk[:, u, :] * a + j_blk[:, u + 1, :])
            rows.append(-s * inv_mu[0][None, :])
        out_ref[:, pl.ds(base, UNROLL), :] = jnp.stack(rows, axis=1)
        return s

    s = jax.lax.fori_loop(0, n_chunks, chunk, jnp.zeros((bt, md), dtype))

    if (L - 1) % UNROLL:
        def tail(t, s):
            w = _pk(pack_ref, t, PK_HDT)
            a = _row(att_ref, t)
            s = a * s + w * (_row(jn_ref, t - 1) * a + _row(jn_ref, t))
            _set_row(out_ref, t, -s * inv_mu[0][None, :])
            return s

        jax.lax.fori_loop(1 + n_chunks * UNROLL, L, tail, s)


def down_sweep_pallas(jn_down, pack, mu_down_safe, block_b: int = 32,
                      interpret: bool = False):
    """jn_down: (B, L, Md); pack: (B, L, 8); mu_down_safe: (Md,), µ=0→-1."""
    b, L, md = jn_down.shape
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

    # vectorized precompute: a_t = e^{-Δτ_{t+1}/µ} stored at slot t
    tau = pack_ref[:, :, PK_TAU]
    dt = tau[:, 1:] - tau[:, :-1]                # slot t: τ_{t+1}-τ_t
    att_ref[:, :L - 1, :] = jnp.exp(-dt[:, :, None] * inv_mu[:, None, :])
    att_ref[:, L - 1, :] = jnp.zeros((bt, m), dtype)

    i_surf = jnp.where(lane0, jn_ref[:, L - 1, :], bc_ref[:, :])
    scratch_ref[:, L - 1, :] = i_surf

    n_chunks = (L - 1) // UNROLL

    def chunk(ci, carry):
        hi = L - 1 - ci * UNROLL                  # rows [hi-U, hi)
        base = hi - UNROLL
        a_blk = att_ref[:, pl.ds(base, UNROLL), :]
        j_blk = jn_ref[:, pl.ds(base, UNROLL + 1), :]
        w_blk = pack_ref[:, pl.ds(base + 1, UNROLL), PK_HDT]  # Δτ/2 at t+1
        drop_blk = pack_ref[:, pl.ds(base, UNROLL), PK_DROP]
        rows = []
        for u in range(UNROLL - 1, -1, -1):
            a = a_blk[:, u, :]
            w = w_blk[:, u][:, None]
            drop = drop_blk[:, u][:, None]
            c = w * inv_mu * (j_blk[:, u, :] + j_blk[:, u + 1, :] * a)
            c = jnp.where(drop > 0.5, 0.0, c)
            carry = a * carry + c
            carry = jnp.where(lane0, j_blk[:, u, :], carry)
            rows.append(carry)
        out_blk = jnp.stack(rows[::-1], axis=1)
        scratch_ref[:, pl.ds(base, UNROLL), :] = out_blk
        return carry

    carry = jax.lax.fori_loop(0, n_chunks, chunk, i_surf)

    if (L - 1) % UNROLL:
        def tail(k, carry):
            t = L - 2 - n_chunks * UNROLL - k
            a = _row(att_ref, t)
            w = _pk(pack_ref, t + 1, PK_HDT)
            drop = _pk(pack_ref, t, PK_DROP)
            c = w * inv_mu * (_row(jn_ref, t) + _row(jn_ref, t + 1) * a)
            c = jnp.where(drop > 0.5, 0.0, c)
            carry = a * carry + c
            carry = jnp.where(lane0, _row(jn_ref, t), carry)
            _set_row(scratch_ref, t, carry)
            return carry

        jax.lax.fori_loop(0, (L - 1) % UNROLL, tail, carry)

    # vectorized join-row extraction + smoothing deltas
    scratch = scratch_ref[:, :, :]                           # (bt, L, m)
    row1 = jnp.sum(pack_ref[:, :, PK_R1][:, :, None] * scratch, axis=1)
    row2 = jnp.sum(pack_ref[:, :, PK_R2][:, :, None] * scratch, axis=1)
    tau_r1 = cpar_ref[:, 0:1]
    tau_r2 = cpar_ref[:, 1:2]
    d1 = _smooth_rows(row1, mu_row, m) - row1
    att_12 = jnp.exp(-jnp.maximum(tau_r1 - tau_r2, 0.0) * inv_mu)
    row2c = row2 + d1 * att_12
    d2 = _smooth_rows(row2c, mu_row, m) - row2c

    # final pass: chaining + smoothing, chunked over layers to bound the
    # VMEM held by temporaries (the all-layers version overflows VMEM)
    CH = 8
    mu_rows = jnp.broadcast_to(mu_row, (bt * CH, m))

    def fchunk(ci, _):
        base = ci * CH
        blk = scratch_ref[:, pl.ds(base, CH), :]             # (bt, CH, m)
        tau_blk = pack_ref[:, pl.ds(base, CH), PK_TAU]       # (bt, CH)
        ch1 = pack_ref[:, pl.ds(base, CH), PK_CH1]
        ch2 = pack_ref[:, pl.ds(base, CH), PK_CH2]
        att1 = jnp.exp(-jnp.maximum(tau_r1[:, :, None] - tau_blk[:, :, None],
                                    0.0) * inv_mu[:, None, :])
        att2 = jnp.exp(-jnp.maximum(tau_r2[:, :, None] - tau_blk[:, :, None],
                                    0.0) * inv_mu[:, None, :])
        corr = (ch1[:, :, None] * d1[:, None, :] * att1
                + ch2[:, :, None] * d2[:, None, :] * att2)
        corr = jnp.where(lane0[:, None, :], 0.0, corr)
        field = blk + corr
        sm = _smooth_rows(field.reshape(bt * CH, m), mu_rows, m)
        out_ref[:, pl.ds(base, CH), :] = sm.reshape(bt, CH, m)
        return 0

    jax.lax.fori_loop(0, L // CH, fchunk, 0)

    if L % CH:
        def frow(t, _):
            tau_t = _pk(pack_ref, t, PK_TAU)
            att1 = jnp.exp(-jnp.maximum(tau_r1 - tau_t, 0.0) * inv_mu)
            att2 = jnp.exp(-jnp.maximum(tau_r2 - tau_t, 0.0) * inv_mu)
            base = _row(scratch_ref, t)
            row = (base + _pk(pack_ref, t, PK_CH1) * d1 * att1
                   + _pk(pack_ref, t, PK_CH2) * d2 * att2)
            row = jnp.where(lane0, base, row)
            _set_row(out_ref, t, _smooth_rows(row, mu_row, m))
            return 0

        jax.lax.fori_loop((L // CH) * CH, L, frow, 0)


def up_sweep_smooth_pallas(jn_up, pack, cparams, mu_up_row, bc,
                           block_b: int = 32, interpret: bool = False):
    """jn_up: (B, L, M) columns M..2M-1 (lane 0 = µ=0⁺ column).

    pack: (B, L, 8) per-layer scalars; cparams: (B, 8) per-column
    scalars [τ_r1, τ_r2, ...]; bc: (B, M) with lane 0 unused.
    """
    b, L, m = jn_up.shape
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
        interpret=interpret,
    )(pack, cparams, mu_up_row[None, :], jn_up, bc)


def build_pack(tau, idx_up, idx_down, dtype):
    """(B, L, 8) per-layer pack + (B, 8) per-column scalars.

    Loop-invariant; build once per solve (see module docstring for lanes).
    """
    B, L = tau.shape
    t = jnp.arange(L)[None, :]
    iu = idx_up[:, None]
    idn = idx_down[:, None]
    drop = ((t == idn) | (t == iu - 1)).astype(dtype)
    ch1 = (t <= idn).astype(dtype)
    ch2 = (t < iu).astype(dtype)
    r1 = (t == idn + 1).astype(dtype)
    r2 = (t == iu).astype(dtype)
    hdt = jnp.concatenate(
        [jnp.zeros((B, 1), dtype), 0.5 * (tau[:, 1:] - tau[:, :-1])], axis=1)
    zeros = jnp.zeros_like(tau)
    pack = jnp.stack([tau.astype(dtype), drop, ch1, ch2, r1, r2,
                      hdt.astype(dtype), zeros], axis=-1)
    tau_r1 = jnp.sum(r1 * tau, axis=1)
    tau_r2 = jnp.sum(r2 * tau, axis=1)
    cparams = jnp.stack([tau_r1, tau_r2] + [jnp.zeros((B,), dtype)] * 6,
                        axis=-1)
    return pack, cparams
