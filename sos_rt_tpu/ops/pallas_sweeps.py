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

Layout (r4 rewrite — LAYER-MAJOR): kernel buffers are (L, bt, M) so
each layer step reads/writes a NATURAL (bt, M) tile.  The previous
(bt, L, M) layout put layers on sublanes: every per-layer row
extraction (``a_blk[:, u, :]``) and the per-chunk ``jnp.stack`` write
was a cross-sublane relayout, and the kernels ran ~40 ms/order at the
64-angle sweep grid regardless of block size (measured r4 — VPU
shuffle-bound, not bandwidth- or issue-bound).  Layer-major removes
every relayout from the scan loop; the host-side transposes this costs
are two (B, L, M) copies per call (~0.2 ms at B=8192 — XLA fuses them
into neighbors).  Attenuations are computed INLINE per layer (no
(L, bt, M) scratch pass), and the up kernel accumulates its region-join
rows during the scan instead of re-reducing the scratch afterwards.

The scan loop is an 8-step-unrolled ``fori_loop`` over layers (L % 8
== 0 required — pad the grid otherwise); dynamic leading-dim indexing
of a (L, bt, M) ref is tile-aligned and free.

Per-layer scalars are packed as ``pack`` (B, L, 8) lanes =
[τ, join-drop, chain1(t≤idx_down), chain2(t<idx_up), onehot(r1),
 onehot(r2), Δτ/2 at slot t (down), Δτ/2 of [t,t+1] at slot t (up)];
per-column scalars ``cparams`` (B, 8) = [τ_r1, τ_r2, 0...].

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

# Largest per-kernel batch block on the compiled path.  With the
# layer-major layout the VMEM bound is the (L, bt, M) scratch of the up
# kernel: bt=128 at L=128, M=64 is 4 MB — well inside the 100 MB kernel
# limit; the grid-size-aware cap below still clamps big grids (canonical
# 800×501 → block 8).
MAX_COMPILED_BLOCK_B = 128

# Per-plane allowance for the block cap (one (L, bt, M) f32 scratch
# plane; both kernels raise the scoped-VMEM limit to 100 MB via
# CompilerParams and ~5 such planes must fit).
_PLANE_BUDGET = 15e6


def _block_cap(L: int, m: int) -> int:
    """Largest power-of-two block ≥ 8 with (L, block, m) f32 within the
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


def _down_kernel(pack_ref, mu_ref, jn_ref, out_ref):
    L, bt, md = jn_ref.shape
    dtype = jn_ref.dtype
    inv_mu = 1.0 / mu_ref[0][None, :]            # (1, Md), µ=0 passed safe

    def chunk(ci, carry):
        s, j_prev = carry
        base = pl.multiple_of(ci * UNROLL, UNROLL)
        for u in range(UNROLL):
            t = base + u
            w = pack_ref[t, :, PK_HDT_DN][:, None]           # (bt, 1)
            j_t = jn_ref[t]                                  # (bt, md)
            a = jnp.exp((2.0 * w) * inv_mu)
            s = a * s + w * (j_prev * a + j_t)
            j_prev = j_t
            out_ref[t] = -s * inv_mu
        return s, j_prev

    jax.lax.fori_loop(0, L // UNROLL, chunk,
                      (jnp.zeros((bt, md), dtype), jnp.zeros((bt, md), dtype)))


def down_sweep_pallas(jn_down, pack, mu_down_safe, block_b: int = 128,
                      interpret: bool = False):
    """jn_down: (B, L, Md); pack: (B, L, 8); mu_down_safe: (Md,), µ=0→-1.

    NOTE: on the compiled path ``block_b`` is clamped to
    min(``MAX_COMPILED_BLOCK_B``, ``_block_cap(L, M)``); at the
    canonical 800×501 grid the cap is 8.
    """
    b, L, md = jn_down.shape
    assert L % UNROLL == 0, f"fused path requires nb_layers % {UNROLL} == 0"
    if not interpret:
        block_b = min(block_b, MAX_COMPILED_BLOCK_B, _block_cap(L, md))
    block_b = min(block_b, b)
    grid = (b // block_b,)
    out_t = pl.pallas_call(
        _down_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, block_b, PK_W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, md), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, block_b, md), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, block_b, md), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, b, md), jn_down.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(jnp.swapaxes(pack, 0, 1), mu_down_safe[None, :],
      jnp.swapaxes(jn_down, 0, 1))
    return jnp.swapaxes(out_t, 0, 1)


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
               scratch_ref):
    L, bt, m = jn_ref.shape
    dtype = jn_ref.dtype
    mu_row = mu_ref[0][None, :]                 # lane 0 = 0 (µ=0⁺)
    mu_safe = jnp.where(mu_row == 0, 1.0, mu_row)
    inv_mu = 1.0 / mu_safe
    lane0 = (jax.lax.broadcasted_iota(jnp.int32, (bt, m), 1) == 0)

    i_surf = jnp.where(lane0, jn_ref[L - 1], bc_ref[:, :])

    # reverse recurrence with the region-join rows accumulated in the
    # carry (row1 at t=idx_down+1, row2 at t=idx_up; one-hot pack lanes)
    def chunk(ci, carry):
        s, j_next, row1, row2 = carry
        base = pl.multiple_of((L // UNROLL - 1 - ci) * UNROLL, UNROLL)
        for u in range(UNROLL - 1, -1, -1):
            t = base + u
            w = pack_ref[t, :, PK_HDT_UP][:, None]
            drop = pack_ref[t, :, PK_DROP][:, None]
            j_t = jn_ref[t]
            # slot L-1 is the identity step (drop=1, a=1 via w=0)
            a = jnp.exp((-2.0 * w) * inv_mu)
            c = w * inv_mu * (j_t + j_next * a)
            c = jnp.where(drop > 0.5, 0.0, c)
            s = a * s + c
            s = jnp.where(lane0, j_t, s)
            j_next = j_t
            scratch_ref[t] = s
            row1 = row1 + pack_ref[t, :, PK_R1][:, None] * s
            row2 = row2 + pack_ref[t, :, PK_R2][:, None] * s
        return s, j_next, row1, row2

    z = jnp.zeros((bt, m), dtype)
    _, _, row1, row2 = jax.lax.fori_loop(0, L // UNROLL, chunk,
                                         (i_surf, z, z, z))

    # smoothing deltas at the two region joins
    tau_r1 = cpar_ref[:, 0:1]
    tau_r2 = cpar_ref[:, 1:2]
    d1 = _smooth_rows(row1, mu_row, m) - row1
    # r2 = idx_up ≤ idx_down = r1-1, so the d1 chain always reaches row r2
    att_12 = jnp.exp(-jnp.maximum(tau_r1 - tau_r2, 0.0) * inv_mu)
    row2c = row2 + d1 * att_12
    d2 = _smooth_rows(row2c, mu_row, m) - row2c

    # final pass: chaining + smoothing, per layer
    def fchunk(ci, _):
        base = pl.multiple_of(ci * UNROLL, UNROLL)
        for u in range(UNROLL):
            t = base + u
            tau_t = pack_ref[t, :, PK_TAU][:, None]
            ch1 = pack_ref[t, :, PK_CH1][:, None]
            ch2 = pack_ref[t, :, PK_CH2][:, None]
            att1 = jnp.exp(-jnp.maximum(tau_r1 - tau_t, 0.0) * inv_mu)
            att2 = jnp.exp(-jnp.maximum(tau_r2 - tau_t, 0.0) * inv_mu)
            corr = ch1 * d1 * att1 + ch2 * d2 * att2
            corr = jnp.where(lane0, 0.0, corr)
            out_ref[t] = _smooth_rows(scratch_ref[t] + corr, mu_row, m)
        return 0

    jax.lax.fori_loop(0, L // UNROLL, fchunk, 0)


def up_sweep_smooth_pallas(jn_up, pack, cparams, mu_up_row, bc,
                           block_b: int = 128, interpret: bool = False):
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
    out_t = pl.pallas_call(
        _up_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, block_b, PK_W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, block_b, m), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, block_b, m), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, b, m), jn_up.dtype),
        scratch_shapes=[pltpu.VMEM((L, block_b, m), jn_up.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(jnp.swapaxes(pack, 0, 1), cparams, mu_up_row[None, :],
      jnp.swapaxes(jn_up, 0, 1), bc)
    return jnp.swapaxes(out_t, 0, 1)


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
