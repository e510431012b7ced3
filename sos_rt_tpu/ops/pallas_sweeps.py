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

Layouts (Mosaic constraint: dynamic offsets only on the sublane axis):
- fields (bt, L, M): layers on sublanes, angles on lanes;
- per-layer scalars packed as ``pack`` (bt, L, 8) lanes =
  [τ, join-drop, chain1(t≤idx_down), chain2(t<idx_up), onehot(r1),
   onehot(r2), 0, 0] — rows are sliced dynamically, lanes statically;
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

# pack lane indices
PK_TAU, PK_DROP, PK_CH1, PK_CH2, PK_R1, PK_R2 = range(6)
PK_W = 8


def _row(ref, t):
    """(bt, m) dynamic layer-row read from a (bt, L, m) ref."""
    return ref[:, pl.ds(t, 1), :][:, 0, :]


def _set_row(ref, t, val):
    ref[:, pl.ds(t, 1), :] = val[:, None, :]


def _pk(pack_ref, t, lane):
    """(bt, 1) packed per-layer scalar."""
    return pack_ref[:, pl.ds(t, 1), lane]


def _down_kernel(pack_ref, mu_ref, jn_ref, out_ref):
    bt, L, md = jn_ref.shape
    mu = mu_ref[0][None, :]                      # (1, Md), µ=0 passed safe
    inv_mu = 1.0 / mu
    out_ref[:, 0, :] = jnp.zeros((bt, md), jn_ref.dtype)

    def body(t, s):
        dt = _pk(pack_ref, t, PK_TAU) - _pk(pack_ref, t - 1, PK_TAU)
        a = jnp.exp(dt * inv_mu)
        b = 0.5 * dt * (_row(jn_ref, t - 1) * a + _row(jn_ref, t))
        s = a * s + b
        _set_row(out_ref, t, -s * inv_mu)
        return s

    jax.lax.fori_loop(1, L, body, jnp.zeros((bt, md), jn_ref.dtype))


def down_sweep_pallas(jn_down, pack, mu_down_safe, block_b: int = 8,
                      interpret: bool = False):
    """jn_down: (B, L, Md); pack: (B, L, 8); mu_down_safe: (Md,), µ=0→-1."""
    b, L, md = jn_down.shape
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
        interpret=interpret,
    )(pack, mu_down_safe[None, :], jn_down)


def _smooth_rows(row, mu_row, m):
    """µ→0⁺ smoothing walk on a (bt, M) row batch; lane 0 is µ=0⁺."""
    bt = row.shape[0]
    d = jnp.abs((row[:, 1:m - 2] - row[:, 2:m - 1])
                - (row[:, 2:m - 1] - row[:, 3:m]))
    ok = d <= SMOOTH_TOL
    lane = jax.lax.broadcasted_iota(jnp.int32, (bt, m - 3), 1) + 1
    first = jnp.min(jnp.where(ok, lane, jnp.int32(BIG)), axis=1)
    stop = jnp.minimum(first, m - 3)
    idx = stop + 1                                           # (bt,)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (bt, m), 1)
    onehot = (lanes == idx[:, None]).astype(row.dtype)
    i_val = jnp.sum(row * onehot, axis=1)
    mu_idx = jnp.sum(mu_row * onehot, axis=1)
    weight = mu_row / mu_idx[:, None]
    blended = (1.0 - weight) * row[:, 0:1] + weight * i_val[:, None]
    do = (lanes >= 1) & (lanes < idx[:, None])
    return jnp.where(do, blended, row)


def _up_kernel(pack_ref, cpar_ref, mu_ref, jn_ref, bc_ref, out_ref,
               scratch_ref):
    bt, L, m = jn_ref.shape
    mu_row = mu_ref[0][None, :]                 # lane 0 = 0 (µ=0⁺)
    mu_safe = jnp.where(mu_row == 0, 1.0, mu_row)
    inv_mu = 1.0 / mu_safe
    lane0 = (jax.lax.broadcasted_iota(jnp.int32, (bt, m), 1) == 0)

    i_surf = jnp.where(lane0, jn_ref[:, L - 1, :], bc_ref[:, :])
    scratch_ref[:, L - 1, :] = i_surf

    def body(k, carry):
        t = L - 2 - k
        dt = _pk(pack_ref, t + 1, PK_TAU) - _pk(pack_ref, t, PK_TAU)
        a = jnp.exp(-dt * inv_mu)
        drop = _pk(pack_ref, t, PK_DROP)
        c = 0.5 * dt * inv_mu * (_row(jn_ref, t) + _row(jn_ref, t + 1) * a)
        c = jnp.where(drop > 0.5, 0.0, c)
        nxt = a * carry + c
        nxt = jnp.where(lane0, _row(jn_ref, t), nxt)
        _set_row(scratch_ref, t, nxt)
        return nxt

    jax.lax.fori_loop(0, L - 1, body, i_surf)

    # one-hot row extraction at the two region joins (per-column rows)
    def join_row(lane):
        row = jnp.zeros((bt, m), jn_ref.dtype)

        def acc(t, row):
            return row + _pk(pack_ref, t, lane) * _row(scratch_ref, t)

        return jax.lax.fori_loop(0, L, acc, row)

    tau_r1 = cpar_ref[:, 0:1]                                # (bt, 1)
    tau_r2 = cpar_ref[:, 1:2]
    row1 = join_row(PK_R1)
    d1 = _smooth_rows(row1, mu_row, m) - row1
    # r2 = idx_up ≤ idx_down = r1-1, so the d1 chain always reaches row r2
    row2 = join_row(PK_R2)
    att_12 = jnp.exp(-jnp.maximum(tau_r1 - tau_r2, 0.0) * inv_mu)
    row2c = row2 + d1 * att_12
    d2 = _smooth_rows(row2c, mu_row, m) - row2c

    def final(t, _):
        tau_t = _pk(pack_ref, t, PK_TAU)
        att1 = jnp.exp(-jnp.maximum(tau_r1 - tau_t, 0.0) * inv_mu)
        att2 = jnp.exp(-jnp.maximum(tau_r2 - tau_t, 0.0) * inv_mu)
        base = _row(scratch_ref, t)
        row = (base + _pk(pack_ref, t, PK_CH1) * d1 * att1
               + _pk(pack_ref, t, PK_CH2) * d2 * att2)
        row = jnp.where(lane0, base, row)
        _set_row(out_ref, t, _smooth_rows(row, mu_row, m))
        return 0

    jax.lax.fori_loop(0, L, final, 0)


def up_sweep_smooth_pallas(jn_up, pack, cparams, mu_up_row, bc,
                           block_b: int = 8, interpret: bool = False):
    """jn_up: (B, L, M) columns M..2M-1 (lane 0 = µ=0⁺ column).

    pack: (B, L, 8) per-layer scalars; cparams: (B, 8) per-column
    scalars [τ_r1, τ_r2, ...]; bc: (B, M) with lane 0 unused.
    """
    b, L, m = jn_up.shape
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
        scratch_shapes=[pltpu.VMEM((block_b, L, m), jn_up.dtype)],
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
    zeros = jnp.zeros_like(tau)
    pack = jnp.stack([tau.astype(dtype), drop, ch1, ch2, r1, r2,
                      zeros, zeros], axis=-1)
    tau_r1 = jnp.sum(r1 * tau, axis=1)
    tau_r2 = jnp.sum(r2 * tau, axis=1)
    cparams = jnp.stack([tau_r1, tau_r2] + [jnp.zeros((B,), dtype)] * 6,
                        axis=-1)
    return pack, cparams
