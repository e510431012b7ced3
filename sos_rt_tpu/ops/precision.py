"""Matmul precision modes shared by the three engines.

The TPU MXU natively multiplies bf16; XLA's f32 ``HIGHEST`` precision
lowers to six bf16 passes.  The split decompositions here reach the f32
accumulation floor in three (``bf16x3``) or five (``bf16x5``) passes:

    a ≈ a_hi + a_lo,   x ≈ x₁ + x₂ (+ x₃)          (exact bf16 parts)
    a@x ≈ a_hi@x₁ + a_hi@x₂ + a_lo@x₁              (bf16x3)
        ≈ ... + a_hi@x₃ + a_lo@x₂                   (bf16x5)

Measured (BASELINE.md r4): all three modes sit at p50 1.9e-4 vs the f64
oracle on the headline workload; bf16x3 is 1.5–3.8× faster than
HIGHEST depending on the matmul fraction.

CRITICAL: the bf16 splits are computed by INTEGER mantissa masking.
The float round-trip form ``lo = a − f32(bf16(a))`` is folded to
exactly zero by XLA's allow-excess-precision pass under jit on TPU
(measured r4 — the silent cause of a 2-pass dot in production), while
the integer form cannot be elided.  Mosaic (inside Pallas kernels) does
not elide the float form, but kernels use this module's split for
consistency where they split host-side operators.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def split_bf16(a):
    """Exact bf16 (hi, lo) split of an f32 array via integer mantissa
    masking (round-to-nearest, ties away; see module docstring)."""
    a = jnp.asarray(a, jnp.float32)
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    hi_f = jax.lax.bitcast_convert_type(
        (bits + np.uint32(0x8000)) & np.uint32(0xFFFF0000), jnp.float32)
    hi = hi_f.astype(jnp.bfloat16)          # exact: mantissa pre-rounded
    lo = (a - hi_f).astype(jnp.bfloat16)
    return hi, lo


def split_bf16_3(a):
    """Exact bf16 (x1, x2, x3) split of an f32 array (24-bit mantissa =
    3 × 8-bit bf16 parts, so x1+x2+x3 reconstructs ``a`` exactly).

    Both rounding levels use the integer-masked form — the float form
    ``r - f32(bf16(r))`` for the second residual is folded to zero by
    XLA's allow-excess-precision pass under jit on TPU (the same
    elision documented above for the first level), which would silently
    degrade bf16x5 to a 3-pass dot."""
    a = jnp.asarray(a, jnp.float32)
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    hi_f = jax.lax.bitcast_convert_type(
        (bits + np.uint32(0x8000)) & np.uint32(0xFFFF0000), jnp.float32)
    x2, x3 = split_bf16(a - hi_f)
    return hi_f.astype(jnp.bfloat16), x2, x3


def make_split_dot(a, mm: str, dtype):
    """Return ``dot(x) ≈ x @ a`` in split mode ``mm`` ('bf16x3' or
    'bf16x5'); ``a`` is split once at closure build time."""
    hi, lo = split_bf16(a)

    def dot(x):
        d = functools.partial(jnp.dot, preferred_element_type=dtype)
        if mm == "bf16x5":
            x1, x2, x3 = split_bf16_3(x)
            return (d(x1, hi) + d(x2, hi) + d(x1, lo)
                    + d(x3, hi) + d(x2, lo))
        x1, x2 = split_bf16(x)
        return d(x1, hi) + d(x2, hi) + d(x1, lo)

    return dot
