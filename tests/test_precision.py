"""Guards for the bf16 split decompositions (ops/precision.py).

XLA's allow-excess-precision pass folds float-form split residuals
``r - f32(bf16(r))`` to exactly zero under jit on TPU (the r4 silent
2-pass-dot bug, BASELINE.md r4).  Both split levels are therefore
computed by integer mantissa masking; these tests assert — UNDER JIT —
that every part is generically nonzero and that the decomposition is
exact, so an elision regression (at either level) fails loudly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sos_rt_tpu.ops.precision import make_split_dot, split_bf16, split_bf16_3


def _rand(shape, seed=0):
    # full-mantissa f32 values: all three 8-bit parts populated
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0.1, 1.0, shape), jnp.float32)


def test_split_bf16_16bit_under_jit():
    """hi+lo carries 16 of f32's 24 mantissa bits: relative error below
    2^-16, and lo is generically nonzero (zero lo = elided split)."""
    x = _rand((64,))
    hi, lo = jax.jit(split_bf16)(x)
    rec = hi.astype(jnp.float64) + lo.astype(jnp.float64)
    rel = np.max(np.abs(np.asarray(rec) - np.asarray(x, np.float64))
                 / np.asarray(x, np.float64))
    assert rel < 2.0 ** -16
    assert np.all(np.asarray(lo, np.float32) != 0.0)


def test_split_bf16_3_exact_and_nonzero_under_jit():
    """The ADVICE-r4 regression: the bf16x5 third part must survive jit.

    f32 has a 24-bit mantissa = 3 bf16 parts, so x1+x2+x3 == x exactly
    and x3 is generically nonzero.  A float-form second residual would
    make x3 identically zero under jit on TPU.
    """
    x = _rand((256,), seed=1)
    x1, x2, x3 = jax.jit(split_bf16_3)(x)
    rec = (x1.astype(jnp.float64) + x2.astype(jnp.float64)
           + x3.astype(jnp.float64))
    np.testing.assert_array_equal(np.asarray(rec, np.float32),
                                  np.asarray(x))
    frac3 = np.mean(np.asarray(x3, np.float32) != 0.0)
    assert frac3 > 0.9, f"x3 folded to zero under jit (nonzero frac {frac3})"


@pytest.mark.parametrize("mm", ["bf16x3", "bf16x5"])
def test_split_dot_accuracy_under_jit(mm):
    a = _rand((128, 64), seed=2)
    x = _rand((32, 128), seed=3)
    dot = make_split_dot(a, mm, jnp.float32)
    out = jax.jit(dot)(x)
    ref = np.asarray(x, np.float64) @ np.asarray(a, np.float64)
    rel = np.max(np.abs(np.asarray(out, np.float64) - ref) / np.abs(ref))
    # both modes sit at the f32 accumulation floor on this scale
    assert rel < 2e-6, (mm, rel)


def test_bf16x5_strictly_tighter_than_bf16x3_under_jit():
    """If the x3/x2@lo terms are elided, bf16x5 degenerates to bf16x3
    and this separation vanishes."""
    a = _rand((256, 128), seed=4)
    x = _rand((64, 256), seed=5)
    d3 = jax.jit(make_split_dot(a, "bf16x3", jnp.float32))(x)
    d5 = jax.jit(make_split_dot(a, "bf16x5", jnp.float32))(x)
    assert not np.array_equal(np.asarray(d3), np.asarray(d5)), (
        "bf16x5 == bf16x3 exactly: the extra split terms were elided")
    ref = np.asarray(x, np.float64) @ np.asarray(a, np.float64)
    err3 = np.sqrt(np.mean((np.asarray(d3, np.float64) - ref) ** 2))
    err5 = np.sqrt(np.mean((np.asarray(d5, np.float64) - ref) ** 2))
    assert err5 < err3
