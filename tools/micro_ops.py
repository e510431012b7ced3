"""Microbenchmark: per-op cost of the mega-kernel's pass building blocks.

For each pattern, times K1 and K2 repetitions inside one kernel call and
reports the slope (K2-K1 extra reps), cancelling the ~25 ms relay
dispatch floor.  usage: python tools/micro_ops.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sos_rt_tpu.ops.megakernel import _smooth_tile

L, C, M2 = 128, 64, 128
M = M2 // 2
G = 16
NG = L // G
GC = G * C
K1, K2 = 128, 1024


def kern(x_ref, pk_ref, a2_ref, o_ref, a_ref, b_ref, *, pat: str, k: int):
    a_ref[:, :, :] = x_ref[:, :, :]
    lanes_c = jax.lax.broadcasted_iota(jnp.int32, (GC, M2), 1)
    is_dn_c = lanes_c < M

    def body(j, _):
        def ch(i, _):
            sl = pl.ds(i * G, G)
            v = a_ref[sl].reshape(GC, M2)
            if pat == "fma":
                r = v * 1.0001 + 0.5
            elif pat == "rowscalar":
                pk = pk_ref[sl].reshape(GC, 16)
                r = pk[:, 3][:, None] * v + 0.5
            elif pat == "rowscalar_slice":
                pk = pk_ref[sl].reshape(GC, 16)
                r = pk[:, 3:4] * v + 0.5
            elif pat == "lanemask":
                r = jnp.where(is_dn_c, v * 1.0001, 0.0)
            elif pat == "tworefs":
                w = b_ref[sl].reshape(GC, M2)
                r = v * 1.0001 + w
            elif pat == "exp":
                r = jnp.exp(v * 1e-3)
            elif pat == "lanebrd":
                row = a2_ref[0, :][None, :]
                r = v * row + 0.5
            elif pat == "reduce":
                s = jnp.sum(v, axis=1, keepdims=True)
                r = v + s
            elif pat == "roll":
                r = v + pltpu.roll(v, M2 - 1, 1)
            elif pat == "smooth":
                r = _smooth_tile(v, M, M2, lanes_c)
            elif pat == "matmul":
                r = jnp.dot(v, a2_ref[:, :], preferred_element_type=v.dtype,
                            precision=jax.lax.Precision.HIGHEST)
            elif pat == "matmul_high":
                r = jnp.dot(v, a2_ref[:, :], preferred_element_type=v.dtype,
                            precision=jax.lax.Precision.HIGH)
            elif pat == "matmul_def":
                r = jnp.dot(v, a2_ref[:, :], preferred_element_type=v.dtype,
                            precision=jax.lax.Precision.DEFAULT)
            a_ref[sl] = r.reshape(G, C, M2)
            return 0

        jax.lax.fori_loop(0, NG, ch, 0)
        return 0

    jax.lax.fori_loop(0, k, body, 0)
    o_ref[:, :, :] = a_ref[:, :, :]


def run(pat):
    times = {}
    for k in (K1, K2):
        f = pl.pallas_call(
            functools.partial(kern, pat=pat, k=k),
            out_shape=jax.ShapeDtypeStruct((L, C, M2), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((L, C, M2), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )
        rng = np.random.default_rng(0)
        xs = [jnp.asarray(rng.standard_normal((L, C, M2)) * 1e-2 + 1.0,
                          jnp.float32) for _ in range(4)]
        pk = jnp.asarray(rng.standard_normal((L, C, 16)), jnp.float32)
        a2 = jnp.asarray(rng.standard_normal((M2, M2)), jnp.float32)
        fj = jax.jit(f)
        float(jnp.sum(fj(xs[0], pk, a2)))
        best = float("inf")
        for i in range(1, 4):
            t0 = time.perf_counter()
            float(jnp.sum(fj(xs[i], pk, a2)))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    per = (times[K2] - times[K1]) / (K2 - K1) * 1e6
    print(f"{pat:16s}: {per:8.2f} us/pass", flush=True)


def main():
    for pat in ["fma", "tworefs", "rowscalar", "rowscalar_slice", "lanemask",
                "lanebrd", "exp", "reduce", "roll", "smooth",
                "matmul", "matmul_def"]:
        run(pat)


if __name__ == "__main__":
    main()
