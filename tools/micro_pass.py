"""Microbenchmark: cost of one full-field VMEM pass inside a Pallas kernel.

Times K elementwise passes over an (L, C, 2M) scratch using different
inner structures (flat whole-array op, chunked fori, per-layer fori,
static python chunks) to locate the per-pass overhead seen in the
mega-kernel.  usage: python tools/micro_pass.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, C, M2 = 128, 64, 128
K = 64          # passes per kernel call


def kern(x_ref, o_ref, a_ref, *, mode: str, g: int):
    a_ref[:, :, :] = x_ref[:, :, :]
    ng = L // g

    def one_pass(k, _):
        if mode == "flat":
            a_ref[:, :, :] = a_ref[:, :, :] * 1.0001 + 0.5
        elif mode == "chunk":
            def ch(i, _):
                sl = pl.ds(i * g, g)
                a_ref[sl] = a_ref[sl] * 1.0001 + 0.5
                return 0
            jax.lax.fori_loop(0, ng, ch, 0)
        elif mode == "static":
            for i in range(ng):
                sl = slice(i * g, (i + 1) * g)
                a_ref[sl] = a_ref[sl] * 1.0001 + 0.5
        elif mode == "chunk2d":
            def ch(i, _):
                sl = pl.ds(i * g, g)
                v = a_ref[sl].reshape(g * C, M2)
                a_ref[sl] = (v * 1.0001 + 0.5).reshape(g, C, M2)
                return 0
            jax.lax.fori_loop(0, ng, ch, 0)
        return 0

    jax.lax.fori_loop(0, K, one_pass, 0)
    o_ref[:, :, :] = a_ref[:, :, :]


def run(mode, g):
    f = pl.pallas_call(
        functools.partial(kern, mode=mode, g=g),
        out_shape=jax.ShapeDtypeStruct((L, C, M2), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((L, C, M2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )
    x = jnp.ones((L, C, M2), jnp.float32)
    fj = jax.jit(f)
    float(jnp.sum(fj(x)))                          # compile + run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(fj(x)))
        best = min(best, time.perf_counter() - t0)
    per_pass = best / K * 1e6
    gbs = (L * C * M2 * 4 * 2) / (best / K) / 1e9
    print(f"{mode:8s} g={g:3d}: {best*1e3:7.2f} ms total, "
          f"{per_pass:7.1f} us/pass, {gbs:6.0f} GB/s eff", flush=True)


def main():
    print(f"field = ({L},{C},{M2}) f32 = {L*C*M2*4/2**20:.0f} MB; "
          f"K={K} passes (read+write)")
    for mode, g in [("flat", L), ("chunk", 8), ("chunk", 16), ("chunk", 32),
                    ("chunk2d", 8), ("chunk2d", 16),
                    ("static", 8), ("static", 16), ("static", 32)]:
        run(mode, g)


if __name__ == "__main__":
    main()
