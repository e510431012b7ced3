"""Per-stage timing attribution for the HBM-STREAMING mega engine
(ops/megastream.py) at the canonical 501×800 grid.

Runs the streamed whole-solve with a FIXED order count (noconv) and
successively removes stages; the rate difference attributes time.
Results are numerically wrong under ablation — timing only.

Measured r5 final (B=128, 11 fixed orders, v5e, in-kernel I₁): full
127 ms; Jₙ source matmul 50.9% (≈95% MXU efficiency at bf16x3 —
6.6 ms/order vs the 6.3 ms floor); pass B entire ≤0.5% (noise); fixed
cost (passes removed — passI + pack assembly + dispatch) 28.6 ms =
22.5%.  Pre-passI (host-side I₁) the full run was 148.6 ms with a
~30% fixed share.

usage: python tools/ablate_stream.py [orders] [batch]
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
from sos_rt_tpu.fused import solve_batch_mega
from sos_rt_tpu.parallel import broadcast_scene
from sos_rt_tpu.solver import PhaseTables

FLAGS = ["nosrc", "nosmooth", "nofin", "nopoly", "noloops",
         "nopassB", "nopassA,nopassB"]


def main():
    orders = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    grid = GridSpec(nb_angles=501, nb_layers=800)
    tables = PhaseTables.from_models(grid, 0.5, atm=("rayleigh", {}),
                                     aer=("hg", {"g": 0.7}),
                                     dtype=jnp.float32)
    scenes = dataclasses.replace(
        broadcast_scene(Scene(), batch),
        grd_alb=jnp.linspace(0.05, 0.6, batch),
        tau_star_aer=jnp.linspace(0.05, 0.3, batch),
        alb_aer=jnp.linspace(0.8, 1.0, batch))
    opts = SolverOptions(surface="lambertian", dtype="float32",
                         max_orders=orders)

    def timeit(ablate):
        fn = jax.jit(lambda s, t: solve_batch_mega(
            s, t, grid, opts, outputs="summary", mm="bf16x3",
            allow_small=True, ablate=ablate))
        t0 = time.perf_counter()
        sol = fn(scenes, tables)
        float(jnp.sum(sol.i_toa))
        comp = time.perf_counter() - t0
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            sol = fn(dataclasses.replace(
                scenes, grd_alb=scenes.grd_alb + i * 1e-7), tables)
            float(jnp.sum(sol.i_toa))
            ts.append(time.perf_counter() - t0)
        return min(ts), comp

    base, comp = timeit("noconv")
    print(f"{'full (noconv)':>24}: {base*1e3:8.1f} ms "
          f"(compile {comp:.0f}s, {orders - 1} fixed orders, B={batch})",
          flush=True)
    for fl in FLAGS:
        dt, comp = timeit("noconv," + fl)
        print(f"{fl:>24}: {dt*1e3:8.1f} ms  share {100*(base-dt)/base:5.1f}%"
              f"  (compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
