"""Per-stage timing attribution for the mega-kernel.

Runs the whole-solve kernel with a FIXED order count (noconv) and
successively removes stages; the rate difference attributes time.
Results are numerically wrong under ablation — timing only.

usage: python tools/ablate_kernel.py [orders] [block] [batch]
"""
from __future__ import annotations

import dataclasses
import sys
import time

import os
import sys

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


def main():
    orders = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

    grid = GridSpec(nb_angles=64, nb_layers=128)
    opts = SolverOptions(surface="lambertian", dtype="float32",
                         max_orders=orders)
    tables = PhaseTables.from_models(grid, 0.5, atm=("rayleigh", {}),
                                     aer=("fwc", {}), dtype=jnp.float32)
    base = broadcast_scene(Scene(), batch)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    scenes = dataclasses.replace(
        base,
        grd_alb=jax.random.uniform(k1, (batch,), maxval=0.9),
        tau_star_aer=jax.random.uniform(k2, (batch,), minval=0.01,
                                        maxval=0.4),
        alb_aer=jax.random.uniform(k3, (batch,), minval=0.7, maxval=1.0))

    variants = [
        "noconv",
        "noconv,noi1",
        "noconv,nosrc",
        "noconv,noloops",
        "noconv,nopoly",
        "noconv,nosmooth",
        "noconv,nofin",
        "noconv,nobc",
        "noconv,noratio",
        "noconv,nopassA",
        "noconv,nopassB",
        "noconv,nosrc,noloops,nopoly,nofin",
        "noconv,nopassA,nopassB,noratio",
    ]
    times = {}
    for ab in variants:
        fn = jax.jit(lambda s, t, ab=ab: solve_batch_mega(
            s, t, grid, opts, cols_per_block=block, interpret=False,
            sort=False, ablate=ab))
        force = lambda s: float(jnp.sum(s.i_total[:, 0, :]))
        force(fn(scenes, tables))
        best = float("inf")
        for i in range(3):
            s = dataclasses.replace(scenes, grd_alb=scenes.grd_alb + i * 1e-7)
            t0 = time.perf_counter()
            force(fn(s, tables))
            best = min(best, time.perf_counter() - t0)
        times[ab] = best
        print(f"{ab:42s}: {best*1e3:8.1f} ms  {batch/best:10,.0f} col/s",
              flush=True)

    full = times["noconv"]
    print(f"\nper-stage share of the full {full*1e3:.1f} ms "
          f"({orders} orders, block={block}, B={batch}):")
    for ab in variants[1:]:
        stage = ",".join(ab.split(",")[1:])
        print(f"  {stage:28s}: {(full - times[ab])*1e3:7.1f} ms "
              f"({100*(full-times[ab])/full:5.1f}%)")


if __name__ == "__main__":
    main()
