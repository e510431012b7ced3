"""Ablation harness for the mega-kernel: block size, precision, sorting.

Usage: python tools/ablate.py [block_b ...]
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
from sos_rt_tpu.parallel import broadcast_scene, solve_batch
from sos_rt_tpu.parallel.mesh import order_count_score
from sos_rt_tpu.solver import PhaseTables


def make_batch(batch: int) -> Scene:
    base = broadcast_scene(Scene(), batch)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    return dataclasses.replace(
        base,
        grd_alb=jax.random.uniform(k1, (batch,), minval=0.0, maxval=0.9),
        tau_star_aer=jax.random.uniform(k2, (batch,), minval=0.01, maxval=0.4),
        alb_aer=jax.random.uniform(k3, (batch,), minval=0.7, maxval=1.0),
    )


def run_case(scenes, tables, grid, opts, batch, block_b, sort, reps=3):
    if sort:
        perm = jnp.argsort(order_count_score(scenes))
        sc = jax.tree_util.tree_map(lambda x: x[perm], scenes)
    else:
        sc = scenes

    def run(i):
        s = dataclasses.replace(sc, grd_alb=sc.grd_alb + i * 1e-7)
        sol = solve_batch(s, tables, grid, opts, engine="mega",
                          block_b=block_b)
        return float(jnp.sum(sol.i_total[:, 0, :]))

    t0 = time.perf_counter()
    run(0)
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(1, reps + 1):
        t0 = time.perf_counter()
        run(i)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"block_b={block_b:4d} sort={int(sort)} : {batch/dt:10,.0f} col/s "
          f"({dt*1e3:.0f} ms, compile {compile_s:.0f}s)", flush=True)


def main():
    batch = 16384
    grid = GridSpec(nb_angles=64, nb_layers=128)
    opts = SolverOptions(surface="lambertian", dtype="float32",
                         max_orders=100, scan_impl="sequential")
    tables = PhaseTables.from_models(grid, 0.5, atm=("rayleigh", {}),
                                     aer=("fwc", {}), dtype=jnp.float32)
    scenes = make_batch(batch)
    blocks = [int(a) for a in sys.argv[1:]] or [64]
    for b in blocks:
        for sort in (False, True):
            run_case(scenes, tables, grid, opts, batch, b, sort)


if __name__ == "__main__":
    main()
