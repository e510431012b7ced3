"""TPU A/B: fused-per-order engine vs whole-solve mega-kernel.

Usage: python tools/bench_mega.py [batch] [cols_per_block]
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
from sos_rt_tpu.parallel import broadcast_scene, solve_batch
from sos_rt_tpu.solver import PhaseTables


def make_batch(batch):
    base = broadcast_scene(Scene(), batch)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    return dataclasses.replace(
        base,
        grd_alb=jax.random.uniform(k1, (batch,), minval=0.0, maxval=0.9),
        tau_star_aer=jax.random.uniform(k2, (batch,), minval=0.01, maxval=0.4),
        alb_aer=jax.random.uniform(k3, (batch,), minval=0.7, maxval=1.0),
    )


def run(engine, scenes, tables, grid, opts, batch, reps=4, **kw):
    def once(i):
        sc = dataclasses.replace(scenes, grd_alb=scenes.grd_alb + i * 1e-7)
        sol = solve_batch(sc, tables, grid, opts, engine=engine, **kw)
        jax.block_until_ready(sol.i_total)
        return sol

    t0 = time.perf_counter()
    sol = once(0)
    print(f"{engine}{kw}: compile+first {time.perf_counter()-t0:.1f}s "
          f"orders max={int(jnp.max(sol.n_orders))} "
          f"mean={float(jnp.mean(sol.n_orders.astype(jnp.float32))):.1f} "
          f"conv={int(jnp.sum(sol.converged))}/{batch}", flush=True)
    times = []
    for i in range(1, reps + 1):
        t0 = time.perf_counter()
        once(i)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{engine}{kw}: {batch} cols in {dt*1e3:.1f} ms -> "
          f"{batch/dt:,.0f} col/s", flush=True)
    return sol, batch / dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    cpb = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    print("devices:", jax.devices(), flush=True)
    grid = GridSpec(nb_angles=64, nb_layers=128)
    opts = SolverOptions(surface="lambertian", dtype="float32",
                         max_orders=100, scan_impl="sequential")
    tables = PhaseTables.from_models(grid, 0.5, atm=("rayleigh", {}),
                                     aer=("fwc", {}), dtype=jnp.float32)
    scenes = make_batch(batch)

    sol_m, rate_m = run("mega", scenes, tables, grid, opts, batch, block_b=cpb)
    sol_f, rate_f = run("fused", scenes, tables, grid, opts, batch,
                        buckets=8, block_b=32)
    diff = jnp.max(jnp.abs(sol_m.i_total - sol_f.i_total))
    scale = jnp.max(jnp.abs(sol_f.i_total))
    print(f"max|mega-fused| = {float(diff):.3e} (scale {float(scale):.3e}) "
          f"orders equal: {bool(jnp.all(sol_m.n_orders == sol_f.n_orders))}")
    print(f"speedup mega/fused = {rate_m/rate_f:.2f}x")


if __name__ == "__main__":
    main()
