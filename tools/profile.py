"""Write a jax.profiler trace of a solve (SURVEY.md §5 tracing row).

    python tools/profile.py [--out /tmp/sos_trace] [--batch 1024]
                            [--engine mega|fused|reference] [--canonical]

Produces a TensorBoard-loadable trace directory; the solver's named
scopes (sos.first_order / sos.source_jn / sos.down_sweep /
sos.up_sweep_bc) attribute device time per order stage on the
reference engine (Pallas kernels show as single mosaic ops).
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sos_trace")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--engine", default="mega",
                    choices=["mega", "fused", "reference"])
    ap.add_argument("--canonical", action="store_true",
                    help="profile the 501x800 single-column solve instead")
    args = ap.parse_args()

    import jax

    from sos_rt_tpu.presets import get_preset
    from sos_rt_tpu.sweep import build_sweep_batch, run_sweep

    if args.canonical:
        import jax.numpy as jnp

        from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
        from sos_rt_tpu.ops.sweeps import build_stencils
        from sos_rt_tpu.solver import PhaseTables, solve_column

        grid = GridSpec(nb_angles=501, nb_layers=800)
        opts = SolverOptions(surface="lambertian", dtype="float32",
                             max_orders=40)
        tables = PhaseTables.from_models(grid, 0.5, atm=("rayleigh", {}),
                                         aer=("hg", {"g": 0.7}),
                                         dtype=jnp.float32)
        stencils = build_stencils(grid.mu(), grid.nb_angles)
        scene = Scene(mu0=0.5, grd_alb=0.15)
        fn = jax.jit(lambda s, t: solve_column(s, t, grid, opts, stencils))
        jax.block_until_ready(fn(scene, tables).i_total)    # compile
        with jax.profiler.trace(args.out):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(scene, tables).i_total)
            print(f"traced solve: {(time.perf_counter()-t0)*1e3:.1f} ms")
    else:
        p = get_preset("fwc_sweep")
        outputs = "summary" if args.engine == "mega" else "full"
        # warm-up run compiles; the traced run is steady-state
        run_sweep(p, args.batch, mu0_pool=8, engine=args.engine,
                  outputs=outputs)
        with jax.profiler.trace(args.out):
            m = run_sweep(p, args.batch, mu0_pool=8, engine=args.engine,
                          outputs=outputs)
            print(f"traced sweep: {m}")
    print(f"trace written to {args.out} (load with tensorboard)")


if __name__ == "__main__":
    main()
