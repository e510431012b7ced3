"""Profiling hooks: jax.profiler trace capture + named scopes.

SURVEY.md §5 tracing row: the solver wraps its stages in
``jax.named_scope`` (sos.first_order / sos.source_jn / sos.down_sweep /
sos.up_sweep_bc) and tools/profile.py writes TensorBoard traces.  This
smoke test pins that a trace actually captures a solve (device-agnostic;
runs on the CPU backend).
"""
import glob
import os

import jax
import jax.numpy as jnp

from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
from sos_rt_tpu.ops.sweeps import build_stencils
from sos_rt_tpu.solver import PhaseTables, solve_column


def test_trace_captures_solve(tmp_path):
    grid = GridSpec(nb_angles=24, nb_layers=32)
    opts = SolverOptions(surface="lambertian", dtype="float64",
                         max_orders=10)
    tables = PhaseTables.from_models(grid, 0.5, atm=("rayleigh", {}),
                                     aer=("hg", {"g": 0.7}))
    stencils = build_stencils(grid.mu(), grid.nb_angles)
    fn = jax.jit(lambda s, t: solve_column(s, t, grid, opts, stencils))
    jax.block_until_ready(fn(Scene(), tables).i_total)   # compile outside
    out = str(tmp_path / "trace")
    with jax.profiler.trace(out):
        jax.block_until_ready(fn(Scene(), tables).i_total)
    produced = glob.glob(os.path.join(out, "**", "*"), recursive=True)
    assert any(p.endswith((".pb", ".json.gz", ".xplane.pb"))
               for p in produced), produced


def test_named_scopes_in_jaxpr():
    """The stage scopes survive into the lowered HLO (profiler
    attribution relies on the op-name prefixes)."""
    grid = GridSpec(nb_angles=24, nb_layers=32)
    opts = SolverOptions(surface="lambertian", dtype="float64",
                         max_orders=6)
    tables = PhaseTables.from_models(grid, 0.5, atm=("rayleigh", {}),
                                     aer=("hg", {"g": 0.7}))
    stencils = build_stencils(grid.mu(), grid.nb_angles)
    hlo = jax.jit(
        lambda s, t: solve_column(s, t, grid, opts, stencils)
    ).lower(Scene(), tables).as_text(debug_info=True)
    for scope in ("sos.first_order", "sos.source_jn", "sos.down_sweep",
                  "sos.up_sweep_bc"):
        assert scope in hlo, scope
