"""jax_debug_nans gate over the small-µ paths (SURVEY.md §5 sanitizers).

The small-µ machinery (windowed prefix-difference, Taylor branch,
polyfit band, e^{τ/µ} clamps — ops/sweeps.py) is exactly where f32 NaNs
would appear first (SURVEY.md §7 "hard parts" #2).  These tests run the
solver under ``jax_debug_nans`` — any NaN produced by a primitive
anywhere in the solve raises immediately instead of propagating.
"""
import dataclasses

import jax
import jax.numpy as jnp
import pytest

from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
from sos_rt_tpu.ops.sweeps import build_stencils
from sos_rt_tpu.solver import PhaseTables, solve_column


@pytest.fixture()
def nan_gate():
    jax.config.update("jax_debug_nans", True)
    yield
    jax.config.update("jax_debug_nans", False)


def _solve(grid, opts, scene):
    tables = PhaseTables.from_models(
        grid, float(scene.mu0), atm=("rayleigh", {}), aer=("hg", {"g": 0.7}),
        dtype=jnp.float64 if opts.dtype == "float64" else jnp.float32)
    stencils = build_stencils(grid.mu(), grid.nb_angles)
    sol = solve_column(scene, tables, grid, opts, stencils)
    jax.block_until_ready(sol.i_total)
    return sol


@pytest.mark.slow
def test_small_mu_grid_f32_no_nans(nan_gate):
    """M=151 has |µ| < 0.01 columns → exercises the windowed
    prefix-difference + Taylor branch + polyfit band under the gate."""
    grid = GridSpec(nb_angles=151, nb_layers=64)
    opts = SolverOptions(surface="lambertian", dtype="float32",
                         max_orders=40)
    sol = _solve(grid, opts, Scene(mu0=0.5, grd_alb=0.15))
    assert bool(sol.converged)
    assert jnp.isfinite(sol.i_total).all()


def test_thick_column_f32_no_nans(nan_gate):
    """Optically thick column (largest e^{τ/µ} exponents + τ*/µ ≥ 50
    normalization branch) stays finite in f32."""
    grid = GridSpec(nb_angles=64, nb_layers=64)
    opts = SolverOptions(surface="lambertian", dtype="float32",
                         max_orders=60)
    scene = Scene(mu0=0.3, grd_alb=0.8,
                  tau_star_atm=2.0, tau_star_aer=1.5)
    sol = _solve(grid, opts, scene)
    assert jnp.isfinite(sol.i_total).all()


def test_specular_f32_no_nans(nan_gate):
    grid = GridSpec(nb_angles=64, nb_layers=64)
    opts = SolverOptions(surface="specular", dtype="float32", max_orders=40)
    sol = _solve(grid, opts, Scene(mu0=0.5, grd_alb=0.3))
    assert jnp.isfinite(sol.i_total).all()
