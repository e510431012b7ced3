"""Layer-sharded whole-column solve vs the on-chip reference solver.

The production form of the sharded affine scan (SURVEY.md §5
long-context row): the FULL order loop — sweeps, BC, join chaining,
smoothing, convergence — with layers sharded over an 8-device mesh.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
from sos_rt_tpu.parallel.layer_sharded import (
    layer_sharded_supported,
    solve_column_layer_sharded,
)
from sos_rt_tpu.solver import PhaseTables, solve_column

pytestmark = pytest.mark.slow  # >=10 s each: full-tier only (see README)


def _mesh(n=8):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]).reshape(n, 1), ("data", "model"),
                axis_types=(jax.sharding.AxisType.Auto,) * 2)


@pytest.mark.parametrize("surface", ["lambertian", "specular"])
def test_layer_sharded_matches_reference(surface):
    mesh = _mesh()
    grid = GridSpec(nb_angles=64, nb_layers=128)
    assert layer_sharded_supported(grid)
    opts = SolverOptions(surface=surface, dtype="float64")
    tables = PhaseTables.from_models(grid, 0.5, atm=("rayleigh", {}),
                                     aer=("hg", {"g": 0.7}))
    scene = Scene(mu0=0.5, grd_alb=0.3, tau_star_aer=0.2)

    ref = solve_column(scene, tables, grid, opts)
    sh = solve_column_layer_sharded(scene, tables, grid, opts, mesh)

    assert int(sh.n_orders) == int(ref.n_orders)
    assert bool(sh.converged)
    scale = float(jnp.max(jnp.abs(ref.i_total)))
    # exact up to scan reassociation (the pair-scan composes per-shard
    # affine maps in a different order than the on-chip scan)
    np.testing.assert_allclose(np.asarray(sh.i_total),
                               np.asarray(ref.i_total),
                               rtol=0, atol=1e-12 * scale)


def test_layer_sharded_rejects_small_mu_grid():
    mesh = _mesh()
    grid = GridSpec(nb_angles=501, nb_layers=64)   # canonical angles: small-µ
    opts = SolverOptions(dtype="float64")
    tables = PhaseTables.from_models(grid, 0.5, atm=("rayleigh", {}),
                                     aer=("hg", {"g": 0.7}))
    assert not layer_sharded_supported(grid)
    with pytest.raises(ValueError, match="small"):
        solve_column_layer_sharded(Scene(), tables, grid, opts, mesh)
