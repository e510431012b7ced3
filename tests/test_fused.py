"""Fused (Pallas) batched solver vs the reference jnp solver.

Pallas kernels run in interpreter mode on CPU; the fused path must match
``solve_column`` (and therefore the NumPy oracle) on every grid regime.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
from sos_rt_tpu.fused import solve_batch_fused
from sos_rt_tpu.models import build_phase_tables
from sos_rt_tpu.parallel import broadcast_scene, solve_batch
from sos_rt_tpu.solver import PhaseTables


def _tables(grid, mu0=0.5):
    mu = grid.mu()
    p0a, pa = build_phase_tables("rayleigh", mu, mu0)
    p0r, pr = build_phase_tables("hg", mu, mu0, g=0.7)
    return PhaseTables(*[jnp.asarray(x) for x in (p0a, pa, p0r, pr)])


def _scenes(batch):
    base = broadcast_scene(Scene(), batch)
    return dataclasses.replace(
        base,
        grd_alb=jnp.linspace(0.0, 0.8, batch),
        tau_star_aer=jnp.linspace(0.02, 0.35, batch),
        alb_aer=jnp.linspace(0.7, 1.0, batch),
    )


@pytest.mark.parametrize("surface", ["lambertian", "specular"])
@pytest.mark.slow
def test_fused_matches_reference(surface):
    grid = GridSpec(nb_angles=51, nb_layers=64)
    tables = _tables(grid)
    opts = SolverOptions(surface=surface, dtype="float64")
    scenes = _scenes(4)
    ref = solve_batch(scenes, tables, grid, opts)
    fused = solve_batch_fused(scenes, tables, grid, opts, block_b=2,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(fused.n_orders),
                                  np.asarray(ref.n_orders))
    scale = float(jnp.max(jnp.abs(ref.i_total)))
    np.testing.assert_allclose(np.asarray(fused.i_total),
                               np.asarray(ref.i_total),
                               rtol=1e-9, atol=1e-11 * scale)


@pytest.mark.slow
def test_fused_small_mu_grid():
    """M=201 activates the |µ|<0.01 windowed columns."""
    grid = GridSpec(nb_angles=201, nb_layers=48)
    tables = _tables(grid)
    opts = SolverOptions(surface="specular", dtype="float64")
    scenes = _scenes(2)
    ref = solve_batch(scenes, tables, grid, opts)
    fused = solve_batch_fused(scenes, tables, grid, opts, block_b=2,
                              interpret=True)
    scale = float(jnp.max(jnp.abs(ref.i_total)))
    np.testing.assert_allclose(np.asarray(fused.i_total),
                               np.asarray(ref.i_total),
                               rtol=1e-9, atol=1e-11 * scale)


@pytest.mark.slow
def test_fused_ragged_batch_padded():
    """B not divisible by the kernel block must NOT drop trailing
    columns (the Pallas grid = B // block truncates; regression: B=10
    with block 4 returned NaN for columns 8-9 before padding)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
    from sos_rt_tpu.fused import solve_batch_fused
    from sos_rt_tpu.models import build_phase_tables
    from sos_rt_tpu.parallel import broadcast_scene
    from sos_rt_tpu.solver import PhaseTables

    grid = GridSpec(nb_angles=24, nb_layers=32)
    mu = grid.mu()
    p0a, pa = build_phase_tables("rayleigh", mu, 0.5)
    p0r, pr = build_phase_tables("hg", mu, 0.5, g=0.7)
    tables = PhaseTables(*(jnp.asarray(x) for x in (p0a, pa, p0r, pr)))
    opts = SolverOptions(surface="lambertian", dtype="float64")
    scenes = dataclasses.replace(
        broadcast_scene(Scene(), 10),
        grd_alb=jnp.linspace(0.0, 0.8, 10),
        tau_star_aer=jnp.linspace(0.02, 0.3, 10))
    sol = solve_batch_fused(scenes, tables, grid, opts, block_b=4,
                            interpret=True)
    assert sol.i_total.shape[0] == 10
    assert bool(jnp.all(jnp.isfinite(sol.i_total)))
    # trailing columns equal a per-column solve
    one = solve_batch_fused(
        jax.tree_util.tree_map(lambda x: x[9:10], scenes), tables, grid,
        opts, block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(sol.i_total[9]),
                               np.asarray(one.i_total[0]),
                               rtol=1e-12, atol=1e-14)
