"""Batched + sharded solves on a simulated 8-device CPU mesh.

SURVEY.md §4(d): sharded solve must equal the single-device solve
bit-for-bit (here: allclose at f64 tightness) per column.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
from sos_rt_tpu.models import build_phase_tables
from sos_rt_tpu.parallel import broadcast_scene, make_mesh, solve_batch
from sos_rt_tpu.solver import PhaseTables, solve_column

M, L = 31, 60
GRID = GridSpec(nb_angles=M, nb_layers=L)
OPTS = SolverOptions(surface="specular", dtype="float64")


@pytest.fixture(scope="module")
def tables():
    mu = GRID.mu()
    p0a, pa = build_phase_tables("rayleigh", mu, 0.5)
    p0r, pr = build_phase_tables("hg", mu, 0.5, g=0.7)
    return PhaseTables(*[jnp.asarray(x) for x in (p0a, pa, p0r, pr)])


def _scenes(batch):
    base = broadcast_scene(Scene(), batch)
    # vary µ0 is not allowed (tables are built per µ0); vary the rest
    return dataclasses.replace(
        base,
        grd_alb=jnp.linspace(0.0, 0.9, batch),
        tau_star_aer=jnp.linspace(0.01, 0.4, batch),
        alb_aer=jnp.linspace(0.6, 1.0, batch),
    )


def test_eight_devices_visible():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_vmapped_batch_matches_per_column(tables):
    scenes = _scenes(6)
    batch_sol = solve_batch(scenes, tables, GRID, OPTS)
    for i in range(6):
        scene_i = jax.tree_util.tree_map(lambda x: x[i], scenes)
        sol_i = jax.jit(solve_column, static_argnums=(2, 3))(
            scene_i, tables, GRID, OPTS)
        np.testing.assert_allclose(np.asarray(batch_sol.i_total[i]),
                                   np.asarray(sol_i.i_total),
                                   rtol=1e-12, atol=1e-14)
        assert int(batch_sol.n_orders[i]) == int(sol_i.n_orders)


@pytest.mark.slow
def test_data_sharded_matches_unsharded(tables):
    scenes = _scenes(16)
    mesh = make_mesh((8, 1))
    plain = solve_batch(scenes, tables, GRID, OPTS)
    sharded = solve_batch(scenes, tables, GRID, OPTS, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded.i_total),
                               np.asarray(plain.i_total),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_array_equal(np.asarray(sharded.n_orders),
                                  np.asarray(plain.n_orders))


@pytest.mark.slow
def test_data_model_mesh_with_sharded_tables(tables):
    scenes = _scenes(8)
    mesh = make_mesh((4, 2))
    sharded = solve_batch(scenes, tables, GRID, OPTS, mesh=mesh,
                          shard_tables=True)
    plain = solve_batch(scenes, tables, GRID, OPTS)
    np.testing.assert_allclose(np.asarray(sharded.i_total),
                               np.asarray(plain.i_total),
                               rtol=1e-11, atol=1e-13)


@pytest.mark.slow
def test_bucketed_matches_plain(tables):
    scenes = _scenes(12)
    plain = solve_batch(scenes, tables, GRID, OPTS)
    bucketed = solve_batch(scenes, tables, GRID, OPTS, buckets=4)
    np.testing.assert_allclose(np.asarray(bucketed.i_total),
                               np.asarray(plain.i_total),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_array_equal(np.asarray(bucketed.n_orders),
                                  np.asarray(plain.n_orders))


@pytest.mark.slow
def test_mega_engine_sharded_matches_unsharded():
    """VERDICT r1 weak #3: the fast engines must compose with the mesh.
    Mega under shard_map on 8 devices == unsharded mega, column for
    column (mega-eligible grid: no small-µ columns, M % 8 == 0)."""
    grid = GridSpec(nb_angles=32, nb_layers=32)
    mu = grid.mu()
    p0a, pa = build_phase_tables("rayleigh", mu, 0.5)
    p0r, pr = build_phase_tables("hg", mu, 0.5, g=0.7)
    tbl = PhaseTables(*[jnp.asarray(x) for x in (p0a, pa, p0r, pr)])
    opts = SolverOptions(surface="lambertian", dtype="float64")
    scenes = _scenes(16)
    mesh = make_mesh((8, 1))
    plain = solve_batch(scenes, tbl, grid, opts, engine="mega")
    sharded = solve_batch(scenes, tbl, grid, opts, engine="mega", mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded.i_total),
                               np.asarray(plain.i_total),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_array_equal(np.asarray(sharded.n_orders),
                                  np.asarray(plain.n_orders))


@pytest.mark.slow
def test_mega_engine_sharded_summary():
    """Sharded mega with outputs='summary' returns sharded TOA rows that
    equal the unsharded full solve's."""
    grid = GridSpec(nb_angles=32, nb_layers=32)
    mu = grid.mu()
    p0a, pa = build_phase_tables("rayleigh", mu, 0.5)
    p0r, pr = build_phase_tables("hg", mu, 0.5, g=0.7)
    tbl = PhaseTables(*[jnp.asarray(x) for x in (p0a, pa, p0r, pr)])
    opts = SolverOptions(surface="lambertian", dtype="float64")
    scenes = _scenes(16)
    mesh = make_mesh((8, 1))
    plain = solve_batch(scenes, tbl, grid, opts, engine="mega")
    summ = solve_batch(scenes, tbl, grid, opts, engine="mega", mesh=mesh,
                       outputs="summary")
    np.testing.assert_allclose(np.asarray(summ.i_toa),
                               np.asarray(plain.i_total[:, 0, :]),
                               rtol=1e-12, atol=1e-14)


def test_fused_engine_sharded_matches_unsharded():
    # fused path needs nb_layers % 8 == 0; keep a small-µ grid (M=31 →
    # |µ|<0.01 columns exist) so this exercises the fused kernels proper
    grid = GridSpec(nb_angles=31, nb_layers=32)
    mu = grid.mu()
    p0a, pa = build_phase_tables("rayleigh", mu, 0.5)
    p0r, pr = build_phase_tables("hg", mu, 0.5, g=0.7)
    tbl = PhaseTables(*[jnp.asarray(x) for x in (p0a, pa, p0r, pr)])
    scenes = _scenes(16)
    mesh = make_mesh((8, 1))
    plain = solve_batch(scenes, tbl, grid, OPTS, engine="fused")
    sharded = solve_batch(scenes, tbl, grid, OPTS, engine="fused",
                          mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded.i_total),
                               np.asarray(plain.i_total),
                               rtol=1e-12, atol=1e-14)


def test_batched_mu0_sweep():
    """Config-5 capability: sweep over µ0 with per-column P0 tables."""
    from sos_rt_tpu.solver import PhaseTables as PT, solve_column

    mu0s = np.array([0.3, 0.5, 0.8, 0.5])
    tbl = PT.from_models_batched_mu0(GRID, mu0s, atm=("rayleigh", {}),
                                     aer=("hg", {"g": 0.7}))
    scenes = dataclasses.replace(_scenes(4), mu0=jnp.asarray(mu0s))
    batch = solve_batch(scenes, tbl, GRID, OPTS)
    # lane 1 must equal an unbatched solve at µ0=0.5 with its own tables
    single_tbl = PT.from_models(GRID, 0.5, atm=("rayleigh", {}),
                                aer=("hg", {"g": 0.7}))
    scene_1 = jax.tree_util.tree_map(lambda x: x[1], scenes)
    sol_1 = jax.jit(solve_column, static_argnums=(2, 3))(
        scene_1, single_tbl, GRID, OPTS)
    np.testing.assert_allclose(np.asarray(batch.i_total[1]),
                               np.asarray(sol_1.i_total),
                               rtol=1e-12, atol=1e-14)
    # different µ0 lanes differ
    assert not np.allclose(np.asarray(batch.i_total[0]),
                           np.asarray(batch.i_total[1]))
