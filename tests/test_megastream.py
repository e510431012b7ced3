"""HBM-streaming mega engine (ops/megastream.py) vs the reference solver.

The streamed execution runs the mega kernel's math as two grid-pipelined
Pallas passes per order with the half-fields in HBM and the convergence
loop at the XLA level; in interpreter mode on CPU it must match
``solve_batch`` (and therefore the NumPy oracle) on eligible grids —
the same contract as the VMEM-resident kernel (tests/test_mega.py).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
from sos_rt_tpu.fused import solve_batch_mega
from sos_rt_tpu.models import build_phase_tables
from sos_rt_tpu.parallel import broadcast_scene, solve_batch
from sos_rt_tpu.solver import PhaseTables

pytestmark = pytest.mark.slow  # >=10 s each: full-tier only (see README)


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
def test_stream_matches_reference(surface):
    grid = GridSpec(nb_angles=56, nb_layers=64)
    tables = _tables(grid)
    opts = SolverOptions(surface=surface, dtype="float64")
    scenes = _scenes(4)
    ref = solve_batch(scenes, tables, grid, opts)
    got = solve_batch_mega(scenes, tables, grid, opts, cols_per_block=2,
                           interpret=True, stream=True)
    np.testing.assert_array_equal(np.asarray(got.n_orders),
                                  np.asarray(ref.n_orders))
    scale = float(jnp.max(jnp.abs(ref.i_total)))
    np.testing.assert_allclose(np.asarray(got.i_total),
                               np.asarray(ref.i_total),
                               rtol=1e-9, atol=1e-11 * scale)
    assert bool(jnp.all(got.converged))


def test_stream_summary_matches_full():
    grid = GridSpec(nb_angles=56, nb_layers=64)
    tables = _tables(grid)
    opts = SolverOptions(surface="lambertian", dtype="float64")
    scenes = _scenes(4)
    full = solve_batch_mega(scenes, tables, grid, opts, cols_per_block=2,
                            interpret=True, stream=True)
    summ = solve_batch_mega(scenes, tables, grid, opts, cols_per_block=2,
                            interpret=True, stream=True, outputs="summary")
    np.testing.assert_array_equal(np.asarray(summ.n_orders),
                                  np.asarray(full.n_orders))
    np.testing.assert_array_equal(np.asarray(summ.converged),
                                  np.asarray(full.converged))
    np.testing.assert_array_equal(np.asarray(summ.i_toa),
                                  np.asarray(full.i_total[:, 0, :]))
    np.testing.assert_array_equal(np.asarray(summ.i_surface),
                                  np.asarray(full.i_total[:, -1, :]))


def test_stream_matches_resident_mega():
    """Same math, different execution strategy: streamed == VMEM-resident
    (both f64, interpret) at numerical-noise level."""
    grid = GridSpec(nb_angles=56, nb_layers=64)
    tables = _tables(grid)
    opts = SolverOptions(surface="lambertian", dtype="float64")
    scenes = _scenes(4)
    mega = solve_batch_mega(scenes, tables, grid, opts, cols_per_block=2,
                            interpret=True)
    got = solve_batch_mega(scenes, tables, grid, opts, cols_per_block=2,
                           interpret=True, stream=True)
    np.testing.assert_array_equal(np.asarray(got.n_orders),
                                  np.asarray(mega.n_orders))
    scale = float(jnp.max(jnp.abs(mega.i_total)))
    np.testing.assert_allclose(np.asarray(got.i_total),
                               np.asarray(mega.i_total),
                               rtol=1e-9, atol=1e-12 * scale)


def test_stream_pads_ragged_batch():
    """B=3 with cols_per_block=2 exercises the pad/trim + lax.map path."""
    grid = GridSpec(nb_angles=56, nb_layers=64)
    tables = _tables(grid)
    opts = SolverOptions(surface="lambertian", dtype="float64")
    scenes = _scenes(3)
    ref = solve_batch(scenes, tables, grid, opts)
    got = solve_batch_mega(scenes, tables, grid, opts, cols_per_block=2,
                           interpret=True, stream=True)
    scale = float(jnp.max(jnp.abs(ref.i_total)))
    np.testing.assert_allclose(np.asarray(got.i_total),
                               np.asarray(ref.i_total),
                               rtol=1e-9, atol=1e-11 * scale)


def test_stream_odd_angle_count_padded():
    """M=53 exercises the angle-pad rows through the streamed passes."""
    grid = GridSpec(nb_angles=53, nb_layers=64)
    tables = _tables(grid)
    opts = SolverOptions(surface="specular", dtype="float64")
    scenes = _scenes(3)
    ref = solve_batch(scenes, tables, grid, opts)
    got = solve_batch_mega(scenes, tables, grid, opts, cols_per_block=3,
                           interpret=True, stream=True)
    np.testing.assert_array_equal(np.asarray(got.n_orders),
                                  np.asarray(ref.n_orders))
    scale = float(jnp.max(jnp.abs(ref.i_total)))
    np.testing.assert_allclose(np.asarray(got.i_total),
                               np.asarray(ref.i_total),
                               rtol=1e-9, atol=1e-11 * scale)


def test_stream_canonical_like_small_mu():
    """A shrunken canonical-style grid (M=201 with a small-µ column,
    τ refs in the band-covered regime) through the streamed path with
    allow_small — the production 501×800 configuration's structure."""
    from sos_rt_tpu.parallel.mesh import mega_small_ok

    grid = GridSpec(nb_angles=201, nb_layers=48)
    tables = _tables(grid)
    opts = SolverOptions(surface="lambertian", dtype="float64")
    scenes = _scenes(3)
    assert mega_small_ok(scenes, grid)
    ref = solve_batch(scenes, tables, grid, opts)
    got = solve_batch_mega(scenes, tables, grid, opts, cols_per_block=3,
                           interpret=True, stream=True, allow_small=True)
    np.testing.assert_array_equal(np.asarray(got.n_orders),
                                  np.asarray(ref.n_orders))
    scale = float(jnp.max(jnp.abs(ref.i_total)))
    np.testing.assert_allclose(np.asarray(got.i_total),
                               np.asarray(ref.i_total),
                               rtol=1e-9, atol=1e-11 * scale)


def test_stream_shard_mapped_matches_unsharded():
    """The streamed engine composed with a device mesh (the multi-chip
    canonical-grid story): shard_map over 'data', each device runs the
    full streamed solve on its local columns — per-column results equal
    the unsharded solve."""
    import numpy as _np
    from jax.sharding import Mesh, PartitionSpec as P

    grid = GridSpec(nb_angles=56, nb_layers=64)
    tables = _tables(grid)
    opts = SolverOptions(surface="lambertian", dtype="float64")
    scenes = _scenes(8)
    plain = solve_batch_mega(scenes, tables, grid, opts, cols_per_block=2,
                             interpret=True, stream=True, outputs="summary",
                             sort=False)

    devs = jax.devices("cpu")[:4]
    mesh = Mesh(_np.array(devs).reshape(4, 1), ("data", "model"),
                axis_types=(jax.sharding.AxisType.Auto,) * 2)
    local = lambda s, t: solve_batch_mega(
        s, t, grid, opts, cols_per_block=2, interpret=True, stream=True,
        outputs="summary", sort=False)
    d = P("data")
    tbl_specs = jax.tree_util.tree_map(lambda _: P(), tables)
    fn = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=(d, tbl_specs),
                               out_specs=d, check_vma=False))
    sharded = fn(scenes, tables)
    np.testing.assert_array_equal(np.asarray(sharded.n_orders),
                                  np.asarray(plain.n_orders))
    np.testing.assert_allclose(np.asarray(sharded.i_toa),
                               np.asarray(plain.i_toa),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(sharded.i_surface),
                               np.asarray(plain.i_surface),
                               rtol=1e-12, atol=1e-14)
