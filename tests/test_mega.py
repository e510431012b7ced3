"""Whole-solve mega-kernel vs the reference jnp solver.

The mega path runs the entire order loop inside one Pallas kernel
(ops/megakernel.py); in interpreter mode on CPU it must match
``solve_batch`` (and therefore the NumPy oracle) on eligible grids.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
from sos_rt_tpu.fused import solve_batch_mega
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
def test_mega_matches_reference(surface):
    grid = GridSpec(nb_angles=56, nb_layers=64)
    tables = _tables(grid)
    opts = SolverOptions(surface=surface, dtype="float64")
    scenes = _scenes(4)
    ref = solve_batch(scenes, tables, grid, opts)
    mega = solve_batch_mega(scenes, tables, grid, opts, cols_per_block=2,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(mega.n_orders),
                                  np.asarray(ref.n_orders))
    scale = float(jnp.max(jnp.abs(ref.i_total)))
    np.testing.assert_allclose(np.asarray(mega.i_total),
                               np.asarray(ref.i_total),
                               rtol=1e-9, atol=1e-11 * scale)
    assert bool(jnp.all(mega.converged))


@pytest.mark.slow
def test_mega_pads_ragged_batch():
    """B not divisible by cols_per_block exercises the pad/trim path."""
    grid = GridSpec(nb_angles=56, nb_layers=64)
    tables = _tables(grid)
    opts = SolverOptions(surface="lambertian", dtype="float64")
    scenes = _scenes(3)
    ref = solve_batch(scenes, tables, grid, opts)
    mega = solve_batch_mega(scenes, tables, grid, opts, cols_per_block=2,
                            interpret=True)
    scale = float(jnp.max(jnp.abs(ref.i_total)))
    np.testing.assert_allclose(np.asarray(mega.i_total),
                               np.asarray(ref.i_total),
                               rtol=1e-9, atol=1e-11 * scale)


@pytest.mark.slow
def test_mega_summary_matches_full():
    """outputs='summary' returns exactly the full solve's TOA/surface
    rows and stats (the accumulators just stay in VMEM)."""
    grid = GridSpec(nb_angles=56, nb_layers=64)
    tables = _tables(grid)
    opts = SolverOptions(surface="lambertian", dtype="float64")
    scenes = _scenes(4)
    full = solve_batch_mega(scenes, tables, grid, opts, cols_per_block=2,
                            interpret=True)
    summ = solve_batch_mega(scenes, tables, grid, opts, cols_per_block=2,
                            interpret=True, outputs="summary")
    np.testing.assert_array_equal(np.asarray(summ.n_orders),
                                  np.asarray(full.n_orders))
    np.testing.assert_array_equal(np.asarray(summ.converged),
                                  np.asarray(full.converged))
    np.testing.assert_array_equal(np.asarray(summ.i_toa),
                                  np.asarray(full.i_total[:, 0, :]))
    np.testing.assert_array_equal(np.asarray(summ.i_surface),
                                  np.asarray(full.i_total[:, -1, :]))


@pytest.mark.slow
def test_mega_summary_fallback_small_mu_grid():
    """summary mode on a mega-unsupported grid delegates to the fused
    path and reduces its Solution."""
    grid = GridSpec(nb_angles=201, nb_layers=48)
    tables = _tables(grid)
    opts = SolverOptions(surface="lambertian", dtype="float64")
    scenes = _scenes(2)
    ref = solve_batch(scenes, tables, grid, opts)
    summ = solve_batch_mega(scenes, tables, grid, opts, interpret=True,
                            outputs="summary")
    scale = float(jnp.max(jnp.abs(ref.i_total)))
    np.testing.assert_allclose(np.asarray(summ.i_toa),
                               np.asarray(ref.i_total[:, 0, :]),
                               rtol=1e-9, atol=1e-11 * scale)


def test_mega_falls_back_on_small_mu_grid():
    """M=201 has |µ|<0.01 columns → without the eager band-coverage
    grant, mega must delegate to the fused path."""
    grid = GridSpec(nb_angles=201, nb_layers=48)
    tables = _tables(grid)
    opts = SolverOptions(surface="lambertian", dtype="float64")
    scenes = _scenes(2)
    ref = solve_batch(scenes, tables, grid, opts)
    mega = solve_batch_mega(scenes, tables, grid, opts, interpret=True)
    scale = float(jnp.max(jnp.abs(ref.i_total)))
    np.testing.assert_allclose(np.asarray(mega.i_total),
                               np.asarray(ref.i_total),
                               rtol=1e-9, atol=1e-11 * scale)


@pytest.mark.parametrize("surface", ["lambertian", "specular"])
@pytest.mark.slow
def test_mega_odd_angle_count_padded(surface):
    """M=53 (not a multiple of 8) exercises the angle-padding path —
    inert pad rows must leave every real row bit-identical in effect."""
    grid = GridSpec(nb_angles=53, nb_layers=64)
    tables = _tables(grid)
    opts = SolverOptions(surface=surface, dtype="float64")
    scenes = _scenes(3)
    ref = solve_batch(scenes, tables, grid, opts)
    mega = solve_batch_mega(scenes, tables, grid, opts, cols_per_block=2,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(mega.n_orders),
                                  np.asarray(ref.n_orders))
    scale = float(jnp.max(jnp.abs(ref.i_total)))
    np.testing.assert_allclose(np.asarray(mega.i_total),
                               np.asarray(ref.i_total),
                               rtol=1e-9, atol=1e-11 * scale)


@pytest.mark.slow
def test_mega_small_mu_grid_with_band_coverage():
    """M=201 (one |µ|<0.01 column) with τ refs in the band-2 regime:
    the µ→0⁻ polyfit band overwrites the small set in BOTH paths, so
    the mega kernel (allow_small=True) must match the reference solver
    exactly (see megakernel.py scope note / mesh.mega_small_ok)."""
    from sos_rt_tpu.parallel.mesh import mega_small_ok

    grid = GridSpec(nb_angles=201, nb_layers=48)
    tables = _tables(grid)
    opts = SolverOptions(surface="lambertian", dtype="float64")
    scenes = _scenes(3)
    assert mega_small_ok(scenes, grid)
    ref = solve_batch(scenes, tables, grid, opts)
    mega = solve_batch_mega(scenes, tables, grid, opts, cols_per_block=3,
                            interpret=True, allow_small=True)
    np.testing.assert_array_equal(np.asarray(mega.n_orders),
                                  np.asarray(ref.n_orders))
    scale = float(jnp.max(jnp.abs(ref.i_total)))
    np.testing.assert_allclose(np.asarray(mega.i_total),
                               np.asarray(ref.i_total),
                               rtol=1e-9, atol=1e-11 * scale)


def test_mega_small_ok_rejects_thin_tau():
    """τ_ref ≤ 0.0625 → band width 2 does not cover the small set →
    the eager check must refuse (falls back to fused)."""
    import dataclasses as dc

    from sos_rt_tpu.parallel.mesh import mega_small_ok

    grid = GridSpec(nb_angles=201, nb_layers=48)
    scenes = dc.replace(_scenes(3),
                        tau_star_atm=jnp.full((3,), 0.01),
                        tau_star_aer=jnp.full((3,), 0.005))
    assert not mega_small_ok(scenes, grid)


@pytest.mark.slow
def test_mega_bf16x5_mode_interpret():
    """The bf16x5 accuracy mode (config.SolverOptions.mm): five-pass
    split decomposition; in interpret mode the bf16 casts still apply,
    so results track the f64 reference to the split's ~2⁻²⁵ residual
    (the throughput mode bf16x3 would sit at ~2⁻¹⁷ here)."""
    grid = GridSpec(nb_angles=56, nb_layers=64)
    tables = _tables(grid)
    # 3 orders: beyond that the split's tiny dot residual can flip the
    # smoothing walk's 1e-4 threshold (a documented precision-mode
    # property, not what this test gates)
    opts = SolverOptions(surface="lambertian", dtype="float64",
                         max_orders=3, mm="bf16x5")
    scenes = _scenes(2)
    ref = solve_batch(scenes, tables, grid,
                      dataclasses.replace(opts, mm=None))
    mega = solve_batch_mega(scenes, tables, grid, opts, cols_per_block=2,
                            interpret=True)
    scale = float(jnp.max(jnp.abs(ref.i_total)))
    diff = np.abs(np.asarray(mega.i_total) - np.asarray(ref.i_total))
    # bulk of the field at the split's dot-residual floor; a small set
    # of lanes may carry a smoothing-walk threshold flip (bounded, but
    # orders of magnitude above the floor)
    frac_off = float((diff > 1e-6 * scale).mean())
    assert frac_off < 0.015, frac_off
    assert float(diff.max()) < 1e-3 * scale, float(diff.max())
    assert float(np.median(diff)) < 1e-8 * scale, float(np.median(diff))


@pytest.mark.slow
def test_mega_predict_sort_matches(monkeypatch):
    """sort='predict' (coarse-grid order-count pre-solve as the block
    sort key, r5) must return per-column results identical to the
    unsorted solve — only the block composition changes."""
    import sos_rt_tpu.fused as fz

    monkeypatch.setattr(fz, "PREDICT_MIN_BATCH", 1)
    grid = GridSpec(nb_angles=64, nb_layers=32)   # (M-1) % 7 == 0
    tables = _tables(grid)
    opts = SolverOptions(surface="lambertian", dtype="float64")
    scenes = _scenes(4)
    key = fz.predict_order_count(scenes, tables, grid, opts, interpret=True)
    assert key is not None and key.shape == (4,)
    assert int(jnp.min(key)) >= 1
    plain = solve_batch_mega(scenes, tables, grid, opts, cols_per_block=2,
                             interpret=True, sort=False)
    pred = solve_batch_mega(scenes, tables, grid, opts, cols_per_block=2,
                            interpret=True, sort="predict")
    np.testing.assert_array_equal(np.asarray(pred.n_orders),
                                  np.asarray(plain.n_orders))
    np.testing.assert_array_equal(np.asarray(pred.i_total),
                                  np.asarray(plain.i_total))


def test_predict_order_count_nondivisible_grid():
    """(M-1) not divisible by (PREDICT_ANGLES-1) → the predictor
    subsamples the nearest fine nodes (the canonical 501-angle case);
    the returned counts must be valid positive order counts."""
    import sos_rt_tpu.fused as fz

    grid = GridSpec(nb_angles=51, nb_layers=40)   # 50 % 7 == 1
    tables = _tables(grid)
    opts = SolverOptions(surface="lambertian", dtype="float64")
    scenes = _scenes(4)
    key = fz.predict_order_count(scenes, tables, grid, opts,
                                 interpret=True, min_batch=1)
    assert key is not None and key.shape == (4,)
    counts = np.asarray(key)
    assert np.all(counts >= 1) and np.all(counts < 100)
    # more optically thick lanes must not predict fewer orders than the
    # thinnest lane (monotone physics sanity, not exactness)
    assert counts[-1] >= counts[0]
