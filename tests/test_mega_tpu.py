"""On-TPU compiled mega-kernel parity (VERDICT r2 item 4).

The interpret-mode tests (test_mega.py) validate the kernel's math on
CPU; this gate validates the COMPILED kernel on real hardware — the
bf16x3 hi/lo operator splits, in-kernel I₁ and join carries have no
interpret-mode equivalent of Mosaic's actual lowering.  Skipped unless
a TPU backend is present (tests/conftest.py forces CPU, so this runs
via `python -m pytest tests/test_mega_tpu.py --no-header -p no:cacheprovider`
with the axon PYTHONPATH, or through bench.py --parity which records
the same comparison in every BENCH tail).
"""
import dataclasses

import numpy as np
import pytest


def _tpu_available():
    import jax

    try:
        return any(d.platform != "cpu" for d in jax.devices())
    except Exception:
        return False


@pytest.mark.tpu
def test_mega_compiled_matches_reference_on_tpu():
    import jax
    import jax.numpy as jnp

    if not _tpu_available():
        pytest.skip("no TPU backend (conftest forces CPU)")

    from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
    from sos_rt_tpu.parallel import broadcast_scene, solve_batch
    from sos_rt_tpu.solver import PhaseTables

    grid = GridSpec(nb_angles=64, nb_layers=128)
    opts = SolverOptions(surface="lambertian", dtype="float32",
                         max_orders=100)
    tables = PhaseTables.from_models(grid, 0.5, atm=("rayleigh", {}),
                                     aer=("fwc", {}), dtype=jnp.float32)
    B = 256
    base = broadcast_scene(Scene(), B)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    scenes = dataclasses.replace(
        base,
        grd_alb=jax.random.uniform(k1, (B,), maxval=0.9),
        tau_star_aer=jax.random.uniform(k2, (B,), minval=0.01, maxval=0.4),
        alb_aer=jax.random.uniform(k3, (B,), minval=0.7, maxval=1.0))
    mega = solve_batch(scenes, tables, grid, opts, engine="mega",
                       outputs="summary")
    ref = solve_batch(scenes, tables, grid, opts, engine="reference")
    ref_toa = np.asarray(ref.i_total[:, 0, :])
    ref_srf = np.asarray(ref.i_total[:, -1, :])
    scale = max(np.abs(ref_toa).max(), np.abs(ref_srf).max())
    per_col = np.maximum(
        np.abs(np.asarray(mega.i_toa) - ref_toa).max(axis=1),
        np.abs(np.asarray(mega.i_surface) - ref_srf).max(axis=1)) / scale
    # f32 + bf16x3 matmuls vs f32 HIGHEST over tens of orders: the
    # smoothing walk's 1e-4 second-difference threshold flips on exact
    # ties (documented engine-independent behavior), giving percent-level
    # diffs on a few columns — the equal-order-count population is the
    # kernel-numerics signal (measured r3: 250/256 equal, see BENCH tail)
    eq = np.asarray(mega.n_orders) == np.asarray(ref.n_orders)
    assert int(eq.sum()) >= int(0.9 * B), (int(eq.sum()), B)
    assert float(np.median(per_col)) < 1e-3, float(np.median(per_col))
