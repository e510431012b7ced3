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


def _parity(opts_kw, engine_kw):
    import jax
    import jax.numpy as jnp

    from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
    from sos_rt_tpu.parallel import broadcast_scene, solve_batch
    from sos_rt_tpu.solver import PhaseTables

    grid = GridSpec(nb_angles=64, nb_layers=128)
    surface = opts_kw.pop("surface", "lambertian")
    opts = SolverOptions(surface=surface, dtype="float32",
                         max_orders=100, **opts_kw)
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
                       outputs="summary", **engine_kw)
    ref_opts = SolverOptions(surface=surface, dtype="float32",
                             max_orders=100)
    ref = solve_batch(scenes, tables, grid, ref_opts, engine="reference")
    ref_toa = np.asarray(ref.i_total[:, 0, :])
    ref_srf = np.asarray(ref.i_total[:, -1, :])
    scale = max(np.abs(ref_toa).max(), np.abs(ref_srf).max())
    per_col = np.maximum(
        np.abs(np.asarray(mega.i_toa) - ref_toa).max(axis=1),
        np.abs(np.asarray(mega.i_surface) - ref_srf).max(axis=1)) / scale
    n_eq = int((np.asarray(mega.n_orders) == np.asarray(ref.n_orders)).sum())
    return per_col, n_eq, B


@pytest.mark.tpu
def test_mega_compiled_matches_reference_on_tpu():
    """The kernel-correctness gate, DEFAULT (bf16x3) mode: after the
    r4 _split_bf16 excess-precision fix the compiled kernel's dots sit
    at the f32 accumulation floor (measured: p50 1.9e-4 vs the
    reference engine, 255/256 order agreement — 5× assertion margin).
    A regression here means real kernel numerics drift (the r4 failure
    mode: XLA elided the host-side bf16 split's lo part, silently
    degrading every jitted dot to 2 passes)."""
    if not _tpu_available():
        pytest.skip("no TPU backend (conftest forces CPU)")
    per_col, n_eq, B = _parity({}, {})
    assert n_eq >= int(0.95 * B), (n_eq, B)
    assert float(np.median(per_col)) < 1e-3, float(np.median(per_col))


@pytest.mark.tpu
def test_mega_compiled_specular_on_tpu():
    """Specular-mirror BC through the compiled kernel (r4: measured p50
    1.9e-4 vs the f64 oracle, 256/256 order agreement — the r3 2.9e-3
    tail was the elided operator split, not the mirror BC)."""
    if not _tpu_available():
        pytest.skip("no TPU backend (conftest forces CPU)")
    per_col, n_eq, B = _parity({"surface": "specular"}, {})
    assert n_eq >= int(0.95 * B), (n_eq, B)
    assert float(np.median(per_col)) < 1e-3, float(np.median(per_col))


@pytest.mark.tpu
def test_mega_compiled_bf16x5_agrees_with_default():
    """Verification mode: bf16x5 (5-pass split) must land where the
    default does — a divergence between the two isolates dot-path bugs
    without involving the reference engine (see SolverOptions.mm)."""
    if not _tpu_available():
        pytest.skip("no TPU backend (conftest forces CPU)")
    per_d, n_eq_d, B = _parity({}, {})
    per_5, n_eq_5, _ = _parity({"mm": "bf16x5"}, {})
    assert n_eq_5 >= int(0.95 * B), (n_eq_5, B)
    assert float(np.median(per_5)) < 1e-3, float(np.median(per_5))


@pytest.mark.tpu
def test_stream_compiled_canonical_on_tpu():
    """The HBM-streaming mega engine COMPILED at the reference's
    canonical 501×800 production grid (VERDICT r4 item 1 done-criterion:
    parity gate extended to that grid).  Compared against the compiled
    fused engine (itself gated against the reference engine above):
    both f32 paths must agree at the accumulation floor with identical
    order counts.  Measured r5: stream 801 col/s vs fused 302 col/s at
    B=128/bf16x3."""
    import jax
    import jax.numpy as jnp

    if not _tpu_available():
        pytest.skip("no TPU backend (conftest forces CPU)")

    from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
    from sos_rt_tpu.fused import solve_batch_fused, solve_batch_mega
    from sos_rt_tpu.parallel import broadcast_scene
    from sos_rt_tpu.parallel.mesh import mega_small_ok
    from sos_rt_tpu.solver import PhaseTables

    grid = GridSpec(nb_angles=501, nb_layers=800)
    opts = SolverOptions(surface="lambertian", dtype="float32",
                         max_orders=40, mm="bf16x3")
    tables = PhaseTables.from_models(grid, 0.5, atm=("rayleigh", {}),
                                     aer=("hg", {"g": 0.7}),
                                     dtype=jnp.float32)
    B = 32
    scenes = dataclasses.replace(
        broadcast_scene(Scene(), B),
        grd_alb=jnp.linspace(0.05, 0.6, B),
        tau_star_aer=jnp.linspace(0.05, 0.3, B),
        alb_aer=jnp.linspace(0.8, 1.0, B))
    assert mega_small_ok(scenes, grid)
    stream = solve_batch_mega(scenes, tables, grid, opts,
                              outputs="summary", allow_small=True)
    assert bool(jnp.all(stream.converged))
    fused = solve_batch_fused(scenes, tables, grid, opts)
    n_eq = int((np.asarray(stream.n_orders)
                == np.asarray(fused.n_orders)).sum())
    ref_toa = np.asarray(fused.i_total[:, 0, :])
    ref_srf = np.asarray(fused.i_total[:, -1, :])
    scale = max(np.abs(ref_toa).max(), np.abs(ref_srf).max())
    per_col = np.maximum(
        np.abs(np.asarray(stream.i_toa) - ref_toa).max(axis=1),
        np.abs(np.asarray(stream.i_surface) - ref_srf).max(axis=1)) / scale
    assert n_eq >= int(0.9 * B), (n_eq, B)
    assert float(np.median(per_col)) < 1e-3, float(np.median(per_col))


@pytest.mark.tpu
def test_mega_compiled_gl_grid_on_tpu():
    """Gauss–Legendre grid through the COMPILED mega kernel (VERDICT r4
    item 6 done-criterion): the RC_MUUP smoothing-blend table on real
    hardware.  M=12 GL has no small-µ nodes so mega is eligible
    outright; compared against the reference engine, f32."""
    import jax.numpy as jnp

    if not _tpu_available():
        pytest.skip("no TPU backend (conftest forces CPU)")

    from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
    from sos_rt_tpu.parallel import broadcast_scene, solve_batch
    from sos_rt_tpu.solver import PhaseTables

    grid = GridSpec(nb_angles=12, nb_layers=64, spacing="gauss")
    opts = SolverOptions(surface="lambertian", dtype="float32",
                         max_orders=100)
    tables = PhaseTables.from_models(grid, 0.5, atm=("rayleigh", {}),
                                     aer=("hg", {"g": 0.7}),
                                     dtype=jnp.float32)
    B = 64
    scenes = dataclasses.replace(
        broadcast_scene(Scene(), B),
        grd_alb=jnp.linspace(0.0, 0.8, B),
        tau_star_aer=jnp.linspace(0.05, 0.35, B))
    mega = solve_batch(scenes, tables, grid, opts, engine="mega",
                       outputs="summary")
    ref = solve_batch(scenes, tables, grid, opts, engine="reference")
    ref_toa = np.asarray(ref.i_total[:, 0, :])
    ref_srf = np.asarray(ref.i_total[:, -1, :])
    scale = max(np.abs(ref_toa).max(), np.abs(ref_srf).max())
    per_col = np.maximum(
        np.abs(np.asarray(mega.i_toa) - ref_toa).max(axis=1),
        np.abs(np.asarray(mega.i_surface) - ref_srf).max(axis=1)) / scale
    n_eq = int((np.asarray(mega.n_orders) == np.asarray(ref.n_orders)).sum())
    assert n_eq >= int(0.95 * B), (n_eq, B)
    assert float(np.median(per_col)) < 1e-3, float(np.median(per_col))


@pytest.mark.tpu
def test_fused_compiled_matches_reference_on_tpu():
    """The fused engine's compiled sweep kernels (layer-major, r4) vs
    the reference engine on hardware — the sibling gate to the mega
    ones (the fused path is the bench fallback tier and the
    canonical-grid batch engine)."""
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
    fused = solve_batch(scenes, tables, grid, opts, engine="fused")
    ref = solve_batch(scenes, tables, grid, opts, engine="reference")
    ref_toa = np.asarray(ref.i_total[:, 0, :])
    ref_srf = np.asarray(ref.i_total[:, -1, :])
    scale = max(np.abs(ref_toa).max(), np.abs(ref_srf).max())
    per_col = np.maximum(
        np.abs(np.asarray(fused.i_total[:, 0, :]) - ref_toa).max(axis=1),
        np.abs(np.asarray(fused.i_total[:, -1, :]) - ref_srf).max(axis=1)
    ) / scale
    n_eq = int((np.asarray(fused.n_orders) == np.asarray(ref.n_orders)).sum())
    assert n_eq >= int(0.95 * B), (n_eq, B)
    assert float(np.median(per_col)) < 1e-3, float(np.median(per_col))
