"""Resumable sweep shards (SURVEY.md §5 checkpoint/resume row) + metrics."""
import dataclasses
import json
import os

import numpy as np
import pytest

import sos_rt_tpu.presets as presets
from sos_rt_tpu.config import GridSpec, SolverOptions
from sos_rt_tpu.sweep import build_sweep_batch, load_sweep, run_sweep


@pytest.fixture()
def small_preset():
    return dataclasses.replace(
        presets.PRESETS["fwc_sweep"],
        grid=GridSpec(nb_angles=32, nb_layers=48),
        opts=SolverOptions(surface="lambertian", dtype="float32",
                           max_orders=40))


def test_build_sweep_batch_deterministic(small_preset):
    s1, t1 = build_sweep_batch(small_preset, 8, seed=3, mu0_pool=4)
    s2, t2 = build_sweep_batch(small_preset, 8, seed=3, mu0_pool=4)
    np.testing.assert_array_equal(np.asarray(s1.mu0), np.asarray(s2.mu0))
    np.testing.assert_array_equal(np.asarray(s1.grd_alb),
                                  np.asarray(s2.grd_alb))
    np.testing.assert_array_equal(np.asarray(t1.p0_atm), np.asarray(t2.p0_atm))
    assert np.asarray(t1.p0_atm).shape[0] == 8      # gathered per column


@pytest.mark.slow
def test_kill_and_resume(tmp_path, small_preset):
    """A sweep killed mid-run resumes from its shards: completed chunks
    are not recomputed, and the merged result equals a one-shot run."""
    out = str(tmp_path / "sw")
    m1 = run_sweep(small_preset, 8, seed=1, mu0_pool=2, engine="fused",
                   outputs="full", chunk=4, out_dir=out,
                   stop_after_chunks=1)
    assert m1["n_completed"] == 1 and not m1["complete"]
    shard0 = os.path.join(out, "shard_00000.npz")
    mtime0 = os.path.getmtime(shard0)

    m2 = run_sweep(small_preset, 8, seed=1, mu0_pool=2, engine="fused",
                   outputs="full", chunk=4, out_dir=out, resume=True)
    assert m2["complete"] and m2["n_completed"] == 2
    assert os.path.getmtime(shard0) == mtime0       # chunk 0 not recomputed

    res = load_sweep(out)
    out2 = str(tmp_path / "oneshot")
    run_sweep(small_preset, 8, seed=1, mu0_pool=2, engine="fused",
              outputs="full", chunk=8, out_dir=out2)
    ref = load_sweep(out2)
    np.testing.assert_allclose(res["i_toa"], ref["i_toa"], rtol=1e-6)
    np.testing.assert_array_equal(res["n_orders"], ref["n_orders"])


def test_resume_spec_mismatch_raises(tmp_path, small_preset):
    out = str(tmp_path / "sw")
    run_sweep(small_preset, 8, seed=1, mu0_pool=2, engine="fused",
              outputs="full", chunk=4, out_dir=out, stop_after_chunks=1)
    with pytest.raises(ValueError, match="spec mismatch"):
        run_sweep(small_preset, 8, seed=2, mu0_pool=2, engine="fused",
                  outputs="full", chunk=4, out_dir=out, resume=True)


def test_resume_rejects_same_name_different_physics(tmp_path, small_preset):
    """The spec pins grid/opts, not just the preset NAME: resuming into
    an out_dir written under a same-named but modified preset must be
    rejected instead of silently mixing shards (advisor r3)."""
    out = str(tmp_path / "sw")
    run_sweep(small_preset, 8, seed=1, mu0_pool=2, engine="fused",
              outputs="full", chunk=4, out_dir=out, stop_after_chunks=1)
    modified = dataclasses.replace(
        small_preset, grid=GridSpec(nb_angles=40, nb_layers=48))
    with pytest.raises(ValueError, match="spec mismatch"):
        run_sweep(modified, 8, seed=1, mu0_pool=2, engine="fused",
                  outputs="full", chunk=4, out_dir=out, resume=True)
    modified2 = dataclasses.replace(
        small_preset, opts=SolverOptions(surface="specular",
                                         dtype="float32", max_orders=40))
    with pytest.raises(ValueError, match="spec mismatch"):
        run_sweep(modified2, 8, seed=1, mu0_pool=2, engine="fused",
                  outputs="full", chunk=4, out_dir=out, resume=True)


def test_metrics_fields(small_preset):
    m = run_sweep(small_preset, 8, seed=0, mu0_pool=2, engine="fused",
                  outputs="full")
    for key in ("batch", "orders_max", "orders_mean", "n_converged",
                "wall_s", "col_per_s", "col_per_s_per_chip"):
        assert key in m, key
    assert m["batch"] == 8
    assert m["n_converged"] == 8
    assert json.dumps(m)                           # JSON-serializable


@pytest.mark.slow
def test_run_sweep_with_mesh(tmp_path, small_preset):
    """Chunked resumable sweep composed with a device mesh: shard files
    equal the unmeshed run's."""
    import jax
    import numpy as np

    from sos_rt_tpu.parallel import make_mesh

    out1 = str(tmp_path / "nomesh")
    run_sweep(small_preset, 16, seed=5, mu0_pool=2, engine="reference",
              outputs="full", chunk=8, out_dir=out1)
    out2 = str(tmp_path / "mesh")
    run_sweep(small_preset, 16, seed=5, mu0_pool=2, engine="reference",
              outputs="full", chunk=8, out_dir=out2,
              mesh=make_mesh((len(jax.devices()), 1)))
    a, b = load_sweep(out1), load_sweep(out2)
    np.testing.assert_array_equal(a["n_orders"], b["n_orders"])
    # f32 preset: sharded compilation differs in fusion choices → last-ulp
    np.testing.assert_allclose(a["i_toa"], b["i_toa"], rtol=1e-5,
                               atol=1e-7)


def test_partial_final_chunk_padded(tmp_path, small_preset):
    """A batch not divisible by chunk: the final partial chunk is padded
    to the full chunk shape (reusing the compiled solve) and sliced —
    results equal a one-shot run, shard sizes are honest."""
    out = str(tmp_path / "sw")
    m = run_sweep(small_preset, 10, seed=1, mu0_pool=2, engine="fused",
                  outputs="full", chunk=4, out_dir=out)
    assert m["complete"] and m["batch"] == 10
    res = load_sweep(out)
    assert res["i_toa"].shape[0] == 10
    out2 = str(tmp_path / "oneshot")
    run_sweep(small_preset, 10, seed=1, mu0_pool=2, engine="fused",
              outputs="full", chunk=10, out_dir=out2)
    ref = load_sweep(out2)
    np.testing.assert_allclose(res["i_toa"], ref["i_toa"], rtol=1e-6)
    np.testing.assert_array_equal(res["n_orders"], ref["n_orders"])


@pytest.mark.slow
def test_sweep_save_orders_matches_single_column(tmp_path, small_preset):
    """--save-orders shard arrays (per-order TOA/surface rows, VERDICT
    r4 item 7 / the reference's I_saved read-set) equal the per-column
    solve_column_orders rows for every column."""
    import jax

    from sos_rt_tpu.solver import solve_column_orders

    preset = dataclasses.replace(
        small_preset,
        opts=dataclasses.replace(small_preset.opts, dtype="float64",
                                 max_orders=25))
    out = str(tmp_path / "orders")
    m = run_sweep(preset, 6, seed=2, mu0_pool=2, chunk=3, out_dir=out,
                  save_orders=True)
    assert m["complete"]
    scenes, tables = build_sweep_batch(preset, 6, seed=2, mu0_pool=2)

    got_toa, got_srf, got_valid = [], [], []
    for i in range(2):
        with np.load(os.path.join(out, f"shard_{i:05d}.npz")) as z:
            got_toa.append(z["orders_toa"])
            got_srf.append(z["orders_surface"])
            got_valid.append(z["order_valid"])
    got_toa = np.concatenate(got_toa)
    got_srf = np.concatenate(got_srf)
    got_valid = np.concatenate(got_valid)
    assert got_toa.shape == (6, 25, 64)

    for i in range(6):
        scene_i = jax.tree_util.tree_map(lambda x: x[i], scenes)
        tbl_i = dataclasses.replace(tables, p0_atm=tables.p0_atm[i],
                                    p0_aer=tables.p0_aer[i])
        _, buf, valid = solve_column_orders(scene_i, tbl_i, preset.grid,
                                            preset.opts)
        np.testing.assert_array_equal(got_valid[i], np.asarray(valid))
        np.testing.assert_allclose(got_toa[i], np.asarray(buf[:, 0, :]),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(got_srf[i], np.asarray(buf[:, -1, :]),
                                   rtol=1e-12, atol=1e-14)
