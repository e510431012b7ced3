"""CLI end-to-end smoke tests (small grids, CPU)."""
import json
import os

import numpy as np

from sos_rt_tpu.cli import main


def test_run_preset_writes_npz(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "out.npz")
    main(["run", "--preset", "hg", "--nb-angles", "51", "--nb-layers", "100",
          "--dtype", "float64", "-o", out])
    with np.load(out) as z:
        assert z["I"].shape == (100, 102)
        assert z["flux_up"].shape == (100,)
        assert z["heating_rate"].shape == (100,)
        assert int(z["n_orders"]) >= 2
        assert np.isfinite(z["I"]).all()


def test_critical_albedo_cmd(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import dataclasses

    import sos_rt_tpu.presets as presets
    from sos_rt_tpu.config import GridSpec

    small = dataclasses.replace(presets.PRESETS["hg"],
                                grid=GridSpec(nb_angles=31, nb_layers=60))
    monkeypatch.setitem(presets.PRESETS, "hg", small)
    out = str(tmp_path / "ca.json")
    main(["critical-albedo", "--preset", "hg", "--tau-aer", "0.1", "-o", out])
    with open(out) as f:
        data = json.load(f)
    val = data["critical_albedo"]["0.1"]
    assert 0.0 <= val <= 1.0


def test_sweep_cmd(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import dataclasses

    import sos_rt_tpu.presets as presets
    from sos_rt_tpu.config import GridSpec, SolverOptions

    small = dataclasses.replace(
        presets.PRESETS["fwc_sweep"], grid=GridSpec(nb_angles=31, nb_layers=48),
        opts=SolverOptions(surface="lambertian", dtype="float64", max_orders=40))
    monkeypatch.setitem(presets.PRESETS, "fwc_sweep", small)
    out = str(tmp_path / "sweepdir")
    main(["sweep", "--preset", "fwc_sweep", "--batch", "8",
          "--mu0-pool", "2", "-o", out])
    from sos_rt_tpu.sweep import load_sweep

    res = load_sweep(out)
    assert res["n_orders"].shape == (8,)
    assert res["i_toa"].shape == (8, 62)
    assert np.isfinite(res["i_toa"]).all()


def test_list_cmd(capsys):
    main(["list"])
    out = capsys.readouterr().out
    assert "eva" in out and "rayleigh" in out


def test_sweep_cmd_mega_engine(tmp_path, monkeypatch):
    """The headline path through the CLI: mega engine + summary outputs
    on an eligible grid (interpret mode on CPU)."""
    monkeypatch.chdir(tmp_path)
    import dataclasses

    import sos_rt_tpu.presets as presets
    from sos_rt_tpu.config import GridSpec, SolverOptions

    small = dataclasses.replace(
        presets.PRESETS["fwc_sweep"],
        grid=GridSpec(nb_angles=32, nb_layers=48),
        opts=SolverOptions(surface="lambertian", dtype="float32",
                           max_orders=40))
    monkeypatch.setitem(presets.PRESETS, "fwc_sweep", small)
    out = str(tmp_path / "megadir")
    main(["sweep", "--preset", "fwc_sweep", "--batch", "8",
          "--mu0-pool", "2", "--engine", "mega", "-o", out,
          "--metrics", str(tmp_path / "m.json")])
    from sos_rt_tpu.sweep import load_sweep

    res = load_sweep(out)
    assert res["i_toa"].shape == (8, 64)
    assert res["converged"].all()
    with open(tmp_path / "m.json") as f:
        m = json.load(f)
    assert m["engine"] == "mega" and m["outputs"] == "summary"
    assert m["batch"] == 8
