"""Phase-function table properties (SURVEY.md §4(b)).

Normalizations per the reference: ∫P0 dµ = 2 (SOS_Aer_phase_func.py:103)
and ∫P(:,n) dµ = 4 for every column (SOS_Aer_phase_func.py:131).
"""
import numpy as np
import pytest

from sos_rt_tpu.config import GridSpec
from sos_rt_tpu.models import available_models, build_phase_tables

GRID = GridSpec(nb_angles=31, nb_layers=60)
MU = GRID.mu()

CASES = [
    ("iso", {}),
    ("rayleigh", {}),
    ("hg", {"g": 0.7}),
    ("fwc", {}),
    ("mie", {"indx": 1.44 + 0j, "r": 0.3, "lambda0": 0.55}),
    ("lognormal", {"lambda0": 0.55, "indx": 1.44 + 0j, "n0": 501187.0,
                   "r_m": 0.506, "sig": 1.2}),
]


@pytest.mark.parametrize("kind,params", CASES, ids=[c[0] for c in CASES])
def test_normalizations(kind, params):
    p0, p = build_phase_tables(kind, MU, 0.5, cache=False, **params)
    assert p0.shape == (62,) and p.shape == (62, 62)
    assert np.isclose(np.trapezoid(p0, MU), 2.0, rtol=1e-12)
    cols = np.trapezoid(p, MU, axis=0)
    np.testing.assert_allclose(cols, 4.0, rtol=1e-12)
    assert np.all(p0 >= 0) and np.all(p >= 0)


def test_hg_forward_peak():
    p0, _ = build_phase_tables("hg", MU, 1.0, cache=False, g=0.8)
    # µ0=1 (overhead sun): forward scattering = downward (µ=-1) dominates
    assert p0[0] > p0[-1]


def test_rayleigh_symmetric_in_mu():
    p0, _ = build_phase_tables("rayleigh", MU, 0.5, cache=False)
    # Rayleigh kernel is even in cosΘ: P0(µ) == P0(-µ)
    np.testing.assert_allclose(p0, p0[::-1], rtol=1e-10)


def test_strict_dispatch():
    with pytest.raises(ValueError):
        build_phase_tables("no_such_model", MU, 0.5, cache=False)
    with pytest.raises(ValueError):
        build_phase_tables("hg", MU, 0.5, cache=False)  # missing g


def test_aliases_and_listing():
    names = available_models()
    for n in ("eva", "wildfire", "iso", "rayleigh", "hg", "fwc", "mie", "lognormal"):
        assert n in names


def test_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("SOS_RT_CACHE_DIR", str(tmp_path))
    a = build_phase_tables("hg", MU, 0.5, g=0.3)
    b = build_phase_tables("hg", MU, 0.5, g=0.3)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    # different params → different entry (the reference cache ignored Mie
    # params, phase_func.py:24-33 — ours must not)
    c = build_phase_tables("hg", MU, 0.5, g=0.31)
    assert not np.allclose(a[0], c[0])
