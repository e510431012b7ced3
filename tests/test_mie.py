"""Property-based validation of the in-repo Mie core (no miepython needed).

SURVEY.md §7: "Mie via our own Bohren–Huffman series … validated" — since
the reference's miepython is not vendored, we validate against exact
physical identities instead of frozen third-party values.
"""
import numpy as np
import pytest

from sos_rt_tpu.models import miecore


@pytest.mark.parametrize("m,x", [(1.5 + 0j, 5.0), (1.44 + 0j, 11.4), (1.7 - 0.03j, 0.9)])
def test_optical_theorem(m, x):
    qext, _, _, _ = miecore.efficiencies_single(m, x)
    s1, _ = miecore.s1_s2(m, x, [1.0])
    assert np.isclose(qext, 4.0 * s1[0].real / x**2, rtol=1e-12)


@pytest.mark.parametrize("m,x", [(1.5 + 0j, 5.0), (1.33 + 0j, 2.0)])
def test_qsca_angular_quadrature(m, x):
    _, qsca, _, _ = miecore.efficiencies_single(m, x)
    th = np.linspace(0, np.pi, 40001)
    s1, s2 = miecore.s1_s2(m, x, np.cos(th))
    q = np.trapezoid((np.abs(s1) ** 2 + np.abs(s2) ** 2) * np.sin(th), th) / x**2
    assert np.isclose(qsca, q, rtol=1e-6)


def test_albedo_normalization():
    """∫ i dΩ == Qsca/Qext (matches miepython's default normalization)."""
    m, x = 1.5 - 0.1j, 3.0
    qext, qsca, _, _ = miecore.efficiencies_single(m, x)
    th = np.linspace(0, np.pi, 40001)
    i = miecore.i_unpolarized(m, x, np.cos(th))
    total = 2 * np.pi * np.trapezoid(i * np.sin(th), th)
    assert np.isclose(total, qsca / qext, rtol=1e-6)


def test_rayleigh_limit():
    """x → 0 nonabsorbing sphere: i(µ) ∝ (1+µ²), Qsca ∝ x⁴."""
    m = 1.33 + 0j
    mu = np.linspace(-1, 1, 41)
    i = miecore.i_unpolarized(m, 0.01, mu)
    ref = 1.0 + mu**2
    ratio = i / ref
    assert np.allclose(ratio, ratio[0], rtol=1e-3)
    _, qs1, _, _ = miecore.efficiencies_single(m, 0.01)
    _, qs2, _, _ = miecore.efficiencies_single(m, 0.02)
    assert np.isclose(qs2 / qs1, 16.0, rtol=1e-2)


def test_asymmetry_bounds():
    for x in (0.5, 2.0, 10.0):
        _, _, _, g = miecore.efficiencies_single(1.44 + 0j, x)
        assert -1.0 < g < 1.0


def test_native_matches_numpy(monkeypatch):
    """The C++ core (csrc/miecore.cpp) must agree with the NumPy twin."""
    from sos_rt_tpu.models import _native

    if _native.get_lib() is None:
        pytest.skip("native mie core unavailable (no toolchain)")
    m, x = 1.7 + 0.03j, 7.3
    mu = np.linspace(-1, 1, 101)
    s1n, s2n = miecore.s1_s2(m, x, mu)
    qn = miecore.efficiencies_single(m, x)
    monkeypatch.setenv("SOS_RT_NO_NATIVE", "1")
    monkeypatch.setattr(_native, "_TRIED", False)
    monkeypatch.setattr(_native, "_LIB", None)
    s1p, s2p = miecore.s1_s2(m, x, mu)
    qp = miecore.efficiencies_single(m, x)
    monkeypatch.setattr(_native, "_TRIED", False)
    monkeypatch.setattr(_native, "_LIB", None)
    np.testing.assert_allclose(s1n, s1p, rtol=1e-12)
    np.testing.assert_allclose(s2n, s2p, rtol=1e-12)
    np.testing.assert_allclose(qn, qp, rtol=1e-12)
