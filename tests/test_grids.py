import numpy as np
import pytest

from sos_rt_tpu.config import GridSpec, trapz_weights
from sos_rt_tpu.grids import tau_profile, tau_profile_np


def test_mu_grid_layout():
    g = GridSpec(nb_angles=51, nb_layers=100)
    mu = g.mu()
    assert mu.shape == (102,)
    assert mu[0] == -1.0 and mu[-1] == 1.0
    # duplicated zero at M-1, M (reference main_lambertian.py:59-61)
    assert mu[50] == 0.0 and mu[51] == 0.0


def test_trapz_weights_match_numpy():
    g = GridSpec(nb_angles=51, nb_layers=100)
    mu = g.mu()
    w = trapz_weights(mu)
    rng = np.random.default_rng(0)
    f = rng.normal(size=mu.shape)
    assert np.allclose(w @ f, np.trapezoid(f, mu), rtol=1e-14)


@pytest.mark.parametrize("L", [100, 333, 800])
def test_tau_profile_jax_matches_numpy(L):
    args = (0.104, 0.120, 120.0, 25.0, 17.0, L)
    tau_np, iu_np, id_np = tau_profile_np(*args)
    tau_j, iu_j, id_j = tau_profile(*args)
    assert int(iu_j) == iu_np and int(id_j) == id_np
    np.testing.assert_allclose(np.asarray(tau_j), tau_np, rtol=1e-12)


def test_tau_profile_shape_and_totals():
    tau, iu, idn = tau_profile_np(0.104, 0.120, 120.0, 25.0, 17.0, 800)
    assert tau[0] == 0.0
    assert np.all(np.diff(tau) > 0)
    assert np.isclose(tau[-1], 0.224)
    assert 0 < iu < idn < 799
