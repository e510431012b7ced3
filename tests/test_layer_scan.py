"""Layer-sharded (context-parallel) affine scan vs the on-chip scan."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sos_rt_tpu.ops.sweeps import _affine_scan
from sos_rt_tpu.parallel.layer_scan import sharded_affine_scan

pytestmark = pytest.mark.slow  # >=10 s each: full-tier only (see README)


@pytest.fixture()
def mesh8():
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(8)
    return Mesh(devs, ("data",),
                axis_types=(jax.sharding.AxisType.Auto,))


@pytest.mark.parametrize("reverse", [False, True])
def test_sharded_scan_matches_local(mesh8, reverse):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    L, M = 128, 24
    # attenuation-like a in (0, 1), arbitrary b
    a = jax.random.uniform(k1, (L, M), jnp.float64, 0.1, 0.99)
    b = jax.random.normal(k2, (L, M), jnp.float64)
    ref = _affine_scan(a, b, reverse=reverse, method="associative")
    got = sharded_affine_scan(a, b, mesh8, reverse=reverse)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-14)


def test_sharded_scan_matches_solver_downsweep(mesh8):
    """The exact operator shape the downward sweep uses: a = e^{Δτ/µ}
    prefixed with 1, trapezoid b rows (ops/sweeps.py::down_sweep_scan)."""
    L, M = 64, 16
    tau = jnp.linspace(0.0, 0.3, L).astype(jnp.float64)
    mu = jnp.linspace(-1.0, -0.05, M).astype(jnp.float64)
    jn = jnp.sin(jnp.arange(L * M, dtype=jnp.float64)).reshape(L, M) + 2.0
    dtau = jnp.diff(tau)
    att = jnp.exp(dtau[:, None] / mu[None, :])
    a = jnp.concatenate([jnp.ones((1, M), jnp.float64), att])
    b = jnp.concatenate([jnp.zeros((1, M), jnp.float64),
                         0.5 * dtau[:, None] * (jn[:-1] * att + jn[1:])])
    ref = _affine_scan(a, b, method="associative")
    got = sharded_affine_scan(a, b, mesh8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-16)
