"""Golden regression tests: JAX solver vs frozen oracle fixtures.

Fixtures in tests/golden/*.npz are generated once from the NumPy oracle
(tools: /tmp/gen_golden.py history → sos_rt_tpu/oracle) at a mid-size
grid (201 angles × 304 layers) for all five BASELINE config families.
The JAX solver must reproduce them at rtol ≤ 1e-5 (BASELINE.md target);
observed agreement is ~1e-8.
"""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
from sos_rt_tpu.models import build_phase_tables
from sos_rt_tpu.solver import PhaseTables, solve_column

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
FIXTURES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.npz")))

MODEL_FOR = {
    "rayleigh_mid": ("rayleigh", {}),
    "hg_mid": ("hg", {"g": 0.7}),
    "eva_mid": ("lognormal", {"lambda0": 0.550, "indx": 1.44 + 0.0j,
                              "n0": 501187.0, "r_m": 0.506, "sig": 1.2}),
    "wildfire_mid": ("lognormal", {"lambda0": 0.550, "indx": 1.7 + 0.03j,
                                   "n0": 501187.0, "r_m": 0.065, "sig": 1.5}),
    "fwc_mid": ("fwc", {}),
}


@pytest.mark.parametrize("path", FIXTURES,
                         ids=[os.path.basename(p)[:-4] for p in FIXTURES])
def test_solver_matches_golden(path):
    name = os.path.basename(path)[:-4]
    with np.load(path) as z:
        gold_i = z["I"]
        gold_i1 = z["I1"]
        gold_orders = int(z["n_orders"])
        surface = str(z["surface"])
        m, l = int(z["M"]), int(z["L"])
        scene_kw = {k[6:]: float(z[k]) for k in z.files if k.startswith("scene_")}

    grid = GridSpec(nb_angles=m, nb_layers=l)
    mu = grid.mu()
    aer = MODEL_FOR[name]
    p0a, pa = build_phase_tables("rayleigh", mu, scene_kw["mu0"])
    p0r, pr = build_phase_tables(aer[0], mu, scene_kw["mu0"], **aer[1])
    tables = PhaseTables(*[jnp.asarray(x) for x in (p0a, pa, p0r, pr)])
    opts = SolverOptions(surface=surface, dtype="float64")
    sol = jax.jit(solve_column, static_argnums=(2, 3))(
        Scene(**scene_kw), tables, grid, opts)
    assert int(sol.n_orders) == gold_orders
    scale = np.abs(gold_i).max()
    np.testing.assert_allclose(np.asarray(sol.i1), gold_i1,
                               rtol=1e-5, atol=1e-7 * scale)
    np.testing.assert_allclose(np.asarray(sol.i_total), gold_i,
                               rtol=1e-5, atol=1e-7 * scale)


def test_fixtures_exist():
    assert len(FIXTURES) >= 5, (
        "golden fixtures missing — regenerate from the oracle")
