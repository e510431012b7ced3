"""JAX solver vs NumPy oracle — the M1 contract (SURVEY.md §7).

Every config must match the oracle allclose at rtol 1e-5 (we achieve
~1e-8 or better in f64) with the identical order count.  Grids are chosen
to exercise every numeric path:
- M=51: band width 1 (slope fallback), no small-µ columns;
- M=201: |µ|<0.01 windowed asymptotic columns active;
- τ*≈2.5: wider polyfit band (int(0.04·M)) and the reference's
  "thick" up-sweep branch (τ*/µ_min ≥ 50);
- resonance columns |µ∓µ0| < 1e-4 (µ0=0.5 lies on the grid).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
from sos_rt_tpu.models import build_phase_tables
from sos_rt_tpu.oracle import oracle_solve
from sos_rt_tpu.solver import PhaseTables, Solution, solve_column

CASES = [
    # (id, M, L, surface, atm_model, aer_model, scene-overrides)
    ("rayleigh_lamb", 51, 100, "lambertian", ("rayleigh", {}), ("rayleigh", {}), {}),
    ("hg_spec", 51, 100, "specular", ("rayleigh", {}), ("hg", {"g": 0.7}), {}),
    ("smallmu_spec", 201, 80, "specular", ("rayleigh", {}), ("hg", {"g": 0.7}), {}),
    ("thick_lamb", 101, 90, "lambertian", ("iso", {}), ("hg", {"g": 0.5}),
     {"tau_star_atm": 2.0, "tau_star_aer": 0.5, "grd_alb": 0.6}),
    ("fwc_spec", 51, 100, "specular", ("rayleigh", {}), ("fwc", {}), {}),
]


def _run(m, l, surface, atm, aer, over):
    grid = GridSpec(nb_angles=m, nb_layers=l)
    mu = grid.mu()
    scene_kw = dict(mu0=0.5, grd_alb=0.15, alb_atm=1.0, alb_aer=1.0,
                    tau_star_atm=0.104, tau_star_aer=0.120,
                    z0=120.0, z_up=25.0, z_down=17.0)
    scene_kw.update(over)
    p0a, pa = build_phase_tables(atm[0], mu, scene_kw["mu0"], **atm[1])
    p0r, pr = build_phase_tables(aer[0], mu, scene_kw["mu0"], **aer[1])
    ref = oracle_solve(surface=surface, nb_layers=l, nb_angles=m,
                       p0_atm=p0a, p_atm=pa, p0_aer=p0r, p_aer=pr, **scene_kw)
    scene = Scene(**scene_kw)
    tables = PhaseTables(*[jnp.asarray(x) for x in (p0a, pa, p0r, pr)])
    opts = SolverOptions(surface=surface, dtype="float64")
    sol = jax.jit(solve_column, static_argnums=(2, 3))(scene, tables, grid, opts)
    return sol, ref


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_matches_oracle(case):
    _, m, l, surface, atm, aer, over = case
    sol, ref = _run(m, l, surface, atm, aer, over)
    assert int(sol.n_orders) == ref["n_orders"]
    assert bool(sol.converged)
    scale = np.abs(ref["I"]).max()
    np.testing.assert_allclose(np.asarray(sol.i1), ref["I1"],
                               rtol=1e-5, atol=1e-8 * scale)
    np.testing.assert_allclose(np.asarray(sol.i_total), ref["I"],
                               rtol=1e-5, atol=1e-8 * scale)
    np.testing.assert_allclose(np.asarray(sol.tau), ref["tau"], rtol=1e-12)
    assert int(sol.idx_up) == ref["idx_up"]
    assert int(sol.idx_down) == ref["idx_down"]


def test_solution_is_pytree():
    leaves = jax.tree_util.tree_leaves(
        Solution(i_total=jnp.zeros(3), i1=jnp.zeros(3), n_orders=1,
                 converged=True, tau=jnp.zeros(3), idx_up=1, idx_down=2))
    assert len(leaves) == 7
