"""Outputs (C16) and forcing/critical-albedo (C17) behavior."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
from sos_rt_tpu.forcing import critical_albedo, radiative_forcing
from sos_rt_tpu.models import build_phase_tables
from sos_rt_tpu.outputs import (
    diffusivity,
    flux_up_down,
    heating_rate,
    net_flux,
    toa_net_flux,
)
from sos_rt_tpu.solver import PhaseTables, solve_column

M, L = 51, 100
GRID = GridSpec(nb_angles=M, nb_layers=L)
MU = GRID.mu()
W = GRID.trapz_weights()
OPTS = SolverOptions(surface="specular", dtype="float64")


@pytest.fixture(scope="module")
def sol_scene():
    p0a, pa = build_phase_tables("rayleigh", MU, 0.5)
    p0r, pr = build_phase_tables("hg", MU, 0.5, g=0.7)
    tables = PhaseTables(*[jnp.asarray(x) for x in (p0a, pa, p0r, pr)])
    scene = Scene(grd_alb=0.15)
    sol = jax.jit(solve_column, static_argnums=(2, 3))(scene, tables, GRID, OPTS)
    return sol, scene, tables


def test_diffusivity_range(sol_scene):
    sol, scene, _ = sol_scene
    dif = diffusivity(sol.i_total, jnp.asarray(MU), jnp.asarray(W))
    assert dif.shape == (L,)
    assert np.all(np.abs(np.asarray(dif)) <= 1.0)
    # scattered field is predominantly downward (solar source from above)
    assert np.asarray(dif).mean() < 0.5


def test_flux_up_down_matches_oracle_formula(sol_scene):
    sol, scene, _ = sol_scene
    i = np.asarray(sol.i_total)
    tau = np.asarray(sol.tau)
    f0 = np.pi / 0.5
    fu, fd = flux_up_down(sol.i_total, jnp.asarray(MU), jnp.asarray(W),
                          sol.tau, scene.mu0, scene.grd_alb, M)
    fd_ref = (np.trapezoid(i[:, :M] * MU[:M], MU[:M], axis=1)
              - f0 * np.exp(-tau / 0.5))
    fu_ref = (np.trapezoid(i[:, M:] * MU[M:], MU[M:], axis=1)
              + 0.15 * f0 * np.exp(-(2 * tau[-1] - tau) / 0.5))
    np.testing.assert_allclose(np.asarray(fd), fd_ref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(fu), fu_ref, rtol=1e-12)


def test_net_flux_beam_conventions(sol_scene):
    sol, scene, _ = sol_scene
    args = (sol.i_total, jnp.asarray(MU), jnp.asarray(W), sol.tau,
            scene.mu0, scene.grd_alb)
    graphe = net_flux(*args, beam="graphe")
    heat = net_flux(*args, beam="heating")
    phys = net_flux(*args, beam="physical")
    # at µ0=0.5 the 'heating' and 'physical' beam scales coincide
    np.testing.assert_allclose(np.asarray(heat), np.asarray(phys), rtol=1e-12)
    assert not np.allclose(np.asarray(graphe), np.asarray(heat))
    # physical net flux must conserve (ω=1 atmosphere) to grid accuracy
    p = np.asarray(phys)
    assert (p.max() - p.min()) / abs(p.mean()) < 0.03


def test_heating_rate_shape_and_erasure(sol_scene):
    sol, scene, _ = sol_scene
    z = jnp.linspace(120.0, 0.0, L)
    hr = heating_rate(sol.i_total, jnp.asarray(MU), jnp.asarray(W), sol.tau,
                      z, scene.mu0, scene.grd_alb, M, sol.idx_up, sol.idx_down)
    hr = np.asarray(hr)
    assert hr.shape == (L,)
    iu, idn = int(sol.idx_up), int(sol.idx_down)
    assert hr[iu - 1] == hr[iu - 2]          # erased pics (graphe.py:88-91)
    assert hr[idn] == hr[idn - 1]
    assert hr[-1] == hr[-2]                  # last = prev (graphe.py:85)


def test_radiative_forcing_sign_and_zero(sol_scene):
    _, scene, tables = sol_scene
    f = jax.jit(radiative_forcing, static_argnums=(2, 3))
    # absorbing aerosol (ω_aer < 1) over a dark surface warms (ΔF > 0
    # with this net-TOA sign convention ⇒ nonzero); ω differences matter
    dark = dataclasses.replace(scene, alb_aer=0.3, grd_alb=0.05)
    bright = dataclasses.replace(scene, alb_aer=1.0, grd_alb=0.05)
    f_dark = float(f(dark, tables, GRID, OPTS))
    f_bright = float(f(bright, tables, GRID, OPTS))
    assert f_dark != pytest.approx(f_bright, abs=1e-6)
    none = dataclasses.replace(scene, tau_star_aer=0.0)
    assert float(f(none, tables, GRID, OPTS)) == pytest.approx(0.0, abs=1e-12)


def test_critical_albedo_bisection(sol_scene):
    _, scene, tables = sol_scene
    alb = critical_albedo(dataclasses.replace(scene, grd_alb=0.15),
                          tables, GRID, OPTS)
    a = float(alb)
    assert 0.0 <= a <= 1.0
    # the returned ω must bracket the forcing sign change: scattering-only
    # aerosol (ω=1) cools, strongly absorbing warms over this surface
    f = jax.jit(radiative_forcing, static_argnums=(2, 3))
    f_low = float(f(dataclasses.replace(scene, alb_aer=max(a - 0.3, 0.0)),
                    tables, GRID, OPTS))
    f_high = float(f(dataclasses.replace(scene, alb_aer=min(a + 0.3, 1.0)),
                     tables, GRID, OPTS))
    assert f_low * f_high <= 0 or abs(f_low) < 5e-3 or abs(f_high) < 5e-3


def test_per_order_fields(sol_scene):
    from sos_rt_tpu.outputs import per_order_diffusivity
    from sos_rt_tpu.solver import solve_column_orders

    sol, scene, tables = sol_scene
    opts_k = dataclasses.replace(OPTS, max_orders=30)
    sol2, orders, valid = jax.jit(
        solve_column_orders, static_argnums=(2, 3))(scene, tables, GRID, opts_k)
    n = int(sol2.n_orders)
    assert n == int(sol.n_orders)
    assert int(np.sum(np.asarray(valid))) == n
    # per-order fields sum to the total (plus nothing else)
    total = np.asarray(orders).sum(axis=0)
    np.testing.assert_allclose(total, np.asarray(sol2.i_total),
                               rtol=1e-10, atol=1e-12)
    dif = per_order_diffusivity(orders[:n], jnp.asarray(MU), jnp.asarray(W))
    assert dif.shape == (n, L)
    assert np.all(np.abs(np.asarray(dif)) <= 1.0)


@pytest.mark.slow
def test_radiative_forcing_batch_summary_path():
    """Batched ΔF via the mega/summary engines equals the per-column
    reference forcing (two solves per column; only TOA rows used)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
    from sos_rt_tpu.forcing import radiative_forcing, radiative_forcing_batch
    from sos_rt_tpu.parallel import broadcast_scene
    from sos_rt_tpu.solver import PhaseTables

    grid = GridSpec(nb_angles=32, nb_layers=48)
    opts = SolverOptions(surface="lambertian", dtype="float64")
    tables = PhaseTables.from_models(grid, 0.5, atm=("rayleigh", {}),
                                     aer=("hg", {"g": 0.7}))
    B = 3
    scenes = dataclasses.replace(
        broadcast_scene(Scene(), B),
        grd_alb=jnp.linspace(0.1, 0.6, B),
        tau_star_aer=jnp.linspace(0.05, 0.3, B),
        alb_aer=jnp.linspace(0.8, 1.0, B))
    got = np.asarray(radiative_forcing_batch(scenes, tables, grid, opts,
                                             engine="mega"))
    want = np.stack([
        np.asarray(radiative_forcing(
            jax.tree_util.tree_map(lambda x: x[i], scenes),
            tables, grid, opts))
        for i in range(B)])
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


@pytest.mark.slow
def test_critical_albedo_batch_matches_column_path():
    """The production batched bisection (one mega/summary solve per
    step, baseline hoisted out of the loop — VERDICT r4 item 3) takes
    the same bisection decisions as the per-column solve_column path."""
    import dataclasses

    import jax.numpy as jnp

    from sos_rt_tpu.config import GridSpec, Scene, SolverOptions
    from sos_rt_tpu.forcing import critical_albedo, critical_albedo_batch
    from sos_rt_tpu.parallel import broadcast_scene
    from sos_rt_tpu.solver import PhaseTables

    grid = GridSpec(nb_angles=32, nb_layers=48)
    opts = SolverOptions(surface="lambertian", dtype="float64")
    tables = PhaseTables.from_models(grid, 0.5, atm=("rayleigh", {}),
                                     aer=("hg", {"g": 0.7}))
    B = 3
    scenes = dataclasses.replace(
        broadcast_scene(Scene(), B),
        grd_alb=jnp.linspace(0.05, 0.4, B),
        tau_star_aer=jnp.linspace(0.05, 0.3, B))
    fast = np.asarray(critical_albedo_batch(scenes, tables, grid, opts,
                                            engine="mega"))
    slow = np.asarray(critical_albedo(scenes, tables, grid, opts))
    np.testing.assert_allclose(fast, slow, rtol=1e-9, atol=1e-12)
