"""Van de Hulst / Chandrasekhar golden validation (VERDICT r1, item 3).

External anchors for the single-layer SOS solver
(sos_rt_tpu/single_layer.py — the Duan–Min recursion of
SOS_Aer_I1_In.py:13-130 with the I·π/µ0 VdH normalization):

1. published values/identities of the Chandrasekhar H-function
   (Chandrasekhar 1950 Table XI; van de Hulst 1980 ch. 8),
2. the semi-infinite isotropic reflection law I=(ω/4)H(µ)H(µ0)/(µ+µ0),
3. an independent doubling-adding solver (finite slabs, iso + HG).

None of these use successive orders of scattering, so they break the
solver↔oracle self-reference.  The reference's own table files
(vdh_iso.py / vdh_HG.py, SOS_Single_layer/README.md:40-49) are absent
from its snapshot; these anchors reproduce the same theory.
"""
import numpy as np
import pytest

from sos_rt_tpu.config import GridSpec, SolverOptions
from sos_rt_tpu.single_layer import solve_single_layer, vdh_extract
from sos_rt_tpu.validation.vdh import (
    chandrasekhar_h,
    doubling_slab,
    hg_azimuth_avg,
    semi_infinite_reflection,
)

VDH_MU = np.array([0.1, 0.3, 0.5, 0.7, 0.9, 1.0])


# ---------------------------------------------------------------------------
# H-function against published values & exact identities
# ---------------------------------------------------------------------------

def test_h_function_published_conservative():
    """Chandrasekhar 1950, Table XI (ω=1, isotropic): H(1) = 2.9078."""
    h = chandrasekhar_h([1.0], omega=1.0)
    assert abs(h[0] - 2.9078) < 2e-3


def test_h_function_exact_moments_conservative():
    """Exact moments for ω=1: ∫₀¹H dµ = 2, ∫₀¹H µ dµ = 2/√3."""
    from sos_rt_tpu.validation.vdh import gauss_mu

    g, w = gauss_mu(256)
    h = chandrasekhar_h(g, omega=1.0)
    assert abs(np.sum(w * h) - 2.0) < 1e-4
    assert abs(np.sum(w * g * h) - 2.0 / np.sqrt(3.0)) < 1e-4


def test_h_function_zeroth_moment_identity():
    """(ω/2)·∫₀¹H dµ = 1 − √(1−ω)  (exact for every ω)."""
    from sos_rt_tpu.validation.vdh import gauss_mu

    g, w = gauss_mu(256)
    for omega in (0.3, 0.8, 0.95):
        h = chandrasekhar_h(g, omega=omega)
        lhs = 0.5 * omega * np.sum(w * h)
        assert abs(lhs - (1.0 - np.sqrt(1.0 - omega))) < 1e-10


# ---------------------------------------------------------------------------
# Doubling internal consistency
# ---------------------------------------------------------------------------

def test_doubling_conserves_energy_conservative():
    """ω=1: plane albedo + diffuse transmission + direct = 1."""
    out = doubling_slab(tau_star=1.0, omega=1.0, mu0=0.5, g=0.0)
    total = out["albedo"] + out["trans_diffuse"] + out["t_direct"]
    assert abs(total - 1.0) < 1e-7


def test_doubling_matches_semi_infinite():
    """Thick-slab doubling → H-function law (independent formulations)."""
    mu0, omega = 0.6, 0.9
    out = doubling_slab(tau_star=64.0, omega=omega, mu0=mu0, g=0.0)
    want = semi_infinite_reflection(out["mu"], mu0, omega)
    sel = out["mu"] >= 0.05
    assert np.allclose(out["i_up"][sel], want[sel], rtol=2e-5)


# ---------------------------------------------------------------------------
# Single-layer SOS solver vs the anchors
# ---------------------------------------------------------------------------

def _iso_tables(grid):
    from sos_rt_tpu.models import build_phase_tables

    return build_phase_tables("iso", grid.mu(), 0.5)


def _sos_field(grid, opts, mu0, tau_star, omega, tables):
    sol = solve_single_layer(mu0, tau_star, tables, grid, opts, alb=omega)
    assert bool(sol.converged)
    return np.asarray(sol.i_total, np.float64), sol


def test_single_layer_vs_semi_infinite_iso():
    """Thick isotropic slab at VdH angles vs (ω/4)H(µ)H(µ0)/(µ+µ0).

    Comparison at µ ≥ 0.3: below that the reference's small-µ
    machinery (the µ→0⁺ smoothing walk, main_lambertian.py:405-411)
    deliberately replaces the field with a linear blend — faithful to
    the reference, not to exact theory (checked separately at 5%).
    """
    grid = GridSpec(nb_angles=96, nb_layers=2400)
    opts = SolverOptions(max_orders=120, dtype="float64")
    mu0, omega, tau_star = 0.5, 0.8, 25.0
    tables = _iso_tables(grid)
    field, _ = _sos_field(grid, opts, mu0, tau_star, omega, tables)
    up, _ = vdh_extract(field, grid, mu_values=VDH_MU)
    want = semi_infinite_reflection(VDH_MU, mu0, omega)
    sel = VDH_MU >= 0.3
    # measured O(Δτ²) layer-trapz convergence: 0.62% @ L=600 → 0.048%
    # @ L=2400 (τ*=25); 1e-3 leaves ×2 headroom at this resolution
    np.testing.assert_allclose(up[sel], want[sel], rtol=1e-3)


@pytest.mark.parametrize("omega,g,mu0,rtol,nb_phi", [
    (1.0, 0.0, 0.5, 2e-3, None),    # conservative isotropic
    (0.9, 0.0, 0.7, 2e-3, None),    # absorbing isotropic
    # HG with the reference's 25-point-φ azimuth tables
    # (SOS_Aer_phase_func.py:81): the table itself carries ~0.5%
    # azimuth-quadrature error for g=0.75
    (0.97, 0.75, 0.5, 8e-3, 25),
    # HG with a 401-point-φ table: isolates the transport accuracy from
    # the reference's coarse-φ quirk (residual ~ column-normalization +
    # angular trapz of the peaked kernel; measured 0.39% max)
    (0.97, 0.75, 0.5, 5e-3, 401),
])
def test_single_layer_vs_doubling(omega, g, mu0, rtol, nb_phi):
    """Finite slab (τ*=1): SOS reflection/transmission vs doubling."""
    grid = GridSpec(nb_angles=96, nb_layers=400)
    opts = SolverOptions(max_orders=150, dtype="float64")
    tau_star = 1.0
    if g == 0.0:
        tables = _iso_tables(grid)
    elif nb_phi == 25:
        from sos_rt_tpu.models import build_phase_tables

        tables = build_phase_tables("hg", grid.mu(), mu0, g=g)
    else:
        from sos_rt_tpu.models.phase_common import (azimuth_p0,
                                                    azimuth_p_matrix)

        kern = lambda c: (1 - g * g) / (1 + g * g - 2 * g * c) ** 1.5
        tables = (azimuth_p0(kern, grid.mu(), mu0, nb_phi=nb_phi),
                  azimuth_p_matrix(kern, grid.mu(), nb_phi=nb_phi))
    field, _ = _sos_field(grid, opts, mu0, tau_star, omega, tables)
    dbl = doubling_slab(tau_star=tau_star, omega=omega, mu0=mu0, g=g)

    m = grid.nb_angles
    mu = np.asarray(grid.mu(), np.float64)
    # µ ≥ 0.25: outside the reference's small-µ blending band (its width
    # scales with the angular spacing; measured −2.2% at µ≈0.07 for
    # M=96, < 1e-4 above µ=0.25); looser 5% bound over the full range
    sel = dbl["mu"] >= 0.25
    up = np.interp(dbl["mu"][sel], mu[m:], field[0, m:])
    dn = np.interp(-dbl["mu"][sel][::-1], mu[:m], field[-1, :m])[::-1]
    np.testing.assert_allclose(up, dbl["i_up"][sel], rtol=rtol)
    np.testing.assert_allclose(dn, dbl["i_down"][sel], rtol=rtol)
    # full-range sanity: the reference's µ→0⁺ blend flattens the field
    # below µ≈0.2; for the forward-peaked HG kernel that deviates up to
    # ~13% from exact theory (isotropic: < 5%) — by construction
    all_up = np.interp(dbl["mu"], mu[m:], field[0, m:])
    np.testing.assert_allclose(all_up, dbl["i_up"],
                               rtol=5e-2 if g == 0.0 else 1.5e-1)


def test_single_layer_first_order_closed_form():
    """I₁ of the library solver matches the README closed form at a
    random interior point (independent arithmetic)."""
    grid = GridSpec(nb_angles=64, nb_layers=200)
    opts = SolverOptions(max_orders=2, dtype="float64")
    mu0, omega, tau_star = 0.5, 0.9, 0.7
    tables = _iso_tables(grid)
    sol = solve_single_layer(mu0, tau_star, tables, grid, opts, alb=omega)
    i1 = np.asarray(sol.i_orders[0], np.float64)
    tau = np.linspace(0.0, tau_star, grid.nb_layers)
    m = grid.nb_angles
    mu = np.asarray(grid.mu(), np.float64)
    t = 77
    # upward, µ = mu[m+20]  (SOS_Single_layer/README.md first-order block)
    mm = mu[m + 20]
    want_up = (omega / (4 * np.pi)) * (mu0 / (mu0 + mm)) * (
        np.exp(-tau[t] / mu0)
        - np.exp(-tau_star / mu0) * np.exp(-(tau_star - tau[t]) / mm))
    assert np.isclose(i1[t, m + 20], want_up * np.pi / mu0, rtol=1e-12)
    # downward, µ = mu[30]
    md = mu[30]
    want_dn = (omega / (4 * np.pi)) * (mu0 / (mu0 + md)) * (
        np.exp(-tau[t] / mu0) - np.exp(tau[t] / md))
    assert np.isclose(i1[t, 30], want_dn * np.pi / mu0, rtol=1e-12)


def test_vdh_extract_angles():
    grid = GridSpec(nb_angles=96, nb_layers=16)
    field = np.tile(np.asarray(grid.mu(), np.float64), (16, 1))
    up, down = vdh_extract(field, grid)
    np.testing.assert_allclose(up, [0.0, 0.1, 0.3, 0.5, 0.7, 0.9, 1.0],
                               atol=1e-12)
    np.testing.assert_allclose(down, [0.0, -0.1, -0.3, -0.5, -0.7, -0.9, -1.0],
                               atol=1e-12)
