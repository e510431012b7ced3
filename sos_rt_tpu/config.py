"""Configuration pytrees for the SOS solver.

The reference configures runs by editing module-level constants in the
driver files (SOS_Aer_main_lambertian.py:22-96; README.md:65-81 documents
"edit the file" as the config mechanism).  Here configuration is explicit:

- :class:`GridSpec`   — static grid geometry (hashable, closed over by jit).
- :class:`Scene`      — per-column physical parameters (a pytree of arrays;
                        every field may be batched for vmapped solves).
- :class:`SolverOptions` — static solver knobs (dtype, order cap, tolerance).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np

# Matmul precision for all physics dots.  TPU MXU default is a single
# bf16 pass: ~3 decimal digits, which compounds to percent-level radiance
# error over tens of scattering orders (measured).  HIGHEST keeps true
# f32 accumulation at ~20% cost on the mega-kernel path.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST

# µ-threshold constants (reference: SOS_Aer_global_va.py:5-7)
MU_THRESHOLD = 0.01         # switch to asymptotic small-µ handling
MU_EXTREME_THRESHOLD = 1e-8  # extremely small µ → pure Taylor limit
MU_VERY_SMALL_THRESHOLD = 0.001  # very small µ → Taylor limit

# Resonance tolerance |µ ± µ0| (reference: SOS_Aer_main_lambertian.py:111)
MU0_RESONANCE_TOL = 1e-4


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Static angular/vertical grid geometry.

    ``spacing='uniform'`` reproduces the reference layout exactly
    (SOS_Aer_main_lambertian.py:57-61): µ = concat(linspace(-1,0,M),
    linspace(0,1,M)) — 2M points with µ=0 duplicated at indices M-1 and
    M; τ grid of ``nb_layers`` levels from TOA (τ=0) to the surface.

    ``spacing='gauss'`` (SURVEY.md §7 "Gauss-Legendre option") keeps the
    same structural layout (each half ends/starts with the µ=0 point the
    solver's special columns require) but places the M-1 interior points
    of each half at Gauss–Legendre nodes mapped to (−1,0)/(0,1) — nodes
    cluster toward the grazing-angle endpoints where the radiance varies
    fastest.  All quadratures stay trapezoid-on-the-grid (the reference's
    integration semantics), so every solver path works unchanged.  The
    mega kernels accept any µ spacing (the smoothing-walk blend loads
    the per-row µ table, ops/megakernel.py RC_MUUP); note GL grids
    large enough to place nodes below MU_THRESHOLD (~M ≥ 16) need the
    windowed small-µ machinery — GL puts ~6.4% of nodes below the
    threshold vs the 6% polyfit band, so the band-coverage shortcut
    (mesh.mega_small_ok) structurally never applies and those grids
    run the fused/reference engines.
    """

    nb_angles: int = 501
    nb_layers: int = 800
    spacing: str = "uniform"

    def __post_init__(self):
        if self.nb_angles < 8:
            raise ValueError("nb_angles must be >= 8")
        if self.nb_layers < 4:
            raise ValueError("nb_layers must be >= 4")
        if self.spacing not in ("uniform", "gauss"):
            raise ValueError(f"unknown spacing: {self.spacing!r}")

    @property
    def n_mu(self) -> int:
        return 2 * self.nb_angles

    def mu(self) -> np.ndarray:
        """The 2M-point µ grid, float64, with duplicated 0."""
        m = self.nb_angles
        if self.spacing == "gauss":
            x, _ = np.polynomial.legendre.leggauss(m - 1)
            up = np.sort(0.5 * (x + 1.0))            # (0, 1) interior
            return np.concatenate([-up[::-1], [0.0], [0.0], up])
        return np.concatenate([np.linspace(-1.0, 0.0, m), np.linspace(0.0, 1.0, m)])

    def trapz_weights(self) -> np.ndarray:
        """w such that  Σ_k w_k f_k == np.trapz(f, mu)  for any f."""
        return trapz_weights(self.mu())


def trapz_weights(x: np.ndarray) -> np.ndarray:
    """Per-point trapezoid weights for a 1-D (possibly non-uniform) grid."""
    x = np.asarray(x, dtype=np.float64)
    w = np.zeros_like(x)
    dx = np.diff(x)
    w[:-1] += dx / 2.0
    w[1:] += dx / 2.0
    return w


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    """Per-column physical parameters (a pytree; all fields batchable).

    Mirrors the knobs of the reference drivers
    (SOS_Aer_main_lambertian.py:22-96):

    - ``mu0``           cosine of solar zenith angle.
    - ``grd_alb``       ground albedo / reflectivity ρ.
    - ``alb_atm/aer``   single-scattering albedos ω.
    - ``tau_star_atm``  molecular optical depth (whole column).
    - ``tau_star_aer``  aerosol-layer optical depth.
    - ``z0/z_up/z_down`` atmosphere top and aerosol-layer bounds (km).
    """

    mu0: Any = 0.5
    grd_alb: Any = 0.15
    alb_atm: Any = 1.0
    alb_aer: Any = 1.0
    tau_star_atm: Any = 0.104
    tau_star_aer: Any = 0.120
    z0: Any = 120.0
    z_up: Any = 25.0
    z_down: Any = 17.0


@dataclasses.dataclass(frozen=True)
class SolverOptions:
    """Static solver options (hashable; closed over by jit).

    - ``surface``     'lambertian' | 'specular'  (README.md:18-19).
    - ``max_orders``  hard cap on scattering orders (the reference loops
                      until the 100 ppm criterion with no cap,
                      SOS_Aer_main_lambertian.py:311).
    - ``tol``         series truncation criterion (1e-4 = 100 ppm).
    - ``dtype``       compute dtype on device ('float32' | 'float64').
    - ``mm``          mega-kernel matmul precision mode (None = engine
                      default: 'bf16x3' for f32, 'highest' for f64).
                      'bf16x3' (3 MXU passes) is the throughput default:
                      measured r4 (after the ops/megakernel._split_bf16
                      excess-precision fix) 116k col/s AND the f32
                      accuracy floor — p50 1.9e-4 TOA-row error vs the
                      f64 oracle, identical to the XLA-HIGHEST
                      reference engine.  'bf16x5' (5 passes, 86k col/s)
                      and 'highest' (6 XLA passes, 80k col/s) measure
                      the same p50 — kept as verification modes: a
                      default-vs-bf16x5 discrepancy isolates dot-path
                      regressions.  All three engines honor ``mm`` for
                      float32 (mega defaults to bf16x3; fused/reference
                      default to XLA HIGHEST when mm is None); float64
                      always runs at full precision — mm is ignored.
    """

    surface: str = "lambertian"
    max_orders: int = 100
    tol: float = 1e-4
    dtype: str = "float64"
    scan_impl: str = "associative"   # 'associative' (single column) or
                                     # 'sequential' (large batches)
    mm: Optional[str] = None

    def __post_init__(self):
        if self.surface not in ("lambertian", "specular"):
            raise ValueError(f"unknown surface type: {self.surface!r}")
        if self.mm not in (None, "bf16x3", "bf16x5", "highest"):
            raise ValueError(f"unknown mm mode: {self.mm!r}")
