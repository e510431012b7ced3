"""sos_rt_tpu — TPU-native successive-orders-of-scattering radiative transfer.

A brand-new JAX/XLA/Pallas framework with the capabilities of the NumPy
reference ``Guillaume-SOULIER/SOS-Radiative-Transfer`` (see SURVEY.md):
plane-parallel atmosphere + embedded aerosol layer, solved by successive
orders of scattering to a 100 ppm series truncation, with Lambertian or
specular surface reflection, six phase-function families, fluxes /
diffusivity / heating-rate outputs, and the Haywood critical-albedo search.

Layout
------
- ``grids``      : µ grid, trapezoid weights, τ profiles (pure jnp).
- ``config``     : frozen config pytrees (scene, grid, solver).
- ``models``     : phase-function table builders (host-side, f64)
                   + Mie core (Bohren–Huffman series).
- ``ops``        : device kernels — first-order closed form, Jₙ matmul
                   operators, scan-based sweeps, small-µ stabilization.
- ``solver``     : ``solve_column`` — the pure jittable column solver.
- ``outputs``    : flux / diffusivity / heating-rate reductions.
- ``forcing``    : radiative forcing + critical-albedo search.
- ``parallel``   : mesh construction and sharded batched solves.
- ``oracle``     : faithful NumPy re-implementation of the reference
                   (golden data generator; fixes its broken imports).
"""

__version__ = "0.1.0"

from sos_rt_tpu.config import GridSpec, Scene, SolverOptions  # noqa: F401
