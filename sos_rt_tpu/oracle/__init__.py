"""NumPy oracle — faithful, runnable re-implementation of the reference.

The reference snapshot does not run as-is (broken imports ``I1_In`` and
``SOS_Aer_vdh_extract``, SOS_Aer_main_lambertian.py:6,8 — see SURVEY.md §1).
This subpackage is the M0 milestone: the same numerics, importable and
tested, used to generate golden data that the JAX/TPU solver must match at
rtol ≤ 1e-5.
"""
from sos_rt_tpu.oracle.solver import oracle_solve  # noqa: F401
