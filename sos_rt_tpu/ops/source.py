"""Source function Jₙ as MXU matmuls.

The reference computes, per layer t (SOS_Aer_main_lambertian.py:317-325):

    Jn[t,:] = (ω/4) · np.trapz(P[:,::-1] * In_1[t,:], mu, axis=1)

i.e. Jn[t,m] = (ω/4) Σ_k w_k P[m, 2M-1-k] In_1[t,k] — a matmul with the
trapz-weighted flipped phase operator.  Inside the aerosol layer the atm
and aer integrals are blended by dτ weights.  This is the FLOPs hot spot
(SURVEY.md C11): one (L,2M)@(2M,2M) matmul per species per order, batched
over columns.
"""
from __future__ import annotations

import jax.numpy as jnp

from sos_rt_tpu.config import MATMUL_PRECISION


def source_operator(p, w_mu):
    """A[k, m] = w_k · P[m, 2M-1-k]  so that  Jn = (ω/4)·(In_1 @ A)."""
    return w_mu[:, None] * p[:, ::-1].T


def source_function(in_prev, a_atm, a_aer, alb_atm, alb_aer, w_atm, w_aer,
                    idx_up, idx_down):
    """Jn over all layers; blended inside the aerosol layer.

    in_prev: (L, 2M); a_*: (2M, 2M) operators from :func:`source_operator`.
    """
    jn_atm = (alb_atm / 4.0) * jnp.dot(in_prev, a_atm,
                                       precision=MATMUL_PRECISION)
    jn_aer = (alb_aer / 4.0) * jnp.dot(in_prev, a_aer,
                                       precision=MATMUL_PRECISION)
    t = jnp.arange(in_prev.shape[0])
    in_layer = ((t >= idx_up) & (t <= idx_down))[:, None]
    return jnp.where(in_layer, w_atm * jn_atm + w_aer * jn_aer, jn_atm)
