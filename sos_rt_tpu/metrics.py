"""Structured per-solve metrics (SURVEY.md §5 "Metrics / observability").

The reference logs convergence with bare ``print()`` per order
(SOS_Aer_main_lambertian.py:313); this module replaces that with a
structured metrics dict computed from any batched solution —
order-count statistics, convergence counts, wall-clock throughput —
emitted by :func:`sos_rt_tpu.parallel.solve_batch` (``metrics=True``)
and printed as one JSON line by the CLI sweep.
"""
from __future__ import annotations

import json
import sys
from typing import Any, Dict

import jax
import jax.numpy as jnp


def solution_metrics(sol, wall_s: float | None = None,
                     n_devices: int = 1) -> Dict[str, Any]:
    """Metrics dict from a Solution or SweepSummary (batched or single).

    Fields: batch, orders max/mean, convergence counts, and — when
    ``wall_s`` is given — wall seconds plus columns/s and columns/s/chip
    (the BASELINE.md headline unit).
    """
    n_orders = jnp.atleast_1d(jnp.asarray(sol.n_orders))
    converged = jnp.atleast_1d(jnp.asarray(sol.converged))
    batch = int(n_orders.shape[0])
    m: Dict[str, Any] = {
        "batch": batch,
        "orders_max": int(jnp.max(n_orders)),
        "orders_mean": float(jnp.mean(n_orders.astype(jnp.float32))),
        "n_converged": int(jnp.sum(converged)),
        "n_unconverged": batch - int(jnp.sum(converged)),
    }
    if wall_s is not None:
        m["wall_s"] = round(float(wall_s), 4)
        if wall_s > 0:
            m["col_per_s"] = round(batch / wall_s, 1)
            m["col_per_s_per_chip"] = round(batch / wall_s / max(n_devices, 1), 1)
        m["n_devices"] = n_devices
    return m


def emit(m: Dict[str, Any], file=None, label: str = "metrics") -> None:
    """Print one JSON metrics line (stderr by default)."""
    print(json.dumps({label: m}), file=file or sys.stderr, flush=True)


def block_until_ready(sol):
    """Block on a solution pytree (for wall-clock measurement)."""
    jax.block_until_ready(jax.tree_util.tree_leaves(sol)[0])
    return sol
