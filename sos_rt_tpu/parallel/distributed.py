"""Multi-host (multi-process) execution: DCN-aware meshes + sharded IO.

The reference is a single-machine script collection (SURVEY.md §2); this
module is the framework's multi-host story (BASELINE.md ≥2-host scaling
target):

- :func:`init_distributed` — ``jax.distributed.initialize`` from explicit
  args or the standard env vars; safe no-op for single-process runs.
- :func:`make_host_mesh` — a ('replica', 'data') mesh whose outer axis
  spans processes (DCN) and inner axis the local chips (ICI).  Columns
  are sharded over BOTH axes (they are independent work), so the only
  cross-host traffic is (a) the replicated phase tables at setup and
  (b) the convergence all-reduce of the GSPMD reference engine — the
  shard_map engines (mega/fused) run collective-free per chip.
- :func:`process_local_batch` — build a global column batch from
  process-local shards (`jax.make_array_from_process_local_data`).

Scaling analysis (measured proxies in BASELINE.md): per-column work is
identical across shards and the solve itself has no cross-shard
dependency, so 1-chip → N-host efficiency is bounded only by dispatch
overhead and the final all-gather of (tiny) summary rows — the ≥90%
target holds whenever per-shard batch · solve time ≫ per-dispatch
overhead (~ms).  tests/test_distributed.py runs the real two-process
path on CPU and asserts sharded == single-process results.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> bool:
    """Initialize the JAX distributed runtime for multi-host execution.

    Explicit args win; otherwise the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) are
    used.  With neither, a TPU pod environment (detected via the
    TPU_WORKER_HOSTNAMES / MEGASCALE_COORDINATOR_ADDRESS env vars the
    pod runtime sets) triggers ``jax.distributed.initialize()`` with no
    args — JAX's own pod auto-configuration.  Returns True when a
    multi-process runtime was initialized, False for the single-process
    no-op (no coordinator configured or detected anywhere).
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    if coordinator_address is None:
        # pod detection: the env vars must look like real hosts — some
        # runtimes set them to single-token sentinels ("UNSET",
        # "WARNING") which must not trigger initialize() (a missing
        # coordinator hangs startup, and only ValueError/RuntimeError
        # are caught below).  Sentinels are all-caps words; real values
        # are hostnames/host:port/lists ("tpu-host-0.cluster,tpu-host-1"
        # or a bare lowercase service name like "megascale-coordinator").
        def looks_like_hosts(v: str) -> bool:
            return (bool(v) and " " not in v
                    and not v.replace("_", "").isupper())

        pod = any(looks_like_hosts(v) for v in
                  (os.environ.get(k, "").strip() for k in
                   ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")))
        if pod:
            try:
                jax.distributed.initialize()   # pod auto-configuration
                return True
            except (ValueError, RuntimeError):
                return False
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id,
        local_device_ids=local_device_ids)
    return True


def make_host_mesh(axis_names=("replica", "data")) -> Mesh:
    """('replica', 'data') mesh: processes (DCN) × local devices (ICI).

    Single-process: degenerates to (1, n_local).  Device order follows
    ``jax.devices()`` which groups by process, so the outer axis strides
    across hosts — GSPMD collectives that reduce over 'data' ride ICI,
    those over 'replica' ride DCN.
    """
    n_proc = jax.process_count()
    n_local = jax.local_device_count()
    devs = np.asarray(jax.devices()).reshape(n_proc, n_local)
    axis_types = tuple(jax.sharding.AxisType.Auto for _ in axis_names)
    return Mesh(devs, axis_names, axis_types=axis_types)


def columns_spec() -> P:
    """Columns sharded over both mesh axes (flattened host-major)."""
    return P(("replica", "data"))


def process_local_batch(mesh: Mesh, local_scenes, local_tables):
    """Assemble global sharded (scenes, tables) from process-local data.

    ``local_scenes``: Scene pytree with (B_local,) leaves holding THIS
    process's columns; ``local_tables``: PhaseTables with replicated P
    matrices and (for µ0 sweeps) (B_local, 2M) P0 rows.  Returns the
    global jax.Arrays (B_global = B_local · process_count).
    """
    col_sh = NamedSharding(mesh, columns_spec())
    repl_sh = NamedSharding(mesh, P())

    def shard_cols(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(col_sh, x, global_shape)

    def replicate(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(repl_sh, x, x.shape)

    scenes = jax.tree_util.tree_map(shard_cols, local_scenes)
    p0b = np.ndim(np.asarray(local_tables.p0_atm)) == 2
    tables = type(local_tables)(
        p0_atm=(shard_cols if p0b else replicate)(local_tables.p0_atm),
        p_atm=replicate(local_tables.p_atm),
        p0_aer=(shard_cols if p0b else replicate)(local_tables.p0_aer),
        p_aer=replicate(local_tables.p_aer))
    return scenes, tables


def solve_batch_multihost(local_scenes, local_tables, grid, opts,
                          engine: str = "reference",
                          outputs: str = "full", block_b: int = 16):
    """Multi-host batched solve: each process contributes its local
    columns; results come back as process-local shards (addressable
    shards of the global output arrays).

    The GSPMD reference engine runs one global jit with the convergence
    all-reduce spanning ICI+DCN; the Pallas engines run under shard_map
    with zero cross-device communication in the solve itself.
    """
    from sos_rt_tpu.parallel.mesh import solve_batch

    mesh = make_host_mesh()
    scenes, tables = process_local_batch(mesh, local_scenes, local_tables)
    flat = Mesh(np.asarray(jax.devices()).reshape(-1, 1), ("data", "model"),
                axis_types=(jax.sharding.AxisType.Auto,) * 2)
    # the flat ('data',) view of the same device order keeps host-major
    # column placement; solve_batch's 'data' axis == replica×data here
    sol = solve_batch(scenes, tables, grid, opts, mesh=flat,
                      engine=engine, block_b=block_b, outputs=outputs)
    return sol


def local_shard(x):
    """This process's addressable rows of a sharded output array."""
    shards = [s for s in x.addressable_shards]
    shards.sort(key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
