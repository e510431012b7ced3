"""Real two-process multi-host path on CPU (SURVEY.md §4(d), VERDICT r2 #8).

Launches two OS processes that form a JAX distributed runtime
(coordinator + worker, 4 virtual CPU devices each → a (2, 4) host mesh),
solve a globally-sharded column batch through
``solve_batch_multihost``, and write their local result shards; the
parent asserts the concatenated shards equal a single-process solve of
the same batch.  This exercises the actual ``jax.distributed``
code path — process-spanning mesh, cross-host sharded inputs via
``make_array_from_process_local_data``, and the GSPMD convergence
all-reduce across the process boundary (DCN analogue).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, json
import numpy as np

cfg = json.loads(sys.argv[1])
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=%d" % cfg["ndev"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from sos_rt_tpu.parallel.distributed import (
    init_distributed, local_shard, solve_batch_multihost)
assert init_distributed(coordinator_address=cfg["coord"],
                        num_processes=cfg["nproc"], process_id=cfg["pid"])
assert jax.process_count() == cfg["nproc"], jax.process_count()
assert len(jax.devices()) == cfg["nproc"] * cfg["ndev"], len(jax.devices())

import dataclasses
from sos_rt_tpu.config import GridSpec, SolverOptions
from sos_rt_tpu.presets import PRESETS
from sos_rt_tpu.sweep import build_sweep_batch

preset = dataclasses.replace(
    PRESETS["fwc_sweep"], grid=GridSpec(nb_angles=32, nb_layers=48),
    opts=SolverOptions(surface="lambertian", dtype="float64", max_orders=40))
B = 16
scenes, tables = build_sweep_batch(preset, B, seed=7, mu0_pool=2)
per = B // cfg["nproc"]
lo, hi = cfg["pid"] * per, (cfg["pid"] + 1) * per
take = lambda x: np.asarray(x)[lo:hi]
local_scenes = jax.tree_util.tree_map(take, scenes)
local_tables = dataclasses.replace(
    tables, p0_atm=take(tables.p0_atm), p0_aer=take(tables.p0_aer))

sol = solve_batch_multihost(local_scenes, local_tables, preset.grid,
                            preset.opts, engine=cfg["engine"],
                            outputs=cfg["outputs"])
if hasattr(sol, "i_toa"):          # summary path (mega engine)
    np.savez(cfg["out"],
             n_orders=local_shard(sol.n_orders),
             i_toa=local_shard(sol.i_toa),
             i_surface=local_shard(sol.i_surface))
else:
    np.savez(cfg["out"],
             n_orders=local_shard(sol.n_orders),
             i_toa=local_shard(sol.i_total)[:, 0, :],
             i_surface=local_shard(sol.i_total)[:, -1, :])
print("WORKER_OK", cfg["pid"])
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(tmp_path, nproc, engine, outputs):
    ndev = 8 // nproc
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS",)}
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    outs = []
    for pid in range(nproc):
        out = str(tmp_path / f"shard{pid}.npz")
        outs.append(out)
        cfg = json.dumps({"coord": f"localhost:{port}", "pid": pid,
                          "out": out, "nproc": nproc, "ndev": ndev,
                          "engine": engine, "outputs": outputs})
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER, cfg], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for pid, (p, stdout) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{stdout}"
        assert f"WORKER_OK {pid}" in stdout
    got_orders, got_toa, got_srf = [], [], []
    for out in outs:
        with np.load(out) as z:
            got_orders.append(z["n_orders"])
            got_toa.append(z["i_toa"])
            got_srf.append(z["i_surface"])
    return (np.concatenate(got_orders), np.concatenate(got_toa),
            np.concatenate(got_srf))


def _single_process_truth():
    import dataclasses

    from sos_rt_tpu.config import GridSpec, SolverOptions
    from sos_rt_tpu.parallel import solve_batch
    from sos_rt_tpu.presets import PRESETS
    from sos_rt_tpu.sweep import build_sweep_batch

    preset = dataclasses.replace(
        PRESETS["fwc_sweep"], grid=GridSpec(nb_angles=32, nb_layers=48),
        opts=SolverOptions(surface="lambertian", dtype="float64",
                           max_orders=40))
    scenes, tables = build_sweep_batch(preset, 16, seed=7, mu0_pool=2)
    return solve_batch(scenes, tables, preset.grid, preset.opts)


@pytest.mark.slow
@pytest.mark.parametrize("nproc,engine,outputs", [
    (2, "reference", "full"),
    (2, "mega", "summary"),      # Pallas engine across a real process
    (4, "mega", "summary"),      # boundary (VERDICT r4 item 4); the
                                 # shard_mapped kernel runs interpret-
                                 # mode per device, 2-proc and 4-proc
                                 # host meshes
], ids=["2proc-reference", "2proc-mega", "4proc-mega"])
def test_multi_process_sharded_solve(tmp_path, nproc, engine, outputs):
    got_orders, got_toa, got_srf = _run_workers(tmp_path, nproc, engine,
                                                outputs)
    ref = _single_process_truth()
    np.testing.assert_array_equal(got_orders, np.asarray(ref.n_orders))
    # multi-process XLA compiles with different fusion choices → last-ulp
    # f64 differences (measured ≤ 3e-16 abs); values are O(1e-4..1)
    np.testing.assert_allclose(got_toa, np.asarray(ref.i_total[:, 0, :]),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(got_srf, np.asarray(ref.i_total[:, -1, :]),
                               rtol=1e-10, atol=1e-12)
