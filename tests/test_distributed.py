"""Real multi-process `jax.distributed.initialize` coverage.

Spawns two CPU-backend subprocesses that join one coordination service
through parallel.distributed.initialize (the branch the single-process
no-op test never enters), then run a cross-process collective
(process_allgather) to prove the cluster actually formed.
"""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")  # axon sitecustomize-proof
from mvtrim_tpu.parallel import distributed

ok = distributed.initialize()
import numpy as np
from jax.experimental import multihost_utils

gathered = multihost_utils.process_allgather(
    np.array([jax.process_index() + 1], np.int32))
print(json.dumps({
    "multi": bool(ok),
    "process_count": jax.process_count(),
    "process_index": jax.process_index(),
    "device_count": jax.device_count(),
    "gathered": np.asarray(gathered).ravel().tolist(),
}))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_initialize_and_collective():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        # one local CPU device per process; scrub pod-detection and the
        # parent suite's virtual-device knobs
        env.pop("TPU_WORKER_HOSTNAMES", None)
        env.pop("JAX_NUM_CPU_DEVICES", None)
        env["XLA_FLAGS"] = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    results = []
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, err[-2000:]
        results.append(json.loads(out.strip().splitlines()[-1]))

    assert [r["process_index"] for r in results] == [0, 1]
    for r in results:
        assert r["multi"] is True
        assert r["process_count"] == 2
        assert r["device_count"] == 2
        # the collective saw both processes' contributions
        assert sorted(r["gathered"]) == [1, 2]
