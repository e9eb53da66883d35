"""Multi-host bootstrap: 2-process jax.distributed on localhost CPU.

The 1000-epoch pod-scale story rides parallel/distributed.py (SURVEY §5
"distributed backend"); this actually runs the coordinator handshake in
two processes, checks global device visibility, and does a cross-process
allgather (the DCN-analog collective path).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys

import jax

# this image's sitecustomize forces the TPU plugin; re-assert CPU before
# any backend initialization (same dance as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

from lightcurver_tpu.parallel.distributed import initialize_distributed

port, pid = sys.argv[1], int(sys.argv[2])
initialize_distributed(coordinator_address=f"localhost:{port}",
                       num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid, (jax.process_index(), pid)
assert jax.device_count() == 2 * jax.local_device_count(), (
    jax.device_count(), jax.local_device_count())

# a real cross-process collective: allgather of each process's id
import numpy as np
from jax.experimental import multihost_utils

gathered = multihost_utils.process_allgather(np.array([pid]))
assert sorted(np.asarray(gathered).ravel().tolist()) == [0, 1], gathered
print(f"WORKER_OK {pid} devices={jax.device_count()}")
"""


@pytest.mark.slow
def test_two_process_distributed_cpu(tmp_path):
    sock = socket.socket()
    sock.bind(("localhost", 0))
    port = sock.getsockname()[1]
    sock.close()

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=str(tmp_path))
        for pid in (0, 1)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"WORKER_OK {pid} devices=4" in out, out


def test_initialize_distributed_env_parsing(monkeypatch):
    """Explicit args (including a falsy process_id=0) must beat the env."""
    import lightcurver_tpu.parallel.distributed as dist

    captured = {}

    class FakeDistributed:
        @staticmethod
        def initialize(**kwargs):
            captured.update(kwargs)

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "envhost:1")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "7")
    monkeypatch.setenv("JAX_PROCESS_ID", "3")
    import jax

    monkeypatch.setattr(jax, "distributed", FakeDistributed)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "device_count", lambda: 2)

    dist.initialize_distributed(coordinator_address="localhost:9",
                                num_processes=2, process_id=0)
    assert captured == {"coordinator_address": "localhost:9",
                        "num_processes": 2, "process_id": 0}

    captured.clear()
    dist.initialize_distributed()
    assert captured == {"coordinator_address": "envhost:1",
                        "num_processes": 7, "process_id": 3}


def test_initialize_distributed_rejects_partial_explicit_args(monkeypatch):
    """Explicit topology without a coordinator must raise, not be
    silently dropped into auto-detection."""
    from lightcurver_tpu.parallel.distributed import initialize_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    with pytest.raises(ValueError, match="coordinator"):
        initialize_distributed(num_processes=2, process_id=1)


def test_initialize_distributed_rejects_partial_env_topology(monkeypatch):
    """Topology from JAX_NUM_PROCESSES/JAX_PROCESS_ID env vars without a
    coordinator address is just as silently wrong as explicit args."""
    from lightcurver_tpu.parallel.distributed import initialize_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    with pytest.raises(ValueError, match="coordinator"):
        initialize_distributed()
