"""Real multi-process `jax.distributed` coverage (VERDICT r1 item 7).

Launches a 2-process local CPU cluster (4 virtual devices per process,
8 global) and exercises `multihost.init`, `global_mesh`, `local_time_slice`
(contiguous and non-contiguous column layouts), `gather_frames`, and an
end-to-end sharded demod where each process stages only its own time slice
via `jax.make_array_from_process_local_data`.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.fixture(scope="module")
def cluster_output():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("PALLAS_AXON_POOL_IPS", None)   # no TPU plugin in workers
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, f"127.0.0.1:{port}", "2", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append((p.returncode, out))
    return outs


def test_workers_succeed(cluster_output):
    for rc, out in cluster_output:
        assert rc == 0, out


def test_frames_gathered_on_both(cluster_output):
    for rc, out in cluster_output:
        assert "GATHERED_FRAMES_OK" in out, out
        assert "LOCAL_SLICE_OK" in out, out
        assert "NONCONTIG_OK" in out, out
        assert "E2E_FRAMES_OK" in out, out
