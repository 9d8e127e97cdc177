"""Multi-process jax.distributed smoke test (2 simulated hosts on CPU).

Launches two worker processes that initialize the distributed runtime, shard
one fleet over the global mesh, run a sharded planning step, and verify the
psum fleet aggregate equals the global fleet size on BOTH processes.
"""

import os
import pathlib
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        return sock.getsockname()[1]


# subprocess-level guard: proc.communicate(timeout=240) below (pytest-timeout
# is not installed here, so a mark would be inert)
def test_two_process_distributed_fleet(repo_root):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{repo_root}:{env.get('PYTHONPATH', '')}"
    # one CPU device per simulated host
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

    worker = str(repo_root / "scripts" / "distributed_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "--process-id", str(pid),
             "--num-processes", "2", "--coordinator", f"localhost:{port}"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outputs = []
    try:
        for proc in procs:
            out, _ = proc.communicate(timeout=240)
            outputs.append(out)
    except subprocess.TimeoutExpired:
        for proc in procs:
            proc.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outputs))

    for proc, out in zip(procs, outputs):
        assert proc.returncode == 0, f"worker failed:\n{out[-3000:]}"
        assert "DISTRIBUTED OK" in out
