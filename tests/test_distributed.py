"""Two-process jax.distributed smoke test on localhost CPU.

Single-process tests cover the sharded renderer on a virtual 8-device mesh
(tests/test_parallel.py); this actually exercises the multi-*process*
code paths — coordinator bring-up (parallel/mesh.initialize_distributed),
cross-process collectives, and per-host addressable-shard framebuffer
assembly (SURVEY §5 distributed backend; the driver's dryrun covers
single-process only).
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_render():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = "/root/repo"
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd="/root/repo") for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    assert procs[0].returncode == 0, outs[0][-2000:]
    assert procs[1].returncode == 0, outs[1][-2000:]
    assert "DISTRIBUTED_OK" in outs[0], outs[0][-2000:]
