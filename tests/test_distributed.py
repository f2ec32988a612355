"""Real multi-process jax.distributed test (2 CPU processes, 8 devices).

The virtual-mesh tests (test_parallel.py) prove the shard_map math; this
one proves the *process boundary*: jax.distributed.initialize, cross-process
device visibility, global-mesh shard_map execution, and addressable-shard
output correctness — the executable stand-in for multi-host scaling claims
(BASELINE.md; no pod in this environment).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_render():
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"worker {i} rc={p.returncode}\n--- output ---\n{outs[i]}"
        )
    assert "shards OK" in outs[0] and "shards OK" in outs[1]
