"""Multi-process (simulated multi-host) distributed training test.

Launches two real processes, each with 4 virtual CPU devices, joined via
``jax.distributed.initialize`` into one (data=4, model=2) mesh; the DP
gradient all-reduce crosses the process boundary.  Both processes must
report the identical loss.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.integration
def test_two_process_training_agrees():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env) for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, (out[-500:], err[-1500:])
        outs.append(out)
    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                _, pid, loss = line.split()
                losses[int(pid)] = float(loss)
    assert set(losses) == {0, 1}, outs
    assert losses[0] == losses[1]
