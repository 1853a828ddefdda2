"""Two-process jax.distributed integration test (multi-host path).

Exercises ``parallel/distributed.py`` for real: two coordinator-connected
CPU processes (2 virtual devices each -> a 4-device global mesh) each
feed their process-local batch slice through ``assemble_global_batch``
and run one alternating train step. The replicated post-update params
must agree bit-for-bit across processes — the SPMD equivalent of the
reference's ``MultiprocessParallelUpdater`` all-reduce
(``schaaaafrichter/train.py:189-191``).
"""

import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["LOANS_PLATFORM"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=ROOT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=1500)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert lines, f"no RESULT line:\n{out}\n{err}"
        outs.append(lines[0].split())
    # loss and updated replicated params must agree across processes
    assert outs[0][2] == outs[1][2], (outs[0], outs[1])
    assert outs[0][3:] == outs[1][3:]
