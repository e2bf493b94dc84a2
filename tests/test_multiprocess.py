"""2-process `jax.distributed` CPU test (VERDICT r3 weak #9).

Spawns two real processes with a local coordinator and runs one
mesh-spanning RD train step in each (tests/dist_worker.py) — the code path
`multihost.initialize` + `host_local_to_global` + cross-process gradient
psum that the single-process dryrun cannot reach. Replaces the reference's
single-process DataParallel story (`networks.py:99-106`).
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_rd_step():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    # Repo only: the environment's PYTHONPATH may carry a sitecustomize that
    # registers a remote TPU platform at interpreter start — the workers
    # must stay CPU-only (the worker also forces jax_platforms=cpu).
    env["PYTHONPATH"] = REPO
    worker = os.path.join(REPO, "tests", "dist_worker.py")
    procs = [
        subprocess.Popen([sys.executable, worker, str(i), "2", str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    sums = [next(l for l in out.splitlines() if l.startswith("CHECKSUM"))
            for out in outs]
    # Replicated metrics: both processes must compute the identical loss.
    assert sums[0] == sums[1], sums
