"""2-process DCN rehearsal: ``jax.distributed.initialize`` across a REAL
process boundary (round-2 VERDICT item 6).

The virtual 8-device CPU mesh used everywhere else runs one controller;
this test launches two worker processes that meet at a gRPC coordinator on
localhost, build the global ``('host', 'chain')`` mesh, and run pooled
window adaptation whose cross-chain statistics reduce ACROSS the process
boundary.  Both workers must agree bitwise on the pooled step size and the
global position sum.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_init():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "dcn_worker.py")
    env = dict(os.environ)
    # real TPU plugin must not register in the workers; 2 CPU devices each
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(worker))),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    lines = [
        next(l for l in out.splitlines() if l.startswith("DCN_OK"))
        for out in outs
    ]
    # both controllers computed the same pooled step size and global sum
    assert lines[0] == lines[1], lines
    _, eps, total = lines[0].split()
    assert float(eps) > 0.0
