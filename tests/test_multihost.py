"""Two-process "multi-host" test: dist_gba across a jax.distributed
cluster of 2 local processes x 4 virtual CPU devices (SURVEY.md §2.9,
§4 — test multi-node without a cluster).

The psum over the mesh's 'edge' axis spans both processes, exercising
the cross-process collective path that a real multi-host deployment
rides over DCN. Each worker also computes the single-process result and
asserts agreement; this test only orchestrates and checks exit status.
"""

import os
import socket
import subprocess
import sys
import tempfile

def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dist_gba():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    with tempfile.TemporaryDirectory() as td:
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # workers set their own device count
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(pid), str(port), td],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for pid in (0, 1)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=850)
            outs.append(out.decode(errors="replace"))
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
            assert os.path.exists(os.path.join(td, f"ok_{pid}")), out[-3000:]
