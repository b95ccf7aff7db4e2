"""Two-process multi-host smoke: the uneven-workload escape really
synchronizes two live JAX processes.

The reference's equivalent is the gloo ``cosyvoice_join`` monitored barrier
(cosyvoice/utils/train_utils.py:217-235), which also works CPU-only.  Here
two local processes form a real jax.distributed cluster over localhost;
host 0 has 3 batches and host 1 has 5, and ``joined_loader`` must stop BOTH
on step 3 (else the per-step psum would hang with one participant missing).
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
pid, port = int(sys.argv[1]), sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ["COSY_TPU_NO_CACHE"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
import numpy as np
from jax.experimental import multihost_utils
from cosy_tpu.utils.distributed import all_hosts_agree, joined_loader

# sanity: a real cross-process collective sees both hosts
pids = multihost_utils.process_allgather(np.asarray([pid], np.int32))
assert sorted(np.asarray(pids).ravel().tolist()) == [0, 1], pids

# uneven data: host 0 exhausts first
data = list(range(3 + 2 * pid))
steps = sum(1 for _ in joined_loader(data))
print(f"STEPS {steps}", flush=True)

assert all_hosts_agree(True) is True
assert all_hosts_agree(pid == 0) is False  # one dissenter fails everyone
print("AGREE OK", flush=True)
"""


def test_joined_loader_two_processes():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ, PYTHONPATH=REPO + ":" + os.environ.get("PYTHONPATH", ""))
    for v in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME", "XLA_FLAGS"):
        env.pop(v, None)
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, str(i), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env, cwd=REPO)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err[-2000:]}"
        # both hosts stop on the short host's step count
        assert "STEPS 3" in out, out
        assert "AGREE OK" in out, out
