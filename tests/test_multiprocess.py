"""TRUE multi-process validation of the distributed backend (PARITY §5.8).

Spawns two fresh Python processes that form a jax.distributed cluster over
localhost (each with 4 virtual CPU devices -> one 8-device global mesh,
mirroring two hosts of a v5e pod slice) and drives the repo's own
primitives across it: initialize_multihost, process_allgather,
mean_metrics, and a pjit reduction over a global mesh built by make_mesh.
This is the path the reference reaches via torch.distributed/DeepSpeed
launchers (SURVEY §2.5); here the coordinator handshake is JAX's.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
port = sys.argv[3]
pid, n = int(sys.argv[1]), int(sys.argv[2])
# the launcher contract initialize_multihost consumes
os.environ["COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["NUM_PROCESSES"] = str(n)
os.environ["PROCESS_ID"] = str(pid)
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, sys.argv[4])
import numpy as np
import jax.numpy as jnp
from seed_story_tpu.parallel.collectives import (
    initialize_multihost, mean_metrics, process_allgather)
idx, cnt = initialize_multihost()  # forms the cluster from env vars
assert (idx, cnt) == (pid, n), (idx, cnt)
idx2, cnt2 = initialize_multihost()  # second call -> no-op
assert (idx2, cnt2) == (pid, n)
assert jax.device_count() == 8 and jax.local_device_count() == 4

g = process_allgather(jnp.float32(pid + 1))
np.testing.assert_allclose(np.asarray(g).ravel(), [1.0, 2.0])
m = mean_metrics({"loss": float(pid), "acc": 1.0})
assert abs(m["loss"] - 0.5) < 1e-6 and m["acc"] == 1.0, m

from jax.experimental import multihost_utils
from jax.sharding import NamedSharding, PartitionSpec as P
from seed_story_tpu.parallel.mesh import make_mesh
mesh = make_mesh(data=8, model=1)
local = jnp.arange(4.0) + 4.0 * pid  # global arange(8) split across hosts
arr = multihost_utils.host_local_array_to_global_array(local, mesh, P("data"))
s = jax.jit(
    lambda a: a.sum(),
    in_shardings=NamedSharding(mesh, P("data")),
    out_shardings=NamedSharding(mesh, P()),
)(arr)
val = float(np.asarray(s.addressable_shards[0].data))
assert val == 28.0, val  # sum(range(8))
print(f"proc {pid} ok", flush=True)
"""


def test_two_process_cluster_collectives(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "COORDINATOR_ADDRESS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port), repo],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process cluster timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} ok" in out
