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

pytestmark = pytest.mark.slow

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

# --- full FSDP train step across both processes -------------------------
from seed_story_tpu.models.agent import AgentConfig, ContinuousLVLM
from seed_story_tpu.train.stage2 import make_stage2_loss_fn
from seed_story_tpu.train.trainer import TrainConfig, Trainer
import flax.linen as nn

acfg = AgentConfig.tiny()
bs_local, seq, n_per = 4, 32, 2
rng = np.random.RandomState(pid)
nimg = bs_local * n_per
ids_cmp = np.zeros((bs_local, seq), bool); ids_gen = np.zeros((bs_local, seq), bool)
emb_cmp = np.zeros(nimg, bool); emb_gen = np.zeros(nimg, bool)
for b in range(bs_local):
    ids_cmp[b, 2:2+acfg.num_img_in_tokens] = True; emb_cmp[b*n_per] = True
    ids_gen[b, 16:16+acfg.num_img_out_tokens] = True; emb_gen[b*n_per+1] = True
local_batch = dict(
    input_ids=rng.randint(100, 31000, (bs_local, seq)).astype(np.int32),
    attention_mask=np.ones((bs_local, seq), np.int32),
    labels=rng.randint(100, 31000, (bs_local, seq)).astype(np.int32),
    image_embeds=rng.randn(nimg, acfg.num_vit_tokens, acfg.vit_dim).astype(np.float32),
    embeds_cmp_mask=emb_cmp, embeds_gen_mask=emb_gen,
    ids_cmp_mask=ids_cmp, ids_gen_mask=ids_gen,
)
agent = ContinuousLVLM(acfg)
abstract = jax.eval_shape(
    lambda: agent.init(jax.random.PRNGKey(0), **local_batch)
)["params"]
trainer = Trainer(
    mesh, abstract, make_stage2_loss_fn(agent),
    TrainConfig(learning_rate=1e-3, warmup_steps=1, training_steps=5,
                sharding_preset="fsdp"),
)
with mesh:
    params = jax.jit(
        lambda: nn.meta.unbox(
            agent.init(jax.random.PRNGKey(0), **local_batch)["params"]
        ),
        out_shardings=nn.meta.unbox(trainer.param_sharding),
    )()
    state = trainer.init_state(params)
    batch = trainer.shard_batch(local_batch)  # local shard -> global arrays
    state, metrics = trainer.step(state, batch, jax.random.PRNGKey(1))
    loss = float(np.asarray(metrics["loss"].addressable_shards[0].data))
assert np.isfinite(loss), loss
# replicated loss must agree across processes
losses = np.asarray(process_allgather(loss)).ravel()
np.testing.assert_allclose(losses, losses[0], rtol=1e-6)
print(f"proc {pid} train ok loss={loss:.4f}", flush=True)
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


_TRAIN_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
pid, n, port, repo, ckpt_dir, phase = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    sys.argv[5], sys.argv[6])
os.environ["COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["NUM_PROCESSES"] = str(n)
os.environ["PROCESS_ID"] = str(pid)
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, repo)
import numpy as np
import jax.numpy as jnp
import flax.linen as nn
from seed_story_tpu.models.agent import AgentConfig, ContinuousLVLM
from seed_story_tpu.parallel.collectives import initialize_multihost
from seed_story_tpu.parallel.mesh import make_mesh
from seed_story_tpu.train.checkpoint import CheckpointManager
from seed_story_tpu.train.stage2 import make_stage2_loss_fn
from seed_story_tpu.train.trainer import TrainConfig, Trainer

initialize_multihost()
mesh = make_mesh(data=8, model=1)
acfg = AgentConfig.tiny()
bs_local, seq, n_per = 4, 32, 2
nimg = bs_local * n_per


def batch_for(step):
    # deterministic per (host, step): both cluster launches regenerate the
    # exact same global batch sequence — the resume run must therefore
    # reproduce the control run's loss trace bit-for-bit-close
    rng = np.random.RandomState(1000 * pid + step)
    ids_cmp = np.zeros((bs_local, seq), bool)
    ids_gen = np.zeros((bs_local, seq), bool)
    emb_cmp = np.zeros(nimg, bool)
    emb_gen = np.zeros(nimg, bool)
    for b in range(bs_local):
        ids_cmp[b, 2:2 + acfg.num_img_in_tokens] = True
        emb_cmp[b * n_per] = True
        ids_gen[b, 16:16 + acfg.num_img_out_tokens] = True
        emb_gen[b * n_per + 1] = True
    return dict(
        input_ids=rng.randint(100, 31000, (bs_local, seq)).astype(np.int32),
        attention_mask=np.ones((bs_local, seq), np.int32),
        labels=rng.randint(100, 31000, (bs_local, seq)).astype(np.int32),
        image_embeds=rng.randn(nimg, acfg.num_vit_tokens,
                               acfg.vit_dim).astype(np.float32),
        embeds_cmp_mask=emb_cmp, embeds_gen_mask=emb_gen,
        ids_cmp_mask=ids_cmp, ids_gen_mask=ids_gen,
    )


agent = ContinuousLVLM(acfg)
abstract = jax.eval_shape(lambda: agent.init(
    jax.random.PRNGKey(0), **batch_for(0)))["params"]
trainer = Trainer(
    mesh, abstract, make_stage2_loss_fn(agent),
    TrainConfig(learning_rate=1e-3, warmup_steps=1, training_steps=5,
                sharding_preset="fsdp"),
)
mgr = CheckpointManager(ckpt_dir, max_to_keep=2)


def run_step(state, step):
    batch = trainer.shard_batch(batch_for(step))
    state, metrics = trainer.step(state, batch, jax.random.PRNGKey(100 + step))
    return state, float(np.asarray(metrics["loss"].addressable_shards[0].data))


with mesh:
    params = jax.jit(
        lambda: nn.meta.unbox(
            agent.init(jax.random.PRNGKey(0), **batch_for(0))["params"]
        ),
        out_shardings=nn.meta.unbox(trainer.param_sharding),
    )()
    state = trainer.init_state(params)
    if phase == "save":
        # control run: step 1, checkpoint (sharded, all processes), then
        # keep going so steps 2-3 give the control loss trace
        state, l1 = run_step(state, 1)
        mgr.save(1, state, data_state={"next_step": 2})
        mgr.wait()
        losses = []
        for s in (2, 3):
            state, l = run_step(state, s)
            losses.append(l)
        if pid == 0:
            with open(os.path.join(ckpt_dir, "control.json"), "w") as f:
                json.dump({"l1": l1, "losses": losses}, f)
    else:
        state, data_state = mgr.restore(state)
        assert int(state.step) == 1, int(state.step)
        assert data_state == {"next_step": 2}, data_state
        losses = []
        for s in (2, 3):
            state, l = run_step(state, s)
            losses.append(l)
        control = json.load(open(os.path.join(ckpt_dir, "control.json")))
        np.testing.assert_allclose(losses, control["losses"], rtol=1e-6)
    mgr.close()
print(f"proc {pid} {phase} ok", flush=True)
"""


def _launch_cluster(worker, port, repo, extra):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "COORDINATOR_ADDRESS")}
    return [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port), repo] + extra,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]


def _join_cluster(procs, phase):
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"multi-process {phase} timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} {phase} failed:\n{out[-2000:]}"
        assert f"proc {i} {phase} ok" in out


def test_two_process_train_checkpoint_resume(tmp_path):
    """The whole multi-host training story end to end (VERDICT r3 #5): a
    REAL 2-process jax.distributed cluster runs sharded FSDP train steps,
    writes a sharded Orbax checkpoint from both processes, the cluster is
    torn down, a NEW cluster restores it and continues — and the resumed
    loss trace matches the uninterrupted control run exactly.

    Reference equivalent: accelerate/DeepSpeed save_state + relaunch
    (train_clm_sft.py:142-167,256-272)."""
    worker = tmp_path / "train_worker.py"
    worker.write_text(_TRAIN_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port_a = s.getsockname()[1]
    procs = _launch_cluster(worker, port_a, repo, [str(ckpt), "save"])
    _join_cluster(procs, "save")
    assert (ckpt / "control.json").exists()

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port_b = s.getsockname()[1]
    procs = _launch_cluster(worker, port_b, repo, [str(ckpt), "resume"])
    _join_cluster(procs, "resume")
