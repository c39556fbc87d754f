"""Probe: large agent TRAIN step on the real chip (the round-1 crash zone).

Round-1 known issue: agent training grads above ~1B params crashed the TPU
worker ("kernel fault") with the 32-way unrolled layer graph. This probe
re-tests at configurable scale with --scan (lax.scan over decoder layers =
one compiled layer body, ~L-fold smaller HLO) vs the unrolled graph.

Usage: python benchmarks/probe_large_train.py --h 2048 --l 24 --scan
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

p = argparse.ArgumentParser()
p.add_argument("--h", type=int, default=2048)
p.add_argument("--l", type=int, default=24)
p.add_argument("--heads", type=int, default=16)
p.add_argument("--inter", type=int, default=0, help="0 -> 2.6875*h rounded to 256")
p.add_argument("--b", type=int, default=4)
p.add_argument("--s", type=int, default=1280)
p.add_argument("--scan", action="store_true")
p.add_argument("--ce-chunk", type=int, default=0)
p.add_argument("--int8", action="store_true",
               help="QLoRA-style: frozen base projections stored int8")
p.add_argument("--steps", type=int, default=5)
p.add_argument("--parts", action="store_true",
               help="also time fwd-only and fwd+bwd (no optimizer) to "
                    "locate the MFU gap")
args = p.parse_args()

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import flax.linen as nn

from seed_story_tpu.models.agent import AgentConfig, ContinuousLVLM
from seed_story_tpu.models.llama import LlamaConfig, lora_trainable_mask
from seed_story_tpu.parallel.mesh import make_mesh
from seed_story_tpu.train.stage2 import make_stage2_loss_fn
from seed_story_tpu.train.trainer import TrainConfig, Trainer

H, L, heads, B, S, NI = args.h, args.l, args.heads, args.b, args.s, 4
inter = args.inter or (int(H * 2.6875) // 256) * 256
print(f"config: H={H} L={L} heads={heads} inter={inter} B={B} S={S} "
      f"scan_layers={args.scan} ce_chunk={args.ce_chunk} int8={args.int8}", flush=True)

llm = LlamaConfig(
    hidden_size=H, intermediate_size=inter, num_hidden_layers=L,
    num_attention_heads=heads, lora_rank=16, remat=True,
    scan_layers=args.scan, ce_chunk_size=args.ce_chunk,
    quantize_base=args.int8, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
)
acfg = AgentConfig(llm=llm, resampler_heads=heads, vit_dim=H)
agent = ContinuousLVLM(acfg)

rng = np.random.RandomState(0)
ids_cmp = np.zeros((B, S), bool)
ids_gen = np.zeros((B, S), bool)
emb_cmp = np.zeros(B * NI, bool)
emb_gen = np.zeros(B * NI, bool)
for b in range(B):
    ids_cmp[b, 4:68] = True
    emb_cmp[b * NI] = True
    ids_gen[b, 200:264] = True
    emb_gen[b * NI + 1] = True
batch = dict(
    input_ids=jnp.asarray(rng.randint(10, 31000, (B, S)), jnp.int32),
    attention_mask=jnp.ones((B, S), jnp.int32),
    labels=jnp.asarray(rng.randint(10, 31000, (B, S)), jnp.int32),
    image_embeds=jnp.asarray(
        rng.randn(B * NI, 256, acfg.vit_dim).astype(np.float32), jnp.bfloat16
    ),
    embeds_cmp_mask=jnp.asarray(emb_cmp), embeds_gen_mask=jnp.asarray(emb_gen),
    ids_cmp_mask=jnp.asarray(ids_cmp), ids_gen_mask=jnp.asarray(ids_gen),
)

mesh = make_mesh()
abstract = jax.eval_shape(lambda: agent.init(jax.random.PRNGKey(0), **batch))["params"]
mask = lora_trainable_mask(nn.meta.unbox(abstract))
for k2 in ("input_resampler", "output_resampler"):
    mask[k2] = jax.tree_util.tree_map(lambda _: True, mask[k2])
trainer = Trainer(
    mesh, abstract, make_stage2_loss_fn(agent),
    TrainConfig(sharding_preset="dp"), trainable_mask=mask,
)
with mesh:
    t0 = time.time()
    def init_params():
        p = nn.meta.unbox(agent.init(jax.random.PRNGKey(0), **batch)["params"])
        if args.int8:
            # int8 kernels init to zeros; randomize so the probe's compute
            # is non-degenerate (values don't matter for a speed probe)
            def rnd(path, x):
                if x.dtype == jnp.int8:
                    key = jax.random.PRNGKey(hash(str(path)) % (2**31))
                    return jax.random.randint(key, x.shape, -127, 128, jnp.int32).astype(jnp.int8)
                if str(path[-1].key) == "kernel_scale" if hasattr(path[-1], "key") else False:
                    return jnp.full_like(x, 1e-2)
                return x
            p = jax.tree_util.tree_map_with_path(rnd, p)
        return p
    params = jax.jit(init_params)()
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"{n/1e9:.2f}B params; init {time.time()-t0:.0f}s", flush=True)
    state = trainer.init_state(params)
    t0 = time.time()
    state, m = trainer.step(state, batch, jax.random.PRNGKey(1))
    print(f"compile+first step {time.time()-t0:.0f}s loss {float(m['loss']):.3f}",
          flush=True)
    best = 1e9
    for _ in range(args.steps):
        t0 = time.perf_counter()
        state, m = trainer.step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(m["loss"])
        best = min(best, time.perf_counter() - t0)
    toks = B * S
    print(
        f"train step ({n/1e9:.2f}B, B={B}, S={S}, scan={args.scan}): "
        f"{best*1e3:.0f} ms -> {toks/best:.0f} tokens/s; "
        f"~{6*n*toks/best/1e12:.1f} TF/s model flops", flush=True,
    )

    if args.parts:
        # locate the gap: fwd-only, fwd+bwd (no opt), and the delta to the
        # full step (= optimizer + masked-update plumbing)
        loss_fn = make_stage2_loss_fn(agent)

        t_leaves = trainer._trainable_leaves(state.params)

        # params passed as ARGUMENTS (closing over state.params would bake
        # the 6.5GB frozen base into the jaxpr as captured constants —
        # hour-long lowering + 45GB host RSS)
        def fwd_only(params_full, tl, batch):
            l, _ = loss_fn(trainer._with_trainable(params_full, tl), batch,
                           jax.random.PRNGKey(1))
            return l

        def fwd_bwd(params_full, tl, batch):
            (l, _), g = jax.value_and_grad(
                lambda t: loss_fn(
                    trainer._with_trainable(params_full, t), batch,
                    jax.random.PRNGKey(1)), has_aux=True)(tl)
            return l, g

        for name, fn0 in (("fwd-only", jax.jit(fwd_only)),
                          ("fwd+bwd ", jax.jit(fwd_bwd))):
            fn = lambda tl, batch: fn0(state.params, tl, batch)  # noqa: E731
            out = fn(t_leaves, batch)
            jax.block_until_ready(out)
            bt = 1e9
            for _ in range(args.steps):
                t0 = time.perf_counter()
                out = fn(t_leaves, batch)
                jax.block_until_ready(out)
                bt = min(bt, time.perf_counter() - t0)
            units = 2 if name.startswith("fwd-only") else 6
            print(f"{name}: {bt*1e3:.0f} ms  "
                  f"({units*n*toks/bt/1e12:.1f} TF/s at {units}P)", flush=True)
