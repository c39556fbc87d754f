"""ViT-bigG forward (frozen encoder) + stage-2 train-step throughput, one chip."""
import sys; sys.path.insert(0, "/root/repo")
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import flax.linen as nn

# --- ViT-bigG (full 48-layer, bf16 params) 448px forward ---
from seed_story_tpu.models.vit import ViTConfig, VisionTransformerWithAttnPool
vcfg = ViTConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
vit = VisionTransformerWithAttnPool(vcfg)
px = jnp.zeros((8, 3, 448, 448), jnp.float32)
t0=time.time()
vp = nn.meta.unbox(jax.jit(lambda: vit.init(jax.random.PRNGKey(0), px[:1])["params"])())
jax.block_until_ready(vp); print("vit init:", round(time.time()-t0,1), "s", flush=True)
f = jax.jit(lambda p, x: vit.apply({"params": p}, x).sum())
r = float(f(vp, px))
best=1e9
for _ in range(3):
    t0=time.perf_counter(); r=float(f(vp, px)); best=min(best,time.perf_counter()-t0)
print(f"ViT-bigG fwd: {best*1e3:.0f} ms / 8 images -> {8/best:.1f} images/s/chip", flush=True)

# --- stage-2-style train step: 2B-ish agent (bf16 params for memory) ---
from seed_story_tpu.models.agent import AgentConfig, ContinuousLVLM
from seed_story_tpu.models.llama import LlamaConfig, lora_trainable_mask
from seed_story_tpu.train.trainer import TrainConfig, Trainer
from seed_story_tpu.train.stage2 import make_stage2_loss_fn
from seed_story_tpu.parallel.mesh import make_mesh

llm = LlamaConfig(hidden_size=2560, intermediate_size=6912, num_hidden_layers=12,
                  num_attention_heads=20, lora_rank=16, remat=True,
                  dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
acfg = AgentConfig(llm=llm, resampler_heads=20, vit_dim=2560)
agent = ContinuousLVLM(acfg)
B, S, NI = 2, 1280, 4
rng = np.random.RandomState(0)
ids_cmp = np.zeros((B,S),bool); ids_gen = np.zeros((B,S),bool)
emb_cmp = np.zeros(B*NI,bool); emb_gen = np.zeros(B*NI,bool)
for b in range(B):
    ids_cmp[b, 4:4+64] = True; emb_cmp[b*NI] = True
    ids_gen[b, 200:264] = True; emb_gen[b*NI+1] = True
batch = dict(
    input_ids=jnp.asarray(rng.randint(10, 31000, (B,S)), jnp.int32),
    attention_mask=jnp.ones((B,S), jnp.int32),
    labels=jnp.asarray(rng.randint(10, 31000, (B,S)), jnp.int32),
    image_embeds=jnp.asarray(rng.randn(B*NI, 256, acfg.vit_dim), jnp.float32),
    embeds_cmp_mask=jnp.asarray(emb_cmp), embeds_gen_mask=jnp.asarray(emb_gen),
    ids_cmp_mask=jnp.asarray(ids_cmp), ids_gen_mask=jnp.asarray(ids_gen))
mesh = make_mesh()
abstract = jax.eval_shape(lambda: agent.init(jax.random.PRNGKey(0), **batch))["params"]
loss_fn = make_stage2_loss_fn(agent)
tcfg = TrainConfig(learning_rate=1e-4, warmup_steps=10, training_steps=100, sharding_preset="dp")
mask = lora_trainable_mask(nn.meta.unbox(abstract))
for k2 in ("input_resampler","output_resampler"):
    mask[k2] = jax.tree_util.tree_map(lambda _: True, mask[k2])
trainer = Trainer(mesh, abstract, loss_fn, tcfg, trainable_mask=mask)
with mesh:
    t0=time.time()
    params = nn.meta.unbox(jax.jit(lambda: agent.init(jax.random.PRNGKey(0), **batch)["params"])())
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"agent params: {n/1e9:.2f}B; init {round(time.time()-t0,1)}s", flush=True)
    state = trainer.init_state(params)
    t0=time.time()
    state, m = trainer.step(state, batch, jax.random.PRNGKey(1))
    print("train step compile+run:", round(time.time()-t0,1), "s  loss", float(m["loss"]), flush=True)
    best=1e9
    for _ in range(5):
        t0=time.perf_counter(); state, m = trainer.step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(m["loss"]); best=min(best,time.perf_counter()-t0)
    toks = B*S
    model_tf = 6*n*toks/best/1e12
    print(f"train step: {best*1e3:.0f} ms -> {toks/best:.0f} tokens/s "
          f"(~{model_tf:.0f} TF/s model flops, LoRA-frozen base)", flush=True)
