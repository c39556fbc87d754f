import sys, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import flax.linen as nn
from seed_story_tpu.models.agent import AgentConfig, ContinuousLVLM
from seed_story_tpu.models.llama import LlamaConfig, lora_trainable_mask
from seed_story_tpu.train.trainer import TrainConfig, Trainer
from seed_story_tpu.train.stage2 import make_stage2_loss_fn
from seed_story_tpu.parallel.mesh import make_mesh

rng = np.random.RandomState(0)
L,H,heads,B,S,NI = 8,1024,8,4,1280,4
llm = LlamaConfig(hidden_size=H, intermediate_size=2816, num_hidden_layers=L,
                  num_attention_heads=heads, lora_rank=16, remat=True,
                  dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
acfg = AgentConfig(llm=llm, resampler_heads=heads, vit_dim=H)
agent = ContinuousLVLM(acfg)
ids_cmp = np.zeros((B,S),bool); ids_gen = np.zeros((B,S),bool)
emb_cmp = np.zeros(B*NI,bool); emb_gen = np.zeros(B*NI,bool)
for b in range(B):
    ids_cmp[b,4:68]=True; emb_cmp[b*NI]=True
    ids_gen[b,200:264]=True; emb_gen[b*NI+1]=True
batch = dict(
    input_ids=jnp.asarray(rng.randint(10,31000,(B,S)),jnp.int32),
    attention_mask=jnp.ones((B,S),jnp.int32),
    labels=jnp.asarray(rng.randint(10,31000,(B,S)),jnp.int32),
    image_embeds=jnp.asarray(rng.randn(B*NI,256,acfg.vit_dim),jnp.float32),
    embeds_cmp_mask=jnp.asarray(emb_cmp), embeds_gen_mask=jnp.asarray(emb_gen),
    ids_cmp_mask=jnp.asarray(ids_cmp), ids_gen_mask=jnp.asarray(ids_gen))
mesh = make_mesh()
abstract = jax.eval_shape(lambda: agent.init(jax.random.PRNGKey(0), **batch))["params"]
mask = lora_trainable_mask(nn.meta.unbox(abstract))
for k2 in ("input_resampler","output_resampler"):
    mask[k2] = jax.tree_util.tree_map(lambda _: True, mask[k2])
trainer = Trainer(mesh, abstract, make_stage2_loss_fn(agent),
                  TrainConfig(sharding_preset="dp"), trainable_mask=mask)
with mesh:
    params = nn.meta.unbox(jax.jit(lambda: agent.init(jax.random.PRNGKey(0), **batch)["params"])())
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    state = trainer.init_state(params)
    t0=time.time()
    state, m = trainer.step(state, batch, jax.random.PRNGKey(1))
    print(f"{n/1e9:.2f}B agent; compile+run {time.time()-t0:.0f}s loss {float(m['loss']):.3f}", flush=True)
    best=1e9
    for _ in range(5):
        t0=time.perf_counter(); state, m = trainer.step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(m["loss"]); best=min(best,time.perf_counter()-t0)
    toks=B*S
    print(f"stage-2 train step (B={B}, S={S}, remat, LoRA): {best*1e3:.0f} ms "
          f"-> {toks/best:.0f} tokens/s; ~{6*n*toks/best/1e12:.1f} TF/s model flops", flush=True)
