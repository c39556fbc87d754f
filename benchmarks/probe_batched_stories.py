"""Batched multi-story decode throughput at 7B (int8 weights + int8 KV).

B independent stories ride one parameter stream per token via
StoryGenerator.generate_batch — B=1 decode is HBM/latency-bound, so story
throughput should scale near-linearly until compute or cache bytes bite.
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import flax.linen as nn

from seed_story_tpu.data.tokenizer import (
    BOI_TOKEN_ID, EOI_TOKEN_ID, FIRST_IMG_TOKEN_ID,
)
from seed_story_tpu.decode.generate import GenerateConfig, StoryGenerator
from seed_story_tpu.models.agent import AgentConfig, ContinuousLVLM
from seed_story_tpu.models.llama import LlamaConfig

MAX_NEW = 200  # per story segment (shorter than 500 to keep the probe quick)

acfg = AgentConfig(llm=LlamaConfig(
    dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, lora_rank=16,
    quantize_base=True, quantize_kv=True,
))
agent = ContinuousLVLM(acfg)

seq, n = 64, 1
init_args = dict(
    input_ids=jnp.ones((1, seq), jnp.int32),
    attention_mask=jnp.ones((1, seq), jnp.int32),
    labels=jnp.zeros((1, seq), jnp.int32),
    image_embeds=jnp.zeros((n, acfg.num_vit_tokens, acfg.vit_dim)),
    embeds_gen_mask=jnp.ones((n,), bool),
    embeds_cmp_mask=jnp.ones((n,), bool),
    ids_gen_mask=jnp.zeros((1, seq), bool).at[0, 10:10 + acfg.num_img_out_tokens].set(True),
    ids_cmp_mask=jnp.zeros((1, seq), bool).at[0, 40:40 + acfg.num_img_in_tokens].set(True),
)
t0 = time.time()
params = nn.meta.unbox(jax.jit(
    lambda: agent.init(jax.random.PRNGKey(0), **init_args)["params"]
)())
jax.block_until_ready(params)
print("7B agent init:", round(time.time() - t0, 1), "s", flush=True)

nq = acfg.num_img_in_tokens
prompt = ([1, 500, 501] + [BOI_TOKEN_ID]
          + [FIRST_IMG_TOKEN_ID + i for i in range(nq)]
          + [EOI_TOKEN_ID] + [600])
ids_cmp = np.zeros(len(prompt), bool)
ids_cmp[4:4 + nq] = True

gcfg = GenerateConfig(
    max_new_tokens=MAX_NEW, num_img_gen_tokens=acfg.num_img_out_tokens,
    cache_capacity=1024, prompt_bucket=128,
    force_boi_at=MAX_NEW - acfg.num_img_out_tokens - 8,
    max_context_images=1, return_cache=False,
)
gen = StoryGenerator(agent, params, gcfg)

for B in (1, 2, 4, 8):
    stories = []
    for r in range(B):
        feats = np.random.RandomState(r).randn(
            1, acfg.num_vit_tokens, acfg.vit_dim).astype(np.float32)
        stories.append(dict(input_ids=np.array(prompt),
                            image_embeds=feats,
                            embeds_cmp_mask=np.ones((1,), bool),
                            ids_cmp_mask=ids_cmp))
    outs = gen.generate_batch(stories)  # compile + warm
    t0 = time.perf_counter()
    outs = gen.generate_batch(stories)
    dt = time.perf_counter() - t0
    total_tokens = sum(o["num_generated"] for o in outs)
    print(f"B={B}: {dt:.2f} s for {total_tokens} tokens -> "
          f"{total_tokens/dt:.1f} tok/s aggregate, "
          f"{dt/MAX_NEW*1e3:.1f} ms/step "
          f"({sum(o['has_img_output'] for o in outs)}/{B} images)", flush=True)
