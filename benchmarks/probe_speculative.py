"""Speculative (prompt-lookup) decode at 7B: worst-case overhead and
image-chain best case.

With random weights the text accept rate is ~0, so spec_k>0 measures the
WORST case (every pass verifies K+1 tokens but commits 1). The best case
shows on the forced image chains with trained models (drafted verbatim
from the previous chain -> K+1 tokens/pass).
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

MAX_NEW = 200

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
print("7B init:", round(time.time() - t0, 1), "s", flush=True)

nq = acfg.num_img_in_tokens
prompt = ([1, 500, 501] + [BOI_TOKEN_ID]
          + [FIRST_IMG_TOKEN_ID + i for i in range(nq)]
          + [EOI_TOKEN_ID] + [600])
ids_cmp = np.zeros(len(prompt), bool)
ids_cmp[4:4 + nq] = True
feats = np.random.RandomState(0).randn(
    1, acfg.num_vit_tokens, acfg.vit_dim).astype(np.float32)

for k in (0, 4):
    gcfg = GenerateConfig(
        max_new_tokens=MAX_NEW, num_img_gen_tokens=acfg.num_img_out_tokens,
        cache_capacity=1024, prompt_bucket=128,
        max_context_images=1, return_cache=False, speculate_k=k,
    )
    gen = StoryGenerator(agent, params, gcfg)
    out = gen.generate(np.array(prompt), feats, np.ones((1,), bool), ids_cmp)
    t0 = time.perf_counter()
    out = gen.generate(np.array(prompt), feats, np.ones((1,), bool), ids_cmp)
    dt = time.perf_counter() - t0
    n_tok = out["num_generated"]
    print(f"spec_k={k}: {dt:.2f} s for {n_tok} tokens -> "
          f"{n_tok/dt:.1f} tok/s ({dt/n_tok*1e3:.1f} ms/token)", flush=True)
