"""Attention-sink long-story visualization at 7B on the real chip.

Drives StoryVisualizationPipeline (ground-truth texts, generated image
features, cache threading + sink evictions) for a story long enough to
trigger multiple evictions — the vis_george_sink flow at flagship scale.
"""
import os
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import flax.linen as nn

from seed_story_tpu.data.tokenizer import TinyTokenizer
from seed_story_tpu.decode.generate import GenerateConfig, StoryGenerator
from seed_story_tpu.models.agent import AgentConfig, ContinuousLVLM
from seed_story_tpu.models.llama import LlamaConfig
from seed_story_tpu.pipelines.story_visualization import (
    StoryVisualizationPipeline,
    VisPipelineConfig,
)

SEGMENTS = int(os.environ.get("SINK_SEGMENTS", "12"))
WINDOW = int(os.environ.get("SINK_WINDOW", "4"))
MAX_NEW = int(os.environ.get("SINK_MAX_NEW", "200"))
WITH_SDXL = os.environ.get("SINK_SDXL", "0") == "1"  # in-loop int8 detok
# cache capacity: the threaded cache holds sink tokens (4 + 24 per evicted
# image, growing with the story) + the live window (~(text+66+MAX_NEW) per
# segment) — size to the story unless pinned via env
_need = 128 + 24 * max(0, SEGMENTS - WINDOW) + WINDOW * (96 + MAX_NEW)
CAPACITY = int(os.environ.get("SINK_CAPACITY", str((_need + 255) // 256 * 256)))

acfg = AgentConfig(llm=LlamaConfig(
    dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, lora_rank=16,
    quantize_base=True, quantize_kv=True,
))
agent = ContinuousLVLM(acfg)
seq = 64
init_args = dict(
    input_ids=jnp.ones((1, seq), jnp.int32),
    attention_mask=jnp.ones((1, seq), jnp.int32),
    labels=jnp.zeros((1, seq), jnp.int32),
    image_embeds=jnp.zeros((1, acfg.num_vit_tokens, acfg.vit_dim)),
    embeds_gen_mask=jnp.ones((1,), bool),
    embeds_cmp_mask=jnp.ones((1,), bool),
    ids_gen_mask=jnp.zeros((1, seq), bool).at[0, 10:10 + acfg.num_img_out_tokens].set(True),
    ids_cmp_mask=jnp.zeros((1, seq), bool).at[0, 40:40 + acfg.num_img_in_tokens].set(True),
)
t0 = time.time()
params = nn.meta.unbox(jax.jit(
    lambda: agent.init(jax.random.PRNGKey(0), **init_args)["params"]
)())
jax.block_until_ready(params)
print("7B init:", round(time.time() - t0, 1), "s", flush=True)

tok = TinyTokenizer()
gcfg = GenerateConfig(
    max_new_tokens=MAX_NEW, num_img_gen_tokens=acfg.num_img_out_tokens,
    cache_capacity=CAPACITY, prompt_bucket=128,
    force_boi_at=MAX_NEW - acfg.num_img_out_tokens - 8,
    max_context_images=WINDOW, return_cache=True,
)
gen = StoryGenerator(agent, params, gcfg)
rng = np.random.RandomState(0)

detok = None
detok_time = [0.0]
if WITH_SDXL:
    # co-resident int8-UNet de-tokenizer inside the visualization loop
    sys.path.insert(0, "/root/repo")
    from bench import build_sdxl_pipe

    sdxl_pipe, neg = build_sdxl_pipe(acfg, 50, int8=True)
    warm = np.zeros((1, acfg.num_vit_tokens, acfg.vit_dim), np.float32)
    assert sdxl_pipe.generate(warm, neg)[0] is not None

    def detok(f):
        t0 = time.perf_counter()
        img = sdxl_pipe.generate(f, neg)[0]
        detok_time[0] += time.perf_counter() - t0
        return img


def visual_encode(pixels):
    return rng.randn(1, acfg.num_vit_tokens, acfg.vit_dim).astype(np.float32)


texts = [f"then george visited place number {i} in the city" for i in range(SEGMENTS + 1)]


def run(with_detok=False):
    pipe = StoryVisualizationPipeline(
        tok, gen, visual_encode, detok if with_detok else None,
        VisPipelineConfig(story_len=SEGMENTS + 1, window_size=WINDOW,
                          num_img_in_tokens=acfg.num_img_in_tokens),
    )
    return list(pipe.run(np.zeros((1, 3, 8, 8), np.float32),
                         "george the monkey in the big city", texts))


segs = run()  # warmup/compile (decode programs; detok warmed separately)
detok_time[0] = 0.0
t0 = time.perf_counter()
segs = run(with_detok=WITH_SDXL)
dt = time.perf_counter() - t0
evictions = max(0, len(segs) - WINDOW)
print(f"sink story: {len(segs)} segments ({evictions}+ evictions, window-{WINDOW}) "
      f"in {dt:.1f} s -> {dt/len(segs):.2f} s/segment; "
      f"context tokens at end: {segs[-1].context_tokens}"
      + (f"; in-loop SDXL {detok_time[0]:.1f} s "
         f"({detok_time[0]/len(segs):.2f} s/seg)" if WITH_SDXL else ""),
      flush=True)
assert all(s.image_features is not None for s in segs)
