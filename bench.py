"""Benchmark: story segments/min on the real TPU chip.

Runs the story-generation pipeline (MLLM decode with forced image blocks +
feature feedback + window eviction; de-tokenizer stubbed until the SDXL
port lands) and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Scale via env:
  SEED_STORY_BENCH_PRESET = pico | small (default) | full
  SEED_STORY_BENCH_SEGMENTS (default 6)
"""

import json
import os
import sys
import time

import numpy as np


def build(preset: str):
    import jax.numpy as jnp

    from seed_story_tpu.models.agent import AgentConfig
    from seed_story_tpu.models.llama import LlamaConfig

    if preset == "pico":
        return AgentConfig.tiny(), 32
    if preset == "small":
        # ~0.4B LLM: realistic per-token decode behavior while keeping the
        # executable small enough for the (slow, variable) TPU tunnel load.
        llm = LlamaConfig(
            hidden_size=2048, intermediate_size=5632, num_hidden_layers=8,
            num_attention_heads=16, dtype=jnp.bfloat16,
        )
        return (
            AgentConfig(
                llm=llm, input_resampler_grid=8, output_resampler_grid=16,
                num_img_out_tokens=64, resampler_heads=16, vit_dim=2048,
            ),
            120,
        )
    # full: LLaMA-2-7B agent dims (random weights)
    llm = LlamaConfig(dtype=jnp.bfloat16)
    return AgentConfig(llm=llm), 220


def main():
    t_setup = time.time()
    preset = os.environ.get("SEED_STORY_BENCH_PRESET", "small")
    n_segments = int(os.environ.get("SEED_STORY_BENCH_SEGMENTS", "4"))

    import jax

    # persistent compile cache: repeated driver runs skip the (slow) remote
    # TPU compiles entirely
    cache_dir = os.environ.get(
        "SEED_STORY_COMPILE_CACHE", os.path.join(os.path.dirname(__file__), ".jax_cache")
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from seed_story_tpu.data.tokenizer import TinyTokenizer
    from seed_story_tpu.decode.generate import GenerateConfig, StoryGenerator
    from seed_story_tpu.models.agent import ContinuousLVLM
    from seed_story_tpu.pipelines.story_generation import (
        StoryGenerationPipeline,
        StoryPipelineConfig,
    )

    acfg, max_new = build(preset)
    agent = ContinuousLVLM(acfg)
    tok = TinyTokenizer()

    seq, n = 64, 1
    init_args = dict(
        input_ids=jnp.ones((1, seq), jnp.int32),
        attention_mask=jnp.ones((1, seq), jnp.int32),
        labels=jnp.zeros((1, seq), jnp.int32),
        image_embeds=jnp.zeros((n, acfg.num_vit_tokens, acfg.vit_dim)),
        embeds_gen_mask=jnp.ones((n,), bool),
        embeds_cmp_mask=jnp.ones((n,), bool),
        ids_gen_mask=jnp.zeros((1, seq), bool).at[
            0, 10 : 10 + acfg.num_img_out_tokens
        ].set(True),
        ids_cmp_mask=jnp.zeros((1, seq), bool).at[
            0, 40 : 40 + acfg.num_img_in_tokens
        ].set(True),
    )
    params = jax.jit(
        lambda: agent.init(jax.random.PRNGKey(0), **init_args)["params"]
    )()

    window = 4
    gcfg = GenerateConfig(
        max_new_tokens=max_new,
        num_img_gen_tokens=acfg.num_img_out_tokens,
        cache_capacity=2048,
        prompt_bucket=1024,  # one bucket for the whole story -> one compile
        force_boi_at=max_new - acfg.num_img_out_tokens - 8,
        max_context_images=window,
    )
    gen = StoryGenerator(agent, params, gcfg)

    rng = np.random.RandomState(0)

    def visual_encode(pixels):
        return rng.randn(1, acfg.num_vit_tokens, acfg.vit_dim).astype(np.float32)

    def detokenize(feats):  # SDXL stub until the de-tokenizer port lands
        return np.zeros((8, 8, 3), np.uint8)

    pipe_cfg = StoryPipelineConfig(
        story_len=n_segments + 1, window_size=window,
        num_img_in_tokens=acfg.num_img_in_tokens,
    )

    def run_story():
        pipe = StoryGenerationPipeline(tok, gen, visual_encode, detokenize, pipe_cfg)
        return list(
            pipe.run(np.zeros((1, 3, 8, 8), np.float32), "george the monkey went to the park")
        )

    # warmup (compiles per prompt bucket)
    segs = run_story()
    setup_s = time.time() - t_setup

    t0 = time.perf_counter()
    segs = run_story()
    dt = time.perf_counter() - t0
    n_done = sum(1 for s in segs if s.image is not None) or len(segs)
    segments_per_min = n_done / dt * 60.0

    result = {
        "metric": f"story segments/min (MLLM decode path, preset={preset}, "
                  f"{max_new} new tokens/segment, single chip; SDXL detok stubbed)",
        "value": round(segments_per_min, 2),
        "unit": "segments/min",
        "vs_baseline": 1.0,  # reference publishes no throughput (BASELINE.md)
    }
    print(json.dumps(result))
    print(
        json.dumps({"debug": {"segments": n_done, "wall_s": round(dt, 2),
                               "setup_s": round(setup_s, 1),
                               "backend": jax.default_backend()}}),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
