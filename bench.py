"""Benchmark: story segments/min (text + 1024px image) on the real TPU chip.

Runs the story-generation pipeline end-to-end: MLLM decode (forced image
blocks, feature feedback, window eviction) + the FULL SDXL-base 1024px
50-step CFG de-tokenizer per segment. Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Scale via env:
  SEED_STORY_BENCH_PRESET = pico | small (default) | full
  SEED_STORY_BENCH_SEGMENTS (default 4)
  SEED_STORY_BENCH_SDXL = 1 (default) | 0 (stub the de-tokenizer)
  SEED_STORY_BENCH_STEPS = 50 (SDXL denoise steps)
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

    use_sdxl = os.environ.get("SEED_STORY_BENCH_SDXL", "1") == "1" and preset != "pico"
    sdxl_steps = int(os.environ.get("SEED_STORY_BENCH_STEPS", "50"))
    if use_sdxl:
        import flax.linen as nn

        from seed_story_tpu.models.sdxl.adapter import SDXLAdapter, SDXLAdapterConfig
        from seed_story_tpu.models.sdxl.vae import AutoencoderKL, VAEConfig
        from seed_story_tpu.pipelines.sdxl_pipeline import (
            SDXLImagePipeline,
            SDXLSampleConfig,
        )

        from seed_story_tpu.models.sdxl.unet import SDXLUNetConfig

        # inference-only: bf16 params (full SDXL f32 params are 10.4GB and
        # don't fit next to the MLLM on one 16GB chip)
        sdxl_cfg = SDXLAdapterConfig(
            embedding_dim=acfg.vit_dim,
            unet=SDXLUNetConfig(param_dtype=jnp.bfloat16),
        )
        sdxl = SDXLAdapter(sdxl_cfg)
        b = 1
        sdxl_params = nn.meta.unbox(jax.jit(lambda: sdxl.init(
            jax.random.PRNGKey(2),
            noisy_latents=jnp.zeros((b, 128, 128, 4), jnp.bfloat16),
            timesteps=jnp.zeros((b,), jnp.int32),
            image_embeds=jnp.zeros((b, acfg.num_vit_tokens, acfg.vit_dim),
                                   jnp.bfloat16),
            time_ids=jnp.ones((b, 6)),
            noise=jnp.zeros((b, 128, 128, 4), jnp.bfloat16))["params"])())
        vae = AutoencoderKL(VAEConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16))
        vae_params = nn.meta.unbox(jax.jit(lambda: vae.init(
            jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)))["params"])())
        sdxl_pipe = SDXLImagePipeline(
            sdxl, sdxl_params, vae, vae_params,
            cfg=SDXLSampleConfig(height=1024, width=1024,
                                 num_inference_steps=sdxl_steps),
        )
        neg = np.zeros((1, acfg.num_vit_tokens, acfg.vit_dim), np.float32)

        def detokenize(feats):
            return sdxl_pipe.generate(np.asarray(feats, np.float32), neg)[0]
    else:
        def detokenize(feats):
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

    detok = (f"SDXL-base 1024px {sdxl_steps}-step CFG" if use_sdxl
             else "detok stubbed")
    result = {
        "metric": f"story segments/min (text+image; MLLM preset={preset}, "
                  f"{max_new} new tokens/segment; {detok}; single v5e chip)",
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
