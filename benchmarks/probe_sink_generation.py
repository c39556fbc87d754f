"""Sink-threaded GENERATION (run_sink) vs the re-prefill flow at 7B.

Verifies the round-5 change on hardware (run_sink + speculative decode
composing with the threaded cache) and measures the lever honestly:
run_sink prefills only the new image's 66-token block per segment instead
of the whole window-8 prompt (~4.7k tokens at steady state), so the
expected win is the per-segment PREFILL cost only — decode (500 tokens at
the B=1 parameter-latency floor, PERF.md "Decode roofline anatomy") is
identical in both flows.

Decode-only comparison (no SDXL): the de-tokenizer is unchanged by the
sink flow and would double the runtime.

Usage: python benchmarks/probe_sink_generation.py [--segments 14]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build, _randomize_int8, measure_health  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=14)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--max_new", type=int, default=500)
    ap.add_argument("--spec", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from seed_story_tpu.utils.cache import enable_compile_cache
    from seed_story_tpu.data.tokenizer import TinyTokenizer
    from seed_story_tpu.decode.generate import GenerateConfig, StoryGenerator
    from seed_story_tpu.models.agent import ContinuousLVLM
    from seed_story_tpu.pipelines.story_generation import (
        StoryGenerationPipeline,
        StoryPipelineConfig,
    )

    enable_compile_cache()
    print(f"health: {measure_health():.1f} TF/s", flush=True)

    acfg, _ = build("full", int8=True, kv_int8=True)
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
            0, 10 : 10 + acfg.num_img_out_tokens].set(True),
        ids_cmp_mask=jnp.zeros((1, seq), bool).at[
            0, 40 : 40 + acfg.num_img_in_tokens].set(True),
    )

    def init_params():
        p = nn.meta.unbox(agent.init(jax.random.PRNGKey(0), **init_args)["params"])
        return _randomize_int8(p)

    t0 = time.perf_counter()
    params = jax.jit(init_params)()
    jax.block_until_ready(params)
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    max_new, window = args.max_new, args.window
    max_prompt = 80 + window * (max_new + 70)

    def gcfg(sink: bool):
        if sink:
            cap = 80 + window * (max_new + 70) + max_new + args.spec + 1 \
                + 28 * (args.segments + 1)
        else:
            cap = max_prompt + max_new
        return GenerateConfig(
            max_new_tokens=max_new,
            num_img_gen_tokens=acfg.num_img_out_tokens,
            eos_token_id=-1,
            cache_capacity=-(-cap // 128) * 128,
            prompt_bucket=512,
            force_boi_at=max_new - acfg.num_img_out_tokens - 8,
            max_context_images=window,
            return_cache=sink,
            speculate_k=args.spec,
        )

    rng = np.random.RandomState(0)

    def visual_encode(pixels):
        return rng.randn(1, acfg.num_vit_tokens, acfg.vit_dim).astype(np.float32)

    def run_flow(sink: bool):
        gen = StoryGenerator(agent, params, gcfg(sink))
        pipe = StoryGenerationPipeline(
            tok, gen, visual_encode, None,
            StoryPipelineConfig(
                story_len=args.segments + 1, window_size=window,
                num_img_in_tokens=acfg.num_img_in_tokens,
            ),
        )
        fn = pipe.run_sink if sink else pipe.run
        seg_times, ctx = [], []
        t_prev = time.perf_counter()
        for seg in fn(np.zeros((1, 3, 8, 8), np.float32),
                      "george the monkey went to the park"):
            t_now = time.perf_counter()
            seg_times.append(t_now - t_prev)
            ctx.append(seg.context_tokens)
            t_prev = t_now
        return seg_times, ctx

    for name, sink in [("reprefill", False), ("sink", True)]:
        # warmup story: compile every program this flow needs
        t0 = time.perf_counter()
        warm_times, _ = run_flow(sink)
        print(f"{name}: warmup story {time.perf_counter() - t0:.1f}s "
              f"({len(warm_times)} segments)", flush=True)
        times, ctx = run_flow(sink)
        steady = times[window + 1:]
        print(f"{name}: {len(times)} segments, total {sum(times):.1f}s | "
              f"per-seg all {np.mean(times):.2f}s | steady(>{window + 1}) "
              f"mean {np.mean(steady):.2f}s median {np.median(steady):.2f}s",
              flush=True)
        print(f"{name}: per-seg {[round(t, 2) for t in times]}", flush=True)
        print(f"{name}: context_tokens {ctx}", flush=True)

    print(f"health post: {measure_health():.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
