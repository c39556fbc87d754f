"""Benchmark: story segments/min (text + 1024px image) on the real TPU chip.

Flagship (default) preset runs the TRUE 7B envelope from the reference's
gen_george.py:189-210: LLaMA-2-7B agent (bf16, LoRA r16), 500 new
tokens/segment with forced image blocks + feature feedback + window-8
eviction, and the full SDXL-base 1024px 50-step CFG de-tokenizer.

Default mode is CO-RESIDENT/INTERLEAVED (round 3): int8 MLLM (6.7GB) +
int8 window-8 KV (1.5GB) + bf16 SDXL (5.5GB) share the 16GB chip and the
de-tokenizer runs inside the story loop per segment — the reference's
actual flow (gen_george.py:208-224), measuring true per-segment latency.
Two-phase fallback (SEED_STORY_BENCH_INTERLEAVED=0, and automatic for
bf16 params or multi-story serving, whose footprints don't co-reside):
(A) decode every segment, recording the regressed image features (the
pipeline feeds back the MLLM's OWN features, never re-encoded pixels —
gen_george.py:209-224 — so deferring detok changes nothing), then (B)
free the MLLM and de-tokenize every feature; segments/min sums the phase
times. On a v5e-8, pipelines/serving.py overlaps the stages on disjoint
chips instead.

Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline divides by 2.75 segments/min — the midpoint estimate for the
reference stack on one A100 (PERF.md: HF generate 7B fp16 ~20-40 tok/s for
500 tokens + diffusers SDXL ~5-8 s/image => ~2.5-3 segments/min; the
reference publishes no throughput numbers, BASELINE.md).

Scale via env:
  SEED_STORY_BENCH_PRESET = pico | small | full (default)
  SEED_STORY_BENCH_SEGMENTS (default 4)
  SEED_STORY_BENCH_SDXL = 1 (default) | 0 (stub the de-tokenizer)
  SEED_STORY_BENCH_STEPS = 50 (SDXL denoise steps)
  SEED_STORY_BENCH_INT8 = 1 (default, full preset only): weight-only int8
      projections for the MLLM decode phase (quantize_base) — B=1 decode
      is HBM-bound, int8 params measured 10.7 ms/token vs 18.6 bf16.
"""

import gc
import json
import os
import sys
import time

import numpy as np

A100_REFERENCE_SEGMENTS_PER_MIN = 2.75  # PERF.md estimate, see module docstring
# Sensitivity band for that estimate (it is DERIVED, not measured — the
# reference publishes no throughput): HF generate 7B fp16 spans ~20-40
# tok/s => 12.5-25 s/500-token segment; diffusers SDXL 1024px 50-step
# spans ~5-8 s/image => 17.5-33 s/segment => 1.8-3.4 seg/min. The JSON
# carries vs_baseline_range = value / each endpoint so the headline cannot
# be read as a measured GPU comparison.
A100_REFERENCE_RANGE = (1.8, 3.4)


def kernel_gate():
    """On-chip Pallas-vs-XLA attention parity gate.

    All kernel tests in tests/ run implementation='pallas_interpret' on
    CPU; this is the standing gate that the COMPILED Mosaic kernel on the
    real chip still matches mha_reference — a compiler regression here
    would otherwise ship while the CPU suite stays green. Runs one decode
    shape (bottom-right mask, per-row lengths), one training shape
    (causal), and one SDXL shape (d=64, full mask) before anything is
    timed; mismatch kills the bench.
    """
    import jax
    import jax.numpy as jnp

    from seed_story_tpu.ops.attention import mha, mha_reference

    if jax.default_backend() != "tpu":
        return  # the gate targets the compiled Mosaic path only

    def check(name, q_shape, kv_shape, causal, q_start=None, kv_len=None):
        ks = jax.random.split(jax.random.PRNGKey(11), 3)
        q = jax.random.normal(ks[0], q_shape, jnp.bfloat16)
        k = jax.random.normal(ks[1], kv_shape, jnp.bfloat16)
        v = jax.random.normal(ks[2], kv_shape, jnp.bfloat16)
        kw = dict(causal=causal, q_start=q_start, kv_len=kv_len)
        got = jax.jit(
            lambda *a: mha(*a, implementation="pallas", **kw)
        )(q, k, v)
        ref = jax.jit(
            lambda *a: mha_reference(*a, **kw)
        )(q, k, v)
        got = np.asarray(got, np.float32)
        ref = np.asarray(ref, np.float32)
        max_d = float(np.abs(got - ref).max())
        mean_d = float(np.abs(got - ref).mean())
        if max_d > 6e-2 or mean_d > 4e-3:
            raise SystemExit(
                f"KERNEL GATE FAILED [{name}]: compiled Pallas attention "
                f"diverges from mha_reference on this chip "
                f"(max {max_d:.2e}, mean {mean_d:.2e})"
            )

    # training shape: causal, LLaMA head geometry (GQA-free 7B slice)
    check("train", (2, 8, 1280, 128), (2, 8, 1280, 128), True)
    # decode shape: 128-token continuation bottom-right-aligned against a
    # longer ragged cache (the cached-prefill path)
    check(
        "decode", (2, 8, 128, 128), (2, 8, 1280, 128), True,
        q_start=jnp.asarray([900, 1024], jnp.int32),
        kv_len=jnp.asarray([1028, 1152], jnp.int32),
    )
    # SDXL shape: d=64 full-mask self-attention (1024px latent seq)
    check("sdxl", (1, 10, 4096, 64), (1, 10, 4096, 64), False)


def build(preset: str, int8: bool = False, kv_int8: bool = False):
    import jax.numpy as jnp

    from seed_story_tpu.models.agent import AgentConfig
    from seed_story_tpu.models.llama import LlamaConfig

    if preset == "pico":
        return AgentConfig.tiny(), 32
    if preset == "small":
        # ~0.4B LLM: quick debug preset (round-1 headline; now secondary).
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
    # full: exact LLaMA-2-7B agent (reference llama2chat7b_lora.yaml dims,
    # random weights — no checkpoints in this environment), 500 new
    # tokens/segment like gen_george.py:189-195.
    llm = LlamaConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                      lora_rank=16, quantize_base=int8, quantize_kv=kv_int8)
    return AgentConfig(llm=llm), 500


def run_mllm_phase(preset, acfg, max_new, n_segments, window, n_stories=1,
                   detokenize=None):
    """Phase A: build the agent, decode warmup + n_segments story segments.

    ``n_stories`` > 1 runs that many independent stories in lockstep
    through one on-device program (StoryGenerator.generate_batch) — the
    serving configuration; B=1 is the latency configuration matching the
    reference's one-story-at-a-time loop.

    ``detokenize`` (interleaved mode): de-tokenizer hook called INSIDE the
    story loop per segment, exactly like the reference's
    adapter.generate inside the loop (gen_george.py:208-224) — requires
    the MLLM and SDXL to co-reside on the chip.

    Returns (timed_seconds, list_of_feature_arrays (host numpy)).
    """
    import jax
    import jax.numpy as jnp

    from seed_story_tpu.data.tokenizer import TinyTokenizer
    from seed_story_tpu.decode.generate import GenerateConfig, StoryGenerator
    from seed_story_tpu.models.agent import ContinuousLVLM
    from seed_story_tpu.pipelines.story_generation import (
        StoryGenerationPipeline,
        StoryPipelineConfig,
    )

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
    import flax.linen as nn

    def init_params():
        p = nn.meta.unbox(agent.init(jax.random.PRNGKey(0), **init_args)["params"])

        # int8 kernels init to zeros; randomize so decode compute is
        # non-degenerate (weights are random either way — no checkpoints
        # in this environment; bytes moved, not values, set the speed)
        def rnd(path, x):
            if x.dtype == jnp.int8:
                key = jax.random.PRNGKey(hash(str(path)) % (2**31))
                return jax.random.randint(
                    key, x.shape, -127, 128, jnp.int32
                ).astype(jnp.int8)
            return x

        return jax.tree_util.tree_map_with_path(rnd, p)

    params = jax.jit(init_params)()

    # static-shape sizing: a window-W prompt maxes out around
    # start + W*(max_new + 70) tokens. Fine-grained 512-token prompt
    # buckets (instead of one story-max bucket) let EARLY segments run a
    # small prefill + a bucket-sized KV cache — decode reads the whole
    # capacity buffer every token, so segment 1 pays ~1.4GB/token instead
    # of the worst case ~3.1GB. Each bucket is its own compile; the
    # warmup pass below covers all of them (persistent cache across runs).
    max_prompt = 80 + window * (max_new + 70)
    # speculative prompt-lookup decode in the B=1 latency mode: worst case
    # measured FREE at 7B (verify pass == one decode pass, PERF.md), and
    # the forced image chains + random-weight repetition loops accept
    spec = int(os.environ.get("SEED_STORY_BENCH_SPEC", "4"))
    gcfg = GenerateConfig(
        max_new_tokens=max_new,
        num_img_gen_tokens=acfg.num_img_out_tokens,
        # random weights emit EOS at the whim of the draw (any logits
        # perturbation re-rolls it — a kernel change once cut the story to
        # 1 segment); ban it so EVERY segment pays the full max_new-token
        # decode + image cost. This is the conservative direction: early
        # EOS would only make segments cheaper.
        eos_token_id=-1,
        cache_capacity=(max_prompt + max_new + 127) // 128 * 128,
        prompt_bucket=512 if preset == "full" else 128,
        force_boi_at=max_new - acfg.num_img_out_tokens - 8,
        max_context_images=window,
        return_cache=False,  # story flow never reads it back; saves a 7B-cache copy
        speculate_k=spec if n_stories == 1 else 0,
    )
    gen = StoryGenerator(agent, params, gcfg)

    rng = np.random.RandomState(0)

    def visual_encode(pixels):
        return rng.randn(1, acfg.num_vit_tokens, acfg.vit_dim).astype(np.float32)

    def mk_pipe(n_seg):
        return StoryGenerationPipeline(
            tok, gen, visual_encode, detokenize,
            StoryPipelineConfig(
                story_len=n_seg + 1, window_size=window,
                num_img_in_tokens=acfg.num_img_in_tokens,
            ),
        )

    def run_story(n_seg):
        if n_stories > 1:
            seeds = [
                (np.full((1, 3, 8, 8), s * 0.1, np.float32),
                 f"george the monkey went to the park chapter {s}")
                for s in range(n_stories)
            ]
            rounds = list(mk_pipe(n_seg).run_batch(seeds))
            return [seg for r in rounds for seg in r if seg is not None]
        return list(mk_pipe(n_seg).run(
            np.zeros((1, 3, 8, 8), np.float32),
            "george the monkey went to the park",
        ))

    # warmup: a FULL story pass compiles every prompt bucket the timed
    # pass will hit (compiles must not land inside the timed region)
    run_story(n_segments)

    t0 = time.perf_counter()
    segs = run_story(n_segments)
    dt = time.perf_counter() - t0
    feats = [np.asarray(s.image_features, np.float32)
             for s in segs if s.image_features is not None]
    return dt, feats


def build_sdxl_pipe(acfg, sdxl_steps):
    """SDXL-base adapter + VAE (bf16) behind the jitted sampling pipeline.
    Returns (pipe, neg_embeds)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from seed_story_tpu.models.sdxl.adapter import SDXLAdapter, SDXLAdapterConfig
    from seed_story_tpu.models.sdxl.unet import SDXLUNetConfig
    from seed_story_tpu.models.sdxl.vae import AutoencoderKL, VAEConfig
    from seed_story_tpu.pipelines.sdxl_pipeline import (
        SDXLImagePipeline,
        SDXLSampleConfig,
    )

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
    pipe = SDXLImagePipeline(
        sdxl, sdxl_params, vae, vae_params,
        cfg=SDXLSampleConfig(height=1024, width=1024,
                             num_inference_steps=sdxl_steps),
    )
    # one image per call: multi-image batches measured neutral (B=2) to
    # OOM (B=4) at 1024px — the UNet is compute-saturated per sample
    # (benchmarks/probe_sdxl_batch.py)
    neg = np.zeros((1, acfg.num_vit_tokens, acfg.vit_dim), np.float32)
    return pipe, neg


def run_sdxl_phase(acfg, feats, sdxl_steps):
    """Phase B: build SDXL (bf16), de-tokenize every recorded feature.

    Returns (timed_seconds, n_images).
    """
    pipe, neg = build_sdxl_pipe(acfg, sdxl_steps)

    img = pipe.generate(feats[0], neg)[0]  # warmup / compile
    assert img is not None

    t0 = time.perf_counter()
    for f in feats:
        img = pipe.generate(f, neg)[0]
    dt = time.perf_counter() - t0
    return dt, len(feats)


def main():
    t_setup = time.time()
    preset = os.environ.get("SEED_STORY_BENCH_PRESET", "full")
    # 8 segments: the story walks the context window up to its full
    # window-8 width (reference stories run 25 segments at steady state;
    # segments here average slightly cheaper than steady state since the
    # first few carry short prompts).
    n_segments = int(os.environ.get("SEED_STORY_BENCH_SEGMENTS", "8"))

    # a full axon-tunnel outage makes this import HANG (CLAUDE.md); say so
    # up front so a stalled driver log shows the cause
    print("bench: importing jax (axon) — a hang here means the TPU tunnel "
          "is down, not a framework issue", file=sys.stderr, flush=True)
    import jax

    # persistent compile cache: repeated driver runs skip the (slow) remote
    # TPU compiles entirely (the helper is TPU-only — persisted CPU AOT
    # executables are machine-pinned and can mis-execute on another host)
    from seed_story_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    kernel_gate()  # compiled-Pallas parity on the actual chip, pre-timing

    int8 = (
        os.environ.get("SEED_STORY_BENCH_INT8", "1") == "1" and preset == "full"
    )
    kv_int8 = (
        os.environ.get("SEED_STORY_BENCH_KVINT8", "1") == "1" and preset == "full"
    )
    acfg, max_new = build(preset, int8, kv_int8)
    # int8 params (6.7GB) + int8 KV (window-8 5248-slot cache = 1.5GB)
    # fit the reference's TRUE window-8 envelope (gen_george.py:205-206)
    # on the one 16GB chip. bf16 params (13.5GB) only leave room for
    # window-4 — that mode keeps the old single-chip envelope.
    window = 8 if (int8 and kv_int8 and preset == "full") else 4
    # >1: serve that many stories concurrently (lockstep batched decode).
    # Each story carries its own window-8 KV cache (1.5GB int8 at 7B), so
    # the single-chip envelope caps at ~4 concurrent stories.
    n_stories = int(os.environ.get("SEED_STORY_BENCH_STORIES", "1"))

    use_sdxl = (
        os.environ.get("SEED_STORY_BENCH_SDXL", "1") == "1" and preset != "pico"
    )
    sdxl_steps = int(os.environ.get("SEED_STORY_BENCH_STEPS", "50"))
    # Interleaved (co-resident) mode — THE DEFAULT at B=1: MLLM (int8,
    # 6.7GB) + int8 window-8 KV (1.5GB) + SDXL bf16 (5.5GB) share the 16GB
    # chip, and the de-tokenizer runs INSIDE the story loop per segment —
    # the reference's actual flow (gen_george.py:208-224) and the honest
    # per-segment latency (measured round 3: 4.88 seg/min interleaved vs
    # 4.80 two-phase). Two-phase remains the mode for bf16 params or
    # multi-story serving (n_stories KV caches + SDXL do not co-reside).
    # default: on at n_stories==1 (13.7GB fits); off for multi-story
    # (each extra story adds a 1.5GB KV cache) — but an explicit =1 lets
    # 2 co-resident stories be tried (~15.2GB, borderline)
    interleaved = (
        os.environ.get("SEED_STORY_BENCH_INTERLEAVED",
                       "1" if n_stories == 1 else "0") == "1"
        and use_sdxl and preset != "pico" and int8 and kv_int8
    )
    detok = None
    if interleaved:
        pipe, neg = build_sdxl_pipe(acfg, sdxl_steps)
        detok = lambda f: pipe.generate(f, neg)[0]  # noqa: E731

    mllm_s, feats = run_mllm_phase(
        preset, acfg, max_new, n_segments, window, n_stories,
        detokenize=detok,
    )
    setup_s = time.time() - t_setup

    if interleaved:
        sdxl_s, n_done = 0.0, len(feats)  # detok time already inside mllm_s
    elif use_sdxl and feats:
        gc.collect()  # drop the 13.5GB of MLLM params before SDXL init
        sdxl_s, n_done = run_sdxl_phase(acfg, feats, sdxl_steps)
    else:
        sdxl_s, n_done = 0.0, len(feats)

    total_s = mllm_s + sdxl_s
    segments_per_min = n_done / total_s * 60.0

    detok_desc = (f"SDXL-base 1024px {sdxl_steps}-step CFG" if use_sdxl
                  else "detok stubbed")
    if interleaved:
        detok_desc += " co-resident/interleaved"
    spec = int(os.environ.get("SEED_STORY_BENCH_SPEC", "4")) if n_stories == 1 else 0
    q = ("int8-weight" + ("+kv" if kv_int8 else "")
         + (f"+speculative(k={spec})" if spec else "") + " decode")
    scale = (f"7B {q}" if int8 else "7B") if preset == "full" else preset
    serve = (f"; {n_stories} concurrent stories (batched serving mode)"
             if n_stories > 1 else "")
    result = {
        "metric": f"story segments/min (text+image; {scale} MLLM, "
                  f"{max_new} new tokens/segment, window-{window}{serve}; "
                  f"{detok_desc}; single v5e chip; vs_baseline = ratio to A100 "
                  f"reference-stack estimate {A100_REFERENCE_SEGMENTS_PER_MIN} seg/min)",
        "value": round(segments_per_min, 2),
        "unit": "segments/min",
        "vs_baseline": round(segments_per_min / A100_REFERENCE_SEGMENTS_PER_MIN, 2),
        # honesty band: the A100 number is an estimate; these are the
        # ratios against its optimistic/pessimistic endpoints (module
        # docstring derivation)
        "vs_baseline_range": [
            round(segments_per_min / A100_REFERENCE_RANGE[1], 2),
            round(segments_per_min / A100_REFERENCE_RANGE[0], 2),
        ],
    }
    print(json.dumps(result))
    print(
        json.dumps({"debug": {"segments": n_done,
                               "mllm_s": round(mllm_s, 2),
                               "sdxl_s": round(sdxl_s, 2),
                               "interleaved": interleaved,
                               "setup_s": round(setup_s, 1),
                               "backend": jax.default_backend()}}),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
