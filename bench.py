"""Benchmark: story segments/min (text + 1024px image) on the real TPU chip.

Flagship (default) configuration is the reference's FULL story envelope
(gen_george.py:189-210, story_len 25): LLaMA-2-7B agent, 500 new
tokens/segment with forced image blocks + feature feedback + window-8
eviction, the full SDXL-base 1024px 50-step CFG de-tokenizer CO-RESIDENT
and interleaved (image rendered inside the story loop per segment —
gen_george.py:208-224), B=1 (the reference loops val stories one at a
time, gen_george.py:152), measured over the 25-segment steady state.

DRIVER-PROOFING (round 5 — BENCH_r04 died rc=124 before emitting a line):
  * Global wall budget (SEED_STORY_BENCH_BUDGET_S, default 1080 s): every
    phase checks the remaining budget; warmup and the timed story are
    consumed SEGMENT BY SEGMENT and stop early rather than blow the
    driver's clock. A truncated run emits an honest (annotated) headline
    from the segments it completed.
  * The headline JSON line is printed the moment the FIRST mode finishes;
    later modes append improved lines. The LAST stdout line is always the
    best headline.
  * Cold compile cache (the expected driver state after code changes):
    the kernel gate is skipped (annotated) when the persistent cache is
    empty and the budget cannot absorb ~6 extra remote compiles; if cold
    compiles eat the warmup, the headline falls back to the median of
    trailing per-segment times (annotated "steady_state_median") so
    compile stalls never pollute the number.
  * Warmup budget planner (warmup_must_stop): the warmup story yields the
    floor the moment the remaining budget can no longer fund
    MIN_TIMED_SEGMENTS timed segments at the observed rate — the timed
    story (and its median fallback) always gets enough samples, even in
    a slow-load tunnel window where setup alone eats most of the budget
    (observed: the old rule left ONE 90 s timed segment => a 0.66
    headline artifact).
  * Health-gate sleeps are capped against the remaining budget.
  * Last-resort WATCHDOG: a daemon timer fires at budget +
    SEED_STORY_BENCH_WATCHDOG_GRACE_S (default 90 s) and hard-exits 0
    after re-printing the best headline emitted so far (annotated
    "watchdog_fired") — or an honest null-value error line if no mode
    completed. Budget checks run BETWEEN phases; a single phase that
    itself degrades ~10x (observed: an SDXL warmup stuck >870 s in a
    degraded tunnel window) would otherwise blow the driver's wall with
    zero output, which is exactly how BENCH_r04 died.

Two-phase fallback (SEED_STORY_BENCH_INTERLEAVED=0, and automatic for
bf16 params or >max-co-resident serving): (A) decode every segment,
recording the regressed image features (the pipeline feeds back the
MLLM's OWN features, never re-encoded pixels — gen_george.py:209-224 —
so deferring detok changes nothing), then (B) de-tokenize every feature;
segments/min sums the phase times. On a v5e-8, pipelines/serving.py
overlaps the stages on disjoint chips instead.

Prints headline JSON line(s); the last stdout line is the official one:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline divides by 2.75 segments/min — the midpoint estimate for the
reference stack on one A100 (PERF.md: HF generate 7B fp16 ~20-40 tok/s for
500 tokens + diffusers SDXL ~5-8 s/image => ~2.5-3 segments/min; the
reference publishes no throughput numbers, BASELINE.md).

Scale via env:
  SEED_STORY_BENCH_PRESET = pico | small | full (default)
  SEED_STORY_BENCH_SEGMENTS (default 25: the flagship steady-state story —
      PERF.md "25-segment flagship"; 8 reproduces the round-3/4 comparable)
  SEED_STORY_BENCH_MODES (default "1"): comma list of modes, measured in
      order. Tokens: an int N = N concurrent co-resident stories (lockstep
      serving; at 25-segment steady state B>=2 collapses — PERF.md — so the
      default is the B=1 reference-latency flow); "sink" = sink-threaded
      generation (run_sink: KV cache carried across segments, prefill only
      the new image block). Headline = best mode; the B=1 latency mode
      rides along as b1_segments_per_min when it is not the best.
      SEED_STORY_BENCH_STORIES=N pins one serving mode (back-compat).
  SEED_STORY_BENCH_BUDGET_S = 1080: global wall budget (seconds).
  SEED_STORY_BENCH_WATCHDOG_GRACE_S = 90: the last-resort watchdog fires
      at budget + grace (see DRIVER-PROOFING above).
  SEED_STORY_BENCH_SDXL = 1 (default) | 0 (stub the de-tokenizer)
  SEED_STORY_BENCH_STEPS = 50 (SDXL denoise steps)
  SEED_STORY_BENCH_INT8 = 1 (default, full preset only): weight-only int8
      projections for the MLLM decode phase (quantize_base) — B=1 decode
      is HBM-bound, int8 params measured 10.7 ms/token vs 18.6 bf16.
  SEED_STORY_BENCH_SDXL_INT8 (full preset): weight-only int8 UNet. Round-5
      default follows the data (see PERF.md "int8 UNet decision").
  Health: the bench refuses to time in a degraded tunnel window (retries
      within budget, then annotates the JSON with health_degraded).
"""

import gc
import json
import os
import sys
import threading
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

# Last-resort watchdog state (module docstring "DRIVER-PROOFING"): emit()
# stores the current best headline here; the timer thread re-prints it and
# hard-exits if the main thread is still running past budget + grace.
_WATCHDOG = {"headline": None, "done": False}


def arm_watchdog(fire_at):
    """Arm a daemon timer that guarantees a parseable last stdout line.

    Budget checks in main() run BETWEEN phases; a single phase that hits a
    ~10x-degraded tunnel window (observed: SDXL warmup stuck >870 s) can
    hang past the driver's wall clock with zero output — the BENCH_r04
    failure mode. The timer fires at `fire_at` (wall seconds): if main()
    has not marked itself done, it re-prints the best emitted headline
    (annotated "watchdog_fired": true), or an honest null-value error line
    if no mode ever completed, then `os._exit(0)` so the driver records a
    parseable tail instead of rc=124. Tunnel hangs are I/O waits, so the
    GIL is free and the timer thread runs."""

    def fire():
        if _WATCHDOG["done"]:
            return
        line = _WATCHDOG["headline"]
        if line is None:
            line = json.dumps({
                "metric": "story segments/min (watchdog: no mode completed "
                          "within the wall budget — see stderr phase log)",
                "value": None,
                "unit": "segments/min",
                "vs_baseline": None,
                "error": "watchdog_timeout_no_measurement",
            })
        print("bench: WATCHDOG fired — a phase hung past budget+grace; "
              "emitting best-known headline and exiting",
              file=sys.stderr, flush=True)
        print(line, flush=True)
        os._exit(0)

    t = threading.Timer(max(fire_at - time.time(), 1.0), fire)
    t.daemon = True
    t.start()
    return t


def measure_health():
    """Best-of-3 chained-GEMM rate (the benchmarks/probe_health.py control).

    The tunnel-attached chip occasionally enters a degraded window where
    everything runs ~10x slow for many minutes (PERF.md round-3 incident).
    Healthy: ~80-135 TF/s at this geometry. Returns TF/s."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return float("nan")
    w1 = jax.random.normal(jax.random.PRNGKey(0), (1280, 10240), jnp.bfloat16)
    w2 = jax.random.normal(jax.random.PRNGKey(1), (5120, 1280), jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(2), (2048, 1280), jnp.bfloat16)

    @jax.jit
    def mm(x, w1, w2):
        def body(i, c):
            h = jnp.dot(c, w1, preferred_element_type=jnp.float32)
            h1, h2 = jnp.split(h, 2, axis=-1)
            return jnp.dot((h1 * h2).astype(jnp.bfloat16), w2,
                           preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, 50, body, x)

    o = mm(x, w1, w2)
    jax.block_until_ready(o)
    # Warm the host-read program too: jnp.sum is its own compiled program,
    # and on a rotated backend its remote compile lands INSIDE the first
    # timed iteration (measured 59.5 s wall in probe_gate_cost.py) — the
    # best-of-3 hides it from the health number but not from gates_s.
    _ = float(jnp.sum(o).astype(jnp.float32))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = mm(x, w1, w2)
        _ = float(jnp.sum(o).astype(jnp.float32))
        best = min(best, time.perf_counter() - t0)
    fl = 2 * 2048 * 1280 * 10240 + 2 * 2048 * 5120 * 1280
    return fl / (best / 50) / 1e12


HEALTH_MIN_TFS = 40.0  # under this the tunnel/chip is in a degraded window

FINALIZE_RESERVE_S = 40.0  # post-story health probe + JSON emission

# The timed story must get at least this many segments: the
# steady-state-median fallback needs >=3 per-segment walls and medians
# the trailing half, so 5 leaves 2-3 compile-free samples even when the
# first timed segments still hit cold buckets.
MIN_TIMED_SEGMENTS = 5

# Interleaved timed segments cost ~2.4x a warmup segment (warmup skips
# the de-tokenizer; SDXL is ~57% of flagship segment latency — PERF.md —
# and degraded windows slow decode and SDXL alike).
DETOK_SEGMENT_FACTOR = 2.4


def retry_transient_oom(fn, what, time_left, sleep_s=45.0):
    """The tunnel worker can hold a just-exited process's HBM briefly: the
    first big allocation after another big TPU job may hit
    RESOURCE_EXHAUSTED at a size that plainly fits (CLAUDE.md gotcha; this
    killed a round-5 rehearsal rc=1 at SDXL init). Retry once after a
    pause before treating it as real — unless the budget can't afford the
    pause."""
    try:
        return fn()
    except Exception as e:  # jax wraps the runtime error; match the message
        if ("RESOURCE_EXHAUSTED" not in str(e)
                or time_left() < 2 * sleep_s + FINALIZE_RESERVE_S):
            raise
        print(f"bench: transient RESOURCE_EXHAUSTED during {what} "
              "(tunnel worker holding a dead process's HBM?) — "
              f"retrying once in {sleep_s:.0f}s", file=sys.stderr, flush=True)
        gc.collect()
        time.sleep(sleep_s)
        return fn()


def warmup_must_stop(time_left_s, warmup_per_s, detok_enabled):
    """Budget planner for the warmup story: stop warming the moment the
    remaining budget can no longer fund MIN_TIMED_SEGMENTS timed segments
    (estimated from the observed warmup per-segment rate) plus the
    finalize reserve.

    Rehearsal lesson (round 5): in a slow-load tunnel window the old rule
    (keep warming until ~4 warmup segments of budget remain) let an
    850 s setup+warmup squeeze the timed story to ONE segment — whose
    wall still contained compile stalls — and the honest headline
    collapsed to 0.66 seg/min. Reserving timed segments instead of warmup
    segments keeps the steady-state-median fallback viable no matter how
    degraded the window is."""
    est_timed_per = warmup_per_s * (DETOK_SEGMENT_FACTOR if detok_enabled
                                    else 1.0)
    return time_left_s < max(
        150.0, MIN_TIMED_SEGMENTS * est_timed_per + FINALIZE_RESERVE_S
    )


def health_gate(deadline=None):
    """Refuse to time on a degraded chip: retry (sleep 90s, up to 5x) until
    the GEMM control clears HEALTH_MIN_TFS; give up and annotate after that
    (the driver still gets a number, flagged as degraded). Sleeps are capped
    against the global wall budget: never sleep past the point where too
    little budget remains to measure anything."""
    tfs = measure_health()
    if not (tfs == tfs):  # CPU: no gate
        return tfs, True
    for _ in range(5):
        if tfs >= HEALTH_MIN_TFS:
            return tfs, True
        if deadline is not None and time.time() + 90 > deadline - 600:
            break  # sleeping more would eat the budget a story needs
        print(f"bench: chip health {tfs:.0f} TF/s < {HEALTH_MIN_TFS:.0f} "
              "(degraded tunnel window) — waiting 90s", file=sys.stderr,
              flush=True)
        time.sleep(90)
        tfs = measure_health()
    return tfs, tfs >= HEALTH_MIN_TFS


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


def build_agent(preset, acfg):
    """Agent + randomized params, built ONCE and shared across modes
    (7B init through the tunnel costs tens of seconds per call)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from seed_story_tpu.data.tokenizer import TinyTokenizer
    from seed_story_tpu.models.agent import ContinuousLVLM

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

    def init_params():
        p = nn.meta.unbox(agent.init(jax.random.PRNGKey(0), **init_args)["params"])
        return _randomize_int8(p)

    params = jax.jit(init_params)()
    return agent, tok, params


def run_mode(agent, tok, params, acfg, preset, max_new, n_segments, window,
             mode, detokenize=None, deadline=None):
    """Measure one mode: ``mode`` is an int (N lockstep co-resident
    stories through StoryGenerator.generate_batch; 1 = the reference's
    one-story-at-a-time latency flow, gen_george.py:152) or ``"sink"``
    (run_sink: the KV cache threaded across segments, prefill only the
    new image's 66-token block).

    ``detokenize`` (interleaved mode): de-tokenizer hook called INSIDE the
    story loop per segment, exactly like the reference's
    adapter.generate inside the loop (gen_george.py:208-224) — requires
    the MLLM and SDXL to co-reside on the chip.

    Budget-aware: warmup and the timed story are consumed SEGMENT BY
    SEGMENT; either stops early when ``deadline`` nears, and the result
    carries honest annotations (warmup_truncated / truncated +
    methodology) instead of a dead driver.

    Returns a mode dict (segments_per_min, feats, annotations).
    """
    from seed_story_tpu.decode.generate import GenerateConfig, StoryGenerator
    from seed_story_tpu.pipelines.story_generation import (
        StoryGenerationPipeline,
        StoryPipelineConfig,
    )

    sink = mode == "sink"
    n_stories = 1 if sink else int(mode)

    def time_left():
        return float("inf") if deadline is None else deadline - time.time()

    # static-shape sizing: a window-W prompt maxes out around
    # start + W*(max_new + 70) tokens. Fine-grained 512-token prompt
    # buckets (instead of one story-max bucket) let EARLY segments run a
    # small prefill + a bucket-sized KV cache — decode reads the whole
    # capacity buffer every token, so segment 1 pays ~1.4GB/token instead
    # of the worst case ~3.1GB. Each bucket is its own compile; the
    # warmup pass below covers all of them (persistent cache across runs).
    max_prompt = 80 + window * (max_new + 70)
    # speculative prompt-lookup decode: worst case measured FREE at 7B
    # (verify pass == one decode pass, PERF.md), and the forced image
    # chains + random-weight repetition loops accept at high rate
    spec = int(os.environ.get("SEED_STORY_BENCH_SPEC", "4"))
    if sink:
        # threaded fixed-capacity cache: prompt + window live tokens +
        # decode headroom + the sink budget (~28 retained tokens per
        # evicted image — sink_cache.py)
        capacity = max_prompt + max_new + spec + 1 + 28 * (n_segments + 1)
    else:
        capacity = max_prompt + max_new
    gcfg = GenerateConfig(
        max_new_tokens=max_new,
        num_img_gen_tokens=acfg.num_img_out_tokens,
        # random weights emit EOS at the whim of the draw (any logits
        # perturbation re-rolls it — a kernel change once cut the story to
        # 1 segment); ban it so EVERY segment pays the full max_new-token
        # decode + image cost. This is the conservative direction: early
        # EOS would only make segments cheaper.
        eos_token_id=-1,
        cache_capacity=(capacity + 127) // 128 * 128,
        prompt_bucket=512 if preset == "full" else 128,
        force_boi_at=max_new - acfg.num_img_out_tokens - 8,
        max_context_images=window,
        # the sink flow threads the cache back (return_cache=True, ONE
        # donated cache alive); the re-prefill flow never reads it —
        # False saves a 7B-cache copy
        return_cache=sink,
        # round 4: the spec loop is batch-general (per-row accept counts),
        # so lockstep multi-story serving compounds batching x speculation;
        # round 5: commit blocks are contiguous, so it threads with sink too
        speculate_k=spec,
    )
    gen = StoryGenerator(agent, params, gcfg)

    rng = np.random.RandomState(0)

    def visual_encode(pixels):
        return rng.randn(1, acfg.num_vit_tokens, acfg.vit_dim).astype(np.float32)

    def mk_pipe(n_seg, detok):
        return StoryGenerationPipeline(
            tok, gen, visual_encode, detok,
            StoryPipelineConfig(
                story_len=n_seg + 1, window_size=window,
                num_img_in_tokens=acfg.num_img_in_tokens,
            ),
        )

    def story_iter(n_seg, detok):
        """Yields (n_new_segments, feats) batches — one per segment (B=1)
        or per lockstep round (B>1) — so the caller can budget-check
        between device calls."""
        if n_stories > 1:
            seeds = [
                (np.full((1, 3, 8, 8), s * 0.1, np.float32),
                 f"george the monkey went to the park chapter {s}")
                for s in range(n_stories)
            ]
            for r in mk_pipe(n_seg, detok).run_batch(seeds):
                live = [seg for seg in r if seg is not None]
                yield len(live), [np.asarray(s.image_features, np.float32)
                                  for s in live
                                  if s.image_features is not None]
        else:
            it = (mk_pipe(n_seg, detok).run_sink if sink
                  else mk_pipe(n_seg, detok).run)
            for seg in it(np.zeros((1, 3, 8, 8), np.float32),
                          "george the monkey went to the park"):
                yield 1, ([np.asarray(seg.image_features, np.float32)]
                          if seg.image_features is not None else [])

    # warmup: a story pass compiles every program the timed pass will hit
    # (compiles must not land inside the timed region). The de-tokenizer
    # hook is DISABLED here — its programs don't depend on the story
    # state, so one warmup image (done by the caller at build time)
    # covers it. The bucket set SATURATES once the window fills
    # (steady-state prompt lengths oscillate over a fixed set of
    # 512-token buckets as evictions keep pace with growth), so the
    # warmup story stops at window+3 segments — a 25-segment flagship run
    # warms in 11 segments, not 25. Budget: warmup aborts early (cold
    # cache, remote compiles) rather than eat the whole budget; the timed
    # story then reports the median of trailing segments instead.
    warm_target = min(n_segments, window + 3)
    warmup_done, warmup_truncated = 0, False
    t0 = time.perf_counter()
    for n_new, _ in story_iter(warm_target, None):
        warmup_done += n_new
        elapsed = time.perf_counter() - t0
        per = elapsed / max(warmup_done, 1)
        if warmup_must_stop(time_left(), per, detokenize is not None):
            warmup_truncated = warmup_done < warm_target * max(n_stories, 1)
            break
    warmup_s = time.perf_counter() - t0

    # timed story, consumed per segment with budget checks
    feats, seg_walls = [], []
    n_done = 0
    truncated = False
    t0 = time.perf_counter()
    t_prev = t0
    for n_new, f in story_iter(n_segments, detokenize):
        t_now = time.perf_counter()
        seg_walls.append((t_now - t_prev) / max(n_new, 1))
        t_prev = t_now
        n_done += n_new
        feats.extend(f)
        if time_left() < 1.3 * seg_walls[-1] + FINALIZE_RESERVE_S:
            truncated = n_done < n_segments * max(n_stories, 1)
            break
    total_s = time.perf_counter() - t0

    result = {
        "stories": mode if sink else n_stories,
        "segments": n_done,
        "total_s": round(total_s, 2),
        "warmup_s": round(warmup_s, 1),
        "feats": feats,
        "methodology": "full_story_wall",
    }
    if n_done == 0:
        result["error"] = "budget_exhausted_before_any_segment"
        return result
    if warmup_truncated and len(seg_walls) >= 3:
        # cold-compile stalls landed inside the timed region: the honest
        # steady-state number is the median of the trailing segments
        # (compile outliers are early and huge; the median of the back
        # half is clean once programs cache) — annotated, never silent
        tail = seg_walls[len(seg_walls) // 2:]
        result["segments_per_min"] = round(60.0 / float(np.median(tail)), 2)
        result["methodology"] = "steady_state_median"
        result["warmup_truncated"] = True
    elif warmup_truncated and len(seg_walls) == 2:
        # too few samples to median: the faster of the two segments is
        # the least compile-polluted — still an UNDERestimate of the
        # steady-state rate (conservative direction), flagged as such
        result["segments_per_min"] = round(60.0 / float(min(seg_walls)), 2)
        result["methodology"] = "min_seg_wall_low_confidence"
        result["warmup_truncated"] = True
    else:
        result["segments_per_min"] = round(n_done / total_s * 60.0, 2)
        if warmup_truncated:
            result["warmup_truncated"] = True
    if truncated:
        result["truncated_at"] = n_done
    return result


def _randomize_int8(params):
    """int8 kernels init to zeros; randomize so compute is non-degenerate
    (weights are random either way — no checkpoints in this environment;
    bytes moved, not values, set the speed). kernel_scale leaves drop from
    1.0 to ~3e-4 so the effective weights sit at init-like magnitude —
    scale-1.0 int8 weights (std ~73) blow the SDXL UNet up to NaN within
    one eval, which would hide real breakage behind a black image."""
    import jax
    import jax.numpy as jnp

    def rnd(path, x):
        if x.dtype == jnp.int8:
            key = jax.random.PRNGKey(hash(str(path)) % (2**31))
            return jax.random.randint(
                key, x.shape, -127, 128, jnp.int32
            ).astype(jnp.int8)
        name = getattr(path[-1], "key", None) if path else None
        if name == "kernel_scale":
            return jnp.full_like(x, 3e-4)
        return x

    return jax.tree_util.tree_map_with_path(rnd, params)


def build_sdxl_pipe(acfg, sdxl_steps, int8=False):
    """SDXL-base adapter + VAE behind the jitted sampling pipeline; with
    ``int8`` the UNet projections/convs are weight-only int8
    (models/sdxl/unet.py QUANTIZED_MODULES — ~2.4GB less streaming and
    footprint). Returns (pipe, neg_embeds)."""
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
        unet=SDXLUNetConfig(param_dtype=jnp.bfloat16, quantize=int8),
    )
    sdxl = SDXLAdapter(sdxl_cfg)
    b = 1
    sdxl_params = nn.meta.unbox(jax.jit(lambda: _randomize_int8(sdxl.init(
        jax.random.PRNGKey(2),
        noisy_latents=jnp.zeros((b, 128, 128, 4), jnp.bfloat16),
        timesteps=jnp.zeros((b,), jnp.int32),
        image_embeds=jnp.zeros((b, acfg.num_vit_tokens, acfg.vit_dim),
                               jnp.bfloat16),
        time_ids=jnp.ones((b, 6)),
        noise=jnp.zeros((b, 128, 128, 4), jnp.bfloat16))["params"]))())
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


def run_sdxl_phase(acfg, feats, sdxl_steps, int8=False):
    """Phase B: build SDXL, de-tokenize every recorded feature.

    Returns (timed_seconds, n_images).
    """
    pipe, neg = build_sdxl_pipe(acfg, sdxl_steps, int8)

    img = pipe.generate(feats[0], neg)[0]  # warmup / compile
    assert img is not None

    t0 = time.perf_counter()
    for f in feats:
        img = pipe.generate(f, neg)[0]
    dt = time.perf_counter() - t0
    return dt, len(feats)


def main():
    t_setup = time.time()
    budget = float(os.environ.get("SEED_STORY_BENCH_BUDGET_S", "1080"))
    deadline = t_setup + budget

    def time_left():
        return deadline - time.time()

    grace = float(os.environ.get("SEED_STORY_BENCH_WATCHDOG_GRACE_S", "90"))
    watchdog = arm_watchdog(deadline + grace)

    preset = os.environ.get("SEED_STORY_BENCH_PRESET", "full")
    # 25 segments: the reference's full story envelope (gen_george.py:205
    # story_len=25) at window-8 STEADY STATE — every segment past the 8th
    # runs the top prompt bucket + full-size KV cache. 8 reproduces the
    # round-3/4 comparable (cheaper early buckets pull the average up ~4%).
    n_segments = int(os.environ.get("SEED_STORY_BENCH_SEGMENTS", "25"))

    # a full axon-tunnel outage makes this import HANG (CLAUDE.md); say so
    # up front so a stalled driver log shows the cause
    print("bench: importing jax (axon) — a hang here means the TPU tunnel "
          "is down, not a framework issue", file=sys.stderr, flush=True)
    import jax

    # persistent compile cache: repeated driver runs skip the (slow) remote
    # TPU compiles entirely (the helper is TPU-only — persisted CPU AOT
    # executables are machine-pinned and can mis-execute on another host)
    from seed_story_tpu.utils.cache import enable_compile_cache

    cache_dir = enable_compile_cache()
    breakdown = {"import_s": round(time.time() - t_setup, 1)}

    def _cache_entries():
        try:
            return len(os.listdir(cache_dir)) if cache_dir else 0
        except OSError:
            return 0

    cache_before = _cache_entries()

    def phase(msg):
        print(f"bench: [{time.time() - t_setup:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    t0 = time.time()
    # chip-health gate: never time in a degraded tunnel window (round-3
    # lesson: BENCH_r03 was taxed ~2.5% by one; a 10x window would have
    # produced a 0.5 seg/min artifact with nothing flagging it). The
    # kernel gate (compiled-Pallas parity, ~6 programs) runs AFTER the
    # first headline is out: it is a correctness sentinel, not a timing
    # guard — cold it costs ~6 remote compiles (BENCH_r04 burned 591 s on
    # it before a single timed segment) and its failure mode is flagged
    # output, not polluted timing.
    health_pre, healthy = health_gate(deadline)
    breakdown["gates_s"] = round(time.time() - t0, 1)
    gate_status = "pending"

    int8 = (
        os.environ.get("SEED_STORY_BENCH_INT8", "1") == "1" and preset == "full"
    )
    kv_int8 = (
        os.environ.get("SEED_STORY_BENCH_KVINT8", "1") == "1" and preset == "full"
    )
    # weight-only int8 UNet (round 4) is OPT-IN: measured no latency win on
    # any headline mode and adds quantization-divergence risk with no FID
    # infra to validate — the bf16 UNet is the default (PERF.md round-5
    # "int8 UNet decision"); int8 remains the memory knob for the B=3
    # co-residency envelope.
    sdxl_int8 = (
        os.environ.get("SEED_STORY_BENCH_SDXL_INT8", "0") == "1"
        and preset == "full"
    )
    acfg, max_new = build(preset, int8, kv_int8)
    # int8 params (6.7GB) + int8 KV (window-8 5248-slot cache = 1.5GB)
    # fit the reference's TRUE window-8 envelope (gen_george.py:205-206)
    # on the one 16GB chip. bf16 params (13.5GB) only leave room for
    # window-4 — that mode keeps the old single-chip envelope.
    window = 8 if (int8 and kv_int8 and preset == "full") else 4

    use_sdxl = (
        os.environ.get("SEED_STORY_BENCH_SDXL", "1") == "1" and preset != "pico"
    )
    sdxl_steps = int(os.environ.get("SEED_STORY_BENCH_STEPS", "50"))

    # Modes, measured in ORDER (the headline JSON is emitted after each —
    # a budget kill mid-list still leaves the completed modes' lines).
    # Default "1": the reference-comparable B=1 latency flow is the
    # official number; B>=2 collapses at 25-segment steady state (PERF.md)
    # so serving modes are opt-in. "sink" = run_sink cache-threaded
    # generation. SEED_STORY_BENCH_STORIES pins one serving mode.
    stories_env = os.environ.get("SEED_STORY_BENCH_STORIES")
    if stories_env is not None:
        mode_list = [int(stories_env)]
    else:
        mode_list = [
            tok if tok == "sink" else int(tok)
            for tok in os.environ.get("SEED_STORY_BENCH_MODES", "1").split(",")
        ]

    def mode_stories(m):
        return 1 if m == "sink" else int(m)

    # Interleaved (co-resident): MLLM + per-story int8 KV caches + SDXL
    # share the 16GB chip and the de-tokenizer runs INSIDE the story loop
    # per segment — the reference's actual flow (gen_george.py:208-224).
    # Envelope: int8 MLLM 6.7GB + 1.5GB KV/story + SDXL (3.1GB int8 /
    # 5.5GB bf16) => up to 3 co-resident stories with the int8 UNet, 2
    # with bf16. Beyond that: two-phase fallback (decode all, then detok).
    interleaved_allowed = (
        os.environ.get("SEED_STORY_BENCH_INTERLEAVED", "1") == "1"
        and use_sdxl and preset != "pico" and int8 and kv_int8
    )
    max_coresident = 3 if sdxl_int8 else 2

    pipe = neg = None
    detok_time = [0.0]
    if interleaved_allowed and any(mode_stories(m) <= max_coresident
                                   for m in mode_list):
        t0 = time.time()
        phase("building SDXL pipe + warmup image")
        pipe, neg = retry_transient_oom(
            lambda: build_sdxl_pipe(acfg, sdxl_steps, sdxl_int8),
            "SDXL init", time_left)
        breakdown["sdxl_init_s"] = round(time.time() - t0, 1)
        # one warmup image compiles the sampling program (detok programs
        # don't depend on story state — the warmup story skips them)
        t1 = time.time()
        warm_feat = np.zeros((1, acfg.num_vit_tokens, acfg.vit_dim), np.float32)
        assert pipe.generate(warm_feat, neg)[0] is not None
        breakdown["sdxl_warm_image_s"] = round(time.time() - t1, 1)
        breakdown["sdxl_build_s"] = round(time.time() - t0, 1)

        def detok(f):
            t0 = time.perf_counter()
            img = pipe.generate(f, neg)[0]
            detok_time[0] += time.perf_counter() - t0
            return img
    else:
        detok = None

    t0 = time.time()
    phase("building agent + params (shared across modes)")
    agent, tok, params = retry_transient_oom(
        lambda: build_agent(preset, acfg), "agent init", time_left)
    jax.block_until_ready(params)
    breakdown["agent_init_s"] = round(time.time() - t0, 1)

    modes = []
    setup_s = None
    health_post = float("nan")

    def emit(final=False):
        """Print debug (stderr) then the headline (stdout) for the best
        mode so far — called after EVERY completed mode, so a wall-clock
        kill mid-run still leaves a parseable tail. The last stdout line
        is always the current best headline."""
        ok_modes = [m for m in modes if "error" not in m]
        if not ok_modes:
            return False
        best = max(ok_modes, key=lambda m: m["segments_per_min"])
        b1 = next((m for m in ok_modes
                   if m["stories"] == 1 and m["methodology"]), None)
        segments_per_min = best["segments_per_min"]

        detok_desc = (f"SDXL-base 1024px {sdxl_steps}-step CFG" if use_sdxl
                      else "detok stubbed")
        if sdxl_int8 and use_sdxl:
            detok_desc += " int8-UNet"
        if best["interleaved"]:
            detok_desc += " co-resident/interleaved"
        spec = int(os.environ.get("SEED_STORY_BENCH_SPEC", "4"))
        q = ("int8-weight" + ("+kv" if kv_int8 else "")
             + (f"+speculative(k={spec})" if spec else "") + " decode")
        scale = (f"7B {q}" if int8 else "7B") if preset == "full" else preset
        if best["stories"] == "sink":
            serve = "; sink-threaded KV cache (run_sink)"
        elif best["stories"] > 1:
            serve = (f"; {best['stories']} concurrent stories "
                     "(lockstep serving)")
        else:
            serve = ""
        result = {
            "metric": f"story segments/min (text+image; {scale} MLLM, "
                      f"{max_new} new tokens/segment, window-{window}, "
                      f"{n_segments}-segment story{serve}; "
                      f"{detok_desc}; single v5e chip; vs_baseline = ratio "
                      "to A100 reference-stack estimate "
                      f"{A100_REFERENCE_SEGMENTS_PER_MIN} seg/min)",
            "value": segments_per_min,
            "unit": "segments/min",
            "vs_baseline": round(
                segments_per_min / A100_REFERENCE_SEGMENTS_PER_MIN, 2),
            # honesty band: the A100 number is an estimate; these are the
            # ratios against its optimistic/pessimistic endpoints (module
            # docstring derivation)
            "vs_baseline_range": [
                round(segments_per_min / A100_REFERENCE_RANGE[1], 2),
                round(segments_per_min / A100_REFERENCE_RANGE[0], 2),
            ],
        }
        if b1 is not None and b1 is not best:
            # reference-comparable latency mode (the reference loops val
            # stories one at a time, gen_george.py:152)
            result["b1_segments_per_min"] = b1["segments_per_min"]
        if best["methodology"] != "full_story_wall":
            result["methodology"] = best["methodology"]
        if "truncated_at" in best:
            result["truncated_at"] = best["truncated_at"]
        if gate_status != "passed":
            result["kernel_gate"] = gate_status
        if healthy is False or (health_post == health_post
                                and health_post < HEALTH_MIN_TFS):
            result["health_degraded"] = True
        dbg = {"debug": {
            "modes": [{k: v for k, v in m.items() if k != "feats"}
                      for m in modes],
            "setup_s": round(setup_s, 1) if setup_s is not None else None,
            # warm vs cold: new persistent-cache entries written this run
            # (0 => every program came from the warm cache; setup_s is then
            # init + warmup decode, not remote compiles)
            "setup_breakdown": breakdown,
            "compile_cache_new_entries": _cache_entries() - cache_before,
            "budget_s": budget,
            "budget_left_s": round(time_left(), 1),
            # detok_s inside each mode is the in-loop SDXL time during the
            # timed story (interleaved) or the phase-B wall time (two-
            # phase); 0.0 never means "images skipped" anymore
            "sdxl_in_mllm": bool(best["interleaved"]),
            "sdxl_int8": sdxl_int8,
            "health_tfs_pre": None if health_pre != health_pre
            else round(health_pre, 1),
            "health_tfs_post": None if health_post != health_post
            else round(health_post, 1),
            "backend": jax.default_backend()}}
        print(json.dumps(dbg), file=sys.stderr, flush=True)
        # snapshot for the watchdog BEFORE printing: if a later phase hangs
        # past budget+grace, this exact line (annotated) is re-emitted
        _WATCHDOG["headline"] = json.dumps({**result, "watchdog_fired": True})
        print(json.dumps(result), flush=True)
        return True

    for mode in mode_list:
        n_stories = mode_stories(mode)
        interleaved = (interleaved_allowed and pipe is not None
                       and n_stories <= max_coresident)
        ok_so_far = any("error" not in m for m in modes)
        if ok_so_far and time_left() < 120:
            phase(f"mode {mode} SKIPPED (budget: {time_left():.0f}s left)")
            modes.append({"stories": mode, "error": "skipped_budget"})
            continue
        detok_time[0] = 0.0
        phase(f"mode {mode}: warmup story + timed story "
              f"({n_segments} segments, interleaved={interleaved})")
        try:
            m = run_mode(
                agent, tok, params, acfg, preset, max_new, n_segments,
                window, mode,
                detokenize=detok if interleaved else None,
                deadline=deadline,
            )
        except Exception as e:  # noqa: BLE001 — a marginal mode must not
            # kill the whole bench: the tunnel worker can briefly hold a
            # just-exited process's HBM (CLAUDE.md gotcha) and the highest
            # co-residency mode is memory-tight by design. Record and move
            # on; the final check fires only if EVERY mode failed.
            print(f"bench: mode {mode} failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr, flush=True)
            modes.append({"stories": mode, "error": f"{type(e).__name__}"})
            gc.collect()
            continue
        breakdown[f"warmup_{mode}_s"] = m.pop("warmup_s")
        if "error" in m:
            modes.append(m)
            continue
        feats = m.pop("feats")
        mllm_s = m["total_s"]
        if setup_s is None:
            # everything up to the first timed story: gates, inits, warmup
            setup_s = (time.time() - t_setup) - mllm_s

        if interleaved:
            sdxl_s, n_done = detok_time[0], m["segments"]
        elif use_sdxl and feats:
            if pipe is not None:
                # a co-resident pipe already exists (mixed mode list):
                # two-phase on it — NB stories > max_coresident next to a
                # resident SDXL is memory-tight; pin one mode via
                # SEED_STORY_BENCH_STORIES for the pure two-phase envelope
                t0 = time.perf_counter()
                for f in feats:
                    assert pipe.generate(f, neg)[0] is not None
                sdxl_s, n_done = time.perf_counter() - t0, len(feats)
            else:
                gc.collect()  # drop big temps before a separate init
                sdxl_s, n_done = run_sdxl_phase(
                    acfg, feats, sdxl_steps, sdxl_int8)
            mllm_s += sdxl_s  # two-phase: total = decode + detok phases
            m["segments"] = n_done
            m["total_s"] = round(mllm_s, 2)
            if m["methodology"] == "full_story_wall":
                m["segments_per_min"] = round(n_done / mllm_s * 60.0, 2)
            else:
                # steady_state_median measured the decode phase only; fold
                # the per-image detok cost into the per-segment time
                med = 60.0 / m["segments_per_min"]
                m["segments_per_min"] = round(
                    60.0 / (med + sdxl_s / max(n_done, 1)), 2)
        else:
            sdxl_s = 0.0

        m["detok_s"] = round(sdxl_s, 2)
        m["interleaved"] = interleaved
        modes.append(m)
        emit()

    # kernel gate after the headline exists: parity failure FLAGS the
    # emitted number (kernel_gate: failed) rather than timing dying cold
    if time_left() > 100 or cache_before > 0:
        phase("kernel gate (compiled-Pallas parity on this chip)")
        try:
            kernel_gate()
            gate_status = "passed"
        except SystemExit as e:
            print(f"bench: {e}", file=sys.stderr, flush=True)
            gate_status = "FAILED"
    else:
        gate_status = "skipped_budget"

    health_post = measure_health()
    # final emission: the LAST stdout line is the official headline (with
    # the post-run health + kernel-gate annotations folded in)
    emitted = emit(final=True)
    _WATCHDOG["done"] = True
    watchdog.cancel()
    if not emitted:
        raise SystemExit(f"bench: every mode failed: "
                         f"{[{k: v for k, v in m.items() if k != 'feats'} for m in modes]}")


if __name__ == "__main__":
    main()
