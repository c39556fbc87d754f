"""Minimum end-to-end slice (SURVEY §7.3): pico agent drives a full story
loop — text + forced image blocks + feature feedback + window eviction —
with a stub de-tokenizer."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from seed_story_tpu.data.tokenizer import TinyTokenizer
from seed_story_tpu.decode.generate import GenerateConfig, StoryGenerator
from seed_story_tpu.models.agent import AgentConfig, ContinuousLVLM
from seed_story_tpu.pipelines.story_generation import (
    StoryGenerationPipeline,
    StoryPipelineConfig,
)


def test_story_pipeline_end_to_end():
    acfg = AgentConfig.tiny()
    agent = ContinuousLVLM(acfg)
    tok = TinyTokenizer()

    seq = 64
    n = 1
    init_args = dict(
        input_ids=jnp.ones((1, seq), jnp.int32),
        attention_mask=jnp.ones((1, seq), jnp.int32),
        labels=jnp.zeros((1, seq), jnp.int32),
        image_embeds=jnp.zeros((n, acfg.num_vit_tokens, acfg.vit_dim)),
        embeds_gen_mask=jnp.ones((n,), bool),
        embeds_cmp_mask=jnp.ones((n,), bool),
        ids_gen_mask=jnp.zeros((1, seq), bool).at[0, 10:19].set(True),
        ids_cmp_mask=jnp.zeros((1, seq), bool).at[0, 30:34].set(True),
    )
    params = agent.init(jax.random.PRNGKey(7), **init_args)["params"]

    gcfg = GenerateConfig(
        max_new_tokens=32,
        num_img_gen_tokens=acfg.num_img_out_tokens,  # 9 (!= in tokens: 4)
        cache_capacity=512,
        prompt_bucket=32,
    )
    # pico "ViT": deterministic features from pixel stats
    def visual_encode(pixels):
        x = np.asarray(pixels).mean()
        rng = np.random.RandomState(int(abs(x) * 100) % 1000)
        return rng.randn(1, acfg.num_vit_tokens, acfg.vit_dim).astype(np.float32)

    frames = []

    def detokenize(feats):
        img = np.full((8, 8, 3), len(frames), np.uint8)
        frames.append(img)
        return img

    # NOTE: pipeline feeds GENERATED img features back as context; their
    # token count for comprehension is num_img_in_tokens (4 here)
    pipe = StoryGenerationPipeline(
        tok,
        StoryGenerator(agent, params, gcfg),
        visual_encode,
        detokenize,
        StoryPipelineConfig(
            story_len=6, window_size=3,
            num_img_in_tokens=acfg.num_img_in_tokens,
        ),
    )

    pixels = np.zeros((1, 3, 8, 8), np.float32)
    segments = list(pipe.run(pixels, "a brave squirrel found a map"))

    assert len(segments) >= 1
    # With an untrained model the story may end after any segment; if images
    # were produced, they must line up with the yielded segments.
    n_img_segments = sum(1 for s in segments if s.image is not None)
    assert n_img_segments == len(frames)
    for s in segments:
        assert isinstance(s.text, str)
        if s.image_features is not None:
            assert s.image_features.shape == (1, acfg.num_vit_tokens, acfg.vit_dim)


def test_story_pipeline_run_batch_matches_sequential():
    """run_batch (lockstep stories) must produce the same texts/features as
    running each story through run() by itself."""
    acfg = AgentConfig.tiny()
    agent = ContinuousLVLM(acfg)
    tok = TinyTokenizer()

    seq = 64
    init_args = dict(
        input_ids=jnp.ones((1, seq), jnp.int32),
        attention_mask=jnp.ones((1, seq), jnp.int32),
        labels=jnp.zeros((1, seq), jnp.int32),
        image_embeds=jnp.zeros((1, acfg.num_vit_tokens, acfg.vit_dim)),
        embeds_gen_mask=jnp.ones((1,), bool),
        embeds_cmp_mask=jnp.ones((1,), bool),
        ids_gen_mask=jnp.zeros((1, seq), bool).at[0, 10:19].set(True),
        ids_cmp_mask=jnp.zeros((1, seq), bool).at[0, 30:34].set(True),
    )
    params = agent.init(jax.random.PRNGKey(7), **init_args)["params"]

    gcfg = GenerateConfig(
        max_new_tokens=24,
        num_img_gen_tokens=acfg.num_img_out_tokens,
        cache_capacity=512,
        prompt_bucket=32,
        force_boi_at=8,  # untrained weights: force an image every segment
        max_context_images=3,
        return_cache=False,
    )

    def visual_encode(pixels):
        x = np.asarray(pixels).mean()
        rng = np.random.RandomState(int(abs(x) * 100) % 1000)
        return rng.randn(1, acfg.num_vit_tokens, acfg.vit_dim).astype(np.float32)

    def mk_pipe():
        return StoryGenerationPipeline(
            tok, StoryGenerator(agent, params, gcfg), visual_encode, None,
            StoryPipelineConfig(
                story_len=4, window_size=3,
                num_img_in_tokens=acfg.num_img_in_tokens,
            ),
        )

    seeds = [
        (np.zeros((1, 3, 8, 8), np.float32), "a brave squirrel found a map"),
        (np.full((1, 3, 8, 8), 0.5, np.float32), "george rode the blue train"),
    ]
    refs = [list(mk_pipe().run(px, cap)) for px, cap in seeds]
    rounds = list(mk_pipe().run_batch(seeds))

    got = [[r[i] for r in rounds if r[i] is not None] for i in range(len(seeds))]
    for story_ref, story_got in zip(refs, got):
        assert len(story_got) == len(story_ref)
        for a, b in zip(story_ref, story_got):
            assert a.text == b.text
            assert (a.image_features is None) == (b.image_features is None)
            if a.image_features is not None:
                np.testing.assert_allclose(
                    np.asarray(a.image_features, np.float32),
                    np.asarray(b.image_features, np.float32),
                    rtol=2e-2, atol=2e-2,
                )


def test_story_pipeline_window_eviction_runs():
    """Force the model to always emit an image (prompt automaton trigger is
    not guaranteed with random weights) by checking the window arithmetic
    directly on the prompt strings."""
    from seed_story_tpu.data.tokenizer import EOI_TOKEN, image_comprehension_string

    prompt = "cap0" + image_comprehension_string(4)
    for i in range(1, 5):
        prompt = prompt + f"[INST]text{i}" + image_comprehension_string(4)
    # emulate eviction of the oldest image span
    eoi_idx = prompt.index(EOI_TOKEN)
    stripped = prompt[eoi_idx + len(EOI_TOKEN) + len("[INST]"):]
    assert stripped.startswith("text1")
    assert stripped.count(EOI_TOKEN) == 4


@pytest.mark.slow
def test_story_pipeline_25_segments_window8():
    """The reference's full story envelope (story_len 25, window 8,
    gen_george.py:205-239) runs functionally end to end on the pico
    config: 24 image segments, monotone indices, and the context never
    grows past the window-8 prompt budget (steady-state eviction)."""
    acfg = AgentConfig.tiny()
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
        ids_gen_mask=jnp.zeros((1, seq), bool).at[0, 10:19].set(True),
        ids_cmp_mask=jnp.zeros((1, seq), bool).at[0, 30:34].set(True),
    )
    params = agent.init(jax.random.PRNGKey(7), **init_args)["params"]
    gcfg = GenerateConfig(
        max_new_tokens=24,
        num_img_gen_tokens=acfg.num_img_out_tokens,
        cache_capacity=1024,
        prompt_bucket=64,
        force_boi_at=8,  # random weights: force every segment's image
        max_context_images=8,
    )

    def visual_encode(pixels):
        return np.zeros((1, acfg.num_vit_tokens, acfg.vit_dim), np.float32)

    pipe = StoryGenerationPipeline(
        tok, StoryGenerator(agent, params, gcfg), visual_encode, None,
        StoryPipelineConfig(story_len=25, window_size=8,
                            num_img_in_tokens=acfg.num_img_in_tokens),
    )
    segs = list(pipe.run(np.zeros((1, 3, 8, 8), np.float32), "a long story"))
    with_feats = [s for s in segs if s.image_features is not None]
    assert len(with_feats) == 24, len(segs)
    assert [s.index for s in with_feats] == list(range(1, 25))
    # steady state: every prompt stays within the window-8 token budget
    max_ctx = max(s.context_tokens for s in segs)
    per_seg = gcfg.max_new_tokens + 3 * acfg.num_img_in_tokens  # generous
    assert max_ctx <= 16 + 8 * per_seg, (max_ctx, per_seg)
    # eviction really engaged (contexts stopped growing)
    late = [s.context_tokens for s in segs[-8:]]
    assert max(late) - min(late) <= per_seg, late


def test_story_pipeline_run_sink_25_segments():
    """Sink-threaded GENERATION (run_sink, beyond the reference): the
    25-segment window-8 story runs end to end with the KV cache carried
    across segments — per-segment prefill is only the 66-token
    comprehension block, old segments leave via sink evictions. Checks:
    full story, first segment identical to run() (the flows share the
    first generate call), deterministic, and the threaded cache stays
    within its fixed capacity at steady state."""
    acfg = AgentConfig.tiny()
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
        ids_gen_mask=jnp.zeros((1, seq), bool).at[0, 10:19].set(True),
        ids_cmp_mask=jnp.zeros((1, seq), bool).at[0, 30:34].set(True),
    )
    params = agent.init(jax.random.PRNGKey(7), **init_args)["params"]
    gcfg = GenerateConfig(
        max_new_tokens=24,
        num_img_gen_tokens=acfg.num_img_out_tokens,
        cache_capacity=1024,
        prompt_bucket=64,
        force_boi_at=8,
        max_context_images=8,
        return_cache=True,
    )

    def visual_encode(pixels):
        return np.zeros((1, acfg.num_vit_tokens, acfg.vit_dim), np.float32)

    gen = StoryGenerator(agent, params, gcfg)
    pipe = StoryGenerationPipeline(
        tok, gen, visual_encode, None,
        StoryPipelineConfig(story_len=25, window_size=8,
                            num_img_in_tokens=acfg.num_img_in_tokens),
    )
    start = np.zeros((1, 3, 8, 8), np.float32)
    segs = list(pipe.run_sink(start, "a long story"))
    with_feats = [s for s in segs if s.image_features is not None]
    assert len(with_feats) == 24, len(segs)
    assert [s.index for s in with_feats] == list(range(1, 25))

    # the first generate call is shared with run(): same first segment
    ref_first = next(iter(pipe.run(start, "a long story")))
    assert segs[0].text == ref_first.text

    # deterministic end to end
    segs2 = list(pipe.run_sink(start, "a long story"))
    assert [s.text for s in segs] == [s.text for s in segs2]
    for a, b in zip(with_feats, (s for s in segs2
                                 if s.image_features is not None)):
        np.testing.assert_array_equal(a.image_features, b.image_features)

    # threaded-cache occupancy stays within the fixed capacity; under the
    # reference img_head_tail policy the sink permanently retains ~24
    # tokens per evicted image (12 around <img> + 12 around </img>), so
    # late-story contexts grow LINEARLY at exactly that slope — assert the
    # real bound, not saturation (sink_cache.py module docstring)
    assert max(s.context_tokens for s in segs) <= gcfg.cache_capacity
    late = [s.context_tokens for s in segs[-6:]]
    slopes = [b - a for a, b in zip(late, late[1:])]
    assert all(0 <= d <= 28 for d in slopes), late


def test_story_pipeline_run_sink_speculative_matches_plain():
    """speculate_k composes with the threaded sink cache (the commit blocks
    land contiguously at the per-row cache length, so the committed prefix
    the sink truncates to is always valid KV): same story byte for byte."""
    acfg = AgentConfig.tiny()
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
        ids_gen_mask=jnp.zeros((1, seq), bool).at[0, 10:19].set(True),
        ids_cmp_mask=jnp.zeros((1, seq), bool).at[0, 30:34].set(True),
    )
    params = agent.init(jax.random.PRNGKey(7), **init_args)["params"]

    def gcfg(spec):
        return GenerateConfig(
            max_new_tokens=24,
            num_img_gen_tokens=acfg.num_img_out_tokens,
            cache_capacity=1024,
            prompt_bucket=64,
            force_boi_at=8,
            max_context_images=8,
            return_cache=True,
            speculate_k=spec,
        )

    def visual_encode(pixels):
        return np.zeros((1, acfg.num_vit_tokens, acfg.vit_dim), np.float32)

    def mk(spec):
        return StoryGenerationPipeline(
            tok, StoryGenerator(agent, params, gcfg(spec)), visual_encode,
            None,
            StoryPipelineConfig(story_len=10, window_size=4,
                                num_img_in_tokens=acfg.num_img_in_tokens),
        )

    start = np.zeros((1, 3, 8, 8), np.float32)
    plain = list(mk(0).run_sink(start, "a long story"))
    spec = list(mk(4).run_sink(start, "a long story"))
    assert [s.text for s in plain] == [s.text for s in spec]
    for a, b in zip(plain, spec):
        assert (a.image_features is None) == (b.image_features is None)
        if a.image_features is not None:
            np.testing.assert_allclose(
                np.asarray(a.image_features, np.float32),
                np.asarray(b.image_features, np.float32),
                rtol=2e-2, atol=2e-2,
            )


def test_story_pipeline_run_sink_bounded_sink():
    """sink_max_tokens (beyond-reference knob) caps sink growth: the same
    25-segment story saturates — late contexts stop growing — and story
    length becomes truly capacity-bounded."""
    acfg = AgentConfig.tiny()
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
        ids_gen_mask=jnp.zeros((1, seq), bool).at[0, 10:19].set(True),
        ids_cmp_mask=jnp.zeros((1, seq), bool).at[0, 30:34].set(True),
    )
    params = agent.init(jax.random.PRNGKey(7), **init_args)["params"]
    gcfg = GenerateConfig(
        max_new_tokens=24,
        num_img_gen_tokens=acfg.num_img_out_tokens,
        cache_capacity=1024,
        prompt_bucket=64,
        force_boi_at=8,
        max_context_images=8,
        return_cache=True,
    )

    def visual_encode(pixels):
        return np.zeros((1, acfg.num_vit_tokens, acfg.vit_dim), np.float32)

    pipe = StoryGenerationPipeline(
        tok, StoryGenerator(agent, params, gcfg), visual_encode, None,
        StoryPipelineConfig(story_len=25, window_size=8,
                            num_img_in_tokens=acfg.num_img_in_tokens,
                            sink_max_tokens=100),
    )
    segs = list(pipe.run_sink(np.zeros((1, 3, 8, 8), np.float32),
                              "a long story"))
    with_feats = [s for s in segs if s.image_features is not None]
    assert len(with_feats) == 24, len(segs)
    # strict saturation: once the cap engages, per-segment context is flat
    late = [s.context_tokens for s in segs[-6:]]
    assert max(late) - min(late) == 0, late
