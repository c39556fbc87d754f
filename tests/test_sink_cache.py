"""Attention-sink cache: retained-token sets vs a host-side simulation of
the reference policy, and the full visualization pipeline on a pico agent."""

import jax
import jax.numpy as jnp
import numpy as np

from seed_story_tpu.data.tokenizer import TinyTokenizer
from seed_story_tpu.decode.generate import GenerateConfig, StoryGenerator
from seed_story_tpu.decode.sink_cache import (
    FIRST_SINK,
    SinkKVCacheManager,
    _compact,
)
from seed_story_tpu.models.agent import AgentConfig, ContinuousLVLM
from seed_story_tpu.models.llama import KVCache, LlamaConfig
from seed_story_tpu.pipelines.story_visualization import (
    StoryVisualizationPipeline,
    VisPipelineConfig,
)


def _position_coded_cache(cfg, capacity, live_len):
    """cache.k[l][..., slot, 0] == slot index -> we can read retained ids."""
    cache = KVCache.create(cfg, batch=1, capacity=capacity, dtype=jnp.float32)
    pos = tuple(
        jnp.broadcast_to(
            jnp.arange(capacity, dtype=jnp.float32)[None, None, :, None],
            layer.shape,
        )
        for layer in cache.k
    )
    return KVCache(k=pos, v=pos, length=jnp.array([live_len], jnp.int32))


def _simulate_reference_policy(tokens_kept, boi, eoi, first_eviction):
    """What the reference retains for one eviction, in live coordinates."""
    keep = []
    if first_eviction:
        keep += list(range(FIRST_SINK))
    keep += list(range(max(0, boi - 4), boi + 8))
    keep += list(range(max(0, eoi - 8), eoi + 4))
    sink = keep
    tail = list(range(eoi + 1, len(tokens_kept)))
    return sink, tail


def test_eviction_retained_set_matches_reference_policy():
    cfg = LlamaConfig.tiny()
    capacity, live_len = 128, 100
    cache = _position_coded_cache(cfg, capacity, live_len)
    mgr = SinkKVCacheManager(capacity=capacity)

    boi, eoi = 20, 30
    cache2, dropped = mgr.evict_image_span(cache, boi, eoi, live_len)
    assert dropped == eoi + 1

    sink, tail = _simulate_reference_policy(list(range(live_len)), boi, eoi, True)
    expected = sink + tail
    got = np.asarray(cache2.k[0][0, 0, : len(expected), 0]).astype(int).tolist()
    assert got == expected
    assert mgr.sink_len == len(sink)
    assert int(cache2.length[0]) == len(expected)

    # second eviction: positions are live-relative (sink excluded)
    live_len2 = len(tail)
    boi2, eoi2 = 12, 22  # in live coords
    cache3, dropped2 = mgr.evict_image_span(cache2, boi2, eoi2, live_len2)
    assert dropped2 == eoi2 + 1
    # expected: old sink slots stay; new sink windows come from live coords
    prev = expected
    s = len(sink)
    keep2 = list(range(s))
    keep2 += list(range(s + boi2 - 4, s + boi2 + 8))
    keep2 += list(range(s + eoi2 - 8, s + eoi2 + 4))
    new_sink_len = len(keep2)
    keep2 += list(range(s + eoi2 + 1, s + live_len2))
    expected2 = [prev[i] for i in keep2]
    got2 = np.asarray(cache3.k[0][0, 0, : len(expected2), 0]).astype(int).tolist()
    assert got2 == expected2
    assert mgr.sink_len == new_sink_len


def test_eviction_max_sink_drops_oldest_windows():
    """max_sink cap: once the sink exceeds the cap, the OLDEST per-image
    windows are dropped; the first-4 StreamingLLM block always survives."""
    cfg = LlamaConfig.tiny()
    capacity = 256
    mgr = SinkKVCacheManager(capacity=capacity, max_sink=40)

    live_len = 100
    cache = _position_coded_cache(cfg, capacity, live_len)
    # eviction 1: sink = 4 first + 24 window = 28 (under the cap)
    cache, dropped = mgr.evict_image_span(cache, 20, 30, live_len)
    assert mgr.sink_len == 28
    first4 = np.asarray(cache.k[0][0, 0, :4, 0]).astype(int).tolist()
    assert first4 == [0, 1, 2, 3]
    win1 = np.asarray(cache.k[0][0, 0, 4:28, 0]).astype(int).tolist()

    # eviction 2: 28 + 24 = 52 > 40 -> the eviction-1 window (24) drops,
    # leaving 4 first + the NEW 24-token window = 28
    live_len2 = live_len - dropped
    cache, dropped2 = mgr.evict_image_span(cache, 12, 22, live_len2)
    assert mgr.sink_len == 28
    got_first4 = np.asarray(cache.k[0][0, 0, :4, 0]).astype(int).tolist()
    assert got_first4 == [0, 1, 2, 3]
    win2 = np.asarray(cache.k[0][0, 0, 4:28, 0]).astype(int).tolist()
    assert win2 != win1  # the retained window is the NEW one
    # new windows come from the live region, which starts at original
    # position 31 (eviction 1 dropped [0, 30])
    assert all(w >= 31 for w in win2)


def test_vis_pipeline_with_sink_eviction():
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
        max_new_tokens=20,
        num_img_gen_tokens=acfg.num_img_out_tokens,
        cache_capacity=1024,
        prompt_bucket=32,
        force_boi_at=2,  # untrained weights: force an image every turn
    )
    gen = StoryGenerator(agent, params, gcfg)

    def visual_encode(pixels):
        return np.random.RandomState(0).randn(
            1, acfg.num_vit_tokens, acfg.vit_dim
        ).astype(np.float32)

    images = []

    def detokenize(feats):
        images.append(np.zeros((4, 4, 3), np.uint8))
        return images[-1]

    pipe = StoryVisualizationPipeline(
        tok, gen, visual_encode, detokenize,
        VisPipelineConfig(story_len=8, window_size=3,
                          num_img_in_tokens=acfg.num_img_in_tokens),
    )
    texts = [f"scene {i} of the story" for i in range(10)]
    segments = list(pipe.run(np.zeros((1, 3, 8, 8), np.float32),
                             "once upon a time", texts))
    # story_len 8 with guaranteed images -> 7 segments, evictions happened
    assert len(segments) == 7, len(segments)
    assert len(images) == 7
    assert all(s.image is not None for s in segments)


def test_vis_pipeline_25_segments():
    """The headline capability: a 25-segment story through the sink cache
    (window 8 -> 16 evictions; sink grows 4 + 24/eviction)."""
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
        max_new_tokens=16,
        num_img_gen_tokens=acfg.num_img_out_tokens,
        cache_capacity=2048,
        prompt_bucket=64,
        force_boi_at=1,
    )
    gen = StoryGenerator(agent, params, gcfg)

    def visual_encode(pixels):
        return np.zeros((1, acfg.num_vit_tokens, acfg.vit_dim), np.float32)

    pipe = StoryVisualizationPipeline(
        tok, gen, visual_encode, lambda f: np.zeros((2, 2, 3), np.uint8),
        VisPipelineConfig(story_len=25, window_size=8,
                          num_img_in_tokens=acfg.num_img_in_tokens),
    )
    texts = [f"scene {i}" for i in range(30)]
    segments = list(pipe.run(np.zeros((1, 3, 8, 8), np.float32), "start", texts))
    assert len(segments) == 24, len(segments)
    # context (sink + live) stayed bounded well below the cache capacity
    assert segments[-1].context_tokens < gcfg.cache_capacity
