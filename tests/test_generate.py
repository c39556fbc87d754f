"""Decode stack: automaton forcing, jit generation loop, cache reuse."""

import jax
import jax.numpy as jnp
import numpy as np

from seed_story_tpu.data.tokenizer import (
    BOI_TOKEN_ID,
    EOI_TOKEN_ID,
    FIRST_IMG_TOKEN_ID,
)
from seed_story_tpu.decode.generate import GenerateConfig, StoryGenerator
from seed_story_tpu.decode.logits_processors import ImageTokenAutomaton
from seed_story_tpu.models.agent import AgentConfig, ContinuousLVLM


def test_automaton_forces_chain():
    vocab = 32128
    auto = ImageTokenAutomaton(vocab, num_img_gen_tokens=4)
    scores = jnp.zeros((1, vocab)).at[0, 777].set(5.0)

    # after <img>: forced to <img_00000>
    out = auto(jnp.array([BOI_TOKEN_ID]), scores)
    assert int(out.argmax()) == FIRST_IMG_TOKEN_ID
    # after <img_00003> (last img token of 4): forced to </img>
    out = auto(jnp.array([FIRST_IMG_TOKEN_ID + 3]), scores)
    assert int(out.argmax()) == EOI_TOKEN_ID
    # after </img>: no force; img ids soft-suppressed to 0.0, 777 wins
    out = auto(jnp.array([EOI_TOKEN_ID]), scores)
    assert int(out.argmax()) == 777
    assert float(out[0, FIRST_IMG_TOKEN_ID]) == 0.0
    # normal token: img ids suppressed
    out = auto(jnp.array([777]), scores)
    assert float(out[0, FIRST_IMG_TOKEN_ID + 2]) == 0.0
    assert int(out.argmax()) == 777


def _mk_generator(max_new=24):
    acfg = AgentConfig.tiny()
    agent = ContinuousLVLM(acfg)
    nq_in = acfg.num_img_in_tokens  # 4
    prompt = (
        [1, 500, 501]
        + [BOI_TOKEN_ID]
        + [FIRST_IMG_TOKEN_ID + i for i in range(nq_in)]
        + [EOI_TOKEN_ID]
        + [600, BOI_TOKEN_ID]  # ends with <img> -> chain trigger
    )
    p = len(prompt)
    ids_cmp = np.zeros(p, bool)
    ids_cmp[4 : 4 + nq_in] = True
    n = 1
    image_embeds = jax.random.normal(
        jax.random.PRNGKey(0), (n, acfg.num_vit_tokens, acfg.vit_dim)
    )
    batch_args = dict(
        input_ids=jnp.asarray([prompt], jnp.int32),
        image_embeds=image_embeds,
        ids_cmp_mask=jnp.asarray([ids_cmp]),
        embeds_cmp_mask=jnp.ones((n,), bool),
    )
    params = agent.init(
        jax.random.PRNGKey(1),
        method=agent.embed_with_images,
        **batch_args,
    )["params"]
    # init covers only embed path params; init full module instead
    full_args = dict(
        input_ids=jnp.asarray([prompt + [0] * (64 - p)], jnp.int32)[:, :64],
        attention_mask=jnp.ones((1, 64), jnp.int32),
        labels=jnp.zeros((1, 64), jnp.int32),
        image_embeds=image_embeds,
        embeds_gen_mask=jnp.ones((n,), bool),
        embeds_cmp_mask=jnp.ones((n,), bool),
        ids_gen_mask=jnp.zeros((1, 64), bool).at[0, 10:19].set(True),
        ids_cmp_mask=jnp.zeros((1, 64), bool),
    )
    params = agent.init(jax.random.PRNGKey(1), **full_args)["params"]

    gcfg = GenerateConfig(
        max_new_tokens=max_new,
        num_img_gen_tokens=acfg.num_img_out_tokens,  # 9
        cache_capacity=256,
        prompt_bucket=16,
    )
    gen = StoryGenerator(agent, params, gcfg)
    return gen, prompt, ids_cmp, image_embeds, np.ones((1,), bool)


def test_generate_forced_image_block():
    gen, prompt, ids_cmp, image_embeds, embeds_cmp = _mk_generator()
    out = gen.generate(np.array(prompt), image_embeds, embeds_cmp, ids_cmp)
    toks = out["generate_ids"]
    # prompt ends with <img> -> the 9-token chain + </img> must open the output
    want = [FIRST_IMG_TOKEN_ID + i for i in range(9)] + [EOI_TOKEN_ID]
    assert list(toks[:10]) == want, toks[:20]
    assert out["has_img_output"]
    assert out["img_gen_feat"].shape == (1, 9, 128)


def test_generate_deterministic_and_bucket_invariant():
    gen, prompt, ids_cmp, image_embeds, embeds_cmp = _mk_generator()
    o1 = gen.generate(np.array(prompt), image_embeds, embeds_cmp, ids_cmp)
    o2 = gen.generate(np.array(prompt), image_embeds, embeds_cmp, ids_cmp)
    np.testing.assert_array_equal(o1["generate_ids"], o2["generate_ids"])

    # different bucket (longer pad) must not change the result
    gen.cfg.prompt_bucket = 32
    gen._compiled.clear()
    o3 = gen.generate(np.array(prompt), image_embeds, embeds_cmp, ids_cmp)
    np.testing.assert_array_equal(o1["generate_ids"], o3["generate_ids"])
    np.testing.assert_allclose(
        np.asarray(o1["img_gen_feat"], np.float32),
        np.asarray(o3["img_gen_feat"], np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_sampling_temperature_top_p():
    """temperature/top_p sampling: seed-deterministic, seed-sensitive, and
    the forced image-token chain survives sampling."""
    from seed_story_tpu.decode.generate import top_p_filter

    # nucleus filter math: keep smallest prefix reaching the mass
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    kept = np.asarray(top_p_filter(logits, 0.75))
    assert np.isfinite(kept[0, :2]).all() and not np.isfinite(kept[0, 2:]).any()
    kept = np.asarray(top_p_filter(logits, 0.95))
    assert np.isfinite(kept[0, :3]).all() and not np.isfinite(kept[0, 3]).any()

    gen, prompt, ids_cmp, image_embeds, embeds_cmp = _mk_generator()
    gen.cfg.temperature = 0.9
    gen.cfg.top_p = 0.9
    gen._compiled.clear()
    a1 = gen.generate(np.array(prompt), image_embeds, embeds_cmp, ids_cmp,
                      seed=7)
    a2 = gen.generate(np.array(prompt), image_embeds, embeds_cmp, ids_cmp,
                      seed=7)
    b1 = gen.generate(np.array(prompt), image_embeds, embeds_cmp, ids_cmp,
                      seed=8)
    np.testing.assert_array_equal(a1["generate_ids"], a2["generate_ids"])
    assert not np.array_equal(a1["generate_ids"], b1["generate_ids"])
    # prompt ends with <img>: the forced 9-token chain + </img> must still
    # open the output under sampling
    want = [FIRST_IMG_TOKEN_ID + i for i in range(9)] + [EOI_TOKEN_ID]
    assert list(a1["generate_ids"][:10]) == want
    assert list(b1["generate_ids"][:10]) == want
    gen.cfg.temperature = 0.0
    gen.cfg.top_p = 1.0


def test_speculative_decode_matches_greedy():
    """Prompt-lookup speculative decoding must be BYTE-IDENTICAL to plain
    greedy decode — tokens, num_generated, has_img, features. The prompt
    ends with <img>, so the forced 9-token image chain runs through the
    verifier (drafted from the prompt's earlier chain at 100% accept)."""
    gen, prompt, ids_cmp, image_embeds, embeds_cmp = _mk_generator()
    gen.cfg.return_cache = False
    gen._compiled.clear()
    ref = gen.generate(np.array(prompt), image_embeds, embeds_cmp, ids_cmp)

    for k in (3, 4):
        gen.cfg.speculate_k = k
        gen._compiled.clear()
        got = gen.generate(np.array(prompt), image_embeds, embeds_cmp, ids_cmp)
        assert got["num_generated"] == ref["num_generated"], k
        np.testing.assert_array_equal(got["generate_ids"], ref["generate_ids"])
        assert got["has_img_output"] == ref["has_img_output"]
        np.testing.assert_allclose(
            np.asarray(got["img_gen_feat"], np.float32),
            np.asarray(ref["img_gen_feat"], np.float32),
            rtol=2e-2, atol=2e-2,
        )
    gen.cfg.speculate_k = 0

    # force_boi_at interplay: the forced <img> lands at the same absolute
    # position and the forced chain verifies identically
    gen.cfg.force_boi_at = 12
    gen._compiled.clear()
    ref_f = gen.generate(np.array(prompt), image_embeds, embeds_cmp, ids_cmp)
    gen.cfg.speculate_k = 4
    gen._compiled.clear()
    got_f = gen.generate(np.array(prompt), image_embeds, embeds_cmp, ids_cmp)
    np.testing.assert_array_equal(got_f["generate_ids"], ref_f["generate_ids"])
    assert got_f["num_generated"] == ref_f["num_generated"]
    gen.cfg.speculate_k = 0
    gen.cfg.force_boi_at = None


def test_generate_batch_matches_individual():
    """generate_batch (B stories in lockstep) must reproduce each story's
    individual greedy output exactly — different prompt lengths per row."""
    gen, prompt, ids_cmp, image_embeds, embeds_cmp = _mk_generator()
    gen.cfg.return_cache = False
    gen._compiled.clear()

    # story 2: shorter prompt, no trailing <img>, different image features
    prompt2 = prompt[:4] + prompt[4 : 4 + 4] + [EOI_TOKEN_ID, 700, 701]
    ids_cmp2 = np.zeros(len(prompt2), bool)
    ids_cmp2[4:8] = True
    image_embeds2 = jax.random.normal(
        jax.random.PRNGKey(7), image_embeds.shape
    )

    ref1 = gen.generate(np.array(prompt), image_embeds, embeds_cmp, ids_cmp)
    ref2 = gen.generate(np.array(prompt2), image_embeds2, embeds_cmp, ids_cmp2)

    outs = gen.generate_batch([
        dict(input_ids=np.array(prompt), image_embeds=image_embeds,
             embeds_cmp_mask=embeds_cmp, ids_cmp_mask=ids_cmp),
        dict(input_ids=np.array(prompt2), image_embeds=image_embeds2,
             embeds_cmp_mask=embeds_cmp, ids_cmp_mask=ids_cmp2),
    ])
    for ref, got in zip((ref1, ref2), outs):
        assert got["num_generated"] == ref["num_generated"]
        np.testing.assert_array_equal(got["generate_ids"], ref["generate_ids"])
        assert got["has_img_output"] == ref["has_img_output"]
        if ref["has_img_output"]:
            np.testing.assert_allclose(
                np.asarray(got["img_gen_feat"], np.float32),
                np.asarray(ref["img_gen_feat"], np.float32),
                rtol=2e-2, atol=2e-2,
            )


def test_speculative_batch_matches_sequential():
    """Batched speculative decode (VERDICT r3 #9): B stories in lockstep
    with per-row accept counts must be byte-identical to each story's
    individual SPECULATIVE output — which is itself pinned byte-identical
    to plain greedy above. Rows finish at different steps (different
    prompt lengths + different eos timing), exercising the frozen-row
    ncommit=0 path."""
    gen, prompt, ids_cmp, image_embeds, embeds_cmp = _mk_generator()
    gen.cfg.return_cache = False

    prompt2 = prompt[:4] + prompt[4 : 4 + 4] + [EOI_TOKEN_ID, 700, 701]
    ids_cmp2 = np.zeros(len(prompt2), bool)
    ids_cmp2[4:8] = True
    image_embeds2 = jax.random.normal(
        jax.random.PRNGKey(7), image_embeds.shape
    )
    stories = [
        dict(input_ids=np.array(prompt), image_embeds=image_embeds,
             embeds_cmp_mask=embeds_cmp, ids_cmp_mask=ids_cmp),
        dict(input_ids=np.array(prompt2), image_embeds=image_embeds2,
             embeds_cmp_mask=embeds_cmp, ids_cmp_mask=ids_cmp2),
    ]

    for k in (3, 4):
        gen.cfg.speculate_k = k
        gen._compiled.clear()
        refs = [
            gen.generate(s["input_ids"], s["image_embeds"],
                         s["embeds_cmp_mask"], s["ids_cmp_mask"])
            for s in stories
        ]
        outs = gen.generate_batch(stories)
        for ref, got in zip(refs, outs):
            assert got["num_generated"] == ref["num_generated"], k
            np.testing.assert_array_equal(
                got["generate_ids"], ref["generate_ids"])
            assert got["has_img_output"] == ref["has_img_output"]
            if ref["has_img_output"]:
                np.testing.assert_allclose(
                    np.asarray(got["img_gen_feat"], np.float32),
                    np.asarray(ref["img_gen_feat"], np.float32),
                    rtol=2e-2, atol=2e-2,
                )
    gen.cfg.speculate_k = 0
