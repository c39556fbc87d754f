"""Tensor-parallel generation on the virtual mesh must equal single-device
generation token-for-token."""

import jax
import jax.numpy as jnp
import numpy as np

from seed_story_tpu.data.tokenizer import BOI_TOKEN_ID, EOI_TOKEN_ID, FIRST_IMG_TOKEN_ID
from seed_story_tpu.decode.generate import GenerateConfig, StoryGenerator
from seed_story_tpu.models.agent import AgentConfig, ContinuousLVLM
from seed_story_tpu.parallel.mesh import make_mesh


def test_tp_generation_matches_single_device():
    acfg = AgentConfig.tiny()
    agent = ContinuousLVLM(acfg)
    nq_in = acfg.num_img_in_tokens
    prompt = (
        [1, 500, 501, BOI_TOKEN_ID]
        + [FIRST_IMG_TOKEN_ID + i for i in range(nq_in)]
        + [EOI_TOKEN_ID, 600, BOI_TOKEN_ID]
    )
    ids_cmp = np.zeros(len(prompt), bool)
    ids_cmp[4 : 4 + nq_in] = True
    image_embeds = jax.random.normal(
        jax.random.PRNGKey(0), (1, acfg.num_vit_tokens, acfg.vit_dim)
    )

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
    import flax.linen as nn

    params = nn.meta.unbox(agent.init(jax.random.PRNGKey(1), **init_args)["params"])
    gcfg = GenerateConfig(
        max_new_tokens=20, num_img_gen_tokens=acfg.num_img_out_tokens,
        cache_capacity=256, prompt_bucket=32,
    )

    single = StoryGenerator(agent, params, gcfg)
    out1 = single.generate(np.array(prompt), image_embeds,
                           np.ones((1,), bool), ids_cmp)

    mesh = make_mesh(data=4, model=2)
    with mesh:
        tp = StoryGenerator(agent, params, gcfg, mesh=mesh,
                            sharding_preset="fsdp_tp")
        # params really are sharded over the model axis
        qk = tp.params["llm"]["model"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
        assert "model" in str(qk.sharding.spec)
        out2 = tp.generate(np.array(prompt), image_embeds,
                           np.ones((1,), bool), ids_cmp)

    np.testing.assert_array_equal(out1["generate_ids"], out2["generate_ids"])
    assert out1["has_img_output"] == out2["has_img_output"]
    if out1["img_gen_feat"] is not None:
        np.testing.assert_allclose(
            np.asarray(out1["img_gen_feat"], np.float32),
            np.asarray(out2["img_gen_feat"], np.float32),
            rtol=5e-2, atol=5e-2,
        )


def test_tp_shard_mapped_pallas_prefill(monkeypatch):
    """shard_attention_axis: prefill attention runs the Pallas kernel inside
    a shard_map on the LOCAL head shard (no KV regather) — results must
    still match the unsharded XLA path token-for-token."""
    import dataclasses

    import flax.linen as nn

    acfg = AgentConfig.tiny()
    nq_in = acfg.num_img_in_tokens
    prompt = (
        [1, 500, 501, BOI_TOKEN_ID]
        + [FIRST_IMG_TOKEN_ID + i for i in range(nq_in)]
        + [EOI_TOKEN_ID, 600, BOI_TOKEN_ID]
    )
    ids_cmp = np.zeros(len(prompt), bool)
    ids_cmp[4 : 4 + nq_in] = True
    image_embeds = jax.random.normal(
        jax.random.PRNGKey(0), (1, acfg.num_vit_tokens, acfg.vit_dim)
    )
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
    agent = ContinuousLVLM(acfg)
    params = nn.meta.unbox(agent.init(jax.random.PRNGKey(1), **init_args)["params"])
    gcfg = GenerateConfig(
        max_new_tokens=16, num_img_gen_tokens=acfg.num_img_out_tokens,
        cache_capacity=256, prompt_bucket=32,
    )
    out1 = StoryGenerator(agent, params, gcfg).generate(
        np.array(prompt), image_embeds, np.ones((1,), bool), ids_cmp
    )

    # TP agent: sharded attention + the real Pallas kernel (interpret mode
    # on CPU) inside the shard_map
    tp_acfg = dataclasses.replace(
        acfg, llm=dataclasses.replace(acfg.llm, shard_attention_axis="model")
    )
    tp_agent = ContinuousLVLM(tp_acfg)
    monkeypatch.setenv("SEED_STORY_ATTN_IMPL", "pallas_interpret")
    mesh = make_mesh(data=4, model=2)
    with mesh:
        tp = StoryGenerator(tp_agent, params, gcfg, mesh=mesh,
                            sharding_preset="fsdp_tp")
        out2 = tp.generate(np.array(prompt), image_embeds,
                           np.ones((1,), bool), ids_cmp)

    np.testing.assert_array_equal(out1["generate_ids"], out2["generate_ids"])
