"""Sharded trainer on the 8-device virtual CPU mesh: loss decreases,
params/opt-state actually sharded, grad accumulation consistent."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from seed_story_tpu.models.agent import AgentConfig, ContinuousLVLM
from seed_story_tpu.parallel.mesh import make_mesh
from seed_story_tpu.train.stage2 import make_stage2_loss_fn
from seed_story_tpu.train.trainer import TrainConfig, Trainer


def _tiny_batch(bs=8, seq=64, n_per=2, key=0):
    acfg = AgentConfig.tiny()
    rng = np.random.RandomState(key)
    n = bs * n_per
    ids = rng.randint(100, 31000, size=(bs, seq)).astype(np.int32)
    ids_cmp = np.zeros((bs, seq), bool)
    ids_gen = np.zeros((bs, seq), bool)
    emb_cmp = np.zeros(n, bool)
    emb_gen = np.zeros(n, bool)
    for b in range(bs):
        ids_cmp[b, 4 : 4 + acfg.num_img_in_tokens] = True
        emb_cmp[b * n_per] = True
        ids_gen[b, 30 : 30 + acfg.num_img_out_tokens] = True
        emb_gen[b * n_per + 1] = True
    labels = np.where(np.arange(seq)[None] > 20, ids, -100).astype(np.int32)
    return acfg, {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((bs, seq), jnp.int32),
        "labels": jnp.asarray(labels),
        "image_embeds": jax.random.normal(
            jax.random.PRNGKey(key), (n, acfg.num_vit_tokens, acfg.vit_dim)
        ),
        "embeds_cmp_mask": jnp.asarray(emb_cmp),
        "embeds_gen_mask": jnp.asarray(emb_gen),
        "ids_cmp_mask": jnp.asarray(ids_cmp),
        "ids_gen_mask": jnp.asarray(ids_gen),
    }


def test_fsdp_training_loss_decreases():
    mesh = make_mesh(data=8, model=1)
    acfg, batch = _tiny_batch()
    agent = ContinuousLVLM(acfg)

    abstract = jax.eval_shape(
        lambda: agent.init(jax.random.PRNGKey(0), **{
            k: v for k, v in batch.items() if k != "image_embeds"
        }, image_embeds=batch["image_embeds"])
    )["params"]

    loss_fn = make_stage2_loss_fn(agent)
    tcfg = TrainConfig(
        learning_rate=2e-3, warmup_steps=2, training_steps=50,
        sharding_preset="fsdp",
    )
    trainer = Trainer(mesh, abstract, loss_fn, tcfg)

    with mesh:
        params = agent.init(jax.random.PRNGKey(0), **batch)["params"]
        params = nn.meta.unbox(params)
        state = trainer.init_state(params)

        # params actually sharded along 'data' (vocab axis of embed)
        embed_sharding = state.params["llm"]["model"]["embed_tokens"]["embedding"].sharding
        assert embed_sharding.spec == P("data", None), embed_sharding.spec

        losses = []
        rng = jax.random.PRNGKey(42)
        for i in range(8):
            state, metrics = trainer.step(state, batch, rng)
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_grad_accum_matches_mean():
    mesh = make_mesh(data=8, model=1)
    acfg, batch = _tiny_batch(bs=8)
    agent = ContinuousLVLM(acfg)
    abstract = jax.eval_shape(lambda: agent.init(jax.random.PRNGKey(0), **batch))["params"]
    loss_fn = make_stage2_loss_fn(agent)

    with mesh:
        params = nn.meta.unbox(agent.init(jax.random.PRNGKey(0), **batch)["params"])

        def fresh():  # init_state takes ownership (donation)
            return jax.tree_util.tree_map(jnp.array, params)

        # accum=2 over two identical microbatches == accum=1 on one
        t1 = Trainer(mesh, abstract, loss_fn, TrainConfig(grad_accum_steps=1, sharding_preset="dp"))
        s1 = t1.init_state(fresh())
        s1b, m1 = t1.step(s1, batch, jax.random.PRNGKey(0))

        stacked = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), batch)
        t2 = Trainer(mesh, abstract, loss_fn, TrainConfig(grad_accum_steps=2, sharding_preset="dp"))
        s2 = t2.init_state(fresh())
        s2b, m2 = t2.step(s2, stacked, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1b.params)
    l2 = jax.tree_util.tree_leaves(s2b.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_onechip_7b_recipe_trains_tiny():
    """The single-chip 7B recipe (scan_layers + ce_chunk_size + int8 frozen
    base) at pico scale: LoRA/norm/embed params update, frozen int8 kernels
    and their scales don't, loss decreases, metrics finite."""
    from seed_story_tpu.models.llama import LlamaConfig, lora_trainable_mask

    acfg, batch = _tiny_batch(bs=4)
    acfg = AgentConfig.tiny(
        llm=LlamaConfig.tiny(
            dtype=jnp.float32, lora_rank=2, remat=True,
            scan_layers=True, ce_chunk_size=16, quantize_base=True,
        )
    )
    agent = ContinuousLVLM(acfg)
    mesh = make_mesh(data=4, model=1)
    abstract = jax.eval_shape(
        lambda: agent.init(jax.random.PRNGKey(0), **batch)
    )["params"]
    mask = lora_trainable_mask(nn.meta.unbox(abstract))
    for k in ("input_resampler", "output_resampler"):
        mask[k] = jax.tree_util.tree_map(lambda _: True, mask[k])
    trainer = Trainer(
        mesh, abstract, make_stage2_loss_fn(agent),
        TrainConfig(learning_rate=1e-3, warmup_steps=1, training_steps=10,
                    sharding_preset="fsdp"),
        trainable_mask=mask,
    )
    with mesh:
        params = nn.meta.unbox(
            jax.jit(lambda: agent.init(jax.random.PRNGKey(0), **batch)["params"])()
        )
        # randomize the int8 kernels (init is zeros) and give them a sane
        # per-channel scale (ones-init scales make |W|~16 and saturate
        # attention — grads vanish)
        def fill(path, x):
            if x.dtype == jnp.int8:
                return (
                    np.random.RandomState(0)
                    .randint(-127, 128, x.shape)
                    .astype(np.int8)
                )
            name = str(path[-1].key) if hasattr(path[-1], "key") else ""
            if name == "kernel_scale":
                return jnp.full_like(x, 0.02 / 127.0)
            return x

        params = jax.tree_util.tree_map_with_path(fill, params)
        kern0 = np.asarray(
            params["llm"]["model"]["layers"]["self_attn"]["q_proj"]["kernel"]
        )
        state = trainer.init_state(params)
        losses = []
        for i in range(6):
            state, m = trainer.step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses
        p = state.params["llm"]["model"]["layers"]["self_attn"]["q_proj"]
        # frozen int8 base + its scale untouched; LoRA moved
        np.testing.assert_array_equal(np.asarray(p["kernel"]), kern0)
        assert p["kernel"].dtype == jnp.int8
        assert float(np.abs(np.asarray(p["lora_b"])).max()) > 0.0
