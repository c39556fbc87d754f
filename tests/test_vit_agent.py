"""ViT / resampler / agent tests.

Parity harness builds equivalent modules from plain torch.nn (no reference
code) to validate the torch semantics we must match for weight porting:
nn.MultiheadAttention fused projections, erf-GELU, pre-LN blocks.
Scatter/gather helpers are validated against numpy boolean-indexing
semantics (what torch advanced indexing does in reference models.py:54,74).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seed_story_tpu.models.agent import (
    AgentConfig,
    ContinuousLVLM,
    cosine_loss,
    gather_image_hidden,
    scatter_image_embeds,
)
from seed_story_tpu.models.resampler import MultiheadAttention, Resampler
from seed_story_tpu.models.vit import ViTConfig, VisionTransformerWithAttnPool


def test_mha_matches_torch():
    torch = pytest.importorskip("torch")
    e, h, b, lq, lk = 64, 4, 2, 5, 9
    rng = np.random.RandomState(0)
    q = rng.randn(b, lq, e).astype(np.float32)
    k = rng.randn(b, lk, e).astype(np.float32)
    v = rng.randn(b, lk, e).astype(np.float32)

    tm = torch.nn.MultiheadAttention(e, h, batch_first=True)
    with torch.no_grad():
        want = tm(torch.tensor(q), torch.tensor(k), torch.tensor(v))[0].numpy()

    m = MultiheadAttention(e, h)
    params = {
        "in_proj_weight": jnp.asarray(tm.in_proj_weight.detach().numpy()),
        "in_proj_bias": jnp.asarray(tm.in_proj_bias.detach().numpy()),
        "out_proj": {
            "kernel": jnp.asarray(tm.out_proj.weight.detach().numpy()).T,
            "bias": jnp.asarray(tm.out_proj.bias.detach().numpy()),
        },
    }
    got = m.apply({"params": params}, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_resampler_shapes_and_determinism():
    r = Resampler(grid_size=4, embed_dim=64, num_heads=4, kv_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 25, 32))
    params = r.init(jax.random.PRNGKey(1), x)["params"]
    out = r.apply({"params": params}, x)
    assert out.shape == (3, 16, 64)
    out2 = r.apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_vit_tiny_forward():
    cfg = ViTConfig.tiny(dtype=jnp.float32)
    vit = VisionTransformerWithAttnPool(cfg)
    pixels = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 56, 56))
    params = vit.init(jax.random.PRNGKey(1), pixels)["params"]
    out = vit.apply({"params": params}, pixels)
    assert out.shape == (2, cfg.n_queries, cfg.output_dim)
    assert not np.isnan(np.asarray(out)).any()


def _np_scatter(input_embeds, image_embeds_lm, ids_mask, embeds_mask):
    out = np.array(input_embeds)
    src = np.array(image_embeds_lm)[np.array(embeds_mask)].reshape(-1, out.shape[-1])
    out[np.array(ids_mask)] = src
    return out


def test_scatter_matches_numpy_boolean_assignment():
    rng = np.random.RandomState(1)
    b, s, d, n, nq = 2, 20, 8, 4, 3
    input_embeds = rng.randn(b, s, d).astype(np.float32)
    img = rng.randn(n, nq, d).astype(np.float32)
    embeds_mask = np.array([True, False, True, False])
    ids_mask = np.zeros((b, s), bool)
    ids_mask[0, 2:5] = True  # 3 slots -> image 0
    ids_mask[1, 10:13] = True  # 3 slots -> image 2
    got = scatter_image_embeds(
        jnp.asarray(input_embeds), jnp.asarray(img),
        jnp.asarray(ids_mask), jnp.asarray(embeds_mask),
    )
    want = _np_scatter(input_embeds, img, ids_mask, embeds_mask)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_gather_matches_numpy_boolean_indexing():
    rng = np.random.RandomState(2)
    b, s, d, n, nq = 2, 20, 8, 5, 4
    hidden = rng.randn(b, s, d).astype(np.float32)
    embeds_mask = np.array([False, True, False, False, True])
    ids_mask = np.zeros((b, s), bool)
    ids_mask[0, 1:5] = True  # image 1's block
    ids_mask[1, 7:11] = True  # image 4's block
    got = np.asarray(gather_image_hidden(
        jnp.asarray(hidden), jnp.asarray(ids_mask), jnp.asarray(embeds_mask), nq
    ))
    want_sel = hidden[ids_mask].reshape(2, nq, d)  # torch semantics
    np.testing.assert_allclose(got[1], want_sel[0], rtol=1e-6)
    np.testing.assert_allclose(got[4], want_sel[1], rtol=1e-6)
    assert (got[0] == 0).all() and (got[2] == 0).all() and (got[3] == 0).all()


def test_cosine_loss_masked():
    rng = np.random.RandomState(3)
    rec = rng.randn(3, 4, 8).astype(np.float32)
    tgt = rng.randn(3, 4, 8).astype(np.float32)
    valid = np.array([True, False, True])
    got = float(cosine_loss(jnp.asarray(rec), jnp.asarray(tgt), jnp.asarray(valid)))

    def cos_np(a, b):
        a = a / np.linalg.norm(a, axis=-1, keepdims=True)
        b = b / np.linalg.norm(b, axis=-1, keepdims=True)
        return (1 - (a * b).sum(-1)).mean()

    want = (cos_np(rec[0], tgt[0]) + cos_np(rec[2], tgt[2])) / 2
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_agent_batch():
    from seed_story_tpu.data.story_telling import StoryDecodeConfig, collate, decode_long_story_sample, flatten_images
    from seed_story_tpu.data.tokenizer import TinyTokenizer

    tok = TinyTokenizer()
    cfg = StoryDecodeConfig(
        story_len=4, max_length=128, max_images=4,
        num_img_in_tokens=4, num_img_out_tokens=9,
    )
    rec = {
        "images": [f"i{i}.jpg" for i in range(4)],
        "captions": [f"caption number {i} of the story" for i in range(4)],
    }

    class FakeImage:
        size = (256, 256)

    samples = [
        decode_long_story_sample(
            rec, image_dir="", tokenizer=tok, cfg=cfg,
            image_transform=lambda im: np.zeros((3, 8, 8), np.float32),
            num_image_given=k, image_opener=lambda p: FakeImage(),
        )
        for k in (0, 2)
    ]
    assert all(s is not None for s in samples)
    return flatten_images(collate(samples))


def test_agent_forward_and_grads(tiny_agent_batch):
    batch = tiny_agent_batch
    acfg = AgentConfig.tiny()
    agent = ContinuousLVLM(acfg)

    n = batch["embeds_cmp_mask"].shape[0]
    image_embeds = jax.random.normal(
        jax.random.PRNGKey(0), (n, acfg.num_img_out_tokens, acfg.vit_dim)
    )
    args = dict(
        input_ids=jnp.asarray(batch["input_ids"]),
        attention_mask=jnp.asarray(batch["attention_mask"]),
        labels=jnp.asarray(batch["labels"]),
        image_embeds=image_embeds,
        embeds_gen_mask=jnp.asarray(batch["embeds_gen_mask"]),
        embeds_cmp_mask=jnp.asarray(batch["embeds_cmp_mask"]),
        ids_gen_mask=jnp.asarray(batch["ids_gen_mask"]),
        ids_cmp_mask=jnp.asarray(batch["ids_cmp_mask"]),
    )
    params = agent.init(jax.random.PRNGKey(1), **args)["params"]
    out = agent.apply({"params": params}, **args)
    assert np.isfinite(float(out["total_loss"]))
    assert float(out["rec_loss"]) > 0
    assert out["recon_image_embeds"].shape == (n, acfg.num_img_out_tokens, acfg.vit_dim)

    def loss_fn(p):
        return agent.apply({"params": p}, **args)["total_loss"]

    grads = jax.grad(loss_fn)(params)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_align_generation_agent(tiny_agent_batch):
    """SEEDLLaMAAlignGeneration (reference models.py:233-336): rec-loss
    only, gradients reach ONLY the output resampler (frozen LLM)."""
    from seed_story_tpu.models.agent import (
        SEEDLLaMAAlignGeneration,
        align_trainable_mask,
    )

    batch = tiny_agent_batch
    acfg = AgentConfig.tiny()
    model = SEEDLLaMAAlignGeneration(acfg)
    n = batch["embeds_cmp_mask"].shape[0]
    image_embeds = jax.random.normal(
        jax.random.PRNGKey(0), (n, acfg.num_img_out_tokens, acfg.vit_dim)
    )
    args = dict(
        input_ids=jnp.asarray(batch["input_ids"]),
        attention_mask=jnp.asarray(batch["attention_mask"]),
        labels=jnp.asarray(batch["labels"]),
        image_embeds=image_embeds,
        embeds_gen_mask=jnp.asarray(batch["embeds_gen_mask"]),
        embeds_cmp_mask=jnp.asarray(batch["embeds_cmp_mask"]),
        ids_gen_mask=jnp.asarray(batch["ids_gen_mask"]),
        ids_cmp_mask=jnp.asarray(batch["ids_cmp_mask"]),
    )
    params = model.init(jax.random.PRNGKey(1), **args)["params"]
    out = model.apply({"params": params}, **args)
    assert float(out["total_loss"]) == float(out["rec_loss"])
    assert np.isfinite(float(out["rec_loss"]))

    grads = jax.grad(
        lambda p: model.apply({"params": p}, **args)["total_loss"]
    )(params)
    llm_norm = jnp.sqrt(sum(
        jnp.sum(jnp.square(g))
        for g in jax.tree_util.tree_leaves(grads["llm"])
    ))
    res_norm = jnp.sqrt(sum(
        jnp.sum(jnp.square(g))
        for g in jax.tree_util.tree_leaves(grads["output_resampler"])
    ))
    assert float(llm_norm) == 0.0  # stop_gradient == requires_grad_(False)
    assert float(res_norm) > 0

    mask = align_trainable_mask(params)
    import flax

    flat = flax.traverse_util.flatten_dict(mask)
    assert all(v == (k[0] == "output_resampler") for k, v in flat.items())
