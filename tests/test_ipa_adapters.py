"""IP-Adapter processors + auxiliary adapters: decoupled-attention math,
SD-1.5-style UNet (no added conds), latent-image conditioning."""

import jax
import jax.numpy as jnp
import numpy as np

from seed_story_tpu.models.ipa_adapters import (
    EditAdapterConfig,
    IPAdapterConfig,
    IPAdapterSD,
    IPCrossAttention,
    SDXLAdapterWithLatentImage,
)
from seed_story_tpu.models.sdxl.unet import SDXLUNetConfig


def test_ip_cross_attention_decoupling():
    m = IPCrossAttention(query_dim=32, heads=2, dim_head=16,
                         text_context_len=5, scale=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 7, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5 + 3, 32))
    params = m.init(jax.random.PRNGKey(2), x, ctx)["params"]
    assert "to_k_ip" in params and "to_v_ip" in params
    # scale=0 -> image tokens contribute nothing; changing them is a no-op
    out0 = m.apply({"params": params}, x, ctx)
    ctx2 = ctx.at[:, 5:].set(123.0)
    out1 = m.apply({"params": params}, x, ctx2)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), rtol=1e-6)

    # scale=1 -> they do contribute
    m1 = IPCrossAttention(query_dim=32, heads=2, dim_head=16,
                          text_context_len=5, scale=1.0)
    out2 = m1.apply({"params": params}, x, ctx)
    out3 = m1.apply({"params": params}, x, ctx2)
    assert np.abs(np.asarray(out2) - np.asarray(out3)).max() > 1e-3


def test_ip_adapter_sd15_style_unet():
    cfg = IPAdapterConfig(
        unet=SDXLUNetConfig(
            block_out_channels=(16, 32),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            transformer_layers_per_block=(1, 1),
            attention_head_dim=8,
            cross_attention_dim=24,
            addition_embed_type=None,
            norm_num_groups=8,
            dtype=jnp.float32,
        ),
        image_embedding_dim=48,
        num_image_tokens=4,
        resampler_depth=1,
    )
    m = IPAdapterSD(cfg)
    args = dict(
        noisy_latents=jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4)),
        timesteps=jnp.array([5]),
        text_embeds=jax.random.normal(jax.random.PRNGKey(1), (1, 7, 24)),
        image_embeds=jax.random.normal(jax.random.PRNGKey(2), (1, 10, 48)),
        noise=jnp.zeros((1, 8, 8, 4)),
    )
    params = m.init(jax.random.PRNGKey(3), **args)["params"]
    # SD-1.5 style: no add_embedding in the tree
    assert "add_embedding" not in params["unet"]
    out = m.apply({"params": params}, **args)
    assert np.isfinite(float(out["total_loss"]))
    assert out["noise_pred"].shape == (1, 8, 8, 4)


def test_latent_image_adapter():
    cfg = EditAdapterConfig(
        unet=SDXLUNetConfig(
            in_channels=8,
            block_out_channels=(16, 32, 32),
            transformer_layers_per_block=(1, 1, 1),
            attention_head_dim=8,
            cross_attention_dim=32,
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=8 * 6 + 64,
            pooled_projection_dim=64,
            norm_num_groups=8,
            dtype=jnp.float32,
        )
    )
    m = SDXLAdapterWithLatentImage(cfg)
    args = dict(
        noisy_latents=jnp.zeros((1, 8, 8, 4)),
        latent_image=jnp.ones((1, 8, 8, 4)),
        timesteps=jnp.array([3]),
        prompt_embeds=jnp.zeros((1, 6, 32)),
        pooled=jnp.zeros((1, 64)),
        time_ids=jnp.ones((1, 6)),
        noise=jnp.zeros((1, 8, 8, 4)),
    )
    params = m.init(jax.random.PRNGKey(0), **args)["params"]
    out = m.apply({"params": params}, **args)
    assert out["noise_pred"].shape == (1, 8, 8, 4)
    assert np.isfinite(float(out["total_loss"]))


def test_sd21_edit_adapter():
    from seed_story_tpu.models.ipa_adapters import (
        SD21EditAdapterConfig,
        SD21Text2ImageAndEditAdapter,
        sd21_edit_trainable_mask,
    )
    from seed_story_tpu.models.ipa_resampler import IPAResampler

    unet = SDXLUNetConfig(
        in_channels=8,
        block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        transformer_layers_per_block=(1, 1),
        attention_head_dim=8,
        cross_attention_dim=24,
        addition_embed_type=None,
        norm_num_groups=8,
        dtype=jnp.float32,
    )
    cfg = SD21EditAdapterConfig(unet=unet)
    m = SD21Text2ImageAndEditAdapter(
        cfg,
        resampler=IPAResampler(dim=24, depth=1, num_queries=4,
                               embedding_dim=40, output_dim=24),
    )
    args = dict(
        noisy_latents=jnp.zeros((1, 8, 8, 8)),  # 8ch: latents + latent image
        timesteps=jnp.array([5]),
        image_embeds=jnp.zeros((1, 3, 16)),  # unused (reference :706)
        text_embeds=jax.random.normal(jax.random.PRNGKey(1), (1, 7, 40)),
        noise=jnp.zeros((1, 8, 8, 4)),
    )
    params = m.init(jax.random.PRNGKey(0), **args)["params"]
    # SD2.x: no added time/text conditioning in the tree
    assert "add_embedding" not in params["unet"]
    out = m.apply({"params": params}, **args)
    assert out["noise_pred"].shape == (1, 8, 8, 4)
    assert np.isfinite(float(out["total_loss"]))

    mask = sd21_edit_trainable_mask(params, unet)
    flat = {
        "/".join(str(k.key) for k in path): v
        for path, v in jax.tree_util.tree_flatten_with_path(mask)[0]
    }
    # resampler + conv_in + attention q/out trainable
    assert all(v for k, v in flat.items() if k.startswith("resampler/"))
    assert all(v for k, v in flat.items() if "conv_in" in k)
    assert all(v for k, v in flat.items() if "/to_q/" in k or "/to_out_0/" in k)
    # non-attention down block (index 1) resnets trainable
    assert all(v for k, v in flat.items() if k.startswith("unet/down_blocks_1_resnets"))
    # attention down block (index 0) resnets frozen; to_k/to_v frozen
    assert not any(v for k, v in flat.items() if k.startswith("unet/down_blocks_0_resnets"))
    assert not any(v for k, v in flat.items() if "/to_k/" in k or "/to_v/" in k)


def test_ip_adapter_sd_pipeline_end_to_end():
    """IPAdapterSDPipeline (reference IPAdapterSDPipe, adapter_modules.py:
    140-269): zero-image CFG negatives, injected text embeds, scale knob,
    jitted Euler loop + VAE decode -> uint8 images."""
    from seed_story_tpu.models.sdxl.vae import AutoencoderKL, VAEConfig
    from seed_story_tpu.pipelines.ipa_pipeline import (
        IPASampleConfig,
        IPAdapterSDPipeline,
    )

    cfg = IPAdapterConfig(
        unet=SDXLUNetConfig(
            block_out_channels=(16, 32),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            transformer_layers_per_block=(1, 1),
            attention_head_dim=8,
            cross_attention_dim=24,
            addition_embed_type=None,
            norm_num_groups=8,
            dtype=jnp.float32,
        ),
        image_embedding_dim=48,
        num_image_tokens=4,
        resampler_depth=1,
    )
    m = IPAdapterSD(cfg)
    params = m.init(
        jax.random.PRNGKey(0),
        noisy_latents=jnp.zeros((1, 4, 4, 4)),
        timesteps=jnp.array([5]),
        text_embeds=jnp.zeros((1, 7, 24)),
        image_embeds=jnp.zeros((1, 10, 48)),
        noise=jnp.zeros((1, 4, 4, 4)),
    )["params"]
    vae = AutoencoderKL(VAEConfig(
        block_out_channels=(16, 32), norm_num_groups=8, dtype=jnp.float32))
    vae_params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))["params"]

    def visual_encode(pixels):
        # stand-in frozen encoder: deterministic features from pixel stats
        rng = np.random.RandomState(int(abs(np.asarray(pixels).mean()) * 100) % 97)
        return rng.randn(pixels.shape[0], 10, 48).astype(np.float32)

    def encode_text(prompts):
        rng = np.random.RandomState(len("".join(prompts)) % 97)
        return rng.randn(len(prompts), 7, 24).astype(np.float32)

    pipe = IPAdapterSDPipeline(
        m, params, vae, vae_params, encode_text, visual_encode,
        cfg=IPASampleConfig(height=16, width=16, num_inference_steps=2,
                            vae_scale=2),
    )
    img_in = np.random.RandomState(0).randn(1, 3, 16, 16).astype(np.float32)
    imgs = pipe.generate(img_in, prompt="a dog", scale=0.8, seed=3)
    assert imgs.shape == (1, 16, 16, 3) and imgs.dtype == np.uint8
    # scale changes the conditioning context -> different samples
    imgs2 = pipe.generate(img_in, prompt="a dog", scale=0.0, seed=3)
    assert np.abs(imgs.astype(int) - imgs2.astype(int)).max() > 0
