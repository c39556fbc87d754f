"""IP-Adapter attention processors + auxiliary adapters.

JAX counterparts of the reference's present-but-unused components
(SURVEY §2.3): the decoupled cross-attention IP processors
(/root/reference/src/models_ipa/attention_processor.py:82-414) and the
edit/latent-image adapter variants
(adapter_modules.py:29-269,471-920). They complete the component
inventory and give IP-Adapter-style image prompting on our UNet stack.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import mha
from .ipa_resampler import IPAResampler
from .sdxl.unet import SDXLUNetConfig, UNet2DConditionModel

Dtype = Any


class IPCrossAttention(nn.Module):
    """Decoupled cross-attention (reference IPAttnProcessor(2_0)):

    encoder states = [text tokens (text_context_len) ; image tokens];
    text uses the frozen to_k/to_v, image uses separate to_k_ip/to_v_ip;
    output = attn_text + scale * attn_image.
    """

    query_dim: int
    heads: int
    dim_head: int
    text_context_len: int = 77
    scale: float = 1.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, encoder_hidden_states):
        inner = self.heads * self.dim_head
        b, lq, _ = x.shape
        text, image = (
            encoder_hidden_states[:, : self.text_context_len],
            encoder_hidden_states[:, self.text_context_len :],
        )

        def dense(name):
            return nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            param_dtype=self.param_dtype, name=name)

        def heads_first(t):
            return t.reshape(b, t.shape[1], self.heads, self.dim_head
                             ).transpose(0, 2, 1, 3)

        q = heads_first(dense("to_q")(x))
        k_t = heads_first(dense("to_k")(text))
        v_t = heads_first(dense("to_v")(text))
        k_i = heads_first(dense("to_k_ip")(image))
        v_i = heads_first(dense("to_v_ip")(image))

        out_t = mha(q, k_t, v_t, causal=False)
        out_i = mha(q, k_i, v_i, causal=False)
        out = out_t + self.scale * out_i
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, inner)
        return nn.Dense(self.query_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="to_out_0")(out)


@dataclasses.dataclass(frozen=True)
class IPAdapterConfig:
    unet: SDXLUNetConfig = dataclasses.field(
        default_factory=lambda: SDXLUNetConfig(
            block_out_channels=(320, 640, 1280, 1280),
            down_block_types=("CrossAttnDownBlock2D",) * 3 + ("DownBlock2D",),
            up_block_types=("UpBlock2D",) + ("CrossAttnUpBlock2D",) * 3,
            transformer_layers_per_block=(1, 1, 1, 1),
            cross_attention_dim=768,
            addition_embed_type=None,
        )
    )
    image_embedding_dim: int = 1024  # CLIP image embed
    num_image_tokens: int = 4
    resampler_depth: int = 4
    scale: float = 1.0


class IPAdapterSD(nn.Module):
    """IP-Adapter for an SD-1.5-style UNet (reference IPAdapterSD,
    adapter_modules.py:29-130): a small perceiver projects image embeds to
    ``num_image_tokens`` prompt tokens appended after the text context; the
    UNet's cross-attentions get decoupled image K/V (here: the image tokens
    simply extend the context — the dedicated to_k_ip/to_v_ip variant is
    IPCrossAttention for custom stacks)."""

    cfg: IPAdapterConfig

    def setup(self):
        c = self.cfg
        self.image_proj_model = IPAResampler(
            dim=c.unet.cross_attention_dim, depth=c.resampler_depth,
            num_queries=c.num_image_tokens,
            embedding_dim=c.image_embedding_dim,
            output_dim=c.unet.cross_attention_dim,
            dtype=c.unet.dtype, param_dtype=c.unet.param_dtype,
        )
        self.unet = UNet2DConditionModel(c.unet)

    def __call__(self, noisy_latents, timesteps, text_embeds, image_embeds, noise):
        """Training forward: eps-MSE with [text; image] context."""
        image_tokens = self.image_proj_model(image_embeds)
        context = jnp.concatenate(
            [text_embeds.astype(image_tokens.dtype), image_tokens], axis=1
        )
        noise_pred = self.unet(noisy_latents, timesteps, context)
        loss = jnp.mean(
            (noise_pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2
        )
        return {"total_loss": loss, "noise_pred": noise_pred}

    def encode_image_embeds(self, image_embeds):
        """image embeds -> ``num_image_tokens`` prompt tokens (reference
        IPAdapterSD.encode_image_embeds, adapter_modules.py:60-66)."""
        return self.image_proj_model(image_embeds)

    def denoise(self, noisy_latents, timesteps, context):
        """One eps prediction with a prebuilt [text; image] context."""
        return self.unet(noisy_latents, timesteps, context)


@dataclasses.dataclass(frozen=True)
class EditAdapterConfig:
    """SDXL text2image+edit adapter (reference SDXLText2ImageAndEditAdapter
    :471-700): 8-channel conv_in (latent + latent-image condition)."""

    unet: SDXLUNetConfig = dataclasses.field(
        default_factory=lambda: SDXLUNetConfig(in_channels=8)
    )
    lora_rank: int = 16


class SDXLAdapterWithLatentImage(nn.Module):
    """reference adapter_modules.py:805-920: conditions the SDXL UNet on a
    concatenated latent image (channel axis) + resampled features."""

    cfg: EditAdapterConfig
    resampler: Optional[nn.Module] = None

    def setup(self):
        self.unet = UNet2DConditionModel(self.cfg.unet)

    def __call__(self, noisy_latents, latent_image, timesteps, prompt_embeds,
                 pooled, time_ids, noise):
        x = jnp.concatenate([noisy_latents, latent_image], axis=-1)
        noise_pred = self.unet(
            x, timesteps, prompt_embeds, time_ids=time_ids, text_embeds=pooled
        )
        loss = jnp.mean(
            (noise_pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2
        )
        return {"total_loss": loss, "noise_pred": noise_pred}


@dataclasses.dataclass(frozen=True)
class SD21EditAdapterConfig:
    """SD-2.1 text2image+edit adapter (reference SD21Text2ImageAndEditAdapter,
    adapter_modules.py:703-802): SD2.x UNet (cross_attention_dim 1024, no
    added time/text conditioning), 8-channel conv_in (noisy latents + latent
    image condition concatenated on channels)."""

    unet: SDXLUNetConfig = dataclasses.field(
        default_factory=lambda: SDXLUNetConfig(
            in_channels=8,
            block_out_channels=(320, 640, 1280, 1280),
            down_block_types=("CrossAttnDownBlock2D",) * 3 + ("DownBlock2D",),
            up_block_types=("UpBlock2D",) + ("CrossAttnUpBlock2D",) * 3,
            transformer_layers_per_block=(1, 1, 1, 1),
            cross_attention_dim=1024,
            addition_embed_type=None,
        )
    )
    lora_rank: int = 16


class SD21Text2ImageAndEditAdapter(nn.Module):
    """reference adapter_modules.py:703-802. forward (:706-713): resample the
    text embeds (tuple -> prompt embeds only; SD2.x has no pooled/time_ids
    added conditions), UNet eps prediction over the pre-concatenated
    8-channel latents, mean eps-MSE. ``image_embeds`` rides along unused,
    matching the reference signature.

    Trainability (inherited set_adapter, :485-558): conv_in + non-attention
    down blocks + q/out projections of every attention (the reference uses
    LoRA there; our UNet trains the projections directly) — expressed by
    ``sd21_edit_trainable_mask`` as an optax mask, like the main SDXLAdapter.
    """

    cfg: SD21EditAdapterConfig
    resampler: Optional[nn.Module] = None

    def setup(self):
        self.unet = UNet2DConditionModel(self.cfg.unet)

    def encode_text_embeds(self, text_embeds):
        if self.resampler is None:
            return text_embeds
        out = self.resampler(text_embeds)
        return out[0] if isinstance(out, tuple) else out

    def __call__(self, noisy_latents, timesteps, image_embeds, text_embeds,
                 noise):
        del image_embeds  # unused, reference signature parity (:706)
        prompt_embeds = self.encode_text_embeds(text_embeds)
        noise_pred = self.unet(noisy_latents, timesteps, prompt_embeds)
        loss = jnp.mean(
            (noise_pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2
        )
        return {"total_loss": loss, "noise_pred": noise_pred}

    def denoise(self, noisy_latents, timesteps, prompt_embeds):
        """Sampling-time UNet eval (driven by SDXLImagePipeline-style CFG)."""
        return self.unet(noisy_latents, timesteps, prompt_embeds)


def sd21_edit_trainable_mask(params, unet_cfg: SDXLUNetConfig):
    """True for the reference edit-adapter trainable set
    (adapter_modules.py:485-558): the resampler, unet conv_in (zero-init new
    input channels there; plain train here), every resnet/downsampler of
    non-attention down blocks (DownBlock2D), and the to_q / to_out
    projections of every attention (LoRA targets in the reference)."""
    params = nn.meta.unbox(params)
    plain_down = {
        f"down_blocks_{bi}"
        for bi, t in enumerate(unet_cfg.down_block_types)
        if "CrossAttn" not in t
    }

    def mask_fn(path, _):
        names = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
        if names and names[0] == "resampler":
            return True
        if "conv_in" in names:
            return True
        if any(n.rsplit("_resnets_", 1)[0] in plain_down
               or n.rsplit("_downsamplers_", 1)[0] in plain_down
               for n in names):
            return True
        return any(n in ("to_q", "to_out_0") for n in names)

    return jax.tree_util.tree_map_with_path(mask_fn, params)
