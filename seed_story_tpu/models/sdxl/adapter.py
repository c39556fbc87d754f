"""SDXLAdapter — the visual de-tokenizer (JAX).

Counterpart of /root/reference/src/models_ipa/adapter_modules.py:281-468:
wraps the SDXL UNet with a ResamplerXLV2 head that replaces both text
encoders; trainable set = resampler + every UNet ``to_k``/``to_v``
projection (self- AND cross-attention, matching the reference's
``name.endswith('to_k'/'to_v')`` walk at :317-320), or the full UNet when
``full_ft``. Training forward = eps-prediction MSE with SDXL's
added conditioning (time_ids + pooled embeds, :330-343).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ipa_resampler import ResamplerXLV2
from .unet import SDXLUNetConfig, UNet2DConditionModel


@dataclasses.dataclass(frozen=True)
class SDXLAdapterConfig:
    unet: SDXLUNetConfig = dataclasses.field(default_factory=SDXLUNetConfig)
    resampler_dim: int = 1024
    resampler_depth: int = 4
    resampler_heads: int = 16
    resampler_queries: int = 64
    embedding_dim: int = 4096  # ViT/agent feature dim
    output1_dim: int = 768
    output2_dim: int = 1280
    full_ft: bool = False

    @staticmethod
    def tiny(**kw) -> "SDXLAdapterConfig":
        unet = SDXLUNetConfig.tiny()
        base = dict(
            unet=unet, resampler_dim=32, resampler_depth=1,
            resampler_heads=2, resampler_queries=8, embedding_dim=128,
            output1_dim=32, output2_dim=unet.pooled_projection_dim,
        )
        base.update(kw)
        return SDXLAdapterConfig(**base)


class SDXLAdapter(nn.Module):
    cfg: SDXLAdapterConfig

    def setup(self):
        c = self.cfg
        self.resampler = ResamplerXLV2(
            dim=c.resampler_dim, depth=c.resampler_depth,
            heads=c.resampler_heads, num_queries=c.resampler_queries,
            embedding_dim=c.embedding_dim, output1_dim=c.output1_dim,
            output2_dim=c.output2_dim, dtype=c.unet.dtype,
            param_dtype=c.unet.param_dtype,
        )
        self.unet = UNet2DConditionModel(c.unet)

    def encode_image_embeds(self, image_embeds):
        """(B, n, embedding_dim) -> (prompt_embeds (B, nq, 2048),
        pooled (B, 1280)) — adapter_modules.py:345-348."""
        return self.resampler(image_embeds)

    def __call__(self, noisy_latents, timesteps, image_embeds, time_ids, noise):
        """Training forward (adapter_modules.py:330-343). noisy_latents
        NHWC. Returns dict with total_loss and noise_pred."""
        prompt_embeds, pooled = self.resampler(image_embeds)
        noise_pred = self.unet(
            noisy_latents, timesteps, prompt_embeds,
            time_ids=time_ids, text_embeds=pooled,
        )
        loss = jnp.mean(
            (noise_pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2
        )
        return {"total_loss": loss, "noise_pred": noise_pred}

    def denoise(self, noisy_latents, timesteps, prompt_embeds, pooled, time_ids):
        """Inference UNet call with precomputed conditioning."""
        return self.unet(
            noisy_latents, timesteps, prompt_embeds,
            time_ids=time_ids, text_embeds=pooled,
        )


def adapter_trainable_mask(params, full_ft: bool = False):
    """True for the reference's trainable set (adapter_modules.py:309-323):
    the whole resampler + every unet to_k/to_v kernel (self & cross)."""
    params = nn.meta.unbox(params)

    def mask_fn(path, _):
        names = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
        if names and names[0] == "resampler":
            return True
        if full_ft and names and names[0] == "unet":
            return True
        return any(n in ("to_k", "to_v") for n in names)

    return jax.tree_util.tree_map_with_path(mask_fn, params)
