"""AutoencoderKL (SDXL VAE) in flax, NHWC.

Counterpart of the diffusers VAE used by the reference
(/root/reference/src/train/train_sdxl_img2img_llm.py:227,360-362 encodes
targets; src/models_ipa/adapter_modules.py:359-385 decodes in the
pipeline). SDXL dims: channels (128, 256, 512, 512), latent 4, mid-block
single-head self-attention, scaling_factor 0.13025.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn

from ...ops.groupnorm import FastGroupNorm
import jax
import jax.numpy as jnp

Dtype = Any


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.13025
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @staticmethod
    def tiny(**kw) -> "VAEConfig":
        base = dict(block_out_channels=(16, 32), norm_num_groups=8,
                    dtype=jnp.float32)
        base.update(kw)
        return VAEConfig(**base)


class VAEResnet(nn.Module):
    out_channels: int
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        c_in = x.shape[-1]
        h = FastGroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                               param_dtype=cfg.param_dtype,
                               name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="conv1")(h)
        h = FastGroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                               param_dtype=cfg.param_dtype,
                               name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="conv2")(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial positions (diffusers
    AttnBlock / Attention with heads=1)."""

    channels: int
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, h, w, c = x.shape
        y = FastGroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                               param_dtype=cfg.param_dtype,
                               name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="to_v")(y)
        attn = jax.nn.softmax(
            (q.astype(jnp.float32) @ k.astype(jnp.float32).transpose(0, 2, 1))
            / jnp.sqrt(c), axis=-1,
        )
        y = (attn @ v.astype(jnp.float32)).astype(cfg.dtype)
        y = nn.Dense(c, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="to_out_0")(y)
        return x + y.reshape(b, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        ch = cfg.block_out_channels
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="conv_in")(x.astype(cfg.dtype))
        for bi in range(len(ch)):
            for li in range(cfg.layers_per_block):
                x = VAEResnet(ch[bi], cfg,
                              name=f"down_blocks_{bi}_resnets_{li}")(x)
            if bi < len(ch) - 1:
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(ch[bi], (3, 3), strides=(2, 2), padding="VALID",
                            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                            name=f"down_blocks_{bi}_downsamplers_0_conv")(x)
        x = VAEResnet(ch[-1], cfg, name="mid_block_resnets_0")(x)
        x = VAEAttention(ch[-1], cfg, name="mid_block_attentions_0")(x)
        x = VAEResnet(ch[-1], cfg, name="mid_block_resnets_1")(x)
        x = FastGroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                               param_dtype=cfg.param_dtype,
                               name="conv_norm_out")(x)
        x = nn.silu(x).astype(cfg.dtype)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                       name="conv_out")(x)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        ch = list(reversed(cfg.block_out_channels))  # (512,512,256,128)
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="conv_in")(z.astype(cfg.dtype))
        x = VAEResnet(ch[0], cfg, name="mid_block_resnets_0")(x)
        x = VAEAttention(ch[0], cfg, name="mid_block_attentions_0")(x)
        x = VAEResnet(ch[0], cfg, name="mid_block_resnets_1")(x)
        for bi in range(len(ch)):
            for li in range(cfg.layers_per_block + 1):
                x = VAEResnet(ch[bi], cfg, name=f"up_blocks_{bi}_resnets_{li}")(x)
            if bi < len(ch) - 1:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
                x = nn.Conv(c, (3, 3), padding=1, dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype,
                            name=f"up_blocks_{bi}_upsamplers_0_conv")(x)
        x = FastGroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                               param_dtype=cfg.param_dtype,
                               name="conv_norm_out")(x)
        x = nn.silu(x).astype(cfg.dtype)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        self.quant_conv = nn.Conv(
            2 * self.cfg.latent_channels, (1, 1), dtype=self.cfg.dtype,
            param_dtype=self.cfg.param_dtype,
        )
        self.post_quant_conv = nn.Conv(
            self.cfg.latent_channels, (1, 1), dtype=self.cfg.dtype,
            param_dtype=self.cfg.param_dtype,
        )

    def encode(self, pixels, rng=None):
        """pixels (B,H,W,3) in [-1,1] -> sampled latents * scaling_factor.
        rng=None -> distribution mode (deterministic)."""
        moments = self.quant_conv(self.encoder(pixels))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            std = jnp.exp(0.5 * logvar.astype(jnp.float32))
            mean = mean + (std * jax.random.normal(rng, mean.shape)).astype(mean.dtype)
        return mean * self.cfg.scaling_factor

    def decode(self, latents):
        """latents (B,h,w,4) scaled -> pixels (B,H,W,3) in [-1,1]."""
        z = latents / self.cfg.scaling_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, pixels, rng=None):
        return self.decode(self.encode(pixels, rng))
