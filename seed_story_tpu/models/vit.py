"""Qwen-VL ViT-bigG visual tokenizer in flax.

Architecture parity with the reference's VisionTransformerWithAttnPool
(/root/reference/src/models/qwen_visual.py:321-422): 448px -> 14px conv
patchify (1024 tokens, width 1664) -> +interp pos-emb -> ln_pre -> 48
pre-LN blocks (fused-qkv attention, GELU MLP, eps 1e-6) -> perceiver
attn-pool to 256 queries -> ln_post -> output projection (256 x 4096).

TPU-first: attention via the Pallas flash kernel (full mask), bf16
compute / f32 params policy, conv patchify runs on the MXU as one matmul.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import mha
from ..ops.sincos import interpolate_abs_pos
from .resampler import Resampler

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 448
    patch_size: int = 14
    width: int = 1664
    layers: int = 48
    heads: int = 16
    mlp_ratio: float = 4.9231
    n_queries: int = 256
    output_dim: int = 4096
    ln_eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @staticmethod
    def tiny(**kw) -> "ViTConfig":
        base = dict(image_size=56, patch_size=14, width=64, layers=2, heads=4,
                    mlp_ratio=4.0, n_queries=16, output_dim=128)
        base.update(kw)
        return ViTConfig(**base)


class VisualAttention(nn.Module):
    """Fused-QKV self-attention (reference qwen_visual.py:156-235)."""

    width: int
    heads: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        e, h = self.width, self.heads
        hd = e // h
        b, l, _ = x.shape
        qkv = nn.Dense(
            3 * e, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.xavier_uniform(), ("embed_kv", None)
            ),
            name="in_proj",
        )(x)
        # reference splits the last dim per head into (q, k, v) thirds:
        # view (l, b, heads, 3*hd) then split -> per-head interleaved layout.
        qkv = qkv.reshape(b, l, h, 3 * hd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        out = mha(q, k, v, causal=False)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, e)
        return nn.Dense(
            e, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.xavier_uniform(), ("embed_kv", None)
            ),
            name="out_proj",
        )(out)


class VisualBlock(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        mlp_width = int(cfg.width * cfg.mlp_ratio)
        h = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="ln_1")(x)
        x = x + VisualAttention(cfg.width, cfg.heads, cfg.dtype,
                                cfg.param_dtype, name="attn")(h)
        h = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="ln_2")(x)
        h = nn.Dense(mlp_width, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     kernel_init=nn.with_logical_partitioning(
                         nn.initializers.xavier_uniform(), ("embed_kv", "mlp")),
                     name="c_fc")(h)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU is exact erf
        h = nn.Dense(cfg.width, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     kernel_init=nn.with_logical_partitioning(
                         nn.initializers.xavier_uniform(), ("mlp", "embed_kv")),
                     name="c_proj")(h)
        return x + h


class VisionTransformerWithAttnPool(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        """pixels: (N, 3, H, W) CLIP-normalized -> (N, n_queries, output_dim)."""
        cfg = self.cfg
        n = pixels.shape[0]
        x = pixels.astype(cfg.dtype).transpose(0, 2, 3, 1)  # NHWC
        # conv patchify == extract patches + one big matmul on the MXU
        x = nn.Conv(
            cfg.width,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="conv1",
        )(x)
        ntok = x.shape[1] * x.shape[2]
        x = x.reshape(n, ntok, cfg.width)

        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=cfg.width**-0.5),
            (256, cfg.width),
            cfg.param_dtype,
        )
        x = x + interpolate_abs_pos(pos.astype(cfg.dtype), ntok)[None]

        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="ln_pre")(x)
        for i in range(cfg.layers):
            x = VisualBlock(cfg, name=f"blocks_{i}")(x)

        x = Resampler(
            grid_size=int(math.sqrt(cfg.n_queries)),
            embed_dim=cfg.output_dim,
            num_heads=max(1, cfg.output_dim // 128),
            kv_dim=cfg.width,
            ln_eps=cfg.ln_eps,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="attn_pool",
        )(x)
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="ln_post")(x)
        proj = self.param(
            "proj",
            nn.initializers.normal(stddev=cfg.output_dim**-0.5),
            (cfg.output_dim, cfg.output_dim),
            cfg.param_dtype,
        )
        return x @ proj.astype(cfg.dtype)


class VisionTransformer(nn.Module):
    """No-pool variant (reference qwen_visual.py:425-490): patchify +
    pos-emb + ln_pre + the transformer stack, returning the full
    (N, grid*grid, width) token features — no attn_pool/ln_post/proj.
    Shares module names with VisionTransformerWithAttnPool so the same
    converted checkpoints load (strict=False drops the pool tensors)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        cfg = self.cfg
        n = pixels.shape[0]
        x = pixels.astype(cfg.dtype).transpose(0, 2, 3, 1)  # NHWC
        x = nn.Conv(
            cfg.width, kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="conv1",
        )(x)
        ntok = x.shape[1] * x.shape[2]
        x = x.reshape(n, ntok, cfg.width)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=cfg.width**-0.5),
            (256, cfg.width),
            cfg.param_dtype,
        )
        x = x + interpolate_abs_pos(pos.astype(cfg.dtype), ntok)[None]
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="ln_pre")(x)
        for i in range(cfg.layers):
            x = VisualBlock(cfg, name=f"blocks_{i}")(x)
        return x
