"""Perceiver resamplers for SDXL conditioning (open-flamingo style).

JAX equivalents of /root/reference/src/models_ipa/resampler.py:
``Resampler`` (:121), ``ResamplerXL`` (:170), ``ResamplerXLV2`` (:228,
the shipped de-tokenizer head: L2-normalizes input, emits dual-width
768+1280 -> 2048 prompt embeds + a 1280-d attention-pooled embed standing
in for SDXL's two text encoders), ``AttentionPool2d`` (:79),
``PerceiverAttention`` (:31), ``ResamplerXLIdentity`` (:287).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class PerceiverAttention(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 8
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, latents):
        """x: (B, n1, D) features; latents: (B, n2, D). KV = [x; latents]."""
        inner = self.dim_head * self.heads
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="norm1")(x.astype(jnp.float32)).astype(self.dtype)
        latents = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
                               name="norm2")(latents.astype(jnp.float32)).astype(self.dtype)
        b, l, _ = latents.shape
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_q")(latents)
        kv_input = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="to_kv")(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_first(t):
            return t.reshape(b, t.shape[1], self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        # reference scales q and k each by dim_head**-0.25 (:69-70)
        scale = self.dim_head**-0.25
        w = jnp.einsum("bhqd,bhkd->bhqk", (q * scale).astype(jnp.float32),
                       (k * scale).astype(jnp.float32))
        w = jax.nn.softmax(w, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v.astype(jnp.float32)).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="to_out")(out)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="norm")(x.astype(jnp.float32)).astype(self.dtype)
        x = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc2")(x)


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling (reference resampler.py:79-118):
    mean token prepended, learned pos-emb, MHA, first output token."""

    seq_len: int
    embed_dim: int
    num_heads: int
    output_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from .resampler import MultiheadAttention

        e = self.embed_dim
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=e**-0.5),
            (self.seq_len + 1, e),
            self.param_dtype,
        )
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
        x = x + pos[None].astype(x.dtype)
        # torch F.multi_head_attention_forward with separate q/k/v weights +
        # out_proj == our MultiheadAttention with out features = output_dim
        out = _PoolMHA(e, self.num_heads, self.output_dim or e,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="attn")(x[:, :1], x, x)
        return out[:, 0]


class _PoolMHA(nn.Module):
    embed_dim: int
    num_heads: int
    out_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        e, h = self.embed_dim, self.num_heads
        hd = e // h
        b, lq, _ = q.shape
        lk = k.shape[1]
        q = nn.Dense(e, dtype=self.dtype, param_dtype=self.param_dtype, name="q_proj")(q)
        k = nn.Dense(e, dtype=self.dtype, param_dtype=self.param_dtype, name="k_proj")(k)
        v = nn.Dense(e, dtype=self.dtype, param_dtype=self.param_dtype, name="v_proj")(v)

        def hf(t, l):
            return t.reshape(b, l, h, hd).transpose(0, 2, 1, 3)

        w = jnp.einsum("bhqd,bhkd->bhqk", hf(q, lq).astype(jnp.float32),
                       hf(k, lk).astype(jnp.float32)) / jnp.sqrt(hd)
        w = jax.nn.softmax(w, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, hf(v, lk).astype(jnp.float32))
        out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(b, lq, e)
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="c_proj")(out)


class IPAResampler(nn.Module):
    """reference Resampler (:121-167): latents cross-attend to features."""

    dim: int = 1024
    depth: int = 8
    dim_head: int = 64
    heads: int = 16
    num_queries: int = 8
    embedding_dim: int = 768
    output_dim: int = 1024
    ff_mult: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        latents = self.param(
            "latents", nn.initializers.normal(stddev=self.dim**-0.5),
            (1, self.num_queries, self.dim), self.param_dtype,
        )
        latents = jnp.broadcast_to(
            latents.astype(self.dtype), (x.shape[0],) + latents.shape[1:]
        )
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="proj_in")(x.astype(self.dtype))
        for i in range(self.depth):
            latents = PerceiverAttention(
                self.dim, self.dim_head, self.heads, self.dtype,
                self.param_dtype, name=f"layers_{i}_attn")(x, latents) + latents
            latents = FeedForward(self.dim, self.ff_mult, self.dtype,
                                  self.param_dtype, name=f"layers_{i}_ff")(latents) + latents
        latents = nn.Dense(self.output_dim, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="proj_out")(latents)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
                            name="norm_out")(latents.astype(jnp.float32)).astype(self.dtype)


class ResamplerXLV2(nn.Module):
    """The shipped de-tokenizer head (reference :228-284 + config
    detokenizer_sdxl_qwen_vit_adapted.yaml: dim 1024, depth 4, 64 queries,
    embedding 4096, outputs 768/1280)."""

    dim: int = 1024
    depth: int = 4
    dim_head: int = 64
    heads: int = 16
    num_queries: int = 64
    embedding_dim: int = 4096
    output1_dim: int = 768
    output2_dim: int = 1280
    ff_mult: int = 4
    l2_normalize_input: bool = True  # the V2 difference (:269)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pooled_text_embeds=None):
        latents = self.param(
            "latents", nn.initializers.normal(stddev=self.dim**-0.5),
            (1, self.num_queries, self.dim), self.param_dtype,
        )
        latents = jnp.broadcast_to(
            latents.astype(self.dtype), (x.shape[0],) + latents.shape[1:]
        )
        if self.l2_normalize_input:
            # reference :269 calls F.normalize(x) with torch's DEFAULT dim=1:
            # the (B, L, D) features are normalized over the TOKEN axis, not
            # the feature axis. Almost certainly unintended upstream, but the
            # shipped checkpoints were trained through it — reproduced
            # bug-for-bug (see CLAUDE.md design invariants).
            xf = x.astype(jnp.float32)
            norm = jnp.sqrt(jnp.sum(xf * xf, axis=1, keepdims=True))
            x = (xf / jnp.maximum(norm, 1e-12)).astype(self.dtype)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="proj_in")(x.astype(self.dtype))
        for i in range(self.depth):
            latents = PerceiverAttention(
                self.dim, self.dim_head, self.heads, self.dtype,
                self.param_dtype, name=f"layers_{i}_attn")(x, latents) + latents
            latents = FeedForward(self.dim, self.ff_mult, self.dtype,
                                  self.param_dtype, name=f"layers_{i}_ff")(latents) + latents
        hidden = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
                              name="norm_out")(latents.astype(jnp.float32)).astype(self.dtype)
        e1 = nn.Dense(self.output1_dim, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="unet_proj_1")(hidden)
        e2 = nn.Dense(self.output2_dim, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="unet_proj_2")(hidden)
        prompt_embeds = jnp.concatenate([e1, e2], axis=-1)  # (B, nq, 2048)
        pooled = AttentionPool2d(
            self.num_queries, self.dim, self.heads, self.output2_dim,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="unet_attnpool")(hidden)  # (B, 1280)
        return prompt_embeds, pooled


class ResamplerXL(ResamplerXLV2):
    """V1: identical but no input L2 normalization (reference :170-225)."""

    l2_normalize_input: bool = False


class ResamplerXLIdentity(nn.Module):
    @nn.compact
    def __call__(self, x, pooled_text_embeds=None):
        return x, pooled_text_embeds
