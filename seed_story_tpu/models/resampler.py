"""Qwen-style 2D-sincos perceiver resampler (single cross-attention).

JAX equivalent of the reference's Resampler
(/root/reference/src/models/qwen_visual.py:95-153) — used three ways:
ViT attention pool (256 queries), the agent's input resampler (grid 8 ->
64 queries) and output resampler (grid 16 -> 256 queries), per
configs/clm_models/agent_7b_sft.yaml.

Matches torch semantics exactly for weight porting:
  * nn.MultiheadAttention == fused in_proj (3E) + out_proj, scale
    1/sqrt(head_dim)
  * frozen 2D sin-cos pos-emb added to q (full grid) and k (bicubic
    resampled to the kv length); v without pos
  * ln_q on the learned queries, ln_kv after the optional kv projection
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import mha
from ..ops.sincos import get_2d_sincos_pos_embed, interpolate_abs_pos

Dtype = Any


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible (batch-first API here)."""

    embed_dim: int
    num_heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        e, h = self.embed_dim, self.num_heads
        hd = e // h
        b, lq, _ = q.shape
        lk = k.shape[1]

        in_proj_w = self.param(
            "in_proj_weight",
            nn.with_logical_partitioning(
                nn.initializers.xavier_uniform(), (None, "embed_kv")
            ),
            (3 * e, e),
            self.param_dtype,
        )
        in_proj_b = self.param(
            "in_proj_bias", nn.initializers.zeros, (3 * e,), self.param_dtype
        )
        wq, wk, wv = jnp.split(in_proj_w.astype(self.dtype), 3, axis=0)
        bq, bk, bv = jnp.split(in_proj_b.astype(self.dtype), 3, axis=0)
        # torch stores (out, in): y = x @ W.T + b
        qh = (q @ wq.T + bq).reshape(b, lq, h, hd).transpose(0, 2, 1, 3)
        kh = (k @ wk.T + bk).reshape(b, lk, h, hd).transpose(0, 2, 1, 3)
        vh = (v @ wv.T + bv).reshape(b, lk, h, hd).transpose(0, 2, 1, 3)

        out = mha(qh, kh, vh, causal=False)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, e)
        out = nn.Dense(
            e,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.xavier_uniform(), ("embed_kv", None)
            ),
            name="out_proj",
        )(out)
        return out


class Resampler(nn.Module):
    grid_size: int
    embed_dim: int
    num_heads: int
    kv_dim: Optional[int] = None
    ln_eps: float = 1e-5  # torch nn.LayerNorm default (qwen ViT pool uses 1e-6)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @property
    def num_queries(self) -> int:
        return self.grid_size**2

    @nn.compact
    def __call__(self, x):
        """x: (N, L, kv_dim) -> (N, num_queries, embed_dim)."""
        e = self.embed_dim
        n, l, _ = x.shape

        pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(e, self.grid_size), self.dtype
        )  # (nq, E) frozen
        query = self.param(
            "query",
            nn.with_logical_partitioning(
                nn.initializers.truncated_normal(stddev=0.02), (None, "embed_kv")
            ),
            (self.num_queries, e),
            self.param_dtype,
        )

        if self.kv_dim is not None and self.kv_dim != e:
            x = nn.Dense(
                e, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.truncated_normal(stddev=0.02),
                    ("kv", "embed_kv"),
                ),
                name="kv_proj",
            )(x)
        x = nn.LayerNorm(
            epsilon=self.ln_eps, dtype=self.dtype, param_dtype=self.param_dtype,
            name="ln_kv",
        )(x)

        q = nn.LayerNorm(
            epsilon=self.ln_eps, dtype=self.dtype, param_dtype=self.param_dtype,
            name="ln_q",
        )(query.astype(self.dtype))

        pos_k = interpolate_abs_pos(pos_embed, l)  # (L, E)
        q_in = jnp.broadcast_to(q[None] + pos_embed[None], (n, self.num_queries, e))
        k_in = x + pos_k[None]
        out = MultiheadAttention(
            e, self.num_heads, dtype=self.dtype, param_dtype=self.param_dtype,
            name="attn",
        )(q_in, k_in, x)
        return out
