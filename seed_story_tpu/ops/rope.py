"""Rotary position embeddings (LLaMA flavor) with linear / dynamic-NTK scaling.

Mirrors the behavior of the reference's LlamaRotaryEmbedding family
(/root/reference/src/models_clm/modeling_llama_4_35.py:96-192): half-rotation
("rotate_half") form, inverse frequencies ``base ** (-2i/d)``, cos/sin
computed in float32 and applied at the positions given by ``position_ids``.

TPU-first: no caching buffers — cos/sin are computed on the fly inside the
jitted step (cheap VPU work, fuses into the attention prologue).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def rope_frequencies(
    head_dim: int,
    positions: jax.Array,
    *,
    base: float = 10000.0,
    scaling_type: Optional[str] = None,
    scaling_factor: float = 1.0,
    max_position_embeddings: int = 4096,
    seq_len: Optional[jax.Array] = None,
):
    """cos/sin of shape positions.shape + (head_dim,), float32.

    scaling_type: None | 'linear' | 'dynamic' (NTK-aware), matching the
    reference's LlamaLinearScalingRotaryEmbedding /
    LlamaDynamicNTKScalingRotaryEmbedding.
    """
    positions = positions.astype(jnp.float32)
    if scaling_type == "linear":
        positions = positions / scaling_factor
        eff_base = jnp.float32(base)
    elif scaling_type == "dynamic":
        if seq_len is None:
            seq_len = jnp.max(positions) + 1.0
        seq_len = jnp.maximum(
            jnp.asarray(seq_len, jnp.float32), float(max_position_embeddings)
        )
        eff_base = base * (
            (scaling_factor * seq_len / max_position_embeddings)
            - (scaling_factor - 1.0)
        ) ** (head_dim / (head_dim - 2.0))
    else:
        eff_base = jnp.float32(base)

    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    inv_freq = 1.0 / (eff_base**exponents)  # (head_dim/2,)
    angles = positions[..., None] * inv_freq  # (..., head_dim/2)
    emb = jnp.concatenate([angles, angles], axis=-1)  # (..., head_dim)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    q: jax.Array,
    k: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
):
    """q, k: (B, H, S, D); cos/sin: (B, S, D) or (S, D)."""
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, None, :, :]  # (B, 1, S, D)
    sin = sin[:, None, :, :]
    dtype = q.dtype
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = qf * cos + rotate_half(qf) * sin
    k_out = kf * cos + rotate_half(kf) * sin
    return q_out.astype(dtype), k_out.astype(dtype)
