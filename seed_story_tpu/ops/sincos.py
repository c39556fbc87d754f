"""2-D sin-cos positional embeddings + bicubic grid interpolation.

Equivalent surface to the reference's get_2d_sincos_pos_embed /
get_abs_pos (/root/reference/src/models/qwen_visual.py:23-92), built with
numpy (host, init-time) and jax.image (device, trace-time).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    pos = pos.reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = False) -> np.ndarray:
    """(grid_size**2, embed_dim) float32; first half encodes H, second W."""
    assert embed_dim % 2 == 0
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w first, matching the reference
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    pos = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos = np.concatenate([np.zeros([1, embed_dim]), pos], axis=0)
    return pos.astype(np.float32)


def interpolate_abs_pos(abs_pos: jax.Array, tgt_len: int) -> jax.Array:
    """Bicubic-resample a (L, C) square-grid pos-emb to tgt_len positions."""
    src = int(np.sqrt(abs_pos.shape[0]))
    tgt = int(np.sqrt(tgt_len))
    assert tgt * tgt == tgt_len, (
        f"pos-emb interpolation needs a square token count, got {tgt_len} "
        "(the reference's get_abs_pos has the same constraint)"
    )
    if src == tgt:
        return abs_pos
    c = abs_pos.shape[-1]
    grid = abs_pos.astype(jnp.float32).reshape(src, src, c)
    out = jax.image.resize(grid, (tgt, tgt, c), method="bicubic")
    return out.reshape(tgt * tgt, c).astype(abs_pos.dtype)
