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


def _torch_bicubic_matrix(src: int, tgt: int) -> np.ndarray:
    """(tgt, src) interpolation matrix reproducing torch
    ``F.interpolate(mode='bicubic', align_corners=False)`` exactly: half-pixel
    source coords, cubic-convolution kernel with A=-0.75, border-replicated
    taps. jax.image.resize uses the Keys a=-0.5 kernel, which differs by up
    to ~1e-3 — enough to break bit-comparable ViT-feature porting (the 448px
    Qwen ViT upsamples its 16x16 pos-emb to 32x32 through this path,
    reference qwen_visual.py:23-38)."""
    A = -0.75
    scale = src / tgt
    w = np.zeros((tgt, src), np.float64)
    for i in range(tgt):
        center = (i + 0.5) * scale - 0.5
        i0 = int(np.floor(center))
        t = center - i0
        ws = (
            ((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A,
            ((A + 2) * t - (A + 3)) * t * t + 1,
            ((A + 2) * (1 - t) - (A + 3)) * (1 - t) * (1 - t) + 1,
            ((A * (2 - t) - 5 * A) * (2 - t) + 8 * A) * (2 - t) - 4 * A,
        )
        for k, wk in enumerate(ws):
            w[i, min(max(i0 - 1 + k, 0), src - 1)] += wk
    return w.astype(np.float32)


def interpolate_abs_pos(abs_pos: jax.Array, tgt_len: int) -> jax.Array:
    """Bicubic-resample a (L, C) square-grid pos-emb to tgt_len positions
    (torch-exact; see _torch_bicubic_matrix)."""
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
    w = jnp.asarray(_torch_bicubic_matrix(src, tgt))
    out = jnp.einsum("ts,shc->thc", w, grid)
    out = jnp.einsum("ts,hsc->htc", w, out)
    return out.reshape(tgt * tgt, c).astype(abs_pos.dtype)
