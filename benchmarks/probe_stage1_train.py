"""Stage-1 (discrete tokenizer pretraining) step speed on one chip.

The reference's stage-1 loop (/root/reference/src/train/train.py:130-287)
is: frozen ViT-bigG encode -> DiscreteModle* forward (distill/VQ/
contrastive losses) -> AdamW on the qformer/quantizer. The shipped
SEED-Story config is the Identity variant (no training), so this probe
times the heaviest *trainable* variant (DiscreteModelDistill: VQ + cosine
distillation) behind the full frozen 48-layer ViT at a production batch —
the one trainer PERF.md had no line for.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from seed_story_tpu.models.discrete import DiscreteConfig, DiscreteModelDistill
from seed_story_tpu.models.vit import ViTConfig, VisionTransformerWithAttnPool

import os

B = int(os.environ.get("S1_B", "32"))  # images/step/chip
_L = int(os.environ.get("S1_LAYERS", "48"))  # full ViT-bigG by default

vit_cfg = ViTConfig(layers=_L, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
vit = VisionTransformerWithAttnPool(vit_cfg)
px = jnp.zeros((B, 3, vit_cfg.image_size, vit_cfg.image_size), jnp.float32)
t0 = time.time()
vit_params = nn.meta.unbox(
    jax.jit(lambda: vit.init(jax.random.PRNGKey(0), px)["params"])())
print(f"vit init {time.time()-t0:.0f}s", flush=True)

dm = DiscreteModelDistill(
    DiscreteConfig(dim=vit_cfg.output_dim, dtype=jnp.bfloat16), use_vq=True)
feats0 = jnp.zeros((B, vit_cfg.n_queries, vit_cfg.output_dim), jnp.bfloat16)
dm_params = nn.meta.unbox(
    jax.jit(lambda: dm.init(jax.random.PRNGKey(1), feats0)["params"])())
n_vit = sum(x.size for x in jax.tree_util.tree_leaves(vit_params))
n_dm = sum(x.size for x in jax.tree_util.tree_leaves(dm_params))
print(f"ViT {n_vit/1e9:.2f}B frozen; discrete {n_dm/1e6:.1f}M trainable",
      flush=True)

opt = optax.adamw(1e-4, weight_decay=0.05)
opt_state = jax.jit(opt.init)(dm_params)


@jax.jit
def step(dm_params, opt_state, vit_params, pixels):
    feats = jax.lax.stop_gradient(vit.apply({"params": vit_params}, pixels))

    def loss_fn(p):
        out = dm.apply({"params": p}, feats)
        return out["total_loss"], out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(dm_params)
    updates, opt_state = opt.update(grads, opt_state, dm_params)
    return optax.apply_updates(dm_params, updates), opt_state, loss


t0 = time.time()
dm_params, opt_state, loss = step(dm_params, opt_state, vit_params, px)
print(f"compile+first {time.time()-t0:.0f}s loss {float(loss):.4f}", flush=True)
best = 1e9
for _ in range(5):
    t0 = time.perf_counter()
    dm_params, opt_state, loss = step(dm_params, opt_state, vit_params, px)
    jax.block_until_ready(loss)
    best = min(best, time.perf_counter() - t0)
print(f"stage-1 step (B={B}, frozen ViT-bigG fwd + VQ-distill bwd): "
      f"{best*1e3:.0f} ms -> {B/best:.1f} images/s/chip", flush=True)
