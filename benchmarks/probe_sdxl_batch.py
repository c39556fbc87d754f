"""SDXL 1024px 50-step CFG sample speed vs image batch (one chip).

The CFG pair already batches 2 UNet evals; batching B images makes it
2B. Utilization at B=1 averages ~46% of MXU peak, so larger batches may
claw some back (at ~2.7GB of latents+activations per extra image).
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import flax.linen as nn

from seed_story_tpu.models.sdxl.adapter import SDXLAdapter, SDXLAdapterConfig
from seed_story_tpu.models.sdxl.vae import AutoencoderKL, VAEConfig
from seed_story_tpu.pipelines.sdxl_pipeline import SDXLImagePipeline, SDXLSampleConfig

from seed_story_tpu.models.sdxl.unet import SDXLUNetConfig

acfg = SDXLAdapterConfig(unet=SDXLUNetConfig(param_dtype=jnp.bfloat16))
adapter = SDXLAdapter(acfg)
init_args = dict(
    noisy_latents=jnp.zeros((1, 128, 128, 4), jnp.bfloat16),
    timesteps=jnp.array([3]),
    image_embeds=jnp.zeros((1, 256, 4096), jnp.bfloat16),
    time_ids=jnp.ones((1, 6)),
    noise=jnp.zeros((1, 128, 128, 4), jnp.bfloat16),
)
t0 = time.time()
ap = nn.meta.unbox(jax.jit(
    lambda: adapter.init(jax.random.PRNGKey(0), **init_args)["params"])())
vae = AutoencoderKL(VAEConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16))
vp = nn.meta.unbox(jax.jit(
    lambda: vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))["params"])())
print("init:", round(time.time() - t0, 1), "s", flush=True)

pipe = SDXLImagePipeline(adapter, ap, vae, vp,
                         cfg=SDXLSampleConfig(num_inference_steps=50))
for B in (1, 2, 4):
    feats = np.random.RandomState(0).randn(B, 256, 4096).astype(np.float32)
    neg = np.zeros_like(feats)
    imgs = pipe.generate(feats, neg, seed=1)  # compile + warm
    t0 = time.perf_counter()
    imgs = pipe.generate(feats, neg, seed=2)
    dt = time.perf_counter() - t0
    print(f"B={B}: {dt:.2f} s -> {dt/B:.2f} s/image ({B/dt:.3f} images/s)",
          flush=True)
