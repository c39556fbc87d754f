"""Full SDXL-base 1024px 50-step CFG sampling speed on one TPU chip.

SDXL_INT8=1: weight-only int8 UNet projections/convs (round 4)."""
import os
import sys; sys.path.insert(0, "/root/repo")
import time
import dataclasses
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from seed_story_tpu.models.sdxl.adapter import SDXLAdapter, SDXLAdapterConfig
from seed_story_tpu.models.sdxl.unet import SDXLUNetConfig
from seed_story_tpu.models.sdxl.vae import AutoencoderKL, VAEConfig
from seed_story_tpu.pipelines.sdxl_pipeline import SDXLImagePipeline, SDXLSampleConfig
import flax.linen as nn

INT8 = os.environ.get("SDXL_INT8", "0") == "1"
acfg = SDXLAdapterConfig(  # full SDXL base + ResamplerXLV2 (4096 in)
    unet=SDXLUNetConfig(param_dtype=jnp.bfloat16, quantize=INT8))
print("int8 UNet:", INT8, flush=True)
adapter = SDXLAdapter(acfg)
b=1
init_args = dict(noisy_latents=jnp.zeros((b,128,128,4),jnp.bfloat16), timesteps=jnp.array([3]),
                 image_embeds=jnp.zeros((b,256,4096),jnp.bfloat16),
                 time_ids=jnp.ones((b,6)), noise=jnp.zeros((b,128,128,4),jnp.bfloat16))
t0=time.time()
from bench import _randomize_int8
ap = nn.meta.unbox(jax.jit(lambda: _randomize_int8(
    adapter.init(jax.random.PRNGKey(0), **init_args)["params"]))())
print("adapter init:", round(time.time()-t0,1), "s", flush=True)
vae = AutoencoderKL(VAEConfig(dtype=jnp.bfloat16))
t0=time.time()
vp = nn.meta.unbox(jax.jit(lambda: vae.init(jax.random.PRNGKey(1), jnp.zeros((1,64,64,3)))["params"])())
print("vae init:", round(time.time()-t0,1), "s", flush=True)

pipe = SDXLImagePipeline(adapter, ap, vae, vp,
    cfg=SDXLSampleConfig(height=1024, width=1024, num_inference_steps=50))
feats = np.random.RandomState(0).randn(1,256,4096).astype(np.float32)
t0=time.time()
imgs = pipe.generate(feats, np.zeros_like(feats), seed=1)
print("first 1024px 50-step sample (compile+run):", round(time.time()-t0,1), "s", flush=True)
t0=time.time()
imgs = pipe.generate(feats, np.zeros_like(feats), seed=2)
dt = time.time()-t0
print(f"steady 1024px 50-step CFG sample: {dt:.2f} s -> {1/dt:.3f} images/s/chip", flush=True)
print("img stats:", imgs.shape, imgs.dtype, imgs.min(), imgs.max(), flush=True)
