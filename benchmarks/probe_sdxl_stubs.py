"""Stub-ladder for the SDXL UNet eval: replace one component class with
identity at a time and re-time the full eval (fori_loop, production-like).
The difference to the full eval is that component's true in-situ cost.

STUB env: none | attn | ff | gn | t2d
Plus a pure-matmul control at the dominant ff shape to read this chip's
practical MXU ceiling.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import flax.linen as nn  # noqa: E402

import seed_story_tpu.models.sdxl.unet as U  # noqa: E402

STUB = os.environ.get("STUB", "none")

if STUB == "attn":
    U.mha = lambda q, k, v, **kw: q
elif STUB == "ff":
    class _FF(nn.Module):
        dim: int
        mult: int = 4
        dtype: object = jnp.bfloat16
        param_dtype: object = jnp.float32

        @nn.compact
        def __call__(self, x):
            return x

    U.FeedForwardGEGLU = _FF
elif STUB == "gn":
    class _GN(nn.Module):
        num_groups: int = 32
        epsilon: float = 1e-5
        dtype: object = jnp.float32
        param_dtype: object = jnp.float32

        @nn.compact
        def __call__(self, x):
            return x

    U.FastGroupNorm = _GN  # round-3: the UNet norms are FastGroupNorm
elif STUB == "t2d":
    class _T2D(nn.Module):
        channels: int
        n_layers: int
        cfg: object

        @nn.compact
        def __call__(self, x, context):
            return x

    U.Transformer2DModel = _T2D

from seed_story_tpu.models.sdxl.adapter import SDXLAdapter, SDXLAdapterConfig  # noqa: E402
from seed_story_tpu.models.sdxl.unet import SDXLUNetConfig  # noqa: E402

N = 8
CFG = SDXLUNetConfig(param_dtype=jnp.bfloat16)
acfg = SDXLAdapterConfig(embedding_dim=4096, unet=CFG)
sdxl = SDXLAdapter(acfg)
params = nn.meta.unbox(jax.jit(lambda: sdxl.init(
    jax.random.PRNGKey(2),
    noisy_latents=jnp.zeros((1, 128, 128, 4), jnp.bfloat16),
    timesteps=jnp.zeros((1,), jnp.int32),
    image_embeds=jnp.zeros((1, 256, 4096), jnp.bfloat16),
    time_ids=jnp.ones((1, 6)),
    noise=jnp.zeros((1, 128, 128, 4), jnp.bfloat16))["params"])())
prompt, pooled = jax.jit(lambda p, e: sdxl.apply(
    {"params": p}, e, method=sdxl.encode_image_embeds))(
    params, jnp.zeros((2, 256, 4096), jnp.bfloat16))
tids = jnp.ones((2, 6))
lat = jnp.zeros((2, 128, 128, 4), jnp.bfloat16) + 0.1


def eval_once(l, pp):
    eps = sdxl.apply({"params": pp}, l, jnp.full((2,), 500.0),
                     prompt, pooled, tids, method=sdxl.denoise)
    return (l + 0.01 * eps).astype(l.dtype)


@jax.jit
def run(l, pp):
    return jax.lax.fori_loop(0, N, lambda i, c: eval_once(c, pp), l)


out = run(lat, params)
jax.block_until_ready(out)
t0 = time.perf_counter()
out = run(lat, params)
_ = float(jnp.sum(out).astype(jnp.float32))
print(f"STUB={STUB}: {(time.perf_counter()-t0)/N*1e3:.2f} ms/eval", flush=True)

if STUB == "none":
    # pure-matmul MXU ceiling at the ff geometry (2048 x 1280 -> 10240 + back)
    w1 = jax.random.normal(jax.random.PRNGKey(0), (1280, 10240), jnp.bfloat16)
    w2 = jax.random.normal(jax.random.PRNGKey(1), (5120, 1280), jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(2), (2048, 1280), jnp.bfloat16)

    @jax.jit
    def mm(x, w1, w2):
        def body(i, c):
            h = jnp.dot(c, w1, preferred_element_type=jnp.float32)
            h1, h2 = jnp.split(h, 2, axis=-1)
            return jnp.dot((h1 * h2).astype(jnp.bfloat16), w2,
                           preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, 50, body, x)

    o = mm(x, w1, w2)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = mm(x, w1, w2)
    _ = float(jnp.sum(o).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / 50
    fl = 2 * 2048 * 1280 * 10240 + 2 * 2048 * 5120 * 1280
    print(f"ff-geometry matmul ceiling: {dt*1e3:.3f} ms = {fl/dt/1e12:.0f} TF/s",
          flush=True)
