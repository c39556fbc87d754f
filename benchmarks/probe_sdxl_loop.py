"""Does the Pallas attention pay a loop penalty inside lax.scan/fori_loop?

Times the FULL UNet eval three ways: fori_loop (production-like), unrolled
chain, and fori_loop with XLA attention. If unrolled << fori with pallas,
the sampling scan must be restructured.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

IMPL = os.environ.get("PROBE_IMPL", "")
if IMPL:
    os.environ["SEED_STORY_ATTN_IMPL"] = IMPL

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import flax.linen as nn  # noqa: E402

from seed_story_tpu.models.sdxl.adapter import SDXLAdapter, SDXLAdapterConfig  # noqa: E402
from seed_story_tpu.models.sdxl.unet import SDXLUNetConfig  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
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
def run_fori(l, pp):
    return jax.lax.fori_loop(0, N, lambda i, c: eval_once(c, pp), l)


@jax.jit
def run_unrolled(l, pp):
    for _ in range(N):
        l = eval_once(l, pp)
    return l


def timeit(name, f):
    out = f(lat, params)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(lat, params)
    _ = float(jnp.sum(out).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / N
    print(f"{name:30s} {dt*1e3:8.2f} ms/eval", flush=True)


print(f"attn impl = {IMPL or 'auto(pallas)'}  N={N}", flush=True)
timeit("fori_loop", run_fori)
timeit("unrolled", run_unrolled)
