"""Per-component timing of the SDXL 1024px UNet eval (the round-3 target:
VERDICT #1 — SDXL is the measured bottleneck at 6.6-7.3 s/image).

Methodology (CLAUDE.md): every timing chains N dependent calls inside ONE
jitted program and forces a host read — per-call wall time through the
axon tunnel is meaningless.

Components at the exact SDXL-base 1024px shapes (B=2 CFG pair, bf16):
  * BasicTransformerBlock at (2, 4096, 640) x10 instances/eval
  * BasicTransformerBlock at (2, 1024, 1280) x60 instances/eval
  * ResnetBlock2D at (2,128,128,320) x~5, (2,64,64,640) x~5,
    (2,32,32,1280) x~7 (up-blocks see concat'd skip channels: timed 2x-in)
  * bare attention cores at both seq lengths (pallas vs xla)
  * GroupNorm+silu at the largest activation
  * full adapter.denoise eval + the VAE decode

Run:  python benchmarks/probe_sdxl_profile.py [reps]
"""

import sys
sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import flax.linen as nn  # noqa: E402

from seed_story_tpu.models.sdxl.unet import (  # noqa: E402
    BasicTransformerBlock,
    ResnetBlock2D,
    SDXLUNetConfig,
)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
CFG = SDXLUNetConfig(param_dtype=jnp.bfloat16)


def timeit(name, fn, *args, n=REPS):
    """fn must be (carry, *rest) -> carry-like; chain n dependent calls.
    NOTE: *args (params included) are passed as jit ARGUMENTS — closure
    constants inside a fori_loop body get rematerialized every iteration
    and inflate timings ~20x."""
    f = jax.jit(lambda c, *r: jax.lax.fori_loop(
        0, n, lambda i, cc: fn(cc, *r), c))
    out = f(*args)  # compile+warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out)
              .astype(jnp.float32))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:38s} {dt*1e3:8.2f} ms/call", flush=True)
    return dt


def transformer_block(c, seq, n_inst):
    heads = c // CFG.attention_head_dim
    blk = BasicTransformerBlock(
        c, heads, CFG.attention_head_dim, CFG.cross_attention_dim,
        dtype=CFG.dtype, param_dtype=CFG.param_dtype)
    x = jnp.zeros((2, seq, c), CFG.dtype) + 0.1
    ctx = jnp.zeros((2, 64, CFG.cross_attention_dim), CFG.dtype) + 0.1
    params = jax.jit(lambda: blk.init(jax.random.PRNGKey(0), x, ctx))()
    dt = timeit(f"transformer c={c} seq={seq}",
                lambda xx, pp: blk.apply(pp, xx, ctx), x, params)
    return dt * n_inst


def resnet_block(c_in, c_out, res, n_inst, tag=""):
    blk = ResnetBlock2D(c_out, CFG)
    x = jnp.zeros((2, res, res, c_in), CFG.dtype) + 0.1
    temb = jnp.zeros((2, CFG.time_embed_dim), CFG.dtype) + 0.1
    params = jax.jit(lambda: blk.init(jax.random.PRNGKey(0), x, temb))()
    def step(xx, pp):
        y = blk.apply(pp, xx, temb)
        if c_in != c_out:  # keep the carry shape closed
            y = jnp.concatenate([y, y[..., : c_in - c_out]], axis=-1)
        return y
    dt = timeit(f"resnet {c_in}->{c_out} res={res}{tag}", step, x, params)
    return dt * n_inst


def attention_core(c, seq, impl):
    from seed_story_tpu.ops.attention import mha, mha_reference

    heads = c // CFG.attention_head_dim
    q = jax.random.normal(jax.random.PRNGKey(0),
                          (2, heads, seq, CFG.attention_head_dim), CFG.dtype)

    def f(qq):
        if impl == "xla":
            o = mha_reference(qq, qq, qq, causal=False)
        else:
            o = mha(qq, qq, qq, causal=False, implementation=impl)
        return o

    return timeit(f"attn-core c={c} seq={seq} [{impl}]", f, q)


def groupnorm_silu(c, res):
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                      param_dtype=jnp.float32)
    x = jnp.zeros((2, res, res, c), CFG.dtype) + 0.1
    params = jax.jit(lambda: gn.init(jax.random.PRNGKey(0),
                                     x.astype(jnp.float32)))()

    def f(xx, pp):
        y = gn.apply(pp, xx.astype(jnp.float32)).astype(CFG.dtype)
        return nn.silu(y)

    return timeit(f"groupnorm+silu c={c} res={res}", f, x, params)


def full_eval_and_vae():
    from seed_story_tpu.models.sdxl.adapter import SDXLAdapter, SDXLAdapterConfig
    from seed_story_tpu.models.sdxl.vae import AutoencoderKL, VAEConfig

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

    def f(l, pp):
        eps = sdxl.apply({"params": pp}, l, jnp.full((2,), 500.0),
                         prompt, pooled, tids, method=sdxl.denoise)
        return (l + 0.01 * eps).astype(l.dtype)

    t_eval = timeit("FULL adapter.denoise (B=2 CFG)", f, lat, params)

    vae = AutoencoderKL(VAEConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16))
    vp = nn.meta.unbox(jax.jit(lambda: vae.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)))["params"])())
    z = jnp.zeros((1, 128, 128, 4), jnp.bfloat16) + 0.1
    t_vae = timeit("VAE decode 1024px", lambda zz, pp: (
        vae.apply({"params": pp}, zz, method=vae.decode).mean() + zz), z, vp,
        n=max(2, REPS // 4))
    return t_eval, t_vae


def main():
    print(f"backend={jax.default_backend()}  reps={REPS}")
    t_tr640 = transformer_block(640, 4096, 10)
    t_tr1280 = transformer_block(1280, 1024, 60)
    t_res = 0.0
    t_res += resnet_block(320, 320, 128, 3)
    t_res += resnet_block(640, 320, 128, 2, " (up-concat)")
    t_res += resnet_block(640, 640, 64, 3)
    t_res += resnet_block(1280, 640, 64, 2, " (up-concat)")
    t_res += resnet_block(1280, 1280, 32, 5)
    t_res += resnet_block(2560, 1280, 32, 2, " (up-concat)")
    for impl in ("pallas", "xla"):
        attention_core(640, 4096, impl)
        attention_core(1280, 1024, impl)
    groupnorm_silu(320, 128)
    t_eval, t_vae = full_eval_and_vae()
    model = t_tr640 + t_tr1280 + t_res
    print("-" * 60)
    print(f"transformers 640x10 = {t_tr640*1e3:7.1f} ms")
    print(f"transformers 1280x60= {t_tr1280*1e3:7.1f} ms")
    print(f"resnets (17)        = {t_res*1e3:7.1f} ms")
    print(f"component sum       = {model*1e3:7.1f} ms")
    print(f"measured full eval  = {t_eval*1e3:7.1f} ms")
    print(f"VAE decode          = {t_vae*1e3:7.1f} ms")
    print(f"image (50 evals)    = {t_eval*50 + t_vae:7.2f} s")


if __name__ == "__main__":
    main()
