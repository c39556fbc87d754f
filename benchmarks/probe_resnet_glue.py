"""How much of the SDXL resnet path is normalization/elementwise glue?

probe_conv_int8.py showed chained convs run ~65-80 TF/s in isolation —
far above the ~42 TF/s the in-situ resnet stack achieves
(probe_sdxl_stubs.py). The difference must be the glue between convs:
GroupNorm (multi-pass reduction that breaks XLA fusion), SiLU, time-emb
add, residual add. This probe times, at each SDXL-1024 resnet geometry:

  (a) conv-only chain            (the MXU floor)
  (b) conv+SiLU chain            (does XLA fuse the activation? ~free)
  (c) full resnet-block chain    (GN -> SiLU -> conv -> +temb -> GN ->
                                  SiLU -> conv -> +skip, flax GroupNorm)

(c)-(a) is the per-block glue cost; summed over the real block counts it
bounds what a fused Pallas GroupNorm+SiLU kernel could recover.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def best_of(f, *args, n_iter=3):
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n_iter):
        t0 = time.perf_counter()
        out = f(*args)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def group_norm(x, gamma, beta, groups=32, eps=1e-5):
    b, h, w, c = x.shape
    xg = x.reshape(b, h * w, groups, c // groups).astype(jnp.float32)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return (xg.reshape(b, h, w, c) * gamma + beta).astype(x.dtype)


N_CH = 24
B = 2
for res, c in ((128, 320), (64, 640), (32, 1280)):
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, res, res, c), jnp.bfloat16)
    w1 = jax.random.normal(k, (3, 3, c, c), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(k, (3, 3, c, c), jnp.bfloat16) * 0.02
    temb = jax.random.normal(k, (B, c), jnp.bfloat16)
    gamma = jnp.ones((c,), jnp.float32)
    beta = jnp.zeros((c,), jnp.float32)

    def conv(x_, w_):
        return jax.lax.conv_general_dilated(
            x_, w_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def conv_only(x_):
        for i in range(N_CH):
            x_ = conv(x_, w1 if i % 2 else w2) * 0.5
        return x_

    @jax.jit
    def conv_silu(x_):
        for i in range(N_CH):
            x_ = conv(nn.silu(x_), w1 if i % 2 else w2) * 0.5
        return x_

    @jax.jit
    def resnet_chain(x_):
        # N_CH//2 full blocks = N_CH convs, reference block layout
        # (adapter_modules/diffusers ResnetBlock2D semantics)
        for _ in range(N_CH // 2):
            h_ = conv(nn.silu(group_norm(x_, gamma, beta)), w1)
            h_ = h_ + temb[:, None, None, :]
            h_ = conv(nn.silu(group_norm(h_, gamma, beta)), w2)
            x_ = (x_ + h_) * 0.5
        return x_

    fl = N_CH * 2 * B * res * res * 9 * c * c
    ta = best_of(conv_only, x)
    tb = best_of(conv_silu, x)
    tc = best_of(resnet_chain, x)
    print(
        f"{res}x{res}x{c}: conv {ta*1e3:6.2f} ms ({fl/ta/1e12:5.1f} TF/s)  "
        f"+silu {tb*1e3:6.2f}  full-block {tc*1e3:6.2f}  "
        f"glue/conv = {(tc-ta)/N_CH*1e3:5.2f} ms", flush=True,
    )
