"""Does int8 MXU compute re-open the SDXL conv ceiling on v5e?

bf16 3x3 convs plateau at ~26-30 TF/s at every SDXL geometry no matter
the formulation (probe_conv_alt.py / probe_conv_geometry.py). v5e's MXU
runs s8xs8->s32 at 2x the bf16 rate (393.7 TOPS); if XLA lowers int8
convs (or the 9-shifted-matmul formulation in int8) onto that path, the
resnet stack's 52 ms/eval could halve — the one software lever left for
<5 s/image. Also probes the int8 GEMM rate as the upper-bound control.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

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


def rnd8(key, shape):
    return jax.random.randint(jax.random.PRNGKey(key), shape, -127, 128,
                              jnp.int32).astype(jnp.int8)


# control: plain GEMM rates, bf16 vs int8 (M=N=K=4096, chained x8)
M = 4096
a8, b8 = rnd8(0, (M, M)), rnd8(1, (M, M))
a16 = a8.astype(jnp.bfloat16)
b16 = b8.astype(jnp.bfloat16)


@jax.jit
def gemm_bf16(a, b):
    for _ in range(64):
        a = (jnp.dot(a, b, preferred_element_type=jnp.float32) / M).astype(
            jnp.bfloat16)
    return a


@jax.jit
def gemm_int8(a, b):
    out = None
    for _ in range(64):
        o = jnp.dot(a, b, preferred_element_type=jnp.int32)
        a = (o >> 12).astype(jnp.int8)
        out = o
    return out


fl = 64 * 2 * M**3
for name, f, args in (("gemm bf16", gemm_bf16, (a16, b16)),
                      ("gemm int8", gemm_int8, (a8, b8))):
    t = best_of(f, *args)
    print(f"{name}: {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TOP/s", flush=True)

# SDXL conv geometries (res, channels): the three resnet tiers at 1024px
for res, c in ((128, 320), (64, 640), (32, 1280)):
    x8 = rnd8(2, (2, res, res, c))
    w8 = rnd8(3, (3, 3, c, c))
    x16, w16 = x8.astype(jnp.bfloat16), w8.astype(jnp.bfloat16)
    n_ch = 64
    cfl = n_ch * 2 * 2 * res * res * 9 * c * c

    def conv(x_, w_, pet):
        return jax.lax.conv_general_dilated(
            x_, w_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet)

    @jax.jit
    def chain_bf16(x_, w_):
        for _ in range(n_ch):
            x_ = (conv(x_, w_, jnp.float32) * 1e-3).astype(jnp.bfloat16)
        return x_

    @jax.jit
    def chain_int8(x_, w_):
        out = None
        for _ in range(n_ch):
            o = conv(x_, w_, jnp.int32)
            x_ = (o >> 10).astype(jnp.int8)
            out = o
        return out

    for name, f, args in ((f"conv bf16 {res}x{res}x{c}", chain_bf16, (x16, w16)),
                          (f"conv int8 {res}x{res}x{c}", chain_int8, (x8, w8))):
        try:
            t = best_of(f, *args)
            print(f"{name}: {t*1e3:7.2f} ms  {cfl/t/1e12:6.1f} TOP/s",
                  flush=True)
        except Exception as e:  # int8 conv may not lower on this backend
            print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:120]})",
                  flush=True)
