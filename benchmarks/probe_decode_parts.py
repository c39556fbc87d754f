"""Decode hot-path decomposition at 7B: what do the matvecs themselves
cost vs the full per-token layer (norms, rope, cache update, attention)?

Methodology: N-deep dependent chains inside one jit + a host read.
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

H, FF, L = 4096, 11008, 32
N = 300


def bench(name, f, *args, bytes_per=None):
    _ = float(jnp.sum(f(*args)))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(f(*args)))
        best = min(best, time.perf_counter() - t0)
    per = best / N
    extra = f"  {bytes_per/per/1e9:6.0f} GB/s" if bytes_per else ""
    print(f"{name:46s} {per*1e6:8.1f} us/eval{extra}", flush=True)
    return per


key = jax.random.PRNGKey(0)

# --- 1. pure int8 matvec chain: x(1,H) @ W(H,H) int8 * scale ----------
w8 = jax.random.randint(key, (H, H), -127, 128, jnp.int32).astype(jnp.int8)
sc = jnp.full((H,), 1e-4, jnp.float32)  # decay: chain stays finite with no serial normalize
x0 = jnp.ones((1, H), jnp.bfloat16)


@jax.jit
def mv_int8(x, w, s):
    def body(i, x):
        return jnp.dot(x, w.astype(jnp.bfloat16)) * s.astype(jnp.bfloat16)
    return jax.lax.fori_loop(0, N, body, x)


bench("int8 matvec 4096x4096 (+dequant scale)", mv_int8, x0, w8, sc,
      bytes_per=H * H)

# bf16 comparison
wb = jax.random.normal(key, (H, H), jnp.bfloat16) * 1e-4


@jax.jit
def mv_bf16(x, w):
    def body(i, x):
        return jnp.dot(x, w)
    return jax.lax.fori_loop(0, N, body, x)


bench("bf16 matvec 4096x4096", mv_bf16, x0, wb, bytes_per=H * H * 2)

# --- 2. the 7-projection bundle as separate matvecs -------------------
ws = {
    "q": (H, H), "k": (H, H), "v": (H, H), "o": (H, H),
    "gate": (H, FF), "up": (H, FF), "down": (FF, H),
}
w8s = {k: jax.random.randint(jax.random.PRNGKey(i), s, -127, 128, jnp.int32
                             ).astype(jnp.int8)
       for i, (k, s) in enumerate(ws.items())}
scs = {k: jnp.full((s[1],), 1e-4, jnp.float32) for k, s in ws.items()}
layer_bytes = sum(a * b for a, b in ws.values())


@jax.jit
def seven_mv(x, w, s):
    def body(i, x):
        q = jnp.dot(x, w["q"].astype(jnp.bfloat16)) * s["q"].astype(jnp.bfloat16)
        k_ = jnp.dot(x, w["k"].astype(jnp.bfloat16)) * s["k"].astype(jnp.bfloat16)
        v = jnp.dot(x, w["v"].astype(jnp.bfloat16)) * s["v"].astype(jnp.bfloat16)
        att = q + k_ + v  # stand-in for attention output mixing
        o = jnp.dot(att, w["o"].astype(jnp.bfloat16)) * s["o"].astype(jnp.bfloat16)
        g = jnp.dot(o, w["gate"].astype(jnp.bfloat16)) * s["gate"].astype(jnp.bfloat16)
        u = jnp.dot(o, w["up"].astype(jnp.bfloat16)) * s["up"].astype(jnp.bfloat16)
        d = jnp.dot(jax.nn.silu(g) * u, w["down"].astype(jnp.bfloat16)) * s["down"].astype(jnp.bfloat16)
        return x * jnp.bfloat16(0.5) + d
    return jax.lax.fori_loop(0, N, body, x)


per7 = bench("7 separate int8 matvecs (1 layer's worth)", seven_mv, x0, w8s, scs,
             bytes_per=layer_bytes)

# --- 3. fused: qkv as one (H, 3H), gate+up as one (H, 2FF) ------------
wqkv = jnp.concatenate([w8s["q"], w8s["k"], w8s["v"]], axis=1)
sqkv = jnp.full((3 * H,), 1e-4, jnp.float32)
wgu = jnp.concatenate([w8s["gate"], w8s["up"]], axis=1)
sgu = jnp.full((2 * FF,), 1e-4, jnp.float32)


@jax.jit
def fused_mv(x, wqkv, sqkv, wo, so, wgu, sgu, wd, sd):
    def body(i, x):
        qkv = jnp.dot(x, wqkv.astype(jnp.bfloat16)) * sqkv.astype(jnp.bfloat16)
        q, k_, v = jnp.split(qkv, 3, axis=-1)
        o = jnp.dot(q + k_ + v, wo.astype(jnp.bfloat16)) * so.astype(jnp.bfloat16)
        gu = jnp.dot(o, wgu.astype(jnp.bfloat16)) * sgu.astype(jnp.bfloat16)
        g, u = jnp.split(gu, 2, axis=-1)
        d = jnp.dot(jax.nn.silu(g) * u, wd.astype(jnp.bfloat16)) * sd.astype(jnp.bfloat16)
        return x * jnp.bfloat16(0.5) + d
    return jax.lax.fori_loop(0, N, body, x)


perf_ = bench("fused qkv + gate/up int8 matvecs", fused_mv, x0, wqkv, sqkv,
              w8s["o"], scs["o"], wgu, sgu, w8s["down"], scs["down"],
              bytes_per=layer_bytes)

print(f"\nlayer matvec bytes = {layer_bytes/1e6:.0f} MB; x{L} layers at the "
      f"separate rate = {per7*L*1e3:.2f} ms/token, fused = {perf_*L*1e3:.2f} "
      f"ms/token (measured full model: ~12.2 ms/token incl. attention+lm_head)",
      flush=True)
