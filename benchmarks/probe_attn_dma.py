"""Pin the d=64 DMA pathology: d=128 control, dimension semantics,
head-pair packing (two d=64 heads in one 128-lane block)."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def bench(f, *args, n=20):
    def chain():
        x = args[0]
        for _ in range(n):
            x = f(x, *args[1:])
        return x.sum()
    g = jax.jit(chain)
    float(g())
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(g()); best = min(best, time.perf_counter() - t0)
    return best / n


@functools.partial(jax.jit, static_argnames=("semantics",))
def copy_only(q, k, v, semantics=None):
    b, h, s, d = q.shape

    def kernel(q_ref, k_ref, v_ref, o_ref):
        o_ref[0, 0] = q_ref[0, 0] + v_ref[0, 0]

    cp = (pltpu.CompilerParams(dimension_semantics=semantics)
          if semantics else pltpu.CompilerParams())
    return pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[pl.BlockSpec((1, 1, s, d), lambda b, h: (b, h, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, 1, s, d), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=cp,
    )(q, k, v)


@jax.jit
def attn_packed2(q, k, v):
    """Two d=64 heads packed into one 128-lane block: q',k',v' are
    (b, h/2, s, 128) where [..., :64]=head 2i, [..., 64:]=head 2i+1."""
    b, h, s, d = q.shape
    assert d == 64 and h % 2 == 0
    scale = 1.0 / (d ** 0.5)

    def pack(x):
        # (b,h,s,64) -> (b,h/2,s,128): head pair side by side in lanes
        x = x.reshape(b, h // 2, 2, s, 64)
        return x.transpose(0, 1, 3, 2, 4).reshape(b, h // 2, s, 128)

    def unpack(x):
        x = x.reshape(b, h // 2, s, 2, 64).transpose(0, 1, 3, 2, 4)
        return x.reshape(b, h, s, 64)

    qp, kp, vp = pack(q), pack(k), pack(v)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for i in range(2):
            sl = slice(64 * i, 64 * (i + 1))
            s_ = jax.lax.dot_general(
                q_ref[0, 0][:, sl], k_ref[0, 0][:, sl],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(s_, axis=-1, keepdims=True)
            p = jnp.exp(s_ - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, 0][:, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, 0, :, sl] = (pv / l).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b, h // 2),
        in_specs=[pl.BlockSpec((1, 1, s, 128), lambda b, h: (b, h, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, 1, s, 128), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, s, 128), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qp, kp, vp)
    return unpack(out)


def main():
    b, h, s, d = 2, 20, 1024, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.bfloat16)
    tf = 4 * b * h * s * s * d / 1e12

    t = bench(copy_only, q, k, v)
    print(f"copy d=64  default-sem : {t*1e3:7.2f} ms ({t/(b*h)*1e6:5.1f} us/prog)")
    t = bench(lambda q, k, v: copy_only(q, k, v, ("parallel", "parallel")), q, k, v)
    print(f"copy d=64  parallel-sem: {t*1e3:7.2f} ms ({t/(b*h)*1e6:5.1f} us/prog)")

    q2 = jax.random.normal(ks[0], (b, h // 2, s, 128), jnp.bfloat16)
    k2 = jax.random.normal(ks[1], (b, h // 2, s, 128), jnp.bfloat16)
    v2 = jax.random.normal(ks[2], (b, h // 2, s, 128), jnp.bfloat16)
    t = bench(copy_only, q2, k2, v2)
    print(f"copy d=128 same bytes  : {t*1e3:7.2f} ms ({t/(b*h//2)*1e6:5.1f} us/prog)")

    t = bench(attn_packed2, q, k, v)
    print(f"attn packed-2head d=128: {t*1e3:7.2f} ms  {tf/t:6.1f} TF/s")

    from seed_story_tpu.ops.attention import mha
    ref = mha(q, k, v, causal=False, implementation="xla")
    got = attn_packed2(q, k, v)
    err = float(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)).max())
    print(f"packed-2head max|diff| = {err:.2e}")

    # (seq4096 needs a kv-blocked packed kernel — full scores would blow
    # VMEM; ported into ops/attention.py if seq1024 packing wins)


if __name__ == "__main__":
    main()
