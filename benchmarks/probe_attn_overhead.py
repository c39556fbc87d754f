"""Isolate the seq-1024 per-program overhead: copy-only kernel, single-pass
softmax kernel (no scratch/when), shape sweep for the cliff."""
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


@jax.jit
def copy_only(q, k, v):
    b, h, s, d = q.shape

    def kernel(q_ref, k_ref, v_ref, o_ref):
        o_ref[0, 0] = q_ref[0, 0] + v_ref[0, 0]

    return pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[pl.BlockSpec((1, 1, s, d), lambda b, h: (b, h, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, 1, s, d), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v)


@jax.jit
def single_pass(q, k, v):
    """One program per (b,h): softmax(qk^T)v straight through, no scratch,
    no running max, no @pl.when."""
    b, h, s, d = q.shape
    scale = 1.0 / (d ** 0.5)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        s_ = jax.lax.dot_general(q_ref[0, 0], k_ref[0, 0],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        m = jnp.max(s_, axis=-1, keepdims=True)
        p = jnp.exp(s_ - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, 0],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o_ref[0, 0] = (pv / l).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[pl.BlockSpec((1, 1, s, d), lambda b, h: (b, h, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, 1, s, d), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v)


@jax.jit
def single_pass_fused_bh(q, k, v):
    """Flatten (b,h) into the grid's single dimension but give each program
    TWO heads of work (rows packed) to halve program count."""
    b, h, s, d = q.shape
    q2 = q.reshape(b * h, s, d)
    k2 = k.reshape(b * h, s, d)
    v2 = v.reshape(b * h, s, d)
    scale = 1.0 / (d ** 0.5)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for i in range(2):  # two heads per program
            s_ = jax.lax.dot_general(q_ref[i], k_ref[i],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
            m = jnp.max(s_, axis=-1, keepdims=True)
            p = jnp.exp(s_ - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[i],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            o_ref[i] = (pv / l).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b * h // 2,),
        in_specs=[pl.BlockSpec((2, s, d), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((2, s, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(q2.shape, q.dtype),
    )(q2, k2, v2)
    return out.reshape(b, h, s, d)


def main():
    shapes = [(2, 20, 1024, 64), (2, 10, 2048, 64), (2, 10, 4096, 64)]
    for (b, h, s, d) in shapes:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, h, s, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, h, s, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, h, s, d), jnp.bfloat16)
        tf = 4 * b * h * s * s * d / 1e12
        progs = b * h
        t = bench(copy_only, q, k, v)
        print(f"{(b,h,s,d)} copy-only   : {t*1e3:7.2f} ms "
              f"({t/progs*1e6:6.1f} us/prog)")
        if s <= 2048:
            t = bench(single_pass, q, k, v)
            print(f"{(b,h,s,d)} single-pass : {t*1e3:7.2f} ms  {tf/t:6.1f} TF/s "
                  f"({t/progs*1e6:6.1f} us/prog)")
            t = bench(single_pass_fused_bh, q, k, v)
            print(f"{(b,h,s,d)} fused-2head : {t*1e3:7.2f} ms  {tf/t:6.1f} TF/s")
            from seed_story_tpu.ops.attention import mha
            ref = mha(q, k, v, causal=False, implementation="xla")
            got = single_pass(q, k, v)
            err = float(jnp.abs(got.astype(jnp.float32) -
                                ref.astype(jnp.float32)).max())
            print(f"{(b,h,s,d)} single-pass max|diff| = {err:.2e}")


if __name__ == "__main__":
    main()
