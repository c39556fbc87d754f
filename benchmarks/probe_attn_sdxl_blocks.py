"""Pallas attention block-size sweep at the EXACT SDXL UNet shapes.

Round-3 banked 1024x1024 blocks for d<=64 (31-33 TF/s isolated); the
in-situ ladder reads 32-45 ms/eval for the attention cores, i.e. ~33-47
TF/s — the question VERDICT r4 #5 keeps open is whether any remaining
block geometry (or the f32-accum scratch layout) buys the scoped ~10
ms/eval. SDXL-base attention shapes per eval (CFG pair = batch 2):

  self  S=4096  d=64  H=10 (x2 blocks at 128px latent, down/up)
  self  S=1024  d=64  H=20
  cross S=4096 kv=256 d=64 H=10 / S=1024 kv=256 d=64 H=20

Timing: N dependent calls chained in one jit + host read (CLAUDE.md).
"""
import functools
import itertools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from seed_story_tpu.ops.attention import mha  # noqa: E402

N = 24

SHAPES = [  # (name, b, h, sq, skv)
    ("self4096", 2, 10, 4096, 4096),
    ("self1024", 2, 20, 1024, 1024),
    ("cross4096", 2, 10, 4096, 256),
]


def time_case(b, h, sq, skv, block_q, block_kv):
    d = 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, skv, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, skv, d), jnp.bfloat16)

    @jax.jit
    def chain(q, k, v):
        def body(i, c):
            o = mha(c, k, v, causal=False, block_q=block_q,
                    block_kv=block_kv, implementation="pallas")
            return (c + 0.001 * o).astype(c.dtype)
        return jax.lax.fori_loop(0, N, body, q)

    o = chain(q, k, v)
    jax.block_until_ready(o)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        o = chain(q, k, v)
        _ = float(jnp.sum(o).astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / N)
    fl = 4 * b * h * sq * skv * d
    return best, fl / best / 1e12


def main():
    for name, b, h, sq, skv in SHAPES:
        for bq, bkv in [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
                        (2048, 1024), (1024, 2048), (2048, 2048),
                        (4096, 1024), (1024, 4096)]:
            if bq > sq or bkv > skv and bkv > 256:
                if bq > sq or bkv > max(skv, 256):
                    continue
            try:
                dt, tfs = time_case(b, h, sq, skv, bq, bkv)
                print(f"{name} bq={bq} bkv={bkv}: {dt*1e3:.3f} ms = "
                      f"{tfs:.1f} TF/s", flush=True)
            except Exception as e:  # noqa: BLE001 — VMEM overflow etc.
                print(f"{name} bq={bq} bkv={bkv}: {type(e).__name__}",
                      flush=True)


if __name__ == "__main__":
    main()
