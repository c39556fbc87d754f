"""d=64 attention kernel speed at SDXL UNet shapes (B=2 CFG batch)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from seed_story_tpu.ops.attention import mha, mha_reference

def bench(f, *args, n=20):
    def chain():
        x = args[0]
        for _ in range(n):
            x = f(x, *args[1:])
        return x.sum()
    g = jax.jit(chain)
    float(g())  # compile
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(g()); best = min(best, time.perf_counter() - t0)
    return best / n

for (b, h, s, d) in [(2, 10, 4096, 64), (2, 20, 1024, 64)]:
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(k2, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(k3, (b, h, s, d), jnp.bfloat16)
    tf = 4 * b * h * s * s * d / 1e12
    t_p = bench(lambda q, k, v: mha(q, k, v, causal=False), q, k, v)
    t_x = bench(lambda q, k, v: mha_reference(q, k, v, causal=False), q, k, v)
    print(f"shape {(b,h,s,d)}: pallas {t_p*1e3:.2f} ms ({tf/t_p:.1f} TF/s) | "
          f"xla {t_x*1e3:.2f} ms ({tf/t_x:.1f} TF/s)", flush=True)
