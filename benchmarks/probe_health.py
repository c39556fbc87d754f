"""Chip/tunnel health control: best-of-3 chained-GEMM rate.

The tunnel-attached chip occasionally enters a degraded window where
everything runs ~10x slow (observed twice across rounds: a 1311 ms
SDXL eval vs the normal 135, and a 9 TF/s GEMM control). Run this
before trusting any timing: healthy prints ~80-135 TF/s at the ff
geometry; a reading under ~40 means wait and retry, not a real
regression.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
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
o = mm(x, w1, w2); jax.block_until_ready(o)
# warm the jnp.sum host-read program too — on a rotated backend its remote
# compile otherwise lands inside the first timed iteration (~60 s wall)
_ = float(jnp.sum(o).astype(jnp.float32))
best = 1e9
for _ in range(3):
    t0 = time.perf_counter(); o = mm(x, w1, w2)
    _ = float(jnp.sum(o).astype(jnp.float32))
    best = min(best, time.perf_counter() - t0)
fl = 2*2048*1280*10240 + 2*2048*5120*1280
print(f"ff ceiling: {best/50*1e3:.3f} ms = {fl/(best/50)/1e12:.0f} TF/s")
