"""Time each sub-step of bench.py's setup gates on the real chip.

Round-5 finding to explain: bench3 rehearsal measured gates_s=413 s in a
HEALTHY window (86.6 TF/s, zero gate sleeps) — health_gate's own compute
is ~1 s, so the cost must be connection / program-load / compile
overhead. This probe attributes it.
"""
import time
import sys

sys.path.insert(0, "/root/repo")

t0 = time.time()


def mark(msg):
    print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)


mark("importing jax (axon)")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

mark("jax imported")
from seed_story_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()
mark("compile cache enabled")

d = jax.devices()[0]
mark(f"devices() -> {d}")

# first tiny op: forces backend/tunnel connection + allocation
x = jnp.ones((8, 8), jnp.bfloat16)
jax.block_until_ready(x)
mark("first tiny op done (tunnel connected)")

ks = jax.random.split(jax.random.PRNGKey(0), 3)
jax.block_until_ready(ks)
mark("random.split done")

w1 = jax.random.normal(jax.random.PRNGKey(0), (1280, 10240), jnp.bfloat16)
jax.block_until_ready(w1)
mark("normal #1 (1280,10240)")
w2 = jax.random.normal(jax.random.PRNGKey(1), (5120, 1280), jnp.bfloat16)
jax.block_until_ready(w2)
mark("normal #2 (5120,1280)")
xx = jax.random.normal(jax.random.PRNGKey(2), (2048, 1280), jnp.bfloat16)
jax.block_until_ready(xx)
mark("normal #3 (2048,1280)")


@jax.jit
def mm(x, w1, w2):
    def body(i, c):
        h = jnp.dot(c, w1, preferred_element_type=jnp.float32)
        h1, h2 = jnp.split(h, 2, axis=-1)
        return jnp.dot((h1 * h2).astype(jnp.bfloat16), w2,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return jax.lax.fori_loop(0, 50, body, x)


o = mm(x=xx, w1=w1, w2=w2)
jax.block_until_ready(o)
mark("mm compiled+first-run")

best = 1e9
for i in range(3):
    t1 = time.perf_counter()
    o = mm(xx, w1, w2)
    _ = float(jnp.sum(o).astype(jnp.float32))
    dt = time.perf_counter() - t1
    best = min(best, dt)
    mark(f"mm timed run {i}: {dt*1e3:.0f} ms")

fl = 2 * 2048 * 1280 * 10240 + 2 * 2048 * 5120 * 1280
print(f"health: {fl / (best / 50) / 1e12:.1f} TF/s", flush=True)
mark("DONE")
