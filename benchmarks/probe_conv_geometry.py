"""Conv efficiency control at the SDXL resnet geometries (NHWC, bf16).

The stub ladder shows the resnet path at ~42 TF/s in situ; this measures
pure conv chains to see whether that's intrinsic XLA conv efficiency at
these shapes or something else in the resnet blocks, with best-of-3
timing (single-shot runs through the tunnel can stall).
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
        _ = float(jnp.sum(out).astype(jnp.float32))
        best = min(best, time.perf_counter() - t0)
    return best


def conv_chain(res, c, n=16):
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, c, c), jnp.bfloat16) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(1), (2, res, res, c), jnp.bfloat16)

    @jax.jit
    def run(x, w):
        def body(i, c_):
            y = jax.lax.conv_general_dilated(
                c_, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            return y.astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, x)

    dt = best_of(run, x, w) / n
    fl = 2 * 2 * res * res * 9 * c * c
    print(f"conv {res}x{res}x{c}: {dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} TF/s",
          flush=True)


def matmul_control(n=50):
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
        return jax.lax.fori_loop(0, n, body, x)

    dt = best_of(mm, x, w1, w2) / n
    fl = 2 * 2048 * 1280 * 10240 + 2 * 2048 * 5120 * 1280
    print(f"ff-geometry matmul: {dt*1e3:7.3f} ms  {fl/dt/1e12:6.0f} TF/s",
          flush=True)


if __name__ == "__main__":
    matmul_control()
    conv_chain(128, 320)
    conv_chain(64, 640)
    conv_chain(32, 1280)
