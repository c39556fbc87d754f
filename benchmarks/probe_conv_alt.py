"""Alternative 3x3 SAME conv formulations vs lax.conv on v5e (bf16 NHWC):
(a) 9 shifted matmuls accumulating in f32
(b) im2col + one big matmul
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

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


def run_all(res, c, n=16):
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, c, c), jnp.bfloat16) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(1), (2, res, res, c), jnp.bfloat16)
    fl = 2 * 2 * res * res * 9 * c * c

    def conv_ref(x_, w_):
        return jax.lax.conv_general_dilated(
            x_, w_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def conv_shift(x_, w_):
        b, h, ww, cc = x_.shape
        xp = jnp.pad(x_, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((b, h, ww, cc), jnp.float32)
        for di in range(3):
            for dj in range(3):
                acc += jnp.einsum(
                    "bhwc,cd->bhwd",
                    jax.lax.dynamic_slice(xp, (0, di, dj, 0), (b, h, ww, cc)),
                    w_[di, dj], preferred_element_type=jnp.float32)
        return acc.astype(jnp.bfloat16)

    def conv_im2col(x_, w_):
        b, h, ww, cc = x_.shape
        xp = jnp.pad(x_, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate([
            jax.lax.dynamic_slice(xp, (0, di, dj, 0), (b, h, ww, cc))
            for di in range(3) for dj in range(3)], axis=-1)
        return jnp.einsum("bhwk,kd->bhwd", cols, w_.reshape(9 * cc, cc),
                          preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    for name, f in (("lax.conv", conv_ref), ("9-shift", conv_shift),
                    ("im2col ", conv_im2col)):
        @jax.jit
        def run(x_, w_, f=f):
            return jax.lax.fori_loop(0, n, lambda i, c_: f(c_, w_), x_)

        dt = best_of(run, x, w) / n
        print(f"{name} {res:3d}x{res}x{c:4d}: {dt*1e3:7.3f} ms  "
              f"{fl/dt/1e12:6.1f} TF/s", flush=True)
    # numerics
    a = conv_ref(x, w).astype(np.float32)
    for name, f in (("9-shift", conv_shift), ("im2col", conv_im2col)):
        d = float(jnp.abs(f(x, w).astype(jnp.float32) - a).max())
        print(f"  {name} max|diff| = {d:.2e}", flush=True)


if __name__ == "__main__":
    run_all(128, 320)
    run_all(64, 640)
    run_all(32, 1280)
