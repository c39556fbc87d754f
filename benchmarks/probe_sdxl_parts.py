"""Per-component SDXL UNet timing on the real TPU chip.

Times each hot sub-module (resnet / transformer block / GroupNorm / VAE
decode) at its in-network shape by chaining N dependent evals inside one
jit (tunnel-safe methodology, see CLAUDE.md) and reports achieved TF/s,
so optimization effort goes where the 50-step sample time actually is.
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import flax.linen as nn

from seed_story_tpu.models.sdxl.unet import (
    BasicTransformerBlock,
    ResnetBlock2D,
    SDXLUNetConfig,
    Transformer2DModel,
)

cfg = SDXLUNetConfig()
B = 2  # CFG pair
N = 200  # dependent chain length


def timeit(name, module, args, flops_per_eval):
    p = nn.meta.unbox(
        jax.jit(lambda: module.init(jax.random.PRNGKey(0), *args))()
    )["params"]

    def chain(p, x, rest):
        def body(i, x):
            out = module.apply({"params": p}, x, *rest)
            # keep shape: blocks are residual (same in/out shape)
            return out.astype(x.dtype)
        return jax.lax.fori_loop(0, N, body, x)

    f = jax.jit(chain)
    x, rest = args[0], tuple(args[1:])
    _ = float(jnp.sum(f(p, x, rest)))  # compile + host read
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(f(p, x, rest)))  # host read = real device time
        best = min(best, time.perf_counter() - t0)
    per = best / N
    print(f"{name:42s} {per*1e3:7.2f} ms/eval  {flops_per_eval/per/1e12:6.1f} TF/s",
          flush=True)
    return per


context = jnp.zeros((B, 77, 2048), jnp.bfloat16)
temb = jnp.zeros((B, 1280), jnp.bfloat16)

# ---- resnets ---------------------------------------------------------
def resnet_flops(hw, cin, cout):
    return B * 2 * hw * hw * (cin * cout + cout * cout) * 9

t_res = {}
for hw, ch in ((128, 320), (64, 640), (32, 1280)):
    m = ResnetBlock2D(ch, cfg)
    x = jnp.zeros((B, hw, hw, ch), jnp.bfloat16)
    t_res[(hw, ch)] = timeit(f"resnet {hw}x{hw}x{ch}", m, (x, temb),
                             resnet_flops(hw, ch, ch))

# ---- transformer blocks ---------------------------------------------
def block_flops(s, d):
    self_qkvo = 4 * 2 * s * d * d
    self_attn = 2 * 2 * s * s * d
    cross = 2 * 2 * s * d * d + 2 * 2 * s * 77 * d + 2 * 2 * 77 * 2048 * d
    ff = 2 * s * d * (8 * d) + 2 * s * (4 * d) * d  # GEGLU 2x(4d) in, 4d out
    return B * (self_qkvo + self_attn + cross + ff)

t_blk = {}
for s, d in ((4096, 640), (1024, 1280)):
    heads = d // cfg.attention_head_dim
    m = BasicTransformerBlock(d, heads, cfg.attention_head_dim,
                              cfg.cross_attention_dim)
    x = jnp.zeros((B, s, d), jnp.bfloat16)
    t_blk[(s, d)] = timeit(f"transformer block s={s} d={d}", m, (x, context),
                           block_flops(s, d))

# ---- full Transformer2D (adds GN + proj_in/out + reshape) ------------
for hw, ch, depth in ((64, 640, 2), (32, 1280, 10)):
    m = Transformer2DModel(ch, depth, cfg)
    x = jnp.zeros((B, hw, hw, ch), jnp.bfloat16)
    fl = depth * block_flops(hw * hw, ch) + B * 2 * 2 * hw * hw * ch * ch
    timeit(f"Transformer2D {hw}x{hw}x{ch} depth={depth}", m, (x, context), fl)

# ---- GroupNorm alone at the big activation ---------------------------
gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32)
x = jnp.zeros((B, 128, 128, 320), jnp.bfloat16)
pgn = jax.jit(lambda: gn.init(jax.random.PRNGKey(0), x.astype(jnp.float32)))()

def gn_chain(p, x):
    def body(i, x):
        y = gn.apply(p, x.astype(jnp.float32)).astype(jnp.bfloat16)
        return nn.silu(y)
    return jax.lax.fori_loop(0, N, body, x)

f = jax.jit(gn_chain)
_ = float(jnp.sum(f(pgn, x)))
best = 1e9
for _i in range(3):
    t0 = time.perf_counter(); _ = float(jnp.sum(f(pgn, x)))
    best = min(best, time.perf_counter() - t0)
bytes_min = 2 * x.size * 2  # bf16 read + write (fp32 cast should stay fused)
print(f"{'GroupNorm(+silu) 128x128x320 fp32-math':42s} {best/N*1e3:7.2f} ms/eval "
      f"{bytes_min/(best/N)/1e9:6.0f} GB/s effective(min-bytes)", flush=True)

# ---- arithmetic: implied full-eval budget ----------------------------
# down: 2 res@128 + [2 res@64 + 2 T2D(d2)@64] + [2 res@32 + 2 T2D(d10)@32]
# mid: 2 res@32 + T2D(d10); up: 3x of each at every level (+concat chans)
est = (
    5 * t_res[(128, 320)] + 5 * t_res[(64, 640)] + 9 * t_res[(32, 1280)]
    + 5 * 2 * t_blk[(4096, 640)] + 6 * 10 * t_blk[(1024, 1280)]
)
print(f"\nimplied UNet eval from parts (B=2 CFG pair; concat-chan "
      f"resnets approximated as same-chan): {est*1e3:.0f} ms -> x50 steps "
      f"= {est*50:.1f} s of the measured ~6.9 s sample (rest: "
      f"up/downsamples, conv_in/out, VAE decode)", flush=True)
