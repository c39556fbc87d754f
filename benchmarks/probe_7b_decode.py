"""7B LLaMA decode/prefill speed on one TPU chip (bf16, LoRA r16).

--int8: weight-only int8 projections/lm_head (quantize_llama_params) —
decode at B=1 is HBM-bound on parameter bytes, so int8 targets ~2x.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
INT8 = "--int8" in sys.argv
KVINT8 = "--kvint8" in sys.argv
CACHE = 512
for a in sys.argv[1:]:
    if a.startswith("--cache="):
        CACHE = int(a.split("=")[1])
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from seed_story_tpu.models.llama import LlamaConfig, LlamaForCausalLM, KVCache
import flax.linen as nn
# LLaMA-2-7B exact shape, bf16 params (13.4GB), 512-slot cache (1.1GB)
cfg = LlamaConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, lora_rank=16,
                  quantize_base=INT8, quantize_kv=KVINT8)
m = LlamaForCausalLM(cfg)
print("int8 weight-only:", INT8, "int8 kv:", KVINT8, flush=True)
ids = jnp.ones((1, 8), jnp.int32)
t0=time.time()
p = jax.jit(lambda: m.init(jax.random.PRNGKey(0), ids)["params"])()
p = nn.meta.unbox(p)
jax.block_until_ready(p)
print("7B init:", round(time.time()-t0,1), "s", flush=True)
n_params = sum(x.size for x in jax.tree_util.tree_leaves(p))
print(f"params: {n_params/1e9:.2f}B", flush=True)

def decode_n(p, cache, tok, n):
    def body(i, carry):
        cache, tok = carry
        out = m.apply({"params": p}, tok[None, None], cache=cache)
        nxt = jnp.argmax(out["logits"][0, 0]).astype(jnp.int32)
        return out["cache"], nxt
    cache, tok = jax.lax.fori_loop(0, n, body, (cache, tok))
    return tok
f = jax.jit(decode_n, static_argnames="n")
cache = KVCache.create(cfg, 1, CACHE, jnp.bfloat16)
print("cache slots:", CACHE, flush=True)
t0=time.time()
r = int(f(p, cache, jnp.int32(5), 64))
print("decode compile+run:", round(time.time()-t0,1), "s", flush=True)
best=1e9
for _ in range(3):
    t0=time.perf_counter(); r=int(f(p, cache, jnp.int32(5), 64)); best=min(best,time.perf_counter()-t0)
print(f"7B decode: {best/64*1e3:.1f} ms/token -> {64/best:.1f} tokens/s (B=1, one v5e chip)", flush=True)
# prefill throughput at seq 1280
ids1280 = jnp.ones((1, 1280), jnp.int32)
fp = jax.jit(lambda p, i: m.apply({"params": p}, i)["logits"].sum())
r = float(fp(p, ids1280))
best=1e9
for _ in range(3):
    t0=time.perf_counter(); r=float(fp(p, ids1280)); best=min(best,time.perf_counter()-t0)
print(f"7B prefill 1280 tokens: {best*1e3:.0f} ms -> {1280/best:.0f} tokens/s; "
      f"~{2*6.74e9*1280/best/1e12:.1f} TF/s", flush=True)
