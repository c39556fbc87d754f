"""LLaMA-2 in flax.linen, TPU-first.

Capability-parity with the reference's two LLaMA forks
(/root/reference/src/models_clm/modeling_llama_xformer.py and
modeling_llama_4_35.py) redesigned for XLA:

  * attention runs through the Pallas flash kernel (ops/attention.py) —
    causal for training, bottom-right-aligned for multi-token decode
    (the xformers fork's LowerTriangularFromBottomRightMask, :281-295)
  * GQA-ready (num_kv_heads), RoPE with linear/dynamic-NTK scaling
    (4_35 fork :151-192)
  * the fork's model-owned ``past_key_values``/``kv_cache_head`` mutable
    state (:676-679,778-784) becomes an explicit, fixed-capacity
    ``KVCache`` pytree threaded through ``__call__`` — jit-stable, no
    dynamic shapes; callers may append many tokens at once
  * LoRA (r/alpha/dropout on all 7 projections) is a first-class module
    parameter set (``lora_a``/``lora_b``), mirroring
    configs/clm_models/llama2chat7b_lora.yaml; trainability masks are
    built by ``lora_trainable_mask``
  * weights carry flax logical-axis names so pjit can lay them out for
    DP/FSDP/TP from a single rule table (parallel/sharding.py)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import mha
from ..ops.rope import apply_rope, rope_frequencies

Dtype = Any


def _maybe_sharded_mha(cfg, q, k, v, *, q_start, kv_len, implementation="auto"):
    """Causal attention, run inside a shard_map over the TP axis when
    ``cfg.shard_attention_axis`` names one of the active mesh's axes (heads
    are independent, so attention on the local head shard is exact). See the
    config field docstring for why this matters under pjit."""
    b, h, s, _ = q.shape
    if q_start is None:
        q_start = jnp.zeros((b,), jnp.int32)
    if kv_len is None:
        kv_len = jnp.full((b,), k.shape[2], jnp.int32)

    axis = cfg.shard_attention_axis
    if axis is not None and s > 1:
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        try:  # context mesh without the deprecated pxla alias
            from jax._src import mesh as _mesh_lib

            mesh = _mesh_lib.thread_resources.env.physical_mesh
        except Exception:  # pragma: no cover - older jax fallback
            from jax.interpreters import pxla

            mesh = pxla.thread_resources.env.physical_mesh
        if (
            not mesh.empty
            and axis in mesh.shape
            and h % mesh.shape[axis] == 0
            and k.shape[1] % mesh.shape[axis] == 0
        ):
            spec = P(None, axis, None, None)
            fn = shard_map(
                lambda q, k, v, qs, kl: mha(
                    q, k, v, causal=True, q_start=qs, kv_len=kl,
                    implementation=implementation,
                ),
                mesh=mesh,
                in_specs=(spec, spec, spec, P(None), P(None)),
                out_specs=spec,
                check_rep=False,
            )
            return fn(q, k, v, q_start, kv_len)
    return mha(q, k, v, causal=True, q_start=q_start, kv_len=kv_len,
               implementation=implementation)


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32066  # 32000 + 66 multimodal tokens
    # Embedding/lm_head tables are padded to this size so the vocab axis
    # tiles onto the MXU and divides the FSDP/TP mesh axes; logits beyond
    # vocab_size are masked to -inf. None -> round up to a multiple of 128.
    padded_vocab_size: Optional[int] = None
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None  # None -> MHA
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_scaling_type: Optional[str] = None  # None | 'linear' | 'dynamic'
    rope_scaling_factor: float = 1.0
    tie_word_embeddings: bool = False
    # LoRA (0 disables). Reference: r=16, alpha=32, dropout=0.05 on all 7
    # projections (llama2chat7b_lora.yaml).
    lora_rank: int = 0
    lora_alpha: float = 32.0
    lora_dropout: float = 0.05
    # Tensor-parallel attention: when set to a mesh axis name (e.g.
    # "model"), multi-token attention (prefill / training) runs inside a
    # shard_map over that axis so the Pallas kernel operates on the LOCAL
    # head shard — without this, a pallas_call under pjit is a single-device
    # computation and XLA all-gathers the full Q/K/V first (PARITY gap #5).
    # Heads (q and kv) must divide the axis size; falls back to the gathered
    # path otherwise. None = off.
    shard_attention_axis: Optional[str] = None
    # rematerialize each decoder layer in training (trade FLOPs for
    # activation memory — required to fit 7B training on 16GB chips)
    remat: bool = False
    # lax.scan over decoder layers (no-cache path only): ONE compiled layer
    # body instead of a num_hidden_layers-way unrolled HLO. Shrinks the
    # training graph ~L-fold (compile time AND the program the TPU worker
    # must hold — the round-1 >1B-param on-chip crash was graph-size
    # related) at the cost of a stacked (L, ...) param layout; convert with
    # stack_layer_params / unstack_layer_params. Decode (cache) paths keep
    # per-layer buffers and require unstacked params.
    scan_layers: bool = False
    # Training CE in sequence chunks of this size (0 = whole sequence at
    # once): never materializes the (B, S, V) logits/log-softmax — at
    # 7B/seq-1280 those fp32+bf16 buffers are ~470MB of HLO temp, the
    # difference between fitting and OOMing the 16GB chip. Backward
    # recomputes each chunk's logits (remat inside the scan).
    ce_chunk_size: int = 0
    # Weight-only int8 for the 7 projection kernels (per-output-channel
    # symmetric scales; LoRA/norms/embeddings/lm_head stay high precision —
    # the reference recipe trains those). Two uses: (1) B=1 decode is
    # HBM-bound on parameter reads, so halving the bytes nearly halves
    # ms/token; (2) QLoRA-style training — the base was frozen anyway, and
    # int8 storage is what fits the 7B agent step on one 16GB chip.
    # Convert trained/converted weights with quantize_llama_params.
    quantize_base: bool = False
    # int8 KV cache (per-token-per-head symmetric scales). Long-context
    # decode reads the whole cache buffer every token; int8 halves those
    # bytes. Scales fold into the score/probability vectors outside the
    # matvecs, so the cache is never dequantized into a bf16 copy.
    quantize_kv: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @property
    def vocab_padded(self) -> int:
        if self.padded_vocab_size is not None:
            return self.padded_vocab_size
        return ((self.vocab_size + 127) // 128) * 128

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def kv_heads(self) -> int:
        return self.num_key_value_heads or self.num_attention_heads

    @staticmethod
    def tiny(**kw) -> "LlamaConfig":
        base = dict(
            vocab_size=32066, hidden_size=128, intermediate_size=352,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=512,
        )
        base.update(kw)
        return LlamaConfig(**base)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Fixed-capacity KV cache: one (B, kv_heads, capacity, head_dim) pair
    PER LAYER (tuples, not a stacked array — per-layer buffers let XLA
    alias the dynamic_update_slice in place across decode-loop carries
    instead of re-materializing the whole cache every token), plus the
    per-row fill level (== the reference's ``kv_cache_head``).

    Optional int8 mode (``cfg.quantize_kv`` / ``create(..., quantized=
    True)``): k/v store int8 with a per-(batch, head, token) symmetric
    scale. Decode is HBM-bound on cache reads at long contexts, so
    halving the bytes buys ~1.5 ms/token at 7B story sizes; the scales
    apply OUTSIDE the matvecs (see ops.attention.decode_attention), so no
    dequantized copy is ever materialized on the decode path."""

    k: Tuple[jax.Array, ...]  # L x (B, kv_heads, capacity, head_dim)
    v: Tuple[jax.Array, ...]
    length: jax.Array  # (B,) int32 — tokens already in the cache
    k_scale: Optional[Tuple[jax.Array, ...]] = None  # L x (B, kv_heads, capacity)
    v_scale: Optional[Tuple[jax.Array, ...]] = None

    @classmethod
    def create(cls, cfg: LlamaConfig, batch: int, capacity: int,
               dtype=jnp.bfloat16, quantized: Optional[bool] = None):
        if quantized is None:
            quantized = cfg.quantize_kv
        shape = (batch, cfg.kv_heads, capacity, cfg.head_dim)
        L = cfg.num_hidden_layers
        if quantized:
            sshape = shape[:3]
            return cls(
                k=tuple(jnp.zeros(shape, jnp.int8) for _ in range(L)),
                v=tuple(jnp.zeros(shape, jnp.int8) for _ in range(L)),
                length=jnp.zeros((batch,), jnp.int32),
                k_scale=tuple(jnp.zeros(sshape, jnp.float32) for _ in range(L)),
                v_scale=tuple(jnp.zeros(sshape, jnp.float32) for _ in range(L)),
            )
        return cls(
            k=tuple(jnp.zeros(shape, dtype) for _ in range(L)),
            v=tuple(jnp.zeros(shape, dtype) for _ in range(L)),
            length=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return self.k[0].shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def quantize_kv_rows(x: jax.Array):
    """(..., D) -> int8 rows + per-row symmetric scale (max|x|/127)."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    safe = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(xf / safe[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "weight",
            nn.with_logical_partitioning(nn.initializers.ones, ("embed",)),
            (x.shape[-1],),
            self.param_dtype,
        )
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.eps)
        return (xf * scale.astype(jnp.float32)).astype(self.dtype)


class LoRADense(nn.Module):
    """Dense layer with optional LoRA adapter: y = xW + (alpha/r)·(xA)B.

    With ``quantize=True`` the base kernel is stored int8 with a
    per-output-channel scale (``kernel_scale``); the matmul runs in
    ``dtype`` on the converted weight, so HBM reads the int8 bytes and the
    MXU still sees bf16. LoRA terms stay in ``param_dtype``.
    """

    features: int
    use_bias: bool = False
    lora_rank: int = 0
    lora_alpha: float = 32.0
    lora_dropout: float = 0.0
    kernel_axes: Tuple[str, str] = ("embed", "mlp")
    quantize: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_features = x.shape[-1]
        if self.quantize:
            kernel = self.param(
                "kernel",
                nn.with_logical_partitioning(
                    nn.initializers.zeros, self.kernel_axes
                ),
                (in_features, self.features),
                jnp.int8,
            )
            scale = self.param(
                "kernel_scale",
                nn.with_logical_partitioning(
                    nn.initializers.ones, (self.kernel_axes[-1],)
                ),
                (self.features,),
                self.param_dtype,
            )
            y = jnp.dot(x, kernel.astype(self.dtype)) * scale.astype(self.dtype)
        else:
            kernel = self.param(
                "kernel",
                nn.with_logical_partitioning(
                    nn.initializers.lecun_normal(), self.kernel_axes
                ),
                (in_features, self.features),
                self.param_dtype,
            )
            y = jnp.dot(x, kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.with_logical_partitioning(
                    nn.initializers.zeros, (self.kernel_axes[-1],)
                ),
                (self.features,),
                self.param_dtype,
            )
            y = y + bias.astype(self.dtype)
        if self.lora_rank > 0:
            lora_a = self.param(
                "lora_a",
                nn.with_logical_partitioning(
                    nn.initializers.normal(stddev=0.02), (self.kernel_axes[0], "lora")
                ),
                (in_features, self.lora_rank),
                self.param_dtype,
            )
            lora_b = self.param(
                "lora_b",
                nn.with_logical_partitioning(
                    nn.initializers.zeros, ("lora", self.kernel_axes[-1])
                ),
                (self.lora_rank, self.features),
                self.param_dtype,
            )
            xl = x
            if self.lora_dropout > 0.0 and not deterministic:
                xl = nn.Dropout(rate=self.lora_dropout)(xl, deterministic=False)
            scaling = self.lora_alpha / self.lora_rank
            y = y + scaling * jnp.dot(
                jnp.dot(xl, lora_a.astype(self.dtype)), lora_b.astype(self.dtype)
            )
        return y


class LlamaAttention(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(
        self,
        x,  # (B, S, D)
        *,
        layer_idx: int,
        cache: Optional[KVCache] = None,
        attention_mask: Optional[jax.Array] = None,  # (B, S) 1/0 suffix padding
        seq_lengths: Optional[jax.Array] = None,  # (B,) true new-token count
        deterministic: bool = True,
    ):
        cfg = self.cfg
        b, s, _ = x.shape
        h, hkv, hd = cfg.num_attention_heads, cfg.kv_heads, cfg.head_dim

        def proj(features, name, out_axis):
            return LoRADense(
                features=features,
                lora_rank=cfg.lora_rank,
                lora_alpha=cfg.lora_alpha,
                lora_dropout=cfg.lora_dropout,
                kernel_axes=("embed", out_axis),
                quantize=cfg.quantize_base,
                dtype=cfg.dtype,
                param_dtype=cfg.param_dtype,
                name=name,
            )

        q = proj(h * hd, "q_proj", "heads")(x, deterministic)
        k = proj(hkv * hd, "k_proj", "heads")(x, deterministic)
        v = proj(hkv * hd, "v_proj", "heads")(x, deterministic)

        q = q.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, hkv, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, hkv, hd).transpose(0, 2, 1, 3)

        if cache is not None:
            start = cache.length  # (B,)
        else:
            start = jnp.zeros((b,), jnp.int32)
        positions = start[:, None] + jnp.arange(s)[None, :]  # (B, S)
        cos, sin = rope_frequencies(
            hd,
            positions,
            base=cfg.rope_theta,
            scaling_type=cfg.rope_scaling_type,
            scaling_factor=cfg.rope_scaling_factor,
            max_position_embeddings=cfg.max_position_embeddings,
            seq_len=jnp.max(start) + s,
        )
        q, k = apply_rope(q, k, cos, sin)

        new_cache_slice = None
        if cache is not None:
            # Insert the new K/V at each row's fill level, attend over the
            # whole buffer with per-row limits. vmap over batch keeps the
            # per-row dynamic_update_slice jit-stable.
            def insert(buf, new, st):
                return jax.lax.dynamic_update_slice(buf, new, (0, st, 0))

            def insert2(buf, new, st):  # (H, C) scale rows
                return jax.lax.dynamic_update_slice(buf, new, (0, st))

            k_sc_buf = v_sc_buf = None
            if cache.quantized:
                k_q, k_sc = quantize_kv_rows(k)
                v_q, v_sc = quantize_kv_rows(v)
                k_buf = jax.vmap(insert)(cache.k[layer_idx], k_q, start)
                v_buf = jax.vmap(insert)(cache.v[layer_idx], v_q, start)
                k_sc_buf = jax.vmap(insert2)(cache.k_scale[layer_idx], k_sc, start)
                v_sc_buf = jax.vmap(insert2)(cache.v_scale[layer_idx], v_sc, start)
            else:
                k_buf = jax.vmap(insert)(cache.k[layer_idx], k.astype(cache.k[layer_idx].dtype), start)
                v_buf = jax.vmap(insert)(cache.v[layer_idx], v.astype(cache.v[layer_idx].dtype), start)
            new_cache_slice = (k_buf, v_buf, k_sc_buf, v_sc_buf)
            new_len = seq_lengths if seq_lengths is not None else s
            if s <= 8:
                # small-q decode (single token or a short speculative-verify
                # block): masked matvecs with NO fp32/bf16 cache copy
                # (ops/attention.py decode_attention) — beats both a Pallas
                # launch and the cache-dequantizing multi-token path
                from ..ops.attention import decode_attention

                out = decode_attention(
                    q.astype(cfg.dtype), k_buf, v_buf, kv_len=start + new_len,
                    q_start=start, k_scale=k_sc_buf, v_scale=v_sc_buf,
                )
            else:
                if cache.quantized:
                    # prefill dequantizes once (a single pass over the
                    # buffer) and runs the normal multi-token kernel
                    k_buf = k_buf.astype(cfg.dtype) * k_sc_buf[..., None].astype(cfg.dtype)
                    v_buf = v_buf.astype(cfg.dtype) * v_sc_buf[..., None].astype(cfg.dtype)
                out = _maybe_sharded_mha(
                    cfg,
                    q.astype(cfg.dtype),
                    k_buf.astype(cfg.dtype),
                    v_buf.astype(cfg.dtype),
                    q_start=start,
                    kv_len=start + new_len,
                )
        else:
            kv_len = None
            if attention_mask is not None:
                kv_len = attention_mask.astype(jnp.int32).sum(axis=-1)
            out = _maybe_sharded_mha(cfg, q, k, v, q_start=None, kv_len=kv_len)

        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * hd)
        o_proj = LoRADense(
            features=cfg.hidden_size, lora_rank=cfg.lora_rank,
            lora_alpha=cfg.lora_alpha, lora_dropout=cfg.lora_dropout,
            kernel_axes=("heads", "embed"), quantize=cfg.quantize_base,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="o_proj",
        )
        out = o_proj(out, deterministic)
        return out, new_cache_slice


class LlamaMLP(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg

        def proj(features, name, axes):
            return LoRADense(
                features=features, lora_rank=cfg.lora_rank,
                lora_alpha=cfg.lora_alpha, lora_dropout=cfg.lora_dropout,
                kernel_axes=axes, quantize=cfg.quantize_base,
                dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name,
            )

        gate = proj(cfg.intermediate_size, "gate_proj", ("embed", "mlp"))(x, deterministic)
        up = proj(cfg.intermediate_size, "up_proj", ("embed", "mlp"))(x, deterministic)
        return proj(cfg.hidden_size, "down_proj", ("mlp", "embed"))(
            nn.silu(gate) * up, deterministic
        )


class LlamaDecoderLayer(nn.Module):
    cfg: LlamaConfig
    layer_idx: int

    @nn.compact
    def __call__(self, x, *, cache=None, attention_mask=None, seq_lengths=None,
                 deterministic=True):
        cfg = self.cfg
        h, cache_slice = LlamaAttention(cfg, name="self_attn")(
            RMSNorm(cfg.rms_norm_eps, cfg.dtype, cfg.param_dtype, name="input_layernorm")(x),
            layer_idx=self.layer_idx,
            cache=cache,
            attention_mask=attention_mask,
            seq_lengths=seq_lengths,
            deterministic=deterministic,
        )
        x = x + h
        h = LlamaMLP(cfg, name="mlp")(
            RMSNorm(cfg.rms_norm_eps, cfg.dtype, cfg.param_dtype, name="post_attention_layernorm")(x),
            deterministic,
        )
        return x + h, cache_slice


class LlamaModel(nn.Module):
    cfg: LlamaConfig

    def setup(self):
        cfg = self.cfg
        self.embed_tokens = nn.Embed(
            cfg.vocab_padded,
            cfg.hidden_size,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(stddev=0.02), ("vocab", "embed")
            ),
        )
        if cfg.scan_layers:
            # one block, scanned; params get a leading (L,) axis named
            # 'layer' in the logical-axis metadata (replicated by the rule
            # tables — layers are sharded by their inner dims, not depth)
            self.layers = [LlamaDecoderLayer(cfg, 0, name="layers")]
        else:
            self.layers = [
                LlamaDecoderLayer(cfg, i, name=f"layers_{i}")
                for i in range(cfg.num_hidden_layers)
            ]
        self.norm = RMSNorm(cfg.rms_norm_eps, cfg.dtype, cfg.param_dtype)

    def __call__(
        self,
        input_ids: Optional[jax.Array] = None,
        *,
        inputs_embeds: Optional[jax.Array] = None,
        cache: Optional[KVCache] = None,
        attention_mask: Optional[jax.Array] = None,
        seq_lengths: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        x = inputs_embeds.astype(cfg.dtype)

        use_remat = cfg.remat and cache is None

        def run_layer(layer, x):
            y, _ = layer(
                x, cache=None, attention_mask=attention_mask,
                seq_lengths=seq_lengths, deterministic=deterministic,
            )
            return y

        rematted = nn.remat(run_layer, prevent_cse=False) if use_remat else None

        if cfg.scan_layers:
            if cache is not None:
                raise ValueError(
                    "scan_layers builds stacked (L, ...) params; decode "
                    "needs per-layer cache buffers — unstack the params "
                    "with unstack_layer_params and a scan_layers=False "
                    "config for generation."
                )

            def scan_body(layer, x):
                return run_layer(layer, x), None

            body = nn.remat(scan_body, prevent_cse=False) if use_remat else scan_body
            x, _ = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=cfg.num_hidden_layers,
                metadata_params={nn.meta.PARTITION_NAME: "layer"},
            )(self.layers[0], x)
            return self.norm(x), None

        new_k, new_v, new_ks, new_vs = [], [], [], []
        for i, layer in enumerate(self.layers):
            if use_remat:
                x = rematted(layer, x)
                cache_slice = None
            else:
                x, cache_slice = layer(
                    x, cache=cache, attention_mask=attention_mask,
                    seq_lengths=seq_lengths, deterministic=deterministic,
                )
            if cache_slice is not None:
                new_k.append(cache_slice[0])
                new_v.append(cache_slice[1])
                new_ks.append(cache_slice[2])
                new_vs.append(cache_slice[3])

        x = self.norm(x)

        new_cache = None
        if cache is not None:
            adv = seq_lengths if seq_lengths is not None else x.shape[1]
            quantized = cache.quantized
            new_cache = KVCache(
                k=tuple(new_k), v=tuple(new_v),
                length=cache.length + adv,
                k_scale=tuple(new_ks) if quantized else None,
                v_scale=tuple(new_vs) if quantized else None,
            )
        return x, new_cache

    def embed_tokens_only(self, input_ids):
        """Embedding lookup alone (the agent scatters image features into
        these before the main forward — reference models.py:36)."""
        return self.embed_tokens(input_ids)


class LlamaForCausalLM(nn.Module):
    cfg: LlamaConfig

    def setup(self):
        cfg = self.cfg
        self.model = LlamaModel(cfg)
        # lm_head stays high-precision even under quantize_base: the
        # reference recipe TRAINS it (modules_to_save, peft_models.py) and
        # it is ~2% of decode bytes.
        self.lm_head = LoRADense(
            features=cfg.vocab_padded, lora_rank=0,
            kernel_axes=("embed", "vocab"),
            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
        )

    def __call__(
        self,
        input_ids: Optional[jax.Array] = None,
        *,
        inputs_embeds: Optional[jax.Array] = None,
        cache: Optional[KVCache] = None,
        attention_mask: Optional[jax.Array] = None,
        seq_lengths: Optional[jax.Array] = None,
        logits_indices: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        """``logits_indices`` (B,): compute lm_head logits ONLY at those
        positions -> (B, 1, V). Decode prefill needs just the last true
        prompt position; at 7B/seq-2432 the full (S, 32k) logits cost
        ~160MB live + 0.6 TFLOP of wasted lm_head matmul."""
        hidden, new_cache = self.model(
            input_ids,
            inputs_embeds=inputs_embeds,
            cache=cache,
            attention_mask=attention_mask,
            seq_lengths=seq_lengths,
            deterministic=deterministic,
        )
        if logits_indices is not None:
            head_in = jnp.take_along_axis(
                hidden, logits_indices[:, None, None], axis=1
            )  # (B, 1, D)
        else:
            head_in = hidden
        logits = self.lm_head(head_in)
        if self.cfg.vocab_padded != self.cfg.vocab_size:
            pad_mask = jnp.arange(self.cfg.vocab_padded) >= self.cfg.vocab_size
            logits = jnp.where(pad_mask, jnp.asarray(-1e9, logits.dtype), logits)
        return {"logits": logits, "hidden_states": hidden, "cache": new_cache}

    def embed(self, input_ids):
        return self.model.embed_tokens_only(input_ids)

    def hidden_states(
        self, input_ids=None, *, inputs_embeds=None, attention_mask=None,
        seq_lengths=None, deterministic=True,
    ):
        """Decoder stack only — no lm_head. Pair with :meth:`chunked_loss`
        to train without ever materializing (B, S, V) logits."""
        hidden, _ = self.model(
            input_ids, inputs_embeds=inputs_embeds,
            attention_mask=attention_mask, seq_lengths=seq_lengths,
            deterministic=deterministic,
        )
        return hidden

    def chunked_loss(self, hidden, labels, ignore_index: int = -100):
        """Next-token CE, numerically equal to
        ``cross_entropy_loss(lm_head(hidden), labels)``, computed in
        ``cfg.ce_chunk_size`` sequence chunks inside a rematerialized scan:
        each chunk's logits (and fp32 log-softmax) live only inside one
        scan iteration, and the backward recomputes them per chunk."""
        cfg = self.cfg
        chunk = cfg.ce_chunk_size or hidden.shape[1]
        h = hidden[:, :-1]
        lab = labels[:, 1:]
        b, s, d = h.shape
        pad = (-s) % chunk
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        lab = jnp.pad(lab, ((0, 0), (0, pad)), constant_values=ignore_index)
        n_chunks = (s + pad) // chunk
        h = h.reshape(b, n_chunks, chunk, d).transpose(1, 0, 2, 3)
        lab = lab.reshape(b, n_chunks, chunk).transpose(1, 0, 2)

        vocab_pad = (
            jnp.arange(cfg.vocab_padded) >= cfg.vocab_size
            if cfg.vocab_padded != cfg.vocab_size else None
        )

        def body(head, carry, xs):
            hc, lc = xs
            logits = head(hc).astype(jnp.float32)
            if vocab_pad is not None:
                logits = jnp.where(vocab_pad, -1e9, logits)
            valid = lc != ignore_index
            safe = jnp.where(valid, lc, 0)
            logp = jax.nn.log_softmax(logits, axis=-1)
            tll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
            step = jnp.stack(
                [-(tll * valid).sum(), valid.sum().astype(jnp.float32)]
            )
            return carry + step, None

        scanned = nn.scan(
            nn.remat(body, prevent_cse=False),
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": False},
            in_axes=0,
            length=n_chunks,
        )
        totals, _ = scanned(self.lm_head, jnp.zeros((2,), jnp.float32), (h, lab))
        return totals[0] / jnp.maximum(totals[1], 1.0)


def cross_entropy_loss(logits, labels, ignore_index: int = -100):
    """Mean CE over supervised positions, shifted next-token style
    (HF LlamaForCausalLM semantics: logits[:-1] vs labels[1:])."""
    logits = logits[:, :-1].astype(jnp.float32)
    labels = labels[:, 1:]
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    token_ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    n = jnp.maximum(valid.sum(), 1)
    return -(token_ll * valid).sum() / n


def stack_layer_params(params):
    """Unrolled param layout (``layers_0`` .. ``layers_{L-1}`` siblings) ->
    the ``scan_layers`` layout (one ``layers`` subtree whose leaves carry a
    leading (L,) axis). Recursive, so agent trees ({'llm': {'model': ...}})
    convert in one call. Operates on plain (unboxed) arrays."""
    import re

    def convert(d):
        if not isinstance(d, dict):
            return d
        layer_keys = sorted(
            (k for k in d if re.fullmatch(r"layers_\d+", k)),
            key=lambda k: int(k.rsplit("_", 1)[1]),
        )
        out = {k: convert(v) for k, v in d.items() if k not in layer_keys}
        if layer_keys:
            out["layers"] = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *(d[k] for k in layer_keys)
            )
        return out

    return convert(nn.meta.unbox(params))


def unstack_layer_params(params):
    """Inverse of :func:`stack_layer_params` — split the stacked ``layers``
    subtree back into per-layer ``layers_{i}`` siblings (the layout the
    decode/cache path requires)."""

    def convert(d):
        if not isinstance(d, dict):
            return d
        out = {}
        for k, v in d.items():
            if k == "layers" and isinstance(v, dict):
                n = jax.tree_util.tree_leaves(v)[0].shape[0]
                for i in range(n):
                    out[f"layers_{i}"] = jax.tree_util.tree_map(
                        lambda x, i=i: x[i], v
                    )
            else:
                out[k] = convert(v)
        return out

    return convert(nn.meta.unbox(params))


_QUANT_MODULES = frozenset(
    ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
     "down_proj")
)


def quantize_llama_params(params):
    """bf16/fp32 param tree -> the layout a ``quantize_base=True`` model
    expects: each projection/lm_head ``kernel`` becomes int8 with a
    per-output-channel symmetric ``kernel_scale`` (scale = col-max|w|/127).
    Everything else (LoRA, norms, embeddings, lm_head, resamplers) is
    untouched, so
    the same function quantizes a full agent tree in place."""

    def quantize_kernel(w):
        w = jnp.asarray(w, jnp.float32)
        scale = jnp.max(jnp.abs(w), axis=0) / 127.0
        scale = jnp.maximum(scale, 1e-8)
        q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return q, scale

    def convert(d, in_quant_module=False):
        if not isinstance(d, dict):
            return d
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = convert(v, k in _QUANT_MODULES)
            elif k == "kernel" and in_quant_module and v.ndim == 2:
                q, scale = quantize_kernel(v)
                out["kernel"] = q
                out["kernel_scale"] = scale
            else:
                out[k] = v
        return out

    return convert(nn.meta.unbox(params))


def lora_trainable_mask(params) -> Any:
    """True for params trained in the reference LoRA recipe
    (peft_models.py:21-66 + llama2chat7b_lora.yaml): lora_a/b, every
    *norm weight (modules_to_save), input embeddings, lm_head.

    Works on boxed (nn.Partitioned) or plain param trees; the returned
    mask tree is unboxed (plain bools), suitable for optax.masked.
    """
    params = nn.meta.unbox(params)

    def mask_fn(path, _):
        names = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
        joined = "/".join(names)
        if "lora_a" in names or "lora_b" in names:
            return True
        if "input_layernorm" in joined or "post_attention_layernorm" in joined:
            return True
        if joined.endswith("model/norm/weight") or "/norm/weight" in joined:
            return True
        if "embed_tokens" in joined or "lm_head" in joined:
            return True
        return False

    return jax.tree_util.tree_map_with_path(mask_fn, params)
