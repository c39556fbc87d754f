"""SDXL-base UNet2DConditionModel in flax, TPU-first.

Functional parity with the diffusers UNet the reference drives
(/root/reference/src/train/train_sdxl_img2img_llm.py:225-231,
src/models_ipa/adapter_modules.py:330-343): SDXL base-1.0 architecture —
blocks [DownBlock2D, CrossAttnDownBlock2D, CrossAttnDownBlock2D] with
transformer depths [0, 2, 10], mid depth 10, linear projections,
cross-attention dim 2048, and the 'text_time' additional embedding
(time_ids -> 256-d sincos x6 + pooled text 1280 -> 2816 -> 1280).

TPU-first choices: NHWC layout (conv + MXU friendly), bf16 compute with
f32 params/norms, attention through the shared Pallas flash kernel.
Module names mirror diffusers' state_dict for the weight converter.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn

from ...ops.groupnorm import FastGroupNorm
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import mha

Dtype = Any


def _init(axes):
    """Default kernel init + logical axes (parallel/sharding.py rules):
    'heads'/'mlp' dims shard over the model axis under fsdp_tp (Megatron-
    style TP of the transformer blocks and convs) and over data under fsdp
    (ZeRO-3-style param sharding). Un-annotated params stay replicated."""
    return nn.with_logical_partitioning(nn.initializers.lecun_normal(), axes)


class QDense(nn.Module):
    """nn.Dense with optional weight-only int8 storage.

    ``quantize=False`` is parameter- and numerics-identical to ``nn.Dense``
    (same param names/shapes/init, same dtype promotion), so the bf16 param
    tree, the weight converters, and the pinned golden tests are unchanged.
    ``quantize=True`` stores ``kernel`` int8 with a per-output-channel
    ``kernel_scale`` (the ``LoRADense quantize`` recipe, llama.py:277-294):
    HBM streams the int8 bytes, the MXU sees ``dtype``. Inference-only —
    the UNet is frozen in every reference training stage.
    """

    features: int
    use_bias: bool = True
    quantize: bool = False
    kernel_init: Any = nn.linear.default_kernel_init
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        if self.quantize:
            kernel = self.param("kernel", nn.initializers.zeros,
                                (in_features, self.features), jnp.int8)
            scale = self.param("kernel_scale", nn.initializers.ones,
                               (self.features,), self.param_dtype)
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
            y = y * scale.astype(self.dtype)
        else:
            kernel = self.param("kernel", self.kernel_init,
                                (in_features, self.features), self.param_dtype)
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


class QConv(nn.Module):
    """nn.Conv (NHWC/HWIO) with optional weight-only int8 storage.

    Per-output-channel scales commute with the convolution
    (conv(x, W·s_cout) == conv(x, W)·s_cout), so the int8 path convs the
    int8-cast kernel in ``dtype`` and scales the output — one multiply per
    output channel, no bf16 weight copy in HBM. ``quantize=False`` matches
    ``nn.Conv`` exactly. Supports the paddings this UNet uses (int or
    'VALID') and symmetric strides.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 0  # int (symmetric) or "VALID"; always set explicitly for 3x3
    quantize: bool = False
    kernel_init: Any = nn.linear.default_kernel_init
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        c_in = x.shape[-1]
        shape = (kh, kw, c_in, self.features)
        if self.padding == "VALID":
            padding = "VALID"
        else:
            p = int(self.padding)
            padding = ((p, p), (p, p))
        if self.quantize:
            kernel = self.param("kernel", nn.initializers.zeros, shape, jnp.int8)
            scale = self.param("kernel_scale", nn.initializers.ones,
                               (self.features,), self.param_dtype)
        else:
            kernel = self.param("kernel", self.kernel_init, shape,
                                self.param_dtype)
            scale = None
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=self.strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if scale is not None:
            y = y * scale.astype(self.dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return y + bias.astype(self.dtype)


# module names whose kernels are stored int8 under cfg.quantize — the
# transformer projections + the resnet/sampler convs (the parameter bulk;
# ~2.4GB of bf16 streaming per eval). The conditioning MLPs
# (time_embedding / add_embedding / time_emb_proj) and the 4-channel
# conv_in/conv_out edges stay bf16: tiny, applied once per eval, and the
# most quality-sensitive.
QUANTIZED_MODULES = frozenset({
    "to_q", "to_k", "to_v", "to_out_0", "net_0_proj", "net_2",
    "proj_in", "proj_out", "conv1", "conv2", "conv_shortcut", "conv",
})


def quantize_unet_params(params):
    """bf16/f32 UNet param tree -> the ``cfg.quantize=True`` layout.

    Every ``kernel`` directly under a module named in QUANTIZED_MODULES
    becomes int8 with a per-output-channel ``kernel_scale`` (symmetric,
    max|w|/127 over all non-output axes) — the same recipe as
    ``quantize_llama_params`` (llama.py). Other leaves pass through.
    """
    import flax

    params = nn.meta.unbox(params)
    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        if path[-1] == "kernel" and len(path) >= 2 and \
                path[-2] in QUANTIZED_MODULES:
            w = jnp.asarray(leaf, jnp.float32)
            axes = tuple(range(w.ndim - 1))
            scale = jnp.max(jnp.abs(w), axis=axes) / 127.0
            scale = jnp.maximum(scale, 1e-8)
            q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
            out[path] = q
            out[path[:-1] + ("kernel_scale",)] = scale
        else:
            out[path] = leaf
    return flax.traverse_util.unflatten_dict(out)


@dataclasses.dataclass(frozen=True)
class SDXLUNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280)
    down_block_types: Tuple[str, ...] = (
        "DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"
    )
    up_block_types: Tuple[str, ...] = (
        "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"
    )
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = (1, 2, 10)
    attention_head_dim: int = 64
    cross_attention_dim: int = 2048
    # 'text_time' (SDXL) or None (SD-1.5-style: no added conditioning)
    addition_embed_type: Optional[str] = "text_time"
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816  # 6*256 + 1280
    pooled_projection_dim: int = 1280
    norm_num_groups: int = 32
    # weight-only int8 storage for the transformer projections and
    # resnet/sampler convs (QUANTIZED_MODULES); load with
    # quantize_unet_params. Inference-only (the UNet is frozen in every
    # reference training stage); measured output divergence bound is
    # pinned in tests/test_sdxl_parity.py::test_unet_int8_close_to_float.
    quantize: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4  # 1280

    @staticmethod
    def tiny(**kw) -> "SDXLUNetConfig":
        base = dict(
            block_out_channels=(32, 64, 64),
            transformer_layers_per_block=(1, 1, 2),
            attention_head_dim=16,
            cross_attention_dim=64,
            addition_time_embed_dim=32,
            projection_class_embeddings_input_dim=32 * 6 + 64,
            pooled_projection_dim=64,
            norm_num_groups=16,
            dtype=jnp.float32,
        )
        base.update(kw)
        return SDXLUNetConfig(**base)


def get_timestep_embedding(
    timesteps: jax.Array,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: int = 10000,
) -> jax.Array:
    """diffusers get_timestep_embedding, float32."""
    half = embedding_dim // 2
    exponent = -np.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[..., None] * jnp.exp(exponent)[None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class TimestepEmbedding(nn.Module):
    dim: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     kernel_init=_init(("embed_kv", "mlp")), name="linear_1")(x)
        x = nn.silu(x)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                        kernel_init=_init(("mlp", "embed_kv")), name="linear_2")(x)


class ResnetBlock2D(nn.Module):
    out_channels: int
    cfg: SDXLUNetConfig

    @nn.compact
    def __call__(self, x, temb):
        cfg = self.cfg
        c_in = x.shape[-1]
        h = FastGroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                               param_dtype=cfg.param_dtype,
                               name="norm1")(x)
        h = nn.silu(h)
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=cfg.dtype,
                  param_dtype=cfg.param_dtype, quantize=cfg.quantize,
                  kernel_init=_init((None, None, "embed_kv", "mlp")),
                  name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype,
                     kernel_init=_init(("embed_kv", "mlp")),
                     name="time_emb_proj")(
            nn.silu(temb))
        h = h + t[:, None, None, :]
        h = FastGroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                               param_dtype=cfg.param_dtype,
                               name="norm2")(h)
        h = nn.silu(h)
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=cfg.dtype,
                  param_dtype=cfg.param_dtype, quantize=cfg.quantize,
                  kernel_init=_init((None, None, "embed_kv", "mlp")),
                  name="conv2")(h)
        if c_in != self.out_channels:
            x = QConv(self.out_channels, (1, 1), dtype=cfg.dtype,
                      param_dtype=cfg.param_dtype, quantize=cfg.quantize,
                      name="conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    """diffusers Attention: to_q/k/v (no bias) + to_out.0."""

    query_dim: int
    heads: int
    dim_head: int
    quantize: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        b, lq, _ = x.shape
        lk = context.shape[1]
        q = QDense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, quantize=self.quantize,
                     kernel_init=_init(("embed_kv", "heads")), name="to_q")(x)
        k = QDense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, quantize=self.quantize,
                     kernel_init=_init(("embed_kv", "heads")), name="to_k")(context)
        v = QDense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, quantize=self.quantize,
                     kernel_init=_init(("embed_kv", "heads")), name="to_v")(context)
        # NB round 5 measured these transposes as ~free: a kernel variant
        # reading the (B, S, H, D) projection layout directly (whole-head
        # blocks + per-head loop) ran 2.2x SLOWER than transpose+kernel
        # (5.47 vs 2.48 ms at the S=4096 site) — XLA fuses the layout ops,
        # and 2.48 ms including them already sits at the isolated-kernel
        # ceiling. PERF.md "SDXL attention: bshd falsification".
        q = q.reshape(b, lq, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, lk, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, lk, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        out = mha(q, k, v, causal=False)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, inner)
        return QDense(self.query_dim, dtype=self.dtype,
                      param_dtype=self.param_dtype, quantize=self.quantize,
                      kernel_init=_init(("heads", "embed_kv")),
                      name="to_out_0")(out)


class FeedForwardGEGLU(nn.Module):
    dim: int
    mult: int = 4
    quantize: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = QDense(inner * 2, dtype=self.dtype, param_dtype=self.param_dtype,
                   quantize=self.quantize,
                   kernel_init=_init(("embed_kv", "mlp")), name="net_0_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # diffusers GEGLU calls F.gelu (exact erf); jax's default tanh
        # approximation diverges by up to ~1e-3 near |x|=2 — across 50 UNet
        # evals that compounds, so match the exact form
        h = h * nn.gelu(gate, approximate=False)
        return QDense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                      quantize=self.quantize,
                      kernel_init=_init(("mlp", "embed_kv")), name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    quantize: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="norm1")(x.astype(jnp.float32)).astype(self.dtype)
        x = x + CrossAttention(self.dim, self.heads, self.dim_head,
                               quantize=self.quantize,
                               dtype=self.dtype, param_dtype=self.param_dtype,
                               name="attn1")(h)
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="norm2")(x.astype(jnp.float32)).astype(self.dtype)
        x = x + CrossAttention(self.dim, self.heads, self.dim_head,
                               quantize=self.quantize, dtype=self.dtype,
                               param_dtype=self.param_dtype, name="attn2")(h, context)
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="norm3")(x.astype(jnp.float32)).astype(self.dtype)
        return x + FeedForwardGEGLU(self.dim, quantize=self.quantize,
                                    dtype=self.dtype,
                                    param_dtype=self.param_dtype, name="ff")(h)


class Transformer2DModel(nn.Module):
    channels: int
    n_layers: int
    cfg: SDXLUNetConfig

    @nn.compact
    def __call__(self, x, context):
        cfg = self.cfg
        b, h, w, c = x.shape
        heads = c // cfg.attention_head_dim
        residual = x
        y = FastGroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                               param_dtype=cfg.param_dtype,
                               name="norm")(x)
        y = y.reshape(b, h * w, c)
        y = QDense(c, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                   quantize=cfg.quantize,
                   name="proj_in")(y)  # use_linear_projection
        for i in range(self.n_layers):
            y = BasicTransformerBlock(
                c, heads, cfg.attention_head_dim, quantize=cfg.quantize,
                dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                name=f"transformer_blocks_{i}",
            )(y, context)
        y = QDense(c, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                   quantize=cfg.quantize, name="proj_out")(y)
        return residual + y.reshape(b, h, w, c)


class Downsample2D(nn.Module):
    channels: int
    cfg: SDXLUNetConfig

    @nn.compact
    def __call__(self, x):
        # diffusers pads (0,1,0,1) then convs stride 2 with VALID-ish pad
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return QConv(self.channels, (3, 3), strides=(2, 2), padding="VALID",
                     dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype,
                     quantize=self.cfg.quantize,
                     kernel_init=_init((None, None, "embed_kv", "mlp")),
                     name="conv")(x)


class Upsample2D(nn.Module):
    channels: int
    cfg: SDXLUNetConfig

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return QConv(self.channels, (3, 3), padding=1, dtype=self.cfg.dtype,
                     param_dtype=self.cfg.param_dtype,
                     quantize=self.cfg.quantize,
                     kernel_init=_init((None, None, "embed_kv", "mlp")),
                     name="conv")(x)


class UNet2DConditionModel(nn.Module):
    cfg: SDXLUNetConfig

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # (B, H, W, in_channels) NHWC latents
        timesteps: jax.Array,  # (B,) or scalar
        encoder_hidden_states: jax.Array,  # (B, L, cross_dim)
        time_ids: Optional[jax.Array] = None,  # (B, 6) [text_time only]
        text_embeds: Optional[jax.Array] = None,  # (B, pooled_dim)
    ) -> jax.Array:
        cfg = self.cfg
        ch = cfg.block_out_channels
        b = sample.shape[0]
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (b,))

        # time + added conditioning
        t_emb = get_timestep_embedding(timesteps, ch[0])
        emb = TimestepEmbedding(cfg.time_embed_dim, cfg.dtype, cfg.param_dtype,
                                name="time_embedding")(t_emb.astype(cfg.dtype))
        if cfg.addition_embed_type == "text_time":
            aug = get_timestep_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim
            ).reshape(b, -1)
            aug = jnp.concatenate([text_embeds.astype(jnp.float32), aug], axis=-1)
            aug = TimestepEmbedding(cfg.time_embed_dim, cfg.dtype, cfg.param_dtype,
                                    name="add_embedding")(aug.astype(cfg.dtype))
            emb = emb + aug

        context = encoder_hidden_states.astype(cfg.dtype)
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="conv_in")(
            sample.astype(cfg.dtype))

        # ---- down ----------------------------------------------------
        res_stack = [x]
        n_blocks = len(ch)
        for bi in range(n_blocks):
            has_attn = "CrossAttn" in cfg.down_block_types[bi]
            depth = cfg.transformer_layers_per_block[bi] if has_attn else 0
            for li in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch[bi], cfg,
                                  name=f"down_blocks_{bi}_resnets_{li}")(x, emb)
                if depth > 0:
                    x = Transformer2DModel(ch[bi], depth, cfg,
                                           name=f"down_blocks_{bi}_attentions_{li}")(
                        x, context)
                res_stack.append(x)
            if bi < n_blocks - 1:
                x = Downsample2D(ch[bi], cfg,
                                 name=f"down_blocks_{bi}_downsamplers_0")(x)
                res_stack.append(x)

        # ---- mid -----------------------------------------------------
        mid_depth = cfg.transformer_layers_per_block[-1]
        x = ResnetBlock2D(ch[-1], cfg, name="mid_block_resnets_0")(x, emb)
        x = Transformer2DModel(ch[-1], mid_depth, cfg,
                               name="mid_block_attentions_0")(x, context)
        x = ResnetBlock2D(ch[-1], cfg, name="mid_block_resnets_1")(x, emb)

        # ---- up ------------------------------------------------------
        up_ch = list(reversed(ch))  # (1280, 640, 320)
        up_depths = list(reversed(cfg.transformer_layers_per_block))
        for bi in range(n_blocks):
            has_attn = "CrossAttn" in cfg.up_block_types[bi]
            depth = up_depths[bi] if has_attn else 0
            for li in range(cfg.layers_per_block + 1):
                res = res_stack.pop()
                x = jnp.concatenate([x, res], axis=-1)
                x = ResnetBlock2D(up_ch[bi], cfg,
                                  name=f"up_blocks_{bi}_resnets_{li}")(x, emb)
                if depth > 0:
                    x = Transformer2DModel(up_ch[bi], depth, cfg,
                                           name=f"up_blocks_{bi}_attentions_{li}")(
                        x, context)
            if bi < n_blocks - 1:
                x = Upsample2D(up_ch[bi], cfg,
                               name=f"up_blocks_{bi}_upsamplers_0")(x)

        x = FastGroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                               param_dtype=cfg.param_dtype,
                               name="conv_norm_out")(x)
        x = nn.silu(x).astype(cfg.dtype)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype, name="conv_out")(x)
