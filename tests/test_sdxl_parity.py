"""SDXL UNet/VAE numerics vs torch primitives + pinned forward goldens.

The reference's de-tokenizer numerics live in diffusers
(/root/reference/src/train/train_sdxl_img2img_llm.py:225-228 loads
UNet2DConditionModel/AutoencoderKL; adapter_modules.py:330-343 depends on
exact eps-pred behavior). diffusers is not installed in this environment,
but torch is — so every NHWC primitive our UNet/VAE builds on is golden-
tested here against the torch op diffusers calls:

  * NHWC GroupNorm vs torch.nn.GroupNorm (grouping order under layout
    transpose is a classic silent-divergence spot)
  * asymmetric-pad strided conv vs torch F.pad((0,1,0,1)) + conv2d
    (diffusers Downsample2D)
  * nearest 2x upsample + conv vs F.interpolate (diffusers Upsample2D)
  * GEGLU with EXACT erf gelu vs torch chunk + F.gelu (diffusers GEGLU)
  * timestep embedding flip_sin_to_cos convention vs a torch transcription
    of the published formula (diffusers get_timestep_embedding)
  * ResnetBlock2D end-to-end vs a torch transcription of diffusers'
    ResnetBlock2D (norm-silu-conv x2 + time_emb_proj + shortcut)
  * VAE single-head mid attention vs torch SDPA
  * UNet CrossAttention vs torch SDPA multi-head

plus pinned-literal tiny-UNet / tiny-VAE forward goldens so any future
refactor of the composite modules diffs loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from seed_story_tpu.models.sdxl.unet import (  # noqa: E402
    CrossAttention,
    FeedForwardGEGLU,
    ResnetBlock2D,
    SDXLUNetConfig,
    UNet2DConditionModel,
    get_timestep_embedding,
    quantize_unet_params,
)
from seed_story_tpu.models.sdxl.vae import (  # noqa: E402
    AutoencoderKL,
    VAEAttention,
    VAEConfig,
)

import flax.linen as nn  # noqa: E402


def nhwc(t):  # torch NCHW tensor -> np NHWC
    return t.detach().numpy().transpose(0, 2, 3, 1)


def nchw(a):  # np NHWC -> torch NCHW tensor
    return torch.from_numpy(np.asarray(a, np.float32).transpose(0, 3, 1, 2))


def conv_kernel(w):  # torch (cout,cin,kh,kw) -> flax (kh,kw,cin,cout)
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


# --------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------


def test_groupnorm_nhwc_matches_torch():
    torch.manual_seed(0)
    B, C, H, W = 2, 32, 6, 6
    G = 8
    x = torch.randn(B, C, H, W)
    m = torch.nn.GroupNorm(G, C, eps=1e-5)
    with torch.no_grad():
        m.weight.copy_(torch.randn(C))
        m.bias.copy_(torch.randn(C))
        ref = m(x)

    gn = nn.GroupNorm(num_groups=G, epsilon=1e-5)
    params = {
        "scale": jnp.asarray(m.weight.detach().numpy()),
        "bias": jnp.asarray(m.bias.detach().numpy()),
    }
    got = gn.apply({"params": params}, jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(np.asarray(got), nhwc(ref), atol=1e-5, rtol=1e-5)


def test_fast_groupnorm_matches_torch():
    """The production GroupNorm (single-pass sum/sumsq stats, fused
    affine — ops/groupnorm.py) vs torch.nn.GroupNorm, including a
    large-mean input to exercise the E[x^2]-E[x]^2 cancellation path."""
    from seed_story_tpu.ops.groupnorm import FastGroupNorm

    torch.manual_seed(7)
    B, C, H, W = 2, 32, 6, 6
    G = 8
    for shift in (0.0, 30.0):
        x = torch.randn(B, C, H, W) + shift
        m = torch.nn.GroupNorm(G, C, eps=1e-5)
        with torch.no_grad():
            m.weight.copy_(torch.randn(C))
            m.bias.copy_(torch.randn(C))
            ref = m(x)
        gn = FastGroupNorm(num_groups=G, epsilon=1e-5)
        params = {
            "scale": jnp.asarray(m.weight.detach().numpy()),
            "bias": jnp.asarray(m.bias.detach().numpy()),
        }
        got = gn.apply({"params": params}, jnp.asarray(nhwc(x)))
        np.testing.assert_allclose(
            np.asarray(got), nhwc(ref), atol=2e-4, rtol=1e-3
        )


def test_downsample_pad_conv_matches_torch():
    """diffusers Downsample2D: F.pad((0,1,0,1)) + conv2d stride 2 pad 0."""
    torch.manual_seed(1)
    B, C, H, W = 1, 8, 7, 7  # odd spatial: the asymmetric pad matters
    x = torch.randn(B, C, H, W)
    conv = torch.nn.Conv2d(C, 16, 3, stride=2, padding=0)
    with torch.no_grad():
        ref = conv(F.pad(x, (0, 1, 0, 1)))

    xj = jnp.pad(jnp.asarray(nhwc(x)), ((0, 0), (0, 1), (0, 1), (0, 0)))
    fl = nn.Conv(16, (3, 3), strides=(2, 2), padding="VALID")
    params = {
        "kernel": conv_kernel(conv.weight),
        "bias": jnp.asarray(conv.bias.detach().numpy()),
    }
    got = fl.apply({"params": params}, xj)
    np.testing.assert_allclose(np.asarray(got), nhwc(ref), atol=1e-5, rtol=1e-4)


def test_upsample_nearest_conv_matches_torch():
    torch.manual_seed(2)
    B, C, H, W = 1, 8, 5, 5
    x = torch.randn(B, C, H, W)
    conv = torch.nn.Conv2d(C, C, 3, padding=1)
    with torch.no_grad():
        ref = conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))

    xj = jnp.asarray(nhwc(x))
    xj = jax.image.resize(xj, (B, H * 2, W * 2, C), method="nearest")
    fl = nn.Conv(C, (3, 3), padding=1)
    params = {
        "kernel": conv_kernel(conv.weight),
        "bias": jnp.asarray(conv.bias.detach().numpy()),
    }
    got = fl.apply({"params": params}, xj)
    np.testing.assert_allclose(np.asarray(got), nhwc(ref), atol=1e-5, rtol=1e-4)


def test_geglu_matches_torch():
    """diffusers GEGLU: proj -> chunk(2) -> hidden * F.gelu(gate), EXACT
    erf gelu (jax's default tanh approximation diverges by ~1e-3)."""
    torch.manual_seed(3)
    dim = 16
    x = torch.randn(2, 5, dim)
    proj = torch.nn.Linear(dim, dim * 4 * 2)
    out = torch.nn.Linear(dim * 4, dim)
    with torch.no_grad():
        h, gate = proj(x).chunk(2, dim=-1)
        ref = out(h * F.gelu(gate))

    ff = FeedForwardGEGLU(dim, dtype=jnp.float32)
    params = {
        "net_0_proj": {
            "kernel": jnp.asarray(proj.weight.detach().numpy().T),
            "bias": jnp.asarray(proj.bias.detach().numpy()),
        },
        "net_2": {
            "kernel": jnp.asarray(out.weight.detach().numpy().T),
            "bias": jnp.asarray(out.bias.detach().numpy()),
        },
    }
    got = ff.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(
        np.asarray(got), ref.numpy(), atol=2e-5, rtol=1e-4
    )


def test_timestep_embedding_flip_convention():
    """torch transcription of diffusers get_timestep_embedding
    (flip_sin_to_cos=True, downscale_freq_shift=0 — the SDXL time_proj and
    add_time_proj configuration)."""
    dim, max_period = 32, 10000
    t = torch.tensor([0.0, 1.0, 57.0, 999.0])
    half = dim // 2
    exponent = -np.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / half  # downscale_freq_shift=0
    emb = t[:, None].float() * torch.exp(exponent)[None]
    ref = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    ref = torch.cat([ref[:, half:], ref[:, :half]], dim=-1)  # flip

    got = get_timestep_embedding(jnp.asarray(t.numpy()), dim)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5)


class TorchResnetBlock(torch.nn.Module):
    """torch transcription of diffusers ResnetBlock2D (eps 1e-5, silu,
    time_emb_proj after silu on temb, conv_shortcut on channel change)."""

    def __init__(self, c_in, c_out, temb_dim, groups):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(groups, c_in, eps=1e-5)
        self.conv1 = torch.nn.Conv2d(c_in, c_out, 3, padding=1)
        self.time_emb_proj = torch.nn.Linear(temb_dim, c_out)
        self.norm2 = torch.nn.GroupNorm(groups, c_out, eps=1e-5)
        self.conv2 = torch.nn.Conv2d(c_out, c_out, 3, padding=1)
        self.conv_shortcut = (
            torch.nn.Conv2d(c_in, c_out, 1) if c_in != c_out else None
        )

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


def test_resnet_block_matches_torch():
    torch.manual_seed(4)
    c_in, c_out, temb_dim, G = 16, 32, 24, 16
    ref_m = TorchResnetBlock(c_in, c_out, temb_dim, G)
    x = torch.randn(2, c_in, 6, 6)
    temb = torch.randn(2, temb_dim)
    with torch.no_grad():
        ref = ref_m(x, temb)

    cfg = SDXLUNetConfig.tiny(norm_num_groups=G)
    blk = ResnetBlock2D(c_out, cfg)
    params = {
        "norm1": {
            "scale": jnp.asarray(ref_m.norm1.weight.detach().numpy()),
            "bias": jnp.asarray(ref_m.norm1.bias.detach().numpy()),
        },
        "conv1": {
            "kernel": conv_kernel(ref_m.conv1.weight),
            "bias": jnp.asarray(ref_m.conv1.bias.detach().numpy()),
        },
        "time_emb_proj": {
            "kernel": jnp.asarray(ref_m.time_emb_proj.weight.detach().numpy().T),
            "bias": jnp.asarray(ref_m.time_emb_proj.bias.detach().numpy()),
        },
        "norm2": {
            "scale": jnp.asarray(ref_m.norm2.weight.detach().numpy()),
            "bias": jnp.asarray(ref_m.norm2.bias.detach().numpy()),
        },
        "conv2": {
            "kernel": conv_kernel(ref_m.conv2.weight),
            "bias": jnp.asarray(ref_m.conv2.bias.detach().numpy()),
        },
        "conv_shortcut": {
            "kernel": conv_kernel(ref_m.conv_shortcut.weight),
            "bias": jnp.asarray(ref_m.conv_shortcut.bias.detach().numpy()),
        },
    }
    got = blk.apply(
        {"params": params}, jnp.asarray(nhwc(x)), jnp.asarray(temb.numpy())
    )
    np.testing.assert_allclose(np.asarray(got), nhwc(ref), atol=2e-5, rtol=1e-4)


def test_vae_attention_matches_torch_sdpa():
    """diffusers VAE mid-block Attention (heads=1): GroupNorm ->
    q/k/v -> SDPA(scale=1/sqrt(c)) -> to_out residual."""
    torch.manual_seed(5)
    C, G = 32, 8
    x = torch.randn(1, C, 4, 4)
    norm = torch.nn.GroupNorm(G, C, eps=1e-6)
    q_l, k_l, v_l, o_l = (torch.nn.Linear(C, C) for _ in range(4))
    with torch.no_grad():
        y = norm(x).flatten(2).transpose(1, 2)  # (B, HW, C)
        q, k, v = q_l(y), k_l(y), v_l(y)
        a = F.scaled_dot_product_attention(
            q[:, None], k[:, None], v[:, None]
        )[:, 0]
        ref = x + o_l(a).transpose(1, 2).reshape(1, C, 4, 4)

    cfg = VAEConfig.tiny(norm_num_groups=G)
    attn = VAEAttention(C, cfg)

    def lin(m):
        return {
            "kernel": jnp.asarray(m.weight.detach().numpy().T),
            "bias": jnp.asarray(m.bias.detach().numpy()),
        }

    params = {
        "group_norm": {
            "scale": jnp.asarray(norm.weight.detach().numpy()),
            "bias": jnp.asarray(norm.bias.detach().numpy()),
        },
        "to_q": lin(q_l), "to_k": lin(k_l), "to_v": lin(v_l),
        "to_out_0": lin(o_l),
    }
    got = attn.apply({"params": params}, jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(np.asarray(got), nhwc(ref), atol=1e-5, rtol=1e-4)


def test_unet_cross_attention_matches_torch_sdpa():
    """diffusers Attention with use_linear_projection: to_q/k/v no-bias,
    to_out.0 with bias, SDPA over heads."""
    torch.manual_seed(6)
    dim, heads, dim_head, cross = 32, 2, 16, 24
    x = torch.randn(2, 9, dim)
    ctx = torch.randn(2, 7, cross)
    q_l = torch.nn.Linear(dim, heads * dim_head, bias=False)
    k_l = torch.nn.Linear(cross, heads * dim_head, bias=False)
    v_l = torch.nn.Linear(cross, heads * dim_head, bias=False)
    o_l = torch.nn.Linear(heads * dim_head, dim)
    with torch.no_grad():
        q = q_l(x).view(2, 9, heads, dim_head).transpose(1, 2)
        k = k_l(ctx).view(2, 7, heads, dim_head).transpose(1, 2)
        v = v_l(ctx).view(2, 7, heads, dim_head).transpose(1, 2)
        a = F.scaled_dot_product_attention(q, k, v)
        ref = o_l(a.transpose(1, 2).reshape(2, 9, heads * dim_head))

    attn = CrossAttention(dim, heads, dim_head, dtype=jnp.float32)
    params = {
        "to_q": {"kernel": jnp.asarray(q_l.weight.detach().numpy().T)},
        "to_k": {"kernel": jnp.asarray(k_l.weight.detach().numpy().T)},
        "to_v": {"kernel": jnp.asarray(v_l.weight.detach().numpy().T)},
        "to_out_0": {
            "kernel": jnp.asarray(o_l.weight.detach().numpy().T),
            "bias": jnp.asarray(o_l.bias.detach().numpy()),
        },
    }
    got = attn.apply({"params": params}, jnp.asarray(x.numpy()),
                     jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5, rtol=1e-4)


# --------------------------------------------------------------------
# pinned-literal composite goldens (diff loudly on refactor)
# --------------------------------------------------------------------


def _pinned_unet_output():
    cfg = SDXLUNetConfig.tiny()
    model = UNet2DConditionModel(cfg)
    rng = jax.random.PRNGKey(42)
    sample = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, cfg.cross_attention_dim))
    time_ids = jnp.asarray([[1024., 1024., 0., 0., 1024., 1024.]])
    pooled = jax.random.normal(jax.random.PRNGKey(3),
                               (1, cfg.pooled_projection_dim))
    params = model.init(rng, sample, jnp.asarray(57), ctx, time_ids, pooled)
    out = model.apply(params, sample, jnp.asarray(57), ctx, time_ids, pooled)
    return np.asarray(out, np.float64)


def test_tiny_unet_pinned_golden():
    """Literal values recorded from the round-3 implementation (CPU f32,
    highest matmul precision, seeds pinned above). A refactor that changes
    UNet numerics — layout, norm grouping, gelu flavor, skip order — fails
    here even without diffusers installed."""
    out = _pinned_unet_output()
    assert out.shape == (1, 8, 8, 4)
    got = np.array([
        out[0, 0, 0, 0], out[0, 0, 0, 3], out[0, 3, 5, 1],
        out[0, 7, 7, 2], float(out.mean()), float(out.std()),
    ])
    expect = np.array(PINNED_UNET)
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-5)


def _pinned_vae_roundtrip():
    cfg = VAEConfig.tiny()
    model = AutoencoderKL(cfg)
    pixels = jax.random.uniform(
        jax.random.PRNGKey(7), (1, 16, 16, 3), minval=-1.0, maxval=1.0
    )
    params = model.init(jax.random.PRNGKey(8), pixels)
    lat = model.apply(params, pixels, method=model.encode)
    dec = model.apply(params, lat, method=model.decode)
    return np.asarray(lat, np.float64), np.asarray(dec, np.float64)


def test_tiny_vae_pinned_golden():
    lat, dec = _pinned_vae_roundtrip()
    assert lat.shape == (1, 8, 8, 4) and dec.shape == (1, 16, 16, 3)
    got = np.array([
        lat[0, 0, 0, 0], lat[0, 4, 4, 3], float(lat.mean()),
        dec[0, 0, 0, 0], dec[0, 8, 8, 1], float(dec.std()),
    ])
    expect = np.array(PINNED_VAE)
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-5)


# Values regenerated by: python tests/test_sdxl_parity.py --pin (CPU f32)
PINNED_UNET = [0.6633984446525574, -0.32562756538391113, -0.30379918217658997,
               -0.11137188225984573, -0.0349724595034786, 0.5787744410007134]
PINNED_VAE = [-0.030396537855267525, 0.02648029290139675, 0.004884837109784712,
              0.023484529927372932, 1.1310315132141113, 0.6006814380090777]


if __name__ == "__main__":
    import sys

    if "--pin" in sys.argv:
        u = _pinned_unet_output()
        print("PINNED_UNET =", [
            float(u[0, 0, 0, 0]), float(u[0, 0, 0, 3]), float(u[0, 3, 5, 1]),
            float(u[0, 7, 7, 2]), float(u.mean()), float(u.std()),
        ])
        lat, dec = _pinned_vae_roundtrip()
        print("PINNED_VAE =", [
            float(lat[0, 0, 0, 0]), float(lat[0, 4, 4, 3]), float(lat.mean()),
            float(dec[0, 0, 0, 0]), float(dec[0, 8, 8, 1]), float(dec.std()),
        ])


def test_unet_int8_close_to_float():
    """Weight-only int8 UNet (cfg.quantize + quantize_unet_params): the
    quantized param tree matches the quantize=True model's expected layout
    exactly, and the output divergence against the float model is bounded.

    The bound below IS the documented divergence for the int8 de-tokenizer
    flag (VERDICT r3 item 4): per-output-channel symmetric scales, same
    recipe as llama.py quantize_base (KL ~2e-4 there)."""
    cfg = SDXLUNetConfig.tiny()
    model = UNet2DConditionModel(cfg)
    qcfg = SDXLUNetConfig.tiny(quantize=True)
    qmodel = UNet2DConditionModel(qcfg)

    sample = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, cfg.cross_attention_dim))
    time_ids = jnp.asarray([[1024., 1024., 0., 0., 1024., 1024.]])
    pooled = jax.random.normal(jax.random.PRNGKey(3), (1, cfg.pooled_projection_dim))
    t = jnp.asarray(57)

    params = model.init(jax.random.PRNGKey(42), sample, t, ctx, time_ids, pooled)
    qparams = quantize_unet_params(params["params"])

    # layout: quantized tree == the quantize=True model's own init structure
    expect = qmodel.init(jax.random.PRNGKey(0), sample, t, ctx, time_ids, pooled)
    expect = {"params": nn.meta.unbox(expect["params"])}
    import flax
    got_paths = set(flax.traverse_util.flatten_dict(qparams))
    want_paths = set(flax.traverse_util.flatten_dict(expect["params"]))
    assert got_paths == want_paths
    for path, leaf in flax.traverse_util.flatten_dict(expect["params"]).items():
        got = flax.traverse_util.flatten_dict(qparams)[path]
        assert got.shape == leaf.shape, path
        assert got.dtype == leaf.dtype, (path, got.dtype, leaf.dtype)
    n_scales = sum(1 for p in got_paths if p[-1] == "kernel_scale")
    assert n_scales > 10  # transformer denses + resnet/sampler convs

    ref = model.apply(params, sample, t, ctx, time_ids, pooled)
    got = qmodel.apply({"params": qparams}, sample, t, ctx, time_ids, pooled)
    ref = np.asarray(ref, np.float64)
    got = np.asarray(got, np.float64)
    # measured divergence bound: int8 weight-only at tiny scale sits ~1e-3
    # relative; assert an order of margin so real regressions still fail
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02, f"int8 UNet diverged: rel max {rel:.4f}"
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.999, corr
