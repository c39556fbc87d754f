"""Discrete model family (SEED-X heritage).

JAX counterparts of /root/reference/src/models/discrete_models.py. The
release configs ship only ``DiscreteModleIdentity``
(configs/discrete_model/discrete_identity.yaml) — a pass-through between
ViT features and the de-tokenizer — but the family's training losses are
part of the component inventory (SURVEY §2.1):

  * cosine distillation loss (:11-15)
  * in-batch contrastive loss with a CROSS-DEVICE gathered negative pool
    (:18-52): the reference all_gathers features without gradients and
    uses local-batch diagonal targets; here that is ``jax.lax.all_gather``
    + ``stop_gradient`` inside the data-parallel axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def cosine_distill_loss(student, teacher):
    """1 - cos, averaged (reference cosine_loss :11-15)."""
    s = student.astype(jnp.float32)
    t = teacher.astype(jnp.float32)
    s = s * jax.lax.rsqrt(jnp.sum(s * s, -1, keepdims=True) + 1e-12)
    t = t * jax.lax.rsqrt(jnp.sum(t * t, -1, keepdims=True) + 1e-12)
    return (1.0 - (s * t).sum(-1)).mean()


def contrastive_loss(
    image_feats: jax.Array,  # (B, D) normalized or not
    text_feats: jax.Array,  # (B, D)
    logit_scale: jax.Array,
    axis_name: Optional[str] = None,
):
    """CLIP-style InfoNCE with cross-device negatives.

    Matches reference discrete_models.py:18-52: features are L2-normalized,
    the negative pool is the ALL-GATHERED batch (gathered without gradient
    — stop_gradient, like concat_all_gather), targets are the local
    diagonal offset by the device's shard position.
    """
    def norm(x):
        x = x.astype(jnp.float32)
        return x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-12)

    image_feats = norm(image_feats)
    text_feats = norm(text_feats)
    b = image_feats.shape[0]

    if axis_name is not None:
        all_image = jax.lax.stop_gradient(
            jax.lax.all_gather(image_feats, axis_name, tiled=True)
        )
        all_text = jax.lax.stop_gradient(
            jax.lax.all_gather(text_feats, axis_name, tiled=True)
        )
        rank = jax.lax.axis_index(axis_name)
        offset = rank * b
    else:
        all_image, all_text = image_feats, text_feats
        offset = 0

    logits_i2t = logit_scale * image_feats @ all_text.T
    logits_t2i = logit_scale * text_feats @ all_image.T
    targets = jnp.arange(b) + offset

    def ce(logits):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, targets[:, None], axis=-1).mean()

    return (ce(logits_i2t) + ce(logits_t2i)) / 2.0


@dataclasses.dataclass(frozen=True)
class DiscreteConfig:
    dim: int = 4096
    codebook_size: int = 8192
    commit_beta: float = 0.25
    dtype: Any = jnp.float32


class DiscreteModelIdentity(nn.Module):
    """The shipped pass-through (reference :120-130): encode==decode==x."""

    @nn.compact
    def __call__(self, image_embeds, *args, **kwargs):
        return {"total_loss": jnp.float32(0.0), "recon": image_embeds}

    def encode_image_embeds(self, image_embeds):
        return image_embeds


# Backwards-compatible alias matching the reference's (sic) class names.
DiscreteModleIdentity = DiscreteModelIdentity


class VectorQuantizer(nn.Module):
    """VQ layer for the stage-1 tokenizer variants: nearest-codebook
    assignment with straight-through estimator + commitment loss."""

    codebook_size: int
    dim: int

    @nn.compact
    def __call__(self, x):
        codebook = self.param(
            "codebook", nn.initializers.normal(stddev=0.02),
            (self.codebook_size, self.dim), jnp.float32,
        )
        xf = x.astype(jnp.float32)
        d = (
            jnp.sum(xf**2, -1, keepdims=True)
            - 2 * xf @ codebook.T
            + jnp.sum(codebook**2, -1)[None, None]
        )
        idx = jnp.argmin(d, axis=-1)
        quant = codebook[idx]
        commit = jnp.mean((jax.lax.stop_gradient(quant) - xf) ** 2)
        codebook_loss = jnp.mean((quant - jax.lax.stop_gradient(xf)) ** 2)
        quant = xf + jax.lax.stop_gradient(quant - xf)  # straight-through
        return quant.astype(x.dtype), idx, commit, codebook_loss


class DiscreteModelDistill(nn.Module):
    """Qformer-style distillation tokenizer (reference
    DiscreteModleOnlyDistill :55-117 family, condensed): project ->
    (optional VQ) -> project back, losses = cosine distill (+ VQ terms)."""

    cfg: DiscreteConfig
    use_vq: bool = False

    @nn.compact
    def __call__(self, image_embeds):
        c = self.cfg
        x = nn.Dense(c.dim, dtype=c.dtype, name="encode_proj")(image_embeds)
        metrics = {}
        if self.use_vq:
            x, idx, commit, codebook_loss = VectorQuantizer(
                c.codebook_size, c.dim, name="quantizer")(x)
            metrics["commit_loss"] = commit
            metrics["codebook_loss"] = codebook_loss
            metrics["codes"] = idx  # host computes code_usage() from these
        recon = nn.Dense(image_embeds.shape[-1], dtype=c.dtype, name="decode_proj")(x)
        distill = cosine_distill_loss(recon, image_embeds)
        total = distill + c.commit_beta * metrics.get("commit_loss", 0.0) + \
            metrics.get("codebook_loss", 0.0)
        return {"total_loss": total, "distill_loss": distill,
                "recon": recon, **metrics}

    def encode_image_embeds(self, image_embeds):
        c = self.cfg
        x = nn.Dense(c.dim, dtype=c.dtype, name="encode_proj")(image_embeds)
        if self.use_vq:
            x, _, _, _ = VectorQuantizer(c.codebook_size, c.dim, name="quantizer")(x)
        return x


class _ProjectPool(nn.Module):
    """Project per-token features and mean-pool to one vector (stands in
    for the reference's qformer/BERT pooled features in the contrastive
    composites)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, name="proj")(x)
        return x.mean(axis=1)


class DiscreteModelStageOneContrastive(nn.Module):
    """Stage-1 contrastive pretraining composite (reference
    DiscreteModleStageOneContrastive, discrete_models.py:133-181):
    image features vs text features with the cross-device negative pool."""

    cfg: DiscreteConfig
    temperature_init: float = 0.07

    @nn.compact
    def __call__(self, image_embeds, text_embeds, axis_name=None):
        img = _ProjectPool(self.cfg.dim, name="image_head")(image_embeds)
        txt = _ProjectPool(self.cfg.dim, name="text_head")(text_embeds)
        logit_scale = self.param(
            "logit_scale",
            lambda *_: jnp.log(1.0 / self.temperature_init)[None],
            (1,), jnp.float32,
        )
        scale = jnp.exp(jnp.clip(logit_scale[0], -10.0, 4.6052))  # <=100
        loss = contrastive_loss(img, txt, scale, axis_name=axis_name)
        return {"total_loss": loss, "contrastive_loss": loss}


class DiscreteModelStageTwoContrastiveDistill(nn.Module):
    """distill + contrastive (reference :184-276)."""

    cfg: DiscreteConfig
    use_vq: bool = True
    contrastive_scale: float = 1.0

    @nn.compact
    def __call__(self, image_embeds, text_embeds, axis_name=None):
        distill = DiscreteModelDistill(self.cfg, use_vq=self.use_vq,
                                       name="distill")(image_embeds)
        contrast = DiscreteModelStageOneContrastive(
            self.cfg, name="contrastive")(
            distill["recon"], text_embeds, axis_name=axis_name)
        total = distill["total_loss"] + self.contrastive_scale * contrast["total_loss"]
        out = {**distill, **contrast, "total_loss": total}
        return out


class DiscreteModelDistillWithDoubleContrastive(nn.Module):
    """distill + contrastive on BOTH pre- and post-quantization features
    (reference :279-424)."""

    cfg: DiscreteConfig
    use_vq: bool = True
    contrastive_scale: float = 1.0

    @nn.compact
    def __call__(self, image_embeds, text_embeds, axis_name=None):
        distill = DiscreteModelDistill(self.cfg, use_vq=self.use_vq,
                                       name="distill")(image_embeds)
        c_pre = DiscreteModelStageOneContrastive(
            self.cfg, name="contrastive_pre")(
            image_embeds, text_embeds, axis_name=axis_name)
        c_post = DiscreteModelStageOneContrastive(
            self.cfg, name="contrastive_post")(
            distill["recon"], text_embeds, axis_name=axis_name)
        total = (distill["total_loss"]
                 + self.contrastive_scale * (c_pre["total_loss"] + c_post["total_loss"]))
        return {**distill, "contrastive_pre": c_pre["total_loss"],
                "contrastive_post": c_post["total_loss"], "total_loss": total}


# Reference-spelling aliases (sic)
DiscreteModleOnlyDistill = DiscreteModelDistill
DiscreteModleStageOneContrastive = DiscreteModelStageOneContrastive
DiscreteModleStageTwoContrastiveDistill = DiscreteModelStageTwoContrastiveDistill
DiscreteModleDistillWithDoubleContrastive = DiscreteModelDistillWithDoubleContrastive


def code_usage(codes: jax.Array) -> int:
    """Unique codebook indices in a batch — the stage-1 'code_usage'
    metric (reference train.py:100-104,277). Host-side helper."""
    import numpy as np

    return int(np.unique(np.asarray(codes)).size)
