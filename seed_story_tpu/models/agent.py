"""ContinuousLVLM — the MLLM "agent" gluing ViT features into the LLM.

JAX redesign of the reference agent
(/root/reference/src/models_clm/models.py:20-230):

  forward: embed ids -> input_resampler(ViT features) -> SCATTER into the
  token slots marked by ids_cmp_mask -> LLM -> GATHER hidden states at
  ids_gen_mask -> output_resampler -> cosine regression against the target
  ViT features; total = lm_scale*CE + rec_scale*cosine.

The reference's dynamic boolean indexing (``input_embeds[ids_cmp_mask] =
image_embeds_lm[embeds_cmp_mask]``, models.py:54,74) is re-expressed with
static shapes: a stable argsort turns "k-th True" into gather/scatter
indices, padded image slots ride along and are masked out of the loss.
Ordering semantics are identical (row-major over (batch, seq); image-major
over the flattened image axis).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .llama import LlamaConfig, LlamaForCausalLM, cross_entropy_loss
from .resampler import Resampler

Dtype = Any


def _selected_first_perm(mask: jax.Array) -> jax.Array:
    """Permutation putting True entries first, preserving order."""
    return jnp.argsort(jnp.logical_not(mask), stable=True)


def scatter_image_embeds(
    input_embeds: jax.Array,  # (B, S, D)
    image_embeds_lm: jax.Array,  # (N, nq, D) flattened image axis
    ids_mask: jax.Array,  # (B, S) bool
    embeds_mask: jax.Array,  # (N,) bool
) -> jax.Array:
    """input_embeds[ids_mask] = image_embeds_lm[embeds_mask].reshape(-1, D),
    with torch boolean-assignment ordering, in static shapes."""
    b, s, d = input_embeds.shape
    n, nq, _ = image_embeds_lm.shape

    perm = _selected_first_perm(embeds_mask)  # selected images first
    src = image_embeds_lm[perm].reshape(n * nq, d)

    flat_mask = ids_mask.reshape(b * s)
    ordinal = jnp.cumsum(flat_mask) - 1  # k-th True -> k
    ordinal = jnp.clip(ordinal, 0, n * nq - 1)
    gathered = src[ordinal].reshape(b, s, d)
    return jnp.where(ids_mask[..., None], gathered.astype(input_embeds.dtype), input_embeds)


def gather_image_hidden(
    hidden: jax.Array,  # (B, S, D)
    ids_mask: jax.Array,  # (B, S) bool
    embeds_mask: jax.Array,  # (N,) bool
    nq: int,
) -> jax.Array:
    """hidden[ids_mask].view(num_sel, nq, D) scattered back onto the full
    (N, nq, D) image axis; unselected image rows are zero."""
    b, s, d = hidden.shape
    n = embeds_mask.shape[0]

    flat = hidden.reshape(b * s, d)
    flat_mask = ids_mask.reshape(b * s)
    order = jnp.argsort(jnp.logical_not(flat_mask), stable=True)[: n * nq]
    blocks = flat[order].reshape(n, nq, d)  # block k == k-th selected image

    perm = _selected_first_perm(embeds_mask)
    out = jnp.zeros((n, nq, d), hidden.dtype).at[perm].set(blocks)
    return jnp.where(embeds_mask[:, None, None], out, 0.0)


def cosine_loss(rec: jax.Array, target: jax.Array, valid: Optional[jax.Array] = None):
    """Mean (1 - cos) over tokens of valid images (reference models.py:13-17)."""
    rec = rec.astype(jnp.float32)
    target = target.astype(jnp.float32)
    # rsqrt(x^2+eps) keeps gradients finite on exactly-zero rows (padded /
    # unselected image blocks are zeroed by gather_image_hidden).
    rec = rec * jax.lax.rsqrt(jnp.sum(rec * rec, -1, keepdims=True) + 1e-12)
    target = target * jax.lax.rsqrt(jnp.sum(target * target, -1, keepdims=True) + 1e-12)
    per_token = 1.0 - (rec * target).sum(-1)  # (N, nq)
    if valid is None:
        return per_token.mean()
    w = valid.astype(jnp.float32)[:, None]
    denom = jnp.maximum(w.sum() * per_token.shape[1], 1.0)
    return (per_token * w).sum() / denom


@dataclasses.dataclass(frozen=True)
class AgentConfig:
    """Agent dims (reference agent_7b_sft.yaml):

    * ``num_img_in_tokens``  — token slots per context image == the input
      resampler's query count (grid 8 -> 64).
    * ``num_img_out_tokens`` — token slots per *generated* image in the
      sequence (64): the hidden-state block gathered at ids_gen_mask and fed
      to the output resampler as KV.
    * the output resampler has its own query grid (16 -> 256), producing the
      reconstruction matched against the ViT's 256 feature tokens.
    """

    llm: LlamaConfig
    input_resampler_grid: int = 8  # 64 queries == num_img_in_tokens
    output_resampler_grid: int = 16  # 256 queries == ViT n_queries
    num_img_out_tokens: int = 64  # gen slots per image in the sequence
    resampler_heads: int = 32
    vit_dim: int = 4096  # ViT output feature dim
    lm_loss_scale: float = 1.0
    rec_loss_scale: float = 1.0

    @property
    def num_img_in_tokens(self) -> int:
        return self.input_resampler_grid**2

    @property
    def num_vit_tokens(self) -> int:
        return self.output_resampler_grid**2

    @staticmethod
    def tiny(**kw) -> "AgentConfig":
        import jax.numpy as _jnp

        base = dict(
            llm=LlamaConfig.tiny(dtype=_jnp.float32),
            input_resampler_grid=2,
            output_resampler_grid=3,
            num_img_out_tokens=9,
            resampler_heads=4,
            vit_dim=128,
        )
        base.update(kw)
        return AgentConfig(**base)


class ContinuousLVLM(nn.Module):
    cfg: AgentConfig

    def setup(self):
        cfg = self.cfg
        d = cfg.llm.hidden_size
        self.llm = LlamaForCausalLM(cfg.llm)
        # input: ViT features (vit_dim) -> LLM token space (hidden_size);
        # output: LLM hidden states -> ViT feature space (vit_dim). In the
        # 7B reference both dims are 4096 (agent_7b_sft.yaml).
        self.input_resampler = Resampler(
            grid_size=cfg.input_resampler_grid, embed_dim=d,
            num_heads=cfg.resampler_heads,
            kv_dim=cfg.vit_dim if cfg.vit_dim != d else None,
            dtype=cfg.llm.dtype, param_dtype=cfg.llm.param_dtype,
        )
        self.output_resampler = Resampler(
            grid_size=cfg.output_resampler_grid, embed_dim=cfg.vit_dim,
            num_heads=cfg.resampler_heads,
            kv_dim=d if d != cfg.vit_dim else None,
            dtype=cfg.llm.dtype, param_dtype=cfg.llm.param_dtype,
        )

    def __call__(
        self,
        input_ids: jax.Array,  # (B, S)
        attention_mask: jax.Array,  # (B, S)
        labels: jax.Array,  # (B, S)
        image_embeds: jax.Array,  # (N, n_vit_tokens, vit_dim), N = B*max_images
        embeds_gen_mask: jax.Array,  # (N,)
        embeds_cmp_mask: jax.Array,  # (N,)
        ids_gen_mask: jax.Array,  # (B, S)
        ids_cmp_mask: jax.Array,  # (B, S)
        deterministic: bool = True,
    ):
        cfg = self.cfg
        input_embeds = self.llm.embed(input_ids)

        image_embeds_lm = self.input_resampler(image_embeds)  # (N, nq_in, D)
        input_embeds = scatter_image_embeds(
            input_embeds, image_embeds_lm, ids_cmp_mask, embeds_cmp_mask
        )

        if cfg.llm.ce_chunk_size:
            # memory-lean path: no (B, S, V) logits — decoder stack, then
            # CE in rematerialized sequence chunks (llama.py chunked_loss)
            hidden = self.llm.hidden_states(
                inputs_embeds=input_embeds,
                attention_mask=attention_mask,
                deterministic=deterministic,
            )
            lm_loss = self.llm.chunked_loss(hidden, labels)
        else:
            out = self.llm(
                inputs_embeds=input_embeds,
                attention_mask=attention_mask,
                deterministic=deterministic,
            )
            lm_loss = cross_entropy_loss(out["logits"], labels)
            hidden = out["hidden_states"]
        gen_blocks = gather_image_hidden(
            hidden, ids_gen_mask, embeds_gen_mask, cfg.num_img_out_tokens
        )  # (N, nq_out_in, D)
        recon_image_embeds = self.output_resampler(gen_blocks)  # (N, 256, D)
        rec_loss = cosine_loss(recon_image_embeds, image_embeds, valid=embeds_gen_mask)

        total = cfg.lm_loss_scale * lm_loss + cfg.rec_loss_scale * rec_loss
        return {
            "total_loss": total,
            "lm_loss": lm_loss,
            "rec_loss": rec_loss,
            "recon_image_embeds": recon_image_embeds,
        }

    # ---- generation-time pieces (driven by decode/generate.py) ----

    def embed_with_images(
        self, input_ids, image_embeds, ids_cmp_mask, embeds_cmp_mask
    ):
        """Prefill embeddings with image features scattered in
        (reference ContinuousLVLM.generate:127-135)."""
        input_embeds = self.llm.embed(input_ids)
        image_embeds_lm = self.input_resampler(image_embeds)
        return scatter_image_embeds(
            input_embeds, image_embeds_lm, ids_cmp_mask, embeds_cmp_mask
        )

    def llm_step(self, inputs_embeds, cache, attention_mask=None,
                 seq_lengths=None, logits_indices=None):
        return self.llm(inputs_embeds=inputs_embeds, cache=cache,
                        attention_mask=attention_mask, seq_lengths=seq_lengths,
                        logits_indices=logits_indices)

    def embed_tokens(self, input_ids):
        return self.llm.embed(input_ids)

    def resample_output(self, hidden_blocks):
        """(N, num_img_out_tokens, D) hidden states -> (N, 256, D) image
        features for the de-tokenizer."""
        return self.output_resampler(hidden_blocks)


class SEEDLLaMAAlignGeneration(nn.Module):
    """Align-only agent variant (reference models.py:233-336): a FROZEN
    LLM with just the output resampler trained on the cosine
    reconstruction loss (no CE, no input resampler — captions enter as
    plain text). The reference freezes via ``requires_grad_(False)``;
    here the hidden states are ``stop_gradient``-ed, so the LLM
    contributes no parameter gradients while the resampler still learns
    from them (mask the optimizer with :func:`align_trainable_mask` to
    also drop the dead LLM slots from the update)."""

    cfg: AgentConfig

    def setup(self):
        cfg = self.cfg
        self.llm = LlamaForCausalLM(cfg.llm)
        d = cfg.llm.hidden_size
        self.output_resampler = Resampler(
            grid_size=cfg.output_resampler_grid, embed_dim=cfg.vit_dim,
            num_heads=cfg.resampler_heads,
            kv_dim=d if d != cfg.vit_dim else None,
            dtype=cfg.llm.dtype, param_dtype=cfg.llm.param_dtype,
        )

    def __call__(
        self,
        input_ids: jax.Array,  # (B, S)
        attention_mask: jax.Array,  # (B, S)
        labels: jax.Array,  # (B, S) — unused (parity with the reference signature)
        image_embeds: jax.Array,  # (N, n_vit_tokens, vit_dim)
        embeds_gen_mask: jax.Array,  # (N,)
        embeds_cmp_mask: jax.Array,  # (N,) — unused (no input resampler)
        ids_gen_mask: jax.Array,  # (B, S)
        ids_cmp_mask: jax.Array,  # (B, S) — unused
        deterministic: bool = True,
    ):
        del labels, embeds_cmp_mask, ids_cmp_mask
        cfg = self.cfg
        hidden = self.llm.hidden_states(
            inputs_embeds=self.llm.embed(input_ids),
            attention_mask=attention_mask,
            deterministic=deterministic,
        )
        hidden = jax.lax.stop_gradient(hidden)  # llm.requires_grad_(False)
        gen_blocks = gather_image_hidden(
            hidden, ids_gen_mask, embeds_gen_mask, cfg.num_img_out_tokens
        )
        recon = self.output_resampler(gen_blocks)
        rec_loss = cosine_loss(recon, image_embeds, valid=embeds_gen_mask)
        return {"total_loss": rec_loss, "rec_loss": rec_loss,
                "recon_image_embeds": recon}

    # generation-time pieces: identical surface to ContinuousLVLM minus the
    # input-image path, so decode/generate.StoryGenerator drives this model
    # too (text-seeded stories; reference align .generate feeds hidden
    # states 0..eoi through the output resampler the same way).
    def embed_tokens(self, input_ids):
        return self.llm.embed(input_ids)

    def embed_with_images(self, input_ids, image_embeds, ids_cmp_mask,
                          embeds_cmp_mask):
        del image_embeds, ids_cmp_mask, embeds_cmp_mask
        return self.llm.embed(input_ids)

    def llm_step(self, inputs_embeds, cache, attention_mask=None,
                 seq_lengths=None, logits_indices=None):
        return self.llm(inputs_embeds=inputs_embeds, cache=cache,
                        attention_mask=attention_mask, seq_lengths=seq_lengths,
                        logits_indices=logits_indices)

    def resample_output(self, hidden_blocks):
        return self.output_resampler(hidden_blocks)


def align_trainable_mask(params) -> Any:
    """optax mask: True only on output_resampler params (the reference
    trains exactly that set — everything else is frozen)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    mask = {k: (k[0] == "output_resampler") for k in flat}
    return flax.traverse_util.unflatten_dict(mask)
