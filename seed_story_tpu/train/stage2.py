"""Stage-2 SFT wiring: frozen ViT -> agent CE+cosine loss.

The reference loop (train_clm_sft.py:278-341) encodes images with the
frozen ViT under no_grad then calls the agent; here both live in one jitted
loss so XLA overlaps the ViT forward with the agent's embedding work.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def make_stage2_loss_fn(agent_model, vit_model=None):
    """loss_fn(params, batch, rng[, consts]) -> (loss, metrics).

    If ``vit_model`` is given, batch['images'] (N, 3, H, W) is encoded with
    stop_gradient (frozen ViT, train_clm_sft.py:213-215,282-287) using
    ``consts["vit_params"]`` — the frozen weights ride as a Trainer
    ``loss_consts`` jit ARGUMENT, never a closure constant (closed-over
    arrays bake into the serialized HLO: hour-long 7B lowering, and the
    axon remote-compile rejects the upload with HTTP 413). Otherwise batch
    must carry precomputed 'image_embeds' and the loss takes 3 args.
    """

    def loss_fn(params, batch, rng, consts=None):
        if vit_model is not None:
            image_embeds = vit_model.apply(
                {"params": consts["vit_params"]}, batch["images"])
            image_embeds = jax.lax.stop_gradient(image_embeds)
        else:
            image_embeds = batch["image_embeds"]

        out = agent_model.apply(
            {"params": params},
            input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            labels=batch["labels"],
            image_embeds=image_embeds,
            embeds_gen_mask=batch["embeds_gen_mask"],
            embeds_cmp_mask=batch["embeds_cmp_mask"],
            ids_gen_mask=batch["ids_gen_mask"],
            ids_cmp_mask=batch["ids_cmp_mask"],
            deterministic=False,
            rngs={"dropout": rng},
        )
        metrics = {"lm_loss": out["lm_loss"], "rec_loss": out["rec_loss"]}
        return out["total_loss"], metrics

    return loss_fn
