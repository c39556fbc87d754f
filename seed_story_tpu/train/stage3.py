"""Stage-3 de-tokenizer adaptation wiring.

Mirror of the reference loop (train_sdxl_img2img_llm.py:351-422): frozen
ViT -> frozen agent forward with return_recon_image_embeds -> frozen VAE
encode of the target frames -> DDPM noise -> SDXLAdapter eps-MSE; only the
adapter (resampler + to_k/to_v) trains. All frozen stages live inside the
same jitted loss under stop_gradient so XLA can overlap them.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..models.sdxl.schedulers import DDPMScheduler


def select_gen_embeds(recon_image_embeds, embeds_gen_mask, batch_size: int):
    """(B*max_imgs, nq, D) + per-image gen mask -> (B, nq, D): each sample's
    single generation-target image features."""
    n = embeds_gen_mask.shape[0]
    max_imgs = n // batch_size
    mask = embeds_gen_mask.reshape(batch_size, max_imgs)
    idx = jnp.argmax(mask, axis=1) + jnp.arange(batch_size) * max_imgs
    return recon_image_embeds[idx]


def make_stage3_loss_fn(
    adapter_model,
    agent_model,
    vae_model,
    vit_model=None,
    scheduler: Optional[DDPMScheduler] = None,
) -> Callable:
    """loss_fn(params, batch, rng, consts) -> (loss, metrics).

    ``consts`` carries the FROZEN stage weights — ``agent_params``,
    ``vae_params``, and ``vit_params`` when vit_model is given — via the
    Trainer's ``loss_consts`` jit argument. They must never be closure
    constants: closed-over arrays bake into the serialized HLO (hour-long
    lowering at 7B; the axon remote-compile rejects the upload, HTTP 413).
    """
    sch = scheduler or DDPMScheduler()

    def loss_fn(params, batch, rng, consts):
        rng_noise, rng_t, rng_vae = jax.random.split(rng, 3)

        if vit_model is not None:
            image_embeds = vit_model.apply(
                {"params": consts["vit_params"]}, batch["images"])
        else:
            image_embeds = batch["image_embeds"]
        image_embeds = jax.lax.stop_gradient(image_embeds)

        agent_out = agent_model.apply(
            {"params": consts["agent_params"]},
            input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            labels=batch["labels"],
            image_embeds=image_embeds,
            embeds_gen_mask=batch["embeds_gen_mask"],
            embeds_cmp_mask=batch["embeds_cmp_mask"],
            ids_gen_mask=batch["ids_gen_mask"],
            ids_cmp_mask=batch["ids_cmp_mask"],
        )
        b = batch["input_ids"].shape[0]
        recon = jax.lax.stop_gradient(
            select_gen_embeds(
                agent_out["recon_image_embeds"], batch["embeds_gen_mask"], b
            )
        )

        # target latents: (B, 3, H, W) -> NHWC -> VAE encode (sampled)
        sd = jnp.transpose(batch["sd_images"], (0, 2, 3, 1))
        latents = vae_model.apply(
            {"params": consts["vae_params"]}, sd, rng=rng_vae,
            method=vae_model.encode
        )
        latents = jax.lax.stop_gradient(latents)

        noise = jax.random.normal(rng_noise, latents.shape, jnp.float32)
        timesteps = sch.sample_timesteps(rng_t, b)
        noisy = sch.add_noise(latents, noise, timesteps)

        out = adapter_model.apply(
            {"params": params},
            noisy.astype(adapter_model.cfg.unet.dtype),
            timesteps,
            recon,
            batch["time_ids"].astype(jnp.float32),
            noise,
        )
        return out["total_loss"], {"mse_loss": out["total_loss"]}

    return loss_fn
