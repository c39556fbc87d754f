"""Text-encoder-free SDXL sampling pipeline (CFG + Euler), fully jitted.

Counterpart of the reference's ``StableDiffusionXLPipeline(tokenizer=None,
text_encoder=None, ...)`` usage (adapter_modules.py:359-468): conditioning
comes from image features through the ResamplerXLV2; CFG negatives are the
features of a BLACK image (:387-428); 50 Euler steps by default.

TPU design: the full denoising loop is ONE compiled program
(``lax.scan`` over precomputed sigmas), with the cond/uncond pair batched
into a single UNet call; the VAE decode is fused into the same program.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.sdxl.schedulers import EulerDiscreteScheduler, SchedulerConfig


@dataclasses.dataclass
class SDXLSampleConfig:
    height: int = 1024
    width: int = 1024
    num_inference_steps: int = 50
    guidance_scale: float = 7.5
    latent_channels: int = 4
    vae_scale: int = 8  # spatial downscale of the VAE


class SDXLImagePipeline:
    """Drives adapter.denoise + vae.decode with fixed conditioning."""

    def __init__(
        self,
        adapter_model,
        adapter_params,
        vae_model,
        vae_params,
        scheduler: Optional[EulerDiscreteScheduler] = None,
        cfg: SDXLSampleConfig = SDXLSampleConfig(),
    ):
        self.adapter = adapter_model
        self.adapter_params = adapter_params
        self.vae = vae_model
        self.vae_params = vae_params
        self.scheduler = scheduler or EulerDiscreteScheduler(SchedulerConfig())
        self.cfg = cfg
        self._jitted = None

    def _build(self):
        cfg = self.cfg
        ts, sigmas = self.scheduler.timesteps_and_sigmas(cfg.num_inference_steps)
        init_sigma = self.scheduler.init_noise_sigma(sigmas)
        ts = jnp.asarray(ts)
        sigmas = jnp.asarray(sigmas)

        h = cfg.height // cfg.vae_scale
        w = cfg.width // cfg.vae_scale

        def run(adapter_params, vae_params, image_embeds, neg_image_embeds,
                time_ids, rng_key):
            ap = {"params": adapter_params}
            prompt, pooled = self.adapter.apply(
                ap, image_embeds, method=self.adapter.encode_image_embeds
            )
            nprompt, npooled = self.adapter.apply(
                ap, neg_image_embeds, method=self.adapter.encode_image_embeds
            )
            b = prompt.shape[0]
            # batch [uncond, cond] in one UNet call (reference runs
            # diffusers' concat CFG; identical math)
            prompt2 = jnp.concatenate([nprompt, prompt], axis=0)
            pooled2 = jnp.concatenate([npooled, pooled], axis=0)
            time_ids2 = jnp.concatenate([time_ids, time_ids], axis=0)

            latents = (
                jax.random.normal(
                    rng_key, (b, h, w, cfg.latent_channels), jnp.float32
                )
                * init_sigma
            )

            def step(latents, i):
                sigma = sigmas[i]
                sigma_next = sigmas[i + 1]
                t = ts[i]
                inp = EulerDiscreteScheduler.scale_model_input(latents, sigma)
                inp2 = jnp.concatenate([inp, inp], axis=0)
                eps2 = self.adapter.apply(
                    ap, inp2.astype(self.adapter.cfg.unet.dtype),
                    jnp.broadcast_to(t, (2 * b,)), prompt2, pooled2, time_ids2,
                    method=self.adapter.denoise,
                ).astype(jnp.float32)
                eps_u, eps_c = jnp.split(eps2, 2, axis=0)
                eps = eps_u + cfg.guidance_scale * (eps_c - eps_u)
                latents = EulerDiscreteScheduler.step(eps, sigma, sigma_next, latents)
                return latents, None

            latents, _ = jax.lax.scan(
                step, latents, jnp.arange(cfg.num_inference_steps)
            )
            pixels = self.vae.apply(
                {"params": vae_params}, latents.astype(self.vae.cfg.dtype),
                method=self.vae.decode,
            )
            return pixels  # (B, H, W, 3) in [-1, 1]

        # opt-in per-program XLA compiler options (experimentation knob:
        # client-side XLA_FLAGS can't carry TPU-backend flags through the
        # remote-compile tunnel, but jit compiler_options are proto-backed
        # and forwarded). Format: "key=val,key=val".
        opts = os.environ.get("SEED_STORY_SDXL_XLA_OPTS")
        compiler_options = None
        if opts:
            compiler_options = dict(kv.split("=", 1)
                                    for kv in opts.split(",") if kv)
        self._jitted = jax.jit(run, compiler_options=compiler_options)

    def generate(
        self,
        image_embeds,  # (B, n, embedding_dim) — the agent's regressed feats
        neg_image_embeds,  # (B, n, embedding_dim) — black-image features
        time_ids: Optional[np.ndarray] = None,
        seed: int = 42,
    ) -> np.ndarray:
        """Returns uint8 images (B, H, W, 3)."""
        if self._jitted is None:
            self._build()
        b = int(np.asarray(image_embeds).shape[0])
        if time_ids is None:
            c = self.cfg
            time_ids = np.tile(
                np.array([[c.height, c.width, 0, 0, c.height, c.width]], np.float32),
                (b, 1),
            )
        key = jax.random.PRNGKey(seed) if isinstance(seed, (int, np.integer)) else seed
        pixels = self._jitted(
            self.adapter_params, self.vae_params,
            jnp.asarray(image_embeds), jnp.asarray(neg_image_embeds),
            jnp.asarray(time_ids), key,
        )
        pixels = np.asarray(pixels.astype(jnp.float32))
        return ((np.clip(pixels, -1, 1) + 1) * 127.5).astype(np.uint8)
