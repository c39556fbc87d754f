"""IP-Adapter SD-1.5 sampling pipeline — the IPAdapterSDPipe counterpart.

Reference: /root/reference/src/models_ipa/adapter_modules.py:140-269.
Flow: image -> visual encoder -> discrete model encode -> ip-adapter
image tokens; CFG negatives are the tokens of a ZERO image; text prompt
embeds come from an injected ``encode_text`` callable (the reference
hardwires the SD CLIP text encoder — this framework keeps the text
encoder pluggable since the shipped SEED-Story path is text-encoder-
free) and are concatenated with the image tokens into one context.

TPU design mirrors SDXLImagePipeline: the full CFG + Euler loop plus
VAE decode is ONE jitted ``lax.scan`` program. ``scale`` multiplies the
image tokens — the context-extension analogue of the reference's
decoupled-attention scale knob (see models/ipa_adapters.IPAdapterSD).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.sdxl.schedulers import EulerDiscreteScheduler, SchedulerConfig


@dataclasses.dataclass
class IPASampleConfig:
    height: int = 512
    width: int = 512
    num_inference_steps: int = 30
    guidance_scale: float = 7.5
    latent_channels: int = 4
    vae_scale: int = 8


class IPAdapterSDPipeline:
    def __init__(
        self,
        ip_adapter,  # models.ipa_adapters.IPAdapterSD
        ip_params,
        vae_model,
        vae_params,
        encode_text: Callable[[Any], np.ndarray],  # prompts -> (B, 77, ctx_dim)
        visual_encode: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        encode_discrete: Optional[Callable[[Any], Any]] = None,  # DiscreteModel*
        scheduler: Optional[EulerDiscreteScheduler] = None,
        cfg: IPASampleConfig = IPASampleConfig(),
    ):
        self.ip_adapter = ip_adapter
        self.ip_params = ip_params
        self.vae = vae_model
        self.vae_params = vae_params
        self.encode_text = encode_text
        self.visual_encode = visual_encode
        self.encode_discrete = encode_discrete or (lambda e: e)
        self.scheduler = scheduler or EulerDiscreteScheduler(SchedulerConfig())
        self.cfg = cfg
        self._jitted = None

    def get_image_embeds(self, image_tensor: np.ndarray, return_negative=True):
        """image pixels -> ip-adapter prompt tokens (+ zero-image negatives,
        reference :183-204)."""
        embeds = self.encode_discrete(self.visual_encode(image_tensor))
        tok = self.ip_adapter.apply(
            {"params": self.ip_params}, jnp.asarray(embeds),
            method=self.ip_adapter.encode_image_embeds,
        )
        if not return_negative:
            return tok, None
        neg_embeds = self.encode_discrete(
            self.visual_encode(np.zeros_like(image_tensor))
        )
        neg = self.ip_adapter.apply(
            {"params": self.ip_params}, jnp.asarray(neg_embeds),
            method=self.ip_adapter.encode_image_embeds,
        )
        return tok, neg

    def _build(self):
        cfg = self.cfg
        ts, sigmas = self.scheduler.timesteps_and_sigmas(cfg.num_inference_steps)
        init_sigma = self.scheduler.init_noise_sigma(sigmas)
        ts, sigmas = jnp.asarray(ts), jnp.asarray(sigmas)
        h = cfg.height // cfg.vae_scale
        w = cfg.width // cfg.vae_scale

        def run(ip_params, vae_params, ctx_pos, ctx_neg, rng_key):
            b = ctx_pos.shape[0]
            ctx2 = jnp.concatenate([ctx_neg, ctx_pos], axis=0)
            latents = jax.random.normal(
                rng_key, (b, h, w, cfg.latent_channels), jnp.float32
            ) * init_sigma

            def step(latents, i):
                inp = EulerDiscreteScheduler.scale_model_input(latents, sigmas[i])
                inp2 = jnp.concatenate([inp, inp], axis=0)
                dtype = self.ip_adapter.cfg.unet.dtype
                eps2 = self.ip_adapter.apply(
                    {"params": ip_params}, inp2.astype(dtype),
                    jnp.broadcast_to(ts[i], (2 * b,)), ctx2,
                    method=self.ip_adapter.denoise,
                ).astype(jnp.float32)
                eps_u, eps_c = jnp.split(eps2, 2, axis=0)
                eps = eps_u + cfg.guidance_scale * (eps_c - eps_u)
                return EulerDiscreteScheduler.step(eps, sigmas[i], sigmas[i + 1],
                                                   latents), None

            latents, _ = jax.lax.scan(
                step, latents, jnp.arange(cfg.num_inference_steps)
            )
            return self.vae.apply(
                {"params": vae_params}, latents.astype(self.vae.cfg.dtype),
                method=self.vae.decode,
            )

        self._jitted = jax.jit(run)

    def generate(
        self,
        image_tensor: np.ndarray,  # (B, 3, H, W) transformed condition image
        prompt=None,
        negative_prompt=None,
        scale: float = 1.0,
        seed: int = 42,
    ) -> np.ndarray:
        """Returns uint8 images (B, H, W, 3) (reference :205-269)."""
        if self._jitted is None:
            self._build()
        b = image_tensor.shape[0]
        if prompt is None:
            prompt = ""
        if negative_prompt is None:
            # reference default negative (adapter_modules.py:229)
            negative_prompt = ("monochrome, lowres, bad anatomy, worst "
                               "quality, low quality")
        prompt = [prompt] * b if not isinstance(prompt, list) else prompt
        negative_prompt = ([negative_prompt] * b
                           if not isinstance(negative_prompt, list)
                           else negative_prompt)
        tok, neg_tok = self.get_image_embeds(image_tensor)
        text_pos = jnp.asarray(self.encode_text(prompt))
        text_neg = jnp.asarray(self.encode_text(negative_prompt))
        ctx_pos = jnp.concatenate(
            [text_pos.astype(tok.dtype), scale * tok], axis=1)
        ctx_neg = jnp.concatenate(
            [text_neg.astype(tok.dtype), scale * neg_tok], axis=1)
        pixels = self._jitted(self.ip_params, self.vae_params, ctx_pos,
                              ctx_neg, jax.random.PRNGKey(seed))
        pixels = np.asarray(pixels.astype(jnp.float32))
        return ((np.clip(pixels, -1, 1) + 1) * 127.5).astype(np.uint8)
