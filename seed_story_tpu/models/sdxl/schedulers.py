"""Diffusion schedulers (functional, jit-friendly).

Counterparts of the diffusers schedulers the reference uses:
  * DDPMScheduler — stage-3 training noise injection
    (train_sdxl_img2img_llm.py:225,378-386)
  * EulerDiscreteScheduler — inference sampling
    (gen_george.py:60, adapter_modules.py:359-385)

Both use SDXL's scaled-linear betas (0.00085 -> 0.012, 1000 steps,
epsilon prediction). Euler uses 'leading' timestep spacing with
steps_offset=1 and linear sigma interpolation — matching diffusers'
EulerDiscreteScheduler defaults for SDXL-base.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    steps_offset: int = 1
    timestep_spacing: str = "leading"


def alphas_cumprod(cfg: SchedulerConfig) -> np.ndarray:
    if cfg.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(
                cfg.beta_start**0.5, cfg.beta_end**0.5, cfg.num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(
            cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps, dtype=np.float64
        )
    else:
        raise ValueError(cfg.beta_schedule)
    return np.cumprod(1.0 - betas).astype(np.float32)


class DDPMScheduler:
    """Training-side q(x_t | x_0) sampling."""

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig()):
        self.cfg = cfg
        self.alphas_cumprod = jnp.asarray(alphas_cumprod(cfg))

    def add_noise(self, sample, noise, timesteps):
        """sample, noise: (B, ...); timesteps: (B,) int."""
        acp = self.alphas_cumprod[timesteps].astype(jnp.float32)
        shape = (-1,) + (1,) * (sample.ndim - 1)
        sqrt_acp = jnp.sqrt(acp).reshape(shape)
        sqrt_1macp = jnp.sqrt(1.0 - acp).reshape(shape)
        return (
            sqrt_acp * sample.astype(jnp.float32)
            + sqrt_1macp * noise.astype(jnp.float32)
        ).astype(sample.dtype)

    def sample_timesteps(self, rng, batch: int):
        return jax.random.randint(
            rng, (batch,), 0, self.cfg.num_train_timesteps, dtype=jnp.int32
        )


class EulerDiscreteScheduler:
    """Inference-side Euler method over the sigma schedule."""

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig()):
        self.cfg = cfg
        acp = alphas_cumprod(cfg).astype(np.float64)
        self._train_sigmas = np.sqrt((1.0 - acp) / acp)

    def timesteps_and_sigmas(self, num_inference_steps: int) -> Tuple[np.ndarray, np.ndarray]:
        cfg = self.cfg
        if cfg.timestep_spacing == "leading":
            step_ratio = cfg.num_train_timesteps // num_inference_steps
            ts = (
                (np.arange(num_inference_steps) * step_ratio)
                .round()[::-1]
                .astype(np.float64)
            )
            ts += cfg.steps_offset
        elif cfg.timestep_spacing == "linspace":
            ts = np.linspace(
                0, cfg.num_train_timesteps - 1, num_inference_steps, dtype=np.float64
            )[::-1]
        else:
            raise ValueError(cfg.timestep_spacing)
        sigmas = np.interp(ts, np.arange(cfg.num_train_timesteps), self._train_sigmas)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        return ts.astype(np.float32), sigmas

    @staticmethod
    def init_noise_sigma(sigmas: np.ndarray) -> float:
        # 'leading'/'linspace' spacing: (sigma_max^2 + 1) ** 0.5
        return float((sigmas.max() ** 2 + 1.0) ** 0.5)

    @staticmethod
    def scale_model_input(sample, sigma):
        return sample / jnp.sqrt(sigma**2 + 1.0)

    @staticmethod
    def step(model_output, sigma, sigma_next, sample):
        """Epsilon prediction, no churn (reference uses defaults)."""
        denoised = sample - sigma * model_output
        derivative = (sample - denoised) / sigma
        return sample + derivative * (sigma_next - sigma)
