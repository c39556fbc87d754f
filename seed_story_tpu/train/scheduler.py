"""LR schedules (optax), mirroring the reference's registry
(/root/reference/src/train/schedular.py): linear / cosine / constant with
warmup, plus the custom cosine-with-min-ratio floor (:35-82) used by the
release scripts (min_lr_ratio 0.05, scripts/sft_storystream.sh)."""

from __future__ import annotations

import math

import optax


def get_cosine_schedule_with_warmup(
    learning_rate: float,
    num_warmup_steps: int,
    num_training_steps: int,
    min_lr_ratio: float = 0.0,
    num_cycles: float = 0.5,
):
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.minimum(step, num_training_steps)
        warmup = learning_rate * step / jnp.maximum(1, num_warmup_steps)
        progress = (step - num_warmup_steps) / jnp.maximum(
            1, num_training_steps - num_warmup_steps
        )
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress))
        decayed = learning_rate * (min_lr_ratio + (1.0 - min_lr_ratio) * cos)
        return jnp.where(step < num_warmup_steps, warmup, decayed)

    return schedule


def get_scheduler(
    name: str,
    learning_rate: float,
    num_warmup_steps: int = 0,
    num_training_steps: int = 0,
    min_lr_ratio: float = 0.0,
):
    if name in ("cosine", "cosine_with_min_lr"):
        return get_cosine_schedule_with_warmup(
            learning_rate, num_warmup_steps, num_training_steps, min_lr_ratio
        )
    if name == "linear":
        return optax.schedules.warmup_linear_schedule(
            init_value=0.0, peak_value=learning_rate,
            warmup_steps=max(1, num_warmup_steps),
            decay_steps=max(1, num_training_steps),
        ) if hasattr(optax.schedules, "warmup_linear_schedule") else optax.linear_schedule(
            learning_rate, 0.0, max(1, num_training_steps), num_warmup_steps
        )
    if name == "constant":
        return lambda step: learning_rate
    if name == "constant_with_warmup":
        def schedule(step):
            import jax.numpy as jnp
            return learning_rate * jnp.minimum(1.0, step / jnp.maximum(1, num_warmup_steps))
        return schedule
    raise ValueError(f"unknown scheduler {name}")
