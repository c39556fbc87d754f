"""Stage-1 (discrete visual-tokenizer pretraining) entry point.

Equivalent of /root/reference/src/train/train.py: frozen ViT features ->
DiscreteModel* losses (distillation / VQ / contrastive); logs the
cross-rank ``code_usage`` metric for VQ variants (:100-104,277).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..data.story_telling import flatten_images
from ..models.discrete import DiscreteModelDistill, code_usage
from ..models.vit import VisionTransformerWithAttnPool
from ..train.checkpoint import load_params_partial
from ..utils.config import instantiate, load_config
from .runner import RunnerArgs, run_training
from .trainer import TrainConfig


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image_transform", required=True)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--visual_encoder", required=True)
    p.add_argument("--discrete_model", required=True)
    p.add_argument("--train_dataset", required=True)
    p.add_argument("--pretrained_vit_path", default=None)
    p.add_argument("--output_dir", default="output/discrete")
    p.add_argument("--resume_from_checkpoint", default=None)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--lr_scheduler_type", default="cosine")
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--max_steps", type=int, default=10000)
    p.add_argument("--min_lr_ratio", type=float, default=0.05)
    p.add_argument("--save_steps", type=int, default=1000)
    p.add_argument("--log_steps", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mesh_data", type=int, default=None)
    p.add_argument("--sharding", default="dp", choices=["dp", "fsdp", "fsdp_tp"])
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    tokenizer = instantiate(load_config(args.tokenizer))
    image_transform = instantiate(load_config(args.image_transform))
    vit_cfg = instantiate(load_config(args.visual_encoder))
    vit = VisionTransformerWithAttnPool(vit_cfg)
    discrete = instantiate(load_config(args.discrete_model))

    datapipe = instantiate(
        load_config(args.train_dataset),
        tokenizer=tokenizer, image_transform=image_transform,
        sd_image_transform=None,
    )
    first = flatten_images(next(iter(datapipe)))

    import flax.linen as nn

    vit_params = nn.meta.unbox(jax.jit(lambda: vit.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 3, vit_cfg.image_size, vit_cfg.image_size)))["params"])())
    if args.pretrained_vit_path:
        vit_params = load_params_partial(args.pretrained_vit_path, vit_params)

    feats_shape = (first["images"].shape[0], vit_cfg.n_queries, vit_cfg.output_dim)
    abstract = jax.eval_shape(
        lambda: discrete.init(jax.random.PRNGKey(1), jnp.zeros(feats_shape))
    )["params"]

    def init_params():
        return nn.meta.unbox(jax.jit(lambda: discrete.init(
            jax.random.PRNGKey(args.seed), jnp.zeros(feats_shape))["params"])())

    def loss_fn(params, batch, rng):
        feats = jax.lax.stop_gradient(
            vit.apply({"params": vit_params}, batch["images"])
        )
        out = discrete.apply({"params": params}, feats)
        metrics = {k: v for k, v in out.items()
                   if k.endswith("loss") and k != "total_loss"}
        return out["total_loss"], metrics

    def host_metrics(batch, metrics):
        return {}

    train_cfg = TrainConfig(
        learning_rate=args.learning_rate, weight_decay=args.weight_decay,
        max_grad_norm=args.max_grad_norm,
        lr_scheduler_type=args.lr_scheduler_type,
        warmup_steps=args.warmup_steps, training_steps=args.max_steps,
        min_lr_ratio=args.min_lr_ratio,
        grad_accum_steps=args.gradient_accumulation_steps,
        sharding_preset=args.sharding,
    )
    runner_args = RunnerArgs(
        output_dir=args.output_dir, max_steps=args.max_steps,
        save_steps=args.save_steps,
        log_steps=args.log_steps,
        resume_from_checkpoint=args.resume_from_checkpoint,
        seed=args.seed, mesh_data=args.mesh_data,
    )

    def batches():
        for batch in iter(datapipe):
            yield flatten_images(batch)

    return run_training(
        runner_args, train_cfg, abstract, init_params, loss_fn, batches(),
        host_metrics_fn=host_metrics, config_record=vars(args),
        data_source=datapipe if hasattr(datapipe, "state") else None,
    )


if __name__ == "__main__":
    main()
