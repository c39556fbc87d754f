"""Stage-3 de-tokenizer adaptation entry point.

Equivalent of /root/reference/src/train/train_sdxl_img2img_llm.py driven
by scripts/adapt_storystream.sh: frozen ViT + frozen LoRA agent + frozen
VAE; the SDXLAdapter (resampler + UNet to_k/to_v) trains on eps-MSE.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from ..data.story_telling import flatten_images
from ..models.agent import ContinuousLVLM
from ..models.sdxl.adapter import SDXLAdapter, adapter_trainable_mask
from ..models.sdxl.vae import AutoencoderKL, VAEConfig
from ..models.vit import VisionTransformerWithAttnPool
from ..train.checkpoint import load_params_partial
from ..utils.config import instantiate, load_config
from .runner import RunnerArgs, run_training
from .stage3 import make_stage3_loss_fn
from .trainer import TrainConfig


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image_transform", required=True)
    p.add_argument("--sd_image_transform", required=True)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--visual_encoder", required=True)
    p.add_argument("--llm_model", required=True)
    p.add_argument("--agent_model", required=True)
    p.add_argument("--adapter", required=True)
    p.add_argument("--vae", default=None, help="VAE config yaml (default: SDXL base)")
    p.add_argument("--train_dataset", required=True)
    p.add_argument("--pretrained_agent_path", default=None)
    p.add_argument("--pretrained_vit_path", default=None)
    p.add_argument("--pretrained_adapter_path", default=None)
    p.add_argument("--pretrained_vae_path", default=None)
    p.add_argument("--output_dir", default="output/sdxl_adapt")
    p.add_argument("--resume_from_checkpoint", default=None)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--gradient_accumulation_steps", type=int, default=4)
    p.add_argument("--lr_scheduler_type", default="cosine")
    p.add_argument("--warmup_steps", type=int, default=500)
    p.add_argument("--max_steps", type=int, default=1600)
    p.add_argument("--min_lr_ratio", type=float, default=0.05)
    p.add_argument("--save_steps", type=int, default=400)
    p.add_argument("--log_steps", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mesh_data", type=int, default=None)
    p.add_argument("--sharding", default="fsdp", choices=["dp", "fsdp", "fsdp_tp"])
    p.add_argument("--mesh_model", type=int, default=1)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    tokenizer = instantiate(load_config(args.tokenizer))
    image_transform = instantiate(load_config(args.image_transform))
    sd_image_transform = instantiate(load_config(args.sd_image_transform))

    vit_cfg = instantiate(load_config(args.visual_encoder))
    vit = VisionTransformerWithAttnPool(vit_cfg)
    llm_cfg = instantiate(load_config(args.llm_model))
    agent_cfg = instantiate(load_config(args.agent_model), llm=llm_cfg)
    agent = ContinuousLVLM(agent_cfg)
    adapter_cfg = instantiate(load_config(args.adapter))
    adapter = SDXLAdapter(adapter_cfg)
    vae_cfg = (instantiate(load_config(args.vae)) if args.vae
               else VAEConfig(dtype=llm_cfg.dtype))
    vae = AutoencoderKL(vae_cfg)

    datapipe = instantiate(
        load_config(args.train_dataset),
        tokenizer=tokenizer, image_transform=image_transform,
        sd_image_transform=sd_image_transform,
    )
    first = flatten_images(next(iter(datapipe)))
    b = first["input_ids"].shape[0]
    vae_downscale = 2 ** (len(vae_cfg.block_out_channels) - 1)
    latent_hw = first["sd_images"].shape[-1] // vae_downscale

    import flax.linen as nn

    def jinit(fn):
        return nn.meta.unbox(jax.jit(fn)())

    # frozen towers
    vit_params = jinit(lambda: vit.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 3, vit_cfg.image_size, vit_cfg.image_size)))["params"])
    if args.pretrained_vit_path:
        vit_params = load_params_partial(args.pretrained_vit_path, vit_params)

    n_imgs = first["images"].shape[0]
    agent_args = dict(
        input_ids=jnp.asarray(first["input_ids"]),
        attention_mask=jnp.asarray(first["attention_mask"]),
        labels=jnp.asarray(first["labels"]),
        image_embeds=jnp.zeros((n_imgs, agent_cfg.num_vit_tokens, agent_cfg.vit_dim)),
        embeds_gen_mask=jnp.asarray(first["embeds_gen_mask"]),
        embeds_cmp_mask=jnp.asarray(first["embeds_cmp_mask"]),
        ids_gen_mask=jnp.asarray(first["ids_gen_mask"]),
        ids_cmp_mask=jnp.asarray(first["ids_cmp_mask"]),
    )
    agent_params = jinit(lambda: agent.init(jax.random.PRNGKey(1), **agent_args)["params"])
    if args.pretrained_agent_path:
        agent_params = load_params_partial(args.pretrained_agent_path, agent_params)

    vae_params = jinit(lambda: vae.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)))["params"])
    if args.pretrained_vae_path:
        vae_params = load_params_partial(args.pretrained_vae_path, vae_params)

    adapter_init_args = dict(
        noisy_latents=jnp.zeros((b, latent_hw, latent_hw, 4)),
        timesteps=jnp.zeros((b,), jnp.int32),
        image_embeds=jnp.zeros((b, agent_cfg.num_vit_tokens, adapter_cfg.embedding_dim)),
        time_ids=jnp.ones((b, 6)),
        noise=jnp.zeros((b, latent_hw, latent_hw, 4)),
    )
    abstract = jax.eval_shape(
        lambda: adapter.init(jax.random.PRNGKey(3), **adapter_init_args)
    )["params"]

    def init_params():
        params = jinit(lambda: adapter.init(
            jax.random.PRNGKey(args.seed), **adapter_init_args)["params"])
        if args.pretrained_adapter_path:
            params = load_params_partial(args.pretrained_adapter_path, params)
        return params

    loss_fn = make_stage3_loss_fn(adapter, agent, vae, vit)
    loss_consts = {"agent_params": agent_params, "vae_params": vae_params,
                   "vit_params": vit_params}
    mask = adapter_trainable_mask(nn.meta.unbox(abstract), adapter_cfg.full_ft)

    train_cfg = TrainConfig(
        learning_rate=args.learning_rate, weight_decay=args.weight_decay,
        max_grad_norm=args.max_grad_norm,
        lr_scheduler_type=args.lr_scheduler_type,
        warmup_steps=args.warmup_steps, training_steps=args.max_steps,
        min_lr_ratio=args.min_lr_ratio,
        grad_accum_steps=args.gradient_accumulation_steps,
        sharding_preset=args.sharding,
    )

    def batches():
        for batch in iter(datapipe):
            yield flatten_images(batch)

    runner_args = RunnerArgs(
        output_dir=args.output_dir, max_steps=args.max_steps,
        save_steps=args.save_steps,
        log_steps=args.log_steps,
        resume_from_checkpoint=args.resume_from_checkpoint,
        seed=args.seed, mesh_data=args.mesh_data, mesh_model=args.mesh_model,
    )
    return run_training(
        runner_args, train_cfg, abstract, init_params, loss_fn, batches(),
        trainable_mask=mask, config_record=vars(args),
        data_source=datapipe if hasattr(datapipe, "state") else None,
        loss_consts=loss_consts,
    )


if __name__ == "__main__":
    main()
