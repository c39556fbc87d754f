"""Stage-2 MLLM SFT entry point.

Equivalent of /root/reference/src/train/train_clm_sft.py driven by
scripts/sft_storystream.sh: frozen ViT -> LoRA'd LLaMA agent, CE + cosine
losses, AdamW + cosine-min-ratio, ZeRO/FSDP sharding, bf16.

Usage (flag names mirror the reference's two dataclasses):
  python -m seed_story_tpu.train.train_clm_sft \
    --image_transform configs/processer/qwen_448_transform.yaml \
    --tokenizer configs/tokenizer/clm_llama_tokenizer.yaml \
    --visual_encoder configs/visual_tokenizer/qwen_vitg_448.yaml \
    --llm_model configs/clm_models/llama2chat7b_lora.yaml \
    --agent_model configs/clm_models/agent_7b_sft.yaml \
    --train_dataset configs/data/george_sft.yaml \
    --output_dir output/sft --learning_rate 1e-4 ...
"""

from __future__ import annotations

import argparse
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..data.story_telling import flatten_images
from ..models.agent import AgentConfig, ContinuousLVLM
from ..models.llama import lora_trainable_mask
from ..models.vit import VisionTransformerWithAttnPool
from ..train.checkpoint import load_params_partial
from ..utils.config import instantiate, load_config
from .runner import RunnerArgs, run_training
from .stage2 import make_stage2_loss_fn
from .trainer import TrainConfig


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    # ConfigPathArguments (reference train_clm_sft.py:42-56)
    p.add_argument("--image_transform", required=True)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--visual_encoder", required=True)
    p.add_argument("--llm_model", required=True)
    p.add_argument("--agent_model", required=True)
    p.add_argument("--train_dataset", required=True)
    p.add_argument("--pretrained_agent_path", default=None)
    p.add_argument("--pretrained_vit_path", default=None)
    # TrainingArguments (:58-87)
    p.add_argument("--output_dir", default="output/sft")
    p.add_argument("--resume_from_checkpoint", default=None)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--lr_scheduler_type", default="cosine")
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--max_steps", type=int, default=6000)
    p.add_argument("--min_lr_ratio", type=float, default=0.05)
    p.add_argument("--save_steps", type=int, default=1000)
    p.add_argument("--log_steps", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mesh_data", type=int, default=None)
    # parallelism (replaces the fsdp/deepspeed plugin YAMLs)
    p.add_argument("--sharding", default="fsdp", choices=["dp", "fsdp", "fsdp_tp"])
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--profile_start", type=int, default=-1)
    p.add_argument("--profile_stop", type=int, default=-1)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    tokenizer = instantiate(load_config(args.tokenizer))
    image_transform = instantiate(load_config(args.image_transform))

    vit_cfg = instantiate(load_config(args.visual_encoder))
    vit = VisionTransformerWithAttnPool(vit_cfg)

    llm_cfg = instantiate(load_config(args.llm_model))
    agent_cfg_raw = load_config(args.agent_model)
    agent_cfg: AgentConfig = instantiate(agent_cfg_raw, llm=llm_cfg)
    agent = ContinuousLVLM(agent_cfg)

    datapipe = instantiate(
        load_config(args.train_dataset),
        tokenizer=tokenizer, image_transform=image_transform,
        sd_image_transform=None,
    )

    # abstract init on a representative batch shape
    first = next(iter(datapipe))
    first = flatten_images(first)
    dummy_feats = jnp.zeros(
        (first["images"].shape[0], agent_cfg.num_vit_tokens, agent_cfg.vit_dim)
    )

    def agent_init_args(batch, feats):
        return dict(
            input_ids=jnp.asarray(batch["input_ids"]),
            attention_mask=jnp.asarray(batch["attention_mask"]),
            labels=jnp.asarray(batch["labels"]),
            image_embeds=feats,
            embeds_gen_mask=jnp.asarray(batch["embeds_gen_mask"]),
            embeds_cmp_mask=jnp.asarray(batch["embeds_cmp_mask"]),
            ids_gen_mask=jnp.asarray(batch["ids_gen_mask"]),
            ids_cmp_mask=jnp.asarray(batch["ids_cmp_mask"]),
        )

    abstract = jax.eval_shape(
        lambda: agent.init(jax.random.PRNGKey(0), **agent_init_args(first, dummy_feats))
    )["params"]

    def init_params():
        import flax.linen as nn

        params = jax.jit(
            lambda: agent.init(jax.random.PRNGKey(args.seed),
                               **agent_init_args(first, dummy_feats))["params"]
        )()
        params = nn.meta.unbox(params)
        if args.pretrained_agent_path:
            params = load_params_partial(args.pretrained_agent_path, params)
        return params

    # frozen ViT params (train_clm_sft.py:213-215)
    import flax.linen as nn

    vit_params = nn.meta.unbox(jax.jit(
        lambda: vit.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 3, vit_cfg.image_size, vit_cfg.image_size)),
        )["params"]
    )())
    if args.pretrained_vit_path:
        vit_params = load_params_partial(args.pretrained_vit_path, vit_params)

    loss_fn = make_stage2_loss_fn(agent, vit_model=vit)

    train_cfg = TrainConfig(
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        max_grad_norm=args.max_grad_norm,
        lr_scheduler_type=args.lr_scheduler_type,
        warmup_steps=args.warmup_steps,
        training_steps=args.max_steps,
        min_lr_ratio=args.min_lr_ratio,
        grad_accum_steps=args.gradient_accumulation_steps,
        sharding_preset=args.sharding,
    )

    # trainable set: LoRA recipe on the LLM; resamplers fully trainable
    def trainable_mask(params):
        mask = lora_trainable_mask(params)
        mask = dict(mask)
        for key in ("input_resampler", "output_resampler"):
            if key in mask:
                mask[key] = jax.tree_util.tree_map(lambda _: True, mask[key])
        return mask

    def batches():
        for batch in iter(datapipe):
            yield flatten_images(batch)

    runner_args = RunnerArgs(
        output_dir=args.output_dir,
        max_steps=args.max_steps,
        save_steps=args.save_steps,
        log_steps=args.log_steps,
        resume_from_checkpoint=args.resume_from_checkpoint,
        seed=args.seed, mesh_data=args.mesh_data,
        profile_start=args.profile_start,
        profile_stop=args.profile_stop,
        mesh_model=args.mesh_model,
    )

    import flax.linen as nn2

    mask = trainable_mask(nn2.meta.unbox(abstract))

    return run_training(
        runner_args, train_cfg, abstract, init_params, loss_fn, batches(),
        trainable_mask=mask, config_record=vars(args),
        data_source=datapipe if hasattr(datapipe, "state") else None,
        loss_consts={"vit_params": vit_params},
    )


if __name__ == "__main__":
    main()
