#!/usr/bin/env bash
# Stage-2 SFT on StoryStream (mirrors reference scripts/sft_storystream.sh:
# 8 devices, lr 1e-4, bf16, 6000 steps, warmup 100, cosine min-ratio 0.05;
# ZeRO-2 == the fsdp sharding preset here).
set -e
exec python -m seed_story_tpu.train.train_clm_sft \
  --image_transform configs/processer/qwen_448_transform.yaml \
  --tokenizer configs/tokenizer/clm_llama_tokenizer.yaml \
  --visual_encoder configs/visual_tokenizer/qwen_vitg_448.yaml \
  --llm_model configs/clm_models/llama2chat7b_lora.yaml \
  --agent_model configs/clm_models/agent_7b_seedx_pretrained.yaml \
  --train_dataset configs/data/george_sft.yaml \
  --pretrained_vit_path pretrained/visual_tokenizer/qwen_vit_G_jax \
  --pretrained_agent_path pretrained/seed_story/agent_seedx_jax \
  --output_dir output/sft_storystream \
  --learning_rate 1e-4 --max_steps 6000 --warmup_steps 100 \
  --min_lr_ratio 0.05 --save_steps 1000 --sharding fsdp "$@"
