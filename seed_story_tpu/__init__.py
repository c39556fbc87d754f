"""seed_story_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multimodal long-story
generation framework with the capabilities of TencentARC/SEED-Story.

Layers (bottom-up):
  ops/       low-level kernels: flash attention (Pallas), RoPE, sincos pos-emb
  parallel/  device mesh, named shardings (DP/FSDP/TP), collectives
  models/    ViT visual tokenizer, LLaMA MLLM agent, SDXL de-tokenizer (JAX)
  data/      host-side story data pipeline (jsonl -> static-shape batches)
  decode/    jit generation: fixed-capacity KV cache, sink cache, automaton
  train/     pjit train steps, optimizers, checkpointing, 3 stage trainers
  pipelines/ story generation / visualization / SDXL sampling
  eval/      GPT-4 judge protocols
  tools/     torch->JAX weight converters, dataset tooling
"""

__version__ = "0.1.0"

BOI_TOKEN = "<img>"
EOI_TOKEN = "</img>"
IMG_TOKEN = "<img_{:05d}>"
