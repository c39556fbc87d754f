"""Story generation CLI — the gen_george.py entry point.

Mirror of /root/reference/src/inference/gen_george.py:152-270: for each
val story, seed with (first frame, first caption), autoregressively
generate up to 25 interleaved (text, image) segments with window-8
eviction, saving per-story folders with subtitled JPGs + text.txt.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

from ..pipelines.story_generation import (
    StoryGenerationPipeline,
    StoryPipelineConfig,
)
from .common import add_subtitle, build_stack, read_jsonl


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tokenizer", default="configs/tokenizer/clm_llama_tokenizer.yaml")
    p.add_argument("--image_transform", default="configs/processer/qwen_448_transform.yaml")
    p.add_argument("--visual_encoder", default="configs/visual_tokenizer/qwen_vitg_448.yaml")
    p.add_argument("--llm_model", default="configs/clm_models/llama2chat7b_lora.yaml")
    p.add_argument("--agent_model", default="configs/clm_models/agent_7b_sft.yaml")
    p.add_argument("--adapter", default="configs/detokenizer/detokenizer_sdxl_qwen_vit_adapted.yaml")
    p.add_argument("--vae_config", default=None)
    p.add_argument("--agent_ckpt", default=None)
    p.add_argument("--vit_ckpt", default=None)
    p.add_argument("--adapter_ckpt", default=None)
    p.add_argument("--vae_ckpt", default=None)
    p.add_argument("--val_jsonl", default="data/json/val.jsonl")
    p.add_argument("--image_root", default="data/image/george_full")
    p.add_argument("--save_dir", default="output")
    p.add_argument("--story_len", type=int, default=25)
    p.add_argument("--window_size", type=int, default=8)
    p.add_argument("--max_new_tokens", type=int, default=500)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--image_size", type=int, default=1024)
    p.add_argument("--no_images", action="store_true",
                   help="skip the SDXL de-tokenizer (text-only debugging)")
    p.add_argument("--force_boi_at", type=int, default=None)
    p.add_argument("--max_stories", type=int, default=None)
    p.add_argument("--batch_stories", type=int, default=1,
                   help="serve N val stories concurrently through one "
                        "on-device program (lockstep batched decode; ~3.3x "
                        "story throughput at N=4 on 7B — PERF.md). 1 = the "
                        "reference's sequential behavior.")
    p.add_argument("--speculate_k", type=int, default=0,
                   help="prompt-lookup speculative decode: verify K drafted "
                        "tokens + the committed token per pass (greedy "
                        "only, byte-identical output; works with "
                        "--batch_stories > 1 — per-row accept counts)")
    p.add_argument("--sink", action="store_true",
                   help="thread the multimodal attention-sink KV cache "
                        "ACROSS segments (run_sink, beyond the reference): "
                        "per-segment prefill is only the new image's "
                        "66-token block instead of the whole window-8 "
                        "prompt; old segments leave context via the sink "
                        "eviction policy. Context semantics differ from "
                        "the verbatim-window flow (see "
                        "StoryGenerationPipeline.run_sink docstring).")
    p.add_argument("--sink_max_tokens", type=int, default=None,
                   help="cap retained sink tokens (default: the reference "
                        "img_head_tail policy, ~28 tokens retained per "
                        "evicted image forever)")
    p.add_argument("--cache_capacity", type=int, default=None,
                   help="KV cache slots for the sink flow (default: sized "
                        "from story_len/window/max_new)")
    p.add_argument("--sdxl_int8", action="store_true",
                   help="weight-only int8 UNet projections/convs (per-"
                        "output-channel scales, quantize_unet_params): "
                        "~2.4GB less streaming + footprint per image; "
                        "divergence bound pinned in test_sdxl_parity")
    p.add_argument("--decode_tp", type=int, default=0,
                   help="tensor-parallel decode over the FIRST N visible "
                        "devices (fsdp_tp preset; pairs with "
                        "--detok_devices on the tail devices). 0/1 = "
                        "single-device decode.")
    p.add_argument("--detok_devices", type=int, default=0,
                   help="pipelined serving: run N SDXL de-tokenizer "
                        "replicas on the LAST N visible devices while "
                        "decode runs on the rest (pipelines/serving.py); "
                        "with 2-3 replicas per decode chip the de-tokenizer "
                        "hides entirely behind decode. 0 = inline (the "
                        "reference's serial flow).")
    return p.parse_args(argv)


def main(argv=None):
    import contextlib

    args = parse_args(argv)
    if args.sink and (args.batch_stories > 1 or args.detok_devices > 0):
        raise SystemExit(
            "--sink threads ONE story's KV cache across segments; it does "
            "not compose with --batch_stories > 1 or --detok_devices"
        )
    cache_capacity = args.cache_capacity
    if cache_capacity is None:
        if args.sink:
            # prompt + window live tokens + decode headroom + the sink
            # budget (~28 retained tokens per evicted image — or the cap)
            sink_budget = (min(args.sink_max_tokens, 28 * args.story_len)
                           if args.sink_max_tokens is not None
                           else 28 * args.story_len)
            need = (80 + args.window_size * (args.max_new_tokens + 70)
                    + args.max_new_tokens + args.speculate_k + 1 + sink_budget)
            cache_capacity = -(-need // 128) * 128
        else:
            cache_capacity = 4096
    stack = build_stack(
        args.tokenizer, args.image_transform, args.visual_encoder,
        args.llm_model, args.agent_model,
        adapter_cfg_path=None if args.no_images else args.adapter,
        agent_ckpt=args.agent_ckpt, vit_ckpt=args.vit_ckpt,
        adapter_ckpt=args.adapter_ckpt, vae_ckpt=args.vae_ckpt,
        vae_cfg_path=args.vae_config,
        max_new_tokens=args.max_new_tokens,
        num_inference_steps=args.num_inference_steps,
        image_size=args.image_size,
        force_boi_at=args.force_boi_at,
        batch_stories=args.batch_stories,
        pipelined_detok=args.detok_devices > 0,
        decode_tp=args.decode_tp,
        sdxl_int8=args.sdxl_int8,
        speculate_k=args.speculate_k,
        sink=args.sink,
        cache_capacity=cache_capacity,
    )

    serving = args.detok_devices > 0 and stack.detok_factory is not None
    pipe = StoryGenerationPipeline(
        stack.tokenizer, stack.generator, stack.visual_encode,
        None if serving else stack.detokenize,
        StoryPipelineConfig(
            story_len=args.story_len, window_size=args.window_size,
            num_img_in_tokens=stack.num_img_in_tokens,
            sink_max_tokens=args.sink_max_tokens,
        ),
    )

    data = read_jsonl(args.val_jsonl)
    if args.max_stories:
        data = data[: args.max_stories]

    def start_story(j, d):
        image_path = os.path.join(args.image_root, d["images"][0])
        question = d["captions"][0]
        image = Image.open(image_path).convert("RGB")
        save_folder = os.path.join(args.save_dir, f"val_{j}")
        os.makedirs(save_folder, exist_ok=True)
        add_subtitle(image, question).save(
            os.path.join(save_folder, "000start_image.jpg"))
        return stack.image_transform(image)[None], question, save_folder

    def save_segment(j, save_folder, seg):
        with open(os.path.join(save_folder, "text.txt"), "a+") as f:
            f.write(seg.text + "\n")
        with open(os.path.join(save_folder, "token.txt"), "a+") as f:
            f.write(f"context token: (1, {seg.context_tokens})\n")
        print(f"[val_{j}] segment {seg.index}: {seg.text[:80]}")
        if seg.image is not None:
            seg.image.save(
                os.path.join(save_folder, f"ori_{seg.index:02d}.jpg"))
            add_subtitle(seg.image, seg.text).save(
                os.path.join(save_folder, f"{seg.index:02d}.jpg"))

    mesh_ctx = stack.mesh if stack.mesh is not None else contextlib.nullcontext()

    if serving:
        # pipelined two-stage serving: lockstep decode + de-tokenizer
        # replica pool on the tail devices (segments stream out as their
        # images complete; per-story order is preserved)
        import jax

        from ..pipelines.serving import DetokenizerPool, PipelinedStoryServer

        devices = jax.devices()
        n_decode = max(args.decode_tp, 1)
        if n_decode + args.detok_devices > len(devices):
            raise SystemExit(
                f"--decode_tp {args.decode_tp} + --detok_devices "
                f"{args.detok_devices} needs {n_decode + args.detok_devices} "
                f"devices, have {len(devices)} (decode shards and SDXL "
                f"replicas must not share a chip)"
            )
        pool = DetokenizerPool(
            stack.detok_factory, devices[-args.detok_devices:])
        server = PipelinedStoryServer(pipe, pool)
        group_n = max(args.batch_stories, 1)
        with mesh_ctx:
            for base in range(0, len(data), group_n):
                group = data[base : base + group_n]
                started = [start_story(base + r, d) for r, d in enumerate(group)]
                seeds = [(px, q) for px, q, _ in started]
                for r, seg in server.serve_stream(seeds):
                    save_segment(base + r, started[r][2], seg)
        print(f"serving stats: {server.stats()}")
        pool.shutdown()
        return

    if args.batch_stories > 1:
        with mesh_ctx:
            for base in range(0, len(data), args.batch_stories):
                group = data[base : base + args.batch_stories]
                started = [start_story(base + r, d) for r, d in enumerate(group)]
                seeds = [(px, q) for px, q, _ in started]
                for round_segs in pipe.run_batch(seeds):
                    for r, seg in enumerate(round_segs):
                        if seg is not None:
                            save_segment(base + r, started[r][2], seg)
        return

    run = pipe.run_sink if args.sink else pipe.run
    with mesh_ctx:
        for j, d in enumerate(data):
            pixels, question, save_folder = start_story(j, d)
            for seg in run(pixels, question):
                save_segment(j, save_folder, seg)


if __name__ == "__main__":
    main()
