"""Story visualization CLI with the attention-sink KV cache.

Mirror of /root/reference/src/inference/vis_george_sink.py: texts are
ground truth (val captions), images are generated; the KV cache persists
across turns and long stories trigger sink evictions
(cache_mode='img_head_tail').
"""

from __future__ import annotations

import argparse
import os

from PIL import Image

from ..pipelines.story_visualization import (
    StoryVisualizationPipeline,
    VisPipelineConfig,
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
    p.add_argument("--no_images", action="store_true")
    p.add_argument("--force_boi_at", type=int, default=None)
    p.add_argument("--max_stories", type=int, default=None)
    p.add_argument("--sdxl_int8", action="store_true",
                   help="weight-only int8 UNet projections/convs (per-"
                        "output-channel scales, quantize_unet_params): "
                        "~2.4GB less streaming + footprint per image; "
                        "divergence bound pinned in test_sdxl_parity")
    p.add_argument("--decode_tp", type=int, default=0,
                   help="tensor-parallel decode over the FIRST N visible "
                        "devices (pairs with --detok_devices). 0/1 = "
                        "single-device decode.")
    p.add_argument("--detok_devices", type=int, default=0,
                   help="pipelined de-tokenization: N SDXL replicas on "
                        "the LAST N visible devices render images while "
                        "the sink-cache decode continues (the vis path is "
                        "image-dominated: 2.58 s decode vs ~7 s image per "
                        "segment). 0 = inline.")
    return p.parse_args(argv)


def main(argv=None):
    import contextlib

    args = parse_args(argv)
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
        decode_tp=args.decode_tp,
        sdxl_int8=args.sdxl_int8,
    )
    serving = args.detok_devices > 0 and stack.detok_factory is not None
    pipe = StoryVisualizationPipeline(
        stack.tokenizer, stack.generator, stack.visual_encode,
        None if serving else stack.detokenize,
        VisPipelineConfig(
            story_len=args.story_len, window_size=args.window_size,
            num_img_in_tokens=stack.num_img_in_tokens,
        ),
    )

    pool = None
    if serving:
        import jax

        from ..pipelines.serving import DetokenizerPool

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

    data = read_jsonl(args.val_jsonl)
    if args.max_stories:
        data = data[: args.max_stories]
    mesh_ctx = stack.mesh if stack.mesh is not None else contextlib.nullcontext()
    with mesh_ctx:
        _run_stories(args, stack, pipe, pool, data)
    if pool is not None:
        pool.shutdown()


def _run_stories(args, stack, pipe, pool, data):
    from ..pipelines.serving import pipelined_segments

    for j, d in enumerate(data):
        image = Image.open(
            os.path.join(args.image_root, d["images"][0])).convert("RGB")
        starting_text, texts = d["captions"][0], d["captions"][1:]
        save_folder = os.path.join(args.save_dir, f"val_{j}")
        os.makedirs(save_folder, exist_ok=True)
        add_subtitle(image, starting_text).save(
            os.path.join(save_folder, "000start_image.jpg"))

        pixels = stack.image_transform(image)[None]
        segs = pipe.run(pixels, starting_text, texts)
        if pool is not None:
            segs = pipelined_segments(segs, pool)
        for seg in segs:
            with open(os.path.join(save_folder, "text.txt"), "a+") as f:
                f.write(seg.text + "\n")
            with open(os.path.join(save_folder, "token.txt"), "a+") as f:
                f.write(f"context token: (1, {seg.context_tokens})\n")
            print(f"[val_{j}] segment {seg.index}: {seg.text[:80]}")
            if seg.image is not None:
                seg.image.save(os.path.join(save_folder, f"ori_{seg.index:02d}.jpg"))
                add_subtitle(seg.image, seg.text).save(
                    os.path.join(save_folder, f"{seg.index:02d}.jpg"))


if __name__ == "__main__":
    main()
