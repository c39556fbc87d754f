"""Shared assembly for the two inference CLIs.

Builds tokenizer / transform / ViT / agent / SDXL adapter+VAE from the
config YAML surface + converted checkpoints — the JAX counterpart of the
module-level init blocks in /root/reference/src/inference/gen_george.py:25-82
and vis_george_sink.py:28-87.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Optional

import numpy as np
from PIL import Image, ImageDraw

from ..utils.cache import enable_compile_cache
from ..utils.config import instantiate, load_config


def read_jsonl(path: str):
    data = []
    with open(path) as f:
        for line in f:
            if line.strip():
                data.append(json.loads(line))
    return data


def split_subtitle(text: str) -> tuple:
    """Two lines, split at the word boundary nearest the midpoint.

    Deliberate improvement over the reference (gen_george.py:132-133), which
    slices ``text[:len(text)//2]`` and can cut mid-word in every frame.
    """
    mid = len(text) // 2
    left = text.rfind(" ", 0, mid + 1)
    right = text.find(" ", mid)
    if left == -1 and right == -1:
        return text[:mid], text[mid:]
    if left == -1 or (right != -1 and right - mid < mid - left):
        cut = right
    else:
        cut = left
    return text[:cut], text[cut + 1 :]


def add_subtitle(original_image: Image.Image, text: str) -> Image.Image:
    """Black caption bar under the frame (reference gen_george.py:114-149)."""
    text_height = 80
    new_image = Image.new(
        "RGB", (original_image.width, original_image.height + text_height), "black"
    )
    new_image.paste(original_image, (0, 0))
    draw = ImageDraw.Draw(new_image)
    font_size = 14
    line1, line2 = split_subtitle(text)
    y1 = original_image.height + (text_height - font_size) // 2
    draw.text((10, y1), line1, fill="white")
    draw.text((10, y1 + font_size), line2, fill="white")
    return new_image


@dataclass
class InferenceStack:
    tokenizer: Any
    image_transform: Any
    visual_encode: Any  # pixels (1,3,H,W) -> (1, n, vit_dim)
    generator: Any
    detokenize: Optional[Any]  # feats (1,n,D) -> PIL.Image or None
    num_img_in_tokens: int
    # device -> (feats -> PIL.Image): builds a de-tokenizer replica whose
    # params live on that device (pipelines/serving.py DetokenizerPool
    # factory for the multi-chip pipelined serving layout); None when the
    # stack was built without an adapter.
    detok_factory: Optional[Any] = None
    # tensor-parallel decode mesh (decode_tp > 1); loops that call the
    # generator must run inside ``with stack.mesh:``
    mesh: Optional[Any] = None


def build_stack(
    tokenizer_cfg: str,
    image_transform_cfg: str,
    visual_encoder_cfg: str,
    llm_cfg_path: str,
    agent_cfg_path: str,
    adapter_cfg_path: Optional[str] = None,
    agent_ckpt: Optional[str] = None,
    vit_ckpt: Optional[str] = None,
    adapter_ckpt: Optional[str] = None,
    vae_ckpt: Optional[str] = None,
    vae_cfg_path: Optional[str] = None,
    max_new_tokens: int = 500,
    cache_capacity: int = 4096,
    num_inference_steps: int = 50,
    image_size: int = 1024,
    force_boi_at: Optional[int] = None,
    batch_stories: int = 1,
    pipelined_detok: bool = False,
    decode_tp: int = 0,
    sdxl_int8: bool = False,
    speculate_k: int = 0,
    sink: bool = False,
) -> InferenceStack:
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from ..decode.generate import GenerateConfig, StoryGenerator
    from ..models.agent import ContinuousLVLM
    from ..models.vit import VisionTransformerWithAttnPool
    from ..train.checkpoint import load_params_partial

    enable_compile_cache()

    tokenizer = instantiate(load_config(tokenizer_cfg))
    image_transform = instantiate(load_config(image_transform_cfg))

    def jinit(fn):
        return nn.meta.unbox(jax.jit(fn)())

    vit_cfg = instantiate(load_config(visual_encoder_cfg))
    vit = VisionTransformerWithAttnPool(vit_cfg)
    vit_params = jinit(lambda: vit.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 3, vit_cfg.image_size, vit_cfg.image_size)))["params"])
    if vit_ckpt:
        vit_params = load_params_partial(vit_ckpt, vit_params)
    vit_apply = jax.jit(lambda px: vit.apply({"params": vit_params}, px))

    def visual_encode(pixels):
        return np.asarray(vit_apply(jnp.asarray(pixels, jnp.float32)))

    llm_cfg = instantiate(load_config(llm_cfg_path))
    agent_cfg = instantiate(load_config(agent_cfg_path), llm=llm_cfg)
    agent = ContinuousLVLM(agent_cfg)
    seq = 64
    n = 1
    init_args = dict(
        input_ids=jnp.ones((1, seq), jnp.int32),
        attention_mask=jnp.ones((1, seq), jnp.int32),
        labels=jnp.zeros((1, seq), jnp.int32),
        image_embeds=jnp.zeros((n, agent_cfg.num_vit_tokens, agent_cfg.vit_dim)),
        embeds_gen_mask=jnp.ones((n,), bool),
        embeds_cmp_mask=jnp.ones((n,), bool),
        ids_gen_mask=jnp.zeros((1, seq), bool).at[
            0, 2 : 2 + agent_cfg.num_img_out_tokens].set(True),
        ids_cmp_mask=jnp.zeros((1, seq), bool).at[
            0, 30 : 30 + agent_cfg.num_img_in_tokens].set(True),
    )
    agent_params = jinit(
        lambda: agent.init(jax.random.PRNGKey(1), **init_args)["params"])
    if agent_ckpt:
        agent_params = load_params_partial(agent_ckpt, agent_params)

    gcfg = GenerateConfig(
        max_new_tokens=max_new_tokens,
        num_img_gen_tokens=agent_cfg.num_img_out_tokens,
        cache_capacity=cache_capacity,
        force_boi_at=force_boi_at,
        # batched serving (lockstep stories) re-prefills every segment and
        # never threads a cache back; see StoryGenerator.generate_batch.
        # Pipelined serving drives run_batch even for one story. Only the
        # sink flow (run_sink / vis pipeline) reads the cache back — for
        # the plain story flow return_cache=False caps live cache copies
        # at one (GenerateConfig docstring). Speculation composes with the
        # threaded cache (commit blocks are contiguous at the cache
        # length; decode/generate.py).
        return_cache=(sink or (batch_stories <= 1 and not pipelined_detok
                               and speculate_k == 0)),
        speculate_k=speculate_k,
    )
    mesh = None
    if decode_tp > 1:
        # tensor-parallel decode over the FIRST decode_tp devices (the
        # tail devices stay free for de-tokenizer replicas); params are
        # sharded by StoryGenerator via the fsdp_tp preset
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(1, decode_tp, jax.devices()[:decode_tp])
        with mesh:
            generator = StoryGenerator(
                agent, agent_params, gcfg, mesh=mesh,
                sharding_preset="fsdp_tp",
            )
    else:
        generator = StoryGenerator(agent, agent_params, gcfg)

    detokenize = None
    if adapter_cfg_path:
        from ..models.sdxl.adapter import SDXLAdapter
        from ..models.sdxl.vae import AutoencoderKL, VAEConfig
        from ..pipelines.sdxl_pipeline import SDXLImagePipeline, SDXLSampleConfig

        adapter_cfg = instantiate(load_config(adapter_cfg_path))
        if sdxl_int8:
            # weight-only int8 UNet (models/sdxl/unet.py QUANTIZED_MODULES):
            # ~2.4GB less HBM streaming per eval and ~2.4GB smaller resident
            # footprint; output divergence bound pinned in
            # tests/test_sdxl_parity.py::test_unet_int8_close_to_float
            import dataclasses as _dc

            adapter_cfg = _dc.replace(
                adapter_cfg, unet=_dc.replace(adapter_cfg.unet, quantize=True)
            )
        adapter = SDXLAdapter(adapter_cfg)
        vae_cfg = (instantiate(load_config(vae_cfg_path)) if vae_cfg_path
                   else VAEConfig(dtype=adapter_cfg.unet.dtype))
        vae = AutoencoderKL(vae_cfg)
        b = 1
        lat = image_size // (2 ** (len(vae_cfg.block_out_channels) - 1))
        adapter_params = jinit(lambda: adapter.init(
            jax.random.PRNGKey(2),
            noisy_latents=jnp.zeros((b, lat, lat, 4)),
            timesteps=jnp.zeros((b,), jnp.int32),
            image_embeds=jnp.zeros((b, agent_cfg.num_vit_tokens,
                                    adapter_cfg.embedding_dim)),
            time_ids=jnp.ones((b, 6)),
            noise=jnp.zeros((b, lat, lat, 4)))["params"])
        if adapter_ckpt:
            if sdxl_int8:
                # checkpoints carry the float layout: load into a float
                # adapter tree, quantize the UNet subtree in one jit, keep
                # everything else (resampler, ip to_k/to_v) as loaded.
                # Transient device peak: float UNet + int8 copy (~7.7GB at
                # SDXL-base) — freed before the 1024px pipeline compiles.
                from ..models.sdxl.unet import quantize_unet_params

                float_cfg = instantiate(load_config(adapter_cfg_path))
                float_adapter = SDXLAdapter(float_cfg)
                float_params = jinit(lambda: float_adapter.init(
                    jax.random.PRNGKey(2),
                    noisy_latents=jnp.zeros((b, lat, lat, 4)),
                    timesteps=jnp.zeros((b,), jnp.int32),
                    image_embeds=jnp.zeros(
                        (b, agent_cfg.num_vit_tokens,
                         adapter_cfg.embedding_dim)),
                    time_ids=jnp.ones((b, 6)),
                    noise=jnp.zeros((b, lat, lat, 4)))["params"])
                loaded = load_params_partial(adapter_ckpt, float_params)
                loaded["unet"] = jax.jit(quantize_unet_params)(loaded["unet"])
                adapter_params = loaded
            else:
                adapter_params = load_params_partial(adapter_ckpt, adapter_params)
        vae_params = jinit(lambda: vae.init(
            jax.random.PRNGKey(3),
            jnp.zeros((1, 2 ** (len(vae_cfg.block_out_channels) - 1) * 4,
                       2 ** (len(vae_cfg.block_out_channels) - 1) * 4, 3)))["params"])
        if vae_ckpt:
            vae_params = load_params_partial(vae_ckpt, vae_params)

        # CFG negatives: ViT features of a black image
        # (reference adapter_modules.py:387-428)
        black = np.zeros((1, 3, vit_cfg.image_size, vit_cfg.image_size), np.float32)
        neg_feats = visual_encode(black)

        if pipelined_detok:
            # replicas own the device copies; keep the master params on
            # HOST so no dead ~5.5GB copy sits on the decode device
            adapter_params = jax.device_get(adapter_params)
            vae_params = jax.device_get(vae_params)
            detokenize = None
        else:
            pipe = SDXLImagePipeline(
                adapter, adapter_params, vae, vae_params,
                cfg=SDXLSampleConfig(
                    height=image_size, width=image_size,
                    num_inference_steps=num_inference_steps,
                    vae_scale=2 ** (len(vae_cfg.block_out_channels) - 1),
                ),
            )

            def detokenize(feats):
                imgs = pipe.generate(np.asarray(feats), neg_feats)
                return Image.fromarray(imgs[0])

        def detok_factory(device):
            # replica params committed to `device`; uncommitted numpy
            # inputs follow them, so the whole sample loop runs there
            rp = jax.device_put(adapter_params, device)
            rv = jax.device_put(vae_params, device)
            rpipe = SDXLImagePipeline(
                adapter, rp, vae, rv,
                cfg=SDXLSampleConfig(
                    height=image_size, width=image_size,
                    num_inference_steps=num_inference_steps,
                    vae_scale=2 ** (len(vae_cfg.block_out_channels) - 1),
                ),
            )

            def detok(feats):
                imgs = rpipe.generate(np.asarray(feats), neg_feats)
                return Image.fromarray(imgs[0])

            return detok

    return InferenceStack(
        tokenizer=tokenizer,
        image_transform=image_transform,
        visual_encode=visual_encode,
        generator=generator,
        detokenize=detokenize,
        num_img_in_tokens=agent_cfg.num_img_in_tokens,
        detok_factory=detok_factory if adapter_cfg_path else None,
        mesh=mesh,
    )
