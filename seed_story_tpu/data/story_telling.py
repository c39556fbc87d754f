"""Story / t2i sample decoding with static-shape TPU batching.

Reimplements the sample format of the reference's decoders
(/root/reference/src/data/story_telling.py: decode_long_story_data:390-557,
decode_t2i_data:182-333, single_turn_edit_collate:163-179) with one
structural change for XLA: **ragged image counts become a static
``max_images`` axis + validity masks** instead of the reference's
variable-length ``torch.cat`` collate. Semantics are otherwise identical:

  text layout   cap0 <img>[64x<img_k>]</img> [INST] cap1 <img>...</img>
                ... [INST] cap_{t+1} <img>[gen tokens]</img>
  labels        -100 on bos/instruction/image-token spans; response text
                + eos supervised
  ids_cmp_mask  True on the 64 slots of every *context* image
  ids_gen_mask  True on the 64 slots of the single *target* image
  embeds_*_mask per-image flags aligned with the images axis
"""

from __future__ import annotations

import dataclasses
import os
import random
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from .tokenizer import BOI_TOKEN, EOI_TOKEN, image_comprehension_string

IGNORE_INDEX = -100


def calculate_new_dimensions(height: int, width: int, target_size: int):
    """Shorter-side resize arithmetic (reference story_telling.py:102-109)."""
    if height < width:
        new_height = target_size
        new_width = int(width * (target_size / height))
    else:
        new_width = target_size
        new_height = int(height * (target_size / width))
    return new_height, new_width


def sdxl_micro_conditioning(height: int, width: int, target_size: int) -> np.ndarray:
    """SDXL time_ids = (orig_h, orig_w, crop_y, crop_x, tgt, tgt).

    Matches reference story_telling.py:429-438.
    """
    target_width, target_height = calculate_new_dimensions(
        height=height, width=width, target_size=target_size
    )
    y1 = max(0, int(round((target_height - target_size) / 2.0)))
    x1 = max(0, int(round((target_width - target_size) / 2.0)))
    return np.array([height, width, y1, x1, target_size, target_size], np.int32)


@dataclasses.dataclass
class StoryDecodeConfig:
    story_len: int = 10
    max_length: int = 1280
    max_images: int = 10  # static image axis per sample
    num_img_in_tokens: int = 64
    num_img_out_tokens: int = 64
    instruction_prompt: str = "{instruction}"
    system_message: str = ""
    turn_sep: str = "\n"
    min_resolution: int = 128
    min_aspect_ratio: float = 0.2
    image_size: int = 448
    sd_image_size: int = 1024


def _encode_spans(tokenizer, instruction: str, response: str, system_message: str):
    input_ids: List[int] = []
    labels: List[int] = []
    if system_message:
        if not system_message.endswith("\n"):
            system_message += "\n"
        ids = tokenizer.encode(system_message, add_special_tokens=False)
        input_ids += ids
        labels += [IGNORE_INDEX] * len(ids)
    ids = tokenizer.encode(instruction, add_special_tokens=False)
    input_ids += ids
    labels += [IGNORE_INDEX] * len(ids)
    ids = tokenizer.encode(response, add_special_tokens=False)
    input_ids += ids
    labels += list(ids)
    input_ids = [tokenizer.bos_token_id] + input_ids + [tokenizer.eos_token_id]
    labels = [IGNORE_INDEX] + labels + [tokenizer.eos_token_id]
    return input_ids, labels


def _finalize_sample(
    tokenizer,
    input_ids: List[int],
    labels: List[int],
    cfg: StoryDecodeConfig,
    num_cmp_images: int,
    has_gen_image: bool,
):
    """Pad to max_length and build the two mask families. Returns None if
    the sample overflows (reference drops it, story_telling.py:509-516)."""
    if len(input_ids) >= cfg.max_length:
        return None
    pad = cfg.max_length - len(input_ids)
    attention_mask = [1] * len(input_ids) + [0] * pad
    input_ids = input_ids + [tokenizer.pad_token_id] * pad
    labels = labels + [IGNORE_INDEX] * pad

    input_ids = np.array(input_ids, np.int32)
    labels = np.array(labels, np.int32)
    attention_mask = np.array(attention_mask, np.int32)

    boi_id = tokenizer.encode(BOI_TOKEN, add_special_tokens=False)[0]
    eoi_id = tokenizer.encode(EOI_TOKEN, add_special_tokens=False)[0]
    boi_idx = np.where(input_ids == boi_id)[0]
    eoi_idx = np.where(input_ids == eoi_id)[0]

    ids_cmp_mask = np.zeros(cfg.max_length, bool)
    ids_gen_mask = np.zeros(cfg.max_length, bool)
    for i in range(num_cmp_images):
        ids_cmp_mask[boi_idx[i] + 1 : eoi_idx[i]] = True
    if has_gen_image:
        ids_gen_mask[boi_idx[-1] + 1 : eoi_idx[-1]] = True
        labels[boi_idx[-1] + 1 : eoi_idx[-1] + 1] = IGNORE_INDEX
    return input_ids, attention_mask, labels, ids_cmp_mask, ids_gen_mask


def _pad_images(images: List[np.ndarray], cfg: StoryDecodeConfig) -> np.ndarray:
    n = len(images)
    assert n <= cfg.max_images, (n, cfg.max_images)
    c, h, w = images[0].shape
    out = np.zeros((cfg.max_images, c, h, w), np.float32)
    for i, im in enumerate(images):
        out[i] = im
    return out


def decode_long_story_sample(
    value: Dict[str, Any],
    *,
    image_dir: str,
    tokenizer,
    cfg: StoryDecodeConfig,
    image_transform: Optional[Callable] = None,
    sd_image_transform: Optional[Callable] = None,
    rng: Optional[random.Random] = None,
    num_image_given: Optional[int] = None,
    image_opener: Optional[Callable] = None,
) -> Optional[Dict[str, np.ndarray]]:
    """One jsonl record {'images': [...], 'captions': [...]} -> sample dict.

    Mirrors reference decode_long_story_data (story_telling.py:390-557):
    pick num_image_given = randint(0, story_len-2) context images, target is
    the next one; returns None on any decode/filter failure.
    """
    if "images" not in value or "captions" not in value:
        return None
    rng = rng or random
    story_len = len(value["images"])
    if story_len < 2:
        return None
    if num_image_given is None:
        num_image_given = rng.randint(0, story_len - 2)

    if image_opener is None:
        from PIL import Image

        def image_opener(path):
            # lazy open (header only); transforms convert to RGB themselves,
            # and keeping .filename lets the native C++ loader short-circuit
            return Image.open(path)

    try:
        pil_images = []
        # Only the images that enter the sample need decoding (the reference
        # decodes all story_len; we decode num_image_given+2).
        used = value["images"][: num_image_given + 2]
        for rel in used:
            img = image_opener(os.path.join(image_dir, rel))
            pil_images.append(img)
            width, height = img.size

        aspect_ratio = height / width
        if height < cfg.min_resolution or width < cfg.min_resolution:
            return None
        if aspect_ratio < cfg.min_aspect_ratio or aspect_ratio > 1 / cfg.min_aspect_ratio:
            return None

        extra: Dict[str, np.ndarray] = {}
        sd_image = pil_images[num_image_given + 1]
        if sd_image_transform is not None:
            sd_tensor = sd_image_transform(sd_image)
            target_size = sd_tensor.shape[-2]
            extra["time_ids"] = sdxl_micro_conditioning(height, width, target_size)
            extra["sd_images"] = sd_tensor.astype(np.float32)

        if image_transform is not None:
            images = [image_transform(im) for im in pil_images]
        else:
            images = [np.zeros((3, cfg.image_size, cfg.image_size), np.float32)] * len(pil_images)
    except Exception:
        return None

    captions = [value["captions"][i] for i in range(story_len)]
    cmp_tokens = image_comprehension_string(cfg.num_img_in_tokens)
    gen_tokens = image_comprehension_string(cfg.num_img_out_tokens)

    instruction = cfg.instruction_prompt.format_map(
        {"instruction": captions[0] + cmp_tokens}
    )
    for i in range(num_image_given):
        instruction += "[INST]" + captions[i + 1] + cmp_tokens
    response = "[INST]" + captions[num_image_given + 1] + gen_tokens

    input_ids, labels = _encode_spans(tokenizer, instruction, response, cfg.system_message)
    fin = _finalize_sample(
        tokenizer, input_ids, labels, cfg,
        num_cmp_images=num_image_given + 1, has_gen_image=True,
    )
    if fin is None:
        return None
    input_ids, attention_mask, labels, ids_cmp_mask, ids_gen_mask = fin

    n_img = num_image_given + 2
    embeds_cmp_mask = np.zeros(cfg.max_images, bool)
    embeds_gen_mask = np.zeros(cfg.max_images, bool)
    embeds_cmp_mask[: num_image_given + 1] = True
    embeds_gen_mask[num_image_given + 1] = True

    ret = {
        "input_ids": input_ids,
        "attention_mask": attention_mask,
        "labels": labels,
        "ids_cmp_mask": ids_cmp_mask,
        "ids_gen_mask": ids_gen_mask,
        "embeds_cmp_mask": embeds_cmp_mask,
        "embeds_gen_mask": embeds_gen_mask,
        "images": _pad_images(images, cfg),
        "num_images": np.int32(n_img),
    }
    ret.update(extra)
    return ret


def decode_t2i_sample(
    value: Dict[str, Any],
    *,
    image_dir: str,
    tokenizer,
    cfg: StoryDecodeConfig,
    image_transform: Optional[Callable] = None,
    sd_image_transform: Optional[Callable] = None,
    instruction_prompt: str = "[INST] {instruction} [/INST]\n",
    image_opener: Optional[Callable] = None,
) -> Optional[Dict[str, np.ndarray]]:
    """Text-to-image sample (reference decode_t2i_data:182-333): caption ->
    generated image; the single image is a gen target, never context."""
    if "image" not in value or "caption" not in value:
        return None
    if image_opener is None:
        from PIL import Image

        def image_opener(path):
            return Image.open(path)

    try:
        img = image_opener(os.path.join(image_dir, value["image"]))
        width, height = img.size
        aspect_ratio = height / width
        if height < cfg.min_resolution or width < cfg.min_resolution:
            return None
        if aspect_ratio < cfg.min_aspect_ratio or aspect_ratio > 1 / cfg.min_aspect_ratio:
            return None
        extra: Dict[str, np.ndarray] = {}
        if sd_image_transform is not None:
            sd_tensor = sd_image_transform(img)
            target_size = sd_tensor.shape[-2]
            extra["time_ids"] = sdxl_micro_conditioning(height, width, target_size)
            extra["sd_images"] = sd_tensor.astype(np.float32)
        images = [
            image_transform(img)
            if image_transform is not None
            else np.zeros((3, cfg.image_size, cfg.image_size), np.float32)
        ]
    except Exception:
        return None

    gen_tokens = image_comprehension_string(cfg.num_img_out_tokens)
    instruction = instruction_prompt.format_map({"instruction": value["caption"]})
    input_ids, labels = _encode_spans(tokenizer, instruction, gen_tokens, cfg.system_message)
    fin = _finalize_sample(
        tokenizer, input_ids, labels, cfg, num_cmp_images=0, has_gen_image=True
    )
    if fin is None:
        return None
    input_ids, attention_mask, labels, ids_cmp_mask, ids_gen_mask = fin

    embeds_cmp_mask = np.zeros(cfg.max_images, bool)
    embeds_gen_mask = np.zeros(cfg.max_images, bool)
    embeds_gen_mask[0] = True

    ret = {
        "input_ids": input_ids,
        "attention_mask": attention_mask,
        "labels": labels,
        "ids_cmp_mask": ids_cmp_mask,
        "ids_gen_mask": ids_gen_mask,
        "embeds_cmp_mask": embeds_cmp_mask,
        "embeds_gen_mask": embeds_gen_mask,
        "images": _pad_images(images, cfg),
        "num_images": np.int32(1),
    }
    ret.update(extra)
    return ret


def collate(batch: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack samples; every key is already static-shape (images carry the
    max_images axis, so this is a plain stack — the TPU replacement for the
    reference's ragged torch.cat collate)."""
    assert batch, "empty batch"
    keys = batch[0].keys()
    return {k: np.stack([b[k] for b in batch], axis=0) for k in keys}


def flatten_images(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """(B, max_images, ...) image tensors -> (B*max_images, ...) to match the
    agent's flattened image axis; masks flatten alongside."""
    out = dict(batch)
    b, m = batch["images"].shape[:2]
    out["images"] = batch["images"].reshape(b * m, *batch["images"].shape[2:])
    out["embeds_cmp_mask"] = batch["embeds_cmp_mask"].reshape(b * m)
    out["embeds_gen_mask"] = batch["embeds_gen_mask"].reshape(b * m)
    return out
