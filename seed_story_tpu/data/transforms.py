"""Host-side image transforms (PIL + numpy), torchvision-free.

Same surface as the reference's get_transform
(/root/reference/src/processer/transforms.py:4): 'clip' (CLIP mean/std,
448px for the Qwen ViT) and 'sd' ([-1,1], 1024px for SDXL), each with
keep_ratio (resize-shorter-side + center-crop) or stretch variants.
Outputs are CHW float32 numpy arrays, ready for device_put.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _resize_shorter(img: Image.Image, size: int, resample) -> Image.Image:
    w, h = img.size
    if w <= h:
        new_w, new_h = size, max(1, round(h * size / w))
    else:
        new_w, new_h = max(1, round(w * size / h)), size
    return img.resize((new_w, new_h), resample)


def _center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    left = (w - size) // 2
    top = (h - size) // 2
    return img.crop((left, top, left + size, top + size))


class ImageTransform:
    """Callable: PIL.Image -> float32 CHW numpy array."""

    def __init__(self, type: str = "clip", keep_ratio: bool = True, image_size: int = 224):
        assert type in ("clip", "clipa", "sd"), type
        self.type = type
        self.keep_ratio = keep_ratio
        self.image_size = image_size
        # torchvision uses bilinear for 'clip' (default Resize) and bicubic
        # for 'sd' (explicit) — mirrored here.
        self.resample = Image.BICUBIC if type == "sd" else Image.BILINEAR

    def __call__(self, img: Image.Image) -> np.ndarray:
        size = self.image_size
        img = img.convert("RGB")  # reference converts before transforming
        if self.keep_ratio:
            img = _resize_shorter(img, size, self.resample)
            img = _center_crop(img, size)
        else:
            img = img.resize((size, size), self.resample)
        x = np.asarray(img, np.float32) / 255.0  # HWC
        if self.type == "clip":
            x = (x - CLIP_MEAN) / CLIP_STD
        elif self.type == "clipa":
            x = (x - IMAGENET_MEAN) / IMAGENET_STD
        else:  # sd
            x = x * 2.0 - 1.0
        return np.transpose(x, (2, 0, 1))  # CHW


def get_transform(type: str = "clip", keep_ratio: bool = True, image_size: int = 224) -> ImageTransform:
    return ImageTransform(type=type, keep_ratio=keep_ratio, image_size=image_size)
