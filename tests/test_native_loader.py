"""Native C++ image loader: build, PIL parity, batch API, decoder wiring."""

import json
import os
import time

import numpy as np
import pytest
from PIL import Image

from seed_story_tpu.data.native_loader import (
    NativeImageTransform,
    load_batch,
    load_image,
    native_available,
)
from seed_story_tpu.data.transforms import get_transform

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native loader unavailable"
)


@pytest.fixture(scope="module")
def jpgs(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpgs")
    paths = []
    rng = np.random.RandomState(0)
    for i, (w, h) in enumerate([(640, 480), (300, 500), (1024, 1024)]):
        arr = rng.randint(0, 255, (h, w, 3), np.uint8)
        # smooth it so JPEG + resampling differences stay small
        arr = np.asarray(Image.fromarray(arr).resize((w, h), Image.BILINEAR))
        p = str(d / f"img{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    return paths


@pytest.mark.parametrize("mode,keep_ratio", [("clip", False), ("clip", True), ("sd", True)])
def test_native_matches_pil(jpgs, mode, keep_ratio):
    size = 224
    pil_t = get_transform(mode, keep_ratio=keep_ratio, image_size=size)
    for p in jpgs:
        native = load_image(p, size, mode, keep_ratio)
        assert native is not None and native.shape == (3, size, size)
        ref = pil_t(Image.open(p))
        # different resize kernels (DCT-scaled decode + bilinear vs PIL):
        # demand close agreement in normalized space
        diff = np.abs(native - ref).mean()
        assert diff < 0.12, (p, mode, keep_ratio, diff)


def test_batch_api_and_errors(jpgs, tmp_path):
    bad = str(tmp_path / "missing.jpg")
    imgs, ok, sizes = load_batch(jpgs + [bad], 128, "clip", True, nthreads=4)
    assert imgs.shape == (4, 3, 128, 128)
    assert ok.tolist() == [True, True, True, False]
    assert sizes[0].tolist() == [640, 480]


def test_transform_drop_in(jpgs):
    t = NativeImageTransform("clip", keep_ratio=False, image_size=64)
    out = t(Image.open(jpgs[0]))  # lazy PIL -> filename -> native path
    assert out.shape == (3, 64, 64)
    out2 = t(jpgs[0])  # raw path
    np.testing.assert_array_equal(out, out2)
    # non-file PIL image falls back to python path
    out3 = t(Image.new("RGB", (100, 100), (1, 2, 3)))
    assert out3.shape == (3, 64, 64)


def test_decoder_uses_native(jpgs, tmp_path):
    from seed_story_tpu.data.story_telling import StoryDecodeConfig, decode_long_story_sample
    from seed_story_tpu.data.tokenizer import TinyTokenizer

    rec = {"images": [os.path.basename(p) for p in jpgs],
           "captions": ["a", "b", "c"]}
    sample = decode_long_story_sample(
        rec, image_dir=os.path.dirname(jpgs[0]), tokenizer=TinyTokenizer(),
        cfg=StoryDecodeConfig(max_length=128, max_images=3,
                              num_img_in_tokens=4, num_img_out_tokens=4),
        image_transform=NativeImageTransform("clip", False, 32),
        num_image_given=1,
    )
    assert sample is not None
    assert sample["images"].shape == (3, 3, 32, 32)
    assert (np.abs(sample["images"][:2]) > 0).any()


def test_native_throughput_vs_pil(jpgs):
    size = 448
    pil_t = get_transform("clip", keep_ratio=False, image_size=size)
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        for p in jpgs:
            pil_t(Image.open(p))
    t_pil = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        load_batch(jpgs, size, "clip", False, nthreads=4)
    t_native = time.perf_counter() - t0
    print(f"PIL {t_pil:.2f}s vs native {t_native:.2f}s "
          f"({t_pil / max(t_native, 1e-9):.1f}x)")
    # native wins ~1.4x uncontended; this box has 1 CPU core and the suite
    # runs other work, so only guard against a real regression
    assert t_native < 1.5 * t_pil
