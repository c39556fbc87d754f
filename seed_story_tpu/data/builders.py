"""Datapipe builders with the reference's exact config surface.

Mirror of /root/reference/src/data/story_telling.py:336,560,616 —
``build_long_story_datapipe`` / ``build_t2i_datapipe`` /
``build_multi_datapipes`` keyword-for-keyword, so the shipped YAML configs
(configs/data/george_sft.yaml etc.) instantiate unchanged, returning our
iterator pipeline instead of torchdata datapipes.
"""

from __future__ import annotations

import functools
from typing import Callable, Iterable, List, Optional

from .datapipes import JsonlStoryDataset, batched, sample_multiplexer
from .story_telling import (
    StoryDecodeConfig,
    decode_long_story_sample,
    decode_t2i_sample,
)


class StoryDataPipe:
    """Iterable of collated batches (or raw samples when batch_size=None)."""

    def __init__(self, dataset: JsonlStoryDataset, batch_size: Optional[int]):
        self.dataset = dataset
        self.batch_size = batch_size

    def __iter__(self):
        if self.batch_size is None:
            return iter(self.dataset)
        return batched(iter(self.dataset), self.batch_size)

    # data-order resume (delegated to the dataset; see runner.run_training)
    def state(self):
        return self.dataset.state()

    def set_state(self, state):
        self.dataset.set_state(state)


def build_long_story_datapipe(
    data_dir,
    image_dir,
    tokenizer=None,
    story_len=30,
    max_length=77,
    batch_size=None,
    min_resolution=180,
    image_transform=None,
    sd_image_transform=None,
    instruction_prompt="{instruction}",
    turn_sep="\n",
    system_message="",
    min_aspect_ratio=0.666,
    num_img_in_tokens=64,
    num_img_out_tokens=64,
    cycle_count=None,
    seed=0,
    max_images=None,
) -> StoryDataPipe:
    cfg = StoryDecodeConfig(
        story_len=story_len,
        max_length=max_length,
        max_images=max_images or story_len,
        num_img_in_tokens=num_img_in_tokens,
        num_img_out_tokens=num_img_out_tokens,
        instruction_prompt=instruction_prompt,
        system_message=system_message,
        turn_sep=turn_sep,
        min_resolution=min_resolution,
        min_aspect_ratio=min_aspect_ratio,
    )
    decode = functools.partial(
        decode_long_story_sample,
        image_dir=image_dir,
        tokenizer=tokenizer,
        cfg=cfg,
        image_transform=image_transform,
        sd_image_transform=sd_image_transform,
    )
    ds = JsonlStoryDataset(data_dir, decode, cycle_count=cycle_count or 1, seed=seed)
    return StoryDataPipe(ds, batch_size)


def build_t2i_datapipe(
    data_dir,
    image_dir,
    tokenizer=None,
    max_length=77,
    batch_size=None,
    min_resolution=180,
    image_transform=None,
    sd_image_transform=None,
    instruction_prompt="[INST] {instruction} [INST]\n",
    turn_sep="\n",
    system_message="",
    min_aspect_ratio=0.666,
    num_img_in_tokens=64,
    num_img_out_tokens=64,
    cycle_count=None,
    seed=0,
    max_images: int = 1,
) -> StoryDataPipe:
    cfg = StoryDecodeConfig(
        max_length=max_length,
        max_images=max_images,
        num_img_in_tokens=num_img_in_tokens,
        num_img_out_tokens=num_img_out_tokens,
        system_message=system_message,
        turn_sep=turn_sep,
        min_resolution=min_resolution,
        min_aspect_ratio=min_aspect_ratio,
    )
    decode = functools.partial(
        decode_t2i_sample,
        image_dir=image_dir,
        tokenizer=tokenizer,
        cfg=cfg,
        image_transform=image_transform,
        sd_image_transform=sd_image_transform,
        instruction_prompt=instruction_prompt,
    )
    ds = JsonlStoryDataset(data_dir, decode, cycle_count=cycle_count or 1, seed=seed)
    return StoryDataPipe(ds, batch_size)


class MultiStoryDataPipe:
    """Stateful weighted mix of datapipes (== SampleMultiplexer) that
    SUPPORTS data-order resume.

    The bare ``sample_multiplexer`` generator has no ``state()``, so the
    runner silently skipped data-order checkpointing for every config built
    through ``build_multi_datapipes`` — the standard stage-2/3 surface
    (found by the on-chip kill/resume proof, round 4). Resume = (a) each
    child fast-forwards itself via its own state (decode-skipping replay),
    (b) the multiplexer's seeded choice stream is re-drawn ``draws`` times
    so the child-selection sequence continues identically.

    Caveat: the choice replay assumes no child exhausted during the
    skipped prefix (training configs cycle indefinitely, so children never
    exhaust mid-run)."""

    def __init__(self, pipes, weights, seed=0):
        self.pipes = list(pipes)
        self.weights = list(weights)
        self.seed = seed
        self._draws = 0
        self._pending_draws = 0

    def state(self):
        return {
            "draws": self._draws,
            "children": [p.state() if hasattr(p, "state") else None
                         for p in self.pipes],
        }

    def set_state(self, state):
        self._pending_draws = int(state["draws"])
        for p, cs in zip(self.pipes, state.get("children", [])):
            if cs is not None and hasattr(p, "set_state"):
                p.set_state(cs)

    def __iter__(self):
        import random

        its = [iter(p) for p in self.pipes]
        weights = list(self.weights)
        rng = random.Random(self.seed)
        self._draws = 0
        for _ in range(self._pending_draws):
            rng.choices(range(len(its)), weights=weights, k=1)
            self._draws += 1
        self._pending_draws = 0
        while its:
            i = rng.choices(range(len(its)), weights=weights, k=1)[0]
            try:
                sample = next(its[i])
            except StopIteration:
                del its[i], weights[i]
                continue
            self._draws += 1
            yield sample


def build_multi_datapipes(
    datapipes: List,
    tokenizer=None,
    image_transform=None,
    sd_image_transform=None,
    sample_weights=None,
    seed=0,
):
    """Weighted mix (== torchdata SampleMultiplexer, reference :616-634).
    ``datapipes`` entries may be dict configs (deferred instantiation —
    the reference uses _recursive_: False) or built pipes."""
    from ..utils.config import instantiate

    built = []
    for dp in datapipes:
        if isinstance(dp, dict):
            dp = instantiate(
                dp, tokenizer=tokenizer, image_transform=image_transform,
                sd_image_transform=sd_image_transform,
            )
        built.append(dp)
    if sample_weights is None:
        sample_weights = [1.0] * len(built)
    assert len(sample_weights) == len(built)
    return MultiStoryDataPipe(built, sample_weights, seed=seed)
