"""Story visualization with the multimodal attention-sink KV cache.

Reproduces /root/reference/src/inference/vis_george_sink.py: ground-truth
texts, generated images; the KV cache persists across turns (only the new
``<img>...</img> + text`` suffix is prefilled each turn) and long stories
trigger sink evictions instead of full re-encodes.

Cache bookkeeping (host owns the token stream):
  * after each turn the cache is truncated back to the prompt (the
    generated tokens' KV is discarded — reference :243)
  * the appended suffix is prefilled against the live cache with
    ``kv_cache_head`` == cache.length (reference :244-249)
  * when more than ``window_size`` images are in context, the oldest image
    span is evicted via SinkKVCacheManager (one device gather) and the
    host ids are sliced to match (reference :254-295)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterator, List, Optional

import numpy as np
import jax.numpy as jnp

from ..data.tokenizer import BOI_TOKEN, EOI_TOKEN, image_comprehension_string
from ..decode.generate import StoryGenerator
from ..decode.sink_cache import SinkKVCacheManager
from .story_generation import StorySegment, TAG_RE


@dataclasses.dataclass
class VisPipelineConfig:
    story_len: int = 25
    window_size: int = 8
    num_img_in_tokens: int = 64
    instruction_prompt: str = "{instruction}"


class StoryVisualizationPipeline:
    def __init__(
        self,
        tokenizer,
        generator: StoryGenerator,
        visual_encode: Callable,
        detokenize: Optional[Callable] = None,
        cfg: VisPipelineConfig = VisPipelineConfig(),
    ):
        self.tokenizer = tokenizer
        self.generator = generator
        self.visual_encode = visual_encode
        self.detokenize = detokenize
        self.cfg = cfg
        self._boi_id = tokenizer.encode(BOI_TOKEN, add_special_tokens=False)[0]
        self._eoi_id = tokenizer.encode(EOI_TOKEN, add_special_tokens=False)[0]

    def _cmp_mask(self, ids: np.ndarray, n_images: int) -> np.ndarray:
        boi = np.where(ids == self._boi_id)[0]
        eoi = np.where(ids == self._eoi_id)[0]
        mask = np.zeros(len(ids), bool)
        for i in range(n_images):
            mask[boi[i] + 1 : eoi[i]] = True
        return mask

    def run(
        self, image_pixels: np.ndarray, starting_text: str, texts: List[str]
    ) -> Iterator[StorySegment]:
        cfg = self.cfg
        tok = self.tokenizer
        image_tokens = image_comprehension_string(cfg.num_img_in_tokens)

        prompt = (
            cfg.instruction_prompt.format_map(
                {"instruction": starting_text + image_tokens}
            )
            + texts[0]
        )
        live_ids = np.asarray(
            [tok.bos_token_id] + tok.encode(prompt, add_special_tokens=False),
            np.int32,
        )
        image_embeds = jnp.asarray(self.visual_encode(image_pixels))
        n_images = 1

        sink = SinkKVCacheManager(capacity=self.generator.cfg.cache_capacity)
        cmp_mask = self._cmp_mask(live_ids, n_images)
        out = self.generator.generate(
            live_ids, image_embeds, np.ones((1,), bool), cmp_mask
        )
        cache_live_len = len(live_ids)

        text_id = 1
        while out["has_img_output"] and n_images < cfg.story_len:
            feats = out["img_gen_feat"]
            image = self.detokenize(feats) if self.detokenize is not None else None
            yield StorySegment(
                text_id, texts[text_id - 1], image, np.asarray(feats),
                sink.sink_len + len(live_ids),
            )

            n_images += 1
            if text_id >= min(cfg.story_len - 1, len(texts)):
                return
            text = texts[text_id]
            text_id += 1

            # drop generated tokens' KV, keep sink + live prompt (ref :243)
            cache = sink.truncate(out["cache"], sink.sink_len + cache_live_len)

            # append the new image block + next text (ref :246-249)
            suffix_ids = np.asarray(
                tok.encode(image_tokens + text, add_special_tokens=False), np.int32
            )
            suffix_start = len(live_ids)
            live_ids = np.concatenate([live_ids, suffix_ids])

            # sink evictions (ref :254-295)
            while n_images > cfg.window_size:
                boi = int(np.where(live_ids == self._boi_id)[0][0])
                eoi = int(np.where(live_ids == self._eoi_id)[0][0])
                cache, dropped = sink.evict_image_span(
                    cache, boi, eoi, live_len=cache_live_len
                )
                live_ids = live_ids[dropped:]
                suffix_start -= dropped
                cache_live_len -= dropped
                image_embeds = image_embeds[1:]
                n_images -= 1

            # prefill ONLY the new suffix against the carried cache
            new_feats = jnp.asarray(feats)
            image_embeds = jnp.concatenate([image_embeds, new_feats], axis=0)
            suffix = live_ids[suffix_start:]
            suffix_cmp = self._cmp_mask(suffix, 1)  # the new image's block
            out = self.generator.generate(
                suffix, new_feats, np.ones((1,), bool), suffix_cmp, cache=cache
            )
            cache_live_len = len(live_ids)
