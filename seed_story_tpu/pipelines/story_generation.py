"""Story generation pipeline — the gen_george.py flow as a library.

Reproduces /root/reference/src/inference/gen_george.py:152-270: seed with
(image, caption); repeatedly: agent.generate (max 500 new tokens, forced
image blocks) -> de-tokenize the regressed image features -> feed the
GENERATED features (not re-encoded pixels) back as comprehension context
(:209-224) -> sliding window: while more than ``window_size`` images, strip
the oldest "...</img>[INST]" span from the prompt and drop its embeds
(:235-239). Up to ``story_len`` (25) segments.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable, Iterator, List, Optional

import numpy as np
import jax.numpy as jnp

from ..data.tokenizer import BOI_TOKEN, EOI_TOKEN, image_comprehension_string
from ..decode.generate import StoryGenerator
from ..decode.sink_cache import SinkKVCacheManager

TAG_RE = re.compile(r"\s*<[^>]*>\s*")


@dataclasses.dataclass
class StoryPipelineConfig:
    story_len: int = 25
    window_size: int = 8
    num_img_in_tokens: int = 64
    instruction_prompt: str = "{instruction}"
    # run_sink only: cap on retained sink tokens (None = the reference's
    # img_head_tail policy, which grows ~24-28 tokens per evicted image
    # forever — see decode/sink_cache.py). Set to bound cache occupancy
    # (and therefore story length) strictly.
    sink_max_tokens: Optional[int] = None


@dataclasses.dataclass
class StorySegment:
    index: int
    text: str
    image: Optional[Any]  # de-tokenizer output (PIL image / array) or None
    image_features: Optional[Any] = None  # (1, 256, vit_dim)
    context_tokens: int = 0


class StoryGenerationPipeline:
    def __init__(
        self,
        tokenizer,
        generator: StoryGenerator,
        visual_encode: Callable[[np.ndarray], Any],  # pixels (1,3,H,W) -> (1, 256, vit_dim)
        detokenize: Optional[Callable[[Any], Any]] = None,  # feats -> image
        cfg: StoryPipelineConfig = StoryPipelineConfig(),
    ):
        self.tokenizer = tokenizer
        self.generator = generator
        self.visual_encode = visual_encode
        self.detokenize = detokenize
        self.cfg = cfg
        self._boi_id = tokenizer.encode(BOI_TOKEN, add_special_tokens=False)[0]
        self._eoi_id = tokenizer.encode(EOI_TOKEN, add_special_tokens=False)[0]

    # -- prompt machinery ---------------------------------------------

    def _ids_and_masks(self, prompt: str, n_images: int):
        ids = [self.tokenizer.bos_token_id] + self.tokenizer.encode(
            prompt, add_special_tokens=False
        )
        ids = np.asarray(ids, np.int32)
        boi = np.where(ids == self._boi_id)[0]
        eoi = np.where(ids == self._eoi_id)[0]
        ids_cmp = np.zeros(len(ids), bool)
        for i in range(n_images):
            ids_cmp[boi[i] + 1 : eoi[i]] = True
        return ids, ids_cmp

    def _clean(self, token_ids) -> str:
        text = self.tokenizer.decode(token_ids, skip_special_tokens=False)
        return TAG_RE.sub(" ", text).strip()

    # -- main loop -----------------------------------------------------

    def run(self, image_pixels: np.ndarray, caption: str) -> Iterator[StorySegment]:
        """image_pixels: (1, 3, H, W) CLIP-transformed start frame."""
        cfg = self.cfg
        image_tokens = image_comprehension_string(cfg.num_img_in_tokens)
        prompt = cfg.instruction_prompt.format_map(
            {"instruction": caption + image_tokens}
        )
        image_embeds = jnp.asarray(self.visual_encode(image_pixels))

        ids, ids_cmp = self._ids_and_masks(prompt, 1)
        out = self.generator.generate(
            ids, image_embeds, np.ones((1,), bool), ids_cmp
        )
        text = self._clean(out["generate_ids"])
        if not out["has_img_output"]:
            # text-only story end (reference falls straight out of its loop)
            yield StorySegment(0, text, None, None, len(ids))
            return

        text_id = 1
        while out["has_img_output"] and image_embeds.shape[0] < cfg.story_len:
            feats = out["img_gen_feat"]  # (1, 256, vit_dim)
            image = self.detokenize(feats) if self.detokenize is not None else None
            yield StorySegment(text_id, text, image, np.asarray(feats), len(ids))

            # generated features re-enter context (gen_george.py:224)
            image_embeds = jnp.concatenate([image_embeds, jnp.asarray(feats)], axis=0)

            if text_id >= cfg.story_len - 1:
                return
            prompt = prompt + text + image_tokens
            text_id += 1

            # sliding window (gen_george.py:235-239)
            while image_embeds.shape[0] > cfg.window_size:
                eoi_idx = prompt.index(EOI_TOKEN)
                prompt = prompt[eoi_idx + len(EOI_TOKEN) + len("[INST]"):]
                image_embeds = image_embeds[1:]

            n_img = int(image_embeds.shape[0])
            ids, ids_cmp = self._ids_and_masks(prompt, n_img)
            out = self.generator.generate(
                ids, image_embeds, np.ones((n_img,), bool), ids_cmp
            )
            text = self._clean(out["generate_ids"])

        if not out["has_img_output"]:
            # closing text-only segment: the reference writes EVERY
            # generate's text to text.txt before re-checking has_img_output
            # (gen_george.py:264-268), so the text that ends the story is
            # part of the output (mirrors run_batch's final_text handling)
            yield StorySegment(text_id, text, None, None, len(ids))

    # -- sink-threaded generation (beyond the reference) ----------------

    def run_sink(
        self, image_pixels: np.ndarray, caption: str
    ) -> Iterator[StorySegment]:
        """Long-story generation with the multimodal attention-sink KV
        cache threaded ACROSS segments.

        The reference has two flows: gen_george.py re-encodes the whole
        window-8 prompt every segment (:209-239), and vis_george_sink.py
        threads the cache across turns but only for ground-truth texts
        (:243-295). This mode composes them: generation itself rides the
        sink cache — per segment only the just-generated image's 66-token
        comprehension block is prefilled, the generated text tokens' KV is
        reused verbatim from decode time, and old segments leave context
        via the sink eviction policy (decode/sink_cache.py) instead of
        prompt re-construction. The per-segment prefill is O(66) instead
        of O(window).

        Occupancy: the sink policy permanently retains ~24-28 tokens per
        evicted image (vis_george_sink.py:266-291 semantics), so cache
        occupancy grows linearly past the window — size
        ``gen.cfg.cache_capacity`` >= prompt + window live tokens +
        max_new + ~28 x (story_len - window_size), or set
        ``cfg.sink_max_tokens`` to cap the sink (beyond-reference knob)
        and bound occupancy — and story length — strictly. A guard raises
        before any generate call that could overflow the fixed-capacity
        cache (inserts clamp rather than grow; overflow would silently
        overwrite committed KV).

        Context semantics differ from run() in two documented ways:
        (a) carried context follows the sink retention policy, not the
        verbatim window prompt; (b) generated text stays in context as the
        raw decoded tokens (run() detags + re-tokenizes the cleaned text).
        Requires the generator built with return_cache=True.
        """
        cfg = self.cfg
        gen = self.generator
        assert gen.cfg.return_cache, (
            "run_sink threads the KV cache across segments; build the "
            "StoryGenerator with return_cache=True"
        )
        image_tokens = image_comprehension_string(cfg.num_img_in_tokens)
        suffix_ids = np.asarray(
            self.tokenizer.encode(image_tokens, add_special_tokens=False),
            np.int32,
        )
        suffix_cmp = np.zeros(len(suffix_ids), bool)
        sb = int(np.where(suffix_ids == self._boi_id)[0][0])
        se = int(np.where(suffix_ids == self._eoi_id)[0][0])
        suffix_cmp[sb + 1 : se] = True

        prompt = cfg.instruction_prompt.format_map(
            {"instruction": caption + image_tokens}
        )
        live_ids, ids_cmp = self._ids_and_masks(prompt, 1)
        sink = SinkKVCacheManager(
            capacity=gen.cfg.cache_capacity, max_sink=cfg.sink_max_tokens
        )
        bucket = gen.cfg.prompt_bucket
        slack = gen.cfg.speculate_k + 1 if gen.cfg.speculate_k > 0 else 0

        def _guard_capacity(committed: int, prefill_len: int):
            # inserts into the fixed-capacity cache clamp rather than grow:
            # an overflowing call would silently overwrite committed KV, so
            # refuse up front (prefill writes its full bucket-padded length)
            padded = -(-prefill_len // bucket) * bucket
            need = committed + padded + gen.cfg.max_new_tokens + slack
            if need > gen.cfg.cache_capacity:
                raise ValueError(
                    f"run_sink: segment needs {need} cache slots "
                    f"({committed} committed sink+live, {padded} padded "
                    f"prefill, {gen.cfg.max_new_tokens}+{slack} decode) but "
                    f"cache_capacity={gen.cfg.cache_capacity}. Size the "
                    "capacity >= prompt + window live tokens + max_new + "
                    "~28 x (story_len - window_size), or set "
                    "StoryPipelineConfig.sink_max_tokens to cap sink growth."
                )

        _guard_capacity(0, len(live_ids))
        out = gen.generate(
            live_ids, jnp.asarray(self.visual_encode(image_pixels)),
            np.ones((1,), bool), ids_cmp,
        )
        n_images = 1
        text_id = 1
        while True:
            gen_ids = np.asarray(out["generate_ids"], np.int32)
            text = self._clean(gen_ids)
            if not out["has_img_output"]:
                # closing text-only segment (mirrors run(): index 0 only
                # when the very first generate ends the story)
                yield StorySegment(
                    0 if text_id == 1 else text_id, text, None, None,
                    sink.sink_len + len(live_ids),
                )
                return
            feats = out["img_gen_feat"]
            image = (self.detokenize(feats)
                     if self.detokenize is not None else None)
            yield StorySegment(
                text_id, text, image, np.asarray(feats),
                sink.sink_len + len(live_ids) + len(gen_ids),
            )
            if text_id >= cfg.story_len - 1:
                return
            text_id += 1

            # keep the generated TEXT tokens' KV (they ARE the story
            # context); drop the generated image block's KV — those slots
            # were written with decode-time gen-query embeddings, and the
            # reference feeds the image back through the COMPREHENSION
            # projection of the regressed features (gen_george.py:209-224),
            # which the 66-token suffix prefill below reproduces.
            boi_pos = np.where(gen_ids == self._boi_id)[0]
            n_text = int(boi_pos[0]) if len(boi_pos) else len(gen_ids)
            live_ids = np.concatenate([live_ids, gen_ids[:n_text]])
            cache = sink.truncate(out["cache"], sink.sink_len + len(live_ids))

            # sink evictions once the window is full (the NEW image below
            # brings context to n_images + 1)
            n_images += 1
            while n_images > cfg.window_size:
                boi = int(np.where(live_ids == self._boi_id)[0][0])
                eoi = int(np.where(live_ids == self._eoi_id)[0][0])
                cache, dropped = sink.evict_image_span(
                    cache, boi, eoi, live_len=len(live_ids)
                )
                live_ids = live_ids[dropped:]
                n_images -= 1

            # prefill ONLY the comprehension block of the new image
            _guard_capacity(sink.sink_len + len(live_ids), len(suffix_ids))
            out = gen.generate(
                suffix_ids, out["img_gen_feat"], np.ones((1,), bool),
                suffix_cmp, cache=cache,
            )
            live_ids = np.concatenate([live_ids, suffix_ids])

    # -- batched serving path -----------------------------------------

    def run_batch(self, seeds) -> Iterator[List[Optional[StorySegment]]]:
        """Advance B independent stories in lockstep through ONE on-device
        program per round (StoryGenerator.generate_batch): B=1 decode is
        HBM-bound on parameter bytes, so B stories share each token's
        parameter stream — measured ~3.3x story throughput at B=4 on 7B.
        The torch reference loops val stories one at a time
        (gen_george.py:152).

        ``seeds``: list of (image_pixels, caption). Yields one list per
        round with a StorySegment per story (None once that story has
        finished). Finished stories keep riding the batch as dummies until
        every story ends (lockstep keeps one compiled program alive)."""
        cfg = self.cfg
        image_tokens = image_comprehension_string(cfg.num_img_in_tokens)
        states = []
        for pixels, caption in seeds:
            prompt = cfg.instruction_prompt.format_map(
                {"instruction": caption + image_tokens}
            )
            states.append({
                "prompt": prompt,
                "embeds": jnp.asarray(self.visual_encode(pixels)),
                "alive": True,
                "text_id": 1,
            })

        def round_trip():
            batch_in = []
            for st in states:
                n_img = int(st["embeds"].shape[0])
                ids, cmp_ = self._ids_and_masks(st["prompt"], n_img)
                st["ids_len"] = len(ids)
                batch_in.append(dict(
                    input_ids=ids, image_embeds=st["embeds"],
                    embeds_cmp_mask=np.ones((n_img,), bool),
                    ids_cmp_mask=cmp_,
                ))
            return self.generator.generate_batch(batch_in)

        outs = round_trip()
        # text-only endings surface once, then the story goes dormant
        finals: List[Optional[StorySegment]] = [None] * len(states)
        for r, (st, out) in enumerate(zip(states, outs)):
            if not out["has_img_output"]:
                finals[r] = StorySegment(
                    0, self._clean(out["generate_ids"]), None, None,
                    st["ids_len"],
                )
                st["alive"] = False
        if any(f is not None for f in finals):
            yield finals

        while any(st["alive"] for st in states):
            segments: List[Optional[StorySegment]] = [None] * len(states)
            for r, (st, out) in enumerate(zip(states, outs)):
                if not st["alive"]:
                    continue
                feats = out["img_gen_feat"]
                image = (self.detokenize(feats)
                         if self.detokenize is not None else None)
                text = self._clean(out["generate_ids"])
                segments[r] = StorySegment(
                    st["text_id"], text, image, np.asarray(feats),
                    st["ids_len"],
                )
                st["embeds"] = jnp.concatenate(
                    [st["embeds"], jnp.asarray(feats)], axis=0
                )
                if st["text_id"] >= cfg.story_len - 1 or (
                    st["embeds"].shape[0] >= cfg.story_len
                ):
                    st["alive"] = False
                st["prompt"] = st["prompt"] + text + image_tokens
                st["text_id"] += 1
                while st["embeds"].shape[0] > cfg.window_size:
                    eoi_idx = st["prompt"].index(EOI_TOKEN)
                    st["prompt"] = st["prompt"][
                        eoi_idx + len(EOI_TOKEN) + len("[INST]"):
                    ]
                    st["embeds"] = st["embeds"][1:]
            yield segments
            if not any(st["alive"] for st in states):
                return
            outs = round_trip()
            for r, (st, out) in enumerate(zip(states, outs)):
                if st["alive"] and not out["has_img_output"]:
                    # story ended without an image: emit its closing text
                    st["alive"] = False
                    st["final_text"] = self._clean(out["generate_ids"])
            closing = [
                StorySegment(st["text_id"], st.pop("final_text"), None, None,
                             st["ids_len"])
                if "final_text" in st else None
                for st in states
            ]
            if any(c is not None for c in closing):
                yield closing
