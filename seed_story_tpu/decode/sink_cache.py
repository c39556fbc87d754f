"""Multimodal attention-sink KV cache policy, XLA-style.

The reference implements the policy with Python-side dynamic cache surgery
(/root/reference/src/inference/vis_george_sink.py:254-295, cache_mode
'img_head_tail'): permanently retain (a) the first 4 tokens of the stream
(classic StreamingLLM sink) and (b) for each evicted image, 12 tokens
around its ``<img>`` (boi-4..boi+8) and 12 around its ``</img>``
(eoi-8..eoi+4), spliced ahead of the live tail.

Dynamic-shape concatenation is hostile to jit, so here an eviction is ONE
static-shape gather over the fixed-capacity cache: the host (which owns the
token stream and knows boi/eoi positions) computes the keep-index vector,
the device compacts all layers in a single fused gather. Retained-token
sets are identical to the reference — including its quirk that the
``eoi-8..eoi+4`` sink window overlaps the live tail by 3 tokens, which the
reference duplicates (:273-291); we reproduce the duplication.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import KVCache

FIRST_SINK = 4
BOI_BACK, BOI_FWD = 4, 8
EOI_BACK, EOI_FWD = 8, 4


@jax.jit
def _compact(cache: KVCache, indices: jax.Array, new_len: jax.Array) -> KVCache:
    """Gather capacity-axis slots into a compacted cache. ``indices`` has
    static length == capacity (tail entries are don't-care)."""
    k = tuple(jnp.take(layer, indices, axis=2) for layer in cache.k)
    v = tuple(jnp.take(layer, indices, axis=2) for layer in cache.v)
    ks = vs = None
    if cache.quantized:  # int8 mode: scales ride along the token axis
        ks = tuple(jnp.take(layer, indices, axis=2) for layer in cache.k_scale)
        vs = tuple(jnp.take(layer, indices, axis=2) for layer in cache.v_scale)
    return KVCache(
        k=k, v=v, length=jnp.broadcast_to(new_len, cache.length.shape),
        k_scale=ks, v_scale=vs,
    )


@dataclasses.dataclass
class SinkKVCacheManager:
    """Host-side bookkeeping for one streamed sequence (batch 1).

    The device cache layout invariant: slots [0, sink_len) hold retained
    sink tokens, [sink_len, length) the live (un-evicted) suffix, in order.

    The reference policy (img_head_tail) retains ~24-28 tokens PER evicted
    image forever (12 around <img> + 12 around </img>, + the one-time first
    4), so the sink grows linearly with story length — size ``capacity``
    accordingly. ``max_sink`` (beyond the reference) caps that growth: once
    the sink exceeds it, the OLDEST per-image windows are dropped (the
    first-4 StreamingLLM block is always kept), making cache occupancy — and
    therefore story length — truly bounded.
    """

    capacity: int
    max_sink: int | None = None
    sink_len: int = 0
    _has_first_sink: bool = False
    # per-eviction retained window lengths, oldest first (excludes the
    # one-time first-4 block) — consumed by the max_sink cap
    _window_lens: List[int] = dataclasses.field(default_factory=list)

    def evict_image_span(
        self,
        cache: KVCache,
        boi_idx: int,
        eoi_idx: int,
        live_len: int,
    ) -> Tuple[KVCache, int]:
        """Evict the live-region span [0, eoi_idx] (the oldest image block
        and everything before it), retaining the sink windows.

        boi_idx/eoi_idx are positions WITHIN the live region (i.e. indices
        into the host's current input_ids, which exclude prior sinks);
        live_len is the current live-region length. Returns the compacted
        cache and the number of live tokens dropped from the host ids
        (== eoi_idx + 1).
        """
        s = self.sink_len
        keep: List[int] = list(range(s))  # existing sink block
        first_len = 0
        if not self._has_first_sink:
            # first 4 tokens of the stream (currently at live positions 0..3)
            n_first = min(FIRST_SINK, live_len)
            keep += [s + i for i in range(n_first)]
            self._has_first_sink = True
            first_len = n_first
        elif self._window_lens:
            first_len = self.sink_len - sum(self._window_lens)

        lo = max(0, boi_idx - BOI_BACK)
        win = [s + i for i in range(lo, min(boi_idx + BOI_FWD, live_len))]
        lo = max(0, eoi_idx - EOI_BACK)
        win += [s + i for i in range(lo, min(eoi_idx + EOI_FWD, live_len))]
        keep += win
        self._window_lens.append(len(win))

        if self.max_sink is not None:
            # bounded-sink mode (beyond the reference): drop the OLDEST
            # per-image windows until the sink fits; the first-4 block
            # (slots [0, first_len)) always survives
            while len(keep) > self.max_sink and len(self._window_lens) > 1:
                w = self._window_lens.pop(0)
                del keep[first_len : first_len + w]

        new_sink_len = len(keep)
        # live tail after the evicted span (reference keeps from eoi+1)
        keep += [s + i for i in range(eoi_idx + 1, live_len)]
        new_len = len(keep)
        if new_len > self.capacity:
            raise ValueError(
                f"cache_capacity={self.capacity} too small: eviction still "
                f"needs {new_len} slots ({new_sink_len} sink + "
                f"{new_len - new_sink_len} live). Size the cache at "
                "construction to >= prompt growth between evictions + the "
                "accumulated sink budget (~28 tokens per evicted image), "
                "or cap the sink with max_sink."
            )

        idx = np.zeros((self.capacity,), np.int32)
        idx[:new_len] = keep
        cache = _compact(cache, jnp.asarray(idx), jnp.int32(new_len))
        self.sink_len = new_sink_len
        return cache, eoi_idx + 1

    def truncate(self, cache: KVCache, total_len: int) -> KVCache:
        """Drop cache entries beyond ``total_len`` (sink + live), i.e. the
        reference's ``kv[:, :, :prompt_len, :]`` truncation (:243)."""
        return dataclasses.replace(
            cache, length=jnp.full_like(cache.length, total_len)
        )
