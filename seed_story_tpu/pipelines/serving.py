"""Pipelined two-stage story serving: decode and de-tokenization overlap.

The reference serves stories strictly serially on one GPU — each segment
runs agent.generate, then 50 SDXL denoise steps, then the next segment
(/root/reference/src/inference/gen_george.py:208-224). Nothing in the
dataflow requires that: the MLLM feeds back its OWN regressed features as
comprehension context, never the de-tokenized pixels (:209-224), so image
synthesis is a pure sink stage. On a multi-chip slice (v5e-8) the two
stages can run on disjoint device sets and overlap completely:

  decode chips:  seg1 ---- seg2 ---- seg3 ----
  detok  chips:       img1 ----- img2 ----- img3

Measured single-chip costs (PERF.md): batched decode 2.7 s/segment (B=4),
SDXL 6.7 s/image — so ~2-3 de-tokenizer replicas per decode chip hide the
de-tokenizer entirely and the story rate becomes decode-bound. This module
provides the orchestrator:

- :class:`DetokenizerPool` — N de-tokenizer replicas, each pinned to its
  own device (or device subset) and owned by a single worker thread;
  ``submit`` round-robins and returns a Future. JAX dispatch releases the
  GIL while the device computes, so replica threads genuinely overlap.
- :class:`PipelinedStoryServer` — drives the batched lockstep decode
  (StoryGenerationPipeline.run_batch) and streams every produced feature
  straight into the pool without blocking the decode loop.

Device placement follows data: each replica's params are ``device_put`` to
its device by the user-supplied factory, and XLA runs each replica where
its params live. The decode stage places its params exactly as the
single-chip / TP paths already do.
"""

from __future__ import annotations

import itertools
import threading
import time
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Callable, Iterator, List, Optional, Sequence, Tuple

from .story_generation import StoryGenerationPipeline, StorySegment


class DetokenizerPool:
    """Round-robin pool of de-tokenizer replicas on disjoint devices.

    ``make_detok(device) -> (feats -> image)`` builds one replica with its
    params resident on ``device``; it is called once per device up front
    (build + compile happen before serving starts). Each replica is owned
    by a single worker thread, so a replica never runs two requests
    concurrently while different replicas run in parallel.
    """

    def __init__(self, make_detok: Callable[[Any], Callable], devices: Sequence[Any]):
        if not devices:
            raise ValueError("DetokenizerPool needs at least one device")
        self._replicas = [make_detok(d) for d in devices]
        # one single-thread executor per replica: round-robin submission
        # can never double-book a replica
        self._executors = [ThreadPoolExecutor(1) for _ in self._replicas]
        self._rr = itertools.cycle(range(len(self._replicas)))
        self._lock = threading.Lock()
        self.busy_s = [0.0] * len(self._replicas)
        self.calls = [0] * len(self._replicas)
        self.failures = 0

    def __len__(self) -> int:
        return len(self._replicas)

    def submit(self, feats) -> "Future":
        with self._lock:
            i = next(self._rr)

        def work():
            # one failover hop: transient per-device failures happen on
            # real hardware (e.g. RESOURCE_EXHAUSTED while the runtime
            # still holds a just-exited process's HBM); a story should
            # survive a single flaky replica
            n = len(self._replicas)
            tries = (i, (i + 1) % n) if n > 1 else (i,)  # no same-replica retry
            last_err = None
            for attempt, j in enumerate(tries):
                try:
                    t0 = time.perf_counter()
                    out = self._replicas[j](feats)
                    self.busy_s[j] += time.perf_counter() - t0
                    self.calls[j] += 1
                    return out
                except Exception as e:  # noqa: BLE001
                    # (failover may briefly double-book replica j with its
                    # own thread; JAX dispatch serializes on the device,
                    # so this is safe, just not accounted per-thread)
                    last_err = e
                    self.failures += 1
                    if attempt + 1 < len(tries):
                        import logging

                        logging.warning(
                            "detokenizer replica %d failed (%s); "
                            "retrying on replica %d",
                            j, type(e).__name__, tries[attempt + 1],
                        )
            raise last_err

        return self._executors[i].submit(work)

    def shutdown(self):
        for ex in self._executors:
            ex.shutdown(wait=True)


class PipelinedStoryServer:
    """Overlap lockstep batched decode with pooled de-tokenization.

    ``pipeline`` must be built WITHOUT a detokenize hook (decode-only);
    the server owns image synthesis. Yields ``(story_index, StorySegment)``
    in segment-completion order; each segment's ``image`` is filled in by
    the pool before it is yielded.
    """

    def __init__(self, pipeline: StoryGenerationPipeline, pool: DetokenizerPool):
        if pipeline.detokenize is not None:
            raise ValueError(
                "PipelinedStoryServer owns de-tokenization; build the "
                "pipeline with detokenize=None"
            )
        self.pipeline = pipeline
        self.pool = pool
        # cumulative wall time of the serve_stream loops (decode + yield
        # suspension while the consumer saves output) across all calls
        self.decode_s = 0.0

    def serve_stream(
        self, seeds: Sequence[Tuple[Any, str]]
    ) -> Iterator[Tuple[int, StorySegment]]:
        pending: List[Tuple[int, StorySegment, Optional[Future]]] = []
        t0 = time.perf_counter()
        for round_segments in self.pipeline.run_batch(list(seeds)):
            # enqueue this round's images immediately, then keep decoding;
            # the pool's threads drain while the next round's decode runs
            for story_idx, seg in enumerate(round_segments):
                if seg is None:
                    continue
                fut = (self.pool.submit(seg.image_features)
                       if seg.image_features is not None else None)
                pending.append((story_idx, seg, fut))
            # FIFO drain: yield only from the front so a later segment
            # whose image finishes early can never overtake an earlier
            # one (consumers append per-story files in yield order)
            while pending and (pending[0][2] is None or pending[0][2].done()):
                story_idx, seg, fut = pending.pop(0)
                if fut is not None:
                    seg.image = fut.result()
                yield story_idx, seg
        self.decode_s += time.perf_counter() - t0
        for story_idx, seg, fut in pending:
            if fut is not None:
                seg.image = fut.result()
            yield story_idx, seg

    def serve(self, seeds: Sequence[Tuple[Any, str]]) -> List[List[StorySegment]]:
        """Run every story to completion; returns per-story segment lists
        (ordered by segment index)."""
        stories: List[List[StorySegment]] = [[] for _ in seeds]
        for story_idx, seg in self.serve_stream(seeds):
            stories[story_idx].append(seg)
        for segs in stories:
            segs.sort(key=lambda s: s.index)
        return stories

    def stats(self) -> dict:
        return {
            "decode_s": round(self.decode_s, 3),
            "detok_replicas": len(self.pool),
            "detok_calls": list(self.pool.calls),
            "detok_busy_s": [round(b, 3) for b in self.pool.busy_s],
            "detok_failovers": self.pool.failures,
        }


def pipelined_segments(
    segments: Iterator[StorySegment], pool: DetokenizerPool
) -> Iterator[StorySegment]:
    """Asynchronous de-tokenization for a SINGLE sequential story.

    Wraps any StorySegment iterator built with ``detokenize=None`` (the
    generation pipeline's ``run`` or the sink-cache visualization
    pipeline's ``run``): each segment's features go straight to the pool
    while the iterator keeps decoding the next segment, and segments are
    yielded in order with their images filled in. The visualization path
    benefits most — decode is 2.58 s/segment but the image is 7.1 s
    (PERF.md), so 2-3 replicas make a visualized story decode-bound.
    """
    pending: List[Tuple[StorySegment, Optional[Future]]] = []
    for seg in segments:
        fut = (pool.submit(seg.image_features)
               if seg.image_features is not None else None)
        pending.append((seg, fut))
        while pending and (pending[0][1] is None or pending[0][1].done()):
            s, f = pending.pop(0)
            if f is not None:
                s.image = f.result()
            yield s
    for s, f in pending:
        if f is not None:
            s.image = f.result()
        yield s


def split_devices(n_decode: int, devices: Optional[Sequence[Any]] = None):
    """Partition the visible devices into (decode_devices, detok_devices).

    The canonical v5e-8 serving layout: ``n_decode`` chips run the MLLM
    (single-chip int8 or a small TP group), the rest each host one SDXL
    replica. With decode 2.7 s/segment (B=4 lockstep) and SDXL 6.7 s/image,
    2 decode + 6 detok chips is fully decode-bound.
    """
    import jax

    devices = list(devices if devices is not None else jax.devices())
    if not 0 < n_decode < len(devices):
        raise ValueError(
            f"need 1..{len(devices) - 1} decode devices, got {n_decode}"
        )
    return devices[:n_decode], devices[n_decode:]
