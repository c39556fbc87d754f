"""Host-side data pipeline: jsonl shards -> shuffled, host-sharded,
decoded, statically-batched numpy batches.

Replaces the reference's torchdata chain (story_telling.py:596-613:
FileLister -> shuffle -> cycle -> shuffle -> sharding_filter -> open ->
parse_jsonl_files -> map -> filter -> batch -> collate) and the custom
error-swallowing datapipes (/root/reference/src/data/datapipes.py) with a
plain, deterministic Python iterator stack:

  * seeded shuffles (the reference's resume re-shuffles unseeded —
    SURVEY §5.4 — we fix that: the pipeline state is (seed, epoch, step))
  * per-host sharding (jax process_index/process_count ≡
    DistributedReadingService + sharding_filter)
  * worker THREADS for PIL decode (a C++ decode path can slot in later)
  * weighted multi-dataset mixing ≡ SampleMultiplexer
"""

from __future__ import annotations

import glob as _glob
import itertools
import json
import os
import queue
import random
import threading
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

from .story_telling import collate


def list_jsonl_files(data_dir, recursive: bool = True) -> List[str]:
    if isinstance(data_dir, (list, tuple)):
        out: List[str] = []
        for d in data_dir:
            out.extend(list_jsonl_files(d, recursive))
        return sorted(out)
    if os.path.isfile(data_dir):
        return [data_dir]
    pattern = "**/*.jsonl" if recursive else "*.jsonl"
    return sorted(_glob.glob(os.path.join(data_dir, pattern), recursive=recursive))


def parse_jsonl(path: str) -> Iterator[Dict[str, Any]]:
    """Yield records, swallowing bad lines (reference datapipes.py:48-62)."""
    try:
        with open(path, "r") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    yield json.loads(line)
                except json.JSONDecodeError:
                    continue
    except OSError:
        return


def iter_tar_members(
    paths: Iterable[str], mode: str = "r:*"
) -> Iterator[tuple]:
    """Stream ``(inner_pathname, bytes)`` for every file member of every tar
    shard, warn-and-skipping corrupt archives (webdataset-style shards;
    reference TarArchiveLoaderWoException, datapipes.py:15-45: a corrupt
    archive aborts THAT archive with a warning, never the pipeline)."""
    import tarfile
    import warnings

    if isinstance(paths, str):
        paths = [paths]
    for pathname in paths:
        try:
            with tarfile.open(pathname, mode=mode) as tar:
                for tarinfo in tar:
                    if not tarinfo.isfile():
                        continue
                    fobj = tar.extractfile(tarinfo)
                    if fobj is None:
                        warnings.warn(
                            f"failed to extract file {tarinfo.name} from "
                            f"source tarfile {pathname}"
                        )
                        raise tarfile.ExtractError
                    inner = os.path.normpath(os.path.join(pathname, tarinfo.name))
                    yield inner, fobj.read()
        except Exception as e:  # noqa: BLE001 — mirror reference swallow
            warnings.warn(
                f"Unable to extract files from corrupted tarfile stream "
                f"{pathname} due to: {e}, abort!"
            )


def list_tar_files(data_dir, recursive: bool = True) -> List[str]:
    """Tar-shard counterpart of list_jsonl_files."""
    if isinstance(data_dir, (list, tuple)):
        out: List[str] = []
        for d in data_dir:
            out.extend(list_tar_files(d, recursive))
        return sorted(out)
    if os.path.isfile(data_dir):
        return [data_dir]
    pattern = "**/*.tar" if recursive else "*.tar"
    return sorted(_glob.glob(os.path.join(data_dir, pattern), recursive=recursive))


def shard_for_host(
    items: Sequence, host_index: Optional[int] = None, host_count: Optional[int] = None
) -> List:
    if host_index is None or host_count is None:
        import jax

        host_index = jax.process_index()
        host_count = jax.process_count()
    return list(items)[host_index::host_count]


class JsonlStoryDataset:
    """Deterministic iterable over decoded samples.

    One "epoch" = one pass over (files x cycle_count) with seeded shuffles.
    """

    def __init__(
        self,
        data_dir,
        decode_fn: Callable[[Dict[str, Any]], Optional[Dict[str, np.ndarray]]],
        *,
        cycle_count: int = 1,
        seed: int = 0,
        host_index: Optional[int] = None,
        host_count: Optional[int] = None,
        shuffle_buffer: int = 256,
    ):
        self.files = list_jsonl_files(data_dir)
        if not self.files:
            raise FileNotFoundError(f"no .jsonl under {data_dir}")
        self.decode_fn = decode_fn
        self.cycle_count = cycle_count
        self.seed = seed
        self.host_index = host_index
        self.host_count = host_count
        self.shuffle_buffer = shuffle_buffer
        # decode draws (e.g. decode_long_story_sample's num_image_given)
        # must be a pure function of (seed, record position) too — the
        # global-random fallback made two identical runs train on DIFFERENT
        # batches and broke batch-exact resume (caught by the on-chip
        # kill/resume probe, round 4: pre-kill traces already diverged).
        try:
            import inspect

            self._decode_takes_rng = (
                "rng" in inspect.signature(decode_fn).parameters
            )
        except (TypeError, ValueError):
            self._decode_takes_rng = False
        # data-order resume: records handed to decode since construction.
        # The stream is a pure function of (seed, records_consumed), so
        # restoring is replaying the seeded shuffles and skipping decode for
        # the first N records (the reference loses data order on resume —
        # SURVEY §5.4; this is the fix).
        self._records_consumed = 0
        self._skip = 0

    def state(self) -> Dict[str, int]:
        return {"seed": self.seed, "records_consumed": self._records_consumed}

    def set_state(self, state: Dict[str, int]) -> None:
        assert int(state["seed"]) == self.seed, (state, self.seed)
        self._records_consumed = 0
        self._skip = int(state["records_consumed"])

    def _emit(self, record):
        """Count the record; decode it unless fast-forwarding."""
        self._records_consumed += 1
        if self._skip > 0:
            self._skip -= 1
            return None
        if self._decode_takes_rng:
            return self.decode_fn(
                record,
                rng=random.Random(
                    f"{self.seed}:decode:{self._records_consumed - 1}"
                ),
            )
        return self.decode_fn(record)

    def _file_stream(self, epoch: int) -> List[str]:
        rng = random.Random(f"{self.seed}:files:{epoch}")
        files = list(self.files)
        rng.shuffle(files)
        files = files * self.cycle_count
        rng.shuffle(files)
        return shard_for_host(files, self.host_index, self.host_count)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        # each __iter__ RESTARTS the stream from epoch 0, so the position
        # counter must restart with it (while preserving a pending
        # set_state fast-forward). Without this, a shape-probe batch drawn
        # from a throwaway iterator (train_clm_sft abstract init) inflates
        # the checkpointed position and resume skips one batch too far —
        # found by the on-chip kill/resume proof (round 4).
        self._records_consumed = 0
        for epoch in itertools.count():
            rng = random.Random(f"{self.seed}:sample:{epoch}")
            buf: List[Dict[str, Any]] = []
            for path in self._file_stream(epoch):
                for record in parse_jsonl(path):
                    buf.append(record)
                    if len(buf) >= self.shuffle_buffer:
                        idx = rng.randrange(len(buf))
                        buf[idx], buf[-1] = buf[-1], buf[idx]
                        sample = self._emit(buf.pop())
                        if sample is not None:
                            yield sample
            rng.shuffle(buf)
            for record in buf:
                sample = self._emit(record)
                if sample is not None:
                    yield sample


def sample_multiplexer(
    pipes: Sequence[Iterable], weights: Optional[Sequence[float]] = None, seed: int = 0
) -> Iterator:
    """Weighted random interleave (≡ torchdata SampleMultiplexer,
    reference story_telling.py:616-634)."""
    iters = [iter(p) for p in pipes]
    if weights is None:
        weights = [1.0] * len(iters)
    weights = list(weights)
    rng = random.Random(seed)
    while iters:
        i = rng.choices(range(len(iters)), weights=weights, k=1)[0]
        try:
            yield next(iters[i])
        except StopIteration:
            del iters[i], weights[i]


def batched(samples: Iterable, batch_size: int) -> Iterator[Dict[str, np.ndarray]]:
    it = iter(samples)
    while True:
        batch = list(itertools.islice(it, batch_size))
        if len(batch) < batch_size:
            return  # drop ragged tail: static shapes only
        yield collate(batch)


class ThreadedLoader:
    """Background-thread pipeline with a bounded prefetch queue.

    Plays the role of torchdata's MultiProcessingReadingService +
    the CUDA-stream PrefetchLoader (reference dataloader_utils.py:47-113):
    decode happens off the trainer thread; `device_put_fn` (optional)
    moves batches to device ahead of use for transfer/compute overlap.
    """

    _SENTINEL = object()

    def __init__(
        self,
        batch_iter_factory: Callable[[], Iterator],
        prefetch: int = 2,
        device_put_fn: Optional[Callable] = None,
        state_fn: Optional[Callable[[], Dict]] = None,
    ):
        self.factory = batch_iter_factory
        self.prefetch = prefetch
        self.device_put_fn = device_put_fn
        # data-order resume: ``state_fn()`` is snapshotted in the worker
        # right after each batch is produced and travels WITH the batch
        # through the prefetch queue, so ``current_state`` always describes
        # exactly the batches the consumer has seen — not the (prefetched)
        # producer position.
        self.state_fn = state_fn
        self.current_state: Optional[Dict] = None
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for batch in self.factory():
                if self._stop.is_set():
                    return
                snap = self.state_fn() if self.state_fn is not None else None
                if self.device_put_fn is not None:
                    batch = self.device_put_fn(batch)
                self._q.put((batch, snap))
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._SENTINEL:
                return
            batch, snap = item
            self.current_state = snap
            yield batch

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
