"""Shared training-loop runner for the three stage entry points.

The reference triplicates this loop across train.py / train_clm_sft.py /
train_sdxl_img2img_llm.py (SURVEY §2.5); here each stage supplies a
loss_fn + init params and the runner owns: mesh + sharding, optimizer,
device prefetch, metrics, profiler, checkpoint/resume with data-order
restore, and the progress line.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import make_mesh
from .checkpoint import CheckpointManager
from .metrics import MetricsWriter, Profiler, Throughput, log, setup_logging
from .trainer import TrainConfig, Trainer, TrainState


@dataclasses.dataclass
class RunnerArgs:
    output_dir: str = "output"
    max_steps: int = 6000
    save_steps: int = 1000
    log_steps: int = 10
    resume_from_checkpoint: Optional[str] = None
    seed: int = 42
    profile_start: int = -1
    profile_stop: int = -1
    mesh_data: Optional[int] = None
    mesh_model: int = 1
    use_wandb: bool = False


def run_training(
    args: RunnerArgs,
    train_cfg: TrainConfig,
    abstract_params,
    init_params_fn: Callable[[], Any],
    loss_fn: Callable,
    batch_iterator: Iterator[Dict[str, np.ndarray]],
    trainable_mask=None,
    batch_transform: Optional[Callable] = None,
    host_metrics_fn: Optional[Callable] = None,
    config_record: Optional[Dict] = None,
    data_source=None,
    loss_consts=None,
):
    """``data_source``: optional object with ``state() -> dict`` /
    ``set_state(dict)`` (e.g. JsonlStoryDataset). When given, the pipeline
    position is checkpointed with the train state and restored on resume, so
    post-resume batches are exactly the ones an uninterrupted run would have
    seen (the reference re-shuffles unseeded on resume — SURVEY §5.4)."""
    setup_logging()
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    mesh = make_mesh(data=args.mesh_data, model=args.mesh_model)
    log.info("mesh: %s; devices: %d", dict(mesh.shape), len(jax.devices()))

    trainer = Trainer(mesh, abstract_params, loss_fn, train_cfg,
                  trainable_mask, loss_consts=loss_consts)
    writer = MetricsWriter(args.output_dir, use_wandb=args.use_wandb,
                           config=config_record)
    profiler = Profiler(args.output_dir, args.profile_start, args.profile_stop)
    ckpt = CheckpointManager(args.output_dir)

    with mesh:
        state = trainer.init_state(init_params_fn())
        start_step = 0
        if args.resume_from_checkpoint:
            restore_dir = args.resume_from_checkpoint
            mgr = ckpt if restore_dir == args.output_dir else CheckpointManager(restore_dir)
            state, data_state = mgr.restore(state)
            start_step = int(state.step)
            if data_state is not None and data_source is not None:
                data_source.set_state(data_state)
                log.info("restored data order: %s", data_state)
            log.info("resumed from step %d", start_step)

        # per-step rng = fold_in(seed, step): resume-stable — a resumed run
        # replays EXACTLY the rng stream an uninterrupted run would have
        # used (a sequential split from a fresh key would restart the
        # stream at the resume boundary and break loss-trace continuity
        # for rng-consuming losses like stage 3's noise/timesteps)
        rng = jax.random.PRNGKey(args.seed)
        throughput = Throughput()
        t_start = time.time()
        step = start_step

        if train_cfg.grad_accum_steps > 1:
            # stack N consecutive microbatches -> leaves (accum, micro, ...)
            def stacked(it, n):
                import itertools as _it

                while True:
                    group = list(_it.islice(it, n))
                    if len(group) < n:
                        return
                    yield {
                        k: np.stack([g[k] for g in group]) for k in group[0]
                    }

            batch_iterator = stacked(iter(batch_iterator), train_cfg.grad_accum_steps)

        # double-buffered host->device prefetch (the reference's CUDA-stream
        # PrefetchLoader, dataloader_utils.py:47-113, the JAX way)
        from ..data.datapipes import ThreadedLoader

        loader = ThreadedLoader(
            lambda it=batch_iterator: iter(it),
            prefetch=2,
            device_put_fn=trainer.shard_batch,  # multi-process aware
            state_fn=data_source.state if data_source is not None else None,
        )

        for batch in loader:
            if step >= args.max_steps:
                break
            if batch_transform is not None:
                batch = batch_transform(batch)
            if os.environ.get("SS_DEBUG_BATCH_HASH"):
                import hashlib

                ids = np.asarray(batch["input_ids"]) if "input_ids" in batch \
                    else np.concatenate([np.ravel(np.asarray(v)) for v in
                                         jax.tree_util.tree_leaves(batch)[:1]])
                h = hashlib.md5(np.ascontiguousarray(ids)).hexdigest()[:10]
                log.info("batch hash @ next step %d: %s", step + 1, h)
            step_rng = jax.random.fold_in(rng, step)
            state, metrics = trainer.step(state, batch, step_rng)
            step += 1

            profiler.maybe_step(step)
            if step % args.log_steps == 0 or step == 1:
                host = {k: float(v) for k, v in metrics.items()}
                host.update(throughput.tick())
                if host_metrics_fn is not None:
                    host.update(host_metrics_fn(batch, metrics))
                writer.log(host, step)
                log.info(
                    "step %d/%d  loss %.4f  %s", step, args.max_steps,
                    host.get("loss", float("nan")),
                    "  ".join(f"{k} {v:.4g}" for k, v in host.items()
                              if k not in ("loss",)),
                )
            if step % args.save_steps == 0:
                ckpt.save(step, state, data_state=loader.current_state)
                # async Orbax: the save is QUEUED here and finalized by a
                # background thread (the <step>.orbax-checkpoint-tmp dir
                # renames to <step> when durable — minutes at GB scale on a
                # slow host). Only the renamed dir survives a kill.
                log.info("queued checkpoint @ step %d (async)", step)

        loader.close()
        ckpt.save(step, state, data_state=loader.current_state)
        ckpt.wait()
        writer.close()
        profiler.close()
        log.info("done: %d steps in %.1fs", step - start_step, time.time() - t_start)
    return state
