"""Metrics / logging / observability.

Replaces the reference's Accelerator(log_with=['tensorboard','wandb']) +
get_metric all-gather (train_clm_sft.py:99-108,158-167,332-338):

  * scalars come out of the pjit step already reduced (XLA inserts the
    cross-device mean), so "get_metric" is just a host read
  * TensorboardWriter: tensorboardX if available, else a JSONL event log
    (observability without extra deps); wandb hook kept optional/offline
  * jax.profiler trace capture as a first-class flag (the reference has
    no tracing at all — SURVEY §5.1)
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

log = logging.getLogger("seed_story_tpu")


def setup_logging(level=logging.INFO):
    # force=True: absl (pulled in by orbax) installs a root handler at
    # import, which would make basicConfig a silent no-op and swallow the
    # runner's INFO progress lines (step/loss/checkpoint)
    logging.basicConfig(
        level=level,
        format="[%(asctime)s] [%(levelname)s] [%(name)s] %(message)s",
        datefmt="%m/%d/%Y %H:%M:%S",
        force=True,
    )
    return log


class MetricsWriter:
    """Tensorboard if tensorboardX importable, else JSONL; plus optional
    offline-wandb mirroring (reference forces WANDB_MODE=offline, :39)."""

    def __init__(self, logdir: str, use_wandb: bool = False, config: Optional[Dict] = None):
        os.makedirs(logdir, exist_ok=True)
        self._tb = None
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(logdir)
        except ImportError:
            self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore

                os.environ.setdefault("WANDB_MODE", "offline")
                self._wandb = wandb.init(dir=logdir, config=config or {})
            except ImportError:
                pass
        if config is not None:
            with open(os.path.join(logdir, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)

    def log(self, metrics: Dict[str, float], step: int):
        metrics = {k: float(v) for k, v in metrics.items()}
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, step)
        else:
            self._jsonl.write(json.dumps({"step": step, **metrics}) + "\n")
            self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        if self._tb is not None:
            self._tb.close()
        elif hasattr(self, "_jsonl"):
            self._jsonl.close()


class Profiler:
    """jax.profiler trace capture flag — `--profile_steps 10:15` style."""

    def __init__(self, logdir: str, start_step: int = -1, stop_step: int = -1):
        self.logdir = logdir
        self.start_step = start_step
        self.stop_step = stop_step
        self._active = False

    def maybe_step(self, step: int):
        if step == self.start_step and not self._active:
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif step == self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class Throughput:
    """Steps/sec + tokens/sec EMA for the progress line."""

    def __init__(self, tokens_per_step: int = 0):
        self.tokens_per_step = tokens_per_step
        self._last = time.perf_counter()
        self._ema = None

    def tick(self) -> Dict[str, float]:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        sps = 1.0 / max(dt, 1e-9)
        self._ema = sps if self._ema is None else 0.9 * self._ema + 0.1 * sps
        out = {"steps_per_sec": self._ema}
        if self.tokens_per_step:
            out["tokens_per_sec"] = self._ema * self.tokens_per_step
        return out
