"""Checkpoint / resume via Orbax (async, sharded pytrees).

Replaces the reference's accelerate.save_state / load_state + offline
zero_to_fp32 consolidation (SURVEY §5.4, train_clm_sft.py:256-272,328-330):

  * save: full TrainState (params, opt_state, step) + data-order state
    (seed/epoch/step) — the reference does NOT checkpoint the datapipe and
    re-shuffles on resume; we fix that by recording the pipeline position
  * partial load: ``load_params_partial`` merges whatever subset of params
    exists in the checkpoint into a freshly-initialized tree and reports
    missing/unexpected keys — the from_pretrained(strict=False) semantics
    every reference model class has (e.g. models.py:223-230)
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import traverse_util

from .trainer import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: TrainState, data_state: Optional[Dict] = None):
        args = {
            "params": ocp.args.StandardSave(state.params),
            "opt_state": ocp.args.StandardSave(state.opt_state),
            "step": ocp.args.ArraySave(np.asarray(state.step)),
        }
        if data_state is not None:
            args["data_state"] = ocp.args.JsonSave(data_state)
        self._mgr.save(step, args=ocp.args.Composite(**args))

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None
                ) -> Tuple[TrainState, Optional[Dict]]:
        step = step if step is not None else self.latest_step()
        if step is None:
            return state, None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(state.params),
                opt_state=ocp.args.StandardRestore(state.opt_state),
                step=ocp.args.ArrayRestore(np.asarray(state.step)),
            ),
        )
        data_state = None
        data_path = os.path.join(self.directory, str(step), "data_state")
        if os.path.isdir(data_path):
            try:
                restored_d = self._mgr.restore(
                    step, args=ocp.args.Composite(data_state=ocp.args.JsonRestore())
                )
                data_state = restored_d["data_state"]
            except Exception:
                data_state = None
        import jax.numpy as jnp

        new_state = TrainState(
            restored["params"], restored["opt_state"],
            jnp.asarray(restored["step"]),
        )
        return new_state, data_state

    def close(self):
        self._mgr.close()


def save_params(path: str, params) -> None:
    """Standalone params checkpoint (the cross-stage handoff artifact —
    the reference's consolidated pytorch_model.bin, SURVEY §5.4)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()


def load_params_partial(path: str, target_params, verbose: bool = True):
    """strict=False partial load: checkpoint leaves overwrite matching
    target leaves; reports missing/unexpected like the reference loaders."""
    ckptr = ocp.PyTreeCheckpointer()
    loaded = ckptr.restore(os.path.abspath(path))

    flat_target = traverse_util.flatten_dict(target_params, sep="/")
    flat_loaded = traverse_util.flatten_dict(loaded, sep="/")

    missing = [k for k in flat_target if k not in flat_loaded]
    unexpected = [k for k in flat_loaded if k not in flat_target]
    merged = dict(flat_target)
    for k, v in flat_loaded.items():
        if k in flat_target:
            tgt = flat_target[k]
            if hasattr(tgt, "shape") and tuple(tgt.shape) != tuple(np.shape(v)):
                missing.append(k)  # shape mismatch treated as missing
                continue
            merged[k] = jax.numpy.asarray(v, dtype=getattr(tgt, "dtype", None))
    if verbose:
        print(f"partial load from {path}: missing keys: {len(missing)}, "
              f"unexpected keys: {len(unexpected)}")
    return traverse_util.unflatten_dict(merged, sep="/")
