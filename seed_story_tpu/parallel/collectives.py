"""Distributed primitives — the dist_utils surface.

Counterparts of /root/reference/src/train/dist_utils.py:5-34 and the
metric gathering in train_clm_sft.py:99-108, expressed the JAX way:

  * inside shard_map/pmap code: ``all_gather`` / ``concat_all_gather``
    (gradient-stopped, like the reference's no-grad gather)
  * on the host across processes: ``process_allgather`` / ``mean_metrics``
    via jax.experimental.multihost_utils
  * both degrade to identity in single-process / no-axis settings, like
    the reference's ``not dist.is_initialized()`` fallback.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def all_gather(x: jax.Array, axis_name: Optional[str] = None) -> jax.Array:
    """Gather along a mapped axis; identity when axis_name is None
    (reference all_gather, dist_utils.py:5-18)."""
    if axis_name is None:
        return x
    return jax.lax.all_gather(x, axis_name, tiled=True)


def concat_all_gather(x: jax.Array, axis_name: Optional[str] = None) -> jax.Array:
    """No-gradient gather (reference concat_all_gather, dist_utils.py:21-34:
    torch.distributed.all_gather has no autograd)."""
    return jax.lax.stop_gradient(all_gather(x, axis_name))


def pmean(x: jax.Array, axis_name: Optional[str] = None) -> jax.Array:
    if axis_name is None:
        return x
    return jax.lax.pmean(x, axis_name)


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """jax.distributed.initialize for multi-process runs (multi-host TPU
    slices, or multi-process CPU in tests). Arguments fall back to the
    launcher contract env vars COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID; on TPU pods where JAX autodetects the cluster, leaving all
    three unset and exporting only COORDINATOR_ADDRESS=auto also works.
    No-op when single-process or already initialized (safe to call from
    every entry point). Validated by tests/test_multiprocess.py."""
    import os

    addr = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if addr:
        if num_processes is None and os.environ.get("NUM_PROCESSES"):
            num_processes = int(os.environ["NUM_PROCESSES"])
        if process_id is None and os.environ.get("PROCESS_ID"):
            process_id = int(os.environ["PROCESS_ID"])
        # Only the double-init case is benign (every entry point calls this).
        # A genuine failure (unreachable coordinator, bad NUM_PROCESSES /
        # PROCESS_ID) must fail fast: silently degrading to single-process
        # mode would desync a real multi-host launch instead of aborting it.
        try:
            from jax._src.distributed import global_state as _dist_state

            already = getattr(_dist_state, "client", None) is not None
        except Exception:  # private-internals probe may move across jax versions
            already = None
        if not already:
            try:
                if addr == "auto":
                    jax.distributed.initialize()  # TPU-pod autodetection
                else:
                    jax.distributed.initialize(
                        addr, num_processes=num_processes, process_id=process_id
                    )
            except RuntimeError as e:
                # Only when the internal probe was unavailable do we fall
                # back to message matching for the benign double-init case;
                # anything else (unreachable coordinator, bad ids) re-raises.
                if already is None and "already" in str(e).lower():
                    pass
                else:
                    raise
    return jax.process_index(), jax.process_count()


def process_allgather(x):
    """Host-level gather across processes (metrics, eval shards)."""
    if jax.process_count() == 1:
        return jnp.asarray(x)[None]
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(jnp.asarray(x))


def mean_metrics(metrics: Dict[str, float]) -> Dict[str, float]:
    """Cross-process mean of scalar metrics (== the reference's
    get_metric all-gathered means, train_clm_sft.py:99-108)."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    out = {}
    for k, v in metrics.items():
        out[k] = float(jnp.mean(process_allgather(jnp.float32(v))))
    return out
