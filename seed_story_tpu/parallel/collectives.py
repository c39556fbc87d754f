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


def initialize_multihost():
    """jax.distributed.initialize when running multi-process (multi-host
    TPU slices); no-op in single-process settings."""
    import os

    if os.environ.get("COORDINATOR_ADDRESS") or os.environ.get("JAX_COORDINATOR"):
        jax.distributed.initialize()
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
