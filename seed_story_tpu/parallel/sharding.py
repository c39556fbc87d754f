"""Logical-axis -> mesh-axis rules (the whole parallelism surface).

The reference reaches DP via DeepSpeed ZeRO-1/2 and param sharding via the
Accelerate FSDP plugin (SURVEY §2.7); here both are rule tables applied to
the flax logical axis names used throughout models/:

  batch  — per-example axis of activations
  embed  — model hidden dim
  mlp    — FFN intermediate dim
  heads  — attention heads (flattened heads*head_dim)
  vocab  — token vocabulary
  layer  — stacked depth axis of scan_layers params (never sharded)
  lora   — LoRA rank dim
  kv     — resampler/latent kv dims

Presets:
  DP        — replicate params, shard batch over 'data'
  FSDP      — additionally shard the big param dims over 'data'
              (== ZeRO-3 / torch FSDP full-shard; ZeRO-1/2 state sharding
              falls out of sharding the optimizer state with the same rules)
  FSDP_TP   — FSDP over 'data' + Megatron-style TP over 'model'
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence, Tuple

import jax
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

Rules = Sequence[Tuple[str, Optional[str]]]

DP_RULES: Rules = (
    ("batch", "data"),
    ("layer", None),
    ("embed", None),
    ("embed_kv", None),
    ("mlp", None),
    ("heads", None),
    ("vocab", None),
    ("lora", None),
    ("kv", None),
)

FSDP_RULES: Rules = (
    ("batch", "data"),
    ("layer", None),
    ("embed", None),
    ("embed_kv", None),
    ("mlp", "data"),
    ("heads", "data"),
    ("vocab", "data"),
    ("lora", None),
    ("kv", None),
)

FSDP_TP_RULES: Rules = (
    ("batch", "data"),
    ("layer", None),
    ("embed", "data"),
    ("embed_kv", None),
    ("mlp", "model"),
    ("heads", "model"),
    ("vocab", "model"),
    ("lora", None),
    ("kv", None),
)

PRESETS = {"dp": DP_RULES, "fsdp": FSDP_RULES, "fsdp_tp": FSDP_TP_RULES}


def logical_to_sharding(tree, mesh: Mesh, rules: Rules):
    """Map a pytree of flax logical-axis metadata to NamedShardings.

    Dims that do not divide their assigned mesh axis fall back to
    replicated on that dim (with model dims padded to 128-multiples this
    only triggers on odd user configs, never silently on the 7B shapes).
    """
    shardings = nn.logical_to_mesh_sharding(nn.get_partition_spec(tree), mesh, rules)

    def fix(path, leaf, sharding):
        if not hasattr(leaf, "shape") or not isinstance(sharding, NamedSharding):
            return sharding
        spec = list(sharding.spec)
        spec = spec + [None] * (len(leaf.shape) - len(spec))
        changed = False
        for i, axis in enumerate(spec):
            if axis is None:
                continue
            names = (axis,) if isinstance(axis, str) else tuple(axis)
            size = 1
            for nme in names:
                size *= mesh.shape[nme]
            if leaf.shape[i] % size != 0:
                # Loud: a silently replicated 7B vocab/mlp dim is an OOM or
                # a slow run the user cannot diagnose from behavior alone.
                logger.warning(
                    "sharding fallback: %s dim %d (size %d) does not divide "
                    "mesh axis %s (size %d) — replicating that dim",
                    jax.tree_util.keystr(path), i, leaf.shape[i],
                    "*".join(names), size,
                )
                spec[i] = None
                changed = True
        if not changed:
            return sharding
        return NamedSharding(mesh, P(*spec))

    leaves = jax.tree_util.tree_map(lambda x: x, tree)
    return jax.tree_util.tree_map_with_path(fix, nn.meta.unbox(leaves), shardings)


def params_sharding(abstract_params, mesh: Mesh, rules: Rules):
    """Shardings for a params tree produced under nn.Partitioned metadata."""
    return logical_to_sharding(abstract_params, mesh, rules)


def batch_spec() -> P:
    return P("data")
