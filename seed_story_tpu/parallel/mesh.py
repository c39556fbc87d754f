"""Device mesh and named-sharding helpers.

The whole framework runs over a single 2-D logical mesh ``(data, model)``:

  * ``data``  — data parallelism; ZeRO/FSDP == sharding params/opt-state
                along this axis (the reference reaches the same effect via
                DeepSpeed ZeRO-1/2 and the Accelerate FSDP plugin,
                configs/accelerate/*, src/train/train_clm_sft.py:142-155).
  * ``model`` — tensor parallelism for the 7B LLM / SDXL UNet on small
                slices (absent in the reference; free here via pjit).

Collectives (psum/all_gather/reduce_scatter) are inserted by XLA from the
shardings and ride ICI intra-slice / DCN inter-slice.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the canonical 2-D ``(data, model)`` mesh.

    ``data=None`` uses every available device not taken by ``model``.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def shard(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis along ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Config-file surface for mesh construction."""

    data: Optional[int] = None
    model: int = 1

    def build(self, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
        return make_mesh(self.data, self.model, devices)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n_data = mesh.shape[DATA_AXIS]
    assert global_batch % n_data == 0, (global_batch, n_data)
    return global_batch // n_data
