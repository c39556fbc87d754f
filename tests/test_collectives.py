"""Distributed primitives on the 8-device mesh: gathered contrastive loss
== single-device loss on the full batch (the reference's cross-device
negative pool, discrete_models.py:18-52)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from seed_story_tpu.models.discrete import contrastive_loss
from seed_story_tpu.parallel.collectives import all_gather, concat_all_gather
from seed_story_tpu.parallel.mesh import make_mesh


def test_concat_all_gather_shape():
    mesh = make_mesh(data=8, model=1)
    x = jnp.arange(16.0).reshape(16, 1)

    def f(x):
        return concat_all_gather(x, "data")

    out = shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P("data"))(x)
    # each shard gathers the full 16 rows -> tiled output is 8x16 rows
    assert out.shape == (128, 1)


def test_contrastive_loss_cross_device_matches_global():
    mesh = make_mesh(data=8, model=1)
    rng = np.random.RandomState(0)
    b, d = 16, 32
    img = jnp.asarray(rng.randn(b, d).astype(np.float32))
    txt = jnp.asarray(rng.randn(b, d).astype(np.float32))
    scale = jnp.float32(10.0)

    global_loss = float(contrastive_loss(img, txt, scale))

    def f(img, txt):
        loss = contrastive_loss(img, txt, scale, axis_name="data")
        return jax.lax.pmean(loss, "data")[None]

    sharded = shard_map(
        f, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data")
    )(img, txt)
    np.testing.assert_allclose(float(sharded[0]), global_loss, rtol=1e-5)
