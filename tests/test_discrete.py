"""Stage-1 discrete tokenizer family: VQ mechanics + trainable variants
(reference /root/reference/src/models/discrete_models.py:55-424; the
contrastive cross-device loss is covered in test_collectives.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from seed_story_tpu.models.discrete import (
    DiscreteConfig,
    DiscreteModelDistill,
    DiscreteModelDistillWithDoubleContrastive,
    DiscreteModelIdentity,
    VectorQuantizer,
    code_usage,
)


def _vq(codebook_size=16, dim=8):
    vq = VectorQuantizer(codebook_size, dim)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, dim))
    params = vq.init(jax.random.PRNGKey(1), x)["params"]
    return vq, params, x


def test_vq_assigns_nearest_code():
    vq, params, x = _vq()
    quant, idx, commit, codebook_loss = vq.apply({"params": params}, x)
    cb = np.asarray(params["codebook"])
    d = ((np.asarray(x)[..., None, :] - cb[None, None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(-1))
    # straight-through forward value IS the chosen codebook entry
    # (x + sg(quant - x) re-associates the float math: atol for rounding)
    np.testing.assert_allclose(
        np.asarray(quant), cb[np.asarray(idx)], atol=1e-6
    )
    assert float(commit) > 0 and float(codebook_loss) > 0
    assert idx.shape == (2, 5) and (np.asarray(idx) < 16).all()


def test_vq_straight_through_gradient():
    """d(loss)/dx flows through the quantization as identity (plus the
    commitment term); the codebook gets its gradient from codebook_loss."""
    vq, params, x = _vq()

    def loss(p, x):
        quant, _, commit, codebook_loss = vq.apply({"params": p}, x)
        return jnp.sum(quant * 1.5) + 0.25 * commit + codebook_loss

    gx = jax.grad(loss, argnums=1)(params, x)
    # straight-through: the 1.5-sum term contributes exactly 1.5 per element
    # (commit adds a data-dependent term on top, so check the dominant part)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.abs(np.asarray(gx)).max() > 1.0
    gp = jax.grad(loss)(params, x)
    assert float(np.abs(np.asarray(gp["codebook"])).sum()) > 0


def test_code_usage_counts_unique():
    assert code_usage(jnp.asarray([[1, 1, 2], [7, 2, 1]])) == 3


def test_identity_model_passthrough():
    m = DiscreteModelIdentity()
    x = jnp.arange(12.0).reshape(1, 3, 4)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out["recon"]), np.asarray(x))


def test_distill_vq_training_reduces_loss():
    """A few AdamW steps on DiscreteModelDistill(use_vq=True) reduce the
    total loss on fixed features — the stage-1 trainable path end to end."""
    dm = DiscreteModelDistill(DiscreteConfig(dim=16, codebook_size=32), use_vq=True)
    feats = jax.random.normal(jax.random.PRNGKey(2), (4, 6, 16))
    params = dm.init(jax.random.PRNGKey(3), feats)["params"]
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = dm.apply({"params": p}, feats)
            return out["total_loss"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, out

    params, opt_state, first, out0 = step(params, opt_state)
    assert out0["codes"].shape == (4, 6)
    assert code_usage(out0["codes"]) >= 1
    for _ in range(30):
        params, opt_state, loss, _ = step(params, opt_state)
    assert float(loss) < float(first)


def test_double_contrastive_variant_runs():
    dm = DiscreteModelDistillWithDoubleContrastive(
        DiscreteConfig(dim=16, codebook_size=32))
    img = jax.random.normal(jax.random.PRNGKey(4), (4, 6, 16))
    txt = jax.random.normal(jax.random.PRNGKey(5), (4, 3, 16))  # (B, T, D)
    params = dm.init(jax.random.PRNGKey(6), img, txt)["params"]
    out = dm.apply({"params": params}, img, txt)
    assert np.isfinite(float(out["total_loss"]))
