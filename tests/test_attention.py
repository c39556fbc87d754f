"""Pallas flash-attention kernel vs XLA reference, all mask modes.

Covers the three attention behaviors the reference gets from native
kernels (SURVEY §2.7): training causal (xformers LowerTriangularMask),
decode bottom-right causal (LowerTriangularFromBottomRightMask,
modeling_llama_xformer.py:281-295), and full attention (ViT/SDPA).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seed_story_tpu.ops.attention import mha, mha_reference


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=dtype)


def _naive(q, k, v, causal, q_start=None, kv_len=None):
    """Dense per-element reference independent of mha_reference."""
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    group = hq // hkv
    out = np.zeros((b, hq, sq, d), np.float32)
    q_start = np.broadcast_to(
        np.asarray(skv - sq if q_start is None else q_start), (b,)
    )
    kv_len = np.broadcast_to(np.asarray(skv if kv_len is None else kv_len), (b,))
    scale = 1.0 / np.sqrt(d)
    for bi in range(b):
        for h in range(hq):
            for i in range(sq):
                logits = []
                idx = []
                for j in range(skv):
                    if j >= kv_len[bi]:
                        continue
                    if causal and j > q_start[bi] + i:
                        continue
                    logits.append(
                        scale * np.dot(np.asarray(q[bi, h, i]), np.asarray(k[bi, h // group, j]))
                    )
                    idx.append(j)
                w = np.exp(logits - np.max(logits))
                w /= w.sum()
                for wj, j in zip(w, idx):
                    out[bi, h, i] += wj * np.asarray(v[bi, h // group, j], np.float32)
    return out


@pytest.mark.parametrize("causal", [True, False])
def test_reference_matches_naive(causal):
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    q = _rand((2, 4, 5, 8), k1)
    k = _rand((2, 2, 7, 8), k2)
    v = _rand((2, 2, 7, 8), k3)
    kv_len = jnp.array([7, 4])
    got = mha_reference(q, k, v, causal=causal, kv_len=kv_len)
    want = _naive(q, k, v, causal, kv_len=np.array([7, 4]))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_bottom_right_alignment():
    """q_len < kv_len: new queries align bottom-right (decode semantics)."""
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    q = _rand((1, 2, 3, 8), k1)
    k = _rand((1, 2, 10, 8), k2)
    v = _rand((1, 2, 10, 8), k3)
    got = mha_reference(q, k, v, causal=True)  # default q_start = 10-3 = 7
    want = _naive(q, k, v, True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "causal,sq,skv,hq,hkv,d",
    [
        (True, 256, 256, 4, 4, 64),
        (True, 64, 320, 4, 2, 128),
        (False, 96, 256, 2, 2, 104),  # ViT head dim 1664/16=104 (non-128)
        (True, 1, 384, 8, 8, 128),  # single-token decode
    ],
)
def test_pallas_matches_reference(causal, sq, skv, hq, hkv, d):
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    b = 2
    q = _rand((b, hq, sq, d), k1)
    k = _rand((b, hkv, skv, d), k2)
    v = _rand((b, hkv, skv, d), k3)
    kv_len = jnp.array([skv, skv - 37])
    q_start = kv_len - sq
    got = mha(
        q, k, v, causal=causal, q_start=q_start, kv_len=kv_len,
        implementation="pallas_interpret",
    )
    want = mha_reference(q, k, v, causal=causal, q_start=q_start, kv_len=kv_len)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_grad_flows_through_custom_vjp():
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    q = _rand((1, 2, 128, 64), k1)
    k = _rand((1, 2, 128, 64), k2)
    v = _rand((1, 2, 128, 64), k3)

    def loss_pallas(q, k, v):
        return jnp.sum(mha(q, k, v, causal=True, implementation="pallas_interpret") ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_grad_gqa_and_kv_len():
    """Pallas backward vs XLA-autodiff reference: GQA + per-row kv_len +
    non-aligned shapes (padding paths in all three bwd outputs)."""
    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    q = _rand((2, 4, 96, 64), k1)
    k = _rand((2, 2, 160, 64), k2)
    v = _rand((2, 2, 160, 64), k3)
    kv_len = jnp.array([160, 117])
    q_start = kv_len - 96

    def loss_pallas(q, k, v):
        out = mha(q, k, v, causal=True, q_start=q_start, kv_len=kv_len,
                  implementation="pallas_interpret")
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(q, k, v):
        out = mha_reference(q, k, v, causal=True, q_start=q_start, kv_len=kv_len)
        return jnp.sum(out * jnp.cos(out))

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_bf16_dtypes():
    key = jax.random.PRNGKey(4)
    k1, k2, k3 = jax.random.split(key, 3)
    q = _rand((1, 4, 128, 128), k1, jnp.bfloat16)
    k = _rand((1, 4, 128, 128), k2, jnp.bfloat16)
    v = _rand((1, 4, 128, 128), k3, jnp.bfloat16)
    got = mha(q, k, v, causal=True, implementation="pallas_interpret")
    assert got.dtype == jnp.bfloat16
    want = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=5e-2, atol=5e-2
    )


def test_decode_attention_matches_reference():
    """decode_attention (the s==1 hot path: no fp32 cache copy, GQA via
    query-group folding) == mha_reference on the same masks."""
    from seed_story_tpu.ops.attention import decode_attention, mha_reference

    rng = np.random.RandomState(0)
    for hq, hkv in ((8, 8), (8, 2)):
        b, c, d = 3, 96, 64
        q = jnp.asarray(rng.randn(b, hq, 1, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, hkv, c, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, hkv, c, d), jnp.float32)
        kv_len = jnp.asarray([1, 17, 96], jnp.int32)
        got = decode_attention(q, k, v, kv_len=kv_len)
        want = mha_reference(
            q, k, v, causal=True, q_start=kv_len - 1, kv_len=kv_len
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


def test_decode_attention_multi_query():
    """The small-q path (speculative-verify blocks): bottom-right masked
    S>1 queries against a long cache == mha_reference, incl. GQA and
    per-row q_start below kv_len - S (rows with fewer valid new tokens)."""
    from seed_story_tpu.ops.attention import decode_attention, mha_reference

    rng = np.random.RandomState(1)
    for hq, hkv in ((8, 8), (8, 2)):
        b, c, d, s = 3, 96, 64, 5
        q = jnp.asarray(rng.randn(b, hq, s, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, hkv, c, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, hkv, c, d), jnp.float32)
        q_start = jnp.asarray([0, 20, 91], jnp.int32)
        kv_len = q_start + s
        got = decode_attention(q, k, v, kv_len=kv_len, q_start=q_start)
        want = mha_reference(
            q, k, v, causal=True, q_start=q_start, kv_len=kv_len
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )
