"""LLaMA model: HF numerical parity, KV-cache decode parity, LoRA recipe.

Parity test ports identical random weights into transformers'
LlamaForCausalLM (torch CPU) — the same validation the BASELINE north-star
demands ("bit-comparable features"), without copying any reference code.
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seed_story_tpu.models.llama import (
    KVCache,
    LlamaConfig,
    LlamaForCausalLM,
    cross_entropy_loss,
    lora_trainable_mask,
)

CFG = LlamaConfig.tiny(dtype=jnp.float32)


@pytest.fixture(scope="module")
def model_and_params():
    model = LlamaForCausalLM(CFG)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    return model, params


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    ids = jnp.arange(12, dtype=jnp.int32).reshape(1, 12) + 100
    out = model.apply({"params": params}, ids)
    assert out["logits"].shape == (1, 12, CFG.vocab_padded)
    # padded vocab tail is masked to -inf-ish
    assert float(out["logits"][..., CFG.vocab_size :].max()) <= -1e8
    assert out["hidden_states"].shape == (1, 12, CFG.hidden_size)


def test_hf_parity(model_and_params):
    """Same weights -> same logits as transformers LlamaForCausalLM."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM as HFLlama

    model, params = model_and_params
    p = flax.core.unfreeze(params)
    p = jax.tree_util.tree_map(
        lambda x: x.unbox() if hasattr(x, "unbox") else x,
        p,
        is_leaf=lambda x: hasattr(x, "unbox"),
    )

    hf_cfg = HFConfig(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        num_key_value_heads=CFG.kv_heads,
        max_position_embeddings=CFG.max_position_embeddings,
        rms_norm_eps=CFG.rms_norm_eps,
        rope_theta=CFG.rope_theta,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    hf = HFLlama(hf_cfg)
    sd = hf.state_dict()

    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32))

    # JAX tables are padded to vocab_padded; HF holds the true vocab rows.
    sd["model.embed_tokens.weight"] = t(p["model"]["embed_tokens"]["embedding"][: CFG.vocab_size])
    sd["model.norm.weight"] = t(p["model"]["norm"]["weight"])
    sd["lm_head.weight"] = t(p["lm_head"]["kernel"][:, : CFG.vocab_size]).T.contiguous()
    for i in range(CFG.num_hidden_layers):
        lp = p["model"][f"layers_{i}"]
        pre = f"model.layers.{i}."
        sd[pre + "input_layernorm.weight"] = t(lp["input_layernorm"]["weight"])
        sd[pre + "post_attention_layernorm.weight"] = t(lp["post_attention_layernorm"]["weight"])
        for name in ["q_proj", "k_proj", "v_proj", "o_proj"]:
            sd[pre + f"self_attn.{name}.weight"] = t(lp["self_attn"][name]["kernel"]).T.contiguous()
        for name in ["gate_proj", "up_proj", "down_proj"]:
            sd[pre + f"mlp.{name}.weight"] = t(lp["mlp"][name]["kernel"]).T.contiguous()
    hf.load_state_dict(sd)
    hf.eval()

    ids_np = np.array([[1, 100, 2345, 31999, 5, 77, 31000, 12]], np.int64)
    with torch.no_grad():
        hf_logits = hf(torch.from_numpy(ids_np)).logits.numpy()
    out = model.apply({"params": params}, jnp.asarray(ids_np, jnp.int32))
    jax_logits = np.asarray(out["logits"], np.float32)[..., : CFG.vocab_size]
    np.testing.assert_allclose(jax_logits, hf_logits, rtol=2e-4, atol=2e-4)


def test_cache_decode_matches_full_forward(model_and_params):
    """Prefill+incremental decode == one full causal forward (the fork's
    kv_cache_head multi-token append semantics)."""
    model, params = model_and_params
    ids = jnp.array([[1, 100, 2345, 31999, 5, 77, 31000, 12, 999, 4]], jnp.int32)

    full = model.apply({"params": params}, ids)["logits"]

    cache = KVCache.create(CFG, batch=1, capacity=32, dtype=jnp.float32)
    # prefill 6 tokens, then append 3, then 1 (multi-token continuation)
    out1 = model.apply({"params": params}, ids[:, :6], cache=cache)
    out2 = model.apply({"params": params}, ids[:, 6:9], cache=out1["cache"])
    out3 = model.apply({"params": params}, ids[:, 9:], cache=out2["cache"])
    step_logits = jnp.concatenate(
        [out1["logits"], out2["logits"], out3["logits"]], axis=1
    )
    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(full), rtol=2e-4, atol=2e-4
    )
    assert int(out3["cache"].length[0]) == 10


def test_cache_small_q_ragged_rows(model_and_params):
    """The small-q (s<=8) cached path with PER-ROW seq_lengths: rows with
    fewer valid new tokens than the padded block stay causally exact."""
    model, params = model_and_params
    ids = jnp.asarray(
        np.random.RandomState(3).randint(5, 30000, (2, 10)), jnp.int32
    )
    full = model.apply({"params": params}, ids)["logits"]

    cache = KVCache.create(CFG, batch=2, capacity=32, dtype=jnp.float32)
    # row 0 prefills 4 valid tokens, row 1 prefills 6, padded block s=6
    lens0 = jnp.asarray([4, 6], jnp.int32)
    out1 = model.apply({"params": params}, ids[:, :6], cache=cache,
                       seq_lengths=lens0)
    np.testing.assert_array_equal(np.asarray(out1["cache"].length), [4, 6])
    # continue row 0 with tokens 4..9 (6 more), row 1 with 6..9 (4 more),
    # again as one padded s=6 block aligned at each row's fill level
    cont = np.zeros((2, 6), np.int32)
    cont[0] = np.asarray(ids[0, 4:10])
    cont[1, :4] = np.asarray(ids[1, 6:10])
    out2 = model.apply({"params": params}, jnp.asarray(cont),
                       cache=out1["cache"],
                       seq_lengths=jnp.asarray([6, 4], jnp.int32))
    np.testing.assert_array_equal(np.asarray(out2["cache"].length), [10, 10])

    # row 0: full-forward logits 4..9 == continuation logits 0..5
    np.testing.assert_allclose(
        np.asarray(out2["logits"][0, :6]), np.asarray(full[0, 4:10]),
        rtol=2e-4, atol=2e-4,
    )
    # row 1: full-forward logits 6..9 == continuation logits 0..3
    np.testing.assert_allclose(
        np.asarray(out2["logits"][1, :4]), np.asarray(full[1, 6:10]),
        rtol=2e-4, atol=2e-4,
    )


def test_inputs_embeds_path(model_and_params):
    """Agent scatters into embeddings then calls with inputs_embeds
    (reference models.py:36,62)."""
    model, params = model_and_params
    ids = jnp.array([[1, 5, 7, 9]], jnp.int32)
    emb = model.apply({"params": params}, ids, method=LlamaForCausalLM.embed)
    out_a = model.apply({"params": params}, inputs_embeds=emb)
    out_b = model.apply({"params": params}, ids)
    np.testing.assert_allclose(
        np.asarray(out_a["logits"]), np.asarray(out_b["logits"]), rtol=1e-5, atol=1e-5
    )


def test_remat_equivalence():
    """remat=True must not change loss or gradients."""
    ids = jnp.array([[1, 100, 2345, 31999, 5, 77]], jnp.int32)
    labels = jnp.array([[-100, 100, 2345, 31999, 5, 77]], jnp.int32)
    outs = {}
    for remat in (False, True):
        cfg = LlamaConfig.tiny(dtype=jnp.float32, remat=remat)
        model = LlamaForCausalLM(cfg)
        params = model.init(jax.random.PRNGKey(0), ids)["params"]

        def loss(p):
            logits = model.apply({"params": p}, ids)["logits"]
            return cross_entropy_loss(logits, labels)

        outs[remat] = (float(loss(params)), jax.grad(loss)(params))
    np.testing.assert_allclose(outs[False][0], outs[True][0], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(outs[False][1]),
                    jax.tree_util.tree_leaves(outs[True][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_ce_loss_ignore_index():
    logits = jnp.zeros((1, 4, 10))
    labels = jnp.array([[-100, 2, -100, 3]])
    loss = cross_entropy_loss(logits, labels)
    np.testing.assert_allclose(float(loss), np.log(10.0), rtol=1e-6)


def test_lora_zero_init_is_identity_and_mask():
    cfg = LlamaConfig.tiny(lora_rank=4, dtype=jnp.float32)
    model = LlamaForCausalLM(cfg)
    ids = jnp.array([[1, 100, 200, 300]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]

    base = LlamaForCausalLM(CFG)
    base_params = base.init(jax.random.PRNGKey(0), ids)["params"]
    # lora_b zero-init => identical function to the base model
    out_lora = model.apply({"params": params}, ids)["logits"]
    out_base = base.apply({"params": base_params}, ids)["logits"]
    np.testing.assert_allclose(
        np.asarray(out_lora), np.asarray(out_base), rtol=1e-5, atol=1e-5
    )

    mask = lora_trainable_mask(params)
    flat = flax.traverse_util.flatten_dict(jax.tree_util.tree_map(
        lambda x: x, flax.core.unfreeze(mask)))
    trainable = {"/".join(k) for k, v in flat.items() if v}
    frozen = {"/".join(k) for k, v in flat.items() if not v}
    assert any("lora_a" in k for k in trainable)
    assert any("input_layernorm" in k for k in trainable)
    assert "model/norm/weight" in trainable
    assert any("embed_tokens" in k for k in trainable)
    assert any("lm_head" in k for k in trainable)
    # base projection kernels frozen
    assert any("q_proj/kernel" in k for k in frozen)
    assert not any("q_proj/kernel" in k for k in trainable)


def test_scan_layers_matches_unrolled():
    """scan_layers=True (stacked params, lax.scan body) must reproduce the
    unrolled model's logits and gradients after stack_layer_params, and the
    stacked layout must round-trip and match a native scanned init's
    structure/shapes."""
    from seed_story_tpu.models.llama import stack_layer_params, unstack_layer_params

    ids = jnp.array([[1, 100, 2345, 31999, 5, 77, 9, 12]], jnp.int32)
    labels = jnp.where(ids > 50, ids, -100)
    kw = dict(dtype=jnp.float32, num_hidden_layers=3, lora_rank=4)
    m_u = LlamaForCausalLM(LlamaConfig.tiny(**kw))
    m_s = LlamaForCausalLM(LlamaConfig.tiny(**kw, scan_layers=True, remat=True))
    p_u = flax.linen.meta.unbox(m_u.init(jax.random.PRNGKey(0), ids)["params"])
    p_s = stack_layer_params(p_u)

    # structure + shapes identical to a natively-initialized scanned model
    p_ref = flax.linen.meta.unbox(m_s.init(jax.random.PRNGKey(1), ids)["params"])
    assert jax.tree_util.tree_structure(p_s) == jax.tree_util.tree_structure(p_ref)
    for a, b in zip(jax.tree_util.tree_leaves(p_s), jax.tree_util.tree_leaves(p_ref)):
        assert a.shape == b.shape

    def loss(m, p):
        return cross_entropy_loss(m.apply({"params": p}, ids)["logits"], labels)

    np.testing.assert_allclose(
        float(loss(m_u, p_u)), float(loss(m_s, p_s)), rtol=1e-6
    )
    g_u = stack_layer_params(jax.grad(lambda p: loss(m_u, p))(p_u))
    g_s = jax.grad(lambda p: loss(m_s, p))(p_s)
    for a, b in zip(jax.tree_util.tree_leaves(g_u), jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    # round-trip back to the decode layout
    rt = unstack_layer_params(p_s)
    assert jax.tree_util.tree_structure(rt) == jax.tree_util.tree_structure(p_u)
    for a, b in zip(jax.tree_util.tree_leaves(rt), jax.tree_util.tree_leaves(p_u)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # cache path refuses stacked params loudly
    cache = KVCache.create(m_s.cfg, 1, 16, dtype=jnp.float32)
    with pytest.raises(ValueError, match="scan_layers"):
        m_s.apply({"params": p_s}, ids, cache=cache)


def test_scan_layers_trainable_mask_paths():
    """lora_trainable_mask must select the same leaves on the stacked tree."""
    from seed_story_tpu.models.llama import stack_layer_params

    cfg = LlamaConfig.tiny(dtype=jnp.float32, num_hidden_layers=2, lora_rank=2)
    ids = jnp.zeros((1, 4), jnp.int32)
    p_u = flax.linen.meta.unbox(
        LlamaForCausalLM(cfg).init(jax.random.PRNGKey(0), ids)["params"]
    )
    mask_u = stack_layer_params(lora_trainable_mask(p_u))
    mask_s = lora_trainable_mask(stack_layer_params(p_u))
    # stack_layer_params stacks bools into (L,) arrays; collapse to scalar
    collapse = lambda t: jax.tree_util.tree_map(
        lambda x: bool(np.asarray(x).reshape(-1)[0]), t
    )
    assert collapse(mask_u) == collapse(mask_s)


def test_quantize_base_int8():
    """Weight-only int8 (quantize_base=True + quantize_llama_params): the
    converted tree matches a native quantized init's structure, logits stay
    close in distribution (KL), and the cache/decode path runs."""
    from seed_story_tpu.models.llama import quantize_llama_params

    kw = dict(dtype=jnp.float32, num_hidden_layers=2, lora_rank=4)
    m = LlamaForCausalLM(LlamaConfig.tiny(**kw))
    mq = LlamaForCausalLM(LlamaConfig.tiny(**kw, quantize_base=True))
    ids = jnp.asarray(
        np.random.RandomState(0).randint(5, 30000, (2, 12)), jnp.int32
    )
    p = flax.linen.meta.unbox(m.init(jax.random.PRNGKey(0), ids)["params"])
    pq = quantize_llama_params(p)

    pr = flax.linen.meta.unbox(mq.init(jax.random.PRNGKey(1), ids)["params"])
    assert jax.tree_util.tree_structure(pq) == jax.tree_util.tree_structure(pr)
    assert pq["model"]["layers_0"]["self_attn"]["q_proj"]["kernel"].dtype == jnp.int8
    # LoRA / norms / embeddings untouched
    assert pq["model"]["layers_0"]["self_attn"]["q_proj"]["lora_a"].dtype == jnp.float32
    assert pq["model"]["embed_tokens"]["embedding"].dtype == jnp.float32

    V = m.cfg.vocab_size
    lo = m.apply({"params": p}, ids)["logits"][..., :V]
    lq = mq.apply({"params": pq}, ids)["logits"][..., :V]
    kl = jnp.sum(
        jax.nn.softmax(lo) * (jax.nn.log_softmax(lo) - jax.nn.log_softmax(lq)),
        axis=-1,
    )
    assert float(kl.mean()) < 5e-3, float(kl.mean())

    cache = KVCache.create(mq.cfg, 2, 32, dtype=jnp.float32)
    out = mq.apply({"params": pq}, ids, cache=cache)
    assert out["logits"].shape == (2, 12, mq.cfg.vocab_padded)
    assert np.isfinite(np.asarray(out["logits"][..., :V])).all()


def test_quantize_kv_cache_decode():
    """int8 KV cache (quantize_kv): prefill+decode stays distributionally
    equal to the full no-cache forward, and the sink-cache compaction
    carries the scales."""
    cfg = LlamaConfig.tiny(dtype=jnp.float32, quantize_kv=True)
    m = LlamaForCausalLM(cfg)
    ids = jnp.asarray(
        np.random.RandomState(0).randint(5, 30000, (2, 12)), jnp.int32
    )
    p = flax.linen.meta.unbox(m.init(jax.random.PRNGKey(0), ids)["params"])
    full = m.apply({"params": p}, ids)["logits"][..., : cfg.vocab_size]

    cache = KVCache.create(cfg, 2, 32, dtype=jnp.float32)
    assert cache.quantized and cache.k[0].dtype == jnp.int8
    assert cache.k_scale[0].shape == (2, cfg.kv_heads, 32)
    out = m.apply({"params": p}, ids[:, :8], cache=cache)
    cache = out["cache"]
    chunks = [out["logits"][:, -1:, :]]
    for t in range(8, 12):
        out = m.apply({"params": p}, ids[:, t : t + 1], cache=cache)
        cache = out["cache"]
        chunks.append(out["logits"])
    dec = jnp.concatenate(chunks, axis=1)[..., : cfg.vocab_size]
    ref = full[:, 7:12]
    kl = jnp.sum(
        jax.nn.softmax(ref) * (jax.nn.log_softmax(ref) - jax.nn.log_softmax(dec)),
        axis=-1,
    )
    assert float(kl.mean()) < 1e-3, float(kl.mean())
    np.testing.assert_array_equal(
        np.asarray(ref.argmax(-1)), np.asarray(dec.argmax(-1))
    )

    # sink compaction keeps scales aligned with tokens: drop slots 2..5
    from seed_story_tpu.decode.sink_cache import _compact

    keep = jnp.asarray([0, 1] + list(range(6, 32)) + [0] * 4, jnp.int32)
    small = _compact(cache, keep, cache.length - 4)
    assert small.quantized
    np.testing.assert_array_equal(
        np.asarray(small.k[0][:, :, 2]), np.asarray(cache.k[0][:, :, 6])
    )
    np.testing.assert_array_equal(
        np.asarray(small.k_scale[0][:, :, 2]), np.asarray(cache.k_scale[0][:, :, 6])
    )
