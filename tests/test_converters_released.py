"""Converter coverage for the RELEASED checkpoint layouts.

The golden parity tests (test_reference_parity.py) feed the converters
state dicts of bare reference modules; the released artifacts differ:

  * the stage-2 agent bin (README.md:120-128 ``pytorch_model.bin`` from
    zero_to_fp32) stores the agent with a PEFT-wrapped llm —
    ``llm.base_model.model.*`` prefixes, ``lora_A/B.default.weight``,
    ``modules_to_save.default`` trained copies NEXT TO the frozen
    ``original_module`` duplicates;
  * legacy stage-1 checkpoints use the BLIP2-style layout remapped by
    ``from_pretrained_stage1_yuying`` (discrete_models.py:427-454);
  * legacy IP-Adapter bins split into ``image_proj_model.*`` +
    ``adapter_modules.*`` (adapter_modules.py:116-137);
  * a released tokenizer may have saved the 66 added tokens in a
    different id order than the canonical 32000+ layout.

Each test feeds a synthetic state dict in the released layout through the
converters and requires empty missing/unexpected plus structural (and
where cheap, numerical) agreement with our flax modules.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
peft = pytest.importorskip("peft")

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_path():
    sys.path.insert(0, REF)
    # qwen_visual imports torchvision for its transform only
    if "torchvision" not in sys.modules:
        import importlib.machinery as _m

        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        for name in ("Compose", "Resize", "ToTensor", "Normalize"):
            setattr(tr, name, lambda *a, **k: (lambda x: x))
        tr.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
        tv.transforms = tr
        tv.__spec__ = _m.ModuleSpec("torchvision", loader=None)
        tr.__spec__ = _m.ModuleSpec("torchvision.transforms", loader=None)
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
    yield
    sys.path.remove(REF)


def _paths(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_paths(v, p))
        else:
            out[p] = tuple(getattr(v, "shape", None) or np.asarray(v).shape)
    return out


# ---------------------------------------------------------------------
# agent pytorch_model.bin (PEFT-wrapped llm)
# ---------------------------------------------------------------------


def test_agent_peft_bin_layout(ref_path):
    from src.models.qwen_visual import Resampler as RefResampler
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM as HFLlama

    from seed_story_tpu.models.agent import AgentConfig, ContinuousLVLM
    from seed_story_tpu.tools.convert_torch_weights import convert_agent

    torch.manual_seed(0)
    acfg = AgentConfig.tiny()
    acfg = AgentConfig(
        llm=type(acfg.llm).tiny(dtype=jnp.float32, lora_rank=4, lora_alpha=32),
        input_resampler_grid=acfg.input_resampler_grid,
        output_resampler_grid=acfg.output_resampler_grid,
        num_img_out_tokens=acfg.num_img_out_tokens,
        resampler_heads=acfg.resampler_heads,
        vit_dim=acfg.vit_dim,
    )
    C = acfg.llm
    hf = HFLlama(HFConfig(
        vocab_size=C.vocab_size, hidden_size=C.hidden_size,
        intermediate_size=C.intermediate_size,
        num_hidden_layers=C.num_hidden_layers,
        num_attention_heads=C.num_attention_heads,
        num_key_value_heads=C.kv_heads, rms_norm_eps=C.rms_norm_eps,
        rope_theta=C.rope_theta, attn_implementation="eager",
        tie_word_embeddings=False,
    )).eval()
    # the reference wrap: LoRA r on the 7 projections, layernorms in
    # modules_to_save (configs/clm_models/llama2chat7b_lora.yaml)
    lcfg = peft.LoraConfig(
        r=4, lora_alpha=32,
        target_modules=["q_proj", "v_proj", "k_proj", "o_proj",
                        "gate_proj", "down_proj", "up_proj"],
        modules_to_save=["input_layernorm", "post_attention_layernorm",
                         "norm"],
        task_type="CAUSAL_LM", lora_dropout=0.05,
    )
    pm = peft.get_peft_model(hf, lcfg)

    in_res = RefResampler(grid_size=acfg.input_resampler_grid,
                          embed_dim=C.hidden_size,
                          num_heads=acfg.resampler_heads).eval()
    out_res = RefResampler(grid_size=acfg.output_resampler_grid,
                           embed_dim=acfg.vit_dim,
                           num_heads=acfg.resampler_heads).eval()

    sd = {}
    for k, v in pm.state_dict().items():
        sd[f"llm.{k}"] = v.detach().numpy()
    for name, mod in (("input_resampler", in_res), ("output_resampler", out_res)):
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v.detach().numpy()

    # the released layout really does carry the PEFT markers
    assert any(".lora_A.default.weight" in k for k in sd)
    assert any(".modules_to_save.default.weight" in k for k in sd)
    assert any(".original_module.weight" in k for k in sd)
    assert any(k.startswith("llm.base_model.model.") for k in sd)

    params, missing, unexpected = convert_agent(
        sd, num_layers=C.num_hidden_layers)
    assert not missing and not unexpected, (missing, unexpected)

    # structure == our flax agent at the same dims (lora r=4)
    ours = ContinuousLVLM(acfg)
    S = 24
    abstract = jax.eval_shape(lambda: ours.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.zeros((1, S), jnp.int32),
        attention_mask=jnp.ones((1, S), jnp.int32),
        labels=jnp.zeros((1, S), jnp.int32),
        image_embeds=jnp.zeros((1, acfg.num_vit_tokens, acfg.vit_dim)),
        embeds_gen_mask=jnp.ones((1,), bool),
        embeds_cmp_mask=jnp.ones((1,), bool),
        ids_gen_mask=jnp.zeros((1, S), bool).at[0, 2:2 + acfg.num_img_out_tokens].set(True),
        ids_cmp_mask=jnp.zeros((1, S), bool).at[0, 14:14 + acfg.num_img_in_tokens].set(True),
    ))["params"]
    import flax.linen as nn

    want = _paths(jax.tree_util.tree_map(
        lambda x: x, nn.meta.unbox(abstract)))
    got = _paths(params)
    assert set(got) == set(want), (
        sorted(set(want) - set(got)), sorted(set(got) - set(want)))
    for p in want:
        assert got[p] == want[p], (p, got[p], want[p])

    # numerics: fresh-wrap LoRA B is zero and modules_to_save copies equal
    # the originals, so the converted-PEFT forward must equal the plain
    # (pre-wrap) reference agent forward
    from src.models_clm.models import ContinuousLVLM as RefAgent

    ref = RefAgent(llm=hf, input_resampler=in_res,
                   output_resampler=out_res).eval()
    rng = np.random.RandomState(1)
    B, N = 1, 1
    nq_in, nq_out = acfg.num_img_in_tokens, acfg.num_img_out_tokens
    input_ids = rng.randint(5, 30000, (B, S)).astype(np.int64)
    labels = input_ids.copy()
    ids_cmp = np.zeros((B, S), bool)
    ids_cmp[0, 14:14 + nq_in] = True
    ids_gen = np.zeros((B, S), bool)
    ids_gen[0, 2:2 + nq_out] = True
    image_embeds = rng.randn(N, acfg.num_vit_tokens, acfg.vit_dim
                             ).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(
            input_ids=torch.from_numpy(input_ids),
            attention_mask=torch.ones(B, S, dtype=torch.long),
            labels=torch.from_numpy(labels),
            image_embeds=torch.from_numpy(image_embeds),
            embeds_gen_mask=torch.tensor([True]),
            embeds_cmp_mask=torch.tensor([True]),
            ids_gen_mask=torch.from_numpy(ids_gen),
            ids_cmp_mask=torch.from_numpy(ids_cmp),
        )
    out = ours.apply(
        {"params": params},
        input_ids=jnp.asarray(input_ids, jnp.int32),
        attention_mask=jnp.ones((B, S), jnp.int32),
        labels=jnp.asarray(labels, jnp.int32),
        image_embeds=jnp.asarray(image_embeds),
        embeds_gen_mask=jnp.ones((1,), bool),
        embeds_cmp_mask=jnp.ones((1,), bool),
        ids_gen_mask=jnp.asarray(ids_gen),
        ids_cmp_mask=jnp.asarray(ids_cmp),
    )
    np.testing.assert_allclose(
        float(out["lm_loss"]), float(ref_out["lm_loss"]), atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------
# stage-1 yuying layout
# ---------------------------------------------------------------------


def test_yuying_remap_matches_reference_semantics():
    from seed_story_tpu.tools.convert_torch_weights import remap_stage1_yuying

    rng = np.random.RandomState(0)
    inner = {
        "query_tokens": rng.randn(1, 32, 768).astype(np.float32),
        "ln_vision.weight": rng.randn(768).astype(np.float32),
        "ln_vision.bias": rng.randn(768).astype(np.float32),
        "Qformer.bert.encoder.layer.0.attention.self.query.weight":
            rng.randn(768, 768).astype(np.float32),
        "Qformer.cls.predictions.bias": rng.randn(30522).astype(np.float32),
        "visual_encoder.blocks.0.attn.qkv.weight":  # not remapped
            rng.randn(8, 8).astype(np.float32),
    }
    out = remap_stage1_yuying({"model": inner})
    # the exact remap of discrete_models.py:446-451
    assert out["qformer.embed_module.query"].shape == (32, 768)
    np.testing.assert_array_equal(
        out["qformer.embed_module.query"], inner["query_tokens"][0])
    np.testing.assert_array_equal(
        out["qformer.norm.weight"], inner["ln_vision.weight"])
    np.testing.assert_array_equal(
        out["qformer.norm.bias"], inner["ln_vision.bias"])
    assert ("qformer.perceiver.bert.encoder.layer.0.attention.self.query.weight"
            in out)
    assert "qformer.perceiver.cls.predictions.bias" in out
    # non-Qformer leftovers are dropped exactly like the reference's
    # strict=False load ignores them
    assert not any(k.startswith("visual_encoder") for k in out)
    # un-nested dicts (already ['model']-stripped) work too
    out2 = remap_stage1_yuying(inner)
    assert set(out2) == set(out)


# ---------------------------------------------------------------------
# legacy IP-Adapter split
# ---------------------------------------------------------------------


def test_ip_adapter_legacy_bin(ref_path):
    from src.models_ipa.resampler import Resampler as RefIPAResampler

    from seed_story_tpu.models.ipa_resampler import IPAResampler
    from seed_story_tpu.tools.convert_torch_weights import (
        convert_ip_adapter_legacy,
    )

    torch.manual_seed(1)
    dim, depth, heads, dim_head = 64, 2, 4, 16
    n_q, emb, out_dim = 8, 48, 96
    ref_res = RefIPAResampler(
        dim=dim, depth=depth, dim_head=dim_head, heads=heads,
        num_queries=n_q, embedding_dim=emb, output_dim=out_dim,
    ).eval()
    sd = {}
    for k, v in ref_res.state_dict().items():
        sd[f"image_proj_model.{k}"] = v.detach().numpy()
    # decoupled cross-attn layers: {i}.to_k_ip/to_v_ip (attention_processor
    # IPAttnProcessor weights inside the adapter_modules ModuleList)
    rng = np.random.RandomState(2)
    for i in range(3):
        sd[f"adapter_modules.{i}.to_k_ip.weight"] = rng.randn(
            32, out_dim).astype(np.float32)
        sd[f"adapter_modules.{i}.to_v_ip.weight"] = rng.randn(
            32, out_dim).astype(np.float32)

    params, missing, unexpected = convert_ip_adapter_legacy(sd)
    assert not missing and not unexpected, (missing, unexpected)

    # resampler structure matches our IPAResampler AND numerics match
    ours = IPAResampler(dim=dim, depth=depth, dim_head=dim_head, heads=heads,
                        num_queries=n_q, embedding_dim=emb,
                        output_dim=out_dim, dtype=jnp.float32)
    x = np.random.RandomState(3).randn(2, 5, emb).astype(np.float32)
    with torch.no_grad():
        want = ref_res(torch.from_numpy(x)).numpy()
    got = ours.apply({"params": params["image_proj_model"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)

    # ip layers: transposed kernels under our IPCrossAttention leaf names
    assert set(params["ip_layers"]) == {"layers_0", "layers_1", "layers_2"}
    k0 = params["ip_layers"]["layers_0"]["to_k_ip"]["kernel"]
    assert k0.shape == (out_dim, 32)
    np.testing.assert_array_equal(
        k0, sd["adapter_modules.0.to_k_ip.weight"].T)


# ---------------------------------------------------------------------
# shuffled added-token order
# ---------------------------------------------------------------------


def test_converter_cli_added_tokens_json(tmp_path):
    """--added_tokens_json plumbs the released tokenizer order through the
    CLI: rows 32000+ are permuted to canonical without hand-calling the
    library (previously the flag did not exist and the CLI converted such
    checkpoints silently wrong)."""
    import json

    import torch

    from seed_story_tpu.data.tokenizer import (
        BOI_TOKEN,
        BOI_TOKEN_ID,
        LLAMA_VOCAB_SIZE,
        special_tokens,
    )
    import orbax.checkpoint as ocp

    from seed_story_tpu.tools.convert_torch_weights import main

    specials = special_tokens()
    shuffled = [specials[1]] + specials[:1:-1] + [specials[0]]
    added = {tok: LLAMA_VOCAB_SIZE + i for i, tok in enumerate(shuffled)}
    (tmp_path / "added_tokens.json").write_text(json.dumps(added))

    w = np.arange(32066, dtype=np.float32)[:, None].repeat(2, axis=1)
    sd = {
        "model.embed_tokens.weight": torch.tensor(w),
        "lm_head.weight": torch.tensor(w + 0.5),
        "model.norm.weight": torch.ones(2),
    }
    torch.save(sd, tmp_path / "model.pt")
    out = tmp_path / "out"
    main([
        "--family", "llama", "--input", str(tmp_path / "model.pt"),
        "--output", str(out), "--num_layers", "0",
        "--added_tokens_json", str(tmp_path / "added_tokens.json"),
    ])
    import os

    params = ocp.PyTreeCheckpointer().restore(os.path.abspath(str(out)))
    emb = np.asarray(params["model"]["embed_tokens"]["embedding"])
    assert emb[BOI_TOKEN_ID, 0] == added[BOI_TOKEN]


def test_added_token_permutation_and_llama_remap():
    from seed_story_tpu.data.tokenizer import (
        BOI_TOKEN,
        BOI_TOKEN_ID,
        EOI_TOKEN_ID,
        FIRST_IMG_TOKEN_ID,
        LLAMA_VOCAB_SIZE,
        special_tokens,
    )
    from seed_story_tpu.tools.convert_torch_weights import (
        added_token_permutation,
        convert_llama,
        remap_embedding_rows,
    )

    # released order: </img> first, then the img_k tokens reversed, <img> last
    specials = special_tokens()
    shuffled = [specials[1]] + specials[:1:-1] + [specials[0]]
    added = {tok: LLAMA_VOCAB_SIZE + i for i, tok in enumerate(shuffled)}
    perm = added_token_permutation(added)
    # base vocab untouched
    np.testing.assert_array_equal(perm[:LLAMA_VOCAB_SIZE],
                                  np.arange(LLAMA_VOCAB_SIZE))
    # canonical <img> row must come from the RELEASED <img> row
    assert perm[BOI_TOKEN_ID] == added[BOI_TOKEN]
    w = np.arange(32066, dtype=np.float32)[:, None]  # row value == row id
    fixed = remap_embedding_rows(w, perm)
    assert fixed[BOI_TOKEN_ID, 0] == added[BOI_TOKEN]
    assert fixed[EOI_TOKEN_ID, 0] == added["</img>"]
    assert fixed[FIRST_IMG_TOKEN_ID, 0] == added["<img_00000>"]

    # wrong token set is rejected loudly
    bad = dict(added)
    bad.pop(BOI_TOKEN)
    bad["<oops>"] = 99
    with pytest.raises(ValueError):
        added_token_permutation(bad)

    # end-to-end through convert_llama: embed + lm_head rows land at the
    # canonical ids, padding rows appended after
    sd = {
        "model.embed_tokens.weight": w.repeat(2, axis=1),
        "lm_head.weight": (w + 0.5).repeat(2, axis=1),
        "model.norm.weight": np.ones(2, np.float32),
    }
    params, missing, unexpected = convert_llama(
        sd, num_layers=0, vocab_padded=32128, added_tokens=added)
    assert not unexpected, unexpected
    emb = params["model"]["embed_tokens"]["embedding"]
    assert emb.shape[0] == 32128
    assert emb[BOI_TOKEN_ID, 0] == added[BOI_TOKEN]
    assert np.all(emb[32066:] == 0)
    lm = params["lm_head"]["kernel"]  # transposed (in, vocab)
    assert lm[0, EOI_TOKEN_ID] == added["</img>"] + 0.5
