"""Weight converter fidelity + GPT-judge protocol (offline fake client)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_convert_llama_matches_hf_logits():
    """HF state dict --convert_llama--> our model == HF outputs. This is
    the production import path for LLaMA checkpoints."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM as HFLlama

    from seed_story_tpu.models.llama import LlamaConfig, LlamaForCausalLM
    from seed_story_tpu.tools.convert_torch_weights import convert_llama

    cfg = LlamaConfig.tiny(dtype=jnp.float32)
    hf = HFLlama(HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.kv_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        attn_implementation="eager", tie_word_embeddings=False,
    ))
    hf.eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    params, missing, unexpected = convert_llama(
        sd, num_layers=cfg.num_hidden_layers, vocab_padded=cfg.vocab_padded
    )
    assert not missing, missing[:5]
    assert not unexpected, unexpected[:5]

    model = LlamaForCausalLM(cfg)
    ids = np.array([[1, 77, 31500, 9, 222, 31000]], np.int64)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got = model.apply({"params": params}, jnp.asarray(ids, jnp.int32))["logits"]
    got = np.asarray(got, np.float32)[..., : cfg.vocab_size]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_convert_qwen_vit_roundtrip_shapes():
    """Synthetic reference-layout state dict loads with zero missing keys
    and the flax ViT runs with the converted tree."""
    from seed_story_tpu.models.vit import ViTConfig, VisionTransformerWithAttnPool
    from seed_story_tpu.tools.convert_torch_weights import convert_qwen_vit

    cfg = ViTConfig.tiny(dtype=jnp.float32)
    rng = np.random.RandomState(0)

    def r(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.02

    w, heads, mlp = cfg.width, cfg.heads, int(cfg.width * cfg.mlp_ratio)
    out = cfg.output_dim
    sd = {
        "conv1.weight": r(w, 3, cfg.patch_size, cfg.patch_size),
        "positional_embedding": r(256, w),
        "ln_pre.weight": np.ones(w, np.float32), "ln_pre.bias": r(w),
        "ln_post.weight": np.ones(out, np.float32), "ln_post.bias": r(out),
        "proj": r(out, out),
        "attn_pool.query": r(cfg.n_queries, out),
        "attn_pool.pos_embed": r(cfg.n_queries, out),
        "attn_pool.kv_proj.weight": r(out, w),
        "attn_pool.ln_q.weight": np.ones(out, np.float32), "attn_pool.ln_q.bias": r(out),
        "attn_pool.ln_kv.weight": np.ones(out, np.float32), "attn_pool.ln_kv.bias": r(out),
        "attn_pool.attn.in_proj_weight": r(3 * out, out),
        "attn_pool.attn.in_proj_bias": r(3 * out),
        "attn_pool.attn.out_proj.weight": r(out, out),
        "attn_pool.attn.out_proj.bias": r(out),
    }
    for i in range(cfg.layers):
        tp = f"transformer.resblocks.{i}"
        sd.update({
            f"{tp}.ln_1.weight": np.ones(w, np.float32), f"{tp}.ln_1.bias": r(w),
            f"{tp}.ln_2.weight": np.ones(w, np.float32), f"{tp}.ln_2.bias": r(w),
            f"{tp}.attn.in_proj.weight": r(3 * w, w), f"{tp}.attn.in_proj.bias": r(3 * w),
            f"{tp}.attn.out_proj.weight": r(w, w), f"{tp}.attn.out_proj.bias": r(w),
            f"{tp}.mlp.c_fc.weight": r(mlp, w), f"{tp}.mlp.c_fc.bias": r(mlp),
            f"{tp}.mlp.c_proj.weight": r(w, mlp), f"{tp}.mlp.c_proj.bias": r(mlp)[:w],
        })
    params, missing, unexpected = convert_qwen_vit(sd, layers=cfg.layers)
    assert not missing, missing
    assert not unexpected, unexpected

    vit = VisionTransformerWithAttnPool(cfg)
    # structural check: converted tree must match the model's own init tree
    ref = jax.eval_shape(lambda: vit.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 3, cfg.image_size, cfg.image_size)))["params"])
    import flax
    from flax import linen as nn

    flat_ref = flax.traverse_util.flatten_dict(nn.meta.unbox(ref), sep="/")
    flat_got = flax.traverse_util.flatten_dict(params, sep="/")
    assert set(flat_ref) == set(flat_got), (
        set(flat_ref) ^ set(flat_got))
    for k in flat_ref:
        assert tuple(flat_ref[k].shape) == tuple(np.shape(flat_got[k])), k

    outv = vit.apply({"params": params},
                     jnp.ones((1, 3, cfg.image_size, cfg.image_size)))
    assert np.isfinite(np.asarray(outv)).all()


def test_convert_sdxl_unet_structsince():
    """Synthetic diffusers-layout keys map onto our UNet tree exactly."""
    from seed_story_tpu.models.sdxl.unet import SDXLUNetConfig, UNet2DConditionModel
    from seed_story_tpu.tools.convert_torch_weights import _diffusers_path

    # spot checks of the path mapping
    cases = {
        "down_blocks.0.resnets.1.conv1.weight":
            ("down_blocks_0_resnets_1/conv1", "weight"),
        "down_blocks.1.attentions.0.transformer_blocks.0.attn2.to_k.weight":
            ("down_blocks_1_attentions_0/transformer_blocks_0/attn2/to_k", "weight"),
        "mid_block.attentions.0.proj_in.weight":
            ("mid_block_attentions_0/proj_in", "weight"),
        "mid_block.resnets.1.time_emb_proj.bias":
            ("mid_block_resnets_1/time_emb_proj", "bias"),
        "up_blocks.2.resnets.0.conv_shortcut.weight":
            ("up_blocks_2_resnets_0/conv_shortcut", "weight"),
        "down_blocks.0.downsamplers.0.conv.weight":
            ("down_blocks_0_downsamplers_0/conv", "weight"),
        "up_blocks.0.upsamplers.0.conv.bias":
            ("up_blocks_0_upsamplers_0/conv", "bias"),
        "down_blocks.2.attentions.1.transformer_blocks.3.ff.net.0.proj.weight":
            ("down_blocks_2_attentions_1/transformer_blocks_3/ff/net_0_proj", "weight"),
        "down_blocks.2.attentions.1.transformer_blocks.3.ff.net.2.weight":
            ("down_blocks_2_attentions_1/transformer_blocks_3/ff/net_2", "weight"),
        "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_out.0.weight":
            ("down_blocks_1_attentions_0/transformer_blocks_0/attn1/to_out_0", "weight"),
        "time_embedding.linear_1.weight": ("time_embedding/linear_1", "weight"),
        "add_embedding.linear_2.bias": ("add_embedding/linear_2", "bias"),
        "conv_norm_out.weight": ("conv_norm_out", "weight"),
        "down_blocks.1.attentions.0.norm.weight":
            ("down_blocks_1_attentions_0/norm", "weight"),
    }
    for key, want in cases.items():
        assert _diffusers_path(key) == want, (key, _diffusers_path(key))


def test_gpt_judge_protocol_with_fake_client(tmp_path):
    from PIL import Image

    from seed_story_tpu.eval.gpt_score_eval import evaluate_folder
    from seed_story_tpu.eval.gpt_comparative_eval import compare

    # build two story folders
    for v in range(2):
        d = tmp_path / f"val_{v}"
        d.mkdir()
        (d / "text.txt").write_text("\n".join(
            f"[INST]sentence {i} of story {v}" for i in range(6)))
        for j in range(1, 6):
            Image.new("RGB", (16, 16), (v * 100, j * 40, 0)).save(d / f"ori_0{j}.jpg")

    class FakeCompletions:
        def __init__(self, reply):
            self.reply = reply
            self.calls = []

        def create(self, **kw):
            self.calls.append(kw)

            class R:
                pass

            r = R()
            msg = R(); msg.content = self.reply
            choice = R(); choice.message = msg
            r.choices = [choice]
            return r

    class FakeClient:
        def __init__(self, reply):
            self.chat = type("C", (), {})()
            self.chat.completions = FakeCompletions(reply)

    client = FakeClient("The style is consistent. [[8]]")
    avgs = evaluate_folder(str(tmp_path), client=client, out_dir=str(tmp_path))
    assert avgs == {"style": 8.0, "engaging": 8.0, "coherence": 8.0}
    assert (tmp_path / "result_style.txt").exists()
    # messages carried interleaved text+images, [INST] stripped
    first_call = client.chat.completions.calls[0]
    content = first_call["messages"][0]["content"]
    assert any(c["type"] == "image_url" for c in content)
    assert not any("[INST]" in c.get("text", "") for c in content)

    stories = [
        {"sentences": ["a"], "images": [str(tmp_path / "val_0" / "ori_01.jpg")]},
    ]
    res = compare(stories, stories, client=FakeClient("tie here [[C]]"))
    assert res == {"a_win": 0, "b_win": 1 - 1, "tie": 1, "error": 0}


def test_convert_llama_int8_scan_layout_close_to_hf():
    """The converter's --int8/--scan_layers post-passes: HF weights ->
    quantize_llama_params + stack_layer_params load into a
    quantize_base+scan_layers model and stay close to HF logits (int8
    weight-only tolerance)."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM as HFLlama

    from seed_story_tpu.models.llama import (
        LlamaConfig,
        LlamaForCausalLM,
        quantize_llama_params,
        stack_layer_params,
    )
    from seed_story_tpu.tools.convert_torch_weights import convert_llama

    cfg = LlamaConfig.tiny(dtype=jnp.float32)
    hf = HFLlama(HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.kv_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        attn_implementation="eager", tie_word_embeddings=False,
    ))
    hf.eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params, _, _ = convert_llama(
        sd, num_layers=cfg.num_hidden_layers, vocab_padded=cfg.vocab_padded
    )
    params = stack_layer_params(quantize_llama_params(params))

    qcfg = LlamaConfig.tiny(dtype=jnp.float32, quantize_base=True,
                            scan_layers=True)
    model = LlamaForCausalLM(qcfg)
    ids = np.array([[1, 77, 31500, 9, 222, 31000]], np.int64)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got = model.apply({"params": params}, jnp.asarray(ids, jnp.int32))["logits"]
    got = np.asarray(got, np.float32)[..., : cfg.vocab_size]
    # int8 weight-only: compare distributions, not exact logits
    kl = np.sum(
        np.exp(want - want.max(-1, keepdims=True))
        / np.exp(want - want.max(-1, keepdims=True)).sum(-1, keepdims=True)
        * (jax.nn.log_softmax(jnp.asarray(want)) - jax.nn.log_softmax(jnp.asarray(got))),
        axis=-1,
    )
    assert float(np.mean(kl)) < 5e-3, float(np.mean(kl))


def _fake_client(reply):
    class FakeCompletions:
        def __init__(self):
            self.calls = []

        def create(self, **kw):
            self.calls.append(kw)

            class R:
                pass

            r = R()
            msg = R(); msg.content = reply
            choice = R(); choice.message = msg
            r.choices = [choice]
            return r

    class FakeClient:
        def __init__(self):
            self.chat = type("C", (), {})()
            self.chat.completions = FakeCompletions()

    return FakeClient()


def test_storystream_v1_builder(tmp_path):
    """v1 build_story pipeline (reference StoryStream/build_story.py):
    caption-jsonl lines batched into story_len groups, the v1 prompt +
    'Image Descriptions' content, '[file].jpg->[narrative]' line grammar,
    {id, images, captions, orders} records."""
    import json

    from seed_story_tpu.tools.storystream import (
        V1_PROMPT,
        build_stories_v1,
        extract_v1_lines,
    )

    # line grammar: non-greedy up to the FIRST '.jpg->'; bracketed file
    # names do NOT match (reference build_story.py:66-71)
    paths, caps = extract_v1_lines(
        "frame_001.jpg->George climbed the tall tree.\n"
        "noise line without arrow\n"
        "frame_002.jpg-> He waved at the man in the yellow hat. \n"
        "[frame_003.jpg]->[bracketed lines do not match]\n"
    )
    assert paths == ["frame_001.jpg", "frame_002.jpg"]
    assert caps == ["George climbed the tall tree.",
                    "He waved at the man in the yellow hat."]

    captions = tmp_path / "captions.jsonl"
    with open(captions, "w") as f:
        for i in range(5):
            f.write(json.dumps({"image": f"frame_{i:03d}.jpg",
                                "caption": f"a monkey does thing {i}"}) + "\n")

    reply = ("frame_000.jpg->George starts the day.\n"
             "frame_001.jpg->George finds a kite.")
    client = _fake_client(reply)
    out = tmp_path / "story.jsonl"
    # story_len=3 over 5 lines -> 2 batches incl. the ragged tail (ref :117-122)
    n = build_stories_v1(str(captions), str(out), client=client, story_len=3)
    assert n == 2
    calls = client.chat.completions.calls
    assert len(calls) == 2
    content = calls[0]["messages"][0]["content"]
    assert content.startswith(V1_PROMPT)
    assert "Image Descriptions: \n" in content
    assert "frame_002.jpg" in content  # raw jsonl lines joined into content
    assert "Subtitles" not in content  # with_subtitle off by default

    records = [json.loads(l) for l in open(out)]
    assert [r["id"] for r in records] == [0, 1]
    for r in records:
        assert r["images"] == ["frame_000.jpg", "frame_001.jpg"]
        assert r["orders"] == [0, 1]

    # with_subtitle variant appends the subtitle blob (ref :133-134)
    client2 = _fake_client(reply)
    build_stories_v1(str(captions), str(tmp_path / "s2.jsonl"), client=client2,
                     story_len=5, subtitles=["SUB TEXT"])
    content2 = client2.chat.completions.calls[0]["messages"][0]["content"]
    assert content2.endswith("Subtitles: \nSUB TEXT")


def test_storystream_v2_grammar_and_chunk(tmp_path):
    """v2 grammar parser + 30->3x10 chunker (reference build_story_v2.py:167-192,
    chunk_data.py:4-22)."""
    import json

    from seed_story_tpu.tools.storystream import (
        chunk_files,
        convert_to_jsonl,
        split_entries,
    )

    line = convert_to_jsonl(
        "preamble {{a.jpg->one@@b.jpg->two@@c.jpg->three}} trailer")
    rec = json.loads(line)
    assert rec == {"images": ["a.jpg", "b.jpg", "c.jpg"],
                   "captions": ["one", "two", "three"]}
    assert convert_to_jsonl("no grammar here") is None

    entries = [{"images": [f"f{i}.jpg" for i in range(30)],
                "captions": [f"c{i}" for i in range(30)]},
               # ragged: mismatched lengths are skipped entirely
               {"images": ["x.jpg"], "captions": []}]
    chunks = split_entries(entries, chunk_size=10)
    assert len(chunks) == 3
    assert chunks[0]["images"] == [f"f{i}.jpg" for i in range(10)]
    assert chunks[2]["captions"] == [f"c{i}" for i in range(20, 30)]

    src = tmp_path / "in.jsonl"
    with open(src, "w") as f:
        f.write(json.dumps(entries[0]) + "\n")
    out = tmp_path / "out.jsonl"
    assert chunk_files(str(src), str(out), 10) == 3
