"""Golden numerical parity against the ACTUAL reference torch modules.

These tests import the reference implementation (read-only, test-only —
never copied) at tiny configs, convert its randomly-initialized state dict
through tools/convert_torch_weights, and assert our flax modules produce
the same numbers:

  * VisionTransformerWithAttnPool (qwen_visual.py:321-422) — full forward,
    blocks + attn-pool + proj, at 224px (256 tokens => no pos-emb
    interpolation; the interp kernels legitimately differ: torch bicubic
    a=-0.75 vs jax a=-0.5)
  * attn-pool Resampler alone (qwen_visual.py:95-153)
  * ResamplerXLV2 (models_ipa/resampler.py:228-284) — prompt + pooled heads
  * AutoImageTokenGenerationProcessor (models_clm/generation.py:9-31) vs
    our ImageTokenAutomaton on a random-logits trace
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _stub_torchvision():
    """qwen_visual imports torchvision only for its image transform (which
    these tests never call) — torchvision is not installed here."""
    if "torchvision" in sys.modules:
        return
    import importlib.machinery as _m

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    for name in ("Compose", "Resize", "ToTensor", "Normalize"):
        setattr(tr, name, lambda *a, **k: (lambda x: x))
    tr.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
    tv.transforms = tr
    # transformers probes importlib.util.find_spec("torchvision")
    tv.__spec__ = _m.ModuleSpec("torchvision", loader=None)
    tr.__spec__ = _m.ModuleSpec("torchvision.transforms", loader=None)
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr


@pytest.fixture(scope="module")
def ref_path():
    sys.path.insert(0, REF)
    _stub_torchvision()
    yield
    sys.path.remove(REF)


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_vit_attnpool_golden(ref_path):
    from src.models.qwen_visual import VisionTransformerWithAttnPool as RefViT

    from seed_story_tpu.models.vit import ViTConfig, VisionTransformerWithAttnPool
    from seed_story_tpu.tools.convert_torch_weights import convert_qwen_vit

    torch.manual_seed(0)
    kw = dict(image_size=224, patch_size=14, width=64, layers=2, heads=4,
              mlp_ratio=4.0, n_queries=16, output_dim=128)
    ref = RefViT(**kw).eval()

    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        ref_out = ref(x).numpy()

    params, missing, unexpected = convert_qwen_vit(
        {k: v for k, v in ref.state_dict().items()}, layers=2
    )
    assert not missing and not unexpected, (missing, unexpected)

    ours = VisionTransformerWithAttnPool(
        ViTConfig(dtype=jnp.float32, **kw)
    )
    out = ours.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4, rtol=1e-3)


def test_attn_pool_resampler_golden(ref_path):
    from src.models.qwen_visual import Resampler as RefResampler

    from seed_story_tpu.models.resampler import Resampler

    from functools import partial

    torch.manual_seed(1)
    # eps 1e-6 == how the ViT instantiates its attn_pool (qwen_visual.py:356)
    ref = RefResampler(grid_size=4, embed_dim=64, num_heads=4, kv_dim=48,
                       norm_layer=partial(torch.nn.LayerNorm, eps=1e-6)).eval()
    x = torch.randn(3, 36, 48)  # 36 kv tokens: exercises pos-emb interp too
    with torch.no_grad():
        ref_out = ref(x).numpy()

    sd = _sd(ref)
    params = {
        "query": sd["query"],
        "kv_proj": {"kernel": sd["kv_proj.weight"].T},
        "ln_q": {"scale": sd["ln_q.weight"], "bias": sd["ln_q.bias"]},
        "ln_kv": {"scale": sd["ln_kv.weight"], "bias": sd["ln_kv.bias"]},
        "attn": {
            "in_proj_weight": sd["attn.in_proj_weight"],
            "in_proj_bias": sd["attn.in_proj_bias"],
            "out_proj": {"kernel": sd["attn.out_proj.weight"].T,
                         "bias": sd["attn.out_proj.bias"]},
        },
    }
    ours = Resampler(grid_size=4, embed_dim=64, num_heads=4, kv_dim=48,
                     ln_eps=1e-6)  # reference default norm_layer eps=1e-6
    out = ours.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5, rtol=1e-4)


def test_resampler_xlv2_golden(ref_path):
    from src.models_ipa.resampler import ResamplerXLV2 as RefXLV2

    from seed_story_tpu.models.ipa_resampler import ResamplerXLV2
    from seed_story_tpu.tools.convert_torch_weights import convert_detokenizer

    torch.manual_seed(2)
    kw = dict(dim=64, depth=2, dim_head=16, heads=4, num_queries=8,
              embedding_dim=48, ff_mult=2)
    ref = RefXLV2(output1_dim=24, output2_dim=40, **kw).eval()
    x = torch.randn(2, 10, 48)
    with torch.no_grad():
        ref_prompt, ref_pooled = ref(x)

    converted, _, _ = convert_detokenizer(
        {f"resampler.{k}": v for k, v in ref.state_dict().items()}
    )
    ours = ResamplerXLV2(output1_dim=24, output2_dim=40, **kw)
    prompt, pooled = ours.apply({"params": converted["resampler"]},
                                jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(prompt), ref_prompt.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_logits_processor_golden(ref_path):
    from src.models_clm.generation import AutoImageTokenGenerationProcessor

    from seed_story_tpu.data.tokenizer import (
        BOI_TOKEN_ID,
        EOI_TOKEN_ID,
        FIRST_IMG_TOKEN_ID,
    )
    from seed_story_tpu.decode.logits_processors import ImageTokenAutomaton

    n_img = 8
    chain = [BOI_TOKEN_ID] + [FIRST_IMG_TOKEN_ID + i for i in range(n_img)] \
        + [EOI_TOKEN_ID]

    class FakeTokenizer:
        def encode(self, text, add_special_tokens=False):
            assert text.startswith("<img>") and text.endswith("</img>")
            return list(chain)

    ref = AutoImageTokenGenerationProcessor(FakeTokenizer(),
                                            num_img_gen_tokens=n_img)
    vocab = EOI_TOKEN_ID + n_img + 16
    ours = ImageTokenAutomaton(vocab, num_img_gen_tokens=n_img)

    rng = np.random.RandomState(3)
    prev_tokens = chain[:-1] + chain[-1:] + [5, 99, 7]  # in-chain + out
    for prev in prev_tokens:
        scores = rng.randn(1, vocab).astype(np.float32) * 3
        ref_scores = torch.from_numpy(scores.copy())
        ref_out = ref(torch.tensor([[prev]]), ref_scores).numpy()
        out = np.asarray(
            ours(jnp.asarray([prev], jnp.int32), jnp.asarray(scores))
        )
        # identical forced/suppressed ARGMAX everywhere (the automaton uses
        # a large constant instead of max+10 — same argmax, sampling-proof)
        assert out.argmax() == ref_out.argmax(), prev
        if prev not in chain[:-1]:
            # out-of-chain: exact semantics — img ids zeroed, rest untouched
            np.testing.assert_array_equal(out, ref_out)


def test_agent_continuous_lvlm_golden(ref_path):
    """The flagship module: our ContinuousLVLM vs the REFERENCE agent
    (src/models_clm/models.py:20-96) on identical weights and a batch with
    context images, gen images, -100 labels, and a padded row — losses and
    reconstructed image embeds must match."""
    from src.models.qwen_visual import Resampler as RefResampler
    from src.models_clm.models import ContinuousLVLM as RefAgent
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM as HFLlama

    from seed_story_tpu.models.agent import AgentConfig, ContinuousLVLM
    from seed_story_tpu.tools.convert_torch_weights import convert_agent

    torch.manual_seed(3)
    acfg = AgentConfig.tiny()  # hidden == vit_dim == 128: kv_dim None, as 7B
    C = acfg.llm
    hf_cfg = HFConfig(
        vocab_size=C.vocab_size, hidden_size=C.hidden_size,
        intermediate_size=C.intermediate_size,
        num_hidden_layers=C.num_hidden_layers,
        num_attention_heads=C.num_attention_heads,
        num_key_value_heads=C.kv_heads,
        max_position_embeddings=C.max_position_embeddings,
        rms_norm_eps=C.rms_norm_eps, rope_theta=C.rope_theta,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    llm = HFLlama(hf_cfg).eval()
    in_res = RefResampler(
        grid_size=acfg.input_resampler_grid, embed_dim=C.hidden_size,
        num_heads=acfg.resampler_heads).eval()
    out_res = RefResampler(
        grid_size=acfg.output_resampler_grid, embed_dim=acfg.vit_dim,
        num_heads=acfg.resampler_heads).eval()
    ref = RefAgent(llm=llm, input_resampler=in_res,
                   output_resampler=out_res).eval()

    # batch: 2 rows x 40 tokens; 4 flattened images (cmp, gen per row);
    # row 1 carries a padded tail
    B, S, N = 2, 40, 4
    nq_in, nq_out = acfg.num_img_in_tokens, acfg.num_img_out_tokens  # 4, 9
    rng = np.random.RandomState(5)
    input_ids = rng.randint(5, 30000, (B, S)).astype(np.int64)
    attention_mask = np.ones((B, S), np.int64)
    attention_mask[1, 36:] = 0
    labels = input_ids.copy()
    labels[:, :6] = -100
    labels[1, 36:] = -100
    embeds_cmp = np.array([True, False, True, False])
    embeds_gen = np.array([False, True, False, True])
    ids_cmp = np.zeros((B, S), bool)
    ids_cmp[0, 5:5 + nq_in] = True
    ids_cmp[1, 8:8 + nq_in] = True
    ids_gen = np.zeros((B, S), bool)
    ids_gen[0, 20:20 + nq_out] = True
    ids_gen[1, 24:24 + nq_out] = True
    image_embeds = rng.randn(N, acfg.num_vit_tokens, acfg.vit_dim
                             ).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(
            input_ids=torch.from_numpy(input_ids),
            attention_mask=torch.from_numpy(attention_mask),
            labels=torch.from_numpy(labels),
            image_embeds=torch.from_numpy(image_embeds),
            embeds_gen_mask=torch.from_numpy(embeds_gen),
            embeds_cmp_mask=torch.from_numpy(embeds_cmp),
            ids_gen_mask=torch.from_numpy(ids_gen),
            ids_cmp_mask=torch.from_numpy(ids_cmp),
            return_recon_image_embeds=True,
        )

    params, missing, unexpected = convert_agent(
        _sd(ref), num_layers=C.num_hidden_layers)
    assert not missing and not unexpected, (missing, unexpected)

    ours = ContinuousLVLM(acfg)
    out = ours.apply(
        {"params": params},
        input_ids=jnp.asarray(input_ids, jnp.int32),
        attention_mask=jnp.asarray(attention_mask, jnp.int32),
        labels=jnp.asarray(labels, jnp.int32),
        image_embeds=jnp.asarray(image_embeds),
        embeds_gen_mask=jnp.asarray(embeds_gen),
        embeds_cmp_mask=jnp.asarray(embeds_cmp),
        ids_gen_mask=jnp.asarray(ids_gen),
        ids_cmp_mask=jnp.asarray(ids_cmp),
    )

    np.testing.assert_allclose(
        float(out["lm_loss"]), float(ref_out["lm_loss"]), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(
        float(out["rec_loss"]), float(ref_out["rec_loss"]), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(
        float(out["total_loss"]), float(ref_out["total_loss"]),
        atol=4e-4, rtol=2e-4)
    # ours carries every image row; the reference returns gen rows only
    recon = np.asarray(out["recon_image_embeds"])[embeds_gen]
    np.testing.assert_allclose(
        recon, ref_out["recon_image_embeds"].numpy(), atol=2e-4, rtol=1e-3)


def test_vit_nopool_golden(ref_path):
    """The no-attn-pool VisionTransformer variant (qwen_visual.py:425-490):
    full token features match the reference on identical weights."""
    from src.models.qwen_visual import VisionTransformer as RefViT

    from seed_story_tpu.models.vit import ViTConfig, VisionTransformer
    from seed_story_tpu.tools.convert_torch_weights import convert_qwen_vit

    torch.manual_seed(4)
    kw = dict(image_size=224, patch_size=14, width=64, layers=2, heads=4,
              mlp_ratio=4.0, n_queries=16, output_dim=128)
    ref = RefViT(**kw).eval()
    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        ref_out = ref(x).numpy()

    params, missing, unexpected = convert_qwen_vit(
        {k: v for k, v in ref.state_dict().items()}, layers=2
    )
    assert not unexpected, unexpected
    # the no-pool checkpoint legitimately lacks the pool head
    assert all(("attn_pool" in m or "ln_post" in m or "proj" in m)
               for m in missing), missing

    ours = VisionTransformer(ViTConfig(dtype=jnp.float32, **kw))
    out = ours.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4, rtol=1e-3)
