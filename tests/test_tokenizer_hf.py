"""HF tokenizer path: load_llama_tokenizer on a real (tiny) saved asset.

No sentencepiece model ships in this environment, so the slow
LlamaTokenizer path stays environment-blocked; this exercises the fast
(tokenizer.json) branch end to end — the layout the released
'cvlm_llama2_tokenizer' directory actually ships alongside the sp model —
including the canonical-id assumption for the 66 added tokens and the
round-trip of a saved tokenizer that already has them."""

import json

import pytest

pytest.importorskip("tokenizers")
pytest.importorskip("transformers")

from seed_story_tpu.data.tokenizer import (  # noqa: E402
    BOI_TOKEN,
    BOI_TOKEN_ID,
    EOI_TOKEN,
    EOI_TOKEN_ID,
    FIRST_IMG_TOKEN_ID,
    LLAMA_VOCAB_SIZE,
    MULTIMODAL_VOCAB_SIZE,
    image_comprehension_string,
    load_llama_tokenizer,
)


def _write_tiny_llama_asset(d):
    """A 32000-entry word-level fast tokenizer directory (the multimodal
    layout only cares about vocab SIZE and added-token ids)."""
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for w in ("george", "the", "monkey", "went", "to", "park"):
        vocab[w] = len(vocab)
    i = 0
    while len(vocab) < LLAMA_VOCAB_SIZE:
        vocab[f"tok{i}"] = len(vocab)
        i += 1
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "bos_token": "<s>", "eos_token": "</s>", "unk_token": "<unk>",
        "model_max_length": 4096,
    }))


def test_fast_tokenizer_canonical_layout(tmp_path):
    _write_tiny_llama_asset(tmp_path)
    tok = load_llama_tokenizer(str(tmp_path))
    assert len(tok) == MULTIMODAL_VOCAB_SIZE
    assert tok.convert_tokens_to_ids(BOI_TOKEN) == BOI_TOKEN_ID
    assert tok.convert_tokens_to_ids(EOI_TOKEN) == EOI_TOKEN_ID
    assert tok.convert_tokens_to_ids("<img_00000>") == FIRST_IMG_TOKEN_ID
    assert tok.convert_tokens_to_ids("<img_00063>") == FIRST_IMG_TOKEN_ID + 63

    # the per-image comprehension block tokenizes to the exact id chain the
    # forced-decoding automaton emits
    ids = tok.encode(
        "george the monkey " + image_comprehension_string(4),
        add_special_tokens=False,
    )
    assert ids[-6:] == [BOI_TOKEN_ID] + list(
        range(FIRST_IMG_TOKEN_ID, FIRST_IMG_TOKEN_ID + 4)) + [EOI_TOKEN_ID]

    # decode round-trips the specials verbatim (the pipelines' TAG_RE
    # cleanup depends on them surfacing as <...> tags)
    text = tok.decode(ids)
    assert BOI_TOKEN in text and EOI_TOKEN in text


def test_validate_canonical_layout_rejects_shuffled():
    """The layout validator fails loudly on non-canonical added-token ids
    (reachable via the slow sentencepiece path's added_tokens.json order;
    fast tokenizer.json assets re-derive ids and cannot be shuffled) and
    points at the converter permutation."""
    from seed_story_tpu.data.tokenizer import (
        special_tokens,
        validate_canonical_layout,
    )

    specials = special_tokens()
    canonical = {t: LLAMA_VOCAB_SIZE + i for i, t in enumerate(specials)}
    shuffled = {t: LLAMA_VOCAB_SIZE + (len(specials) - 1 - i)
                for i, t in enumerate(specials)}

    class Stub:
        def __init__(self, mapping):
            self.mapping = mapping

        def convert_tokens_to_ids(self, t):
            return self.mapping[t]

    validate_canonical_layout(Stub(canonical))  # no raise
    with pytest.raises(ValueError, match="added_tokens_json"):
        validate_canonical_layout(Stub(shuffled), origin="released-asset")


def test_fast_tokenizer_saved_roundtrip(tmp_path):
    """A directory saved WITH the added tokens (what the reference ships as
    'cvlm_llama2_tokenizer') loads without re-adding and keeps the ids."""
    (tmp_path / "base").mkdir()
    _write_tiny_llama_asset(tmp_path / "base")
    tok = load_llama_tokenizer(str(tmp_path / "base"))
    saved = tmp_path / "saved"
    tok.save_pretrained(str(saved))
    tok2 = load_llama_tokenizer(str(saved))
    assert len(tok2) == MULTIMODAL_VOCAB_SIZE
    assert tok2.convert_tokens_to_ids(BOI_TOKEN) == BOI_TOKEN_ID
    assert tok2.convert_tokens_to_ids("<img_00063>") == FIRST_IMG_TOKEN_ID + 63
