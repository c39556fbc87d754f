"""Pure-Python sentencepiece implementation (data/spm.py).

Closes SURVEY §2.2/2.4 component 18's slow tokenizer path: the reference
loads a sentencepiece .model through HF LlamaTokenizer
(configs/tokenizer/clm_llama_tokenizer.yaml); this environment has no
sentencepiece library, so data/spm.py re-implements the wire format and
both segmentation algorithms. Fixtures are serialized by
build_sentencepiece_model (writer and reader are independently coded
against the public schema; these tests exercise read-back of every field
including negative varints).
"""

import os

import pytest

from seed_story_tpu.data.spm import (
    BPE,
    BYTE,
    CONTROL,
    NORMAL,
    UNIGRAM,
    UNKNOWN,
    SentencePieceModel,
    SentencePieceProcessor,
    SentencePieceTokenizer,
    build_sentencepiece_model,
)

CONTROLS = [("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL), ("</s>", 0.0, CONTROL)]
BYTES = [(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)]


def _write(tmp_path, blob, name="tokenizer.model"):
    p = os.path.join(str(tmp_path), name)
    with open(p, "wb") as f:
        f.write(blob)
    return p


def _proc(pieces, **kw):
    return SentencePieceProcessor(
        SentencePieceModel.parse(build_sentencepiece_model(pieces, **kw))
    )


def test_proto_roundtrip_all_fields():
    pieces = CONTROLS + [("▁hi", -1.5, NORMAL), ("<0x41>", -2.0, BYTE)]
    blob = build_sentencepiece_model(
        pieces,
        model_type=BPE,
        byte_fallback=True,
        unk_id=0,
        bos_id=1,
        eos_id=2,
        pad_id=-1,  # negative varint (10-byte two's complement)
        normalizer_name="nmt_nfkc",
        add_dummy_prefix=False,
        remove_extra_whitespaces=False,
        escape_whitespaces=False,
    )
    m = SentencePieceModel.parse(blob)
    assert [p for p, _, _ in m.pieces] == [p for p, _, _ in pieces]
    assert m.pieces[3][1] == pytest.approx(-1.5)
    assert [t for _, _, t in m.pieces] == [t for _, _, t in pieces]
    assert m.model_type == BPE and m.byte_fallback
    assert (m.unk_id, m.bos_id, m.eos_id, m.pad_id) == (0, 1, 2, -1)
    assert m.normalizer_name == "nmt_nfkc"
    assert not m.add_dummy_prefix
    assert not m.remove_extra_whitespaces
    assert not m.escape_whitespaces


def test_unigram_viterbi_beats_greedy():
    # greedy longest-match would take "abc" (-5); the max-log-prob
    # segmentation is "ab"+"c" (-2) — the defining unigram property
    pieces = CONTROLS + [
        ("abc", -5.0, NORMAL),
        ("ab", -1.0, NORMAL),
        ("c", -1.0, NORMAL),
        ("a", -2.0, NORMAL),
        ("b", -2.0, NORMAL),
    ]
    sp = _proc(pieces, add_dummy_prefix=False, escape_whitespaces=False)
    ids = sp.encode("abc")
    assert [sp.m.pieces[i][0] for i in ids] == ["ab", "c"]
    assert sp.decode(ids) == "abc"


def test_unigram_unk_and_byte_fallback():
    pieces = CONTROLS + BYTES + [("a", -1.0, NORMAL)]
    # without byte_fallback: unknown char -> unk_id
    sp = _proc(pieces, add_dummy_prefix=False, escape_whitespaces=False)
    assert sp.encode("aé") == [sp._match["a"][0], 0]
    # with byte_fallback: é -> <0xC3><0xA9>, and decode reassembles it
    spb = _proc(
        pieces,
        byte_fallback=True,
        add_dummy_prefix=False,
        escape_whitespaces=False,
    )
    ids = spb.encode("aé")
    names = [spb.m.pieces[i][0] for i in ids]
    assert names == ["a", "<0xC3>", "<0xA9>"]
    assert spb.decode(ids) == "aé"


def test_bpe_merge_order_follows_scores():
    base = CONTROLS + [("a", -10.0, NORMAL), ("b", -10.0, NORMAL),
                       ("c", -10.0, NORMAL)]
    # bc outranks ab -> "a"+"bc"
    sp = _proc(base + [("ab", -1.0, NORMAL), ("bc", -0.5, NORMAL)],
               model_type=BPE, add_dummy_prefix=False,
               escape_whitespaces=False)
    assert [sp.m.pieces[i][0] for i in sp.encode("abc")] == ["a", "bc"]
    # ab outranks bc -> "ab"+"c"
    sp = _proc(base + [("ab", -0.5, NORMAL), ("bc", -1.0, NORMAL)],
               model_type=BPE, add_dummy_prefix=False,
               escape_whitespaces=False)
    assert [sp.m.pieces[i][0] for i in sp.encode("abc")] == ["ab", "c"]


def test_bpe_cascaded_merges_and_tie_leftmost():
    # equal scores: leftmost pair merges first, enabling the full merge
    pieces = CONTROLS + [
        ("a", -10.0, NORMAL), ("b", -10.0, NORMAL), ("c", -10.0, NORMAL),
        ("ab", -1.0, NORMAL), ("abc", -0.2, NORMAL), ("bc", -1.0, NORMAL),
    ]
    sp = _proc(pieces, model_type=BPE, add_dummy_prefix=False,
               escape_whitespaces=False)
    assert [sp.m.pieces[i][0] for i in sp.encode("abc")] == ["abc"]


def test_normalizer_whitespace_pipeline():
    pieces = CONTROLS + [
        ("▁hello", -1.0, NORMAL),
        ("▁world", -1.0, NORMAL),
        ("▁", -5.0, NORMAL),
    ]
    sp = _proc(pieces)  # defaults: dummy prefix + collapse + escape
    ids = sp.encode("hello   world ")
    assert [sp.m.pieces[i][0] for i in ids] == ["▁hello", "▁world"]
    assert sp.decode(ids) == "hello world"


def test_decode_skips_control_pieces_when_asked():
    pieces = CONTROLS + [("▁hi", -1.0, NORMAL)]
    sp = _proc(pieces)
    hid = sp._match["▁hi"][0]
    assert sp.decode([1, hid, 2], skip_special=True) == "hi"
    assert sp.decode([1, hid, 2]) == "<s>hi</s>"


def test_tokenizer_wrapper_added_tokens_and_protocol():
    from seed_story_tpu.data.tokenizer import special_tokens

    pieces = CONTROLS + [("▁hello", -1.0, NORMAL), ("▁story", -1.2, NORMAL)]
    tok = SentencePieceTokenizer(
        _write("/tmp", build_sentencepiece_model(pieces), "spm_wrapper.model")
    )
    n = tok.vocab_size
    assert tok.add_tokens(special_tokens()) == 66
    assert len(tok) == n + 66
    assert tok.convert_tokens_to_ids("<img>") == n
    assert tok.convert_tokens_to_ids("<img_00003>") == n + 2 + 3
    assert tok.convert_tokens_to_ids("<s>") == 1
    # added tokens split the text; surrounding words still segment
    ids = tok.encode("hello<img><img_00000></img>story",
                     add_special_tokens=False)
    toks = tok.convert_ids_to_tokens(ids)
    assert toks == ["▁hello", "<img>", "<img_00000>", "</img>", "▁story"]
    assert tok.decode(ids) == "hello<img><img_00000></img>story"
    # add_special_tokens=True prepends bos only (LLaMA rule)
    assert tok.encode("hello")[0] == tok.bos_token_id
    # idempotent re-add
    assert tok.add_tokens(special_tokens()) == 0


def test_load_llama_tokenizer_falls_back_to_pure_python(tmp_path):
    """The integration path: a directory holding only tokenizer.model
    (no tokenizer.json), transformers raises its sentencepiece
    ImportError, and load_llama_tokenizer lands on data/spm.py with the
    canonical 32000+66 layout intact."""
    from seed_story_tpu.data.tokenizer import (
        LLAMA_VOCAB_SIZE,
        MULTIMODAL_VOCAB_SIZE,
        load_llama_tokenizer,
    )

    filler = [
        (f"▁w{i:05d}", -float(i) / 1000.0, NORMAL)
        for i in range(LLAMA_VOCAB_SIZE - len(CONTROLS) - len(BYTES))
    ]
    blob = build_sentencepiece_model(
        CONTROLS + BYTES + filler,
        model_type=BPE,
        byte_fallback=True,
        remove_extra_whitespaces=False,
    )
    _write(tmp_path, blob)
    tok = load_llama_tokenizer(str(tmp_path))
    assert isinstance(tok, SentencePieceTokenizer)
    assert len(tok) == MULTIMODAL_VOCAB_SIZE
    assert tok.convert_tokens_to_ids("<img>") == 32000
    assert tok.convert_tokens_to_ids("<img_00063>") == 32065
    ids = tok.encode("<img>", add_special_tokens=False)
    assert ids == [32000]
    assert tok.decode(ids) == "<img>"
