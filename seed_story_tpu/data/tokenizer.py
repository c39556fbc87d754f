"""Tokenizer surface: LLaMA tokenizer + the 66 multimodal special tokens.

The reference loads a saved LLaMA tokenizer with added tokens
(configs/tokenizer/clm_llama_tokenizer.yaml -> 'pretrained/cvlm_llama2_tokenizer',
vocab 32066 per configs/clm_models/llama2chat7b_lora.yaml): base LLaMA-2
vocab 32000 + ``<img>``, ``</img>`` and ``<img_00000>..<img_00063>``.

Two implementations behind one protocol:
  * ``load_llama_tokenizer(path)`` — HF LlamaTokenizer with the special
    tokens appended (ids 32000..32065 in the order below).
  * ``TinyTokenizer`` — dependency-free deterministic word tokenizer with
    the same special-token layout, for tests and pico configs.

Canonical id layout (documented assumption; the torch->JAX weight converter
remaps embeddings if a real checkpoint used a different order):
  32000: <img>    32001: </img>    32002+k: <img_{k:05d}>
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List

BOI_TOKEN = "<img>"
EOI_TOKEN = "</img>"
IMG_TOKEN = "<img_{:05d}>"

LLAMA_VOCAB_SIZE = 32000
NUM_IMG_TOKENS = 64
MULTIMODAL_VOCAB_SIZE = LLAMA_VOCAB_SIZE + 2 + NUM_IMG_TOKENS  # 32066

BOI_TOKEN_ID = 32000
EOI_TOKEN_ID = 32001
FIRST_IMG_TOKEN_ID = 32002


def special_tokens() -> List[str]:
    return [BOI_TOKEN, EOI_TOKEN] + [IMG_TOKEN.format(i) for i in range(NUM_IMG_TOKENS)]


def image_comprehension_string(num_tokens: int = NUM_IMG_TOKENS) -> str:
    """'<img><img_00000>...<img_000NN></img>' — the per-image token block."""
    return BOI_TOKEN + "".join(IMG_TOKEN.format(i) for i in range(num_tokens)) + EOI_TOKEN


def load_llama_tokenizer(pretrained_model_name_or_path: str):
    """HF LLaMA tokenizer with the 66 multimodal tokens appended.

    Equivalent of the reference's saved 'cvlm_llama2_tokenizer'. Loads the
    fast (tokenizer.json) implementation when the asset ships one —
    sentencepiece-free — and falls back to the slow sentencepiece
    LlamaTokenizer otherwise. NOTE: the canonical id layout assumes the
    added tokens land at 32000+ in ``special_tokens()`` order; a released
    tokenizer with a different added-token order must go through
    ``tools.convert_torch_weights.added_token_permutation`` when
    converting embeddings.
    """
    import os

    from transformers import AutoTokenizer, LlamaTokenizer

    if os.path.isdir(pretrained_model_name_or_path) and os.path.exists(
        os.path.join(pretrained_model_name_or_path, "tokenizer.json")
    ):
        tok = AutoTokenizer.from_pretrained(
            pretrained_model_name_or_path, use_fast=True
        )
    else:
        try:
            tok = LlamaTokenizer.from_pretrained(pretrained_model_name_or_path)
        except ImportError:
            # transformers' slow LlamaTokenizer hard-requires the
            # sentencepiece C++ library; fall back to the pure-Python
            # implementation (data/spm.py) when only the .model asset is
            # available — same vocab layout, same added-token id rule.
            from .spm import SentencePieceTokenizer

            model_file = pretrained_model_name_or_path
            if os.path.isdir(model_file):
                model_file = os.path.join(model_file, "tokenizer.model")
            if not os.path.exists(model_file):
                raise
            tok = SentencePieceTokenizer(model_file)
    if len(tok) < MULTIMODAL_VOCAB_SIZE:
        tok.add_tokens(special_tokens())
    assert len(tok) == MULTIMODAL_VOCAB_SIZE, len(tok)
    validate_canonical_layout(tok, pretrained_model_name_or_path)
    return tok


def validate_canonical_layout(tok, origin: str = "<tokenizer>") -> None:
    """Assert the 66 multimodal tokens sit at the canonical 32000+ ids.

    A released asset that contains the tokens at OTHER ids (possible via
    the slow sentencepiece path's added_tokens.json order; the fast
    tokenizers re-derive ids so tokenizer.json assets are safe) would pass
    a size check and then silently disagree with the model's embedding
    rows — every BOI/EOI/<img_k> id the pipelines compute would address
    the wrong row."""
    bad = [
        (t, tok.convert_tokens_to_ids(t), LLAMA_VOCAB_SIZE + i)
        for i, t in enumerate(special_tokens())
        if tok.convert_tokens_to_ids(t) != LLAMA_VOCAB_SIZE + i
    ]
    if bad:
        t, got, want = bad[0]
        raise ValueError(
            f"tokenizer at {origin!r} maps "
            f"{t!r} to id {got}, expected {want} (+{len(bad) - 1} more). "
            "Convert the model embeddings with tools.convert_torch_weights "
            "--added_tokens_json <released added_tokens.json> to permute "
            "rows 32000+ into the canonical special_tokens() order, and "
            "re-save the tokenizer in canonical order."
        )


def bert_tokenizer(pretrained_model_name_or_path: str):
    """BERT tokenizer with a '[DEC]' bos (reference
    src/processer/tokenizer.py:4-8 — LAVIS heritage, used by the
    contrastive discrete-model variants)."""
    from transformers import BertTokenizer

    tok = BertTokenizer.from_pretrained(
        pretrained_model_name_or_path=pretrained_model_name_or_path,
        truncation_side="right",
    )
    tok.add_special_tokens({"bos_token": "[DEC]"})
    return tok


_WORD_RE = re.compile(r"<img_\d{5}>|</?img>|\[INST\]|\[/INST\]|[A-Za-z0-9']+|[^\sA-Za-z0-9]")


@dataclass
class TinyTokenizer:
    """Deterministic, dependency-free tokenizer with the LLaMA id layout.

    Words hash into [100, 31999]; specials sit at the canonical multimodal
    ids. bos=1, eos=2, pad=0, unk=3 (llama-compatible ids for bos/eos).
    Only for tests/pico configs — NOT a subword tokenizer.
    """

    bos_token_id: int = 1
    eos_token_id: int = 2
    pad_token_id: int = 0
    unk_token_id: int = 3
    vocab_size: int = MULTIMODAL_VOCAB_SIZE
    _special: dict = field(default_factory=dict)

    def __post_init__(self):
        for i, t in enumerate(special_tokens()):
            self._special[t] = LLAMA_VOCAB_SIZE + i
        self._special["[INST]"] = 29961  # stable ids for the markers
        self._special["[/INST]"] = 29962
        self._inv_special = {v: k for k, v in self._special.items()}

    def _word_id(self, w: str) -> int:
        h = 0
        for ch in w:
            h = (h * 131 + ord(ch)) % (LLAMA_VOCAB_SIZE - 200)
        return 100 + h

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        ids = []
        if add_special_tokens:
            ids.append(self.bos_token_id)
        for w in _WORD_RE.findall(text):
            ids.append(self._special.get(w, self._word_id(w)))
        return ids

    def decode(self, ids, skip_special_tokens: bool = False) -> str:
        out = []
        for i in list(ids):
            i = int(i)
            if i in (self.bos_token_id, self.eos_token_id, self.pad_token_id):
                continue
            if i in self._inv_special:
                if not skip_special_tokens or self._inv_special[i] in ("[INST]", "[/INST]"):
                    out.append(self._inv_special[i])
            else:
                out.append(f"w{i}")
        return " ".join(out)

    def __len__(self):
        return self.vocab_size
