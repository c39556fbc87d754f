"""Torch -> flax weight converters for the four checkpoint families.

Covers the reference's pretrained artifacts (README.md:105-133):
  * Qwen ViT-bigG  (pretrained/visual_tokenizer/qwen_vit_G.pt —
    extracted by tools/reload_qwen_vit.py, as in the reference)
  * LLaMA-2-7B HF + PEFT LoRA adapters (llama2chat7b_lora.yaml)
  * SEED agent bins (agent_7b_sft.yaml: input/output resamplers + llm)
  * SDXL base UNet/VAE + the de-tokenizer adapter bin

Layout rules:
  torch Linear weight (out,in)    -> flax Dense kernel (in,out):  w.T
  torch Conv2d weight (o,i,kh,kw) -> flax Conv kernel (kh,kw,i,o)
  torch (Group|Layer)Norm weight  -> flax scale
  nn.MultiheadAttention in_proj_weight stays (3E,E) — our
    MultiheadAttention stores the torch layout verbatim.

Each converter takes a flat {name: np.ndarray} state dict and returns
(flax_params, missing, unexpected) with strict=False semantics.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np


Array = np.ndarray
StateDict = Dict[str, Array]


def _t(w: Array) -> Array:  # Linear
    return np.ascontiguousarray(w.T)


def _conv(w: Array) -> Array:  # Conv2d
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


class _Builder:
    def __init__(self, sd: StateDict):
        self.sd = dict(sd)
        self.out: Dict = {}
        self.missing: List[str] = []

    def take(self, key: str, transform=None):
        if key not in self.sd:
            self.missing.append(key)
            return None
        v = np.asarray(self.sd.pop(key))
        return transform(v) if transform else v

    def set(self, path: str, value):
        if value is None:
            return
        node = self.out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def linear(self, torch_prefix: str, flax_path: str, bias: bool = True):
        self.set(flax_path + "/kernel", self.take(torch_prefix + ".weight", _t))
        if bias and torch_prefix + ".bias" in self.sd:
            self.set(flax_path + "/bias", self.take(torch_prefix + ".bias"))

    def norm(self, torch_prefix: str, flax_path: str, scale_name="scale"):
        self.set(flax_path + f"/{scale_name}", self.take(torch_prefix + ".weight"))
        if torch_prefix + ".bias" in self.sd:
            self.set(flax_path + "/bias", self.take(torch_prefix + ".bias"))

    def done(self) -> Tuple[Dict, List[str], List[str]]:
        return self.out, self.missing, sorted(self.sd.keys())


# ---------------------------------------------------------------------
# Qwen ViT (reference src/models/qwen_visual.py state dict)
# ---------------------------------------------------------------------


def convert_qwen_vit(sd: StateDict, layers: int = 48):
    b = _Builder(sd)
    b.set("conv1/kernel", b.take("conv1.weight", _conv))
    b.set("positional_embedding", b.take("positional_embedding"))
    b.norm("ln_pre", "ln_pre")
    b.norm("ln_post", "ln_post")
    b.set("proj", b.take("proj"))
    for i in range(layers):
        tp = f"transformer.resblocks.{i}"
        fp = f"blocks_{i}"
        b.norm(f"{tp}.ln_1", f"{fp}/ln_1")
        b.norm(f"{tp}.ln_2", f"{fp}/ln_2")
        b.linear(f"{tp}.attn.in_proj", f"{fp}/attn/in_proj")
        b.linear(f"{tp}.attn.out_proj", f"{fp}/attn/out_proj")
        b.linear(f"{tp}.mlp.c_fc", f"{fp}/c_fc")
        b.linear(f"{tp}.mlp.c_proj", f"{fp}/c_proj")
    # attention pool (qwen Resampler)
    b.set("attn_pool/query", b.take("attn_pool.query"))
    b.linear("attn_pool.kv_proj", "attn_pool/kv_proj", bias=False)
    b.norm("attn_pool.ln_q", "attn_pool/ln_q")
    b.norm("attn_pool.ln_kv", "attn_pool/ln_kv")
    b.set("attn_pool/attn/in_proj_weight", b.take("attn_pool.attn.in_proj_weight"))
    b.set("attn_pool/attn/in_proj_bias", b.take("attn_pool.attn.in_proj_bias"))
    b.linear("attn_pool.attn.out_proj", "attn_pool/attn/out_proj")
    b.take("attn_pool.pos_embed")  # frozen sincos — computed, not a param
    return b.done()


# ---------------------------------------------------------------------
# LLaMA (HF base + optional PEFT LoRA + resized embeddings)
# ---------------------------------------------------------------------


def convert_llama(sd: StateDict, num_layers: int = 32,
                  vocab_padded: int = 32128, added_tokens=None):
    """HF LlamaForCausalLM state dict -> our LlamaForCausalLM params.
    Handles PEFT-wrapped keys (base_model.model. prefix, lora_A/B,
    modules_to_save incl. the redundant original_module copies)
    transparently. ``added_tokens`` ({token: released_id}, the released
    tokenizer's added_tokens.json) reorders embed/lm_head rows from a
    shuffled released added-token order to the canonical 32000+ layout."""
    # normalize PEFT prefixes; drop the frozen original_module duplicates
    # that PEFT keeps alongside every modules_to_save trained copy
    norm_sd: StateDict = {}
    for k, v in sd.items():
        if ".original_module." in k:
            continue
        k = k.replace("base_model.model.", "")
        k = k.replace(".base_layer.weight", ".weight")  # peft >= 0.7 wrapping
        k = k.replace(".default.weight", ".weight")  # lora_A.default.weight
        k = k.replace(".modules_to_save.weight", ".weight")
        # modules_to_save duplicates originals; prefer the trained copy
        norm_sd[k] = v
    b = _Builder(norm_sd)
    perm = added_token_permutation(added_tokens) if added_tokens else None

    def pad_vocab(w):
        w = np.asarray(w)
        if perm is not None and w.shape[0] >= perm.shape[0]:
            w = remap_embedding_rows(w, perm)
        if w.shape[0] < vocab_padded:
            w = np.concatenate(
                [w, np.zeros((vocab_padded - w.shape[0],) + w.shape[1:], w.dtype)]
            )
        return w

    b.set("model/embed_tokens/embedding",
          b.take("model.embed_tokens.weight", pad_vocab))
    b.set("lm_head/kernel", b.take("lm_head.weight", lambda w: _t(pad_vocab(w))))
    b.norm("model.norm", "model/norm", scale_name="weight")
    for i in range(num_layers):
        tp = f"model.layers.{i}"
        fp = f"model/layers_{i}"
        b.norm(f"{tp}.input_layernorm", f"{fp}/input_layernorm", scale_name="weight")
        b.norm(f"{tp}.post_attention_layernorm", f"{fp}/post_attention_layernorm",
               scale_name="weight")
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            b.linear(f"{tp}.self_attn.{proj}", f"{fp}/self_attn/{proj}", bias=False)
            b.set(f"{fp}/self_attn/{proj}/lora_a",
                  b.take(f"{tp}.self_attn.{proj}.lora_A.weight", _t)
                  if f"{tp}.self_attn.{proj}.lora_A.weight" in b.sd else None)
            b.set(f"{fp}/self_attn/{proj}/lora_b",
                  b.take(f"{tp}.self_attn.{proj}.lora_B.weight", _t)
                  if f"{tp}.self_attn.{proj}.lora_B.weight" in b.sd else None)
        for proj in ("gate_proj", "up_proj", "down_proj"):
            b.linear(f"{tp}.mlp.{proj}", f"{fp}/mlp/{proj}", bias=False)
            b.set(f"{fp}/mlp/{proj}/lora_a",
                  b.take(f"{tp}.mlp.{proj}.lora_A.weight", _t)
                  if f"{tp}.mlp.{proj}.lora_A.weight" in b.sd else None)
            b.set(f"{fp}/mlp/{proj}/lora_b",
                  b.take(f"{tp}.mlp.{proj}.lora_B.weight", _t)
                  if f"{tp}.mlp.{proj}.lora_B.weight" in b.sd else None)
    return b.done()


def convert_qwen_resampler(sd: StateDict, prefix: str = ""):
    """The agent's input/output Resampler (qwen style)."""
    b = _Builder({k[len(prefix):]: v for k, v in sd.items()
                  if k.startswith(prefix)})
    b.set("query", b.take("query"))
    if prefix + "kv_proj.weight" in sd:
        # kv_proj exists only when kv_dim != embed_dim (qwen_visual.py:108);
        # the 7B agent resamplers are 4096->4096 and have none
        b.linear("kv_proj", "kv_proj", bias=False)
    b.norm("ln_q", "ln_q")
    b.norm("ln_kv", "ln_kv")
    b.set("attn/in_proj_weight", b.take("attn.in_proj_weight"))
    b.set("attn/in_proj_bias", b.take("attn.in_proj_bias"))
    b.linear("attn.out_proj", "attn/out_proj")
    b.take("pos_embed")
    return b.done()


def convert_agent(sd: StateDict, num_layers: int = 32, added_tokens=None):
    """SEED agent bin (the consolidated ``pytorch_model.bin`` the README
    points stage 3 at, README.md:120-128): llm.* (PEFT LLaMA) +
    input/output_resampler.*."""
    out: Dict = {}
    missing: List[str] = []
    unexpected: List[str] = []
    llm_sd = {k[len("llm."):]: v for k, v in sd.items() if k.startswith("llm.")}
    if llm_sd:
        p, m, u = convert_llama(llm_sd, num_layers=num_layers,
                                added_tokens=added_tokens)
        out["llm"] = p
        missing += [f"llm.{k}" for k in m]
        unexpected += [f"llm.{k}" for k in u]
    for name in ("input_resampler", "output_resampler"):
        sub = {k: v for k, v in sd.items() if k.startswith(name + ".")}
        if sub:
            p, m, u = convert_qwen_resampler(sub, prefix=name + ".")
            out[name] = p
            missing += [f"{name}.{k}" for k in m]
            unexpected += [f"{name}.{k}" for k in u]
    return out, missing, unexpected


# ---------------------------------------------------------------------
# SDXL UNet / VAE (diffusers state dicts)
# ---------------------------------------------------------------------

def _diffusers_path(key: str) -> Tuple[str, str]:
    """dotted diffusers module path -> (flax path, leaf). Handles the
    block-list flattening our modules use."""
    name = re.sub(r"\.(\d+)", r"_\1", key)  # every ".N" index -> "_N"
    segs = name.split(".")
    leaf = segs.pop()  # weight | bias | latents | positional_embedding ...
    out: List[str] = []
    i = 0
    while i < len(segs):
        s = segs[i]
        # block-level flattening: down_blocks_0 + resnets_1 -> one name;
        # mid_block + resnets_0 -> mid_block_resnets_0
        if (re.fullmatch(r"(down_blocks|up_blocks)_\d+", s) or s == "mid_block") \
                and i + 1 < len(segs):
            out.append(s + "_" + segs[i + 1])
            i += 2
            continue
        if s == "ff" and i + 1 < len(segs) and segs[i + 1] == "net_0":
            # GEGLU: ff.net.0.proj -> ff/net_0_proj
            out.append("ff")
            out.append("net_0_proj")
            i += 3  # skips 'net_0' and 'proj'
            continue
        out.append(s)
        i += 1
    return "/".join(out), leaf


def _convert_diffusers(sd: StateDict, path_fixup=None):
    out: Dict = {}
    unexpected: List[str] = []

    def put(flax_path: str, value):
        node = out
        parts = flax_path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    for key, v in sd.items():
        v = np.asarray(v)
        fpath, leaf = _diffusers_path(key)
        if path_fixup:
            fpath = path_fixup(fpath)
        if leaf == "weight":
            if v.ndim == 4:
                put(fpath + "/kernel", _conv(v))
            elif v.ndim == 2:
                put(fpath + "/kernel", _t(v))
            else:  # 1-D: Group/LayerNorm scale
                put(fpath + "/scale", v)
        elif leaf == "bias":
            put(fpath + "/bias", v)
        else:
            put((fpath + "/" if fpath else "") + leaf, v)
    return out, [], unexpected


def convert_sdxl_unet(sd: StateDict):
    """diffusers UNet2DConditionModel state dict -> our UNet params."""
    return _convert_diffusers(sd)


def convert_sdxl_vae(sd: StateDict):
    """diffusers AutoencoderKL state dict -> our VAE params."""

    def fixup(p: str) -> str:
        # our VAE flattens the down/up-sampler conv into one module name
        p = re.sub(r"(downsamplers_\d+)/conv", r"\1_conv", p)
        p = re.sub(r"(upsamplers_\d+)/conv", r"\1_conv", p)
        # diffusers vae attention to_out.0 -> to_out_0 handled by index rule
        return p

    return _convert_diffusers(sd, path_fixup=fixup)


def convert_ipa_resampler(sd: StateDict) -> Dict:
    """open-flamingo-style perceiver Resampler state dict (the
    models_ipa/resampler.py families: the detokenizer's ResamplerXL(V2)
    and the IP-Adapter's image_proj_model) -> our ipa_resampler params."""
    res: Dict = {}

    def put(path, value):
        node = res
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    for k, v in sd.items():
        v = np.asarray(v)
        m = re.match(r"layers\.(\d+)\.(\d+)\.(.*)", k)
        if m:
            i, which, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            if which == 0:  # PerceiverAttention
                base = f"layers_{i}_attn"
                name, leaf = rest.rsplit(".", 1)
                if leaf == "weight" and v.ndim == 2:
                    put(f"{base}/{name}/kernel", _t(v))
                elif leaf == "weight":
                    put(f"{base}/{name}/scale", v)
                else:
                    put(f"{base}/{name}/bias", v)
            else:  # FeedForward Sequential: 0=LN, 1=fc1, 3=fc2
                idx, leaf = rest.split(".")
                name = {"0": "norm", "1": "fc1", "3": "fc2"}[idx]
                base = f"layers_{i}_ff"
                if leaf == "weight" and v.ndim == 2:
                    put(f"{base}/{name}/kernel", _t(v))
                elif leaf == "weight":
                    put(f"{base}/{name}/scale", v)
                else:
                    put(f"{base}/{name}/bias", v)
            continue
        if k == "latents":
            put("latents", v)
        elif k.startswith(("proj_in.", "proj_out.")):
            name = k.split(".")[0]
            put(f"{name}/kernel" if k.endswith("weight") else f"{name}/bias",
                _t(v) if k.endswith("weight") else v)
        elif k.startswith("norm_out."):
            put("norm_out/scale" if k.endswith("weight") else "norm_out/bias", v)
        elif k.startswith(("unet_proj_1.", "unet_proj_2.")):
            name = k.split(".")[0]
            put(f"{name}/kernel" if k.endswith("weight") else f"{name}/bias",
                _t(v) if k.endswith("weight") else v)
        elif k.startswith("unet_attnpool."):
            sub = k[len("unet_attnpool."):]
            if sub == "positional_embedding":
                put("unet_attnpool/positional_embedding", v)
            else:
                name, leaf = sub.rsplit(".", 1)
                put(f"unet_attnpool/attn/{name}/" +
                    ("kernel" if leaf == "weight" else "bias"),
                    _t(v) if leaf == "weight" else v)
    return res


def convert_detokenizer(sd: StateDict):
    """SDXLAdapter bin (reference detokenizer checkpoints): resampler.* +
    unet.* -> {'resampler': ..., 'unet': ...}."""
    out: Dict = {}
    unet_sd = {k[len("unet."):]: v for k, v in sd.items() if k.startswith("unet.")}
    if unet_sd:
        out["unet"], _, _ = convert_sdxl_unet(unet_sd)
    res = convert_ipa_resampler(
        {k[len("resampler."):]: v for k, v in sd.items()
         if k.startswith("resampler.")}
    )
    if res:
        out["resampler"] = res
    return out, [], []


# ---------------------------------------------------------------------
# Released legacy layouts
# ---------------------------------------------------------------------


def remap_stage1_yuying(sd: StateDict) -> StateDict:
    """Legacy BLIP2-style stage-1 checkpoint -> the canonical reference
    discrete-model layout (the key remap of
    /root/reference/src/models/discrete_models.py:427-454,
    ``from_pretrained_stage1_yuying``): the bin is ``{'model': {...}}``
    with ``query_tokens`` / ``ln_vision.*`` / ``Qformer.*`` keys."""
    if "model" in sd and not any("." in k for k in sd if k != "model"):
        inner = sd["model"]
        if isinstance(inner, dict):
            sd = inner
    out: StateDict = {}
    if "query_tokens" in sd:
        out["qformer.embed_module.query"] = np.squeeze(
            np.asarray(sd["query_tokens"]), axis=0
        )
    if "ln_vision.weight" in sd:
        out["qformer.norm.weight"] = np.asarray(sd["ln_vision.weight"])
    if "ln_vision.bias" in sd:
        out["qformer.norm.bias"] = np.asarray(sd["ln_vision.bias"])
    for key, v in sd.items():
        if key.startswith("Qformer"):
            out[key.replace("Qformer", "qformer.perceiver")] = np.asarray(v)
    return out


def split_ip_adapter_legacy(sd: StateDict) -> Tuple[StateDict, StateDict]:
    """Legacy IP-Adapter bin -> (image_proj sd, ip_layers sd) — the split
    of /root/reference/src/models_ipa/adapter_modules.py:116-137
    (``from_pretrained_legacy``): ``image_proj_model.*`` keys feed the
    perceiver resampler, ``adapter_modules.*`` keys feed the decoupled
    to_k_ip/to_v_ip attention layers."""
    image_proj: StateDict = {}
    ip_layers: StateDict = {}
    for key, v in sd.items():
        if key.startswith("image_proj_model."):
            image_proj[key[len("image_proj_model."):]] = v
        elif key.startswith("adapter_modules."):
            ip_layers[key[len("adapter_modules."):]] = v
    return image_proj, ip_layers


def convert_ip_adapter_legacy(sd: StateDict):
    """Legacy IP-Adapter bin -> {'image_proj_model': ..., 'ip_layers':
    {'layers_<i>': {'to_k_ip'/'to_v_ip': {'kernel': ...}}}} in our
    IPCrossAttention naming. Returns (params, missing, unexpected)."""
    proj_sd, ip_sd = split_ip_adapter_legacy(sd)
    out: Dict = {}
    unexpected: List[str] = []
    if proj_sd:
        out["image_proj_model"] = convert_ipa_resampler(proj_sd)
    layers: Dict = {}
    for key, v in ip_sd.items():
        m = re.fullmatch(r"(\d+)\.(to_[kv]_ip)\.weight", key)
        if m is None:
            unexpected.append(f"adapter_modules.{key}")
            continue
        layers.setdefault(f"layers_{int(m.group(1))}", {})[m.group(2)] = {
            "kernel": _t(np.asarray(v))
        }
    if layers:
        out["ip_layers"] = layers
    return out, [], unexpected


def added_token_permutation(added_tokens: Dict[str, int]) -> np.ndarray:
    """Row permutation fixing a released tokenizer whose ADDED tokens were
    saved in a different order than the canonical layout (module docstring
    of data/tokenizer.py): returns ``perm`` with ``perm[canonical_id] =
    released_id`` over the full 32066 vocab, identity on the base 32000.
    Apply to embeddings/lm_head rows: ``w_canonical = w_released[perm]``.

    ``added_tokens`` is the released added_tokens.json mapping
    {token: released_id}; must cover exactly the 66 multimodal tokens."""
    from ..data.tokenizer import LLAMA_VOCAB_SIZE, special_tokens

    specials = special_tokens()
    if sorted(added_tokens) != sorted(specials):
        extra = sorted(set(added_tokens) - set(specials))
        miss = sorted(set(specials) - set(added_tokens))
        raise ValueError(
            f"added-token set mismatch: unexpected {extra}, missing {miss}"
        )
    perm = np.arange(LLAMA_VOCAB_SIZE + len(specials))
    for i, tok in enumerate(specials):
        perm[LLAMA_VOCAB_SIZE + i] = added_tokens[tok]
    return perm


def remap_embedding_rows(w: Array, perm: np.ndarray) -> Array:
    """Reorder vocab rows (embed_tokens / lm_head pre-transpose) from the
    released added-token order to the canonical layout. Rows past the true
    vocab (padding to vocab_padded) are untouched."""
    w = np.asarray(w)
    out = w.copy()
    n = perm.shape[0]
    out[:n] = w[perm]
    return out


# ---------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------


def load_torch_state_dict(path: str) -> StateDict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def main(argv=None):
    import argparse

    from ..train.checkpoint import save_params

    p = argparse.ArgumentParser()
    p.add_argument("--family", required=True,
                   choices=["qwen_vit", "llama", "agent", "sdxl_unet",
                            "sdxl_vae", "detokenizer"])
    p.add_argument("--input", required=True, help=".pt/.bin torch checkpoint")
    p.add_argument("--output", required=True, help="orbax output dir")
    p.add_argument("--num_layers", type=int, default=None)
    p.add_argument("--scan_layers", action="store_true",
                   help="emit the stacked (L, ...) scan_layers training "
                        "layout (llama/agent families)")
    p.add_argument("--int8", action="store_true",
                   help="weight-only int8 projection kernels "
                        "(quantize_llama_params; llama/agent families)")
    p.add_argument("--added_tokens_json", default=None,
                   help="released tokenizer's added_tokens.json; if its 66 "
                        "multimodal tokens were saved in a different order "
                        "than special_tokens(), embed/lm_head rows 32000+ "
                        "are permuted to the canonical layout "
                        "(llama/agent families)")
    a = p.parse_args(argv)

    added_tokens = None
    if a.added_tokens_json:
        import json

        if a.family not in ("llama", "agent"):
            p.error("--added_tokens_json applies to the llama/agent families")
        with open(a.added_tokens_json) as f:
            added_tokens = json.load(f)

    sd = load_torch_state_dict(a.input)
    conv = {
        "qwen_vit": lambda: convert_qwen_vit(sd, layers=a.num_layers or 48),
        "llama": lambda: convert_llama(sd, num_layers=a.num_layers or 32,
                                       added_tokens=added_tokens),
        "agent": lambda: convert_agent(sd, num_layers=a.num_layers or 32,
                                       added_tokens=added_tokens),
        "sdxl_unet": lambda: convert_sdxl_unet(sd),
        "sdxl_vae": lambda: convert_sdxl_vae(sd),
        "detokenizer": lambda: convert_detokenizer(sd),
    }[a.family]
    params, missing, unexpected = conv()
    print(f"missing keys: {len(missing)}, unexpected keys: {len(unexpected)}")
    if a.int8:
        if a.family not in ("llama", "agent"):
            p.error("--int8 applies to the llama/agent families")
        import jax

        from ..models.llama import quantize_llama_params

        params = jax.tree_util.tree_map(np.asarray,
                                        quantize_llama_params(params))
    if a.scan_layers:
        if a.family not in ("llama", "agent"):
            p.error("--scan_layers applies to the llama/agent families")
        from ..models.llama import stack_layer_params

        params = stack_layer_params(params)
    save_params(a.output, params)
    print(f"saved to {a.output}")


if __name__ == "__main__":
    main()
