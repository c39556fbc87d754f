"""Config system: YAML files with ``_target_`` keys, hydra-style.

The reference's L0 layer (SURVEY §1) is OmegaConf.load +
hydra.utils.instantiate over YAMLs with dotted ``_target_`` paths
(train_clm_sft.py:179-205). This is a dependency-free reimplementation of
the same surface (PyYAML + importlib):

  * ``load_config(path)`` -> plain dict
  * ``instantiate(cfg, **overrides)`` resolves ``_target_`` recursively;
    ``_recursive_: False`` defers nested instantiation (the reference data
    configs rely on this, configs/data/george_sft.yaml:2)
  * targets resolve against real dotted module paths; a small alias table
    maps the reference's ``src.*`` names onto our modules so the shipped
    YAML surface keeps working
"""

from __future__ import annotations

import importlib
from typing import Any, Dict

import yaml

# reference _target_ names -> our equivalents (API-compat shim)
TARGET_ALIASES: Dict[str, str] = {
    "src.models.qwen_visual.VisionTransformerWithAttnPool.from_pretrained":
        "seed_story_tpu.models.vit.VisionTransformerWithAttnPool",
    "src.models.qwen_visual.Resampler":
        "seed_story_tpu.models.resampler.Resampler",
    "src.models_clm.models.ContinuousLVLM.from_pretrained":
        "seed_story_tpu.models.agent.ContinuousLVLM",
    "src.models_ipa.resampler.ResamplerXLV2":
        "seed_story_tpu.models.ipa_resampler.ResamplerXLV2",
    "src.models_ipa.resampler.ResamplerXL":
        "seed_story_tpu.models.ipa_resampler.ResamplerXL",
    "src.models_ipa.adapter_modules.SDXLAdapter.from_pretrained":
        "seed_story_tpu.models.sdxl.adapter.SDXLAdapter",
    "src.processer.transforms.get_transform":
        "seed_story_tpu.data.transforms.get_transform",
    "src.data.story_telling.build_long_story_datapipe":
        "seed_story_tpu.data.builders.build_long_story_datapipe",
    "src.data.story_telling.build_t2i_datapipe":
        "seed_story_tpu.data.builders.build_t2i_datapipe",
    "src.data.story_telling.build_multi_datapipes":
        "seed_story_tpu.data.builders.build_multi_datapipes",
    "transformers.LlamaTokenizer.from_pretrained":
        "seed_story_tpu.data.tokenizer.load_llama_tokenizer",
    "src.models.discrete_models.DiscreteModleIdentity":
        "seed_story_tpu.models.discrete.DiscreteModelIdentity",
}


def load_config(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def resolve_target(path: str) -> Any:
    path = TARGET_ALIASES.get(path, path)
    parts = path.split(".")
    for split in range(len(parts), 0, -1):
        try:
            module = importlib.import_module(".".join(parts[:split]))
        except ImportError:
            continue
        obj = module
        try:
            for attr in parts[split:]:
                obj = getattr(obj, attr)
        except AttributeError:
            continue
        return obj
    raise ImportError(f"cannot resolve _target_: {path}")


def instantiate(cfg: Any, **overrides) -> Any:
    """hydra.utils.instantiate semantics (subset): dicts with _target_
    become calls; _recursive_: False defers child instantiation."""
    if isinstance(cfg, str):
        cfg = load_config(cfg)
    if not isinstance(cfg, dict) or "_target_" not in cfg:
        return cfg
    cfg = dict(cfg)
    target = resolve_target(cfg.pop("_target_"))
    recursive = cfg.pop("_recursive_", True)
    cfg.pop("_convert_", None)
    kwargs = {}
    for k, v in cfg.items():
        if recursive and isinstance(v, dict) and "_target_" in v:
            kwargs[k] = instantiate(v)
        elif recursive and isinstance(v, list):
            kwargs[k] = [
                instantiate(x) if isinstance(x, dict) and "_target_" in x else x
                for x in v
            ]
        else:
            kwargs[k] = v
    kwargs.update(overrides)
    return target(**kwargs)
