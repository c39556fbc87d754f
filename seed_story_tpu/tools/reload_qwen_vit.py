"""Extract the visual tower from a Qwen-VL-Chat checkpoint.

Equivalent of /root/reference/src/tools/reload_qwen_vit.py: pull the
``transformer.visual.*`` subtree out of the full Qwen-VL-Chat state dict
and convert it into our flax ViT params (one step further than the
reference, which only re-saves the torch subtree as qwen_vit_G.pt).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--qwen_checkpoint", required=True,
                   help="Qwen-VL-Chat pytorch checkpoint (.pt/.bin)")
    p.add_argument("--output", required=True, help="orbax output dir")
    p.add_argument("--torch_output", default=None,
                   help="optionally also write the torch-format qwen_vit_G.pt")
    p.add_argument("--layers", type=int, default=48)
    a = p.parse_args(argv)

    from .convert_torch_weights import convert_qwen_vit, load_torch_state_dict
    from ..train.checkpoint import save_params

    sd = load_torch_state_dict(a.qwen_checkpoint)
    visual = {
        k[len("transformer.visual."):]: v
        for k, v in sd.items()
        if k.startswith("transformer.visual.")
    }
    if not visual:  # already-extracted qwen_vit_G.pt
        visual = sd
    if a.torch_output:
        import torch

        torch.save({k: torch.from_numpy(v) for k, v in visual.items()},
                   a.torch_output)
    params, missing, unexpected = convert_qwen_vit(visual, layers=a.layers)
    print(f"missing keys: {len(missing)}, unexpected keys: {len(unexpected)}")
    save_params(a.output, params)
    print(f"saved to {a.output}")


if __name__ == "__main__":
    main()
