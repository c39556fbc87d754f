"""End-to-end smoke of the gen_george inference CLI on pico configs:
real config YAMLs + val.jsonl + jpgs on disk -> per-story output folders
with subtitled frames and text, in both sequential and batched-serving
modes (reference flow: src/inference/gen_george.py:152-270)."""

import json
import os

import pytest

pytestmark = pytest.mark.slow
from PIL import Image


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    img_dir = root / "images"
    img_dir.mkdir()
    records = []
    for s in range(2):
        name = f"s{s}_0.jpg"
        Image.new("RGB", (256, 256), (s * 90, 60, 120)).save(img_dir / name)
        records.append({
            "images": [name],
            "captions": [f"story {s} begins with a happy dog"],
        })
    with open(root / "val.jsonl", "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")

    cfg = root / "configs"
    cfg.mkdir()

    def w(name, text):
        (cfg / name).write_text(text)

    f32 = ("dtype:\n  _target_: seed_story_tpu.utils.config.resolve_target\n"
           "  path: jax.numpy.float32\n")
    w("tokenizer.yaml", "_target_: seed_story_tpu.data.tokenizer.TinyTokenizer\n")
    w("transform.yaml",
      "_target_: seed_story_tpu.data.transforms.get_transform\n"
      "type: clip\nimage_size: 28\nkeep_ratio: False\n")
    w("vit.yaml",
      "_target_: seed_story_tpu.models.vit.ViTConfig\n"
      "image_size: 28\npatch_size: 14\nwidth: 32\nlayers: 1\nheads: 2\n"
      "mlp_ratio: 2.0\nn_queries: 9\noutput_dim: 64\n" + f32)
    w("llm.yaml",
      "_target_: seed_story_tpu.models.llama.LlamaConfig\n"
      "vocab_size: 32066\nhidden_size: 64\nintermediate_size: 128\n"
      "num_hidden_layers: 1\nnum_attention_heads: 2\nlora_rank: 2\n" + f32)
    w("agent.yaml",
      "_target_: seed_story_tpu.models.agent.AgentConfig\n"
      "input_resampler_grid: 2\noutput_resampler_grid: 3\n"
      "num_img_out_tokens: 4\nresampler_heads: 2\nvit_dim: 64\n")
    w("adapter.yaml",
      "_target_: seed_story_tpu.models.sdxl.adapter.SDXLAdapterConfig\n"
      "resampler_dim: 32\nresampler_depth: 1\nresampler_heads: 2\n"
      "resampler_queries: 4\nembedding_dim: 64\noutput1_dim: 32\noutput2_dim: 64\n"
      "unet:\n"
      "  _target_: seed_story_tpu.models.sdxl.unet.SDXLUNetConfig\n"
      "  block_out_channels: [16, 32, 32]\n"
      "  transformer_layers_per_block: [1, 1, 1]\n"
      "  attention_head_dim: 8\n"
      "  cross_attention_dim: 32\n"
      "  addition_time_embed_dim: 8\n"
      "  projection_class_embeddings_input_dim: 112\n"
      "  pooled_projection_dim: 64\n"
      "  norm_num_groups: 8\n"
      "  dtype:\n    _target_: seed_story_tpu.utils.config.resolve_target\n"
      "    path: jax.numpy.float32\n")
    w("vae.yaml",
      "_target_: seed_story_tpu.models.sdxl.vae.VAEConfig\n"
      "block_out_channels: [16, 32, 32, 32]\n"
      "norm_num_groups: 8\n" + f32)
    return root


def _run(ws, save_dir, extra):
    from seed_story_tpu.inference.gen_george import main

    cfg = ws / "configs"
    argv = [
        "--tokenizer", str(cfg / "tokenizer.yaml"),
        "--image_transform", str(cfg / "transform.yaml"),
        "--visual_encoder", str(cfg / "vit.yaml"),
        "--llm_model", str(cfg / "llm.yaml"),
        "--agent_model", str(cfg / "agent.yaml"),
        "--adapter", str(cfg / "adapter.yaml"),
        "--vae_config", str(cfg / "vae.yaml"),
        "--val_jsonl", str(ws / "val.jsonl"),
        "--image_root", str(ws / "images"),
        "--save_dir", str(save_dir),
        "--story_len", "3",
        "--window_size", "2",
        "--max_new_tokens", "24",
        "--num_inference_steps", "2",
        "--image_size", "32",
        "--force_boi_at", "8",  # untrained weights need the forced <img>
    ] + extra
    main(argv)


def _check_story(folder):
    assert os.path.isfile(os.path.join(folder, "000start_image.jpg"))
    assert os.path.isfile(os.path.join(folder, "text.txt"))
    text = open(os.path.join(folder, "text.txt")).read().strip()
    assert text
    jpgs = [f for f in os.listdir(folder)
            if f.endswith(".jpg") and not f.startswith("000")]
    assert jpgs, os.listdir(folder)  # at least one generated frame


def test_gen_george_cli_sequential(ws, tmp_path):
    # --sdxl_int8: the weight-only int8 UNet de-tokenizer through the
    # product CLI (build_stack quantized-adapter branch)
    out = tmp_path / "out_seq"
    _run(ws, out, ["--max_stories", "1", "--sdxl_int8"])
    _check_story(str(out / "val_0"))


def test_gen_george_cli_sink(ws, tmp_path):
    """--sink: sink-threaded generation (run_sink) through the product CLI
    — KV cache carried across segments, speculative decode composed on top,
    frames + text on disk like the plain flow."""
    out = tmp_path / "out_sink"
    _run(ws, out, ["--max_stories", "1", "--sink", "--speculate_k", "4"])
    _check_story(str(out / "val_0"))


def test_gen_george_cli_batched(ws, tmp_path):
    out = tmp_path / "out_batch"
    _run(ws, out, ["--max_stories", "2", "--batch_stories", "2"])
    _check_story(str(out / "val_0"))
    _check_story(str(out / "val_1"))


def test_gen_george_cli_pipelined_serving(ws, tmp_path):
    """--detok_devices: lockstep decode + SDXL replica pool on the tail
    devices (pipelines/serving.py wired through the product CLI)."""
    out = tmp_path / "out_serving"
    _run(ws, out, ["--max_stories", "2", "--batch_stories", "2",
                   "--detok_devices", "2"])
    _check_story(str(out / "val_0"))
    _check_story(str(out / "val_1"))


def test_gen_george_cli_tp_decode_with_pool(ws, tmp_path):
    """The full multi-chip serving layout through the CLI: tensor-parallel
    decode on the first 2 devices + 4 de-tokenizer replicas on the tail."""
    out = tmp_path / "out_tp_serving"
    _run(ws, out, ["--max_stories", "1", "--decode_tp", "2",
                   "--detok_devices", "4"])
    _check_story(str(out / "val_0"))


def test_vis_george_sink_cli(ws, tmp_path):
    """Sink-cache visualization CLI end to end: ground-truth texts in,
    generated frames out, KV cache threaded across turns."""
    import json

    from seed_story_tpu.inference.vis_george_sink import main

    # visualization needs multi-caption stories
    with open(ws / "vis.jsonl", "w") as f:
        f.write(json.dumps({
            "images": ["s0_0.jpg"],
            "captions": [f"scene {i} of the dog story" for i in range(4)],
        }) + "\n")

    cfg = ws / "configs"
    out = tmp_path / "out_vis"
    argv = [
        "--tokenizer", str(cfg / "tokenizer.yaml"),
        "--image_transform", str(cfg / "transform.yaml"),
        "--visual_encoder", str(cfg / "vit.yaml"),
        "--llm_model", str(cfg / "llm.yaml"),
        "--agent_model", str(cfg / "agent.yaml"),
        "--adapter", str(cfg / "adapter.yaml"),
        "--vae_config", str(cfg / "vae.yaml"),
        "--val_jsonl", str(ws / "vis.jsonl"),
        "--image_root", str(ws / "images"),
        "--save_dir", str(out),
        "--story_len", "4",
        "--window_size", "2",
        "--max_new_tokens", "24",
        "--num_inference_steps", "2",
        "--image_size", "32",
        "--max_stories", "1",
        # untrained weights put near-uniform mass on 32k logits; forcing
        # the image block keeps has_img_output deterministic across
        # separately-jitted (fp-jittered) runs of the same pico model
        "--force_boi_at", "8",
    ]
    main(argv)
    folder = str(out / "val_0")
    jpgs = [f for f in os.listdir(folder) if f.endswith(".jpg")]
    assert jpgs, os.listdir(folder)
    n_lines = len(open(os.path.join(folder, "text.txt")).readlines())

    # pipelined variant: async de-tokenization through a 2-replica pool
    # must produce the same folder surface (ordered text + frames)
    out2 = tmp_path / "out_vis_pool"
    main([a if a != str(out) else str(out2) for a in argv]
         + ["--detok_devices", "2"])
    folder2 = str(out2 / "val_0")
    assert len(open(os.path.join(folder2, "text.txt")).readlines()) == n_lines
    jpgs2 = [f for f in os.listdir(folder2) if f.endswith(".jpg")]
    assert sorted(jpgs2) == sorted(jpgs)

    # TP decode + pooled de-tok: the sink cache threads back through a
    # sharded generator (the full multi-chip vis layout)
    out3 = tmp_path / "out_vis_tp"
    main([a if a != str(out) else str(out3) for a in argv]
         + ["--decode_tp", "2", "--detok_devices", "2"])
    folder3 = str(out3 / "val_0")
    assert os.path.isfile(os.path.join(folder3, "text.txt"))
    assert [f for f in os.listdir(folder3)
            if f.endswith(".jpg") and not f.startswith("000")]
