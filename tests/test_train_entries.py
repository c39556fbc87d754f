"""End-to-end smoke of the three training entry points on pico configs:
real jsonl+jpg data on disk, YAML configs, CLI flags, checkpoint+resume."""

import json
import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ws")
    img_dir = root / "images"
    img_dir.mkdir()
    records = []
    for s in range(3):
        names = []
        for i in range(4):
            name = f"s{s}_{i}.jpg"
            Image.new("RGB", (256, 256), (s * 50, i * 60, 120)).save(img_dir / name)
            names.append(name)
        records.append({
            "images": names,
            "captions": [f"story {s} scene {i} with a happy dog" for i in range(4)],
        })
    (root / "data").mkdir()
    with open(root / "data" / "train.jsonl", "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")

    cfg = root / "configs"
    cfg.mkdir()

    def w(name, text):
        (cfg / name).write_text(text)

    w("tokenizer.yaml", "_target_: seed_story_tpu.data.tokenizer.TinyTokenizer\n")
    w("transform.yaml",
      "_target_: seed_story_tpu.data.transforms.get_transform\n"
      "type: clip\nimage_size: 28\nkeep_ratio: False\n")
    w("sd_transform.yaml",
      "_target_: seed_story_tpu.data.transforms.get_transform\n"
      "type: sd\nimage_size: 32\nkeep_ratio: True\n")
    w("vit.yaml",
      "_target_: seed_story_tpu.models.vit.ViTConfig\n"
      "image_size: 28\npatch_size: 14\nwidth: 32\nlayers: 1\nheads: 2\n"
      "mlp_ratio: 2.0\nn_queries: 9\noutput_dim: 64\n"
      "dtype:\n  _target_: seed_story_tpu.utils.config.resolve_target\n"
      "  path: jax.numpy.float32\n")
    w("llm.yaml",
      "_target_: seed_story_tpu.models.llama.LlamaConfig\n"
      "vocab_size: 32066\nhidden_size: 64\nintermediate_size: 128\n"
      "num_hidden_layers: 1\nnum_attention_heads: 2\nlora_rank: 2\n"
      "dtype:\n  _target_: seed_story_tpu.utils.config.resolve_target\n"
      "  path: jax.numpy.float32\n")
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
      "norm_num_groups: 8\n"
      "dtype:\n  _target_: seed_story_tpu.utils.config.resolve_target\n"
      "  path: jax.numpy.float32\n")
    w("discrete.yaml",
      "_target_: seed_story_tpu.models.discrete.DiscreteModelDistill\n"
      "cfg:\n  _target_: seed_story_tpu.models.discrete.DiscreteConfig\n"
      "  dim: 32\n")
    w("data.yaml",
      "_target_: seed_story_tpu.data.builders.build_multi_datapipes\n"
      "_recursive_: False\n"
      "datapipes:\n"
      "  - _target_: seed_story_tpu.data.builders.build_long_story_datapipe\n"
      f"    data_dir: {root}/data\n"
      f"    image_dir: {root}/images\n"
      "    max_length: 128\n"
      "    batch_size: 2\n"
      "    instruction_prompt: \"{instruction}\"\n"
      "    min_aspect_ratio: 0.2\n"
      "    min_resolution: 64\n"
      "    num_img_in_tokens: 4\n"
      "    num_img_out_tokens: 4\n"
      "    cycle_count: 50\n"
      "    story_len: 4\n"
      "sample_weights:\n  - 1.0\n")
    return root


def test_stage2_entry_runs_and_resumes(workspace):
    from seed_story_tpu.train.train_clm_sft import main

    cfg = workspace / "configs"
    out = workspace / "out_sft"
    argv = [
        "--image_transform", str(cfg / "transform.yaml"),
        "--tokenizer", str(cfg / "tokenizer.yaml"),
        "--visual_encoder", str(cfg / "vit.yaml"),
        "--llm_model", str(cfg / "llm.yaml"),
        "--agent_model", str(cfg / "agent.yaml"),
        "--train_dataset", str(cfg / "data.yaml"),
        "--output_dir", str(out),
        "--learning_rate", "1e-3",
        "--max_steps", "3",
        "--save_steps", "2",
        "--warmup_steps", "1",
        "--sharding", "fsdp",
        "--mesh_data", "2",
        "--profile_start", "1",
        "--profile_stop", "2",
    ]
    state = main(argv)
    assert int(state.step) == 3
    assert (out / "3").exists()  # checkpoint dir
    # the jax.profiler trace window (SURVEY §5.1: absent in the reference,
    # first-class here) produced a capture under output_dir
    import glob

    assert glob.glob(str(out / "plugins" / "profile" / "*")), (
        "profiler trace missing")

    # resume continues from step 3
    state2 = main(argv + ["--resume_from_checkpoint", str(out), "--max_steps", "4"])
    assert int(state2.step) == 4


def test_stage3_entry_runs(workspace):
    from seed_story_tpu.train.train_sdxl_img2img_llm import main

    cfg = workspace / "configs"
    out = workspace / "out_sdxl"
    argv = [
        "--image_transform", str(cfg / "transform.yaml"),
        "--sd_image_transform", str(cfg / "sd_transform.yaml"),
        "--tokenizer", str(cfg / "tokenizer.yaml"),
        "--visual_encoder", str(cfg / "vit.yaml"),
        "--llm_model", str(cfg / "llm.yaml"),
        "--agent_model", str(cfg / "agent.yaml"),
        "--adapter", str(cfg / "adapter.yaml"),
        "--vae", str(cfg / "vae.yaml"),
        "--train_dataset", str(cfg / "data.yaml"),
        "--output_dir", str(out),
        "--max_steps", "2",
        "--save_steps", "2",
        "--warmup_steps", "1",
        "--gradient_accumulation_steps", "1",
        "--sharding", "dp",
        "--mesh_data", "2",
    ]
    state = main(argv)
    assert int(state.step) == 2


def test_stage1_entry_runs(workspace):
    from seed_story_tpu.train.train import main

    cfg = workspace / "configs"
    argv = [
        "--image_transform", str(cfg / "transform.yaml"),
        "--tokenizer", str(cfg / "tokenizer.yaml"),
        "--visual_encoder", str(cfg / "vit.yaml"),
        "--discrete_model", str(cfg / "discrete.yaml"),
        "--train_dataset", str(cfg / "data.yaml"),
        "--output_dir", str(workspace / "out_discrete"),
        "--max_steps", "2",
        "--save_steps", "2",
        "--warmup_steps", "1",
        "--mesh_data", "2",
    ]
    state = main(argv)
    assert int(state.step) == 2


def test_stage3_time_ids_flow_end_to_end(tmp_path):
    """A REAL datapipe batch (non-square jpgs -> keep_ratio sd transform)
    through make_stage3_loss_fn: the batch's time_ids must carry the
    reference's swapped-crop quirk (story_telling.py:429-438 — the
    landscape 640x480 image puts the crop offset in the *y* slot), and the
    UNet must actually consume them (perturbing time_ids changes the loss)."""
    import jax.numpy as jnp
    from PIL import Image as PILImage

    from seed_story_tpu.data.builders import build_long_story_datapipe
    from seed_story_tpu.data.story_telling import flatten_images
    from seed_story_tpu.data.tokenizer import TinyTokenizer
    from seed_story_tpu.data.transforms import get_transform
    from seed_story_tpu.models.agent import AgentConfig, ContinuousLVLM
    from seed_story_tpu.models.sdxl.adapter import SDXLAdapter, SDXLAdapterConfig
    from seed_story_tpu.models.sdxl.vae import AutoencoderKL, VAEConfig
    from seed_story_tpu.train.stage3 import make_stage3_loss_fn

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    names = []
    for i in range(4):
        name = f"s0_{i}.jpg"
        PILImage.new("RGB", (640, 480), (10 * i, 60, 120)).save(img_dir / name)
        names.append(name)
    (tmp_path / "data").mkdir()
    with open(tmp_path / "data" / "train.jsonl", "w") as f:
        f.write(json.dumps({
            "images": names,
            "captions": [f"scene {i} with a dog" for i in range(4)],
        }) + "\n")

    acfg = AgentConfig.tiny()
    pipe = build_long_story_datapipe(
        data_dir=str(tmp_path / "data"), image_dir=str(img_dir),
        tokenizer=TinyTokenizer(), story_len=4, max_length=128, batch_size=2,
        min_resolution=64, min_aspect_ratio=0.2,
        image_transform=get_transform("clip", keep_ratio=False, image_size=32),
        sd_image_transform=get_transform("sd", keep_ratio=True, image_size=64),
        num_img_in_tokens=acfg.num_img_in_tokens,
        num_img_out_tokens=acfg.num_img_out_tokens,
        cycle_count=4,
    )
    batch = flatten_images(next(iter(pipe)))
    # swapped-crop quirk, now asserted on the exact batch the loss consumes
    np.testing.assert_array_equal(
        batch["time_ids"], [[480, 640, 10, 0, 64, 64]] * 2
    )
    assert batch["sd_images"].shape == (2, 3, 64, 64)

    agent = ContinuousLVLM(acfg)
    adapter_cfg = SDXLAdapterConfig.tiny(embedding_dim=acfg.vit_dim)
    adapter = SDXLAdapter(adapter_cfg)
    vae = AutoencoderKL(VAEConfig.tiny())

    n = batch["embeds_gen_mask"].shape[0]
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "images"}
    batch["image_embeds"] = jax.random.normal(
        jax.random.PRNGKey(3), (n, acfg.num_vit_tokens, acfg.vit_dim)
    )

    rng = jax.random.PRNGKey(0)
    agent_params = agent.init(
        rng,
        input_ids=batch["input_ids"], attention_mask=batch["attention_mask"],
        labels=batch["labels"], image_embeds=batch["image_embeds"],
        embeds_gen_mask=batch["embeds_gen_mask"],
        embeds_cmp_mask=batch["embeds_cmp_mask"],
        ids_gen_mask=batch["ids_gen_mask"], ids_cmp_mask=batch["ids_cmp_mask"],
    )["params"]
    sd_nhwc = jnp.transpose(batch["sd_images"], (0, 2, 3, 1))
    vae_params = vae.init(rng, sd_nhwc, rng=rng, method=vae.encode)["params"]
    lat_c = adapter_cfg.unet.in_channels
    adapter_params = adapter.init(
        rng, jnp.zeros((2, 8, 8, lat_c)), jnp.array([1, 2]),
        jnp.zeros((2, acfg.num_vit_tokens, acfg.vit_dim)),
        jnp.ones((2, 6)), jnp.zeros((2, 8, 8, lat_c)),
    )["params"]

    loss_fn = make_stage3_loss_fn(adapter, agent, vae)
    consts = {"agent_params": agent_params, "vae_params": vae_params}
    loss, metrics = loss_fn(adapter_params, batch, jax.random.PRNGKey(7), consts)
    assert np.isfinite(float(loss))

    # time_ids are consumed: a large perturbation moves the loss
    batch2 = dict(batch)
    batch2["time_ids"] = batch["time_ids"] + 4096
    loss2, _ = loss_fn(adapter_params, batch2, jax.random.PRNGKey(7), consts)
    assert abs(float(loss2) - float(loss)) > 1e-6
