"""Sustained ON-CHIP stage-2 training with kill/resume (VERDICT r3 #2).

Drives the REAL product entry (seed_story_tpu.train.train_clm_sft) on the
TPU at the 1.38B single-chip scale, against real jsonl+jpg data on disk
flowing through the story datapipe + ThreadedLoader:

  phase A (control):      train straight to --steps, log every loss
  phase B (interrupted):  same run, SIGKILL'd mid-flight after the
                          mid-run Orbax checkpoint lands
  phase C (resume):       --resume_from_checkpoint, continue to --steps

Pass criterion: phase C's per-step loss trace matches phase A's exactly
(same data order via the checkpointed pipeline position, same per-step
rng via fold_in(seed, step), bf16 determinism on one chip).

Reference loop being proven: train_clm_sft.py:256-341 (save/load
:256-272,328-330) — whose resume re-shuffles the data unseeded; ours
restores the exact position.

Usage:  python benchmarks/probe_train_onchip_resume.py
        [--steps 60] [--save 25] [--kill-after 40] [--h 2048 --l 24]
"""
import argparse
import json
import os
import re
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

p = argparse.ArgumentParser()
p.add_argument("--steps", type=int, default=60)
p.add_argument("--save", type=int, default=25)
p.add_argument("--kill-after", type=int, default=40,
               help="SIGKILL the interrupted run once this step logs")
p.add_argument("--h", type=int, default=2048)
p.add_argument("--l", type=int, default=24)
p.add_argument("--batch", type=int, default=4)
p.add_argument("--stories", type=int, default=24)
p.add_argument("--vit_width", type=int, default=1024)
p.add_argument("--vit_layers", type=int, default=8)
p.add_argument("--img", type=int, default=224)
p.add_argument("--max_length", type=int, default=1280)
p.add_argument("--story_frames", type=int, default=10)
p.add_argument("--ws", default="/tmp/ss_onchip_train")
args = p.parse_args()

WS = args.ws
inter = max(256, (int(args.h * 2.6875) // 256) * 256)


def build_workspace():
    import numpy as np
    from PIL import Image

    if os.path.isdir(WS):
        shutil.rmtree(WS)
    os.makedirs(f"{WS}/images")
    os.makedirs(f"{WS}/data")
    os.makedirs(f"{WS}/configs")
    rng = np.random.RandomState(0)
    with open(f"{WS}/data/train.jsonl", "w") as f:
        for s in range(args.stories):
            names = []
            for i in range(args.story_frames):  # george_sft.yaml: <=10/story
                name = f"s{s}_{i}.jpg"
                arr = rng.randint(0, 255, (384, 512, 3), dtype=np.uint8)
                Image.fromarray(arr).save(f"{WS}/images/{name}")
                names.append(name)
            f.write(json.dumps({
                "images": names,
                "captions": [f"story {s} scene {i}: george the monkey "
                             f"discovers something number {rng.randint(1000)}"
                             for i in range(args.story_frames)],
            }) + "\n")

    def w(name, text):
        with open(f"{WS}/configs/{name}", "w") as f:
            f.write(text)

    w("tokenizer.yaml", "_target_: seed_story_tpu.data.tokenizer.TinyTokenizer\n")
    w("transform.yaml",
      "_target_: seed_story_tpu.data.transforms.get_transform\n"
      "type: clip\nimage_size: %d\nkeep_ratio: False\n" % args.img)
    # mid-size frozen ViT (the full bigG would dominate this 1.38B probe)
    heads = max(2, args.vit_width // 64)
    w("vit.yaml",
      "_target_: seed_story_tpu.models.vit.ViTConfig\n"
      "image_size: %d\npatch_size: 14\nwidth: %d\nlayers: %d\nheads: %d\n"
      "mlp_ratio: 4.0\nn_queries: 256\noutput_dim: %d\n"
      % (args.img, args.vit_width, args.vit_layers, heads, args.h))
    w("llm.yaml",
      "_target_: seed_story_tpu.models.llama.LlamaConfig\n"
      "vocab_size: 32066\nhidden_size: %d\nintermediate_size: %d\n"
      "num_hidden_layers: %d\nnum_attention_heads: 16\nlora_rank: 16\n"
      "remat: True\nscan_layers: True\n"
      "dtype:\n  _target_: seed_story_tpu.utils.config.resolve_target\n"
      "  path: jax.numpy.bfloat16\n"
      "param_dtype:\n  _target_: seed_story_tpu.utils.config.resolve_target\n"
      "  path: jax.numpy.bfloat16\n" % (args.h, inter, args.l))
    w("agent.yaml",
      "_target_: seed_story_tpu.models.agent.AgentConfig\n"
      "resampler_heads: 16\nvit_dim: %d\n" % args.h)
    w("data.yaml",
      "_target_: seed_story_tpu.data.builders.build_multi_datapipes\n"
      "_recursive_: False\n"
      "datapipes:\n"
      "  - _target_: seed_story_tpu.data.builders.build_long_story_datapipe\n"
      f"    data_dir: {WS}/data\n"
      f"    image_dir: {WS}/images\n"
      "    max_length: %d\n" % args.max_length +
      "    batch_size: %d\n" % args.batch +
      "    instruction_prompt: \"{instruction}\"\n"
      "    min_aspect_ratio: 0.2\n"
      "    min_resolution: 128\n"
      "    num_img_in_tokens: 64\n"
      "    num_img_out_tokens: 64\n"
      "    cycle_count: 100000\n"
      "    story_len: %d\n" % args.story_frames +
      "sample_weights:\n  - 1.0\n")


STEP_RE = re.compile(r"step (\d+)/\d+\s+loss ([0-9.]+)")
RESUME_RE = re.compile(r"resumed from step (\d+)")


def _finalized(out_dir, step):
    """Orbax async saves write <step>.orbax-checkpoint-tmp first and rename
    on finalization — only the plain <step> directory is kill-durable.
    (Round-4 lesson: the 'checkpoint @ step N' log line means QUEUED; at
    1.38B the background write takes minutes on this 1-core host, and a
    SIGKILL before the rename leaves only the tmp dir => resume restarts
    from scratch.)"""
    return os.path.isdir(os.path.join(out_dir, str(step)))


def run_train(out_dir, max_steps, resume=None, kill_after=None, tag=""):
    cfg = f"{WS}/configs"
    cmd = [
        sys.executable, "-m", "seed_story_tpu.train.train_clm_sft",
        "--image_transform", f"{cfg}/transform.yaml",
        "--tokenizer", f"{cfg}/tokenizer.yaml",
        "--visual_encoder", f"{cfg}/vit.yaml",
        "--llm_model", f"{cfg}/llm.yaml",
        "--agent_model", f"{cfg}/agent.yaml",
        "--train_dataset", f"{cfg}/data.yaml",
        "--output_dir", out_dir,
        "--learning_rate", "1e-4",
        "--warmup_steps", "10",
        "--max_steps", str(max_steps),
        "--save_steps", str(args.save),
        "--log_steps", "1",
        "--sharding", "dp",
    ]
    if resume:
        cmd += ["--resume_from_checkpoint", resume]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(cmd, cwd=REPO, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, bufsize=1)
    losses = {}
    saved_steps = []
    killed = False
    resume_start = None
    t0 = time.time()
    for line in proc.stdout:
        sys.stdout.write(f"[{tag}] {line}")
        sys.stdout.flush()
        m = STEP_RE.search(line)
        if m:
            losses[int(m.group(1))] = float(m.group(2))
        ms = re.search(r"checkpoint @ step (\d+)", line)
        if ms:
            saved_steps.append(int(ms.group(1)))
        mr = RESUME_RE.search(line)
        if mr:
            resume_start = int(mr.group(1))
        # kill ONLY once a checkpoint is FINALIZED on disk (async Orbax:
        # the log line means queued; killing mid-write leaves a tmp dir
        # and resume would silently restart from step 0 — which matches
        # the control trace and would fake a pass)
        durable = [s for s in saved_steps if _finalized(out_dir, s)]
        if (kill_after is not None and not killed and m
                and int(m.group(1)) >= kill_after and durable):
            print(f"[{tag}] SIGKILL at step {m.group(1)} "
                  f"(finalized checkpoint {durable[-1]} on disk)", flush=True)
            proc.send_signal(signal.SIGKILL)
            killed = True
    proc.wait()
    dt = time.time() - t0
    if not killed and proc.returncode != 0:
        raise SystemExit(f"[{tag}] train process failed rc={proc.returncode}")
    saved_steps = [s for s in saved_steps if _finalized(out_dir, s)]
    return losses, saved_steps, killed, dt, resume_start


def main():
    build_workspace()
    print(f"workspace: {WS} ({args.stories} stories x {args.story_frames} frames, "
          f"H={args.h} L={args.l} inter={inter} B={args.batch})", flush=True)

    ctrl_dir = f"{WS}/out_control"
    ctrl_losses, _, _, ctrl_dt, _ = run_train(ctrl_dir, args.steps, tag="control")
    n = len(ctrl_losses)
    print(f"control: {n} steps logged in {ctrl_dt:.0f}s", flush=True)

    int_dir = f"{WS}/out_interrupted"
    int_losses, saved, killed, _, _ = run_train(
        int_dir, args.steps, kill_after=args.kill_after, tag="interrupted")
    assert killed, "interrupted run was not killed (finished too fast?)"
    ck = saved[-1]
    print(f"interrupted: killed after step >= {args.kill_after}; "
          f"finalized checkpoint @ {ck}", flush=True)

    res_losses, _, _, res_dt, resume_start = run_train(
        int_dir, args.steps, resume=int_dir, tag="resume")
    # the resume must actually restore (a lost checkpoint would restart at
    # 0 and REPLAY the control trace — indistinguishable by losses alone)
    assert resume_start == ck, (
        f"resume started at {resume_start}, expected checkpoint step {ck}")
    assert res_losses and min(res_losses) > ck, (
        f"resume re-logged steps <= {ck}: it did not continue from the "
        f"checkpoint (first logged step {min(res_losses) if res_losses else None})")

    # pre-kill steps must match control (same data, same rng)
    import numpy as np

    pre = sorted(s for s in int_losses if s in ctrl_losses)
    post = sorted(s for s in res_losses if s in ctrl_losses and s > ck)
    assert post, "resume produced no comparable steps"
    pre_ok = np.allclose([int_losses[s] for s in pre],
                         [ctrl_losses[s] for s in pre], rtol=1e-4, atol=1e-4)
    post_a = np.asarray([res_losses[s] for s in post])
    post_b = np.asarray([ctrl_losses[s] for s in post])
    post_ok = np.allclose(post_a, post_b, rtol=1e-4, atol=1e-4)
    print("boundary trace (step: control / resumed):", flush=True)
    for s in post[:6]:
        print(f"  {s}: {ctrl_losses[s]:.4f} / {res_losses[s]:.4f}", flush=True)
    print(f"pre-kill match: {pre_ok}; post-resume match: {post_ok}; "
          f"max |d| post = {np.abs(post_a - post_b).max():.2e}", flush=True)
    steps_per_s = len(post) / res_dt if res_dt else float("nan")
    print(f"resume phase: {len(res_losses)} steps in {res_dt:.0f}s", flush=True)
    if not (pre_ok and post_ok):
        raise SystemExit("LOSS TRACE MISMATCH — resume is not batch-exact")
    print("ON-CHIP KILL/RESUME: OK (batch-exact continuation)", flush=True)


if __name__ == "__main__":
    main()
