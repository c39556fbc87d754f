"""Golden tests for the story decoder mask construction.

Checks the exact invariants of the reference decoder
(/root/reference/src/data/story_telling.py:390-557): span placement of
ids_cmp/gen masks, label masking, padding, embeds masks, drop-on-overflow.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from seed_story_tpu.data.datapipes import JsonlStoryDataset, batched, sample_multiplexer
from seed_story_tpu.data.story_telling import (
    IGNORE_INDEX,
    StoryDecodeConfig,
    collate,
    decode_long_story_sample,
    decode_t2i_sample,
    flatten_images,
)
from seed_story_tpu.data.tokenizer import (
    BOI_TOKEN_ID,
    EOI_TOKEN_ID,
    FIRST_IMG_TOKEN_ID,
    TinyTokenizer,
    image_comprehension_string,
)
from seed_story_tpu.data.transforms import get_transform


@pytest.fixture(scope="module")
def story_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("story")
    img_dir = root / "images"
    img_dir.mkdir()
    records = []
    for s in range(3):
        names = []
        for i in range(5):
            name = f"s{s}_{i}.jpg"
            Image.new("RGB", (640, 480), (s * 40, i * 40, 100)).save(img_dir / name)
            names.append(name)
        records.append({"images": names, "captions": [f"story {s} frame {i} caption" for i in range(5)]})
    with open(root / "train.jsonl", "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return root


def _cfg(**kw):
    base = dict(
        story_len=5, max_length=256, max_images=5,
        num_img_in_tokens=8, num_img_out_tokens=8, image_size=32, sd_image_size=64,
    )
    base.update(kw)
    return StoryDecodeConfig(**base)


def test_long_story_masks(story_dir):
    tok = TinyTokenizer()
    cfg = _cfg()
    record = json.loads(open(story_dir / "train.jsonl").readline())
    sample = decode_long_story_sample(
        record,
        image_dir=str(story_dir / "images"),
        tokenizer=tok,
        cfg=cfg,
        image_transform=get_transform("clip", keep_ratio=False, image_size=32),
        sd_image_transform=get_transform("sd", keep_ratio=True, image_size=64),
        num_image_given=2,
    )
    assert sample is not None
    ids = sample["input_ids"]
    n_img_slots = 8

    boi = np.where(ids == BOI_TOKEN_ID)[0]
    eoi = np.where(ids == EOI_TOKEN_ID)[0]
    assert len(boi) == len(eoi) == 4  # 3 context + 1 target

    # every <img> block is exactly boi, 8 img tokens, eoi
    for b, e in zip(boi, eoi):
        assert e - b == n_img_slots + 1
        np.testing.assert_array_equal(
            ids[b + 1 : e], np.arange(FIRST_IMG_TOKEN_ID, FIRST_IMG_TOKEN_ID + n_img_slots)
        )

    # cmp mask: slots of the first 3 images; gen: slots of the last
    cmp_expected = np.zeros_like(sample["ids_cmp_mask"])
    for i in range(3):
        cmp_expected[boi[i] + 1 : eoi[i]] = True
    np.testing.assert_array_equal(sample["ids_cmp_mask"], cmp_expected)
    gen_expected = np.zeros_like(sample["ids_gen_mask"])
    gen_expected[boi[3] + 1 : eoi[3]] = True
    np.testing.assert_array_equal(sample["ids_gen_mask"], gen_expected)

    # labels: -100 on bos, instruction span, image-token spans (incl. eoi of
    # the gen block), supervised elsewhere in the response
    labels = sample["labels"]
    assert labels[0] == IGNORE_INDEX
    assert (labels[boi[3] + 1 : eoi[3] + 1] == IGNORE_INDEX).all()
    # the response text ("[INST] cap3 ...") is supervised:
    resp_region = labels[eoi[2] + 1 : boi[3]]
    assert (resp_region != IGNORE_INDEX).any()
    # instruction region fully ignored
    assert (labels[: eoi[2] + 1] == IGNORE_INDEX).all()
    # eos supervised at the end of the real sequence
    seq_len = int(sample["attention_mask"].sum())
    assert ids[seq_len - 1] == tok.eos_token_id
    assert labels[seq_len - 1] == tok.eos_token_id
    # padding
    assert (ids[seq_len:] == tok.pad_token_id).all()
    assert (labels[seq_len:] == IGNORE_INDEX).all()

    # embeds masks: 3 cmp, 1 gen, rest padding
    np.testing.assert_array_equal(sample["embeds_cmp_mask"], [True, True, True, False, False])
    np.testing.assert_array_equal(sample["embeds_gen_mask"], [False, False, False, True, False])
    assert sample["images"].shape == (5, 3, 32, 32)
    # padded image slots are zero
    assert (sample["images"][4] == 0).all()
    assert sample["sd_images"].shape == (3, 64, 64)
    # NB: crop coords follow the reference exactly, including its swapped
    # (target_width, target_height) unpacking (story_telling.py:434-436) —
    # for this landscape image the y-offset carries the crop: (85-64)//2=10.
    np.testing.assert_array_equal(sample["time_ids"], [480, 640, 10, 0, 64, 64])


def test_num_image_given_zero(story_dir):
    tok = TinyTokenizer()
    record = json.loads(open(story_dir / "train.jsonl").readline())
    sample = decode_long_story_sample(
        record, image_dir=str(story_dir / "images"), tokenizer=tok, cfg=_cfg(),
        image_transform=get_transform("clip", keep_ratio=False, image_size=32),
        num_image_given=0,
    )
    assert sample["embeds_cmp_mask"].sum() == 1
    assert sample["embeds_gen_mask"].sum() == 1
    assert sample["ids_cmp_mask"].sum() == 8
    assert sample["ids_gen_mask"].sum() == 8


def test_overflow_dropped(story_dir):
    tok = TinyTokenizer()
    record = json.loads(open(story_dir / "train.jsonl").readline())
    sample = decode_long_story_sample(
        record, image_dir=str(story_dir / "images"), tokenizer=tok,
        cfg=_cfg(max_length=16), num_image_given=2,
    )
    assert sample is None


def test_t2i_sample(story_dir):
    tok = TinyTokenizer()
    sample = decode_t2i_sample(
        {"image": "s0_0.jpg", "caption": "a red fox"},
        image_dir=str(story_dir / "images"), tokenizer=tok, cfg=_cfg(),
        image_transform=get_transform("clip", keep_ratio=False, image_size=32),
    )
    assert sample is not None
    assert sample["ids_cmp_mask"].sum() == 0
    assert sample["ids_gen_mask"].sum() == 8
    np.testing.assert_array_equal(sample["embeds_gen_mask"], [True, False, False, False, False])


def test_pipeline_batching(story_dir):
    tok = TinyTokenizer()
    cfg = _cfg()

    def decode(rec):
        return decode_long_story_sample(
            rec, image_dir=str(story_dir / "images"), tokenizer=tok, cfg=cfg,
            image_transform=get_transform("clip", keep_ratio=False, image_size=32),
        )

    ds = JsonlStoryDataset(
        str(story_dir), decode, cycle_count=2, seed=7, host_index=0, host_count=1
    )
    batches = []
    it = batched(iter(ds), batch_size=2)
    for _ in range(2):
        batches.append(next(it))
    b = batches[0]
    assert b["input_ids"].shape == (2, 256)
    assert b["images"].shape == (2, 5, 3, 32, 32)
    flat = flatten_images(b)
    assert flat["images"].shape == (10, 3, 32, 32)
    assert flat["embeds_cmp_mask"].shape == (10,)

    # determinism: same seed -> same first batch
    ds2 = JsonlStoryDataset(
        str(story_dir), decode, cycle_count=2, seed=7, host_index=0, host_count=1
    )
    # NB decode uses global random for num_image_given; pin it for determinism
    import random as _r
    _r.seed(0)
    b1 = next(batched(iter(ds), 2))
    _r.seed(0)
    b2 = next(batched(iter(ds2), 2))
    np.testing.assert_array_equal(b1["input_ids"], b2["input_ids"])


def test_host_sharding_disjoint(story_dir):
    tok = TinyTokenizer()
    cfg = _cfg()

    def decode(rec):
        return {"key": np.array([hash(rec["captions"][0]) % 1000], np.int64),
                "input_ids": np.zeros(4, np.int32)}

    files_seen = []
    for host in range(2):
        ds = JsonlStoryDataset(
            str(story_dir), decode, cycle_count=1, seed=3, host_index=host, host_count=2
        )
        files_seen.append(ds._file_stream(epoch=0))
    # one file only -> exactly one host gets it per cycle slot
    assert len(files_seen[0]) + len(files_seen[1]) == 1


def test_multiplexer_weights():
    a = [{"x": np.array([0])}] * 50
    b = [{"x": np.array([1])}] * 50
    out = list(sample_multiplexer([a, b], weights=[0.9, 0.1], seed=0))
    assert len(out) == 100
    xs = np.concatenate([o["x"] for o in out[:30]])
    assert (xs == 0).sum() > (xs == 1).sum()


def test_tar_loader_warn_and_skip(tmp_path):
    """Corrupt tar shards abort with a warning, never the pipeline
    (reference TarArchiveLoaderWoException, datapipes.py:15-45)."""
    import tarfile
    import io
    import warnings

    from seed_story_tpu.data.datapipes import iter_tar_members, list_tar_files

    good = tmp_path / "good.tar"
    with tarfile.open(good, "w") as tar:
        for name, payload in [("a.txt", b"hello"), ("b/c.json", b"{}")]:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tar.addfile(info, io.BytesIO(payload))
    bad = tmp_path / "bad.tar"
    bad.write_bytes(b"this is not a tar archive at all" * 10)

    assert list_tar_files(str(tmp_path)) == [str(bad), str(good)]

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = list(iter_tar_members([str(bad), str(good)]))
    assert any("corrupted tarfile" in str(x.message) for x in w)
    names = [n for n, _ in out]
    assert names == [str(good / "") .rstrip("/") + "/a.txt",
                     str(good) + "/b/c.json"]
    assert out[0][1] == b"hello" and out[1][1] == b"{}"


def test_data_order_resume(tmp_path):
    """Checkpointed pipeline position restores the exact batch sequence
    (train 5 steps, resume at 3 -> batches 4-5 identical)."""
    import json as _json

    from seed_story_tpu.data.datapipes import JsonlStoryDataset, ThreadedLoader, batched

    path = tmp_path / "d.jsonl"
    with open(path, "w") as f:
        for i in range(64):
            f.write(_json.dumps({"i": i}) + "\n")

    def decode(rec):
        if rec["i"] % 5 == 0:
            return None  # dropped samples must not desync the position
        return {"i": np.asarray([rec["i"]])}

    def make(seed=7):
        return JsonlStoryDataset(str(path), decode, seed=seed,
                                 host_index=0, host_count=1, shuffle_buffer=8)

    # uninterrupted run: 5 batches, snapshot state as delivered per batch
    ds = make()
    loader = ThreadedLoader(lambda: batched(iter(ds), 4), state_fn=ds.state)
    it = iter(loader)
    batches, states = [], []
    for _ in range(5):
        batches.append(next(it)["i"].ravel().tolist())
        states.append(loader.current_state)
    loader.close()

    # resume from the state after batch 3
    ds2 = make()
    ds2.set_state(states[2])
    loader2 = ThreadedLoader(lambda: batched(iter(ds2), 4), state_fn=ds2.state)
    it2 = iter(loader2)
    resumed = [next(it2)["i"].ravel().tolist() for _ in range(2)]
    loader2.close()
    assert resumed == batches[3:5]

    # the state is serializable (rides a JSON checkpoint field)
    _json.dumps(states[2])


def test_multi_datapipe_order_resume(tmp_path):
    """build_multi_datapipes' mixer is STATEFUL (round-4 fix: the bare
    sample_multiplexer generator had no state(), so the runner silently
    skipped data-order checkpointing for every standard stage-2/3 config —
    found by the on-chip kill/resume proof). Resume restores the exact
    mixed-batch sequence: children fast-forward + choice-stream replay."""
    import json as _json

    from seed_story_tpu.data.builders import MultiStoryDataPipe
    from seed_story_tpu.data.datapipes import (
        JsonlStoryDataset,
        ThreadedLoader,
        batched,
    )

    paths = []
    for tag in ("a", "b"):
        p = tmp_path / f"{tag}.jsonl"
        with open(p, "w") as f:
            for i in range(200):
                f.write(_json.dumps({"tag": tag, "i": i}) + "\n")
        paths.append(str(p))

    def decode(rec):
        return {"i": np.asarray([rec["i"] + (1000 if rec["tag"] == "b" else 0)])}

    class Child:
        def __init__(self, path, seed):
            self.ds = JsonlStoryDataset(path, decode, seed=seed,
                                        host_index=0, host_count=1,
                                        shuffle_buffer=8, cycle_count=50)

        def __iter__(self):
            return batched(iter(self.ds), 2)

        def state(self):
            return self.ds.state()

        def set_state(self, s):
            self.ds.set_state(s)

    def make():
        return MultiStoryDataPipe([Child(paths[0], 1), Child(paths[1], 2)],
                                  [0.7, 0.3], seed=9)

    pipe = make()
    loader = ThreadedLoader(lambda: iter(pipe), state_fn=pipe.state)
    it = iter(loader)
    batches, states = [], []
    for _ in range(12):
        batches.append(next(it)["i"].ravel().tolist())
        states.append(loader.current_state)
    loader.close()

    # serializable (rides the ocp JsonSave field)
    rt = _json.loads(_json.dumps(states[7]))
    pipe2 = make()
    pipe2.set_state(rt)
    loader2 = ThreadedLoader(lambda: iter(pipe2), state_fn=pipe2.state)
    it2 = iter(loader2)
    resumed = [next(it2)["i"].ravel().tolist() for _ in range(4)]
    loader2.close()
    assert resumed == batches[8:12]


def test_decode_draws_deterministic_and_resume_exact(story_dir):
    """Decode-time rng draws (num_image_given) are a pure function of
    (seed, record position): two fresh pipelines yield IDENTICAL batches,
    and a resumed pipeline replays the exact continuation. Regression for
    the round-4 on-chip kill/resume probe finding: the decoder fell back
    to the global unseeded `random`, so two identical training runs saw
    different data from step 1 (and resume was not batch-exact on any
    config with story_len > 2)."""
    from seed_story_tpu.data.builders import build_long_story_datapipe

    def make():
        return build_long_story_datapipe(
            data_dir=str(story_dir),
            image_dir=str(story_dir / "images"),
            tokenizer=TinyTokenizer(),
            story_len=5,
            max_length=256,
            batch_size=2,
            min_resolution=16,
            min_aspect_ratio=0.2,
            num_img_in_tokens=8,
            num_img_out_tokens=8,
            image_transform=get_transform("clip", keep_ratio=False, image_size=32),
            sd_image_transform=get_transform("sd", keep_ratio=True, image_size=64),
            cycle_count=8,
            seed=11,
        )

    def take(pipe, n):
        it = iter(pipe)
        out = []
        for _ in range(n):
            b = next(it)
            out.append((b["input_ids"].copy(), b["embeds_cmp_mask"].copy()))
        return out

    a, b = take(make(), 6), take(make(), 6)
    for (ia, ma), (ib, mb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ma, mb)
    # the draw actually varies across records (not a constant fallback)
    assert len({m.sum() for _, m in a}) > 1

    # resume: snapshot after batch 3, replay 4-6 exactly
    pipe = make()
    it = iter(pipe)
    batches, states = [], []
    for _ in range(6):
        batches.append(next(it)["input_ids"].copy())
        states.append(pipe.state())
    pipe2 = make()
    pipe2.set_state(states[2])
    it2 = iter(pipe2)
    for k in range(3, 6):
        np.testing.assert_array_equal(next(it2)["input_ids"], batches[k])
