"""bench.py smoke: the driver-facing benchmark must keep emitting its JSON
contract (one result line + one debug line) — nothing else in the suite
imports bench.py, so a refactor there could otherwise rot unnoticed until
the end-of-round driver run."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_pico_json_contract():
    env = dict(os.environ)
    env.update(
        PYTHONPATH="",  # bypass the axon sitecustomize hook (tunnel-proof)
        JAX_PLATFORMS="cpu",
        SEED_STORY_BENCH_PRESET="pico",
        SEED_STORY_BENCH_MODES="2,1",
        SEED_STORY_BENCH_SEGMENTS="2",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert set(result) >= {"metric", "value", "unit", "vs_baseline"}
    assert result["unit"] == "segments/min"
    assert result["value"] > 0
    # the B=1 latency mode rides along when serving wins the headline
    assert "b1_segments_per_min" in result or result["metric"]

    debug_line = next(
        ln for ln in out.stderr.strip().splitlines()[::-1]
        if ln.startswith('{"debug"')
    )
    debug = json.loads(debug_line)["debug"]
    assert {m["stories"] for m in debug["modes"]} == {1, 2}
    for m in debug["modes"]:
        assert m["segments"] > 0 and m["total_s"] > 0
    assert debug["setup_s"] is not None
    assert "import_s" in debug["setup_breakdown"]
    assert any(k.startswith("warmup_b") for k in debug["setup_breakdown"])
    assert "compile_cache_new_entries" in debug
