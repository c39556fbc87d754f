"""bench.py smoke: the driver-facing benchmark must keep emitting its JSON
contract (headline line(s) on stdout + debug line(s) on stderr) — nothing
else in the suite imports bench.py, so a refactor there could otherwise rot
unnoticed until the end-of-round driver run.

Round-5 driver-proofing contract (BENCH_r04 died rc=124 with zero output):
the bench respects a global wall budget, emits the headline after EVERY
completed mode (so a kill mid-list still leaves a parseable tail), and the
LAST stdout line is always the best headline.
"""

import json
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(env_extra, timeout=900):
    env = dict(os.environ)
    env.update(
        PYTHONPATH="",  # bypass the axon sitecustomize hook (tunnel-proof)
        JAX_PLATFORMS="cpu",
        SEED_STORY_BENCH_PRESET="pico",
    )
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


def _parse(out):
    result = json.loads(out.stdout.strip().splitlines()[-1])
    debug_line = next(
        ln for ln in out.stderr.strip().splitlines()[::-1]
        if ln.startswith('{"debug"')
    )
    return result, json.loads(debug_line)["debug"]


@pytest.mark.slow
def test_bench_pico_json_contract():
    out = _run_bench({
        "SEED_STORY_BENCH_MODES": "2,1",
        "SEED_STORY_BENCH_SEGMENTS": "2",
    })
    assert out.returncode == 0, out.stderr[-2000:]
    result, debug = _parse(out)
    assert set(result) >= {"metric", "value", "unit", "vs_baseline"}
    assert result["unit"] == "segments/min"
    assert result["value"] > 0
    # the B=1 latency mode rides along when serving wins the headline
    assert "b1_segments_per_min" in result or result["metric"]

    assert {m["stories"] for m in debug["modes"]} == {1, 2}
    for m in debug["modes"]:
        assert m["segments"] > 0 and m["total_s"] > 0
    assert debug["setup_s"] is not None
    assert "import_s" in debug["setup_breakdown"]
    assert any(k.startswith("warmup_") for k in debug["setup_breakdown"])
    assert "compile_cache_new_entries" in debug

    # incremental emission: one headline per completed mode + the final
    # re-emission — a driver kill between modes still finds a valid line
    headlines = [json.loads(ln) for ln in out.stdout.strip().splitlines()]
    assert len(headlines) == 3
    assert all(h["unit"] == "segments/min" for h in headlines)


def _run_py(code, timeout=30):
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # bypass the axon sitecustomize hook
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


def test_watchdog_reemits_best_headline_and_exits_zero():
    """A phase hang past budget+grace must still leave a parseable last
    stdout line and rc=0 (the BENCH_r04 failure mode: rc=124, no output).
    Simulated: arm the watchdog with a stored headline, then hang."""
    t0 = time.time()
    out = _run_py(
        "import json, time, bench\n"
        "bench._WATCHDOG['headline'] = json.dumps("
        "    {'value': 1.23, 'unit': 'segments/min', 'watchdog_fired': True})\n"
        "bench.arm_watchdog(time.time() + 1.0)\n"
        "time.sleep(60)\n"  # the 'hung phase' — watchdog must preempt it
    )
    wall = time.time() - t0
    assert out.returncode == 0, (out.returncode, out.stderr[-500:])
    assert wall < 25, wall
    last = json.loads(out.stdout.strip().splitlines()[-1])
    assert last["watchdog_fired"] is True and last["value"] == 1.23
    assert "WATCHDOG fired" in out.stderr


def test_watchdog_no_measurement_is_an_honest_error_line():
    out = _run_py(
        "import time, bench\n"
        "bench.arm_watchdog(time.time() + 1.0)\n"
        "time.sleep(60)\n"
    )
    assert out.returncode == 0
    last = json.loads(out.stdout.strip().splitlines()[-1])
    assert last["value"] is None
    assert last["error"] == "watchdog_timeout_no_measurement"


def test_watchdog_cancelled_after_done_stays_silent():
    out = _run_py(
        "import time, bench\n"
        "t = bench.arm_watchdog(time.time() + 0.5)\n"
        "bench._WATCHDOG['done'] = True\n"
        "time.sleep(1.5)\n"
        "print('clean-exit')\n"
    )
    assert out.returncode == 0
    assert out.stdout.strip().splitlines()[-1] == "clean-exit"
    assert "WATCHDOG" not in out.stderr


def test_warmup_budget_planner_reserves_timed_segments():
    """warmup_must_stop: warming must yield the floor while the budget can
    still fund MIN_TIMED_SEGMENTS timed segments (est. from the warmup
    rate x the detok factor) — the round-5 rehearsal artifact was a
    850 s setup+warmup leaving ONE 90 s timed segment (0.66 headline)."""
    import bench

    # healthy warm-cache window: ~5.5 s warmup segments, plenty of budget
    # left -> keep warming (the full warm_target should complete)
    assert not bench.warmup_must_stop(700.0, 5.5, detok_enabled=True)
    # the rehearsal's degraded window: ~33 s/segment observed in warmup.
    # 5 timed segments cost 5 x 2.4 x 33 + 40 reserve = 436 s. The old
    # rule kept warming down to 172 s left (4*33+40) — the planner stops
    # as soon as the remaining budget dips under the timed-story cost
    assert bench.warmup_must_stop(430.0, 33.0, detok_enabled=True)
    assert not bench.warmup_must_stop(445.0, 33.0, detok_enabled=True)
    # two-phase (no detok inside the loop): timed ~= warmup rate
    assert not bench.warmup_must_stop(430.0, 33.0, detok_enabled=False)
    assert bench.warmup_must_stop(200.0, 33.0, detok_enabled=False)
    # tiny segments: the 150 s floor still applies
    assert bench.warmup_must_stop(140.0, 0.5, detok_enabled=True)
    assert not bench.warmup_must_stop(160.0, 0.5, detok_enabled=True)


def test_retry_transient_oom_retries_once_then_raises():
    """RESOURCE_EXHAUSTED right after another big TPU job is usually the
    tunnel worker briefly holding the dead process's HBM (a round-5
    rehearsal died rc=1 at SDXL init this way): retry once, budget
    permitting; anything else propagates immediately."""
    import bench

    calls = []

    def flaky():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
        return "ok"

    assert bench.retry_transient_oom(
        flaky, "t", lambda: 1e9, sleep_s=0.01) == "ok"
    assert len(calls) == 2

    # a persistent OOM raises on the second attempt
    def always():
        raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        bench.retry_transient_oom(always, "t", lambda: 1e9, sleep_s=0.01)

    # non-OOM errors propagate without a retry
    calls.clear()

    def other():
        calls.append(1)
        raise ValueError("shape mismatch")
    with pytest.raises(ValueError):
        bench.retry_transient_oom(other, "t", lambda: 1e9, sleep_s=0.01)
    assert len(calls) == 1

    # no budget for the pause: the first error propagates
    calls.clear()
    with pytest.raises(RuntimeError):
        bench.retry_transient_oom(
            lambda: (calls.append(1), always())[1], "t",
            lambda: 10.0, sleep_s=45.0)
    assert len(calls) == 1


@pytest.mark.slow
def test_bench_sink_mode_and_wall_budget():
    """The 'sink' mode token runs run_sink through the bench, and the
    global wall budget is respected: total wall stays within budget plus
    the import/exit slack even with multiple modes requested."""
    budget = 150.0
    t0 = time.time()
    out = _run_bench({
        "SEED_STORY_BENCH_MODES": "1,sink",
        "SEED_STORY_BENCH_SEGMENTS": "3",
        "SEED_STORY_BENCH_BUDGET_S": str(budget),
    }, timeout=600)
    wall = time.time() - t0
    assert out.returncode == 0, out.stderr[-2000:]
    result, debug = _parse(out)
    assert result["value"] > 0
    # budget respected: the bench must not blow its wall clock (slack for
    # interpreter start + the import + final health/emission)
    assert wall < budget + 90, wall
    stories = [m["stories"] for m in debug["modes"]]
    assert stories[0] == 1
    # the sink mode either ran (segments > 0) or was skipped/truncated for
    # budget — both honest outcomes carry an explicit marker
    sink_modes = [m for m in debug["modes"] if m["stories"] == "sink"]
    assert sink_modes, stories
    m = sink_modes[0]
    assert ("segments_per_min" in m) or ("error" in m), m
    assert debug["budget_s"] == budget
