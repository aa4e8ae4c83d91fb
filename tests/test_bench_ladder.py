"""Survival tests for the bench.py artifact ladder.

Round-4 failure mode (VERDICT r4 item 1): the big-rung-first ladder let one
hung device acquisition eat 83% of the budget, then starved its own CPU
fallback -- BENCH_r04.json was null.  These tests pin the round-5 contract:
a JSON line is printed no matter which rungs hang.

The ladder logic is tested deterministically by substituting ``_run_child``;
the subprocess hard-kill mechanics are tested once for real via the
BENCH_SIM_HANG hook.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def _fake_result(backend, n_side):
    n = n_side * n_side
    return {
        "metric": f"fake {backend}", "value": float(n) / 0.05,
        "unit": "particle-steps/s/chip", "vs_baseline": 0.2,
        "step_ms": 50.0, "particles": n, "backend": backend,
        "platform": "tpu",
    }


def _run_main_with(monkeypatch, capsys, script):
    """script: {key -> result-dict | 'hang' | 'fail'}; returns parsed JSON."""
    calls = []

    def fake_run_child(argv_tail, cap, env_extra=None):
        assert cap >= 5
        if argv_tail == ["--probe"]:
            key = "probe"
        elif argv_tail[0] == "--child":
            key = f"{argv_tail[1]}@{argv_tail[2]}"
            if env_extra and env_extra.get("BENCH_ALLOW_CPU"):
                key = "cpu:" + key
        calls.append(key)
        action = script.get(key, "fail")
        if action == "hang":
            return None, f"wall-clock timeout after {cap:.0f}s"
        if action == "fail":
            return None, "rc=1 boom"
        if action == "probe_ok":
            return {"probe": "ok"}, "ok"
        return dict(action), "ok"

    monkeypatch.setattr(bench, "_run_child", fake_run_child)
    monkeypatch.setenv("BENCH_BUDGET_S", "540")
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out), calls


def test_hung_big_rung_still_yields_floor_json(monkeypatch, capsys):
    """The banked small rung survives a 1M hang (the r04 failure, inverted)."""
    res, calls = _run_main_with(monkeypatch, capsys, {
        "probe": "probe_ok",
        "pallas_t@350": _fake_result("pallas_t", 350),
        "pallas_t@1000": "hang",
        "pallas_t@700": "hang",
    })
    assert res["particles"] == 350 * 350
    assert res["backend"] == "pallas_t"
    assert any("pallas_t@1000" in f for f in res["degraded_from"])
    # the packed@350 rung must not downgrade the banked pallas_t@350 floor
    assert "packed@350" not in calls


def test_upgrade_replaces_floor(monkeypatch, capsys):
    res, calls = _run_main_with(monkeypatch, capsys, {
        "probe": "probe_ok",
        "pallas_t@350": _fake_result("pallas_t", 350),
        "pallas_t@1000": _fake_result("pallas_t", 1000),
    })
    assert res["particles"] == 1000 * 1000
    assert "degraded_from" not in res
    # banked the 1M defined size -> no further rungs attempted
    assert calls == ["probe", "pallas_t@350", "pallas_t@1000"]


def test_dead_probe_goes_straight_to_flagged_cpu(monkeypatch, capsys):
    res, calls = _run_main_with(monkeypatch, capsys, {
        "probe": "fail",
        "cpu:packed@150": {**_fake_result("packed", 150), "platform": "cpu",
                           "warning": "MEASURED ON CPU"},
    })
    assert res["platform"] == "cpu"
    assert "warning" in res
    # no accelerator rung was attempted against a dead device
    assert not any("pallas" in c for c in calls)


def test_everything_hangs_raises_with_trail(monkeypatch, capsys):
    with pytest.raises(SystemExit) as exc:
        _run_main_with(monkeypatch, capsys, {
            "probe": "hang", "cpu:packed@150": "hang"})
    assert "probe" in str(exc.value)


def test_real_subprocess_hang_is_killed_by_cap():
    """The BENCH_SIM_HANG hook + hard cap: a hung child dies in ~5 s."""
    import time
    t0 = time.time()
    out, reason = bench._run_child(
        ["--probe"], cap=5, env_extra={"BENCH_SIM_HANG": "probe"})
    assert out is None
    assert "timeout" in reason
    assert time.time() - t0 < 30
