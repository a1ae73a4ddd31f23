"""bench.py orchestration: budget/fallback behavior, without a TPU.

The driver runs bench.py at the end of every round; these tests pin the
properties that keep it from reporting garbage in a degraded remote-compile
phase (subprocess attempts, cheapest-first lock-in, timeout fallback, one
JSON line on stdout).
"""

import json
import subprocess

import bench


class _FakeProc:
    def __init__(self, stdout):
        self.stdout = stdout
        self.stderr = ""


def _run_main(monkeypatch, capsys, runner, budget="2700"):
    monkeypatch.setenv("BENCH_BUDGET_S", budget)
    monkeypatch.setenv("BENCH_ATTEMPT_S", "720")
    monkeypatch.setattr(subprocess, "run", runner)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"must print exactly one stdout line, got {out}"
    return json.loads(out[-1])


def test_best_attempt_wins(monkeypatch, capsys):
    rates = {1024: 30000.0, 4096: 80000.0, 16384: 150000.0, 32768: 185000.0}

    def fake_run(cmd, **kw):
        code = cmd[-1]
        batch = int(code.split("(")[1].split(",")[0])
        return _FakeProc(json.dumps(
            {"captions_per_sec": rates[batch], "device": "TPU v5 lite0"}))

    out = _run_main(monkeypatch, capsys, fake_run)
    assert out["value"] == 185000.0
    assert out["detail"]["batch_size"] == 32768
    assert out["vs_baseline"] == 18.5


def test_timeouts_keep_earlier_result(monkeypatch, capsys):
    """Large-batch attempts that hang must not lose the locked-in result."""
    def fake_run(cmd, **kw):
        code = cmd[-1]
        batch = int(code.split("(")[1].split(",")[0])
        if batch > 1024:
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))
        return _FakeProc(json.dumps(
            {"captions_per_sec": 31000.0, "device": "TPU v5 lite0"}))

    out = _run_main(monkeypatch, capsys, fake_run)
    assert out["value"] == 31000.0
    assert out["detail"]["batch_size"] == 1024


def test_exhausted_budget_retries_cheapest(monkeypatch, capsys):
    """If nothing landed and the budget is nearly gone, remaining slots
    retry the cheapest attempt instead of reporting zero."""
    calls = []

    def fake_run(cmd, **kw):
        code = cmd[-1]
        batch = int(code.split("(")[1].split(",")[0])
        calls.append(batch)
        if len(calls) == 1:
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))
        return _FakeProc(json.dumps(
            {"captions_per_sec": 29000.0, "device": "TPU v5 lite0"}))

    # tiny budget: after the first (timed-out) attempt, remaining < attempt_s
    out = _run_main(monkeypatch, capsys, fake_run, budget="1")
    assert out["value"] == 29000.0
    assert calls[1] == bench.ATTEMPTS[0]["batch"]  # retried the cheapest


def test_total_failure_still_prints_valid_json(monkeypatch, capsys):
    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))

    out = _run_main(monkeypatch, capsys, fake_run)
    assert out["value"] == 0.0
    assert out["metric"] == "captions_per_sec_greedy"
