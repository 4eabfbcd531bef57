"""Driver-contract tests for bench.py: one JSON line with the required keys."""

import importlib.util
import json
import os
import sys

import pytest


def load_bench():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("bench_module", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_json_schema(monkeypatch, capsys):
    """main() prints exactly one JSON line with metric/value/unit/vs_baseline."""
    bench = load_bench()
    monkeypatch.setattr(bench, "_device_responsive", lambda *a, **k: True)
    monkeypatch.setattr(bench, "bench_embed", lambda *a, **k: {
        "bf16": 3000.0, "int8": 3000.0, "int8_cosine_min": 0.9997})
    monkeypatch.setattr(bench, "bench_topk", lambda *a, **k: 8000.0)
    monkeypatch.setattr(bench, "bench_topk_int8", lambda *a, **k: (40000.0, 1.0))
    monkeypatch.setattr(bench, "bench_recall_parity", lambda *a, **k: 1.0)
    monkeypatch.setattr(bench, "bench_hyp_train", lambda *a, **k: 450.0)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"bench must print exactly ONE line, got {len(out)}"
    payload = json.loads(out[0])
    assert set(payload) >= {"metric", "value", "unit", "vs_baseline"}
    assert payload["unit"] == "images/sec/chip"
    assert payload["vs_baseline"] == pytest.approx(0.3)


def test_bench_unresponsive_device_path(monkeypatch, capsys):
    """A wedged device yields an error JSON line, never a hang or crash."""
    bench = load_bench()
    monkeypatch.setattr(bench, "_device_responsive", lambda *a, **k: False)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    payload = json.loads(out[0])
    assert payload["value"] == 0.0
    assert "error" in payload["extras"]


def test_timed_throughput_differencing():
    """The differenced clock cancels constant per-run overhead."""
    import time

    bench = load_bench()
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        time.sleep(0.001)   # 1ms per unit of work
        return calls["n"]

    rate = bench._timed_throughput(fn, lambda o: o, units_per_iter=1,
                                   n_small=2, n_large=10)
    # ~1000 units/sec modulo sleep jitter
    assert 300 < rate < 3000
