"""The bench bank: a healthy slope measurement survives a relay outage.

Round-3 postmortem: the relay died hours before the driver snapshot and
the round's record became `value 0.0, relay_down: true` despite clean
in-round measurements. `bench.py` now persists slope-verified results to
`BENCH_BANK.json` (with timestamp + git sha) and, when the relay is down
for the whole budget, re-emits the banked number loudly flagged instead
of 0.0. These tests cover the bank roundtrip and the relay-down emit.
"""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bank_roundtrip(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "BANK_PATH", str(tmp_path / "bank.json"))
    assert bench._bank_read() is None  # missing file -> None, no raise

    metrics = {
        "dev_qps": 1246583.4,
        "cpu_qps": 6260.0,
        "recall_at_k": 1.0,
        "single_device_ms": 0.0221,
        "encode_texts_per_s": 1407.0,
        "slope_ok": True,
    }
    bench._bank_write(metrics)
    bank = bench._bank_read()
    assert bank["value"] == 1246583.4
    assert abs(bank["vs_baseline"] - 1246583.4 / 6260.0) < 0.01
    assert bank["unit"] == "qps"
    assert bank["measured_iso"]
    assert bank["git_sha"]


def test_bank_read_corrupt(tmp_path, monkeypatch):
    bench = _load_bench()
    p = tmp_path / "bank.json"
    p.write_text("{not json")
    monkeypatch.setattr(bench, "BANK_PATH", str(p))
    assert bench._bank_read() is None


def test_relay_down_emits_banked_value(tmp_path, monkeypatch, capsys):
    bench = _load_bench()
    monkeypatch.setattr(bench, "BANK_PATH", str(tmp_path / "bank.json"))
    bench._bank_write({"dev_qps": 50000.0, "cpu_qps": 5000.0})
    # simulate: relay never comes up, budget exhausted immediately
    monkeypatch.setattr(bench, "_probe_relay", lambda: False)
    monkeypatch.setattr(bench, "_remaining", lambda: 0.0)
    monkeypatch.setattr(bench, "_install_handler", lambda: None)
    bench.run()
    line = [
        l for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ][-1]
    out = json.loads(line)
    assert out["value"] == 50000.0
    assert out["vs_baseline"] == 10.0
    assert out["relay_down"] is True
    assert out["banked"] is True
    assert out["git_sha"]


def test_relay_down_no_bank_emits_zero(tmp_path, monkeypatch, capsys):
    bench = _load_bench()
    monkeypatch.setattr(bench, "BANK_PATH", str(tmp_path / "absent.json"))
    monkeypatch.setattr(bench, "_probe_relay", lambda: False)
    monkeypatch.setattr(bench, "_remaining", lambda: 0.0)
    monkeypatch.setattr(bench, "_install_handler", lambda: None)
    bench.run()
    line = [
        l for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ][-1]
    out = json.loads(line)
    assert out["value"] == 0.0
    assert out["relay_down"] is True
    assert "banked" not in out
