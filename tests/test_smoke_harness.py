"""The real-weights smoke harness (scripts/smoke_model_adapters.py)
must stay runnable: demo mode end-to-end against the shipped golden,
drift detection, and named gates for missing runtimes."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "scripts" / "smoke_model_adapters.py"
GOLDEN = REPO / "scripts" / "goldens" / "smoke_fake_demo.json"


def _run(*args):
    return subprocess.run(
        [sys.executable, str(SCRIPT), *args],
        capture_output=True, text=True, cwd=str(REPO),
    )


def test_demo_matches_shipped_golden():
    r = _run("--demo", "--diff", str(GOLDEN))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "match" in r.stderr


def test_demo_detects_drift(tmp_path):
    drifted = json.loads(GOLDEN.read_text())
    drifted[0]["text"] = "tampered"
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps(drifted))
    r = _run("--demo", "--diff", str(bad))
    assert r.returncode == 1
    assert "tampered" in r.stdout


def test_record_round_trips(tmp_path):
    out = tmp_path / "g.json"
    r = _run("--demo", "--record", str(out))
    assert r.returncode == 0
    assert json.loads(out.read_text()) == json.loads(GOLDEN.read_text())


def test_real_adapter_flags_gate_by_name():
    # without onnxruntime installed, --layout-onnx must fail with the
    # package named (not a stack-trace-free silent pass)
    import importlib.util

    if importlib.util.find_spec("onnxruntime") is not None:
        import pytest

        pytest.skip("onnxruntime installed")
    r = _run("--file", "x.pdf", "--layout-onnx", "w.onnx")
    assert r.returncode != 0
    assert "onnxruntime" in (r.stdout + r.stderr)
