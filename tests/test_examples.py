"""The shipped walkthroughs must actually run (guards the public
examples against API drift)."""
import os
import subprocess
import sys

import pytest


def _run(tmp_path, script, *args):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "PYTHONPATH": root, "JAX_PLATFORMS": "cpu"}
    return subprocess.run(
        [sys.executable, os.path.join(root, "examples", script), *args],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path))


def test_example_als_runs(tmp_path):
    proc = _run(tmp_path, "example_als.py", "--epochs", "3", "--d", "8")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "most similar to" in proc.stdout
    assert "round trip" in proc.stdout.lower() or "loaded" in proc.stdout


def test_example_w2v_runs(tmp_path):
    proc = _run(tmp_path, "example_w2v.py", "--epochs", "3", "--d", "8")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "most similar to" in proc.stdout
    assert "analogy" in proc.stdout
    assert "loaded" in proc.stdout


def test_example_cfr_runs(tmp_path):
    proc = _run(tmp_path, "example_cfr.py", "--epochs", "3", "--d", "8")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "most similar to" in proc.stdout
    assert "recommendation" in proc.stdout
    assert "loaded" in proc.stdout


def test_example_compare_runs(tmp_path):
    proc = _run(tmp_path, "example_compare.py", "--epochs", "2",
                "--d", "8", "--algos", "als", "plsi")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "| als |" in proc.stdout
    assert "| plsi |" in proc.stdout


def test_example_data_runs(tmp_path):
    proc = _run(tmp_path, "example_data.py")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "from event log" in proc.stdout
    assert "from stream" in proc.stdout
    assert "all four input routes built" in proc.stdout
