"""The shipped walkthrough must actually run (guards the public
example against API drift)."""
import os
import subprocess
import sys


def test_example_als_runs(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "PYTHONPATH": root, "JAX_PLATFORMS": "cpu"}
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "examples", "example_als.py"),
         "--epochs", "3", "--d", "8"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "most similar to" in proc.stdout
    assert "round trip" in proc.stdout.lower() or "loaded" in proc.stdout
