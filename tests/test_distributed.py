"""Multi-host entry point: 2 CPU processes x 2 fake devices train ALS
over a 4-device global mesh via ``parallelism.initialize_distributed``
(the rebuild's replacement for the reference's absent multi-node story;
SURVEY §5 distributed-backend row)."""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    addr, pid, root = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    from buffalo_tpu import parallelism
    n = parallelism.initialize_distributed(addr, 2, pid)
    assert n == 4, n

    import numpy as np
    from buffalo_tpu.data import MatrixMarketOptions, load
    from buffalo_tpu.models import ALS, ALSOption
    rng = np.random.default_rng(42)
    U, I = 96, 48
    lines = []
    for u in range(U):
        for i in rng.choice(I, size=rng.integers(5, 12), replace=False):
            lines.append(f"{u+1} {int(i)+1} {float(rng.integers(1, 6))}")
    mm = os.path.join(root, f"m{pid}.mm")
    with open(mm, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\\n")
        f.write(f"{U} {I} {len(lines)}\\n")
        f.write("\\n".join(lines) + "\\n")
    dopt = MatrixMarketOptions().get_default_option()
    dopt.input.main = mm
    dopt.data.path = os.path.join(root, f"d{pid}.bfo")
    dopt.data.tmp_dir = os.path.join(root, f"tmp{pid}")
    dopt.data.validation = {}
    data = load(dopt)
    data.create()
    np.random.seed(5)
    opt = ALSOption().get_default_option()
    opt.d = 8
    opt.num_iters = 3
    opt.validation = {}
    opt.num_devices = 4
    opt.sharding = "dp+tp"
    m = ALS(opt, data=data)
    m.initialize()
    r = m.train()
    assert np.isfinite(r["train_loss"]) and r["train_loss"] < 1.0
    assert m.Q.shape == (I, 8)
    print(f"RESULT {pid} {r['train_loss']:.8f}", flush=True)
""")


def test_two_process_training(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {**os.environ, "PYTHONPATH": os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))}
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), addr, str(pid), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)
    losses = [line.split()[-1] for out in outs for line in out.splitlines()
              if line.startswith("RESULT")]
    assert len(losses) == 2 and losses[0] == losses[1]
