"""Benchmark adapters and instrumentation.

Counterpart of the reference harness (``benchmark/models.py:21-120``):
a memory-sampler thread plus thin adapters that build data once and
time ``train`` / retrieval calls.  The reference compares buffalo
against implicit/lightfm/qmf/pyspark; here the subject is buffalo_tpu
itself across devices (CPU vs TPU) and configurations, with the
reference's published numbers (BASELINE.md) as the external baseline.

Datasets: with no network egress the harness synthesizes datasets with
the exact shape of the published ones (ML-20M, KakaoBrunch12M —
``benchmark/README.md:37-39``); epoch time depends on shape/nnz, not
values.  Pass ``--mm path`` to use a real MatrixMarket file instead.
"""
from __future__ import annotations

import os
import tempfile
import threading
import time
from typing import Dict, Optional

import numpy as np

def pin_cpu_if_requested(force: bool = False) -> bool:
    """Honor ``JAX_PLATFORMS=cpu`` before backend init.

    Delegates to :func:`buffalo_tpu.utils.pin_cpu` (single source of
    truth for the sitecustomize re-pin recipe).  Call at the top of
    every harness ``main()``.
    """
    from buffalo_tpu.utils import pin_cpu
    return pin_cpu(force=force)


DATASET_SHAPES = {
    # name: (num_users, num_items, nnz)   benchmark/README.md:37-39
    "ml20m": (138_493, 26_744, 20_000_000),
    "ml100k": (943, 1_682, 100_000),
    "kakao_brunch_12m": (306_687, 505_840, 12_393_831),
}


class MemorySampler(threading.Thread):
    """RSS peak sampler (reference ``models.py:21-27``)."""

    def __init__(self, interval: float = 0.2):
        super().__init__(daemon=True)
        self.interval = interval
        self.peak_mb = 0.0
        self._halt = threading.Event()

    def run(self):
        try:
            import psutil
            proc = psutil.Process(os.getpid())
        except Exception:
            self.peak_mb = float("nan")  # unmeasurable, not "0 MB"
            return
        while True:
            # sample BEFORE sleeping so even sub-interval runs record
            self.peak_mb = max(self.peak_mb,
                               proc.memory_info().rss / (1 << 20))
            if self._halt.wait(self.interval):
                return

    def stop(self) -> float:
        self._halt.set()
        self.join(timeout=2)
        return self.peak_mb


def synth_dataset(num_users: int, num_items: int, nnz: int, seed: int = 0):
    """Power-law interaction matrix with the target shape (host CSR)."""
    rng = np.random.default_rng(seed)
    pop = 1.0 / np.arange(1, num_items + 1) ** 0.9
    cum = np.cumsum(pop / pop.sum())
    deg = rng.lognormal(mean=0.0, sigma=1.1, size=num_users)
    deg = np.maximum(1, (deg / deg.sum() * nnz)).astype(np.int64)
    total = int(deg.sum())
    items = np.searchsorted(cum, rng.random(total)).astype(np.int32)
    items = np.minimum(items, num_items - 1)
    vals = (1.0 + rng.integers(0, 5, size=total)).astype(np.float32)
    indptr = np.zeros(num_users + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    return indptr, items, vals


def write_synth_mm(name: str, out_dir: Optional[str] = None,
                   seed: int = 0) -> str:
    """Materialize a synthetic dataset as a MatrixMarket file.

    Deterministic (name, seed) -> path cache under the system temp dir:
    synthesizing + savetxt'ing 20M lines costs minutes, and measurement
    sessions invoke this harness many times back-to-back.
    """
    num_users, num_items, nnz = DATASET_SHAPES[name]
    cached = out_dir is None  # only the deterministic default path caches
    out_dir = out_dir or os.path.join(tempfile.gettempdir(),
                                      f"bt_bench_mm_{name}_s{seed}")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "main.mtx")
    if cached and os.path.exists(path) and os.path.getsize(path) > 0:
        return path
    indptr, items, vals = synth_dataset(num_users, num_items, nnz, seed)
    # unique tmp name: concurrent writers must not interleave into one
    # file; os.replace makes whoever finishes last win atomically
    tmp = f"{path}.tmp.{os.getpid()}"
    rows = np.repeat(np.arange(num_users, dtype=np.int64), np.diff(indptr))
    with open(tmp, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{num_users} {num_items} {len(items)}\n")
        np.savetxt(f, np.column_stack(
            [rows + 1, items.astype(np.int64) + 1, vals]),
            fmt="%d %d %.1f")
    os.replace(tmp, path)
    return path


def build_data(mm_path: str, db_dir: str, validation: Optional[dict] = None):
    """MatrixMarket file -> compiled Data artifact."""
    import buffalo_tpu
    from buffalo_tpu import MatrixMarketOptions

    opt = MatrixMarketOptions().get_default_option()
    opt.input.main = mm_path
    opt.data.path = db_dir
    opt.data.use_cache = True
    if validation:
        opt.data.validation = validation
    else:
        opt.data.validation = {}
    data = buffalo_tpu.data.load(opt)
    data.create()
    return data


class BenchmarkResult(dict):
    def row(self) -> str:
        return " | ".join(f"{k}={v}" for k, v in self.items())


def fit_algo(algo_cls, opt, data, num_epochs: int) -> Dict[str, float]:
    """Time `num_epochs` of training, isolating staging/compile cost.

    A 1-iteration warmup run absorbs compilation; the timed run does
    ``1 + num_epochs`` iterations and ``epoch_s`` is the median of the
    driver's per-epoch ``iteration_times`` past the first (which
    absorbs restaging) — matching how the reference times epochs after
    its data feed is warm.
    """
    algo = algo_cls(opt, data=data)
    algo.initialize()
    # mutate algo.opt — the driver copies the option at construction,
    # so writes to the caller's `opt` never reach it
    algo.opt.num_iters = 1
    algo.train()                       # compile + staging warmup

    sampler = MemorySampler()
    sampler.start()
    algo.opt.num_iters = 1 + num_epochs
    st = time.perf_counter()
    algo.train()
    t_full = time.perf_counter() - st
    peak = sampler.stop()
    # first iteration absorbs staging/compile; drivers record per-epoch
    # train seconds in `iteration_times`
    times = getattr(algo, "iteration_times", [])[1:]
    epoch_s = (float(np.median(times)) if times
               else t_full / max(num_epochs, 1))
    return {"total_s": round(t_full, 3),
            "epoch_s": round(epoch_s, 4),
            "peak_rss_mb": round(peak, 1),
            "algo": algo}
