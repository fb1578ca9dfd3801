"""Data-preparation walkthrough (counterpart of the reference's
``examples/jupyter-examples/0. Data Transform...ipynb``): turn raw
interaction logs into buffalo_tpu's two input formats, build the
compiled databases, and inspect them.

Shows all four input routes:
  1. raw (user, item, value) event log -> MatrixMarket file + id files
  2. dense numpy matrix                -> MatrixMarket data, in-memory
  3. scipy sparse matrix               -> MatrixMarket data, in-memory
  4. per-user item sequences           -> Stream data (order kept)

Usage:
  python examples/example_data.py
"""
from __future__ import annotations

import os
import sys
import tempfile

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from buffalo_tpu.utils import pin_cpu

pin_cpu()  # re-pin before backend init if JAX_PLATFORMS=cpu

import numpy as np
import scipy.sparse


def main():
    from buffalo_tpu import MatrixMarketOptions, StreamOptions
    from buffalo_tpu.data import load

    tmp = tempfile.mkdtemp(prefix="buffalo_tpu_data_")
    rng = np.random.default_rng(0)

    # ------------------------------------------------------------------
    # 1. raw event log -> MatrixMarket file + uid/iid files
    #    (the shape of a production click/watch/purchase log)
    events = [(f"user{rng.integers(40)}", f"movie{rng.integers(25)}",
               int(rng.integers(1, 6))) for _ in range(600)]
    # dedupe keeping the last value per (user, item)
    log = {(u, i): v for u, i, v in events}
    users = sorted({u for u, _ in log})
    items = sorted({i for _, i in log})
    uidx = {u: k for k, u in enumerate(users)}
    iidx = {i: k for k, i in enumerate(items)}

    mm_path = os.path.join(tmp, "main.mtx")
    with open(mm_path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate integer general\n")
        f.write(f"{len(users)} {len(items)} {len(log)}\n")
        for (u, i), v in log.items():   # 1-based indices
            f.write(f"{uidx[u] + 1} {iidx[i] + 1} {v}\n")
    uid_path = os.path.join(tmp, "uid")
    iid_path = os.path.join(tmp, "iid")
    Path(uid_path).write_text("".join(f"{u}\n" for u in users))
    Path(iid_path).write_text("".join(f"{i}\n" for i in items))

    opt = MatrixMarketOptions().get_default_option()
    opt.input.main = mm_path
    opt.input.uid = uid_path
    opt.input.iid = iid_path
    opt.data.path = os.path.join(tmp, "from_log.bfo")
    # hold out 10% of events for ranking validation
    opt.data.validation = {"name": "sample", "p": 0.1, "max_samples": 200}
    data = load(opt)
    data.create()
    print("1. from event log:", data.get_header())
    keys, vals = data.get(0)[:2]
    print("   row 0:", list(zip(keys[:4], vals[:4])))

    # ------------------------------------------------------------------
    # 2. dense numpy matrix (row = user, col = item, 0 = unobserved)
    dense = (rng.random((30, 12)) < 0.3) * rng.integers(1, 6, (30, 12))
    opt = MatrixMarketOptions().get_default_option()
    opt.input.main = dense.astype(np.float32)
    opt.data.path = os.path.join(tmp, "from_dense.bfo")
    opt.data.validation = {}
    data = load(opt)
    data.create()
    print("2. from dense ndarray:", data.get_header())

    # ------------------------------------------------------------------
    # 3. scipy sparse matrix
    sp = scipy.sparse.random(50, 20, density=0.2, format="csr",
                             random_state=3, data_rvs=lambda n:
                             rng.integers(1, 6, n).astype(np.float64))
    opt = MatrixMarketOptions().get_default_option()
    opt.input.main = sp
    opt.data.path = os.path.join(tmp, "from_sparse.bfo")
    opt.data.validation = {}
    data = load(opt)
    data.create()
    print("3. from scipy sparse:", data.get_header())

    # ------------------------------------------------------------------
    # 4. per-user sequences -> Stream data (order-preserving; also the
    #    input for W2V and, with internal_data_type="matrix" + sppmi,
    #    for CFR — see example_w2v.py / example_cfr.py)
    stream_path = os.path.join(tmp, "main.txt")
    with open(stream_path, "w") as f:
        for _ in range(40):
            seq = rng.integers(0, 30, rng.integers(3, 12))
            f.write(" ".join(f"track{int(x)}" for x in seq) + "\n")
    opt = StreamOptions().get_default_option()
    opt.input.main = stream_path
    opt.data.path = os.path.join(tmp, "from_stream.bfo")
    opt.data.tmp_dir = os.path.join(tmp, "tmp")
    opt.data.validation = {}
    data = load(opt)
    data.create()
    print("4. from stream:", data.get_header())
    print("   user 0 sequence head:", data.get(0)[0][:5])

    print("\nall four input routes built under", tmp)


if __name__ == "__main__":
    main()
