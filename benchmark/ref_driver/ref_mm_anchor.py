"""Reference-core throughput anchors for eALS and pLSI at the ML-20M
shape — the two matrix families with no published reference benchmark
row (the reference's README sweeps ALS and BPR only).

Drives the reference's own C++ cores (eals.cc coordinate descent /
plsi.cc EM) on the IDENTICAL synthetic ML-20M-shaped CSR the
buffalo_tpu d-sweeps trained on (``models.synth_dataset``, same
seed), with the production option values (eALS c0=512 exponent=0.5
popularity weights, pLSI alpha 1.0).  This box has 1 core — T=1
measured plus a 6x linear extrapolation (an upper bound on the
6-core reference box; see ref_stream_anchor.py).

  python benchmark/ref_driver/ref_mm_anchor.py --algo eals --d 16
  python benchmark/ref_driver/ref_mm_anchor.py --algo plsi --d 8
"""
from __future__ import annotations

import argparse
import json
import os
import struct
import subprocess
import sys
import tempfile
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
sys.path.insert(0, HERE)
from parity import build  # noqa: E402

from models import DATASET_SHAPES, synth_dataset  # noqa: E402


def to_colwise(indptr, items, vals, num_users, num_items):
    rows = np.repeat(np.arange(num_users, dtype=np.int32),
                     np.diff(indptr))
    order = np.argsort(items, kind="stable")
    c_keys = rows[order]
    c_vals = vals[order].astype(np.float32)
    c_indptr = np.zeros(num_items + 1, np.int64)
    np.add.at(c_indptr, items.astype(np.int64) + 1, 1)
    np.cumsum(c_indptr, out=c_indptr)
    return c_indptr, c_keys, c_vals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", default="eals", choices=["eals", "plsi"])
    ap.add_argument("--d", type=int, default=16)
    ap.add_argument("--dataset", default="ml20m",
                    choices=sorted(DATASET_SHAPES))
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--workers", type=int, default=os.cpu_count())
    args = ap.parse_args()

    U, I, nnz = DATASET_SHAPES[args.dataset]
    indptr, items, vals = synth_dataset(U, I, nnz, 0)
    vals = np.asarray(vals, np.float32)
    items = np.asarray(items, np.int32)
    d = args.d
    rng = np.random.default_rng(11)
    work = tempfile.mkdtemp(prefix="bt_mm_anchor_")
    binary = os.path.join(work, f"ref_{args.algo}")
    build(binary, args.algo)
    print(f"{args.dataset}: {U} x {I}, nnz {len(items)}")

    data = os.path.join(work, "data.bin")
    if args.algo == "eals":
        c_ip, c_k, c_v = to_colwise(indptr, items, vals, U, I)
        # production negative weights (models/eals.py:67-74 defaults)
        pop = np.diff(c_ip).astype(np.float32)
        pop /= max(pop.max(), 1.0)
        pe = pop ** 0.5
        C = (512.0 * pe / pe.sum()).astype(np.float32)
        P0 = np.abs(rng.normal(scale=1.0 / d ** 2,
                               size=(U, d))).astype(np.float32)
        Q0 = np.abs(rng.normal(scale=1.0 / d ** 2,
                               size=(I, d))).astype(np.float32)
        with open(data, "wb") as f:
            f.write(struct.pack("<4i", U, I, d, args.epochs))
            f.write(C.tobytes())
            f.write(np.asarray(indptr[1:], "<i8").tobytes())
            f.write(items.astype("<i4").tobytes())
            f.write(vals.astype("<f4").tobytes())
            f.write(np.asarray(c_ip[1:], "<i8").tobytes())
            f.write(c_k.astype("<i4").tobytes())
            f.write(c_v.astype("<f4").tobytes())
            f.write(P0.tobytes())
            f.write(Q0.tobytes())
        opt = {"d": d, "num_workers": args.workers, "alpha": 8.0,
               "reg_u": 0.1, "reg_i": 0.1, "random_seed": 1}
    else:
        P0 = np.abs(rng.normal(scale=1.0 / d,
                               size=(U, d))).astype(np.float32)
        P0 /= P0.sum(axis=1, keepdims=True)
        Q0 = np.abs(rng.normal(scale=1.0 / d,
                               size=(I, d))).astype(np.float32)
        Q0 /= Q0.sum(axis=0, keepdims=True)
        with open(data, "wb") as f:
            f.write(struct.pack("<4i", U, I, d, args.epochs))
            f.write(struct.pack("<2f", 1.0, 1.0))
            f.write(np.asarray(indptr[1:], "<i8").tobytes())
            f.write(items.astype("<i4").tobytes())
            f.write(vals.astype("<f4").tobytes())
            f.write(P0.tobytes())
            f.write(Q0.tobytes())
        opt = {"d": d, "num_workers": args.workers, "random_seed": 1}
    optp = os.path.join(work, "opt.json")
    with open(optp, "w") as f:
        json.dump(opt, f)

    st = time.perf_counter()
    res = subprocess.run([binary, optp, data,
                          os.path.join(work, "out.bin")],
                         capture_output=True, text=True, check=True)
    wall = time.perf_counter() - st
    print(res.stdout.strip())
    epoch_s = wall / args.epochs
    print(json.dumps({
        "metric": f"ref_{args.algo}_{args.dataset}_epoch_s",
        "d": d, "epochs": args.epochs, "workers": args.workers,
        "epoch_s_T1": round(epoch_s, 2),
        "epoch_s_6core_linear_bound": round(epoch_s / 6.0, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
