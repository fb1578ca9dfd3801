"""Reference-core throughput anchors for W2V and CFR at the
KakaoBrunch12M stream shape — the two families BASELINE.md has no
published reference column for.

Runs the reference's own C++ cores (w2v.cc hogwild skip-gram /
cfr.cc 3-phase OpenMP solve) on the IDENTICAL synthetic corpus the
buffalo_tpu stream-scale harness trains on (benchmark/
test_stream_scale.py — same seed, same db build), on THIS box.

This box has 1 physical core vs the reference benchmark box's 6-core
Xeon E5-2620v3, so each run reports the measured T=1 number plus a
6x linear extrapolation — an UPPER bound on the 6-core box (hogwild /
row-parallel scaling is sublinear: the reference's own BPR
thread-scaling rows show 3.5x at T=8, BASELINE.md:27).

Usage:
  python benchmark/ref_driver/ref_stream_anchor.py --algo w2v --epochs 2
  python benchmark/ref_driver/ref_stream_anchor.py --algo cfr --epochs 2
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
sys.path.insert(0, os.path.join(HERE, ".."))       # benchmark/
sys.path.insert(0, os.path.join(HERE, "..", ".."))  # repo root
import parity  # noqa: E402  (benchmark/ref_driver/parity.py)
sys.path.insert(0, HERE)
from parity import build  # noqa: E402

import test_stream_scale as S  # noqa: E402

_TAG = ""


def anchor_w2v(args, work):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from buffalo_tpu.models import W2V
    from buffalo_tpu.models.options import W2VOption

    stream = S.write_synth_stream(
        os.path.join(tempfile.gettempdir(), "bt_stream_corpus" + _TAG))
    data = S.build(stream, os.path.join(tempfile.gettempdir(),
                                        "bt_stream_w2v" + _TAG))
    opt = W2VOption().get_default_option()
    opt.d = args.d
    opt.min_count = 2
    np.random.seed(0)
    m = W2V(opt, data=data)
    m.initialize()  # host-only: vocab build + L0 init
    V = int(m._vocab.size)
    group = data.get_group("rowwise")
    indptr = np.asarray(group["indptr"])
    seqs = np.asarray(group["key"], dtype=np.int32)
    ends = indptr[1:].astype(np.int64)
    twc = int(m._vocab.total_word_count)
    print(f"vocab {V}, sentences {len(ends)}, total words {twc}")

    binary = os.path.join(work, "ref_w2v")
    build(binary, "w2v")
    data_bin = os.path.join(work, "wv.bin")
    index = np.asarray(m._vocab.index, dtype=np.int32)
    with open(data_bin, "wb") as f:
        f.write(struct.pack("<4i", V, len(ends), args.d, args.epochs))
        f.write(struct.pack("<q", twc))
        f.write(struct.pack("<i", len(index)))
        f.write(index.astype("<i4").tobytes())
        f.write(np.asarray(m._vocab.scale).astype("<u4").tobytes())
        f.write(np.asarray(m._vocab.dist).astype("<i4").tobytes())
        f.write(ends.astype("<i8").tobytes())
        f.write(seqs.astype("<i4").tobytes())
        f.write(m.L0.astype("<f4").tobytes())
    # reference W2VOption defaults (buffalo/algo/options.py); workers =
    # this box's core count
    ropt = {"d": args.d, "num_workers": args.workers, "window": 5,
            "num_negative_samples": 5, "lr": 0.025, "min_lr": 0.0001,
            "num_iters": args.epochs, "batch_size": -1,
            "compute_loss_on_training": False, "random_seed": 1}
    optp = os.path.join(work, "wvopt.json")
    with open(optp, "w") as f:
        json.dump(ropt, f)
    st = time.perf_counter()
    res = subprocess.run([binary, optp, data_bin,
                          os.path.join(work, "wv_out.bin")],
                         capture_output=True, text=True, check=True)
    wall = time.perf_counter() - st
    print(res.stdout.strip())
    epoch_s = wall / args.epochs
    print(json.dumps({
        "metric": "ref_w2v_stream_epoch_s", "dataset":
        "kakaobrunch12m-shape", "d": args.d, "epochs": args.epochs,
        "workers": args.workers, "epoch_s_T1": round(epoch_s, 2),
        "raw_words_per_s_T1": round(twc / epoch_s),
        "epoch_s_6core_linear_bound": round(epoch_s / 6.0, 2)}))
    return 0


def anchor_cfr(args, work):
    import jax
    jax.config.update("jax_platforms", "cpu")

    stream = S.write_synth_stream(
        os.path.join(tempfile.gettempdir(), "bt_stream_corpus" + _TAG))
    data = S.build(stream, os.path.join(tempfile.gettempdir(),
                                        "bt_stream_cfr" + _TAG),
                   internal="matrix", sppmi={"windows": 5, "k": 10})
    row = data.get_group("rowwise")
    col = data.get_group("colwise")
    spp = data.get_group("sppmi")
    hdr = data.get_header()
    U, I = int(hdr["num_users"]), int(hdr["num_items"])
    d = args.d
    rng = np.random.default_rng(0)
    U0 = rng.normal(scale=1.0 / d ** 2, size=(U, d)).astype(np.float32)
    I0 = rng.normal(scale=1.0 / d ** 2, size=(I, d)).astype(np.float32)
    C0 = rng.normal(scale=1.0 / d ** 2, size=(I, d)).astype(np.float32)
    nnz = int(np.asarray(row["indptr"])[-1])
    snnz = int(np.asarray(spp["indptr"])[-1])
    print(f"users {U}, items {I}, nnz {nnz}, sppmi_nnz {snnz}")

    binary = os.path.join(work, "ref_cfr")
    build(binary, "cfr")
    data_bin = os.path.join(work, "cfr.bin")
    with open(data_bin, "wb") as f:
        f.write(struct.pack("<4i", U, I, d, args.epochs))
        for g, n in ((row, U), (col, I), (spp, I)):
            f.write(np.asarray(g["indptr"])[1:].astype("<i8").tobytes())
            f.write(np.asarray(g["key"]).astype("<i4").tobytes())
            f.write(np.asarray(g["val"]).astype("<f4").tobytes())
        f.write(U0.tobytes())
        f.write(I0.tobytes())
        f.write(C0.tobytes())
        f.write(np.zeros(I, "<f4").tobytes())
        f.write(np.zeros(I, "<f4").tobytes())
    ropt = {"d": d, "num_workers": args.workers, "optimizer": "llt",
            "alpha": 8.0, "l": 1.0, "num_cg_max_iters": 3,
            "cg_tolerance_": 1e-10, "eps": 1e-10, "reg_u": 0.1,
            "reg_i": 0.1, "reg_c": 0.1, "compute_loss": False}
    optp = os.path.join(work, "cfropt.json")
    with open(optp, "w") as f:
        json.dump(ropt, f)
    st = time.perf_counter()
    res = subprocess.run([binary, optp, data_bin,
                          os.path.join(work, "cfr_out.bin")],
                         capture_output=True, text=True, check=True)
    wall = time.perf_counter() - st
    print(res.stdout.strip())
    epoch_s = wall / args.epochs
    print(json.dumps({
        "metric": "ref_cfr_stream_epoch_s", "dataset":
        "kakaobrunch12m-shape", "d": args.d, "epochs": args.epochs,
        "workers": args.workers, "epoch_s_T1": round(epoch_s, 2),
        "epoch_s_6core_linear_bound": round(epoch_s / 6.0, 2)}))
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", default="w2v", choices=["w2v", "cfr"])
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--workers", type=int, default=os.cpu_count())
    ap.add_argument("--scale", type=float, default=1.0,
                    help="shrink the corpus shape (smoke knob; uses "
                         "the same _s<scale> cache tag as "
                         "test_stream_scale.py)")
    args = ap.parse_args()
    if args.scale != 1.0:
        S.USERS = max(100, int(S.USERS * args.scale))
        S.ITEMS = max(100, int(S.ITEMS * args.scale))
        S.NNZ = max(10_000, int(S.NNZ * args.scale))
        global _TAG
        _TAG = f"_s{args.scale:g}"
    work = tempfile.mkdtemp(prefix="bt_ref_anchor_")
    if args.algo == "w2v":
        return anchor_w2v(args, work)
    return anchor_cfr(args, work)


if __name__ == "__main__":
    sys.exit(main())
