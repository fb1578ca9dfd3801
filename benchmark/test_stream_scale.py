"""W2V + CFR at KakaoBrunch12M scale (306k users x 506k items, 12M
tokens of stream data) — the BASELINE.md "W2V+CFR on
KakaoBrunch-scale stream data" config.

The corpus is synthesized with the published shape: 306,291 lines
whose lengths follow the nnz budget and whose tokens follow a zipfian
item popularity (real text/stream statistics are shape-level here —
epoch time depends on nnz, vocab size and degree distribution, not
token identities).

Usage:
  python benchmark/test_stream_scale.py --algo w2v --epochs 3
  python benchmark/test_stream_scale.py --algo cfr --epochs 2
"""
from __future__ import annotations

import argparse
import sys as _sys
from pathlib import Path as _Path

_here = _Path(__file__).resolve().parent
_sys.path.insert(0, str(_here))
_sys.path.insert(0, str(_here.parent))
import json
import os
import tempfile
import time

import numpy as np

from models import pin_cpu_if_requested

USERS, ITEMS, NNZ = 306_291, 505_926, 12_000_000
SMOKE_USERS, SMOKE_ITEMS, SMOKE_NNZ = 600, 400, 12_000


def write_synth_stream(out_dir=None, seed=7, smoke=False):
    users, items_n, nnz = ((SMOKE_USERS, SMOKE_ITEMS, SMOKE_NNZ)
                          if smoke else (USERS, ITEMS, NNZ))
    rng = np.random.default_rng(seed)
    out_dir = out_dir or tempfile.mkdtemp(prefix="bt_stream_")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "main.txt")
    if os.path.isfile(path):
        # only trust a complete corpus (an interrupted write leaves a
        # truncated file that would silently shrink the benchmark)
        with open(path, "rb") as f:
            n_lines = sum(1 for _ in f)
        if n_lines == users:
            return path
        os.remove(path)
    # zipfian item popularity, log-normal-ish line lengths
    pop = 1.0 / np.arange(1, items_n + 1) ** 0.8
    pop /= pop.sum()
    lens = np.maximum(1, rng.poisson(nnz / users, users))
    scale = nnz / lens.sum()
    lens = np.maximum(1, (lens * scale).astype(np.int64))
    items = rng.choice(items_n, size=int(lens.sum()), p=pop)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        pos = 0
        for n in lens:
            f.write(" ".join(map(str, items[pos:pos + n])) + "\n")
            pos += n
    os.replace(tmp, path)
    return path


def build(stream_path, db, internal="stream", sppmi=None):
    from buffalo_tpu.data import StreamOptions, load
    opt = StreamOptions().get_default_option()
    opt.input.main = stream_path
    opt.data.path = db
    opt.data.tmp_dir = os.path.join(tempfile.gettempdir(), "bt_stream_tmp")
    opt.data.internal_data_type = internal
    opt.data.validation = {}
    opt.data.use_cache = True
    if sppmi:
        opt.data.sppmi = sppmi
    data = load(opt)
    data.create()
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", default="w2v", choices=["w2v", "cfr"])
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny-shape CPU sanity run of the full harness")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="shrink users/items/nnz by this factor "
                         "(bisect knob for the r4 W2V worker crash)")
    ap.add_argument("--set", nargs="*", default=[], metavar="K=V",
                    help="extra algo option overrides, e.g. "
                         "pair_gen=device neg_block=128")
    args = ap.parse_args()

    overrides = {}
    for kv in args.set:
        k, _, v = kv.partition("=")
        try:
            overrides[k] = json.loads(v)
        except json.JSONDecodeError:
            overrides[k] = v

    # --smoke implies the CPU pin; otherwise honor JAX_PLATFORMS=cpu
    pin_cpu_if_requested(force=args.smoke)

    tag = "_smoke" if args.smoke else ""
    if args.scale != 1.0:
        # rebind the module-level shape constants in THIS module's
        # globals (running as __main__, `import test_stream_scale`
        # would create a second copy and miss)
        global USERS, ITEMS, NNZ
        USERS = max(100, int(USERS * args.scale))
        ITEMS = max(100, int(ITEMS * args.scale))
        NNZ = max(10_000, int(NNZ * args.scale))
        tag = f"_s{args.scale:g}"
    stream = write_synth_stream(
        os.path.join(tempfile.gettempdir(), "bt_stream_corpus" + tag),
        smoke=args.smoke)
    if args.algo == "w2v":
        from buffalo_tpu.models import W2V
        from buffalo_tpu.models.options import W2VOption
        data = build(stream, os.path.join(tempfile.gettempdir(),
                                          "bt_stream_w2v" + tag))
        opt = W2VOption().get_default_option()
        opt.d = args.d
        opt.num_iters = args.epochs + 1
        opt.min_count = 2
        for k, v in overrides.items():
            opt[k] = v
        model = W2V(opt, data=data)
    else:
        from buffalo_tpu.models import CFR
        from buffalo_tpu.models.options import CFROption
        data = build(stream, os.path.join(tempfile.gettempdir(),
                                          "bt_stream_cfr" + tag),
                     internal="matrix", sppmi={"windows": 5, "k": 10})
        opt = CFROption().get_default_option()
        opt.d = args.d
        opt.num_iters = args.epochs + 1
        opt.validation = {}
        for k, v in overrides.items():
            opt[k] = v
        model = CFR(opt, data=data)

    np.random.seed(0)
    model.initialize()
    st = time.perf_counter()
    model.train()
    total = time.perf_counter() - st
    times = getattr(model, "iteration_times", [])[1:]
    epoch_s = float(np.median(times)) if times else total / args.epochs
    dataset = "smoke" if args.smoke else "kakaobrunch12m-shape"
    print(json.dumps({"algo": args.algo, "dataset": dataset,
                      "d": args.d, "epoch_s": round(epoch_s, 4),
                      "total_s": round(total, 3)}))

    # top-k MIPS retrieval over the trained factors
    from buffalo_tpu.parallel import ParALS, ParW2V
    model.build_itemid_map()
    nq = min(10_000, len(model._idmanager.itemids))
    keys = [model._idmanager.itemids[i] for i in range(nq)]
    par = ParW2V(model) if args.algo == "w2v" else ParALS(model)
    # warm at the FULL query count: a smaller warm call compiles a
    # different scan length and the timed call pays a fresh compile
    # (the r4 5.7 s "retrieval" reading was mostly that compile)
    par.most_similar(keys, topk=10)
    st = time.perf_counter()
    par.most_similar(keys, topk=10)
    print(json.dumps({f"retrieval_{nq}q_s":
                      round(time.perf_counter() - st, 3)}))


if __name__ == "__main__":
    main()
