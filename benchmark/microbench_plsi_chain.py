"""pLSI epoch decomposition: how much of the 0.254 s ML-20M epoch is
device compute vs the tunneled per-epoch dispatch+readback floor
(measured 27 ms median)?

pLSI is one of the two families at reference-box parity (ref T=1
0.80 s, 6-core linear bound 0.13 s) — if the intrinsic device epoch
is materially below the production reading, the parity verdict is a
link artifact, not a compute one.

Times (a) the production pattern (epoch + loss readback each iter)
and (b) 10 chained epochs fenced once (pure device rate), and prints
the compiled program's own cost analysis (flops / bytes accessed).

  python benchmark/microbench_plsi_chain.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys as _sys
import tempfile
import time
from pathlib import Path as _Path

_here = _Path(__file__).resolve().parent
_sys.path.insert(0, str(_here))
_sys.path.insert(0, str(_here.parent))

import numpy as np

from models import build_data, pin_cpu_if_requested, write_synth_mm

pin_cpu_if_requested()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=8)
    ap.add_argument("--dataset", default="ml20m")
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        pin_cpu_if_requested(force=True)
        args.dataset, args.chain = "ml100k", 3

    import jax
    import jax.numpy as jnp

    from buffalo_tpu import utils
    from buffalo_tpu.models import PLSI
    from buffalo_tpu.models.options import PLSIOption
    from buffalo_tpu.ops.plsi_kernels import plsi_epoch_range

    utils.enable_compilation_cache()
    mm = write_synth_mm(args.dataset)
    db = os.path.join(tempfile.gettempdir(),
                      f"bt_bench_db_{args.dataset}")
    data = build_data(mm, db)
    opt = PLSIOption().get_default_option()
    opt.d = args.d
    opt.validation = {}
    np.random.seed(0)
    m = PLSI(opt, data=data)
    m.initialize()
    # build the same range layout the driver builds (plsi.py:214-257;
    # the driver clears self._range after train, so mirror it here)
    from buffalo_tpu.data.batching import (DeviceBatcher, RangeBatch,
                                           SegmentBatch,
                                           build_range_layout,
                                           permute_table,
                                           stack_batches)
    rb = DeviceBatcher(data, "rowwise",
                       batch_mb=int(data.opt.data.get("batch_mb", 1024)),
                       resident_mb=int(opt.get("resident_mb", 4096)),
                       d=int(opt.d))
    cb = DeviceBatcher(data, "colwise",
                       batch_mb=int(data.opt.data.get("batch_mb", 1024)),
                       resident_mb=int(opt.get("resident_mb", 4096)),
                       d=int(opt.d))
    row_b, col_b, u_pos, i_pos, u_pad, i_pad = build_range_layout(
        rb.planner, cb.planner, rb.key, rb.val, cb.key, cb.val)

    def split(batches):
        rs_ = [b for b in stack_batches(batches)
               if isinstance(b, RangeBatch)]
        segs = [b for b in batches if isinstance(b, SegmentBatch)]
        return (tuple(jax.device_put(b) for b in rs_),
                tuple(jax.device_put(b) for b in segs))

    p_mask = np.zeros(u_pad, np.float32)
    p_mask[u_pos] = 1.0
    q_mask = np.zeros(i_pad, np.float32)
    q_mask[i_pos] = 1.0
    rg, rseg = split(row_b)
    cg, cseg = split(col_b)
    rs = {"row_groups": rg, "row_segments": rseg, "col_groups": cg,
          "col_segments": cseg, "u_pos": u_pos, "i_pos": i_pos,
          "p_mask": jax.device_put(p_mask),
          "q_mask": jax.device_put(q_mask),
          "u_pad": u_pad, "i_pad": i_pad}
    P = jax.device_put(permute_table(m.P, rs["u_pos"], rs["u_pad"]))
    Q = jax.device_put(permute_table(m.Q, rs["i_pos"], rs["i_pad"]))
    kw = dict(alpha1=float(opt.alpha1), alpha2=float(opt.alpha2),
              num_items=int(m.num_items))

    def epoch(P, Q):
        return plsi_epoch_range(
            P, Q, rs["row_groups"], rs["col_groups"],
            rs["row_segments"], rs["col_segments"], rs["p_mask"],
            rs["q_mask"], **kw)

    P, Q, l0 = epoch(P, Q)
    float(l0)                          # warm
    # (a) production pattern
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        P, Q, l_ = epoch(P, Q)
        float(l_)
        ts.append(time.perf_counter() - t0)
    prod = float(np.median(ts))
    # (b) chained
    t0 = time.perf_counter()
    for _ in range(args.chain):
        P, Q, l_ = epoch(P, Q)
    float(l_)
    chained = (time.perf_counter() - t0) / args.chain
    out = {"config": "plsi_chain", "backend": jax.default_backend(),
           "dataset": args.dataset, "d": args.d,
           "epoch_with_readback_s": round(prod, 4),
           "epoch_chained_s": round(chained, 4)}
    try:
        lowered = plsi_epoch_range.lower(
            P, Q, rs["row_groups"], rs["col_groups"],
            rs["row_segments"], rs["col_segments"], rs["p_mask"],
            rs["q_mask"], **kw)
        ca = lowered.compile().cost_analysis()
        out["flops_G"] = round(ca.get("flops", 0) / 1e9, 1)
        out["bytes_GB"] = round(ca.get("bytes accessed", 0) / 1e9, 2)
    except Exception as e:  # cost analysis is best-effort on axon
        out["cost_analysis"] = f"unavailable: {type(e).__name__}"
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
