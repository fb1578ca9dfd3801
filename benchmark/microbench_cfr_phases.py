"""Phase-level decomposition of the CFR stream epoch (r5: 6.18 s).

The gather microbench (`microbench_cfr_gather.py`) puts the raw
table-gather floor at ~14 ns/row => ~2.5 s of the 6.18 s; this bench
times the three phases separately on the REAL staged batches at the
brunch stream shape and reports each phase's padded-entry count, so
padding waste and per-phase compute are visible.

  python benchmark/microbench_cfr_phases.py
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

from models import pin_cpu_if_requested

pin_cpu_if_requested()

import test_stream_scale as S  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        pin_cpu_if_requested(force=True)
        S.USERS, S.ITEMS, S.NNZ = 600, 400, 12_000

    import jax
    import jax.numpy as jnp

    from buffalo_tpu import utils
    from buffalo_tpu.data.batching import PaddedBatch, SegmentBatch
    from buffalo_tpu.models import CFR
    from buffalo_tpu.models.options import CFROption
    from buffalo_tpu.ops import cfr_kernels as K

    utils.enable_compilation_cache()
    tag = "_smoke" if args.smoke else ""
    stream = S.write_synth_stream(
        os.path.join(tempfile.gettempdir(), "bt_stream_corpus" + tag),
        smoke=args.smoke)
    data = S.build(stream, os.path.join(tempfile.gettempdir(),
                                        "bt_stream_cfr" + tag),
                   internal="matrix", sppmi={"windows": 5, "k": 10})
    opt = CFROption().get_default_option()
    opt.d = args.d
    opt.validation = {}
    np.random.seed(0)
    m = CFR(opt, data=data)
    m.initialize()
    batches = m._build_batches()

    def entries(phase):
        tot = 0
        for e in batches[phase]:
            if isinstance(e, SegmentBatch):
                tot += int(np.prod(e.cols.shape))
            elif isinstance(e, PaddedBatch):
                tot += int(np.prod(e.cols.shape))
            else:
                if isinstance(e[0], SegmentBatch):
                    tot += int(np.prod(e[0].cols.shape))
                    tot += int(np.prod(e[1].cols.shape))
                else:
                    b, lens_c, cols_c, vals_c = e
                    tot += int(np.prod(b.cols.shape))
                    tot += int(np.prod(np.asarray(cols_c).shape))
        return tot

    hdr = data.get_header()
    print(json.dumps({
        "config": "cfr_phases", "backend": jax.default_backend(),
        "nnz": int(hdr["num_nnz"]),
        "sppmi_nnz": int(np.asarray(
            data.get_group("sppmi")["indptr"])[-1]),
        "padded_entries": {p: entries(p) for p in
                           ("user", "item", "context")}}), flush=True)

    com = dict(optimizer=str(opt.optimizer),
               cg_iters=int(opt.num_cg_max_iters),
               cg_tol=float(opt.cg_tolerance),
               compute_loss=True)
    al, l_, = float(opt.alpha), float(opt.l)
    staged = {p: [jax.device_put(e) for e in batches[p]]
              for p in ("user", "item", "context")}

    def run_user(U, I):
        FF = jnp.dot(I.T, I, preferred_element_type=jnp.float32)
        for b in staged["user"]:
            if isinstance(b, SegmentBatch):
                U, _ = K.cfr_user_segment_step(
                    U, I, FF, b, alpha=al, l=l_,
                    reg_u=float(opt.reg_u), **com)
            else:
                U, _ = K.cfr_user_step(
                    U, I, FF, b.rows, b.lens, b.cols, b.vals,
                    alpha=al, l=l_, reg_u=float(opt.reg_u), **com)
        return U

    def run_item(U, I, C, Ib, Cb):
        FF = jnp.dot(U.T, U, preferred_element_type=jnp.float32)
        for e in staged["item"]:
            if isinstance(e[0], SegmentBatch):
                I, Ib, _ = K.cfr_item_segment_step(
                    I, U, C, Ib, Cb, FF, e[0], e[1], alpha=al, l=l_,
                    reg_i=float(opt.reg_i), **com)
            else:
                b, lens_c, cols_c, vals_c = e
                I, Ib, _ = K.cfr_item_step(
                    I, U, C, Ib, Cb, FF, b.rows, b.lens, b.cols,
                    b.vals, lens_c, cols_c, vals_c, alpha=al, l=l_,
                    reg_i=float(opt.reg_i), **com)
        return I, Ib

    def run_ctx(C, I, Ib, Cb):
        for b in staged["context"]:
            if isinstance(b, SegmentBatch):
                C, Cb, _ = K.cfr_context_segment_step(
                    C, I, Ib, Cb, b, reg_c=float(opt.reg_c), **com)
            else:
                C, Cb, _ = K.cfr_context_step(
                    C, I, Ib, Cb, b.rows, b.lens, b.cols, b.vals,
                    reg_c=float(opt.reg_c), **com)
        return C, Cb

    def fence(*arrs):
        return [np.asarray(a[:64]) for a in arrs]

    def tables():
        # fresh device copies each run: the phase kernels DONATE their
        # updated tables
        return (jax.device_put(m.U), jax.device_put(m.I),
                jax.device_put(m.C), jax.device_put(m.Ib),
                jax.device_put(m.Cb))

    for name, fn in (
            ("user", lambda t: run_user(t[0], t[1])),
            ("item", lambda t: run_item(*t)),
            ("context", lambda t: run_ctx(t[2], t[1], t[3], t[4]))):
        out = fn(tables())
        fence(*(out if isinstance(out, tuple) else (out,)))   # warm
        t = tables()
        st = time.perf_counter()
        out = fn(t)
        fence(*(out if isinstance(out, tuple) else (out,)))
        dt = time.perf_counter() - st
        print(json.dumps({"phase": name, "s": round(dt, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
