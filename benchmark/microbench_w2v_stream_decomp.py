"""Decomposition of the device-pair-gen W2V epoch (r5: 5.92 s at the
brunch stream shape) — which term dominates now?

Terms measured separately at the full synthetic stream shape:
  host      — per-epoch subsample + compaction + window draws (numpy)
  upload    — device_put of the (nchunks, T) words/sents/half arrays
              (~144 MB int32 over the ~40 MB/s tunnel; the candidate
              next win is uint8 boundaries + uint8 half = 72 MB)
  dispatch  — the jitted epoch groups with PRE-STAGED inputs, fenced

  python benchmark/microbench_w2v_stream_decomp.py --epochs 2
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
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--offset-mode", default="scan",
                    choices=["unrolled", "scan"],
                    help="w2v_epoch_stream offset_mode (compile-size vs fusion A/B)")
    args = ap.parse_args()
    if args.smoke:
        pin_cpu_if_requested(force=True)
        S.USERS, S.ITEMS, S.NNZ = 600, 400, 12_000

    import jax
    import jax.numpy as jnp

    from buffalo_tpu import utils
    from buffalo_tpu.models import W2V
    from buffalo_tpu.models.options import W2VOption
    from buffalo_tpu.ops import sgd_kernels as K
    from buffalo_tpu.ops.w2v_kernels import w2v_epoch_stream

    utils.enable_compilation_cache()
    tag = "_smoke" if args.smoke else ""
    stream = S.write_synth_stream(
        os.path.join(tempfile.gettempdir(), "bt_stream_corpus" + tag),
        smoke=args.smoke)
    data = S.build(stream, os.path.join(tempfile.gettempdir(),
                                        "bt_stream_w2v" + tag))
    opt = W2VOption().get_default_option()
    opt.d = args.d
    opt.min_count = 2
    np.random.seed(0)
    m = W2V(opt, data=data)
    m.initialize()
    V = int(m._vocab.size)
    d = int(opt.d)
    width = K.resolve_stored_width(d, 0)
    L0 = jax.device_put(K.pad_cols(m.L0, width))
    L1 = jax.device_put(K.pad_cols(m.L1, width))
    dist = jax.device_put(K.build_alias_table(
        np.diff(np.asarray(m._vocab.dist, dtype=np.int64), prepend=0)))
    rng_np = np.random.default_rng(0)
    rng = jax.random.PRNGKey(0)

    window = int(opt.window)
    n_all = len(m._token_stream()[0])
    block = min(128, max(16, 1 << int(np.log2(max(n_all // 256, 16)))))
    T = min(1 << 17, max(block, -(-n_all // (4 * block)) * block))
    T = -(-T // block) * block
    G = 32
    raw_words = float(m._vocab.total_word_count)
    stat = dict(window=window, block=block, num_negatives=5,
                vocab_size=V, compute_loss=True, max_step_norm=0.1,
                offset_mode=args.offset_mode)

    def host_phase():
        all_words, all_sents = m._token_stream()
        r = rng_np.integers(0, 1 << 32, size=len(all_words),
                            dtype=np.uint64)
        keep = m._vocab.scale[all_words].astype(np.uint64) > r
        words = all_words[keep]
        sents = all_sents[keep]
        n = len(words)
        h = (window - rng_np.integers(0, window, size=n)).astype(np.uint8)
        bnd = np.ones(n, np.uint8)
        if n > 1:
            bnd[1:] = sents[1:] != sents[:-1]
        nchunks = -(-max(1, -(-n // T)) // 4) * 4
        if nchunks > G:
            nchunks = -(-nchunks // G) * G
        pad = nchunks * T - n
        wc = np.concatenate([words, np.full(pad, V, np.int32)]) \
            .reshape(nchunks, T)
        sc = np.concatenate([bnd, np.ones(pad, np.uint8)]) \
            .reshape(nchunks, T)
        hc = np.concatenate([h, np.zeros(pad, np.uint8)]) \
            .reshape(nchunks, T)
        return wc, sc, hc, nchunks

    print(json.dumps({"config": "w2v_stream_decomp",
                      "backend": jax.default_backend(), "vocab": V,
                      "T": T, "block": block,
                      "offset_mode": args.offset_mode}), flush=True)

    for ep in range(args.epochs):
        t0 = time.perf_counter()
        wc, sc, hc, nchunks = host_phase()
        t_host = time.perf_counter() - t0
        g_len = min(G, nchunks)
        groups = nchunks // g_len

        t0 = time.perf_counter()
        staged = []
        for g in range(groups):
            sl = slice(g * g_len, (g + 1) * g_len)
            staged.append((jax.device_put(wc[sl]),
                           jax.device_put(sc[sl]),
                           jax.device_put(hc[sl])))
        jax.block_until_ready(staged[-1][0])
        t_up = time.perf_counter() - t0

        rng2, sub = jax.random.split(jax.random.fold_in(rng, ep))
        wpc = raw_words / max(nchunks, 1)
        t0 = time.perf_counter()
        for g, (w_, s_, h_) in enumerate(staged):
            sub_g = jax.random.fold_in(sub, g) if groups > 1 else sub
            L0, L1, l_, c_ = w2v_epoch_stream(
                L0, L1, w_, s_, h_, sub_g,
                jnp.float32(ep * raw_words + g * g_len * wpc), dist,
                lr=0.025, min_lr=1e-4,
                total_words=raw_words * args.epochs,
                words_per_chunk=wpc, **stat)
        np.asarray(l_)  # fence
        t_disp = time.perf_counter() - t0
        mb = sum(a.nbytes for a in (wc, sc, hc)) / 1e6
        print(json.dumps({"epoch": ep, "host_s": round(t_host, 3),
                          "upload_s": round(t_up, 3),
                          "upload_mb": round(mb, 1),
                          "dispatch_s": round(t_disp, 3)}), flush=True)


if __name__ == "__main__":
    main()
