"""IVF vs exact scan at the multi-million-item scale the IVF story
claims (VERDICT r4 #6).

The r4 platform split ("dense MXU scan to >= 500k items; IVF for CPU
hosts and multi-million catalogs") was decided on data up to 505k
items.  This bench measures the claim's other side: a synthetic
5M x d=64 catalog, 10k queries, exact `batch_topn` vs IVF at several
probes, warm programs, on whichever backend it runs under (queue it
once on the TPU and once with JAX_PLATFORMS=cpu).

  python benchmark/microbench_ivf_5m.py --items 5000000 --d 64
  JAX_PLATFORMS=cpu python benchmark/microbench_ivf_5m.py \
      --items 5000000 --queries 1000   # CPU side, fewer queries

Prints one JSON line per op: seconds per query batch + recall@10.
"""
from __future__ import annotations

import argparse
import json
import sys as _sys
import time
from pathlib import Path as _Path

_here = _Path(__file__).resolve().parent
_sys.path.insert(0, str(_here))
_sys.path.insert(0, str(_here.parent))

import numpy as np

from models import pin_cpu_if_requested

pin_cpu_if_requested()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=5_000_000)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--queries", type=int, default=10_000)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--n_probe", type=int, nargs="+",
                    default=[8, 32, 64])
    ap.add_argument("--spill", type=int, default=2)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        pin_cpu_if_requested(force=True)
        args.items, args.queries = 20_000, 200
        args.n_probe = [8]

    import jax

    from buffalo_tpu import utils
    from buffalo_tpu.ops.topk import batch_topn
    from buffalo_tpu.parallel.ann import IVFIndex

    utils.enable_compilation_cache()
    rng = np.random.default_rng(7)
    # clustered factors (isotropic gaussians around planted centers):
    # harder for IVF than pure noise, the realistic regime for
    # converged embedding tables
    k_true = max(64, args.items // 20_000)
    centers = rng.standard_normal((k_true, args.d)).astype(np.float32)
    assign = rng.integers(0, k_true, args.items)
    table = centers[assign] + 0.5 * rng.standard_normal(
        (args.items, args.d)).astype(np.float32)
    table /= np.linalg.norm(table, axis=1, keepdims=True) + 1e-12
    qs = table[rng.integers(0, args.items, args.queries)] \
        + 0.1 * rng.standard_normal(
            (args.queries, args.d)).astype(np.float32)
    qs = qs.astype(np.float32)

    print(json.dumps({"config": "ivf_5m",
                      "backend": jax.default_backend(),
                      "items": args.items, "d": args.d,
                      "queries": args.queries}), flush=True)

    # exact scan (warm + timed)
    exact_ids, _ = batch_topn(qs, table, topk=args.topk)
    st = time.perf_counter()
    exact_ids, _ = batch_topn(qs, table, topk=args.topk)
    exact_t = time.perf_counter() - st
    print(json.dumps({"op": "exact_scan", "s": round(exact_t, 3),
                      "qps": round(args.queries / exact_t)}), flush=True)

    # approx_max_k variant
    ax_ids, _ = batch_topn(qs, table, topk=args.topk, approx=True)
    st = time.perf_counter()
    ax_ids, _ = batch_topn(qs, table, topk=args.topk, approx=True)
    ax_t = time.perf_counter() - st
    rec = np.mean([len(set(a) & set(e)) / len(e)
                   for a, e in zip(ax_ids, exact_ids)])
    print(json.dumps({"op": "approx_max_k", "s": round(ax_t, 3),
                      "qps": round(args.queries / ax_t),
                      "recall": round(float(rec), 4)}), flush=True)

    st = time.perf_counter()
    index = IVFIndex.build(table, n_probe=max(args.n_probe),
                           spill=args.spill)
    build_t = time.perf_counter() - st
    print(json.dumps({"op": "ivf_build", "s": round(build_t, 1),
                      "clusters": len(index.centroids)}), flush=True)
    for n_probe in args.n_probe:
        index.n_probe = n_probe
        index.search(qs, topk=args.topk)          # warm tile shapes
        st = time.perf_counter()
        ids, _ = index.search(qs, topk=args.topk)
        dt = time.perf_counter() - st
        rec = np.mean([len(set(a) & set(e)) / len(e)
                       for a, e in zip(ids, exact_ids)])
        print(json.dumps({"op": f"ivf_probe{n_probe}",
                          "s": round(dt, 3),
                          "qps": round(args.queries / dt),
                          "recall": round(float(rec), 4)}), flush=True)


if __name__ == "__main__":
    main()
