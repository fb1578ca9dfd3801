"""Micro-benchmark: where does the WARP epoch's wall-clock go?

WARP measured 29.6 s/epoch (ML-20M d=32) vs sibling BPR's 3.05 s on
shared machinery (VERDICT r3).  The fixed-K candidate search does
K=64x BPR's per-positive sampling work: per epoch at ML-20M that is
~1.28B Q-row gathers, ~1.28B bloom probes, ~1.28B threefry draws and
a (B, K) score/cumsum/argmax pipeline.  This bench isolates each term
with ablation epochs that are PARITY-CHECKED against the production
kernel (the no-ablation body must produce bit-identical factors), so
the measured splits are splits of the real program:

  baseline   the production ``warp_epoch`` at K = 8/16/32/64
  no_bloom   seen := all-False        (removes bloom probe gathers+hash)
  no_gather  qc := broadcast Q[0]     (removes the (N,K,d) row gather)
  no_rng     candidates := iota mix   (removes threefry bit generation)
  no_score   uj := 0                  (removes the candidate score math)

Run on the chip when the service is healthy:
  python benchmark/microbench_warp.py [--d 32] [--nnz 20000000]
CPU smoke:
  JAX_PLATFORMS=cpu python benchmark/microbench_warp.py --smoke
"""
from __future__ import annotations

import argparse
import json
import sys as _sys
import time
from functools import partial
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import numpy as np


def synth_csr(num_users, num_items, nnz, seed=0):
    """Popularity-skewed (user, item) positives, CSR by user."""
    rng = np.random.default_rng(seed)
    # zipf-ish item popularity like real interaction data
    pop = 1.0 / np.arange(1, num_items + 1) ** 0.8
    pop /= pop.sum()
    items = rng.choice(num_items, size=nnz, p=pop).astype(np.int32)
    users = rng.integers(0, num_users, size=nnz).astype(np.int32)
    order = np.argsort(users, kind="stable")
    users, items = users[order], items[order]
    indptr = np.zeros(num_users + 1, dtype=np.int64)
    np.add.at(indptr, users + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, users, items


def driver_batch_size(nnz, d, max_trials=500):
    """The PRODUCTION batch-sizing rule (imported, not copied, so the
    profile's chunk geometry cannot drift from real warp_epoch runs)."""
    from buffalo_tpu.models.warp import default_batch_size

    return default_batch_size(nnz, d, max_trials)


def make_ablate_epoch(ablate: frozenset):
    """A copy of ops/warp_kernels.warp_epoch's body with ablation
    branches; with ``ablate=frozenset()`` it is parity-checked against
    the production kernel below (bit-identical factors)."""
    import jax
    import jax.numpy as jnp

    from buffalo_tpu.ops.sgd_kernels import (adagrad_update, adam_update,
                                             bloom_contains)
    from buffalo_tpu.ops.warp_kernels import _scores, project_unit_ball

    @partial(jax.jit, static_argnames=(
        "optimizer", "num_items", "num_candidates", "score_func",
        "threshold", "reg_u", "reg_i", "reg_j", "lr", "beta1", "beta2",
        "num_valid", "bloom_log2"), donate_argnums=(0, 1, 2))
    def epoch(P, Q, opt_state, users, positives, indptr, bloom_words,
              rng_key, step, *, optimizer, num_items, num_candidates,
              score_func, threshold, reg_u, reg_i, reg_j, lr, beta1,
              beta2, num_valid, bloom_log2):
        nchunks, N = users.shape

        def body(carry, xs):
            gP, gQ, found, possible = carry
            u_chunk, pos_chunk, cidx = xs
            key = jax.random.fold_in(rng_key, cidx)
            base = cidx * N
            valid = ((base + jnp.arange(N, dtype=jnp.int32))
                     < num_valid).astype(jnp.float32)
            p = jnp.take(P, u_chunk, axis=0)
            qi = jnp.take(Q, pos_chunk, axis=0)
            ui = _scores(p, qi, score_func)
            if "rng" in ablate:
                mix = (u_chunk[:, None] * np.uint32(2654435761)
                       + jnp.arange(num_candidates,
                                    dtype=jnp.uint32)[None, :]
                       + jnp.uint32(cidx))
                cand = (mix % jnp.uint32(num_items)).astype(jnp.int32)
            else:
                cand = jax.random.randint(
                    key, (N, num_candidates), 0, num_items,
                    dtype=jnp.int32)
            if "bloom" in ablate:
                seen = jnp.zeros((N, num_candidates), jnp.bool_)
            else:
                seen = jax.vmap(lambda c: bloom_contains(
                    bloom_words, bloom_log2, u_chunk, c),
                                in_axes=1, out_axes=1)(cand)
            if "gather" in ablate:
                qc = jnp.broadcast_to(Q[0][None, None, :],
                                      (N, num_candidates, Q.shape[1]))
            else:
                qc = jnp.take(Q, cand, axis=0)
            if "score" in ablate:
                uj = jnp.zeros((N, num_candidates), jnp.float32)
            else:
                uj = _scores(p[:, None, :], qc, score_func)
            violating = (~seen) & ((ui[:, None] - uj) < threshold)
            any_v = jnp.any(violating, axis=1)
            f = jnp.argmax(violating, axis=1)
            tried = jnp.cumsum((~seen).astype(jnp.int32), axis=1)
            v = jnp.take_along_axis(tried, f[:, None], axis=1)[:, 0]
            trial = jnp.maximum(2 * v, 1)
            seen_size = (indptr[u_chunk + 1]
                         - indptr[u_chunk]).astype(jnp.int32)
            avail = jnp.maximum(num_items - seen_size - 1, 0)
            phi = jnp.log(jnp.maximum(
                1, (avail // trial)).astype(jnp.float32))
            w = jnp.where(any_v, phi, 0.0) * valid
            neg = jnp.take_along_axis(cand, f[:, None], axis=1)[:, 0]
            qj = jnp.take_along_axis(qc, f[:, None, None],
                                     axis=1)[:, 0, :]
            u_deriv = w[:, None] * (qi - qj)
            i_deriv = w[:, None] * p
            j_deriv = -i_deriv
            m = (any_v.astype(jnp.float32) * valid)[:, None]
            gP = gP.at[u_chunk].add(u_deriv - m * reg_u * p)
            gQ = gQ.at[pos_chunk].add(i_deriv - m * reg_i * qi)
            gQ = gQ.at[neg].add(j_deriv - m * reg_j * qj)
            found = found + jnp.sum(any_v.astype(jnp.float32) * valid)
            possible = possible + jnp.sum(valid)
            return (gP, gQ, found, possible), None

        init = (jnp.zeros_like(P), jnp.zeros_like(Q),
                jnp.float32(0.0), jnp.float32(0.0))
        (gP, gQ, found, possible), _ = jax.lax.scan(
            body, init, (users, positives,
                         jnp.arange(users.shape[0])))

        def apply(param, grad, m, v, reg):
            grad = grad - 2.0 * reg * param
            if optimizer == "adam":
                delta, m, v = adam_update(grad, m, v, step, lr, beta1,
                                          beta2)
            else:
                delta, v = adagrad_update(grad, v, lr)
            return param + delta, m, v

        P, mP, vP = apply(P, gP, opt_state["mP"], opt_state["vP"],
                          reg_u)
        Q, mQ, vQ = apply(Q, gQ, opt_state["mQ"], opt_state["vQ"],
                          reg_i)
        new_state = dict(opt_state, mP=mP, vP=vP, mQ=mQ, vQ=vQ)
        return (project_unit_ball(P), project_unit_ball(Q), new_state,
                found / jnp.maximum(possible, 1.0))

    return epoch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--num_users", type=int, default=138_493)
    ap.add_argument("--num_items", type=int, default=26_744)
    ap.add_argument("--nnz", type=int, default=20_000_000)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--k", type=int, nargs="+", default=[8, 16, 32, 64])
    ap.add_argument("--probe", default="lazy", choices=["lazy", "all"],
                    help="probe mode for the production-kernel rows "
                         "(the r4 lazy-probe optimization; ablation "
                         "rows always replicate the all-probe body)")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    from buffalo_tpu.utils import enable_compilation_cache, pin_cpu
    if args.smoke:
        pin_cpu(force=True)
        args.num_users, args.num_items = 2000, 1000
        args.nnz = 100_000
    else:
        pin_cpu()
    import threading

    def _watchdog():
        import os
        print(json.dumps({"error": "backend init exceeded 900 s"}))
        os._exit(3)

    timer = threading.Timer(900.0, _watchdog)
    timer.daemon = True
    timer.start()
    import jax
    jax.devices()
    timer.cancel()
    enable_compilation_cache()
    import jax.numpy as jnp

    from buffalo_tpu.ops import sgd_kernels as K
    from buffalo_tpu.ops import warp_kernels as W

    d = args.d
    indptr, users, items = synth_csr(args.num_users, args.num_items,
                                     args.nnz)
    bloom_np, bloom_log2 = K.build_bloom(indptr, items)
    batch = driver_batch_size(args.nnz, d)
    nchunks = -(-args.nnz // batch)
    pad = nchunks * batch - args.nnz
    if pad:
        users = np.concatenate([users, np.zeros(pad, np.int32)])
        items = np.concatenate([items, np.zeros(pad, np.int32)])
    users_c = jax.device_put(users.reshape(nchunks, batch))
    items_c = jax.device_put(items.reshape(nchunks, batch))
    indptr_d = jax.device_put(indptr)
    bloom = jax.device_put(bloom_np)
    print(json.dumps({"config": "warp_microbench", "d": d,
                      "nnz": args.nnz, "batch": batch,
                      "nchunks": nchunks,
                      "backend": jax.default_backend()}))

    rng = np.random.default_rng(1)

    def fresh_state():
        P = jax.device_put(
            (rng.standard_normal((args.num_users, d)) / d)
            .astype(np.float32))
        Q = jax.device_put(
            (rng.standard_normal((args.num_items, d)) / d)
            .astype(np.float32))
        st = {"mP": jnp.zeros_like(P), "vP": jnp.zeros_like(P),
              "mQ": jnp.zeros_like(Q), "vQ": jnp.zeros_like(Q)}
        return P, Q, st

    statics = dict(optimizer="adagrad", num_items=args.num_items,
                   score_func="dot", threshold=1.0, reg_u=0.0,
                   reg_i=0.0, reg_j=0.0, lr=0.05, beta1=0.9,
                   beta2=0.999, num_valid=args.nnz,
                   bloom_log2=bloom_log2)
    full_statics = dict(statics, update_i=True, update_j=True,
                        per_coordinate_normalize=False)

    def run(epoch_fn, st_extra, name, num_candidates):
        P, Q, st = fresh_state()
        key = jax.random.PRNGKey(0)
        # warmup epoch (compile + first program load)
        t0 = time.perf_counter()
        P, Q, st, ff = epoch_fn(P, Q, st, users_c, items_c, indptr_d,
                                bloom, key, jnp.int32(0),
                                num_candidates=num_candidates,
                                **st_extra)
        np.asarray(P[::4096])
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        for e in range(args.epochs):
            P, Q, st, ff = epoch_fn(P, Q, st, users_c, items_c,
                                    indptr_d, bloom,
                                    jax.random.PRNGKey(e + 1),
                                    jnp.int32(e + 1),
                                    num_candidates=num_candidates,
                                    **st_extra)
        np.asarray(P[::4096])
        el = (time.perf_counter() - t0) / args.epochs
        print(json.dumps({"name": name, "K": num_candidates,
                          "epoch_s": round(el, 3),
                          "warmup_s": round(warm, 1),
                          "found_frac": round(float(ff), 4)}))
        return el

    # parity gate: the ablation body with NO ablations == production
    # kernel, bit-identical (tiny shape, separate from timings)
    P0, Q0, st0 = fresh_state()
    P0b, Q0b = jnp.array(P0), jnp.array(Q0)
    st0b = jax.tree.map(jnp.array, st0)
    k_par = min(args.k)
    prod = W.warp_epoch(P0, Q0, st0, users_c[:2], items_c[:2],
                        indptr_d, bloom, jax.random.PRNGKey(9),
                        jnp.int32(0), None, precomputed_probe=False,
                        probe="all",   # the ablation body replicates
                                       # the all-probe semantics
                        num_candidates=k_par, **full_statics)
    abl = make_ablate_epoch(frozenset())(
        P0b, Q0b, st0b, users_c[:2], items_c[:2], indptr_d, bloom,
        jax.random.PRNGKey(9), jnp.int32(0),
        num_candidates=k_par, **statics)
    np.testing.assert_array_equal(np.asarray(prod[0]),
                                  np.asarray(abl[0]))
    np.testing.assert_array_equal(np.asarray(prod[1]),
                                  np.asarray(abl[1]))
    print(json.dumps({"parity": "ablation body == warp_epoch",
                      "ok": True}))

    # production kernel: K sweep at the requested probe mode
    def prod_epoch(P, Q, st, u, it, ip, bl, key, step, *,
                   num_candidates):
        return W.warp_epoch(P, Q, st, u, it, ip, bl, key, step, None,
                            precomputed_probe=False, probe=args.probe,
                            num_candidates=num_candidates,
                            **full_statics)

    for k in args.k:
        run(prod_epoch, {}, f"warp_epoch[{args.probe}]", k)

    # ablations at max K
    kmax = max(args.k)
    for abl_name in ("bloom", "gather", "rng", "score"):
        fn = make_ablate_epoch(frozenset([abl_name]))

        def abl_epoch(P, Q, st, u, it, ip, bl, key, step, *,
                      num_candidates, _fn=fn):
            return _fn(P, Q, st, u, it, ip, bl, key, step,
                       num_candidates=num_candidates, **statics)

        run(abl_epoch, {}, f"no_{abl_name}", kmax)


if __name__ == "__main__":
    main()
