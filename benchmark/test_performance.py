"""Training-throughput sweeps, reproducing the reference's tables.

Reference tables (``benchmark/README.md:73-160``): ALS and BPR epoch
time vs dimension D in {10, 20, 40, 80, 160} and vs worker count; here
"workers" becomes devices, so the D sweep is the primary axis on one
chip and the device sweep is exercised through ``--devices`` on a CPU
mesh or a real multi-chip slice.

Usage:
  python benchmark/test_performance.py --algo als --dataset ml20m
  python benchmark/test_performance.py --algo bpr --d 10 20 40
  python benchmark/test_performance.py --mm /path/to/main.mtx

Prints one markdown table row per configuration plus a JSON line per
row (machine-readable).
"""
from __future__ import annotations

import argparse
import sys as _sys
from pathlib import Path as _Path

_here = _Path(__file__).resolve().parent
_sys.path.insert(0, str(_here))          # sibling models.py
_sys.path.insert(0, str(_here.parent))   # repo root (buffalo_tpu)
import json
import os
import tempfile

from models import (DATASET_SHAPES, build_data, fit_algo,
                    pin_cpu_if_requested, write_synth_mm)


def _apply_overrides(opt, overrides):
    for k, v in (overrides or {}).items():
        opt[k] = v
    return opt


def run_als(data, d, num_epochs, optimizer=None, overrides=None):
    from buffalo_tpu import ALS, ALSOption
    opt = ALSOption().get_default_option()
    opt.d = d
    opt.num_iters = num_epochs
    opt.compute_loss_on_training = True
    opt.resident_mb = 8192
    if optimizer:
        opt.optimizer = optimizer
    return fit_algo(ALS, _apply_overrides(opt, overrides), data, num_epochs)


def run_bpr(data, d, num_epochs, optimizer="sgd", overrides=None):
    from buffalo_tpu import BPRMF, BPRMFOption
    opt = BPRMFOption().get_default_option()
    opt.d = d
    opt.num_iters = num_epochs
    opt.optimizer = optimizer
    opt.resident_mb = 8192
    return fit_algo(BPRMF, _apply_overrides(opt, overrides), data,
                    num_epochs)


def run_warp(data, d, num_epochs, optimizer=None, overrides=None):
    from buffalo_tpu import WARP
    from buffalo_tpu.models.options import WARPOption
    opt = WARPOption().get_default_option()
    opt.d = d
    opt.num_iters = num_epochs
    if optimizer:
        opt.optimizer = optimizer
    opt.resident_mb = 8192
    return fit_algo(WARP, _apply_overrides(opt, overrides), data,
                    num_epochs)


def run_eals(data, d, num_epochs, optimizer=None, overrides=None):
    from buffalo_tpu import EALS
    from buffalo_tpu.models.options import EALSOption
    opt = EALSOption().get_default_option()
    opt.d = d
    opt.num_iters = num_epochs
    return fit_algo(EALS, _apply_overrides(opt, overrides), data,
                    num_epochs)


def run_plsi(data, d, num_epochs, optimizer=None, overrides=None):
    from buffalo_tpu import PLSI
    from buffalo_tpu.models.options import PLSIOption
    opt = PLSIOption().get_default_option()
    opt.d = d
    opt.num_iters = num_epochs
    return fit_algo(PLSI, _apply_overrides(opt, overrides), data,
                    num_epochs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", default="als",
                    choices=["als", "bpr", "warp", "eals", "plsi", "both"])
    ap.add_argument("--dataset", default="ml20m",
                    choices=sorted(DATASET_SHAPES))
    ap.add_argument("--mm", default=None,
                    help="real MatrixMarket file instead of synthetic")
    ap.add_argument("--d", type=int, nargs="+",
                    default=[10, 20, 40, 80, 160])
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--devices", type=int, default=0,
                    help="force an n-device CPU mesh (0 = default backend)")
    ap.add_argument("--db", default=None, help="cache dir for built data")
    ap.add_argument("--set", nargs="*", default=[], metavar="K=V",
                    dest="overrides",
                    help="algo option overrides, e.g. epoch_dispatch=split"
                         " optimizer=adagrad batch_size=65536")
    args = ap.parse_args()

    overrides = {}
    for kv in args.overrides:
        k, _, v = kv.partition("=")
        try:
            overrides[k] = json.loads(v)
        except json.JSONDecodeError:
            overrides[k] = v

    # a --devices CPU mesh implies the CPU pin; otherwise honor the env
    if pin_cpu_if_requested(force=bool(args.devices)) and args.devices:
        import jax
        jax.config.update("jax_num_cpu_devices", args.devices)

    mm = args.mm or write_synth_mm(args.dataset)
    db = args.db or os.path.join(tempfile.gettempdir(),
                                 f"bt_bench_db_{args.dataset}")
    data = build_data(mm, db)

    algos = ["als", "bpr"] if args.algo == "both" else [args.algo]
    runners = {"als": run_als, "bpr": run_bpr, "warp": run_warp,
               "eals": run_eals, "plsi": run_plsi}
    print("| algo | dataset | d | epoch_s | total_s | peak_rss_mb |")
    print("|---|---|---|---|---|---|")
    for algo in algos:
        for d in args.d:
            r = runners[algo](data, d, args.epochs, overrides=overrides)
            r.pop("algo")
            print(f"| {algo} | {args.dataset} | {d} "
                  f"| {r['epoch_s']} | {r['total_s']} | {r['peak_rss_mb']} |")
            print(json.dumps({"algo": algo, "dataset": args.dataset,
                              "d": d, **r}))


if __name__ == "__main__":
    main()
