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

from models import DATASET_SHAPES, build_data, fit_algo, write_synth_mm


def run_als(data, d, num_epochs, optimizer=None):
    from buffalo_tpu import ALS, ALSOption
    opt = ALSOption().get_default_option()
    opt.d = d
    opt.num_iters = num_epochs
    opt.compute_loss_on_training = True
    opt.resident_mb = 8192
    if optimizer:
        opt.optimizer = optimizer
    return fit_algo(ALS, opt, data, num_epochs)


def run_bpr(data, d, num_epochs, optimizer="sgd"):
    from buffalo_tpu import BPRMF, BPRMFOption
    opt = BPRMFOption().get_default_option()
    opt.d = d
    opt.num_iters = num_epochs
    opt.optimizer = optimizer
    opt.resident_mb = 8192
    return fit_algo(BPRMF, opt, data, num_epochs)


def run_eals(data, d, num_epochs, optimizer=None):
    from buffalo_tpu import EALS
    from buffalo_tpu.models.options import EALSOption
    opt = EALSOption().get_default_option()
    opt.d = d
    opt.num_iters = num_epochs
    return fit_algo(EALS, opt, data, num_epochs)


def run_plsi(data, d, num_epochs, optimizer=None):
    from buffalo_tpu import PLSI
    from buffalo_tpu.models.options import PLSIOption
    opt = PLSIOption().get_default_option()
    opt.d = d
    opt.num_iters = num_epochs
    return fit_algo(PLSI, opt, data, num_epochs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", default="als",
                    choices=["als", "bpr", "eals", "plsi", "both"])
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
    args = ap.parse_args()

    if args.devices:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)

    mm = args.mm or write_synth_mm(args.dataset)
    db = args.db or os.path.join(tempfile.gettempdir(),
                                 f"bt_bench_db_{args.dataset}")
    data = build_data(mm, db)

    algos = ["als", "bpr"] if args.algo == "both" else [args.algo]
    runners = {"als": run_als, "bpr": run_bpr, "eals": run_eals,
               "plsi": run_plsi}
    print("| algo | dataset | d | epoch_s | total_s | peak_rss_mb |")
    print("|---|---|---|---|---|---|")
    for algo in algos:
        for d in args.d:
            r = runners[algo](data, d, args.epochs)
            r.pop("algo")
            print(f"| {algo} | {args.dataset} | {d} "
                  f"| {r['epoch_s']} | {r['total_s']} | {r['peak_rss_mb']} |")
            print(json.dumps({"algo": algo, "dataset": args.dataset,
                              "d": d, **r}))


if __name__ == "__main__":
    main()
