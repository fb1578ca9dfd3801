"""Summarize a run_tpu_measurements.sh output directory.

Parses the one-line JSON records each harness prints, joins them with
the reference numbers from BASELINE.md, and emits a markdown report —
so a measurement session turns into updated tables in one step.

Usage:
  python benchmark/summarize_measurements.py [/tmp/bt_tpu_measurements]
"""
from __future__ import annotations

import glob
import json
import os
import sys

# reference numbers (BASELINE.md) keyed like our JSON records
REF_EPOCH_S = {
    # (algo, dataset, d): seconds/epoch on the reference CPU box (T=8)
    ("als", "ml20m", 10): 4.29, ("als", "ml20m", 20): 6.42,
    ("als", "ml20m", 40): 11.32, ("als", "ml20m", 80): 30.00,
    ("als", "ml20m", 160): 76.18,
    ("als", "kakao_brunch_12m", 10): 7.42,
    ("als", "kakao_brunch_12m", 20): 9.37,
    ("als", "kakao_brunch_12m", 40): 14.57,
    ("als", "kakao_brunch_12m", 80): 37.26,
    ("als", "kakao_brunch_12m", 160): 122.59,
    ("bpr", "kakao_brunch_12m", 10): 17.20,
    ("bpr", "kakao_brunch_12m", 20): 14.64,
    ("bpr", "kakao_brunch_12m", 40): 15.69,
    ("bpr", "kakao_brunch_12m", 80): 16.66,
    ("bpr", "kakao_brunch_12m", 160): 23.43,
}
REF_GPU_EPOCH_S = {
    ("als", "ml20m", 10): 4.30, ("als", "ml20m", 20): 4.25,
    ("als", "ml20m", 40): 5.69, ("als", "ml20m", 80): 7.16,
    ("als", "ml20m", 160): 10.10,
    ("als", "kakao_brunch_12m", 10): 4.08,
    ("als", "kakao_brunch_12m", 20): 4.01,
    ("als", "kakao_brunch_12m", 40): 5.20,
    ("als", "kakao_brunch_12m", 80): 6.26,
    ("als", "kakao_brunch_12m", 160): 9.16,
}
REF_RETRIEVAL = {"exact_1t": 63.93, "exact_4t": 21.76, "hnsw_1t": 0.223}


def parse_records(outdir: str):
    recs = []
    for path in sorted(glob.glob(os.path.join(outdir, "*.log"))):
        # meta-logs re-echo every step's lines (tee) — skip to avoid
        # duplicate rows
        if os.path.basename(path) in ("runner.log", "followups.log"):
            continue
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{") and line.endswith("}"):
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    rec["_log"] = os.path.basename(path)
                    recs.append(rec)
    return recs


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bt_tpu_measurements"
    recs = parse_records(outdir)
    if not recs:
        print(f"no JSON records found under {outdir}")
        return

    print("# TPU measurement summary\n")

    train = [r for r in recs if "epoch_s" in r and "algo" in r]
    if train:
        print("## Training epochs\n")
        print("| algo | dataset | d | epoch_s (TPU) | ref CPU T=8 | "
              "speedup | ref GPU | vs GPU | log |")
        print("|---|---|---|---|---|---|---|---|---|")
        for r in train:
            key = (r["algo"], r.get("dataset", "?"), r.get("d", 0))
            ref = REF_EPOCH_S.get(key)
            gpu = REF_GPU_EPOCH_S.get(key)
            e = r["epoch_s"]
            print(f"| {key[0]} | {key[1]} | {key[2]} | {e} "
                  f"| {ref or '—'} "
                  f"| {f'{ref / e:.1f}x' if ref and e else '—'} "
                  f"| {gpu or '—'} "
                  f"| {f'{gpu / e:.1f}x' if gpu and e else '—'} "
                  f"| {r['_log']} |")
        print()

    bench = [r for r in recs if r.get("metric", "").startswith("als_ml20m")]
    for r in bench:
        print(f"**Headline** `{r['metric']}` = {r['value']} {r['unit']} "
              f"({r.get('vs_baseline', '?')}x baseline)\n")

    retr = [r for r in recs if "most_similar_s" in r]
    if retr:
        print("## Retrieval (10k-query class)\n")
        print("| queries | d | exact_s | vs ref 1t/4t | ann rows "
              "(probe, s, recall) | vs HNSW 1t |")
        print("|---|---|---|---|---|---|")
        for r in retr:
            ms = r["most_similar_s"]
            rows = r.get("ann_rows") or (
                [[r.get("n_probe"), r["ann_s"], r.get("ann_recall")]]
                if "ann_s" in r else [])
            # compare against HNSW at our HIGHEST-recall operating
            # point — never quote ANN speed detached from its recall
            top = max(rows, key=lambda pr: pr[2] or 0) if rows else None
            vs_hnsw = (f"{REF_RETRIEVAL['hnsw_1t'] / top[1]:.2f}x at "
                       f"recall {top[2]}" if top else "—")
            print(f"| {r['queries']} | {r['d']} | {ms} "
                  f"| {REF_RETRIEVAL['exact_1t'] / ms:.0f}x / "
                  f"{REF_RETRIEVAL['exact_4t'] / ms:.0f}x "
                  f"| {rows or '—'} | {vs_hnsw} |")
        print()

    other = [r for r in recs if r not in train and r not in bench
             and r not in retr]
    if other:
        print("## Other records\n")
        for r in other:
            print(f"- `{r['_log']}`: "
                  + ", ".join(f"{k}={v}" for k, v in r.items()
                              if not k.startswith("_")))


if __name__ == "__main__":
    main()
