#!/usr/bin/env bash
# Serialized TPU measurement session (ONE chip — never run two jobs
# concurrently; see CLAUDE.md).  Run when the TPU service is healthy:
#
#   bash benchmark/run_tpu_measurements.sh [outdir]
#
# Collects, in priority order: headline bench, stream-scale W2V/CFR,
# the BPR fused-vs-split ablation (CLAUDE.md "wall-clock mystery"),
# WARP/BPR/ALS BASELINE configs, retrieval + IVF, the brunch d-sweep,
# and eALS/pLSI regressions.  Every step runs under `timeout`, and the
# service is re-probed before each step: if it wedges mid-session the
# script aborts with the partial logs instead of burning the remaining
# steps' full timeouts.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/bt_tpu_measurements}
mkdir -p "$OUT"
log() { echo "[$(date -u +%H:%M:%S)] $*"; }

probe() {
    timeout 300 python -c "
import jax
d = jax.devices()
assert d and d[0].platform == 'tpu', d
import jax.numpy as jnp
(jnp.ones((256,256)) @ jnp.ones((256,256))).block_until_ready()
" 2>/dev/null
}

# step <label> <log-name> <timeout-s> <cmd...>: health-gate, run, tee
step() {
    local label=$1 name=$2 to=$3; shift 3
    if ! probe; then
        log "$label: TPU service unhealthy — aborting session"
        log "partial logs in $OUT"
        summarize
        exit 1
    fi
    log "$label"
    timeout "$to" "$@" 2>&1 | tee "$OUT/$name.log"
}

summarize() {
    grep -h '^{' "$OUT"/*.log 2>/dev/null | tail -40
    python benchmark/summarize_measurements.py "$OUT" \
        | tee "$OUT/SUMMARY.md"
}

log "0/10 pre-flight TPU probe"
if ! probe; then
    log "TPU service not healthy — aborting (no step consumed its timeout)"
    exit 1
fi

step "1/10 headline bench" bench 2400 \
    python bench.py

step "2/10 stream-scale w2v" stream_w2v 5400 \
    python benchmark/test_stream_scale.py --algo w2v --epochs 3
step "2/10 stream-scale cfr" stream_cfr 5400 \
    python benchmark/test_stream_scale.py --algo cfr --epochs 2

step "3/10 BPR fused (d=20, ML-20M shape)" bpr_fused 3600 \
    python benchmark/test_performance.py --algo bpr \
    --dataset ml20m --d 20 --epochs 3
step "3/10 BPR split" bpr_split 3600 \
    python benchmark/test_performance.py --algo bpr \
    --dataset ml20m --d 20 --epochs 3 --set epoch_dispatch=split

step "4/10 WARP sweep (d=32,64,128)" warp_sweep 5400 \
    python benchmark/test_performance.py --algo warp \
    --dataset ml20m --d 32 64 128 --epochs 3

step "5/10 BPR d=128 (BASELINE config)" bpr_d128 3600 \
    python benchmark/test_performance.py --algo bpr \
    --dataset ml20m --d 128 --epochs 3

step "6/10 ALS d=32 ML-100k (BASELINE config)" als_ml100k 1200 \
    python benchmark/test_performance.py --algo als \
    --dataset ml100k --d 32 --epochs 5

step "7/10 retrieval incl. IVF ANN (reference HNSW row)" retrieval_ann 3600 \
    python benchmark/test_parallel.py --d 100 \
    --queries 10000 --ann --n_probe 8 16 32 64

step "8/10 ALS ML-20M d=128 CG" als_d128_cg 2400 \
    python benchmark/test_performance.py --algo als \
    --dataset ml20m --d 128 --epochs 3
step "8/10 ALS ML-20M d=128 Cholesky" als_d128_llt 2400 \
    python benchmark/test_performance.py --algo als \
    --dataset ml20m --d 128 --epochs 3 --set optimizer=llt

step "9/10 ALS KakaoBrunch12M d-sweep (reference headline)" \
    als_brunch_sweep 5400 \
    python benchmark/test_performance.py --algo als \
    --dataset kakao_brunch_12m --d 10 20 40 80 160 --epochs 3

step "10/10 eALS ML-20M (vs round-2 0.86 s/epoch)" eals_ml20m 2400 \
    python benchmark/test_performance.py --algo eals \
    --dataset ml20m --d 16 --epochs 3
step "10/10 pLSI ML-20M (vs round-2 0.26 s/epoch)" plsi_ml20m 2400 \
    python benchmark/test_performance.py --algo plsi \
    --dataset ml20m --d 16 --epochs 3

log "done; logs in $OUT"
summarize
