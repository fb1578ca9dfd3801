#!/usr/bin/env bash
# Round-4 serialized TPU measurement queue (ONE chip — see CLAUDE.md).
# Assumes the r3 sweep already ran; this covers the VERDICT r3 list:
#   1. retrieval/ANN TPU table (probe sweep + approx + device merge)
#   2. WARP profile (microbench_warp) + d-sweep + adaptive A/B
#   3. ALS brunch d=40 outlier re-measure
#   4. stream-scale W2V
#   5. 730M staging + epoch end-to-end (longest, last)
# Every step health-gates; persistent compile cache is wired in, so
# repeats of a shape skip the remote compile tax.
#
#   bash benchmark/run_r4_measurements.sh [outdir]
set -u
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1   # keep partial output when a step times out
OUT=${1:-/tmp/bt_tpu_measurements/r4}
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

step() {
    local label=$1 name=$2 to=$3; shift 3
    # a step only counts as done when its command EXITED cleanly (a
    # timed-out sweep leaves partial JSON rows — resuming must re-run
    # it, not skip the missing rows): require the completion marker
    if [ -s "$OUT/$name.log" ] && grep -q '"step_complete"' "$OUT/$name.log" \
        && ! grep -q '"error"' "$OUT/$name.log"; then
        log "$label: $name.log complete — skipping"
        return 0
    fi
    # a wedged remote compiler can take tens of minutes to drain;
    # retry the health probe for up to an hour before giving up
    local tries=0
    while ! probe; do
        tries=$((tries + 1))
        if [ "$tries" -ge 12 ]; then
            log "$label: TPU service unhealthy for 60 min — aborting"
            exit 1
        fi
        log "$label: service unhealthy, retry $tries/12 in 5 min"
        sleep 300
    done
    log "$label"
    timeout "$to" "$@" 2>&1 | tee "$OUT/$name.log"
    local rc=${PIPESTATUS[0]}
    if [ "$rc" -eq 0 ]; then
        echo "{\"step_complete\": \"$name\"}" >> "$OUT/$name.log"
    else
        log "$label: exit $rc (no completion marker — will re-run on resume)"
    fi
}

log "0/9 pre-flight TPU probe"
probe || { log "TPU not healthy — aborting"; exit 1; }

step "1/9 headline bench (warms driver cache too)" bench 2400 \
    python bench.py

step "2/9 WARP epoch profile (ablations + K sweep)" warp_profile 5400 \
    python benchmark/microbench_warp.py --d 32 --epochs 2

step "3/9 ALS brunch d=40 outlier re-measure (5 epochs)" \
    als_brunch_d40 3600 \
    python benchmark/test_performance.py --algo als \
    --dataset kakao_brunch_12m --d 40 80 --epochs 5

step "4/9 stream-scale W2V" stream_w2v 5400 \
    python benchmark/test_stream_scale.py --algo w2v --epochs 3

step "5/9 WARP adaptive_trials A/B (d=32)" warp_adaptive 4800 \
    python benchmark/test_performance.py --algo warp \
    --dataset ml20m --d 32 --epochs 4 --set adaptive_trials=true
step "5/9 WARP d-sweep fixed (d=64,128)" warp_dsweep 5400 \
    python benchmark/test_performance.py --algo warp \
    --dataset ml20m --d 64 128 --epochs 3

step "5/9 BPR verify ablation (bloom cost, Pallas question)" \
    bpr_verify_ab 3600 \
    python benchmark/test_performance.py --algo bpr \
    --dataset ml20m --d 32 --epochs 3
step "5/9 BPR no-verify" bpr_noverify_ab 3600 \
    python benchmark/test_performance.py --algo bpr \
    --dataset ml20m --d 32 --epochs 3 --set verify_neg=false

step "6/9 IVF merge A/B (device-fused sort vs host merge)" \
    ivf_merge_ab 3600 \
    python benchmark/microbench_ivf_merge.py

step "6/9 retrieval ML-20M d=100 (approx + IVF probe sweep)" \
    retrieval_ml20m_d100 4800 \
    python benchmark/test_parallel.py --dataset ml20m --d 100 \
    --queries 10000 --approx --ann --n_probe 8 16 32 64 --spill 2
step "7/9 retrieval brunch d=100 (headline; retry if the manual run
died)" retrieval_brunch_d100 4800 \
    python benchmark/test_parallel.py --dataset kakao_brunch_12m \
    --d 100 --queries 10000 --approx --ann --n_probe 8 16 32 64 \
    --spill 2
step "7/9 retrieval brunch d=32" retrieval_brunch_d32 4800 \
    python benchmark/test_parallel.py --dataset kakao_brunch_12m \
    --d 32 --queries 10000 --approx --ann --n_probe 8 16 32 64 \
    --spill 2
step "7/9 retrieval brunch d=128" retrieval_brunch_d128 4800 \
    python benchmark/test_parallel.py --dataset kakao_brunch_12m \
    --d 128 --queries 10000 --approx --ann --n_probe 8 16 32 64 \
    --spill 2

step "8/9 compile-cache A/B (fresh process, warm cache)" \
    cache_warm_bench 2400 \
    python bench.py

step "9/9 730M end-to-end (staging + epochs, ~1 h)" e2e_730m 10800 \
    python benchmark/test_730m.py

log "done; logs in $OUT"
grep -h '^{' "$OUT"/*.log 2>/dev/null | tail -40
