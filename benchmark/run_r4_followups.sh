#!/usr/bin/env bash
# Round-4 follow-up TPU measurements (run after run_r4_measurements.sh):
#   - stream-scale W2V retry (first attempt crashed the TPU worker)
#   - WARP lazy-probe K sweep (the r4 optimization) vs the all-probe
#     profile already recorded in warp_profile.log
#   - WARP fixed-K lazy d=32 (isolates adaptive_trials from lazy)
#   - ALS brunch d=40/80 repeat (bounds run-to-run variance on the
#     README's inversion note)
set -u
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
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
    local tries=0
    while ! probe; do
        tries=$((tries + 1))
        if [ "$tries" -ge 12 ]; then
            log "$label: TPU unhealthy for 60 min — aborting"
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

step "f1 stream-scale W2V retry (crashed worker on first attempt)" \
    stream_w2v_retry 5400 \
    python benchmark/test_stream_scale.py --algo w2v --epochs 2

step "f2 WARP lazy K sweep" warp_profile_lazy 5400 \
    python benchmark/microbench_warp.py --d 32 --epochs 2 \
    --probe lazy --k 16 32 64

step "f3 WARP fixed-K lazy d=32 (vs adaptive row)" warp_d32_fixed 3600 \
    python benchmark/test_performance.py --algo warp \
    --dataset ml20m --d 32 --epochs 4

step "f4 ALS brunch d=40/80 repeat (variance bound)" \
    als_brunch_d40_rep 3600 \
    python benchmark/test_performance.py --algo als \
    --dataset kakao_brunch_12m --d 40 80 --epochs 10

log "followups done; logs in $OUT"
grep -h '^{' "$OUT"/*.log 2>/dev/null | tail -30
