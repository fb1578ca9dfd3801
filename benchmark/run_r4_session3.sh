#!/usr/bin/env bash
# Round-4 third-session TPU queue.  The previous session's /tmp logs
# were wiped with the machine restart, so the resumable skip-marks are
# gone; this queue re-runs ONLY what is still owed (README "Pending"):
#   1. WARP lazy-probe K sweep + fixed-K lazy row  (followups f2/f3)
#   2. ALS brunch d=40/80 repeat (variance bound)  (followup f4)
#   3. 730M staging + epoch end-to-end             (r4 step 9/9)
#   4. stream-scale W2V retry, LAST because the first attempt crashed
#      the TPU worker; on failure bisect with --scale 0.5 / 0.25
set -u
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
OUT=${1:-/tmp/bt_tpu_measurements/r4s3}
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

log "0/5 pre-flight TPU probe"
probe || { log "TPU not healthy — aborting"; exit 1; }

step "1/5 WARP lazy K sweep" warp_profile_lazy 5400 \
    python benchmark/microbench_warp.py --d 32 --epochs 2 \
    --probe lazy --k 16 32 64

step "2/5 WARP fixed-K lazy d=32 (vs adaptive row)" warp_d32_fixed 3600 \
    python benchmark/test_performance.py --algo warp \
    --dataset ml20m --d 32 --epochs 4

step "3/5 ALS brunch d=40/80 repeat (variance bound)" \
    als_brunch_d40_rep 3600 \
    python benchmark/test_performance.py --algo als \
    --dataset kakao_brunch_12m --d 40 80 --epochs 10

step "4/5 730M end-to-end (staging + epochs, ~1 h)" e2e_730m 10800 \
    python benchmark/test_730m.py

step "5/5 stream-scale W2V retry (crashed worker on first attempt)" \
    stream_w2v_retry 5400 \
    python benchmark/test_stream_scale.py --algo w2v --epochs 2

# bisect only if the full-scale retry still dies
if ! grep -q '"step_complete"' "$OUT/stream_w2v_retry.log" 2>/dev/null; then
    step "5/5 stream-scale W2V at scale 0.5 (bisect)" \
        stream_w2v_s05 5400 \
        python benchmark/test_stream_scale.py --algo w2v --epochs 2 \
        --scale 0.5
fi
if ! grep -q '"step_complete"' "$OUT/stream_w2v_retry.log" 2>/dev/null \
    && ! grep -q '"step_complete"' "$OUT/stream_w2v_s05.log" 2>/dev/null; then
    step "5/5 stream-scale W2V at scale 0.25 (bisect)" \
        stream_w2v_s025 5400 \
        python benchmark/test_stream_scale.py --algo w2v --epochs 2 \
        --scale 0.25
fi

log "session-3 queue done; logs in $OUT"
grep -h '^{' "$OUT"/*.log 2>/dev/null | tail -30
