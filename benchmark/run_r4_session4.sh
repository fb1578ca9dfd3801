#!/usr/bin/env bash
# Round-4 session-4 queue: re-measure every d<64 SGD-family headline
# row now that the drivers auto-pad sub-64 factor widths to 64 lanes
# (stored_width — benchmark/microbench_bpr_width.py is the decision
# record; the committed rows predate the fix):
#   1. BPR KakaoBrunch d=10/20/40 (committed 4.17/4.07/5.00 s — the
#      BASELINE row's sub-128 inversion)
#   2. BPR ML-20M d=32 (committed 2.48 s)
#   3. WARP ML-20M d=32 lazy (committed 5.1 s)
#   4. stream-scale W2V d=32 (committed 85.8 s/epoch)
set -u
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
OUT=${1:-benchmark/measurements/r4}
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
    if [ -s "$OUT/$name.log" ] && grep -q '"step_complete"' "$OUT/$name.log" \
        && ! { grep '^{' "$OUT/$name.log" | grep -q '"error"'; }; then
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

step "1/4 BPR brunch d=10/20/40 (stored_width auto)" \
    bpr_brunch_dsweep_padded 7200 \
    python benchmark/test_performance.py --algo bpr \
    --dataset kakao_brunch_12m --d 10 20 40 --epochs 3

step "2/4 BPR ML-20M d=32 (stored_width auto)" bpr_ml20m_d32_padded 3600 \
    python benchmark/test_performance.py --algo bpr \
    --dataset ml20m --d 32 --epochs 3

step "3/4 WARP ML-20M d=32 lazy (stored_width auto)" warp_d32_padded 3600 \
    python benchmark/test_performance.py --algo warp \
    --dataset ml20m --d 32 --epochs 3

step "4/4 stream-scale W2V d=32 (stored_width auto)" stream_w2v_padded 5400 \
    python benchmark/test_stream_scale.py --algo w2v --d 32 --epochs 2

log "session-4 queue done; logs in $OUT"
grep -h '^{' "$OUT"/bpr_brunch_dsweep_padded.log \
    "$OUT"/bpr_ml20m_d32_padded.log "$OUT"/warp_d32_padded.log \
    "$OUT"/stream_w2v_padded.log 2>/dev/null | tail -30
