#!/usr/bin/env bash
# Round-5 third queue: measure the afternoon's changes on the chip.
#   1. stream W2V with the uint8 wire format + host prefetch +
#      offset_mode=scan default (upload was the dominant term,
#      w2v_stream_decomp.log)
#   2. IVF 5M on TPU — retry with the OOM-gated tiled exact scan
#   3. CFR stream d=32 clean re-measure (the 6.63 s reading ran
#      concurrently with the WARP A/B on this 1-core box) + d=64
#      width probe
set -u
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
OUT=${1:-benchmark/measurements/r5}
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

step() {   # step <label> <name> <timeout> cmd...
    local label=$1 name=$2 to=$3; shift 3
    if [ -s "$OUT/$name.log" ] && grep -q '"step_complete"' "$OUT/$name.log" \
        && ! { grep '^{' "$OUT/$name.log" | grep -q '"error"'; }; then
        log "$label: $name.log complete — skipping"
        return 0
    fi
    local tries=0
    while ! probe; do
        tries=$((tries + 1))
        [ "$tries" -ge 12 ] && { log "$label: TPU unhealthy 60 min — abort"; exit 1; }
        log "$label: service unhealthy, retry $tries/12 in 5 min"
        sleep 300
    done
    log "$label"
    timeout "$to" "$@" 2>&1 | tee "$OUT/$name.log"
    local rc=${PIPESTATUS[0]}
    if [ "$rc" -eq 0 ]; then
        echo "{\"step_complete\": \"$name\"}" >> "$OUT/$name.log"
    else
        log "$label: exit $rc (no completion marker — re-runs on resume)"
    fi
}

step "1/4 stream W2V uint8+prefetch+scan" stream_w2v_u8 5400 \
    python benchmark/test_stream_scale.py --algo w2v --d 32 --epochs 3

step "2/4 IVF 5M x 64 on TPU (tiled exact)" ivf_5m_tpu 7200 \
    python benchmark/microbench_ivf_5m.py --items 5000000 --d 64

step "3/4 CFR stream d=32 clean re-measure" stream_cfr_grid 5400 \
    python benchmark/test_stream_scale.py --algo cfr --d 32 --epochs 3

step "4/4 CFR stream d=64 width probe" stream_cfr_d64 5400 \
    python benchmark/test_stream_scale.py --algo cfr --d 64 --epochs 3

log "r5c queue done"
grep -h '^{' "$OUT"/stream_w2v_u8.log "$OUT"/ivf_5m_tpu.log \
    "$OUT"/stream_cfr_grid.log "$OUT"/stream_cfr_d64.log \
    2>/dev/null | tail -20
