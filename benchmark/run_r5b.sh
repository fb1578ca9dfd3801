#!/usr/bin/env bash
# Round-5 addendum queue — run AFTER run_r5.sh completes (a running
# bash script must not be edited, so follow-ups land here).
#
#   1. ALS ML-20M d=40 stored_width A/B: the auto rule pads 32<d<64
#      on evidence from the 505k-row brunch catalog only; bench.py's
#      headline row is ML-20M d=40, so the rule must be validated (or
#      scoped) on this catalog before the round-end bench.
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

step() {   # step <label> <name> <timeout> <needs_tpu:0|1> cmd...
    local label=$1 name=$2 to=$3 tpu=$4; shift 4
    if [ -s "$OUT/$name.log" ] && grep -q '"step_complete"' "$OUT/$name.log" \
        && ! { grep '^{' "$OUT/$name.log" | grep -q '"error"'; }; then
        log "$label: $name.log complete — skipping"
        return 0
    fi
    if [ "$tpu" = 1 ]; then
        local tries=0
        while ! probe; do
            tries=$((tries + 1))
            [ "$tries" -ge 12 ] && { log "$label: TPU unhealthy 60 min — abort"; exit 1; }
            log "$label: service unhealthy, retry $tries/12 in 5 min"
            sleep 300
        done
    fi
    log "$label"
    timeout "$to" "$@" 2>&1 | tee "$OUT/$name.log"
    local rc=${PIPESTATUS[0]}
    if [ "$rc" -eq 0 ]; then
        echo "{\"step_complete\": \"$name\"}" >> "$OUT/$name.log"
    else
        log "$label: exit $rc (no completion marker — re-runs on resume)"
    fi
}

step "1/2 ALS ML-20M d=40 padded (auto)" als_ml20m_d40_padded 3600 1 \
    python benchmark/test_performance.py --algo als --dataset ml20m \
    --d 40 --epochs 3

step "2/3 ALS ML-20M d=40 unpadded" als_ml20m_d40_unpadded 3600 1 \
    python benchmark/test_performance.py --algo als --dataset ml20m \
    --d 40 --epochs 3 --set stored_width=-1

step "3/4 W2V stream epoch decomposition" w2v_stream_decomp 5400 1 \
    python benchmark/microbench_w2v_stream_decomp.py --epochs 2

step "4/4 W2V stream offset_mode=scan (compile + runtime)" \
    w2v_stream_scan 5400 1 \
    python benchmark/microbench_w2v_stream_decomp.py --epochs 2 \
    --offset-mode scan

log "r5b queue done"
grep -h '^{' "$OUT"/als_ml20m_d40_*.log "$OUT"/w2v_stream_*.log \
    2>/dev/null | tail -16
