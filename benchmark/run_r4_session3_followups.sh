#!/usr/bin/env bash
# Post-queue round-4 follow-ups (run after run_r4_session3.sh exits):
#   1. retrieval-overhead decomposition (locates the fixed per-call
#      cost behind brunch approx 0.356 s vs raw compute ~0.16 s; also
#      re-times the warm calls with the 2.6x-cheaper int64 checksum)
#   2. BPR KakaoBrunch12M d-sweep — the one BASELINE.md training row
#      (reference 14.6-23.4 s across d) without a direct TPU number
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

step "1/2 retrieval overhead decomposition (brunch shape)" \
    retrieval_overhead 3600 \
    python benchmark/microbench_retrieval_overhead.py \
    --items 505926 --d 100 --queries 10000

step "2/3 BPR brunch d-sweep (BASELINE row)" bpr_brunch_dsweep 7200 \
    python benchmark/test_performance.py --algo bpr \
    --dataset kakao_brunch_12m --d 10 20 40 80 160 --epochs 3

# re-measure the headline retrieval rows after the int64-checksum and
# chunk-count-grid changes (the committed 0.76 s exact / 0.356 s
# approx rows predate both: 120 ms/call fingerprint + 64% scan-FLOP
# padding are gone)
step "3/3 retrieval brunch d=100 re-measure" retrieval_brunch_d100_v2 4800 \
    python benchmark/test_parallel.py --dataset kakao_brunch_12m \
    --d 100 --queries 10000 --approx

log "session-3 followups done; logs in $OUT"
grep -h '^{' "$OUT"/retrieval_overhead.log "$OUT"/bpr_brunch_dsweep.log \
    2>/dev/null | tail -30
