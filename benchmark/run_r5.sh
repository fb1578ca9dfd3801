#!/usr/bin/env bash
# Round-5 measurement queue (VERDICT r4 items).  Resumable: steps with
# a step_complete marker and no JSON error row are skipped.  Chains
# after the session-4 leftovers (run_r4_session4.sh is itself
# resumable and skips completed steps instantly).
#
#   1. width audit via d-sweeps that INCLUDE d=64 (a zero-padded
#      table costs exactly what a true d=64 table costs, so
#      epoch(d=64) < epoch(true d) <=> stored_width pays):
#      ALS brunch d=10..80, eALS ML-20M + brunch, pLSI ML-20M + brunch
#      (also VERDICT #8's missing eALS/pLSI sweeps + brunch rows)
#   2. reference-core W2V/CFR stream anchors (CPU, T=1 + 6-core bound)
#   3. buffalo_tpu CFR stream re-measure for the side-by-side row
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
            if [ "$tries" -ge 12 ]; then
                log "$label: TPU service unhealthy for 60 min — aborting"
                exit 1
            fi
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
        log "$label: exit $rc (no completion marker — will re-run on resume)"
    fi
}

# 0. finish the session-4 leftovers first (resumable, skips done steps)
bash benchmark/run_r4_session4.sh

# 1. width audit d-sweeps (TPU)
step "1/8 ALS brunch d-sweep incl. 64" als_brunch_width 7200 1 \
    python benchmark/test_performance.py --algo als \
    --dataset kakao_brunch_12m --d 10 20 40 64 80 --epochs 3

step "2/8 eALS ML-20M d-sweep" eals_ml20m_dsweep 7200 1 \
    python benchmark/test_performance.py --algo eals \
    --dataset ml20m --d 16 32 64 --epochs 3

step "3/8 eALS brunch d=16/64" eals_brunch 7200 1 \
    python benchmark/test_performance.py --algo eals \
    --dataset kakao_brunch_12m --d 16 64 --epochs 3

step "4/8 pLSI ML-20M d-sweep" plsi_ml20m_dsweep 7200 1 \
    python benchmark/test_performance.py --algo plsi \
    --dataset ml20m --d 8 32 64 --epochs 3

step "5/8 pLSI brunch d=8/64" plsi_brunch 7200 1 \
    python benchmark/test_performance.py --algo plsi \
    --dataset kakao_brunch_12m --d 8 64 --epochs 3

# 1b. W2V stream shape: host-pair path for the side-by-side with the
#     device pair-gen default measured by session-4's step 4
step "5b/11 W2V stream host-pair path" stream_w2v_host 5400 1 \
    python benchmark/test_stream_scale.py --algo w2v --d 32 --epochs 2 \
    --set pair_gen=host

# 2. IVF at the scale it is claimed for (VERDICT #6)
step "6/11 ML-20M IVF probe=64 warm re-measure" ivf_ml20m_p64 5400 1 \
    python benchmark/test_parallel.py --dataset ml20m --d 100 \
    --ann --n_probe 64 --spill 2

step "7/11 IVF 5M x 64 on TPU" ivf_5m_tpu 7200 1 \
    python benchmark/microbench_ivf_5m.py --items 5000000 --d 64

step "8/11 IVF 5M x 64 on CPU" ivf_5m_cpu 10800 0 \
    env JAX_PLATFORMS=cpu python benchmark/microbench_ivf_5m.py \
    --items 5000000 --d 64 --queries 1000

# 3. reference-core stream anchors (CPU-only, serialized after the
#    TPU steps so host contention can't skew either side)
step "9/11 ref W2V stream anchor" ref_w2v_anchor 10800 0 \
    python benchmark/ref_driver/ref_stream_anchor.py --algo w2v --epochs 2

step "10/11 ref CFR stream anchor" ref_cfr_anchor 10800 0 \
    python benchmark/ref_driver/ref_stream_anchor.py --algo cfr --epochs 2

# 4. buffalo_tpu CFR stream re-measure (same data build as the anchor)
step "11/12 tpu CFR stream re-measure" stream_cfr_r5 5400 1 \
    python benchmark/test_stream_scale.py --algo cfr --d 32 --epochs 2

# 5. WARP adaptive_trials paired A/B at decision power (VERDICT #5)
step "12/12 WARP 32-seed adaptive A/B" warp_adaptive_ab 14400 0 \
    env JAX_PLATFORMS=cpu python benchmark/warp_adaptive_ab.py --seeds 32

log "r5 queue done; logs in $OUT"
grep -h '^{' "$OUT"/*.log 2>/dev/null | tail -40
