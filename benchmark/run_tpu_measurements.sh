#!/usr/bin/env bash
# Serialized TPU measurement session (ONE chip — never run two jobs
# concurrently; see CLAUDE.md).  Run when the TPU service is healthy:
#
#   bash benchmark/run_tpu_measurements.sh [outdir]
#
# Collects, in priority order:
#   1. headline bench (ALS ML-20M d=40)
#   2. stream-scale W2V + CFR (KakaoBrunch12M shape)  [BASELINE config]
#   3. BPR fused-vs-split epoch_dispatch ablation (the wall-clock
#      mystery: CLAUDE.md "BPR/WARP wall-clock mystery")
#   4. WARP d-sweep incl. d=128                        [BASELINE config]
# Each step is under `timeout`; a hung service skips to the next.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/bt_tpu_measurements}
mkdir -p "$OUT"
log() { echo "[$(date -u +%H:%M:%S)] $*"; }

log "0/10 pre-flight TPU probe"
if ! timeout 300 python -c "
import jax
d = jax.devices()
assert d and d[0].platform == 'tpu', d
print('TPU OK:', d)
"; then
    log "TPU service not healthy — aborting (no step consumed its timeout)"
    exit 1
fi

log "1/10 headline bench"
timeout 2400 python bench.py 2>&1 | tee "$OUT/bench.log"

log "2/10 stream-scale w2v"
timeout 5400 python benchmark/test_stream_scale.py --algo w2v --epochs 3 \
    2>&1 | tee "$OUT/stream_w2v.log"
log "2/10 stream-scale cfr"
timeout 5400 python benchmark/test_stream_scale.py --algo cfr --epochs 2 \
    2>&1 | tee "$OUT/stream_cfr.log"

log "3/10 BPR fused vs split (d=20, ML-20M shape)"
timeout 3600 python benchmark/test_performance.py --algo bpr \
    --dataset ml20m --d 20 --epochs 3 \
    2>&1 | tee "$OUT/bpr_fused.log"
timeout 3600 python benchmark/test_performance.py --algo bpr \
    --dataset ml20m --d 20 --epochs 3 --set epoch_dispatch=split \
    2>&1 | tee "$OUT/bpr_split.log"

log "4/10 WARP sweep (d=32,64,128)"
timeout 5400 python benchmark/test_performance.py --algo warp \
    --dataset ml20m --d 32 64 128 --epochs 3 \
    2>&1 | tee "$OUT/warp_sweep.log"

log "5/10 BPR d=128 (BASELINE measured config)"
timeout 3600 python benchmark/test_performance.py --algo bpr \
    --dataset ml20m --d 128 --epochs 3 \
    2>&1 | tee "$OUT/bpr_d128.log"

log "6/10 ALS d=32 ML-100k (BASELINE measured config)"
timeout 1200 python benchmark/test_performance.py --algo als \
    --dataset ml100k --d 32 --epochs 5 \
    2>&1 | tee "$OUT/als_ml100k.log"

log "7/10 retrieval incl. IVF ANN (reference HNSW row)"
timeout 3600 python benchmark/test_parallel.py --d 100 \
    --queries 10000 --ann --n_probe 8 16 32 64 \
    2>&1 | tee "$OUT/retrieval_ann.log"

log "8/10 ALS ML-20M d=128: CG vs Cholesky (BASELINE measured config)"
timeout 2400 python benchmark/test_performance.py --algo als \
    --dataset ml20m --d 128 --epochs 3 \
    2>&1 | tee "$OUT/als_d128_cg.log"
timeout 2400 python benchmark/test_performance.py --algo als \
    --dataset ml20m --d 128 --epochs 3 --set optimizer=llt \
    2>&1 | tee "$OUT/als_d128_llt.log"

log "9/10 ALS KakaoBrunch12M d-sweep (reference headline table)"
timeout 5400 python benchmark/test_performance.py --algo als \
    --dataset kakao_brunch_12m --d 10 20 40 80 160 --epochs 3 \
    2>&1 | tee "$OUT/als_brunch_sweep.log"

log "10/10 eALS + pLSI ML-20M (regression vs round-2 0.86 / 0.26 s/epoch)"
timeout 2400 python benchmark/test_performance.py --algo eals \
    --dataset ml20m --d 16 --epochs 3 \
    2>&1 | tee "$OUT/eals_ml20m.log"
timeout 2400 python benchmark/test_performance.py --algo plsi \
    --dataset ml20m --d 16 --epochs 3 \
    2>&1 | tee "$OUT/plsi_ml20m.log"

log "done; logs in $OUT"
grep -h '^{' "$OUT"/*.log 2>/dev/null | tail -40
python benchmark/summarize_measurements.py "$OUT" \
    | tee "$OUT/SUMMARY.md"
