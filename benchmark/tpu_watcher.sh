#!/usr/bin/env bash
# TPU service watcher: probe every 20 min; the moment the service is
# healthy, run the full serialized measurement session ONCE.
# Logs to $OUT/watcher.log; measurement logs land in $OUT as usual.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/bt_tpu_measurements}
mkdir -p "$OUT"
LOG="$OUT/watcher.log"
log() { echo "[$(date -u +%F' '%H:%M:%S)] $*" >> "$LOG"; }

probe() {
    timeout 600 python -c "
import jax
d = jax.devices()
assert d and d[0].platform == 'tpu', d
import jax.numpy as jnp
(jnp.ones((256,256)) @ jnp.ones((256,256))).block_until_ready()
" >> "$LOG" 2>&1
}

log "watcher armed (pid $$)"
while true; do
    if probe; then
        log "TPU healthy — launching measurement session"
        bash benchmark/run_tpu_measurements.sh "$OUT" >> "$LOG" 2>&1
        rc=$?
        log "measurement session exited rc=$rc"
        if [ "$rc" -eq 0 ]; then
            touch "$OUT/MEASUREMENTS_DONE"
            log "done — watcher exiting"
            exit 0
        fi
        # partial session (service wedged mid-run): keep watching
    else
        log "probe failed/hung — service down"
    fi
    sleep 1200
done
