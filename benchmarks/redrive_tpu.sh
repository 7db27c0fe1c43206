#!/bin/bash
# One-command on-chip measurement sweep (the round-4 re-drive queue).
#
# Runs every harness that still lacks TPU numbers, in dependency order,
# each in its own bounded process (the axon relay can crash after many
# fresh compiles in one process — benchmarks/RESULTS_v5e.md).  Between
# steps it re-probes the worker with a retry window, so a mid-sweep
# outage pauses the sweep instead of burning the remaining steps.
#
# Usage:  bash benchmarks/redrive_tpu.sh [logdir]
# Logs:   <logdir>/<step>.log (default benchmarks/redrive_logs/)
# Artifacts: the harnesses write their own JSONs (TPU_SMOKE.json,
#            AUDIO_v5e.json, BATCHED_SERVING_v5e.json, SERVING_E2E.json,
#            ...); bench.py's line is captured to <logdir>/bench.json.
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-benchmarks/redrive_logs}"
mkdir -p "$LOGDIR"
# Persistent compile cache: a crashed-and-retried step then skips its
# compiles (keyed per platform; harmless if the backend can't serialize —
# jax just logs and compiles).  NMF_REDRIVE_NO_CACHE=1 disables.
if [ -z "${NMF_REDRIVE_NO_CACHE:-}" ]; then
  export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/nmf_tpu_jax_cache}"
fi
SUMMARY="$LOGDIR/summary.txt"
: > "$SUMMARY"

probe() {
  # Bounded retry probe: wait up to ~25 min for the worker, else fail.
  python - <<'EOF'
import sys
from nmf_toolbox_tpu.utils.deviceprobe import probe_with_retry
plat, n = probe_with_retry()
sys.exit(0 if plat == "tpu" else 1)
EOF
}

# Gate: wait (default up to 6 h, REDRIVE_WAIT_S to change) for the worker
# BEFORE starting the queue, so launching this script during an outage
# still runs the steps in priority order the moment the chip returns —
# without the gate, the most important early steps (smoke, bench) would
# burn their per-step windows first and get skipped.
WAIT_S="${REDRIVE_WAIT_S:-21600}"
echo "waiting for TPU (up to ${WAIT_S}s)..." | tee -a "$SUMMARY"
if ! NMF_TPU_PROBE_WINDOW_S="$WAIT_S" NMF_TPU_PROBE_INTERVAL_S=240 probe; then
  echo "ABORT: worker never came up within ${WAIT_S}s" | tee -a "$SUMMARY"
  exit 1
fi
echo "TPU up at $(date -u +%H:%M:%S); starting sweep" | tee -a "$SUMMARY"

step() {  # step <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  if ! probe; then
    echo "SKIP $name (worker never answered)" | tee -a "$SUMMARY"
    return 1
  fi
  echo "== $name ($(date -u +%H:%M:%S)) ==" | tee -a "$SUMMARY"
  if timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1; then
    echo "OK   $name" | tee -a "$SUMMARY"
  else
    echo "FAIL $name (rc=$?; see $LOGDIR/$name.log)" | tee -a "$SUMMARY"
  fi
}

step tpu_smoke       1800 python benchmarks/tpu_smoke.py
step bench           3600 python bench.py
# capture bench.py's single JSON line as its own artifact
tail -n 1 "$LOGDIR/bench.log" 2>/dev/null | grep '^{' > "$LOGDIR/bench.json" || true
step marg_lnmf       1800 python benchmarks/solver_marginal_sweep.py lnmf
step marg_constr     1800 python benchmarks/solver_marginal_sweep.py constrainednmf
step marg_nmf2d      1800 python benchmarks/solver_marginal_sweep.py nmf2d
step marg_symnmf     1800 python benchmarks/solver_marginal_sweep.py symnmf
step marg_nmfsc_ph   1800 python benchmarks/solver_marginal_sweep.py nmfsc_phased
step audio           1800 python benchmarks/audio_tpu.py
step batched_serving 1800 python benchmarks/batched_serving_tpu.py
step serving_e2e     1800 python benchmarks/serving_e2e_tpu.py
step marg_weighted   1800 python benchmarks/naive_marginal.py weighted

echo "---- sweep done $(date -u +%H:%M:%S) ----" | tee -a "$SUMMARY"
cat "$SUMMARY"
