#!/bin/bash
# One-command on-chip measurement sweep (the round-5 re-drive queue).
#
# Runs every harness that still lacks TPU numbers, in dependency order,
# each in its own bounded process (the axon relay can crash after many
# fresh compiles in one process — benchmarks/RESULTS_v5e.md).  Between
# steps it re-probes the worker with a retry window, so a mid-sweep
# outage pauses the sweep instead of burning the remaining steps.
#
# UNATTENDED-PROOF (round-5 hardening):
#   * The entry gate RE-ARMS INDEFINITELY (each arm is one bounded probe
#     window, default 6 h) instead of aborting, so a worker recovery at
#     any hour still fires the queue with no human in the loop.
#     REDRIVE_MAX_REARMS bounds the loop if desired.
#   * Every step AUTO-COMMITS its artifacts + log on completion (OK or
#     FAIL — a failed log is evidence too), with a bounded retry around
#     the commit in case the index is briefly busy.
#   * After the sweep, benchmarks/transcribe_results.py mechanically
#     folds the parsed headline numbers into RESULTS_v5e.md and the
#     result is committed.
#
# Usage:  bash benchmarks/redrive_tpu.sh [logdir]
# Logs:   <logdir>/<step>.log (default benchmarks/redrive_logs/)
# Artifacts: the harnesses write their own JSONs (TPU_SMOKE.json,
#            AUDIO_v5e.json, BATCHED_SERVING_v5e.json, SERVING_E2E.json,
#            ...); each step's last stdout JSON line is also captured to
#            <logdir>/<step>.json.
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

commit_paths() {  # commit_paths <message> <path...>
  # Auto-commit artifacts so an unattended recovery leaves committed
  # evidence.  Bounded retries in case another process holds the index.
  local msg="$1"; shift
  local tries=0
  git add -A -- "$@" 2>>"$SUMMARY" || true
  while ! git diff --cached --quiet; do
    if git commit -m "$msg" >>"$SUMMARY" 2>&1; then
      echo "COMMITTED: $msg" | tee -a "$SUMMARY"
      return 0
    fi
    tries=$((tries + 1))
    if [ "$tries" -ge 5 ]; then
      echo "COMMIT FAILED after 5 tries: $msg" | tee -a "$SUMMARY"
      return 1
    fi
    sleep 7
    git add -A -- "$@" 2>>"$SUMMARY" || true
  done
}

# Gate: wait for the worker BEFORE starting the queue, so launching this
# script during an outage still runs the steps in priority order the
# moment the chip returns — without the gate, the most important early
# steps (smoke, bench) would burn their per-step windows first and get
# skipped.  The gate RE-ARMS FOREVER (one bounded probe window per arm)
# unless REDRIVE_MAX_REARMS limits it.
WAIT_S="${REDRIVE_WAIT_S:-21600}"
MAX_REARMS="${REDRIVE_MAX_REARMS:-0}"   # 0 = unlimited
arm=0
while :; do
  arm=$((arm + 1))
  echo "waiting for TPU (arm $arm, window ${WAIT_S}s)..." | tee -a "$SUMMARY"
  if NMF_TPU_PROBE_WINDOW_S="$WAIT_S" NMF_TPU_PROBE_INTERVAL_S=240 probe; then
    break
  fi
  if [ "$MAX_REARMS" -gt 0 ] && [ "$arm" -ge "$MAX_REARMS" ]; then
    echo "ABORT: worker never came up within $arm x ${WAIT_S}s" | tee -a "$SUMMARY"
    exit 1
  fi
  echo "re-arming gate (worker still down after arm $arm)" | tee -a "$SUMMARY"
done
echo "TPU up at $(date -u +%H:%M:%S); starting sweep" | tee -a "$SUMMARY"

step() {  # step <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  if ! probe; then
    echo "SKIP $name (worker never answered)" | tee -a "$SUMMARY"
    return 1
  fi
  echo "== $name ($(date -u +%H:%M:%S)) ==" | tee -a "$SUMMARY"
  local rc=0
  if timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1; then
    echo "OK   $name" | tee -a "$SUMMARY"
  else
    rc=$?
    echo "FAIL $name (rc=$rc; see $LOGDIR/$name.log)" | tee -a "$SUMMARY"
  fi
  # capture the harness's final stdout JSON line as a per-step artifact
  grep '^{' "$LOGDIR/$name.log" 2>/dev/null | tail -n 1 > "$LOGDIR/$name.json" || true
  [ -s "$LOGDIR/$name.json" ] || rm -f "$LOGDIR/$name.json"
  commit_paths "TPU redrive: $name step artifacts" \
    "$LOGDIR" benchmarks/*.json
  return $rc
}

step tpu_smoke       1800 python benchmarks/tpu_smoke.py
step bench           3600 python bench.py
# alias the headline artifact under its historical name
cp -f "$LOGDIR/bench.json" "$LOGDIR/bench_headline.json" 2>/dev/null || true
step flagship_prof   1800 python benchmarks/profile_flagship.py f32
step marg_lnmf       1800 python benchmarks/solver_marginal_sweep.py lnmf
step marg_constr     1800 python benchmarks/solver_marginal_sweep.py constrainednmf
step marg_nmf2d      1800 python benchmarks/solver_marginal_sweep.py nmf2d
step marg_symnmf     1800 python benchmarks/solver_marginal_sweep.py symnmf
step marg_nmfsc_ph   1800 python benchmarks/solver_marginal_sweep.py nmfsc_phased
step audio           1800 python benchmarks/audio_tpu.py
step batched_serving 1800 python benchmarks/batched_serving_tpu.py
step serving_e2e     1800 python benchmarks/serving_e2e_tpu.py
step marg_weighted   1800 python benchmarks/naive_marginal.py weighted
step ckpt_soak       1800 python benchmarks/checkpoint_soak_tpu.py

# Mechanical transcription: fold parsed numbers into RESULTS_v5e.md.
if python benchmarks/transcribe_results.py >> "$SUMMARY" 2>&1; then
  commit_paths "TPU redrive: transcribe on-chip results into RESULTS_v5e.md" \
    benchmarks/RESULTS_v5e.md "$LOGDIR"
else
  echo "TRANSCRIBE FAILED (see summary)" | tee -a "$SUMMARY"
fi

echo "---- sweep done $(date -u +%H:%M:%S) ----" | tee -a "$SUMMARY"
commit_paths "TPU redrive: sweep summary" "$LOGDIR"
cat "$SUMMARY"
