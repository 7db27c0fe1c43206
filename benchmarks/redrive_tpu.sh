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
# A rehearsal must NEVER write into the real log dir: its CPU-forced
# bench.json / marg_*.json would overwrite committed on-chip rows and
# the transcriber would fold them into RESULTS_v5e.md.
if [ -n "${NMF_REDRIVE_REHEARSAL:-}" ]; then
  LOGDIR="${1:-benchmarks/redrive_rehearsal_logs}"
else
  LOGDIR="${1:-benchmarks/redrive_logs}"
fi
mkdir -p "$LOGDIR"
# Persistent compile cache: a crashed-and-retried step then skips its
# compiles (keyed per platform; harmless if the backend can't serialize —
# jax just logs and compiles).  NMF_REDRIVE_NO_CACHE=1 disables.
if [ -z "${NMF_REDRIVE_NO_CACHE:-}" ]; then
  export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/nmf_tpu_jax_cache}"
fi
SUMMARY="$LOGDIR/summary.txt"
# commit-message prefix distinguishes rehearsal commits in history
MSGPFX="TPU redrive${NMF_REDRIVE_REHEARSAL:+ (rehearsal)}"
: > "$SUMMARY"

probe() {
  # Bounded retry probe: wait up to ~25 min for the worker, else fail.
  # NMF_REDRIVE_FAKE_PROBE=1 bypasses it — REHEARSAL ONLY (CPU dry run
  # of the queue itself: NMF_REDRIVE_REHEARSAL=1 NMF_REDRIVE_FAKE_PROBE=1
  # bash benchmarks/redrive_tpu.sh).
  if [ -n "${NMF_REDRIVE_FAKE_PROBE:-}" ]; then return 0; fi
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
  # Paths are staged ONE AT A TIME: `git add -- a b` aborts ALL staging
  # if any single path is outside the repo (found by the rehearsal when
  # the logdir lived in /tmp) — one bad path must not block the rest.
  local msg="$1"; shift
  local tries=0 p
  stage() { for p in "$@"; do git add -A -- "$p" 2>>"$SUMMARY" || true; done; }
  stage "$@"
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
    stage "$@"
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
  # a probe that dies instantly (import error, bad venv) must not spin
  # the loop at 100% CPU — pace the re-arm regardless of why it failed
  sleep 60
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
  commit_paths "$MSGPFX: $name step artifacts" \
    "$LOGDIR" benchmarks/*.json
  return $rc
}

# R: rehearsal-only extra flags (CPU dry run of the WHOLE queue incl.
# auto-commit + transcription — set NMF_REDRIVE_REHEARSAL=1; real runs
# get no extra flags).  Harnesses' --cpu/--small/--quick modes write
# CPU-suffixed artifacts or skip artifact writes, so a rehearsal can
# never clobber on-chip evidence.
R() { if [ -n "${NMF_REDRIVE_REHEARSAL:-}" ]; then echo "$@"; fi; }

step tpu_smoke       1800 python benchmarks/tpu_smoke.py $(R --cpu)
step bench           3600 env NMF_TPU_BENCH_CPU="$(R 1)" python bench.py
# alias the headline artifact under its historical name
cp -f "$LOGDIR/bench.json" "$LOGDIR/bench_headline.json" 2>/dev/null || true
step flagship_prof   1800 python benchmarks/profile_flagship.py f32 $(R --small)
step marg_lnmf       1800 python benchmarks/solver_marginal_sweep.py lnmf $(R --small)
step marg_constr     1800 python benchmarks/solver_marginal_sweep.py constrainednmf $(R --small)
step marg_nmf2d      1800 python benchmarks/solver_marginal_sweep.py nmf2d $(R --small)
step marg_symnmf     1800 python benchmarks/solver_marginal_sweep.py symnmf $(R --small)
step marg_nmfsc_ph   1800 python benchmarks/solver_marginal_sweep.py nmfsc_phased $(R --small)
step audio           1800 python benchmarks/audio_tpu.py $(R --quick --cpu)
step batched_serving 1800 python benchmarks/batched_serving_tpu.py $(R --quick --cpu)
step serving_e2e     1800 python benchmarks/serving_e2e_tpu.py $(R --quick --cpu)
step marg_weighted   1800 python benchmarks/naive_marginal.py weighted $(R --small)
step ckpt_soak       1800 python benchmarks/checkpoint_soak_tpu.py $(R --small --cpu)

# Mechanical transcription: fold parsed numbers into RESULTS_v5e.md.
# (Still exercised in rehearsal — against the rehearsal logdir — but
# the write target is a scratch copy so RESULTS_v5e.md is untouched.)
if [ -n "${NMF_REDRIVE_REHEARSAL:-}" ]; then
  cp benchmarks/RESULTS_v5e.md "$LOGDIR/RESULTS_rehearsal.md"
  export NMF_TRANSCRIBE_LOGS="$LOGDIR"          NMF_TRANSCRIBE_MD="$LOGDIR/RESULTS_rehearsal.md"
fi
if python benchmarks/transcribe_results.py >> "$SUMMARY" 2>&1; then
  commit_paths "$MSGPFX: transcribe on-chip results into RESULTS_v5e.md" \
    benchmarks/RESULTS_v5e.md "$LOGDIR"
else
  echo "TRANSCRIBE FAILED (see summary)" | tee -a "$SUMMARY"
fi

echo "---- sweep done $(date -u +%H:%M:%S) ----" | tee -a "$SUMMARY"
commit_paths "$MSGPFX: sweep summary" "$LOGDIR"
cat "$SUMMARY"
