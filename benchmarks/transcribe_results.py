"""Mechanically fold on-chip artifacts into RESULTS_v5e.md.

Run by redrive_tpu.sh after the sweep (and safe to run by hand any
time): parses every artifact the queue produces and rewrites the
section between the ROUND5-ONCHIP markers in benchmarks/RESULTS_v5e.md.
Once a real TPU bench row exists it also retitles the stale
"awaiting chip time" headers, so an unattended recovery leaves the
results file current with no human in the loop (VERDICT round-4
weak-point 3).

Idempotent: re-running replaces the marker section in place.
"""
import json
import pathlib
import sys

import os

HERE = pathlib.Path(__file__).parent
# env overrides exist for the unit tests (this code runs unattended —
# a transcription bug would strand the round's results in raw logs)
LOGS = pathlib.Path(os.environ.get("NMF_TRANSCRIBE_LOGS",
                                   HERE / "redrive_logs"))
ARTIFACTS = pathlib.Path(os.environ.get("NMF_TRANSCRIBE_ARTIFACTS", HERE))
MD = pathlib.Path(os.environ.get("NMF_TRANSCRIBE_MD",
                                 HERE / "RESULTS_v5e.md"))
BEGIN = "<!-- ROUND5-ONCHIP:BEGIN -->"
END = "<!-- ROUND5-ONCHIP:END -->"


def _load(p):
    try:
        return json.loads(pathlib.Path(p).read_text())
    except Exception:
        return None


def _stamp(p):
    # measurement date from the artifact's mtime, so a row carried over
    # from an earlier round is self-evidently stale
    import datetime
    try:
        ts = pathlib.Path(p).stat().st_mtime
        return datetime.datetime.fromtimestamp(
            ts, datetime.timezone.utc).strftime("%Y-%m-%d")
    except OSError:
        return "?"


def _fmt(d, keys=None):
    if keys:
        d = {k: d[k] for k in keys if k in d}
    return ", ".join(f"{k}={v}" for k, v in d.items())


def build_section():
    lines = ["", "ROUND-5 ON-CHIP RESULTS (transcribed mechanically by",
             "benchmarks/transcribe_results.py from the redrive-queue",
             "artifacts; each figure's full JSON is committed alongside):",
             ""]
    got_tpu_bench = False

    bench = _load(LOGS / "bench.json")
    if bench:
        dev = bench.get("device", "TPU" if not bench.get("cpu_fallback")
                        else "cpu")
        got_tpu_bench = str(dev).upper() == "TPU" and bench.get("value")
        lines.append(
            f"* flagship bench ({dev}): {bench.get('value')} "
            f"{bench.get('unit')} ({bench.get('config', 'headline config')})"
            f", vs_baseline {bench.get('vs_baseline')}, "
            f"time_to_tol_s {bench.get('time_to_tol_s')}, "
            f"vs_matlab_time_to_tol {bench.get('vs_matlab_time_to_tol')}, "
            f"objective_within_1e5 {bench.get('objective_within_1e5')} "
            f"[redrive_logs/bench.json, {_stamp(LOGS / 'bench.json')}]")

    smoke = _load(ARTIFACTS / "TPU_SMOKE.json")
    if smoke:
        lines.append(
            f"* tpu_smoke: ok={smoke.get('ok')} on {smoke.get('platform')}"
            f" ({len(smoke.get('goldens', {}))} goldens, "
            f"{len(smoke.get('sharded_step', {}))} sharded steps) "
            f"[TPU_SMOKE.json, {_stamp(ARTIFACTS / 'TPU_SMOKE.json')}]")

    prof = _load(LOGS / "flagship_prof.json")
    if prof:
        lines.append(f"* flagship profile re-check: {_fmt(prof)} "
                     f"[redrive_logs/flagship_prof.json, {_stamp(LOGS / 'flagship_prof.json')}]")

    for step in ("marg_lnmf", "marg_constr", "marg_nmf2d", "marg_symnmf",
                 "marg_nmfsc_ph", "marg_weighted"):
        r = _load(LOGS / f"{step}.json")
        if r:
            lines.append(f"* {step}: {_fmt(r)} [redrive_logs/{step}.json, "
                         f"{_stamp(LOGS / (step + '.json'))}]")

    audio = _load(ARTIFACTS / "AUDIO_v5e.json")
    if audio:
        rows = audio.get("rows", audio)
        lines.append(f"* audio front-end: {_fmt(rows)} [AUDIO_v5e.json, "
                     f"{_stamp(ARTIFACTS / 'AUDIO_v5e.json')}]")

    served = _load(ARTIFACTS / "BATCHED_SERVING_v5e.json")
    if served:
        rows = served.get("rows", served)
        keys = list(rows)[:12] if isinstance(rows, dict) else None
        lines.append(f"* batched serving: "
                     f"{_fmt(rows, keys) if isinstance(rows, dict) else rows}"
                     f" [BATCHED_SERVING_v5e.json, {_stamp(ARTIFACTS / 'BATCHED_SERVING_v5e.json')}]")

    e2e = _load(ARTIFACTS / "SERVING_E2E.json")
    if e2e:
        rows = e2e.get("rows", e2e)
        lines.append(f"* serving e2e: "
                     f"{_fmt(rows) if isinstance(rows, dict) else rows}"
                     f" [SERVING_E2E.json, {_stamp(ARTIFACTS / 'SERVING_E2E.json')}]")

    soak = _load(ARTIFACTS / "CKPT_SOAK.json")
    if soak:
        lines.append(f"* checkpoint fault-injection soak: {_fmt(soak)} "
                     f"[CKPT_SOAK.json, {_stamp(ARTIFACTS / 'CKPT_SOAK.json')}]")

    if len(lines) <= 5:
        lines.append("* (no artifacts found yet — queue has not run)")
    lines.append("")
    return "\n".join(lines), got_tpu_bench


def main():
    text = MD.read_text()
    section, got_tpu = build_section()
    block = f"{BEGIN}\n{section}\n{END}"
    if BEGIN in text and END in text:
        pre = text.split(BEGIN)[0]
        post = text.split(END, 1)[1]
        text = pre + block + post
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    if got_tpu:
        text = text.replace(
            "ROUND-3 LATE ADDITIONS (awaiting chip time):",
            "ROUND-3 LATE ADDITIONS (measured in round 5 — see ROUND-5 "
            "ON-CHIP RESULTS below; original context follows):")
    MD.write_text(text)
    print("transcribed", "with TPU bench row" if got_tpu else
          "(no TPU bench row yet)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
