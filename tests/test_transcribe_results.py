"""benchmarks/transcribe_results.py: the unattended artifact->markdown
folding step of the redrive queue.  A bug here strands the round's
on-chip numbers in raw logs, so the TPU-success path is simulated with
fake artifacts (the real one can only execute when the worker is up)."""
import json
import subprocess
import sys
import pathlib

HERE = pathlib.Path(__file__).parent.parent / "benchmarks"


def _run(tmp_path, bench_row, with_smoke=True):
    logs = tmp_path / "logs"
    arts = tmp_path / "arts"
    logs.mkdir(exist_ok=True)
    arts.mkdir(exist_ok=True)
    md = tmp_path / "RESULTS.md"
    if not md.exists():
        md.write_text("intro\n\nROUND-3 LATE ADDITIONS (awaiting chip "
                      "time): stuff landed during an outage.\n")
    (logs / "bench.json").write_text(json.dumps(bench_row))
    (logs / "marg_lnmf.json").write_text(json.dumps({"lnmf_40k": 1.23}))
    if with_smoke:
        (arts / "TPU_SMOKE.json").write_text(json.dumps(
            {"ok": True, "platform": "tpu",
             "goldens": {"nmf_kl": {"ok": True}},
             "sharded_step": {"nmf": {"ok": True}}}))
    env = {"NMF_TRANSCRIBE_LOGS": str(logs),
           "NMF_TRANSCRIBE_ARTIFACTS": str(arts),
           "NMF_TRANSCRIBE_MD": str(md)}
    import os
    p = subprocess.run([sys.executable, str(HERE / "transcribe_results.py")],
                       env={**os.environ, **env},
                       capture_output=True, text=True, timeout=60)
    assert p.returncode == 0, p.stderr
    return md.read_text(), p.stdout


def test_tpu_bench_row_retitles_and_folds(tmp_path):
    text, out = _run(tmp_path, {
        "metric": "euclidean NMF MU iters/sec", "value": 140.2,
        "unit": "iters/sec", "vs_baseline": 11216.0, "device": "TPU",
        "time_to_tol_s": 1.44, "vs_matlab_time_to_tol": 11100.0,
        "objective_within_1e5": True})
    assert "with TPU bench row" in out
    assert "awaiting chip time" not in text          # retitled
    assert "measured in round 5" in text
    assert "flagship bench (TPU): 140.2 iters/sec" in text
    assert "tpu_smoke: ok=True on tpu (1 goldens, 1 sharded steps)" in text
    assert "marg_lnmf: lnmf_40k=1.23" in text


def test_cpu_fallback_row_does_not_retitle(tmp_path):
    text, out = _run(tmp_path, {
        "metric": "euclidean NMF MU iters/sec", "value": 150.0,
        "unit": "iters/sec", "vs_baseline": 5.8, "device": "cpu",
        "cpu_fallback": True}, with_smoke=False)
    assert "no TPU bench row" in out
    assert "awaiting chip time" in text              # NOT retitled
    assert "flagship bench (cpu): 150.0" in text


def test_idempotent_rerun_replaces_section(tmp_path):
    row = {"value": 1.0, "unit": "iters/sec", "device": "TPU",
           "vs_baseline": 2.0}
    text1, _ = _run(tmp_path, row)
    text2, _ = _run(tmp_path, dict(row, value=99.0))
    # exactly one transcribed section (the retitled ROUND-3 header also
    # *mentions* the section name, so count the section's opening line)
    assert text2.count("ROUND-5 ON-CHIP RESULTS (transcribed") == 1
    assert "flagship bench (TPU): 99.0" in text2
    assert "flagship bench (TPU): 1.0 " not in text2
