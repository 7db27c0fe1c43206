"""CLI end-to-end tests (module invocation; the console script maps to
the same entry point)."""
import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = str(pathlib.Path(__file__).resolve().parents[1])


def run_cli(args, env_extra=None):
    env = {"PYTHONPATH": REPO, "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
           "JAX_PLATFORMS": "cpu", "HOME": os.environ.get("HOME", "/root"),
           **(env_extra or {})}
    return subprocess.run([sys.executable, "-m", "nmf_toolbox_tpu"] + args,
                          capture_output=True, text=True, cwd=REPO, env=env)


@pytest.fixture(scope="module")
def matrix_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "V.npy"
    rng = np.random.default_rng(0)
    np.save(p, rng.uniform(0.1, 1, (30, 40)).astype(np.float32))
    return str(p)


def test_cli_nmf(matrix_file, tmp_path):
    out = str(tmp_path / "f.npz")
    r = run_cli(["nmf", matrix_file, "--k", "4", "--maxiter", "10",
                 "--divergence", "kl", "--out", out])
    assert r.returncode == 0, r.stderr[-500:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["iterations"] == 10 and summary["k"] == 4
    from nmf_toolbox_tpu.utils.checkpoint import load_factors
    kw = load_factors(out)
    assert kw["W_init"].shape == (30, 4)


def test_cli_cnmf_requires_context(matrix_file, tmp_path):
    r = run_cli(["cnmf", matrix_file, "--k", "3",
                 "--out", str(tmp_path / "x.npz")])
    assert r.returncode == 2
    assert "context-len" in r.stderr


def test_cli_resume(matrix_file, tmp_path):
    out1 = str(tmp_path / "a.npz")
    out2 = str(tmp_path / "b.npz")
    r = run_cli(["nmf", matrix_file, "--k", "3", "--maxiter", "5",
                 "--out", out1])
    assert r.returncode == 0, r.stderr[-500:]
    r = run_cli(["nmf", matrix_file, "--k", "3", "--maxiter", "5",
                 "--resume", out1, "--out", out2])
    assert r.returncode == 0, r.stderr[-500:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert s["iterations"] == 5


def test_cli_checkpointed(matrix_file, tmp_path):
    out = str(tmp_path / "c.npz")
    r = run_cli(["nmf", matrix_file, "--k", "3", "--maxiter", "12",
                 "--checkpoint-every", "4", "--out", out])
    assert r.returncode == 0, r.stderr[-500:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert s["iterations"] >= 4  # last chunk's count


def test_cli_checkpointed_rerun_and_totals(matrix_file, tmp_path):
    """Completed checkpoint re-run returns saved state; iterations are the
    TOTAL across chunks (regressions from review round 2)."""
    out = str(tmp_path / "r.npz")
    r1 = run_cli(["nmf", matrix_file, "--k", "3", "--maxiter", "8",
                  "--checkpoint-every", "4", "--out", out])
    assert r1.returncode == 0, r1.stderr[-500:]
    s1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert s1["iterations"] == 8
    r2 = run_cli(["nmf", matrix_file, "--k", "3", "--maxiter", "8",
                  "--checkpoint-every", "4", "--out", out])
    assert r2.returncode == 0, r2.stderr[-500:]
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["converged"] is True


def test_cli_mesh(matrix_file, tmp_path):
    env_extra = {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    import subprocess
    env = {"PYTHONPATH": REPO, "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
           "JAX_PLATFORMS": "cpu", "HOME": os.environ.get("HOME", "/root"),
           **env_extra}
    r = subprocess.run([sys.executable, "-m", "nmf_toolbox_tpu", "nmf",
                        matrix_file, "--k", "4", "--maxiter", "5",
                        "--mesh", "8", "--out", str(tmp_path / "m.npz")],
                       capture_output=True, text=True, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-500:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert s["iterations"] == 5


def test_cli_streaming(matrix_file, tmp_path):
    out = str(tmp_path / "s.npz")
    r = run_cli(["nmf", matrix_file, "--k", "3", "--maxiter", "4",
                 "--streaming", "--block-size", "16", "--out", out])
    assert r.returncode == 0, r.stderr[-500:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert s["iterations"] >= 1
    from nmf_toolbox_tpu.utils.checkpoint import load_factors
    assert load_factors(out)["W_init"].shape == (30, 3)


def test_cli_streaming_rejects_other_solvers(matrix_file, tmp_path):
    r = run_cli(["lnmf", matrix_file, "--k", "3", "--streaming",
                 "--out", str(tmp_path / "x.npz")])
    assert r.returncode == 2 and "streaming" in r.stderr


def test_cli_init_flag(matrix_file, tmp_path):
    out = str(tmp_path / "f.npz")
    r = run_cli(["nmf", matrix_file, "--k", "4", "--init", "nndsvdar",
                 "--maxiter", "5", "--out", out])
    assert r.returncode == 0, r.stderr
    assert json.loads(r.stdout)["iterations"] == 5
    r = run_cli(["nmf_hals", matrix_file, "--k", "4", "--init", "nndsvda",
                 "--maxiter", "5", "--out", out])
    assert r.returncode == 0, r.stderr
    # init is nmf/nmf_hals-only; resume conflicts; hals rejects divergence
    r = run_cli(["seminmf", matrix_file, "--k", "4", "--init", "nndsvda",
                 "--maxiter", "5", "--out", out])
    assert r.returncode == 2 and "only supported" in r.stderr
    r = run_cli(["nmf", matrix_file, "--k", "4", "--init", "nndsvda",
                 "--resume", out, "--maxiter", "5", "--out", out])
    assert r.returncode == 2 and "--resume" in r.stderr
    r = run_cli(["nmf_hals", matrix_file, "--k", "4", "--divergence", "kl",
                 "--maxiter", "5", "--out", out])
    assert r.returncode == 2 and "does not support" in r.stderr


def test_cli_weights(matrix_file, tmp_path):
    """--weights M.npy: weighted objective from the command line."""
    V = np.load(matrix_file)
    rng = np.random.default_rng(0)
    M = (rng.uniform(size=V.shape) < 0.8).astype(np.float32)
    mfile = str(tmp_path / "M.npy")
    np.save(mfile, M)
    out = str(tmp_path / "w.npz")
    r = run_cli(["nmf", matrix_file, "--k", "3", "--weights", mfile,
                 "--maxiter", "5", "--out", out])
    assert r.returncode == 0, r.stderr[-500:]
    # weighted HALS path too
    out2 = str(tmp_path / "w2.npz")
    r = run_cli(["nmf_hals", matrix_file, "--k", "3", "--weights", mfile,
                 "--maxiter", "5", "--out", out2])
    assert r.returncode == 0, r.stderr[-500:]
    # unsupported solver is loud
    r = run_cli(["lnmf", matrix_file, "--k", "3", "--weights", mfile,
                 "--maxiter", "2", "--out", str(tmp_path / "x.npz")])
    assert r.returncode == 2
    assert "--weights" in r.stderr


def test_cli_solver_valueerror_is_clean(matrix_file, tmp_path):
    # Invalid option COMBINATIONS are validated once, in the solvers;
    # the CLI surfaces their ValueError as `error: ...` + exit 2 rather
    # than a traceback.  --weights forces method='naive' for nmf, which
    # conflicts with --inner-iters > 1 (accelerated MU needs the Gram
    # method); same for nmf_hals's weighted path.
    w = str(tmp_path / "w.npy")
    np.save(w, np.ones((30, 40), np.float32))
    for solver in ("nmf", "nmf_hals"):
        r = run_cli([solver, matrix_file, "--k", "4", "--weights", w,
                     "--inner-iters", "2", "--maxiter", "3",
                     "--out", str(tmp_path / "f.npz")])
        assert r.returncode == 2, (solver, r.stderr[-500:])
        assert r.stderr.startswith("error:"), (solver, r.stderr[:200])
        assert "Traceback" not in r.stderr, (solver, r.stderr[-500:])


def test_cli_orbax_checkpoint_and_resume(matrix_file, tmp_path):
    # --checkpoint-backend orbax writes a directory checkpoint; --resume
    # accepts that directory for a follow-on run.
    out = str(tmp_path / "ck_dir")
    r = run_cli(["nmf", matrix_file, "--k", "4", "--maxiter", "6",
                 "--checkpoint-every", "3", "--checkpoint-backend", "orbax",
                 "--out", out])
    assert r.returncode == 0, r.stderr[-500:]
    assert pathlib.Path(out).is_dir()
    r = run_cli(["nmf", matrix_file, "--k", "4", "--maxiter", "2",
                 "--resume", out, "--out", str(tmp_path / "f.npz")])
    assert r.returncode == 0, r.stderr[-500:]


def test_cli_pick_rank_consensus(tmp_path):
    # rank-3 blocky data: the sweep must land on 3 and factorize with it
    rng = np.random.default_rng(1)
    W = np.kron(np.eye(3), np.ones((10, 1)))
    H = np.zeros((3, 36))
    H[np.arange(36) % 3, np.arange(36)] = 1.0 + 0.2 * rng.random(36)
    p = tmp_path / "V.npy"
    np.save(p, (W @ H + 0.01 * rng.random((30, 36))).astype(np.float32))
    out = str(tmp_path / "f.npz")
    r = run_cli(["nmf", str(p), "--pick-rank", "2,3,5", "--rank-seeds", "8",
                 "--maxiter", "10", "--out", out])
    assert r.returncode == 0, r.stderr[-500:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    sel = summary["rank_selection"]
    assert sel["method"] == "consensus" and summary["k"] == sel["recommended"]
    assert set(sel["cophenetic"]) == {"2", "3", "5"}
    from nmf_toolbox_tpu.utils.checkpoint import load_factors
    assert load_factors(out)["W_init"].shape == (30, summary["k"])


def test_cli_pick_rank_svd(tmp_path):
    rng = np.random.default_rng(2)
    p = tmp_path / "V.npy"
    np.save(p, (rng.random((40, 3)) @ rng.random((3, 50))).astype(np.float32))
    out = str(tmp_path / "f.npz")
    r = run_cli(["nmf", str(p), "--pick-rank", "svd", "--rank-energy",
                 "0.999", "--maxiter", "5", "--out", out])
    assert r.returncode == 0, r.stderr[-500:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["rank_selection"]["method"] == "svd"
    assert summary["k"] <= 3


def test_cli_pick_rank_validation(matrix_file, tmp_path):
    out = str(tmp_path / "x.npz")
    r = run_cli(["nmf", matrix_file, "--out", out])
    assert r.returncode == 2 and "--k is required" in r.stderr
    r = run_cli(["nmf", matrix_file, "--k", "3", "--pick-rank", "2,3",
                 "--out", out])
    assert r.returncode == 2 and "not both" in r.stderr


def test_cli_fix_factor_encoding(matrix_file, tmp_path):
    """Serving path: learn a dictionary, then encode 'new' data against
    it with --fix W — the dictionary must come back bit-identical."""
    dic = str(tmp_path / "dict.npz")
    r = run_cli(["nmf", matrix_file, "--k", "4", "--maxiter", "15",
                 "--out", dic])
    assert r.returncode == 0, r.stderr[-500:]
    enc = str(tmp_path / "enc.npz")
    r = run_cli(["nmf", matrix_file, "--resume", dic, "--fix", "W",
                 "--k", "4", "--maxiter", "5", "--out", enc])
    assert r.returncode == 0, r.stderr[-500:]
    with np.load(dic) as d, np.load(enc) as e:
        # W passes through the solver's init-time column re-norm
        # (nmf.m:132-134 normalizes W_init always) -> float noise only.
        np.testing.assert_allclose(d["W"], e["W"], rtol=1e-5)
        assert not np.array_equal(d["H"], e["H"])  # H kept fitting


def test_cli_fix_validation(matrix_file, tmp_path):
    out = str(tmp_path / "x.npz")
    r = run_cli(["nmf", matrix_file, "--k", "3", "--fix", "W", "--out", out])
    assert r.returncode == 2 and "requires --resume" in r.stderr
    r = run_cli(["chnmf", matrix_file, "--k", "3", "--fix", "H",
                 "--out", out])
    assert r.returncode == 2 and "--fix is only supported" in r.stderr


def test_cli_pick_rank_kl_sweep(tmp_path):
    rng = np.random.default_rng(3)
    W = np.kron(np.eye(3), np.ones((8, 1)))
    H = np.zeros((3, 30))
    H[np.arange(30) % 3, np.arange(30)] = 1.0
    p = tmp_path / "V.npy"
    np.save(p, (W @ H + 0.01 * rng.random((24, 30))).astype(np.float32))
    out = str(tmp_path / "f.npz")
    r = run_cli(["nmf", str(p), "--pick-rank", "2,3", "--rank-seeds", "6",
                 "--divergence", "kl", "--maxiter", "8", "--out", out])
    assert r.returncode == 0, r.stderr[-500:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["rank_selection"]["sweep_divergence"] == "kl"


def test_cli_fix_encodes_different_sample_count(tmp_path):
    """Review finding: the checkpoint's H_init (train sample count) must
    not be injected when encoding differently-shaped new data."""
    rng = np.random.default_rng(4)
    W = rng.uniform(0.1, 1, (20, 3))
    old = tmp_path / "old.npy"; new = tmp_path / "new.npy"
    np.save(old, (W @ rng.uniform(size=(3, 30))).astype(np.float32))
    np.save(new, (W @ rng.uniform(size=(3, 45))).astype(np.float32))
    dic = str(tmp_path / "dict.npz")
    r = run_cli(["nmf", str(old), "--k", "3", "--maxiter", "10",
                 "--out", dic])
    assert r.returncode == 0, r.stderr[-500:]
    enc = str(tmp_path / "enc.npz")
    r = run_cli(["nmf", str(new), "--resume", dic, "--fix", "W", "--k", "3",
                 "--maxiter", "10", "--out", enc])
    assert r.returncode == 0, r.stderr[-500:]
    with np.load(enc) as e:
        assert e["H"].shape == (3, 45)


def test_cli_pick_rank_mesh_rounds_seeds(tmp_path):
    """--pick-rank with --mesh rounds --rank-seeds up to the mesh's
    sample-axis multiple instead of hard-failing."""
    rng = np.random.default_rng(5)
    W = np.kron(np.eye(3), np.ones((8, 1)))
    H = np.zeros((3, 32))
    H[np.arange(32) % 3, np.arange(32)] = 1.0
    p = tmp_path / "V.npy"
    np.save(p, (W @ H + 0.01 * rng.random((24, 32))).astype(np.float32))
    out = str(tmp_path / "f.npz")
    r = run_cli(["nmf", str(p), "--pick-rank", "2,3", "--rank-seeds", "5",
                 "--mesh", "8", "--maxiter", "8", "--out", out],
                env_extra={"XLA_FLAGS":
                           "--xla_force_host_platform_device_count=8"})
    assert r.returncode == 0, r.stderr[-500:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["rank_selection"]["n_seeds"] == 8


def test_cli_streaming_rejects_pick_rank(tmp_path):
    rng = np.random.default_rng(6)
    p = tmp_path / "V.npy"
    np.save(p, rng.random((20, 30)).astype(np.float32))
    r = run_cli(["nmf", str(p), "--streaming", "--pick-rank", "2,3",
                 "--out", str(tmp_path / "x.npz")])
    assert r.returncode == 2 and "--pick-rank" in r.stderr


def test_cli_encode(tmp_path):
    """encode: train a dictionary, then batch-encode new data against it
    from both a raw .npy W and a training checkpoint."""
    rng = np.random.default_rng(12)
    m, n, k, B = 20, 25, 3, 4
    V = rng.uniform(0.1, 1, (m, n)).astype(np.float32)
    v_file = str(tmp_path / "V.npy"); np.save(v_file, V)
    train_out = str(tmp_path / "train.npz")
    r = run_cli(["nmf", v_file, "--k", str(k), "--maxiter", "15",
                 "--out", train_out])
    assert r.returncode == 0, r.stderr[-500:]

    Vs = rng.uniform(0.1, 1, (B, m, 18)).astype(np.float32)
    vs_file = str(tmp_path / "Vs.npy"); np.save(vs_file, Vs)
    enc_out = str(tmp_path / "enc.npz")
    r = run_cli(["encode", vs_file, "--dict", train_out, "--maxiter", "12",
                 "--h-sparsity", "0.1", "--divergence", "kl",
                 "--out", enc_out])
    assert r.returncode == 0, r.stderr[-500:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["k"] == k and summary["iterations"] == 12
    with np.load(enc_out) as z:
        assert z["H"].shape == (B, k, 18)
        assert z["cost"].shape == (B, 12)
        assert z["W"].shape == (m, k)

    # raw .npy dictionary path
    w_file = str(tmp_path / "W.npy")
    with np.load(train_out) as z:
        np.save(w_file, z["W"])
    r = run_cli(["encode", vs_file, "--dict", w_file, "--maxiter", "5",
                 "--out", str(tmp_path / "enc2.npz")])
    assert r.returncode == 0, r.stderr[-500:]


def test_cli_encode_validation(tmp_path):
    rng = np.random.default_rng(13)
    Vs = rng.uniform(0.1, 1, (2, 10, 12)).astype(np.float32)
    vs_file = str(tmp_path / "Vs.npy"); np.save(vs_file, Vs)
    w_file = str(tmp_path / "W.npy")
    np.save(w_file, rng.uniform(size=(10, 3)).astype(np.float32))
    out = str(tmp_path / "o.npz")
    r = run_cli(["encode", vs_file, "--maxiter", "3", "--out", out])
    assert r.returncode == 2 and "--dict" in r.stderr
    r = run_cli(["encode", vs_file, "--dict", w_file, "--k", "3",
                 "--out", out])
    assert r.returncode == 2 and "does not support" in r.stderr
    r = run_cli(["encode", vs_file, "--dict", w_file, "--fix", "W",
                 "--out", out])
    assert r.returncode == 2 and "does not support" in r.stderr
    # 2-D input: the engine's shape error surfaces as a clean CLI error
    v2 = str(tmp_path / "V2.npy")
    np.save(v2, Vs[0])
    r = run_cli(["encode", v2, "--dict", w_file, "--out", out])
    assert r.returncode == 2 and "B, m, n" in r.stderr


def test_cli_encode_convolutive(tmp_path):
    """A 3-D --dict selects the convolutive encode engine."""
    rng = np.random.default_rng(14)
    m, n, k, T, B = 12, 16, 2, 3, 2
    w_file = str(tmp_path / "Wc.npy")
    np.save(w_file, rng.uniform(0.1, 1, (m, k, T)).astype(np.float32))
    vs_file = str(tmp_path / "Vs.npy")
    np.save(vs_file, rng.uniform(0.1, 1, (B, m, n)).astype(np.float32))
    out = str(tmp_path / "enc.npz")
    r = run_cli(["encode", vs_file, "--dict", w_file, "--maxiter", "6",
                 "--divergence", "kl", "--out", out])
    assert r.returncode == 0, r.stderr[-500:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["engine"] == "cnmf_encode" and summary["k"] == k
    with np.load(out) as z:
        assert z["H"].shape == (B, k, n)
        assert z["W"].shape == (m, k, T)


def test_cli_dict_rejected_for_other_solvers(tmp_path):
    rng = np.random.default_rng(15)
    v = str(tmp_path / "V.npy")
    np.save(v, rng.uniform(0.1, 1, (8, 10)).astype(np.float32))
    w = str(tmp_path / "W.npy")
    np.save(w, rng.uniform(size=(8, 2)).astype(np.float32))
    r = run_cli(["nmf", v, "--k", "2", "--dict", w,
                 "--out", str(tmp_path / "o.npz")])
    assert r.returncode == 2 and "--dict only applies" in r.stderr


def test_cli_encode_weights(tmp_path):
    """--weights on encode: masked batch encoding (matrix-completion
    scoring)."""
    rng = np.random.default_rng(16)
    B, m, n, k = 2, 10, 12, 2
    vs = str(tmp_path / "Vs.npy")
    np.save(vs, rng.uniform(0.1, 1, (B, m, n)).astype(np.float32))
    w = str(tmp_path / "W.npy")
    np.save(w, rng.uniform(size=(m, k)).astype(np.float32))
    mw = str(tmp_path / "M.npy")
    np.save(mw, (rng.uniform(size=(m, n)) < 0.8).astype(np.float32))
    out = str(tmp_path / "enc.npz")
    r = run_cli(["encode", vs, "--dict", w, "--weights", mw,
                 "--maxiter", "6", "--out", out])
    assert r.returncode == 0, r.stderr[-500:]
    with np.load(out) as z:
        assert z["H"].shape == (B, k, n)


def test_cli_encode_streaming(tmp_path):
    """encode --streaming: one wide memory-mapped matrix, exact
    block-wise encoding against the dictionary."""
    rng = np.random.default_rng(17)
    m, n, k = 12, 50, 2
    v = str(tmp_path / "V.npy")
    np.save(v, rng.uniform(0.1, 1, (m, n)).astype(np.float32))
    w = str(tmp_path / "W.npy")
    np.save(w, rng.uniform(size=(m, k)).astype(np.float32))
    out = str(tmp_path / "enc.npz")
    r = run_cli(["encode", v, "--dict", w, "--streaming",
                 "--block-size", "16", "--maxiter", "6", "--out", out])
    assert r.returncode == 0, r.stderr[-500:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["streaming"] is True and summary["k"] == k
    with np.load(out) as z:
        assert z["H"].shape == (k, n)


def test_cli_streaming_pick_rank_svd(tmp_path):
    """--streaming --pick-rank svd: the rank estimate streams the
    memory-mapped input in blocks, then streaming training proceeds."""
    rng = np.random.default_rng(18)
    m, n, r = 24, 120, 3
    V = (rng.gamma(2.0, 1.0, (m, r)) @ rng.gamma(0.5, 1.0, (r, n))
         ).astype(np.float32)
    v = str(tmp_path / "V.npy")
    np.save(v, V)
    out = str(tmp_path / "o.npz")
    r_ = run_cli(["nmf", v, "--streaming", "--pick-rank", "svd",
                  "--rank-energy", "0.999", "--block-size", "40",
                  "--maxiter", "3", "--out", out])
    assert r_.returncode == 0, r_.stderr[-500:]
    summary = json.loads(r_.stdout.strip().splitlines()[-1])
    assert 2 <= summary["k"] <= 4
    # consensus mode stays rejected out-of-core
    r_ = run_cli(["nmf", v, "--streaming", "--pick-rank", "2,3,4",
                  "--out", out])
    assert r_.returncode == 2 and "consensus" in r_.stderr


def _make_mixture(tmp_path, sr=4000, dur=0.8):
    """Two synthetic sources + mixture as wav files; returns paths + arrays."""
    from scipy.io import wavfile
    rng = np.random.default_rng(21)
    t = np.arange(int(sr * dur)) / sr
    a = 0.5 * np.sin(2 * np.pi * 330 * t) + 0.3 * np.sin(2 * np.pi * 495 * t)
    b = np.zeros_like(t)
    for i in range(0, len(t) - 200, 450):
        b[i: i + 200] += rng.normal(size=200) * np.exp(-np.arange(200) / 40.0)
    mix = a + b
    paths = {}
    for name, x in [("a", a), ("b", b), ("mix", mix)]:
        p = str(tmp_path / f"{name}.wav")
        wavfile.write(p, sr, (x / 2.0).astype(np.float32))
        paths[name] = p
    return paths, {"a": a, "b": b, "mix": mix, "sr": sr}


def test_cli_separate_solos_wav(tmp_path):
    """wav mixture + solo recordings -> learned dictionaries -> wav stems
    that sum to the mixture."""
    from scipy.io import wavfile
    paths, sig = _make_mixture(tmp_path)
    out = str(tmp_path / "stem")
    r = run_cli(["separate", paths["mix"], "--solos",
                 f"{paths['a']},{paths['b']}", "--ks", "4",
                 "--n-fft", "256", "--hop", "64", "--maxiter", "60",
                 "--out", out])
    assert r.returncode == 0, r.stderr[-800:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["sources"] == 2 and summary["ranks"] == [4, 4]
    assert summary["sample_rate"] == sig["sr"]
    rate0, y0 = wavfile.read(summary["stems"][0])
    rate1, y1 = wavfile.read(summary["stems"][1])
    assert rate0 == rate1 == sig["sr"]
    mix = sig["mix"] / 2.0
    # masks sum to 1 and istft is linear: stems sum to the mixture
    np.testing.assert_allclose(y0 + y1, mix, atol=1e-4)
    # each stem matches its source better than the raw mixture does
    for y, ref in [(y0, sig["a"] / 2.0), (y1, sig["b"] / 2.0)]:
        assert np.sum((y - ref) ** 2) < 0.5 * np.sum((mix - ref) ** 2)


def test_cli_separate_dicts_spectrogram(tmp_path):
    """2-D .npy mixture = precomputed magnitude spectrogram; frozen
    dictionaries from training checkpoints; .npy stems."""
    rng = np.random.default_rng(22)
    m, n = 48, 90
    A = rng.gamma(2.0, 1.0, (m, 3)) @ rng.gamma(0.7, 1.0, (3, n))
    B = rng.gamma(2.0, 1.0, (m, 3)) @ rng.gamma(0.7, 1.0, (3, n))
    for name, S in [("A", A), ("B", B)]:
        np.save(tmp_path / f"{name}.npy", S.astype(np.float32))
        r = run_cli([
            "nmf", str(tmp_path / f"{name}.npy"), "--k", "3",
            "--maxiter", "80", "--out", str(tmp_path / f"d{name}.npz")])
        assert r.returncode == 0, r.stderr[-500:]
    mixp = str(tmp_path / "mix.npy")
    np.save(mixp, (A + B).astype(np.float32))
    out = str(tmp_path / "sep")
    r = run_cli(["separate", mixp, "--dicts",
                 f"{tmp_path / 'dA.npz'},{tmp_path / 'dB.npz'}",
                 "--maxiter", "80", "--power", "1.0", "--out", out])
    assert r.returncode == 0, r.stderr[-800:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    est = [np.load(p) for p in summary["stems"]]
    np.testing.assert_allclose(est[0] + est[1], A + B, rtol=1e-4, atol=1e-4)
    assert np.sum((est[0] - A) ** 2) < 0.3 * np.sum((A + B - A) ** 2)


def test_cli_separate_validation(tmp_path):
    np.save(tmp_path / "V.npy", np.random.default_rng(0).uniform(
        0.1, 1, (20, 30)).astype(np.float32))
    v = str(tmp_path / "V.npy")
    np.save(tmp_path / "W.npy", np.random.default_rng(1).uniform(
        size=(20, 3)).astype(np.float32))
    w = str(tmp_path / "W.npy")
    out = str(tmp_path / "s")
    # neither --dicts nor --solos
    r = run_cli(["separate", v, "--out", out])
    assert r.returncode == 2 and "exactly one of" in r.stderr
    # both
    r = run_cli(["separate", v, "--dicts", w, "--solos", v, "--out", out])
    assert r.returncode == 2 and "exactly one of" in r.stderr
    # unsupported flags
    r = run_cli(["separate", v, "--dicts", w, "--k", "3", "--out", out])
    assert r.returncode == 2 and "--k" in r.stderr
    # --solos without --ks
    r = run_cli(["separate", v, "--solos", v, "--out", out])
    assert r.returncode == 2
    # dictionary row mismatch
    np.save(tmp_path / "Wbad.npy", np.random.default_rng(2).uniform(
        size=(9, 3)).astype(np.float32))
    r = run_cli(["separate", v, "--dicts", str(tmp_path / "Wbad.npy"),
                 "--out", out])
    assert r.returncode == 2 and "rows" in r.stderr
    # separate-only flags rejected elsewhere
    r = run_cli(["nmf", v, "--k", "3", "--ks", "4", "--out", out + ".npz"])
    assert r.returncode == 2 and "separate" in r.stderr


def test_cli_encode_complex_phase_aware(tmp_path):
    """A complex (B, m, n) batch routes to cmfwisa_encode, preserving the
    checkpoint's per-source dictionary blocks."""
    rng = np.random.default_rng(33)
    m, n, B = 16, 20, 3
    # multi-source training checkpoint (two W blocks)
    A1 = rng.gamma(2.0, 1.0, (m, 2)) @ rng.gamma(0.7, 1.0, (2, n))
    A2 = rng.gamma(2.0, 1.0, (m, 2)) @ rng.gamma(0.7, 1.0, (2, n))
    np.save(tmp_path / "mix.npy", (A1 + A2).astype(np.float32))
    r = run_cli(["nmf", str(tmp_path / "mix.npy"), "--k", "4",
                 "--maxiter", "40", "--out", str(tmp_path / "d.npz")])
    assert r.returncode == 0, r.stderr[-500:]
    # rewrite as a 2-source checkpoint to exercise the block path
    from nmf_toolbox_tpu.utils.checkpoint import save_factors, load_factors
    W = load_factors(str(tmp_path / "d.npz"))["W_init"]
    save_factors(str(tmp_path / "d2.npz"), {"W": [W[:, :2], W[:, 2:]]})
    Vs = (rng.uniform(0.1, 1, (B, m, n))
          * np.exp(1j * rng.uniform(-np.pi, np.pi, (B, m, n))))
    np.save(tmp_path / "batch.npy", Vs.astype(np.complex64))
    out = str(tmp_path / "enc.npz")
    r = run_cli(["encode", str(tmp_path / "batch.npy"), "--dict",
                 str(tmp_path / "d2.npz"), "--maxiter", "12", "--out", out])
    assert r.returncode == 0, r.stderr[-800:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["engine"] == "cmfwisa_encode" and summary["k"] == 4
    with np.load(out) as z:
        assert z["H__len"] == 2 and z["H__0"].shape == (B, 2, n)
        assert z["P__0"].shape == (B, m, n)
        assert np.iscomplexobj(z["P__0"])
    # complex + --streaming rejected cleanly
    r = run_cli(["encode", str(tmp_path / "batch.npy"), "--dict",
                 str(tmp_path / "d2.npz"), "--streaming", "--out", out])
    assert r.returncode == 2 and "phase-aware" in r.stderr


def test_cli_separate_phase_aware(tmp_path):
    """--phase-aware: cmfwisa fit; stems sum to the mixture exactly and
    beat the mask-free mixture baseline."""
    from scipy.io import wavfile
    paths, sig = _make_mixture(tmp_path)
    out = str(tmp_path / "pa")
    r = run_cli(["separate", paths["mix"], "--solos",
                 f"{paths['a']},{paths['b']}", "--ks", "4",
                 "--n-fft", "256", "--hop", "64", "--maxiter", "50",
                 "--phase-aware", "--out", out])
    assert r.returncode == 0, r.stderr[-800:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["phase_aware"] is True and summary["sources"] == 2
    _, y0 = wavfile.read(summary["stems"][0])
    _, y1 = wavfile.read(summary["stems"][1])
    mix = sig["mix"] / 2.0
    np.testing.assert_allclose(y0 + y1, mix, atol=1e-4)
    for y, ref in [(y0, sig["a"] / 2.0), (y1, sig["b"] / 2.0)]:
        assert np.sum((y - ref) ** 2) < 0.6 * np.sum((mix - ref) ** 2)
    # magnitude-only spectrogram input rejected
    np.save(tmp_path / "mag.npy", np.abs(
        np.random.default_rng(0).normal(size=(20, 30))).astype(np.float32))
    np.save(tmp_path / "Wm.npy", np.random.default_rng(1).uniform(
        size=(20, 3)).astype(np.float32))
    r = run_cli(["separate", str(tmp_path / "mag.npy"), "--dicts",
                 str(tmp_path / "Wm.npy"), "--phase-aware", "--out", out])
    assert r.returncode == 2 and "phase information" in r.stderr
    # separate-only flag rejected elsewhere
    r = run_cli(["nmf", str(tmp_path / "mag.npy"), "--k", "3",
                 "--phase-aware", "--out", str(tmp_path / "x.npz")])
    assert r.returncode == 2 and "separate" in r.stderr


def test_cli_separate_review_fixes(tmp_path):
    """Round-3 review findings: unnormalized dictionaries use the
    solver's normalized basis, --phase-aware rejects mask/divergence
    flags, solo rate mismatches error, unreadable input errors cleanly."""
    from scipy.io import wavfile
    rng = np.random.default_rng(40)
    m, n = 24, 40
    A = rng.gamma(2.0, 1.0, (m, 2)) @ rng.gamma(0.7, 1.0, (2, n))
    B = rng.gamma(2.0, 1.0, (m, 2)) @ rng.gamma(0.7, 1.0, (2, n))
    np.save(tmp_path / "mix.npy", (A + B).astype(np.float32))
    # UNNORMALIZED dictionaries (column norms far from 1)
    WA = (rng.uniform(0.5, 1.0, (m, 2)) * 37.0).astype(np.float32)
    WB = (rng.uniform(0.5, 1.0, (m, 2)) * 0.02).astype(np.float32)
    np.save(tmp_path / "WA.npy", WA)
    np.save(tmp_path / "WB.npy", WB)
    out = str(tmp_path / "s")
    r = run_cli(["separate", str(tmp_path / "mix.npy"), "--dicts",
                 f"{tmp_path / 'WA.npy'},{tmp_path / 'WB.npy'}",
                 "--maxiter", "30", "--out", out])
    assert r.returncode == 0, r.stderr[-500:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    est = [np.load(p) for p in summary["stems"]]
    # masks from the normalized basis the fit used: sum is exact AND the
    # mask split must not be distorted by the raw column scales (the
    # 37x-vs-0.02x dictionaries would grossly skew a Ws-based split)
    np.testing.assert_allclose(est[0] + est[1], A + B, rtol=1e-4,
                               atol=1e-4)
    assert 0.05 < np.sum(est[0]) / np.sum(A + B) < 0.95
    # --phase-aware rejects mask/divergence knobs
    r = run_cli(["separate", str(tmp_path / "mix.npy"), "--dicts",
                 f"{tmp_path / 'WA.npy'}", "--phase-aware",
                 "--power", "1.0", "--out", out])
    assert r.returncode == 2 and "--power" in r.stderr
    r = run_cli(["separate", str(tmp_path / "mix.npy"), "--dicts",
                 f"{tmp_path / 'WA.npy'}", "--phase-aware",
                 "--divergence", "kl", "--out", out])
    assert r.returncode == 2 and "--divergence" in r.stderr
    # solo sample-rate mismatch
    t8 = np.arange(1600) / 8000.0
    wavfile.write(str(tmp_path / "mix8k.wav"), 8000,
                  np.sin(2 * np.pi * 300 * t8).astype(np.float32))
    wavfile.write(str(tmp_path / "solo44k.wav"), 44100,
                  np.sin(2 * np.pi * 300 * t8).astype(np.float32))
    r = run_cli(["separate", str(tmp_path / "mix8k.wav"), "--solos",
                 str(tmp_path / "solo44k.wav"), "--ks", "2",
                 "--n-fft", "256", "--out", out])
    assert r.returncode == 2 and "44100" in r.stderr
    # uint8 PCM wavs are midpoint-centered, not [0, 1]
    u8 = (128 + 100 * np.sin(2 * np.pi * 300 * t8)).astype(np.uint8)
    wavfile.write(str(tmp_path / "u8.wav"), 8000, u8)
    from nmf_toolbox_tpu.cli import _read_signal
    x, rate = _read_signal(str(tmp_path / "u8.wav"))
    assert rate == 8000 and abs(float(np.mean(x))) < 0.02
    assert 0.7 < float(np.max(np.abs(x))) <= 1.0
    # unreadable mixture input: clean error, not a traceback
    (tmp_path / "junk.bin").write_bytes(b"not-a-npy")
    r = run_cli(["separate", str(tmp_path / "junk.bin"), "--dicts",
                 str(tmp_path / "WA.npy"), "--out", out])
    assert r.returncode == 2 and "cannot read mixture" in r.stderr


def test_cli_nmf2d(tmp_path):
    rng = np.random.default_rng(50)
    np.save(tmp_path / "V.npy", rng.uniform(0.1, 1, (20, 30)).astype(
        np.float32))
    out = str(tmp_path / "f.npz")
    r = run_cli(["nmf2d", str(tmp_path / "V.npy"), "--k", "2",
                 "--context-len", "2", "--pitch-len", "3",
                 "--maxiter", "8", "--out", out])
    assert r.returncode == 0, r.stderr[-500:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["iterations"] == 8
    with np.load(out) as z:
        assert z["W"].shape == (20, 2, 2) and z["H"].shape == (2, 30, 3)
    # missing --pitch-len and misuse on other solvers
    r = run_cli(["nmf2d", str(tmp_path / "V.npy"), "--k", "2",
                 "--context-len", "2", "--out", out])
    assert r.returncode == 2 and "pitch-len" in r.stderr
    r = run_cli(["nmf", str(tmp_path / "V.npy"), "--k", "2",
                 "--pitch-len", "2", "--out", out])
    assert r.returncode == 2 and "nmf2d" in r.stderr


def test_cli_symnmf(tmp_path):
    rng = np.random.default_rng(51)
    labels = np.repeat([0, 1], [10, 12])
    A = (labels[:, None] == labels[None, :]) * 0.8 + 0.1 \
        + 0.05 * rng.uniform(size=(22, 22))
    A = ((A + A.T) / 2).astype(np.float32)
    np.save(tmp_path / "A.npy", A)
    out = str(tmp_path / "h.npz")
    r = run_cli(["symnmf", str(tmp_path / "A.npy"), "--k", "2",
                 "--maxiter", "100", "--out", out])
    assert r.returncode == 0, r.stderr[-500:]
    with np.load(out) as z:
        H = z["H"]
    assert H.shape == (22, 2)
    pred = np.argmax(H, axis=1)
    acc = max(np.mean(pred == labels), np.mean(pred == 1 - labels))
    assert acc == 1.0


def test_cli_symnmf_rejects_inapplicable_flags(tmp_path):
    np.save(tmp_path / "A.npy", np.eye(8, dtype=np.float32))
    out = str(tmp_path / "h.npz")
    r = run_cli(["symnmf", str(tmp_path / "A.npy"), "--k", "2",
                 "--divergence", "kl", "--out", out])
    assert r.returncode == 2 and "--divergence" in r.stderr
    r = run_cli(["symnmf", str(tmp_path / "A.npy"), "--k", "2",
                 "--h-sparsity", "0.5", "--out", out])
    assert r.returncode == 2 and "h-sparsity" in r.stderr


def test_cli_encode_nmf2d(tmp_path):
    """encode --pitch-len routes a 3-D dictionary to nmf2d_encode."""
    rng = np.random.default_rng(70)
    B, m, n, k, T, P = 2, 12, 16, 2, 2, 3
    W = rng.uniform(0.1, 1, (m, k, T)).astype(np.float32)
    np.save(tmp_path / "W.npy", W)
    Vs = rng.uniform(0.1, 1, (B, m, n)).astype(np.float32)
    np.save(tmp_path / "batch.npy", Vs)
    out = str(tmp_path / "enc.npz")
    r = run_cli(["encode", str(tmp_path / "batch.npy"), "--dict",
                 str(tmp_path / "W.npy"), "--pitch-len", str(P),
                 "--maxiter", "6", "--out", out])
    assert r.returncode == 0, r.stderr[-500:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["engine"] == "nmf2d_encode"
    with np.load(out) as z:
        assert z["H"].shape == (B, k, n, P)
    # 2-D dictionary with --pitch-len rejected
    np.save(tmp_path / "W2.npy", W[:, :, 0])
    r = run_cli(["encode", str(tmp_path / "batch.npy"), "--dict",
                 str(tmp_path / "W2.npy"), "--pitch-len", "2", "--out", out])
    assert r.returncode == 2 and "3-D" in r.stderr
