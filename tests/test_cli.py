"""CLI end-to-end tests (module invocation; the console script maps to
the same entry point)."""
import json
import subprocess
import sys

import numpy as np
import pytest


def run_cli(args, cwd="/root/repo"):
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin:/usr/local/bin",
           "JAX_PLATFORMS": "cpu", "HOME": "/root"}
    return subprocess.run([sys.executable, "-m", "nmf_toolbox_tpu"] + args,
                          capture_output=True, text=True, cwd=cwd, env=env)


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
