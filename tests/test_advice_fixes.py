"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. utils/io._npy_header must not execute code embedded in a crafted .npy
   header (was eval(); now ast.literal_eval).
2. estimators reconstruction_err_ must report a legitimate exact-fit 0.0
   (was "last nonzero cost entry").
3. run_checkpointed's boundary duplicate-drop must only fire for
   offset-trace solvers (length n_iters+1), never swallow a genuine
   bit-identical plateau in a length-n_iters solver.
4. CLI --streaming must reject options the streaming path ignores.
"""
import json
import pathlib

import numpy as np
import pytest

from nmf_toolbox_tpu.core import Result
from nmf_toolbox_tpu.utils.io import _npy_header, load_matrix
from nmf_toolbox_tpu.utils.checkpoint import run_checkpointed

from test_cli import run_cli, matrix_file  # noqa: F401 (fixture reuse)


# ---------------------------------------------------------------------------
# 1. .npy header parsing is literal-only
# ---------------------------------------------------------------------------

def _write_npy_with_header(path, header_text: str):
    """Write a v1.0 .npy file with an arbitrary header string."""
    body = header_text.encode("latin1")
    pad = 64 - (10 + len(body)) % 64
    body += b" " * (pad - 1) + b"\n"
    with open(path, "wb") as f:
        f.write(b"\x93NUMPY" + bytes([1, 0]))
        f.write(len(body).to_bytes(2, "little"))
        f.write(body)
        f.write(np.zeros(4, dtype=np.float64).tobytes())


def test_npy_header_rejects_code_execution(tmp_path):
    canary = tmp_path / "pwned"
    evil = tmp_path / "evil.npy"
    # attribute-chain escape that defeats an empty-__builtins__ eval()
    payload = ("{'descr': '<f8', 'fortran_order': False, 'shape': "
               "(().__class__ and __import__('pathlib').Path(%r).touch() "
               "or 4,)}" % str(canary))
    _write_npy_with_header(evil, payload)
    assert _npy_header(str(evil)) is None  # parse refused, nothing executed
    assert not canary.exists()
    # load_matrix falls through to np.load, which raises on the bad header
    with pytest.raises(Exception):
        load_matrix(str(evil))


def test_npy_header_parses_valid_file(tmp_path):
    p = tmp_path / "ok.npy"
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.save(p, arr)
    hdr = _npy_header(str(p))
    assert hdr is not None
    dt, shape, off = hdr
    assert dt == np.float32 and shape == (3, 4) and off >= 10
    np.testing.assert_array_equal(load_matrix(str(p)), arr)


# ---------------------------------------------------------------------------
# 2. reconstruction_err_ reports exact-fit zero
# ---------------------------------------------------------------------------

def test_reconstruction_err_exact_fit_zero():
    from nmf_toolbox_tpu.estimators import NMF

    est = NMF(n_components=2, max_iter=3)
    canned = Result(fields=("W", "H", "cost"),
                    W=np.ones((4, 2)), H=np.ones((2, 5)),
                    cost=np.array([5.0, 1.0, 0.0]), n_iters=3)
    est._fn = lambda: (lambda V, k, **cfg: canned)
    est.fit_transform(np.ones((5, 4)))
    assert est.reconstruction_err_ == 0.0


# ---------------------------------------------------------------------------
# 3. checkpoint boundary dedupe is gated on offset-trace shape
# ---------------------------------------------------------------------------

def _fake_solver(cost_fn, offset: bool):
    """Build a stateless fake solver whose per-chunk cost trace is
    cost_fn(start_iter, maxiter); offset solvers prepend the boundary cost."""
    def solver(V, k, *, maxiter, W_init=None, H_init=None, **cfg):
        start = 0 if W_init is None else int(W_init[0, 0])
        trace = cost_fn(start, maxiter)
        if offset:
            trace = np.concatenate([[cost_fn(start - 1, 1)[-1] if start
                                     else trace[0] + 1.0], trace])
        W = np.full((2, 2), float(start + maxiter))
        return Result(fields=("W", "H", "cost"), W=W, H=np.ones((2, 3)),
                      cost=np.asarray(trace, float), n_iters=maxiter)
    return solver


def test_checkpoint_plateau_not_swallowed(tmp_path):
    # plain-trace solver whose cost hits an exact plateau at 1.0
    plateau = _fake_solver(lambda s, n: np.maximum(10.0 - np.arange(s + 1, s + n + 1), 1.0),
                           offset=False)
    res = run_checkpointed(plateau, np.ones((2, 3)), 2, total_iters=20,
                           chunk=10, path=str(tmp_path / "c.npz"),
                           tolerance=1e-12)
    # chunk 1 ends at cost 1.0; chunk 2 starts at cost 1.0 (a genuine
    # iteration) — both entries must survive in the concatenated trace
    assert len(res.cost) == 20
    assert res.cost[9] == 1.0 and res.cost[10] == 1.0


def test_checkpoint_offset_trace_dedupes(tmp_path):
    decreasing = _fake_solver(lambda s, n: 100.0 / np.arange(s + 1, s + n + 1),
                              offset=True)
    res = run_checkpointed(decreasing, np.ones((2, 3)), 2, total_iters=20,
                           chunk=10, path=str(tmp_path / "d.npz"),
                           tolerance=0.0)
    # offset traces carry n_iters+1 entries; the second chunk's initial
    # entry duplicates the boundary and must be dropped exactly once
    assert len(res.cost) == 21
    vals = np.asarray(res.cost)
    assert vals[10] == 100.0 / 10 and vals[11] == 100.0 / 11


# ---------------------------------------------------------------------------
# 4. CLI --streaming rejects silently-ignored options
# ---------------------------------------------------------------------------

def test_cli_streaming_rejects_unsupported(matrix_file, tmp_path):  # noqa: F811
    r = run_cli(["nmf", matrix_file, "--k", "3", "--streaming",
                 "--divergence", "kl", "--out", str(tmp_path / "s.npz")])
    assert r.returncode == 2
    assert "--divergence" in r.stderr


def test_cli_streaming_allows_euclidean(matrix_file, tmp_path):  # noqa: F811
    out = str(tmp_path / "s.npz")
    r = run_cli(["nmf", matrix_file, "--k", "3", "--streaming",
                 "--maxiter", "3", "--divergence", "euclidean", "--out", out])
    assert r.returncode == 0, r.stderr[-500:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["k"] == 3


# ---------------------------------------------------------------------------
# Round-2 advisor findings
# ---------------------------------------------------------------------------

def test_negative_and_nan_weights_rejected():
    """ADVICE r2 #1: invalid weights must fail uniformly in every
    divergence, not flip KL/AB denominators silently."""
    import nmf_toolbox_tpu as nt

    rng = np.random.default_rng(0)
    V = rng.uniform(0.1, 1.0, (6, 8))
    w_neg = np.ones((6, 8))
    w_neg[2, 3] = -0.5
    w_nan = np.ones((6, 8))
    w_nan[1, 1] = np.nan
    for div in ("euclidean", "kl"):
        with pytest.raises(ValueError, match="nonnegative"):
            nt.nmf(V, 3, weights=w_neg, divergence=div, maxiter=2, seed=0)
        with pytest.raises(ValueError, match="NaN"):
            nt.nmf(V, 3, weights=w_nan, divergence=div, maxiter=2, seed=0)
    # zero weights remain legal (the masking idiom)
    res = nt.nmf(V, 3, weights=(rng.uniform(size=(6, 8)) < 0.7).astype(float),
                 maxiter=3, seed=0)
    assert np.all(np.isfinite(np.asarray(res.cost)[:res.n_iters]))


def test_estimator_weights_sklearn_orientation():
    """ADVICE r2 #2: the facade converts X to solver layout; weights given
    in sklearn orientation (n_samples, n_features) must ride along."""
    import nmf_toolbox_tpu as nt
    from nmf_toolbox_tpu.estimators import NMF

    rng = np.random.default_rng(1)
    X = rng.uniform(0.1, 1.0, (6, 4))          # 6 samples, 4 features
    w = (rng.uniform(size=(6, 4)) < 0.8).astype(float)
    est = NMF(n_components=2, max_iter=5, tol=1e-12, random_state=3,
              weights=w)
    Ht = est.fit_transform(X)                  # non-square: would raise pre-fix
    ref = nt.nmf(X.T, 2, weights=w.T, maxiter=5, tolerance=1e-12, seed=3)
    np.testing.assert_allclose(est.components_, np.asarray(ref.W).T, rtol=1e-12)
    np.testing.assert_allclose(Ht, np.asarray(ref.H).T, rtol=1e-12)


def test_randomized_svd_uses_operand_eps():
    """ADVICE r2 #3: f64 seeding must use ~1e-16-scale ridges/floors, so an
    exactly rank-k f64 matrix reconstructs far below the f32-eps plateau."""
    import jax.numpy as jnp
    from nmf_toolbox_tpu.utils.init import _randomized_svd, _working_eps

    assert _working_eps(np.float64) == np.finfo(np.float64).eps
    assert _working_eps(np.float32) == np.finfo(np.float32).eps
    assert _working_eps(np.float16) == np.finfo(np.float32).eps  # fallback

    rng = np.random.default_rng(2)
    A = rng.standard_normal((60, 3)) @ rng.standard_normal((3, 40))
    import jax
    U, s, Vt = _randomized_svd(jax.random.PRNGKey(0), jnp.asarray(A), 3)
    err = np.linalg.norm((U * s) @ Vt - A) / np.linalg.norm(A)
    assert err < 1e-9, err
