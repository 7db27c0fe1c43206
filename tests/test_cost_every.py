"""cost_every: objective-cadence knob (beyond-reference perf option).

The objective feeds ONLY the stopping rule (nmf.m:221-224), never the
multiplicative updates, so any cadence must leave the factor trajectory
BIT-identical to the default — that is the load-bearing invariant here.
The cost trace holds the last computed value on skipped iterations, and
the computed entries must equal the default trace's entries at the same
indices exactly (same ops, same order — XLA CSE, not a reimplementation).
"""
import numpy as np
import pytest

import nmf_toolbox_tpu as nt

M, N, K = 26, 34, 5


def _problem(seed=0):
    rng = np.random.default_rng(seed)
    V = rng.uniform(0.1, 1.0, (M, N))
    W0 = rng.uniform(0.1, 1.0, (M, K))
    H0 = rng.uniform(0.1, 1.0, (K, N))
    return V, W0, H0


@pytest.mark.parametrize("div,method", [
    ("euclidean", "gram"), ("euclidean", "naive"), ("kl", "naive"),
    ("is", "naive"), ("ab", "naive"),
])
def test_factors_bitexact_and_trace_cadence(div, method):
    V, W0, H0 = _problem()
    kw = dict(W_init=W0, H_init=H0, divergence=div, method=method,
              maxiter=20, tolerance=0.0, dtype=np.float64)
    if div == "ab":
        kw.update(alpha=1.5, beta=0.5)
    r1 = nt.nmf(V, K, **kw)
    r2 = nt.nmf(V, K, cost_every=7, **kw)
    assert np.array_equal(np.asarray(r1.W), np.asarray(r2.W))
    assert np.array_equal(np.asarray(r1.H), np.asarray(r2.H))
    c1, c2 = np.asarray(r1.cost), np.asarray(r2.cost)
    # computed at iterations 1, 7, 14 and the final one (i=0, 6, 13, 19)
    for idx in (0, 6, 13, 19):
        assert c1[idx] == c2[idx]
    # carried (repeated) in between
    assert np.all(c2[1:6] == c2[0])
    assert np.all(c2[7:13] == c2[6])
    assert np.all(c2[14:19] == c2[13])


def test_weighted_bitexact():
    V, W0, H0 = _problem(3)
    Mw = np.random.default_rng(4).uniform(0.0, 1.0, (M, N))
    kw = dict(W_init=W0, H_init=H0, divergence="kl", weights=Mw,
              maxiter=15, tolerance=0.0, dtype=np.float64)
    r1 = nt.nmf(V, K, **kw)
    r2 = nt.nmf(V, K, cost_every=4, **kw)
    assert np.array_equal(np.asarray(r1.W), np.asarray(r2.W))
    assert np.array_equal(np.asarray(r1.H), np.asarray(r2.H))


def test_early_stop_still_fires():
    V, W0, H0 = _problem(7)
    kw = dict(W_init=W0, H_init=H0, maxiter=400, tolerance=1e-3,
              dtype=np.float64)
    r_ce = nt.nmf(V, K, cost_every=5, **kw)
    r_d = nt.nmf(V, K, **kw)
    assert r_d.converged
    assert r_ce.converged
    # the cadence rule stops at the first CHECK where the decrease over
    # the whole 5-iteration window is < tol — a strictly harder bar than
    # the per-iteration rule, so it can only stop at/after the default
    # (measured here: 345 vs 215)
    assert r_ce.n_iters >= r_d.n_iters
    # stop must land on a check iteration (1, 5, 10, ... or maxiter)
    n = r_ce.n_iters
    assert n == 1 or n % 5 == 0 or n == 400
    # final cost entry is a real (computed) objective at the stop point:
    # non-increasing vs the previous computed entry
    c = np.asarray(r_ce.cost)
    assert c[-1] <= c[max(n - 5, 0)]


def test_fixed_factor_and_multisource():
    V, W0, H0 = _problem(11)
    kw = dict(W_init=[W0[:, :2], W0[:, 2:]], H_init=[H0[:2], H0[2:]],
              divergence="kl", maxiter=12, tolerance=0.0,
              W_fixed=[True, False], dtype=np.float64)
    r1 = nt.nmf(V, [2, K - 2], **kw)
    r2 = nt.nmf(V, [2, K - 2], cost_every=3, **kw)
    for a, b in zip(r1.W, r2.W):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(r1.H, r2.H):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_validation():
    V, _, _ = _problem()
    with pytest.raises(ValueError, match="cost_every"):
        nt.nmf(V, K, cost_every=0)
    with pytest.raises(ValueError, match="cost_every"):
        nt.nmf_encode(np.stack([V, V]), np.ones((M, 2)), cost_every=-1)


def test_cli_cost_every(tmp_path):
    from nmf_toolbox_tpu.cli import main
    V, _, _ = _problem(31)
    vp = tmp_path / "v.npy"
    np.save(vp, V.astype(np.float32))
    out1, out2 = tmp_path / "a.npz", tmp_path / "b.npz"
    base = ["nmf", str(vp), "--k", "4", "--divergence", "kl",
            "--maxiter", "8", "--seed", "3"]
    assert main(base + ["--out", str(out1), "--quiet"]) == 0
    assert main(base + ["--cost-every", "4", "--out", str(out2),
                        "--quiet"]) == 0
    a, b = np.load(out1), np.load(out2)
    assert np.array_equal(a["W"], b["W"])
    assert np.array_equal(a["H"], b["H"])
    # cnmf accepts the knob too (bit-identical factors)
    cb = ["cnmf", str(vp), "--k", "3", "--context-len", "2",
          "--divergence", "kl", "--maxiter", "6", "--seed", "3"]
    assert main(cb + ["--out", str(out1), "--quiet"]) == 0
    assert main(cb + ["--cost-every", "3", "--out", str(out2),
                      "--quiet"]) == 0
    a, b = np.load(out1), np.load(out2)
    assert np.array_equal(a["W"], b["W"])
    assert np.array_equal(a["H"], b["H"])
    # lnmf accepts the knob too (bit-identical factors; inclusive rule)
    lb = ["lnmf", str(vp), "--k", "4", "--maxiter", "6", "--seed", "3"]
    assert main(lb + ["--out", str(out1), "--quiet"]) == 0
    assert main(lb + ["--cost-every", "4", "--out", str(out2),
                      "--quiet"]) == 0
    a, b = np.load(out1), np.load(out2)
    assert np.array_equal(a["W"], b["W"])
    assert np.array_equal(a["H"], b["H"])
    # unsupported targets error (the CLI's no-silent-ignore convention):
    # symnmf's Gram-identity objective rides the update's own products,
    # so the knob is deliberately absent there
    assert main(["symnmf", str(vp), "--k", "4", "--cost-every", "4",
                 "--out", str(out2), "--quiet"]) == 2
    assert main(base + ["--streaming", "--cost-every", "4",
                        "--out", str(out2), "--quiet"]) == 2


@pytest.mark.parametrize("div", ["euclidean", "kl"])
def test_batched_bitexact(div):
    rng = np.random.default_rng(21)
    B = 3
    Vs = rng.uniform(0.1, 1.0, (B, 12, 15))
    W0 = rng.uniform(0.1, 1.0, (B, 12, 4))
    H0 = rng.uniform(0.1, 1.0, (B, 4, 15))
    kw = dict(W_init=W0, H_init=H0, divergence=div, maxiter=11,
              dtype=np.float64)
    r1 = nt.nmf_batched(Vs, 4, **kw)
    r2 = nt.nmf_batched(Vs, 4, cost_every=4, **kw)
    assert np.array_equal(np.asarray(r1.W), np.asarray(r2.W))
    assert np.array_equal(np.asarray(r1.H), np.asarray(r2.H))
    c1, c2 = np.asarray(r1.cost), np.asarray(r2.cost)
    # computed at i = 0, 3, 7, 10 (cadence 4 + first + last); carried
    # in between
    for idx in (0, 3, 7, 10):
        np.testing.assert_allclose(c2[:, idx], c1[:, idx], rtol=0, atol=0)
    assert np.all(c2[:, 1:3] == c2[:, :1])
    assert np.all(c2[:, 4:7] == c2[:, 3:4])


@pytest.mark.parametrize("div", ["euclidean", "kl", "is"])
def test_encode_bitexact(div):
    rng = np.random.default_rng(23)
    B = 4
    Vs = rng.uniform(0.1, 1.0, (B, 10, 14))
    W = rng.uniform(0.1, 1.0, (10, 3))
    H0 = rng.uniform(0.1, 1.0, (B, 3, 14))
    kw = dict(H_init=H0, divergence=div, maxiter=9, H_sparsity=0.05,
              dtype=np.float64)
    r1 = nt.nmf_encode(Vs, W, **kw)
    r2 = nt.nmf_encode(Vs, W, cost_every=3, **kw)
    assert np.array_equal(np.asarray(r1.H), np.asarray(r2.H))
    c1, c2 = np.asarray(r1.cost), np.asarray(r2.cost)
    for idx in (0, 2, 5, 8):
        assert np.array_equal(c2[:, idx], c1[:, idx])
    assert np.all(c2[:, 1:2] == c2[:, :1])
    assert np.all(c2[:, 3:5] == c2[:, 2:3])


def test_encode_weighted_bitexact():
    rng = np.random.default_rng(29)
    B = 3
    Vs = rng.uniform(0.1, 1.0, (B, 10, 14))
    W = rng.uniform(0.1, 1.0, (10, 3))
    H0 = rng.uniform(0.1, 1.0, (B, 3, 14))
    Mw = rng.uniform(0.0, 1.0, (B, 10, 14))
    kw = dict(H_init=H0, divergence="kl", weights=Mw, maxiter=8,
              dtype=np.float64)
    r1 = nt.nmf_encode(Vs, W, **kw)
    r2 = nt.nmf_encode(Vs, W, cost_every=4, **kw)
    assert np.array_equal(np.asarray(r1.H), np.asarray(r2.H))
    c1, c2 = np.asarray(r1.cost), np.asarray(r2.cost)
    for idx in (0, 3, 7):
        assert np.array_equal(c2[:, idx], c1[:, idx])


def test_segmented_equals_cond_fallback(monkeypatch):
    """The segmented-scan cadence (the default) and the per-step
    lax.cond fallback (dense cadences past _SEGMENT_MAX_CHECKS) must
    produce identical factors AND identical cost traces — carried
    entries included."""
    from nmf_toolbox_tpu.models import batched as mod
    rng = np.random.default_rng(41)
    B = 3
    Vs = rng.uniform(0.1, 1.0, (B, 12, 15))
    W0 = rng.uniform(0.1, 1.0, (B, 12, 4))
    H0 = rng.uniform(0.1, 1.0, (B, 4, 15))
    Wd = rng.uniform(0.1, 1.0, (12, 4))
    H0e = rng.uniform(0.1, 1.0, (B, 4, 15))
    kw = dict(divergence="kl", maxiter=13, dtype=np.float64)

    r_seg = nt.nmf_batched(Vs, 4, W_init=W0, H_init=H0, cost_every=5, **kw)
    e_seg = nt.nmf_encode(Vs, Wd, H_init=H0e, cost_every=5, **kw)

    monkeypatch.setattr(mod, "_SEGMENT_MAX_CHECKS", 0)
    mod._build_solver.cache_clear()
    mod._build_encode_solver.cache_clear()
    try:
        r_cond = nt.nmf_batched(Vs, 4, W_init=W0, H_init=H0,
                                cost_every=5, **kw)
        e_cond = nt.nmf_encode(Vs, Wd, H_init=H0e, cost_every=5, **kw)
    finally:
        # evict the solvers compiled under the patched threshold
        mod._build_solver.cache_clear()
        mod._build_encode_solver.cache_clear()

    assert np.array_equal(np.asarray(r_seg.W), np.asarray(r_cond.W))
    assert np.array_equal(np.asarray(r_seg.H), np.asarray(r_cond.H))
    assert np.array_equal(np.asarray(r_seg.cost), np.asarray(r_cond.cost))
    assert np.array_equal(np.asarray(e_seg.H), np.asarray(e_cond.H))
    assert np.array_equal(np.asarray(e_seg.cost), np.asarray(e_cond.cost))


@pytest.mark.parametrize("div,method", [
    ("euclidean", "gram"), ("euclidean", "naive"), ("kl", "naive"),
    ("is", "naive"),
])
def test_cnmf_bitexact_and_trace_cadence(div, method):
    V, _, _ = _problem(13)
    rng = np.random.default_rng(14)
    T = 3
    W0 = rng.uniform(0.1, 1.0, (M, K, T))
    H0 = rng.uniform(0.1, 1.0, (K, N))
    kw = dict(W_init=W0, H_init=H0, divergence=div, method=method,
              maxiter=15, tolerance=0.0, dtype=np.float64)
    r1 = nt.cnmf(V, K, T, **kw)
    r2 = nt.cnmf(V, K, T, cost_every=6, **kw)
    assert np.array_equal(np.asarray(r1.W), np.asarray(r2.W))
    assert np.array_equal(np.asarray(r1.H), np.asarray(r2.H))
    c1, c2 = np.asarray(r1.cost), np.asarray(r2.cost)
    # computed at iterations 1, 6, 12 and the final one (i=0, 5, 11, 14)
    for idx in (0, 5, 11, 14):
        assert c1[idx] == c2[idx]
    assert np.all(c2[1:5] == c2[0])
    assert np.all(c2[6:11] == c2[5])


def test_cnmf_weighted_and_fixed_bitexact():
    V, _, _ = _problem(17)
    rng = np.random.default_rng(18)
    T = 2
    W0 = rng.uniform(0.1, 1.0, (M, K, T))
    H0 = rng.uniform(0.1, 1.0, (K, N))
    Mw = rng.uniform(0.0, 1.0, (M, N))
    kw = dict(W_init=W0, H_init=H0, divergence="kl", maxiter=10,
              tolerance=0.0, dtype=np.float64)
    r1 = nt.cnmf(V, K, T, weights=Mw, **kw)
    r2 = nt.cnmf(V, K, T, weights=Mw, cost_every=4, **kw)
    assert np.array_equal(np.asarray(r1.W), np.asarray(r2.W))
    assert np.array_equal(np.asarray(r1.H), np.asarray(r2.H))
    r3 = nt.cnmf(V, K, T, W_fixed=True, **kw)
    r4 = nt.cnmf(V, K, T, W_fixed=True, cost_every=4, **kw)
    assert np.array_equal(np.asarray(r3.H), np.asarray(r4.H))


def test_cnmf_early_stop_still_fires():
    V, _, _ = _problem(19)
    # the windowed rule needs the 5-iteration decrease < tol, a strictly
    # harder bar than the per-iteration rule (measured: 57 vs 145 here)
    kw = dict(maxiter=300, tolerance=5e-2, seed=2, dtype=np.float64)
    r_d = nt.cnmf(V, K, 2, **kw)
    r_ce = nt.cnmf(V, K, 2, cost_every=5, **kw)
    assert r_d.converged and r_ce.converged
    assert r_ce.n_iters >= r_d.n_iters
    n = r_ce.n_iters
    assert n == 1 or n % 5 == 0 or n == 300


@pytest.mark.parametrize("div", ["euclidean", "kl", "is"])
def test_cnmf_encode_bitexact(div):
    rng = np.random.default_rng(33)
    B, m, n, k, T = 3, 14, 20, 4, 3
    Vs = rng.uniform(0.1, 1.0, (B, m, n))
    W = rng.uniform(0.1, 1.0, (m, k, T))
    H0 = rng.uniform(0.1, 1.0, (B, k, n))
    kw = dict(H_init=H0, divergence=div, maxiter=9, H_sparsity=0.03,
              dtype=np.float64)
    r1 = nt.cnmf_encode(Vs, W, **kw)
    r2 = nt.cnmf_encode(Vs, W, cost_every=3, **kw)
    assert np.array_equal(np.asarray(r1.H), np.asarray(r2.H))
    c1, c2 = np.asarray(r1.cost), np.asarray(r2.cost)
    for idx in (0, 2, 5, 8):
        assert np.array_equal(c2[:, idx], c1[:, idx])
    assert np.all(c2[:, 3:5] == c2[:, 2:3])


def test_cnmf_encode_weighted_bitexact():
    rng = np.random.default_rng(37)
    B, m, n, k, T = 3, 14, 20, 4, 2
    Vs = rng.uniform(0.1, 1.0, (B, m, n))
    W = rng.uniform(0.1, 1.0, (m, k, T))
    H0 = rng.uniform(0.1, 1.0, (B, k, n))
    Mw = rng.uniform(0.0, 1.0, (B, m, n))
    kw = dict(H_init=H0, divergence="kl", weights=Mw, maxiter=8,
              dtype=np.float64)
    r1 = nt.cnmf_encode(Vs, W, **kw)
    r2 = nt.cnmf_encode(Vs, W, cost_every=4, **kw)
    assert np.array_equal(np.asarray(r1.H), np.asarray(r2.H))
    c1, c2 = np.asarray(r1.cost), np.asarray(r2.cost)
    for idx in (0, 3, 7):
        assert np.array_equal(c2[:, idx], c1[:, idx])


@pytest.mark.parametrize("div", ["euclidean", "kl", "is"])
def test_nmf2d_bitexact_and_trace_cadence(div):
    V, _, _ = _problem(43)
    rng = np.random.default_rng(44)
    T, P = 3, 2
    W0 = rng.uniform(0.1, 1.0, (M, K, T))
    H0 = rng.uniform(0.1, 1.0, (K, N, P))
    kw = dict(W_init=W0, H_init=H0, divergence=div, maxiter=12,
              tolerance=0.0, dtype=np.float64)
    r1 = nt.nmf2d(V, K, T, P, **kw)
    r2 = nt.nmf2d(V, K, T, P, cost_every=5, **kw)
    assert np.array_equal(np.asarray(r1.W), np.asarray(r2.W))
    assert np.array_equal(np.asarray(r1.H), np.asarray(r2.H))
    c1, c2 = np.asarray(r1.cost), np.asarray(r2.cost)
    # computed at iterations 1, 5, 10 and the final one (i=0, 4, 9, 11)
    for idx in (0, 4, 9, 11):
        assert c1[idx] == c2[idx]
    assert np.all(c2[1:4] == c2[0])
    assert np.all(c2[5:9] == c2[4])


def test_nmf2d_early_stop_still_fires():
    V, _, _ = _problem(47)
    kw = dict(maxiter=200, tolerance=5e-2, seed=6, dtype=np.float64)
    r_d = nt.nmf2d(V, K, 2, 2, **kw)
    r_ce = nt.nmf2d(V, K, 2, 2, cost_every=4, **kw)
    assert r_d.converged and r_ce.converged
    assert r_ce.n_iters >= r_d.n_iters
    n = r_ce.n_iters
    assert n == 1 or n % 4 == 0 or n == 200


@pytest.mark.parametrize("div", ["euclidean", "kl", "is"])
def test_nmf2d_encode_bitexact(div):
    rng = np.random.default_rng(51)
    B, m, n, k, T, P = 3, 14, 20, 4, 3, 2
    Vs = rng.uniform(0.1, 1.0, (B, m, n))
    W = rng.uniform(0.1, 1.0, (m, k, T))
    H0 = rng.uniform(0.1, 1.0, (B, k, n, P))
    kw = dict(H_init=H0, divergence=div, maxiter=9, H_sparsity=0.03,
              dtype=np.float64)
    r1 = nt.nmf2d_encode(Vs, W, P, **kw)
    r2 = nt.nmf2d_encode(Vs, W, P, cost_every=3, **kw)
    assert np.array_equal(np.asarray(r1.H), np.asarray(r2.H))
    c1, c2 = np.asarray(r1.cost), np.asarray(r2.cost)
    for idx in (0, 2, 5, 8):
        assert np.array_equal(c2[:, idx], c1[:, idx])
    assert np.all(c2[:, 3:5] == c2[:, 2:3])


def test_cost_every_larger_than_maxiter():
    V, W0, H0 = _problem(5)
    kw = dict(W_init=W0, H_init=H0, divergence="kl", maxiter=6,
              tolerance=0.0, dtype=np.float64)
    r1 = nt.nmf(V, K, **kw)
    r2 = nt.nmf(V, K, cost_every=100, **kw)
    assert np.array_equal(np.asarray(r1.W), np.asarray(r2.W))
    c1, c2 = np.asarray(r1.cost), np.asarray(r2.cost)
    # computed at the first and last iteration only
    assert c2[0] == c1[0] and c2[-1] == c1[-1]
    assert np.all(c2[1:5] == c2[0])


def test_lnmf_bitexact_and_no_spurious_inclusive_stop():
    """lnmf's inclusive <= stop rule (lnmf.m:89) is the regression this
    guards: a carried (repeated) cost satisfies ``c <= prev`` and
    ``prev - c <= tol`` on EVERY skipped iteration, so without the
    check-point gating in ops/loop.run the ce>1 solver would stop at
    iteration 2 unconditionally."""
    V, W0, H0 = _problem(11)
    kw = dict(W_init=W0, H_init=H0, maxiter=20, tolerance=0.0,
              dtype=np.float64)
    r1 = nt.lnmf(V, K, **kw)
    r2 = nt.lnmf(V, K, cost_every=7, **kw)
    # tolerance=0 + strictly decreasing computed costs -> neither stops
    assert r1.n_iters == 20 and r2.n_iters == 20
    assert np.array_equal(np.asarray(r1.W), np.asarray(r2.W))
    assert np.array_equal(np.asarray(r1.H), np.asarray(r2.H))
    c1, c2 = np.asarray(r1.cost), np.asarray(r2.cost)
    # computed at iterations 1, 7, 14, 20 (i = 0, 6, 13, 19)
    for idx in (0, 6, 13, 19):
        assert c1[idx] == c2[idx]
    assert np.all(c2[1:6] == c2[0])
    assert np.all(c2[7:13] == c2[6])
    assert np.all(c2[14:19] == c2[13])


def test_lnmf_early_stop_lands_on_check_iteration():
    V, W0, H0 = _problem(13)
    kw = dict(W_init=W0, H_init=H0, maxiter=300, tolerance=5e-2,
              dtype=np.float64)
    r_d = nt.lnmf(V, K, **kw)
    r_ce = nt.lnmf(V, K, cost_every=5, **kw)
    assert r_d.converged and r_ce.converged
    assert r_ce.n_iters >= r_d.n_iters
    n = r_ce.n_iters
    assert n == 1 or n % 5 == 0 or n == 300
    # lnmf quirk: the cost vector is never trimmed (lnmf.m:89-91)
    assert len(np.asarray(r_ce.cost)) == 300


def _constrained_problem(seed=17):
    rng = np.random.default_rng(seed)
    m, n, k = 18, 30, 4
    V = rng.uniform(0.1, 1, (m, n))
    labels = rng.integers(0, 3, n)
    labels[rng.choice(n, 10, replace=False)] = -1
    W0 = rng.uniform(size=(m, k))
    nu = n - int((labels > -1).sum())
    ncls = len(np.unique(labels)) - 1
    Z0 = rng.uniform(size=(k, nu + ncls))
    return V, labels, k, W0, Z0


@pytest.mark.parametrize("div", ["euclidean", "kl"])
def test_constrainednmf_bitexact_and_trace_cadence(div):
    V, labels, k, W0, Z0 = _constrained_problem()
    kw = dict(W_init=W0, Z_init=Z0, divergence=div, maxiter=15,
              tolerance=0.0, dtype=np.float64)
    r1 = nt.constrainednmf(V, labels, k, **kw)
    r2 = nt.constrainednmf(V, labels, k, cost_every=6, **kw)
    assert np.array_equal(np.asarray(r1.W), np.asarray(r2.W))
    assert np.array_equal(np.asarray(r1.Z), np.asarray(r2.Z))
    assert np.array_equal(np.asarray(r1.H), np.asarray(r2.H))
    c1, c2 = np.asarray(r1.cost), np.asarray(r2.cost)
    # computed at iterations 1, 6, 12, 15 (i = 0, 5, 11, 14)
    for idx in (0, 5, 11, 14):
        assert c1[idx] == c2[idx]
    assert np.all(c2[1:5] == c2[0])
    assert np.all(c2[6:11] == c2[5])


def test_constrainednmf_early_stop_still_fires():
    V, labels, k, W0, Z0 = _constrained_problem(19)
    kw = dict(W_init=W0, Z_init=Z0, maxiter=400, tolerance=1e-2,
              dtype=np.float64)
    r_d = nt.constrainednmf(V, labels, k, **kw)
    r_ce = nt.constrainednmf(V, labels, k, cost_every=5, **kw)
    assert r_d.converged and r_ce.converged
    assert r_ce.n_iters >= r_d.n_iters
    n = r_ce.n_iters
    assert n == 1 or n % 5 == 0 or n == 400
