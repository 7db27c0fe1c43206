"""API-surface tests: MATLAB-style config dicts, Result ergonomics."""
import numpy as np
import pytest

import nmf_toolbox_tpu as nt


def test_config_dict_positional():
    """MATLAB style: nmf(V, k, config) with a struct-like dict."""
    rng = np.random.default_rng(0)
    V = rng.uniform(0.1, 1, (20, 30))
    cfg = {"divergence": "kl_divergence", "maxiter": 8, "tolerance": 1e-9,
           "H_sparsity": 0.05}
    a = nt.nmf(V, 4, cfg, seed=1, dtype=np.float64)
    b = nt.nmf(V, 4, divergence="kl", maxiter=8, tolerance=1e-9,
               H_sparsity=0.05, seed=1, dtype=np.float64)
    np.testing.assert_array_equal(a.W, b.W)
    np.testing.assert_array_equal(np.asarray(a.cost), np.asarray(b.cost))


def test_kwargs_override_config_dict():
    rng = np.random.default_rng(1)
    V = rng.uniform(0.1, 1, (15, 20))
    a = nt.nmf(V, 3, {"maxiter": 50}, maxiter=5, dtype=np.float64, seed=2)
    assert len(a.cost) <= 5


def test_result_unpacking_orders():
    rng = np.random.default_rng(2)
    V = rng.uniform(0.1, 1, (15, 20)).astype(np.float64)
    W, H, cost = nt.nmf(V, 3, maxiter=3)
    assert W.shape == (15, 3) and H.shape == (3, 20)
    W, H, G, cost = nt.convexnmf(V, 3, maxiter=3)
    assert G.shape == (20, 3)
    W, H, S, G, cost = nt.chnmf(V, 3, maxiter=3)
    assert S.shape[0] == 15
    labels = np.zeros(20, dtype=int)
    W, H, Z, A, cost = nt.constrainednmf(V, labels, 3, maxiter=3)
    assert A.shape == (1, 20)  # all same class, all labeled
    Vc = V * np.exp(1j * rng.uniform(size=V.shape))
    W, H, P, cost = nt.cmfwisa(Vc, 3, maxiter=3)
    assert P.shape == V.shape
    # indexing like a tuple
    r = nt.nmf(V, 3, maxiter=2)
    assert r[0].shape == (15, 3) and len(r) == 3


def test_maxiter_tolerance_invalid_defaults():
    """maxiter <= 0 and tolerance <= 0 fall back to defaults
    (ValidateParameters.m:222-230)."""
    rng = np.random.default_rng(3)
    V = rng.uniform(0.1, 1, (10, 12))
    r = nt.nmf(V, 2, maxiter=-5, tolerance=-1.0, dtype=np.float64)
    assert len(r.cost) <= 100  # default maxiter
    r2 = nt.lnmf(V, 2, maxiter=0, dtype=np.float64)
    assert len(r2.cost) == 100


def test_graft_entry_matches_solver_step():
    """__graft_entry__.entry() must stay in sync with the nmf Gram step:
    one call == one nmf iteration (cost and factors)."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as g
    import jax

    fn, (V, W, H) = g.entry()
    # the solver normalizes the initial basis to unit-L2 columns
    # (nmf.m:132-134) before iterating; do the same for the raw step
    W = W / np.sqrt(np.sum(np.asarray(W)**2, axis=0, keepdims=True))
    W1, H1, cost1 = jax.jit(fn)(V, W, H)
    res = nt.nmf(np.asarray(V), W.shape[1], W_init=np.asarray(W),
                 H_init=np.asarray(H), maxiter=1, tolerance=1e-30)
    np.testing.assert_allclose(np.asarray(W1), res.W, atol=2e-5)
    np.testing.assert_allclose(np.asarray(H1), res.H, atol=2e-5)
    np.testing.assert_allclose(float(cost1), float(res.cost[0]), rtol=1e-4)


def test_config_dict_carries_round2_keys():
    # MATLAB-struct-style dict config must carry the round-2 extras
    # (weights / inner_iters / init) exactly like kwargs
    import numpy as np
    import nmf_toolbox_tpu as nt
    rng = np.random.default_rng(5)
    V = (rng.gamma(2.0, 1.0, (40, 4)) @ rng.gamma(0.5, 1.0, (4, 30))
         + 0.01).astype(np.float32)
    M = (rng.uniform(size=V.shape) < 0.85).astype(np.float32)
    cfg = {"weights": M, "maxiter": 6, "tolerance": 1e-30}
    r1 = nt.nmf(V, 4, cfg, seed=2)
    r2 = nt.nmf(V, 4, weights=M, maxiter=6, tolerance=1e-30, seed=2)
    np.testing.assert_array_equal(r1.W, r2.W)
    r3 = nt.nmf(V, 4, {"inner_iters": 3, "init": "nndsvdar",
                       "maxiter": 5, "tolerance": 1e-30})
    assert np.all(np.isfinite(r3.cost))


def test_api_md_documents_every_public_symbol():
    """Doc-coverage gate (round-5): every symbol in the package __all__
    (and in utils.__all__ / parallel exports) must appear in API.md, so
    a new export cannot ship undocumented."""
    import pathlib
    import re
    api = (pathlib.Path(__file__).parent.parent / "API.md").read_text()
    from nmf_toolbox_tpu import utils as nt_utils
    symbols = set(nt.__all__) | set(nt_utils.__all__) | {
        "make_mesh", "init_distributed"}
    missing = sorted(s for s in symbols
                     if not re.search(r"\b" + re.escape(s) + r"\b", api))
    assert not missing, f"undocumented public symbols: {missing}"


def test_version_consistency():
    """pyproject.toml's [project] version must match the package
    __version__ (the CLI --version source) — they drifted once in 1.1.0."""
    import pathlib
    import re
    pj = (pathlib.Path(__file__).parent.parent / "pyproject.toml").read_text()
    m = re.search(r'^version = "([^"]+)"', pj, re.M)
    assert m and m.group(1) == nt.__version__
