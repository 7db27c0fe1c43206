"""Tests for viz (sort/view dictionary) and checkpoint utilities."""
import os

import numpy as np
import pytest

import nmf_toolbox_tpu as nt
from nmf_toolbox_tpu.utils import (sort_dictionary, view_dictionary,
                                   save_factors, load_factors)


def oracle_sort(W, H=None):
    """Literal SortDictionary.m:31-47."""
    W = np.asarray(W)
    k = W.shape[1]
    csum = np.cumsum(W, axis=0)
    cog = np.zeros(k, dtype=int)
    for j in range(k):
        idx = np.nonzero(csum[:, j] <= csum[-1, j] / 2)[0]
        cog[j] = (idx[-1] + 1) if idx.size else 1
    order = np.argsort(cog, kind="stable")
    if H is None:
        return W[:, order]
    return W[:, order], np.asarray(H)[order, :]


def test_sort_dictionary_matches_oracle():
    rng = np.random.default_rng(0)
    for trial in range(5):
        W = rng.uniform(size=(30, 6))
        H = rng.uniform(size=(6, 12))
        Ws, Hs = sort_dictionary(W, H)
        Wo, Ho = oracle_sort(W, H)
        np.testing.assert_array_equal(Ws, Wo)
        np.testing.assert_array_equal(Hs, Ho)


def test_sort_dictionary_centered_basis():
    # columns peaked at increasing positions must come back ordered
    W = np.zeros((20, 3))
    W[15, 0] = 1.0
    W[2, 1] = 1.0
    W[8, 2] = 1.0
    Ws = sort_dictionary(W)
    assert np.argmax(Ws[:, 0]) == 2
    assert np.argmax(Ws[:, 1]) == 8
    assert np.argmax(Ws[:, 2]) == 15


def test_sort_dictionary_rejects_3d():
    with pytest.raises(ValueError):
        sort_dictionary(np.zeros((4, 3, 2)))


def test_view_dictionary_2d_and_3d(tmp_path):
    rng = np.random.default_rng(1)
    ax = view_dictionary(rng.uniform(size=(16, 4)), sort=True, logscale=True,
                         threshold=1e-3)
    assert ax.get_xlabel() == "Basis index"
    ax.figure.savefig(tmp_path / "nmf.png")
    ax3 = view_dictionary(rng.uniform(size=(16, 3, 4)), spacing=2, flipud=True)
    img = ax3.images[0].get_array()
    assert img.shape == (16, 3 * (4 + 2))  # K*(T+spacing) flatten
    ax3.figure.savefig(tmp_path / "cnmf.png")
    assert (tmp_path / "cnmf.png").stat().st_size > 0


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    V = rng.uniform(0.1, 1, (20, 30))
    res = nt.nmf(V, 4, maxiter=10, seed=1, dtype=np.float64)
    p = tmp_path / "ckpt.npz"
    save_factors(p, res)
    kw = load_factors(p)
    assert set(kw) == {"W_init", "H_init"}
    # resume: with the saved factors W/H should continue from the same cost
    res2 = nt.nmf(V, 4, maxiter=5, dtype=np.float64, **kw)
    assert res2.cost[0] <= res.cost[-1] + 1e-9
    raw = load_factors(p, as_inits=False)
    np.testing.assert_array_equal(raw["cost"], res.cost)


def test_checkpoint_multisource(tmp_path):
    rng = np.random.default_rng(3)
    V = rng.uniform(0.1, 1, (20, 30))
    res = nt.nmf(V, [3, 2], maxiter=5, seed=1, dtype=np.float64)
    p = tmp_path / "ms.npz"
    save_factors(p, res)
    kw = load_factors(p)
    assert isinstance(kw["W_init"], list) and len(kw["W_init"]) == 2
    res2 = nt.nmf(V, [3, 2], maxiter=3, dtype=np.float64, **kw)
    assert np.all(np.isfinite(res2.cost))


def test_profile_capture(tmp_path):
    from nmf_toolbox_tpu.utils.debug import profile_to
    import nmf_toolbox_tpu as nt
    rng = np.random.default_rng(5)
    V = rng.uniform(0.1, 1, (16, 20))
    with profile_to(str(tmp_path / "prof")):
        nt.nmf(V, 2, maxiter=3, dtype=np.float64)
    # a trace directory with at least one artifact must exist
    produced = list((tmp_path / "prof").rglob("*"))
    assert produced


def test_view_dictionary_cnmf_flatten_content():
    """The CNMF tensor flatten must place frame t of basis k at column
    k*(T+spacing)+t with -inf gap columns (ViewDictionary.m:66-74)."""
    rng = np.random.default_rng(6)
    m, K, T, sp = 5, 3, 4, 2
    W = rng.uniform(size=(m, K, T))
    ax = view_dictionary(W, spacing=sp)
    img = np.asarray(ax.images[0].get_array())
    expected = np.full((m, K * (T + sp)), -np.inf)
    for k in range(K):
        for t in range(T):
            expected[:, k * (T + sp) + t] = W[:, k, t]
    np.testing.assert_array_equal(img, expected)


def test_view_consensus():
    import matplotlib
    matplotlib.use("Agg")
    from nmf_toolbox_tpu.utils import view_consensus
    C = np.kron(np.eye(3), np.ones((4, 4)))
    # scramble the sample order; the dendrogram reorder must restore
    # crisp blocks (check: reordered image is block diagonal)
    rng = np.random.default_rng(0)
    p = rng.permutation(12)
    ax = view_consensus(C[np.ix_(p, p)])
    img = ax.images[0].get_array()
    assert img.shape == (12, 12)
    # every row has exactly 4 ones, contiguous after reordering
    for r in np.asarray(img):
        on = np.nonzero(r)[0]
        assert len(on) == 4 and on[-1] - on[0] == 3
    import pytest
    with pytest.raises(ValueError, match="square"):
        view_consensus(np.ones((3, 4)))
