"""Native C++ layer tests: hull correctness vs the Python chain, threaded
loader round-trips.  Skipped cleanly if no toolchain."""
import numpy as np
import pytest

from nmf_toolbox_tpu import native
from nmf_toolbox_tpu.utils.io import load_matrix, save_matrix

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="no C++ toolchain")


@needs_native
def test_native_hull_matches_support_function():
    rng = np.random.default_rng(0)
    for n in (10, 100, 5000):
        pts = rng.normal(size=(n, 2))
        idx = native.convhull2d(pts)
        hull = pts[idx]
        for a in np.linspace(0, 2 * np.pi, 48):
            d = np.array([np.cos(a), np.sin(a)])
            assert np.max(pts @ d) <= np.max(hull @ d) + 1e-9


@needs_native
def test_native_hull_degenerate():
    pts = np.array([[0.0, 0.0], [1.0, 1.0]])
    idx = native.convhull2d(pts)
    assert set(idx.tolist()) == {0, 1}
    # collinear points: hull is the two extremes (interior points dropped)
    pts = np.stack([np.arange(5.0), np.arange(5.0)], 1)
    idx = native.convhull2d(pts)
    assert 0 in idx and 4 in idx


@needs_native
def test_loader_npy_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    A = rng.normal(size=(513, 401)).astype(np.float32)
    p = str(tmp_path / "a.npy")
    save_matrix(p, A)
    B = load_matrix(p)
    np.testing.assert_array_equal(A, B)


@needs_native
def test_loader_raw_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    A = rng.normal(size=(100, 37)).astype(np.float64)
    p = str(tmp_path / "a.bin")
    save_matrix(p, A)
    B = load_matrix(p, shape=(100, 37), dtype=np.float64)
    np.testing.assert_array_equal(A, B)
    with pytest.raises(ValueError):
        load_matrix(p)  # raw needs shape/dtype


def test_python_hull_fallback_still_works():
    """chnmf init must work regardless of the native lib."""
    from nmf_toolbox_tpu.utils.init import convex_hull_anchors
    rng = np.random.default_rng(3)
    V = rng.uniform(size=(6, 80))
    S = convex_hull_anchors(V)
    assert S.shape[0] == 6 and S.shape[1] >= 3
