"""Randomized config fuzzing of the phased nmfsc dispatch against the
fused solver: every sampled configuration must be bit-identical (the
module's core contract, beyond the handful of hand-picked configs in
test_nmfsc_phased.py)."""
import numpy as np
import pytest

import nmf_toolbox_tpu as nt

CASES = list(range(8))


@pytest.mark.parametrize("seed", CASES)
def test_phased_fuzz_bit_identical(seed):
    rng = np.random.default_rng(1000 + seed)
    m = int(rng.integers(10, 48))
    n = int(rng.integers(12, 56))
    k = int(rng.integers(2, 6))
    V = rng.uniform(0.05, 1.0, (m, n))
    W0 = rng.uniform(size=(m, k))
    H0 = rng.uniform(size=(k, n))
    H0 = H0 / np.sqrt((H0**2).sum(1, keepdims=True))
    kw = dict(maxiter=int(rng.integers(3, 14)),
              tolerance=float(rng.choice([1e-30, 1e-4, 1e-2])),
              dtype=np.float64)
    # at least one sparse factor (otherwise both paths are plain MU)
    which = rng.integers(0, 3)
    if which in (0, 2):
        kw["W_sparsity"] = float(rng.uniform(0.1, 0.85))
    if which in (1, 2):
        kw["H_sparsity"] = float(rng.uniform(0.1, 0.85))
    if rng.uniform() < 0.25:
        kw["W_fixed" if which == 1 else "H_fixed"] = True
    a = nt.nmfsc(V, k, W_init=W0, H_init=H0, **kw)
    b = nt.nmfsc(V, k, W_init=W0, H_init=H0, dispatch="phased",
                 spec_ahead=int(rng.integers(1, 6)), **kw)
    np.testing.assert_array_equal(b.W, a.W)
    np.testing.assert_array_equal(b.H, a.H)
    np.testing.assert_array_equal(np.asarray(b.cost), np.asarray(a.cost))
    assert b.n_iters == a.n_iters and b.converged == a.converged
