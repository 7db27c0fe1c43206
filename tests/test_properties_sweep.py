"""Systematic paper-derived property sweep across ALL solver families.

These assertions come from the papers/math, NOT from tests/oracle.py, so
they de-correlate the correctness chain from the oracle transliteration
(a misread of a reference update equation would be faithfully frozen in
the goldens but would generically break monotonicity or an invariant):

* **Monotone non-increasing cost** per supported divergence — every MU
  scheme here is a majorize-minimize step, and the reference's own
  convergence rule presumes descent (nmf.m:221); the projected-gradient
  solvers (nmfsc.m:155-175, cnmfsc.m:180-200) only accept steps that
  decrease the objective.
* **Factor nonnegativity** (the "N" of NMF; seminmf's W and convexnmf's
  V are the deliberate mixed-sign exceptions).
* **Normalization invariants hold after every iteration** (SURVEY
  §2.3.4): unit-L2 W columns (nmf.m:133,169; cmfwisa.m:154,193;
  constrainednmf.m:144-145), col-sum-1 W (lnmf.m:64,75), col-sum-1 G
  (convexnmf.m:83,95; chnmf.m:115,181; chcnmf.m:365), cross-frame
  Frobenius/T per basis element (cnmf.m:161-165,196-199), Hoyer-projected
  rows/columns at the requested sparseness (nmfsc.m:184-187;
  cnmfsc.m:204-209).  Checked at several trajectory depths: solvers are
  deterministic from (seed, init), so ``maxiter=d`` observes the state
  after exactly d iterations.
* **projfunc KKT feasibility** on fuzzed inputs: output satisfies
  ‖v‖₁ = k1, ‖v‖₂² = k2, v ≥ 0 (projfunc.m:3-7), including the signed
  mode (projfunc.m:15-19,57-60).
"""
import numpy as np
import pytest

import nmf_toolbox_tpu as nt

M, N, K, T, P = 24, 30, 4, 3, 2


def _data(seed=7):
    rng = np.random.default_rng(seed)
    return rng.uniform(0.1, 1.0, (M, N)).astype(np.float64)


def _labels(seed=7):
    rng = np.random.default_rng(seed + 1)
    lab = np.full(N, -1)
    lab[rng.choice(N, N // 3, replace=False)] = rng.integers(0, 3, N // 3)
    return lab


def _complex(seed=7):
    rng = np.random.default_rng(seed + 2)
    return (_data(seed) * np.exp(1j * rng.uniform(size=(M, N)))
            ).astype(np.complex128)


def _sym(seed=7):
    V = _data(seed)[:, :M]
    return (V + V.T) / 2


def hoyer(X, axis):
    """Hoyer sparseness of rows (axis=1) or columns (axis=0)."""
    d = X.shape[axis]
    l1 = np.abs(X).sum(axis)
    l2 = np.sqrt((X ** 2).sum(axis))
    return (np.sqrt(d) - l1 / l2) / (np.sqrt(d) - 1)


# --- invariant checkers (receive the Result) ------------------------------

def inv_w_unit_l2(r):
    np.testing.assert_allclose(np.sqrt((np.asarray(r.W) ** 2).sum(0)),
                               1.0, rtol=1e-10)


def inv_w_col_sum1(r):
    np.testing.assert_allclose(np.asarray(r.W).sum(0), 1.0, rtol=1e-10)


def inv_g_col_sum1(r):
    G = np.asarray(r.G)
    np.testing.assert_allclose(G.sum(0).ravel(), 1.0, rtol=1e-10)


def inv_w_cross_frame(r):
    W = np.asarray(r.W)
    np.testing.assert_allclose(np.sqrt((W ** 2).sum(axis=(0, 2))) / W.shape[2],
                               1.0, rtol=1e-10)


def inv_h_rows_projected(r):
    H = np.asarray(r.H)
    np.testing.assert_allclose(np.sqrt((H ** 2).sum(1)), 1.0, rtol=1e-8)
    np.testing.assert_allclose(hoyer(H, axis=1), 0.6, rtol=1e-7)


def inv_w_cols_projected(r):
    # W_sparsity mode keeps the learned column norms (no unit-L2 clamp)
    # but every column sits exactly at the requested Hoyer sparseness.
    np.testing.assert_allclose(hoyer(np.asarray(r.W), axis=0), 0.5,
                               rtol=1e-7)


def inv_none(r):
    pass


# --- case registry --------------------------------------------------------
# (id, runner(maxiter)->Result, invariant, nonneg factor fields,
#  relative per-step uptick tolerance for the monotonicity check)

STRICT = 1e-9    # provable MM descent, f64
LOOSE = 1e-7     # IS/AB MU and damped symnmf: descent holds empirically
                 # but near-stationary ties can uptick at roundoff scale

DIVS = [("euclidean", {}), ("kl", {}), ("is", {}),
        ("ab", dict(alpha=1.5, beta=0.5))]

# The AB α=0 dual (nmf.m:124-128,159-160) is NOT a descent scheme: its
# reference cost is ±Inf by MATLAB 1/0 semantics (nmf.m:214, so the
# convergence rule never fires), and the dual updates demonstrably
# diverge on generic data (V_hat reaches 1e131 in 8 iterations, matching
# the literal oracle to machine precision — see COMPAT.md #5).  It is
# therefore swept separately: parity properties only (factors finite,
# nonneg, invariant intact, cost reported as +Inf).
DUAL = dict(divergence="ab", alpha=0.0, beta=1.0)


def _div_kw(div, extra):
    return dict(divergence=div, **extra)


def _mk(fn, **kw):
    return lambda maxiter: fn(maxiter=maxiter, tolerance=0.0, seed=1,
                              dtype=np.float64, **kw)


CASES = []
for div, extra in DIVS:
    tol = STRICT if div in ("euclidean", "kl") else LOOSE
    CASES += [
        (f"nmf-{div}", _mk(nt.nmf, V=_data(), num_basis_elems=K,
                           **_div_kw(div, extra)),
         inv_w_unit_l2, ("W", "H"), tol),
        (f"cnmf-{div}", _mk(nt.cnmf, V=_data(), num_basis_elems=K,
                            context_len=T, **_div_kw(div, extra)),
         inv_w_cross_frame, ("W", "H"), tol),
        (f"constrainednmf-{div}", _mk(nt.constrainednmf, V=_data(),
                                      labels=_labels(), num_basis_elems=K,
                                      **_div_kw(div, extra)),
         inv_w_unit_l2, ("W", "Z"), tol),
        (f"nmf2d-{div}", _mk(nt.nmf2d, V=_data(), num_basis_elems=K,
                             context_len=T, pitch_len=P,
                             **_div_kw(div, extra)),
         inv_w_cross_frame, ("W", "H"), tol),
    ]
CASES += [
    ("lnmf", _mk(nt.lnmf, V=_data(), num_basis_elems=K),
     inv_w_col_sum1, ("W", "H"), STRICT),
    ("seminmf", _mk(nt.seminmf, V=_data() - 0.5, num_basis_elems=K),
     inv_none, ("H",), STRICT),
    ("convexnmf", _mk(nt.convexnmf, V=_data() - 0.5, num_basis_elems=K),
     inv_g_col_sum1, ("G", "H"), STRICT),
    ("chnmf", _mk(nt.chnmf, V=_data(), num_basis_elems=K),
     inv_g_col_sum1, ("G", "H"), STRICT),
    ("chcnmf", _mk(nt.chcnmf, V=_data(), num_basis_elems=K, context_len=T),
     inv_g_col_sum1, ("G", "H"), STRICT),
    ("nmfsc-H", _mk(nt.nmfsc, V=_data(), num_basis_elems=K,
                    H_sparsity=0.6),
     inv_h_rows_projected, ("W", "H"), STRICT),
    ("nmfsc-W", _mk(nt.nmfsc, V=_data(), num_basis_elems=K,
                    W_sparsity=0.5),
     inv_w_cols_projected, ("W", "H"), STRICT),
    ("cnmfsc", _mk(nt.cnmfsc, V=_data(), num_basis_elems=K, context_len=T,
                   H_sparsity=0.5),
     inv_none, ("W", "H"), STRICT),
    ("cmfwisa", _mk(nt.cmfwisa, V=_complex(), num_basis_elems=K),
     inv_w_unit_l2, ("W", "H"), STRICT),
    ("symnmf", _mk(nt.symnmf, A=_sym(), num_basis_elems=K),
     inv_none, ("H",), LOOSE),
]
IDS = [c[0] for c in CASES]


@pytest.mark.parametrize("case", CASES, ids=IDS)
def test_monotone_nonneg(case):
    """Cost non-increasing along the full trajectory; factors ≥ 0."""
    name, run, _inv, nonneg, tol = case
    r = run(12)
    c = np.asarray(r.cost, dtype=np.float64)
    valid = c[: int(r.n_iters) + 1] if len(c) else c
    assert np.all(np.isfinite(valid)), f"{name}: non-finite cost"
    d = np.diff(valid)
    allowed = tol * np.maximum(np.abs(valid[:-1]), 1e-300)
    bad = np.where(d > allowed)[0]
    assert bad.size == 0, \
        f"{name}: cost increased at steps {bad}: {d[bad]} vs {valid[bad]}"
    for f in nonneg:
        X = np.asarray(getattr(r, f))
        assert np.all(X >= 0), f"{name}: factor {f} went negative " \
                               f"(min {X.min()})"


@pytest.mark.parametrize("case", CASES, ids=IDS)
@pytest.mark.parametrize("depth", [1, 2, 5])
def test_normalization_invariant_each_iteration(case, depth):
    """The solver is deterministic from (seed, init), so maxiter=d
    observes the state after exactly d iterations — the invariant must
    hold at every depth, not just at convergence."""
    name, run, inv, _nonneg, _tol = case
    inv(run(depth))


DUAL_CASES = [
    ("nmf-dual", _mk(nt.nmf, V=_data(), num_basis_elems=K, **DUAL),
     inv_w_unit_l2, ("W", "H")),
    ("cnmf-dual", _mk(nt.cnmf, V=_data(), num_basis_elems=K,
                      context_len=T, **DUAL),
     inv_w_cross_frame, ("W", "H")),
    ("constrainednmf-dual", _mk(nt.constrainednmf, V=_data(),
                                labels=_labels(), num_basis_elems=K, **DUAL),
     inv_w_unit_l2, ("W", "Z")),
    ("nmf2d-dual", _mk(nt.nmf2d, V=_data(), num_basis_elems=K,
                       context_len=T, pitch_len=P, **DUAL),
     inv_w_cross_frame, ("W", "H")),
]


@pytest.mark.parametrize("case", DUAL_CASES, ids=[c[0] for c in DUAL_CASES])
def test_ab_dual_parity_properties(case):
    """AB α=0 dual: factors stay finite/nonnegative and the
    normalization invariant holds even though the reference objective is
    ±Inf by construction and the updates diverge on generic data."""
    name, run, inv, nonneg = case
    r = run(5)
    for f in nonneg:
        X = np.asarray(getattr(r, f))
        assert np.all(np.isfinite(X)), f"{name}: factor {f} non-finite"
        assert np.all(X >= 0), f"{name}: factor {f} negative"
    inv(r)
    c = np.asarray(r.cost, dtype=np.float64)
    assert np.all(np.isinf(c) | np.isnan(c)), \
        f"{name}: reference AB cost with alpha*beta==0 must be non-finite"


# --- projfunc KKT feasibility on fuzzed inputs ----------------------------

@pytest.mark.parametrize("seed", range(8))
def test_projfunc_kkt_fuzzed(seed):
    rng = np.random.default_rng(seed)
    dim = int(rng.integers(5, 200))
    sp = float(rng.uniform(0.05, 0.95))
    k2 = float(rng.uniform(0.25, 4.0))
    # Hoyer sparseness sp at L2 norm sqrt(k2) fixes the L1 target.
    k1 = (np.sqrt(dim) - sp * (np.sqrt(dim) - 1)) * np.sqrt(k2)
    s = rng.uniform(-1.0, 1.0, dim) if seed % 2 else rng.uniform(0, 1, dim)
    v, _iters = nt.projfunc(s.astype(np.float64), k1, k2)
    v = np.asarray(v)
    assert np.all(v >= -1e-12), f"negative entries: {v.min()}"
    np.testing.assert_allclose(np.abs(v).sum(), k1, rtol=1e-8)
    np.testing.assert_allclose((v ** 2).sum(), k2, rtol=1e-8)


@pytest.mark.parametrize("seed", range(4))
def test_projfunc_signed_mode_fuzzed(seed):
    rng = np.random.default_rng(100 + seed)
    dim = int(rng.integers(8, 64))
    sp = float(rng.uniform(0.2, 0.8))
    k1 = np.sqrt(dim) - sp * (np.sqrt(dim) - 1)
    s = rng.normal(size=dim)
    v, _ = nt.projfunc(s, k1, 1.0, nonneg=False)
    v = np.asarray(v)
    # signed mode: |v| satisfies the constraints, signs follow s
    np.testing.assert_allclose(np.abs(v).sum(), k1, rtol=1e-8)
    np.testing.assert_allclose((v ** 2).sum(), 1.0, rtol=1e-8)
    nz = np.abs(v) > 1e-12
    assert np.all(np.sign(v[nz]) == np.sign(s[nz]))
