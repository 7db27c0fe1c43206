"""Wiener-filter separation utilities (utils/separation.py)."""
import numpy as np
import pytest

import nmf_toolbox_tpu as nt


def _two_source_fixture(seed=0, m=40, n=60, kA=4, kB=3):
    rng = np.random.default_rng(seed)
    WA = rng.gamma(2.0, 1.0, (m, kA)).astype(np.float32)
    WB = rng.gamma(2.0, 1.0, (m, kB)).astype(np.float32)
    HA = rng.gamma(0.5, 1.0, (kA, n)).astype(np.float32)
    HB = rng.gamma(0.5, 1.0, (kB, n)).astype(np.float32)
    return WA, HA, WB, HB


def test_masks_sum_to_one_and_nonneg():
    WA, HA, WB, HB = _two_source_fixture()
    M = np.asarray(nt.wiener_masks([WA, WB], [HA, HB]))
    assert M.shape == (2, 40, 60)
    assert np.all(M >= 0) and np.all(M <= 1 + 1e-6)
    np.testing.assert_allclose(M.sum(axis=0), 1.0, atol=1e-5)


def test_masks_uniform_where_models_vanish():
    WA, HA, WB, HB = _two_source_fixture()
    HA[:, 0] = 0.0
    HB[:, 0] = 0.0
    M = np.asarray(nt.wiener_masks([WA, WB], [HA, HB]))
    np.testing.assert_allclose(M[:, :, 0], 0.5, atol=1e-7)


def test_estimates_sum_to_mixture_exactly():
    WA, HA, WB, HB = _two_source_fixture(1)
    V = WA @ HA + WB @ HB + 0.3  # extra energy the models don't explain
    est = np.asarray(nt.separate(V, [WA, WB], [HA, HB]))
    np.testing.assert_allclose(est.sum(axis=0), V, rtol=1e-5)


def test_complex_mixture_reuses_phase():
    WA, HA, WB, HB = _two_source_fixture(2)
    rng = np.random.default_rng(3)
    mag = WA @ HA + WB @ HB
    V = (mag * np.exp(1j * rng.uniform(0, 2 * np.pi, mag.shape))
         ).astype(np.complex64)
    est = np.asarray(nt.separate(V, [WA, WB], [HA, HB]))
    assert est.dtype == np.complex64
    np.testing.assert_allclose(est.sum(axis=0), V, rtol=1e-4)
    # masks are real: each estimate's phase equals the mixture phase
    # wherever it has energy
    ph = np.angle(V)
    for i in range(2):
        nz = np.abs(est[i]) > 1e-3
        np.testing.assert_allclose(np.angle(est[i])[nz], ph[nz], atol=1e-5)


def test_ratio_mask_sdr_on_additive_mixture():
    """Magnitudes add exactly in this fixture, so the CONSISTENT mask is
    power=1 (ratio): with a perfect additive fit, est_i == W_i H_i, and
    with unmodeled energy the residual is shared proportionally.  (p=2
    Wiener is the right choice for uncorrelated complex STFT bins, where
    POWER adds — not for this synthetic additive-magnitude case.)"""
    rng = np.random.default_rng(4)
    WA, HA, WB, HB = _two_source_fixture(4, m=64, n=120)
    A = WA @ HA
    B = WB @ HB
    V = A + B
    # fit each source's encoding from the mixture with the true bases
    res = nt.nmf(V.astype(np.float32), [4, 3], W_init=[WA, WB],
                 W_fixed=True, maxiter=150, seed=5)
    HA_f, HB_f = res.H
    WA_n = np.asarray(res.W[0])
    WB_n = np.asarray(res.W[1])

    def sdr(ref, est):
        return 10 * np.log10(np.sum(ref ** 2) / np.sum((ref - est) ** 2))

    est = np.asarray(nt.separate(V, [WA_n, WB_n], [HA_f, HB_f], power=1.0))
    direct_A = WA_n @ HA_f
    # p=1 masking of a near-exact additive fit reproduces the direct
    # reconstruction (and additionally reassigns any residual).
    assert sdr(A, est[0]) >= sdr(A, direct_A) - 0.5
    assert sdr(A, est[0]) > 10.0
    np.testing.assert_allclose(est.sum(axis=0), V, rtol=1e-5)


def test_power_one_is_magnitude_ratio():
    WA, HA, WB, HB = _two_source_fixture(5)
    M1 = np.asarray(nt.wiener_masks([WA, WB], [HA, HB], power=1.0))
    f = np.stack([WA @ HA, WB @ HB])
    np.testing.assert_allclose(M1, f / f.sum(0, keepdims=True), rtol=1e-5)


def test_validation_errors():
    WA, HA, WB, HB = _two_source_fixture(6)
    with pytest.raises(TypeError, match="lists"):
        nt.wiener_masks(WA, HA)
    with pytest.raises(ValueError, match="matching"):
        nt.wiener_masks([WA], [HA, HB])
    V_bad = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="reconstruct"):
        nt.separate(V_bad, [WA, WB], [HA, HB])


def test_separate_convolutive_factors():
    """3-D (m, k, T) bases reconstruct through the convolutive sum, so
    cnmf-family factors (e.g. cnmf_encode output) separate directly."""
    from nmf_toolbox_tpu.ops.shift import reconstruct
    rng = np.random.default_rng(7)
    m, n, T = 24, 40, 3
    WA = rng.gamma(2.0, 1.0, (m, 3, T)).astype(np.float32)
    WB = rng.gamma(2.0, 1.0, (m, 2, T)).astype(np.float32)
    HA = rng.gamma(0.5, 1.0, (3, n)).astype(np.float32)
    HB = rng.gamma(0.5, 1.0, (2, n)).astype(np.float32)
    V = (np.asarray(reconstruct(WA, HA)) + np.asarray(reconstruct(WB, HB))
         + 0.2)
    est = np.asarray(nt.separate(V, [WA, WB], [HA, HB], power=1.0))
    assert est.shape == (2, m, n)
    np.testing.assert_allclose(est.sum(axis=0), V, rtol=1e-5)
    # mixed 2-D + 3-D factor lists also work (reconstruct handles each)
    est2 = np.asarray(nt.separate(V, [WA, WB[:, :, 0]], [HA, HB]))
    np.testing.assert_allclose(est2.sum(axis=0), V, rtol=1e-5)


def test_separate_composes_with_nmf2d_factors():
    """reconstruct's 3-D-H dispatch lets wiener masks consume nmf2d
    models directly: estimates still sum to the mixture exactly."""
    import nmf_toolbox_tpu as nt
    rng = np.random.default_rng(13)
    m, n = 20, 40
    A = rng.gamma(2.0, 1.0, (m, 3)) @ rng.gamma(0.7, 1.0, (3, n))
    B = rng.gamma(2.0, 1.0, (m, 3)) @ rng.gamma(0.7, 1.0, (3, n))
    V = (A + B).astype(np.float64)
    ra = nt.nmf2d(A, 2, 2, 2, maxiter=60, seed=1, tolerance=1e-30,
                  dtype=np.float64)
    rb = nt.nmf2d(B, 2, 2, 2, maxiter=60, seed=2, tolerance=1e-30,
                  dtype=np.float64)
    est = np.asarray(nt.separate(V, [np.asarray(ra.W), np.asarray(rb.W)],
                                 [np.asarray(ra.H), np.asarray(rb.H)]))
    np.testing.assert_allclose(est.sum(axis=0), V, rtol=1e-10)
    assert np.all(est >= 0)


def test_separate_waveforms_fused_decode_parity():
    """separate_waveforms == separate() + istft() per source, in one
    program with real-only boundaries (serving decode)."""
    rng = np.random.default_rng(5)
    x = rng.normal(size=4000).astype(np.float32)
    hop = 64
    Z = nt.stft(x, n_fft=256, hop_length=hop)
    P = nt.stft(x, n_fft=256, hop_length=hop, planes=True)
    mag = np.abs(np.asarray(Z))
    r = nt.nmf(mag, [3, 3], maxiter=40, seed=1)
    W = [np.asarray(w) for w in r.W]
    H = [np.asarray(h) for h in r.H]
    est = nt.separate(Z, W, H)
    want = np.stack([np.asarray(nt.istft(est[i], hop_length=hop,
                                         length=len(x))) for i in range(2)])
    got = np.asarray(nt.separate_waveforms(P, W, H, hop_length=hop,
                                           length=len(x)))
    assert got.shape == (2, len(x)) and not np.iscomplexobj(got)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # complex-Z entry point gives the same answer
    got_c = np.asarray(nt.separate_waveforms(Z, W, H, hop_length=hop,
                                             length=len(x)))
    np.testing.assert_allclose(got_c, got, atol=1e-6)
    # masks sum to 1 -> the sources sum back to the mixture waveform
    np.testing.assert_allclose(got.sum(0), np.asarray(
        nt.istft(Z, hop_length=hop, length=len(x))), atol=1e-5)


def test_separate_waveforms_validation():
    import pytest
    with pytest.raises(ValueError):
        nt.separate_waveforms(np.zeros((3, 65, 10), np.float32),
                              [np.ones((65, 2))], [np.ones((2, 10))],
                              hop_length=32)
