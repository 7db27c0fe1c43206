"""Two-source magnitude-spectrogram separation with multi-source NMF.

Builds a synthetic mixture of a 'tonal' source (harmonic combs) and a
'percussive' source (broadband pulses), learns per-source bases from
solo passages with nmf, then separates the mixture with both bases fixed
— the reference toolbox's flagship use case (multi-source W_fixed
workflow, nmf.m:51-60).

Run: python examples/source_separation.py  (CPU-friendly, ~seconds)
"""
import numpy as np
# repo root on sys.path so `python examples/x.py` works uninstalled
import pathlib as _pl
import sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import nmf_toolbox_tpu as nt


def tonal(rng, m, n, n_tones=4):
    S = np.zeros((m, n))
    for _ in range(n_tones):
        f0 = rng.integers(4, m // 8)
        env = np.clip(rng.normal(0.5, 0.4, n), 0, None)
        for h in range(1, m // f0):
            S[h * f0, :] += env / h
    return S


def percussive(rng, m, n, n_hits=25):
    S = np.zeros((m, n))
    decay = np.exp(-np.arange(m) / (m / 3))
    for _ in range(n_hits):
        t = rng.integers(0, n)
        S[:, t] += decay * rng.uniform(0.5, 1.5)
    return S


def main():
    rng = np.random.default_rng(0)
    m, n = 257, 600
    A = tonal(rng, m, n) + 0.01
    B = percussive(rng, m, n) + 0.01
    mix = A + B

    # 1) learn a basis per source from solo material
    kA, kB = 16, 8
    WA, _, _ = nt.nmf(A.astype(np.float32), kA, maxiter=150, seed=1)
    WB, _, _ = nt.nmf(B.astype(np.float32), kB, maxiter=150, seed=2)

    # 2) separate the mixture: both bases fixed, encodings free
    res = nt.nmf(mix.astype(np.float32), [kA, kB], W_init=[WA, WB],
                 W_fixed=True, maxiter=200, seed=3)
    HA, HB = res.H
    est_A = WA @ HA
    est_B = WB @ HB

    def sdr(ref, est):
        return 10 * np.log10(np.sum(ref**2) / np.sum((ref - est) ** 2))

    print(f"converged in {res.n_iters} iterations, final cost {res.cost[-1]:.3e}")
    print(f"SDR tonal:      {sdr(A, est_A):6.2f} dB")
    print(f"SDR percussive: {sdr(B, est_B):6.2f} dB")
    assert sdr(A, est_A) > 5 and sdr(B, est_B) > 5

    # 3) soft-mask the mixture instead of trusting the models outright:
    #    nt.separate builds per-source ratio masks from the fitted models
    #    and multiplies the MIXTURE by them, so the estimates sum to the
    #    mixture exactly and unmodeled energy is shared proportionally
    #    (power=1 because these synthetic magnitudes add; use the default
    #    power=2 Wiener masks on complex STFT bins, where power adds).
    W_list = [np.asarray(w) for w in res.W]
    masked = np.asarray(nt.separate(mix.astype(np.float32), W_list,
                                    [HA, HB], power=1.0))
    np.testing.assert_allclose(masked.sum(axis=0), mix, rtol=1e-4)
    print(f"SDR tonal (ratio-masked):      {sdr(A, masked[0]):6.2f} dB")
    print(f"SDR percussive (ratio-masked): {sdr(B, masked[1]):6.2f} dB")


if __name__ == "__main__":
    main()
