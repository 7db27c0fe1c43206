"""Phase-aware source separation with complex matrix factorization
(cmfwisa, King 2012): unlike magnitude-domain NMF, each source carries
its own phase matrix, so the separated estimates are complex and sum to
the mixture coherently.

Run: python examples/complex_separation.py
"""
import numpy as np
# repo root on sys.path so `python examples/x.py` works uninstalled
import pathlib as _pl
import sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import nmf_toolbox_tpu as nt


def main():
    rng = np.random.default_rng(0)
    m, n, kA, kB = 128, 300, 5, 5
    # two sources with distinct spectral dictionaries and random phases
    A = (rng.gamma(2.0, 1.0, (m, kA)) @ rng.gamma(0.8, 1.0, (kA, n))) \
        * np.exp(1j * rng.uniform(-np.pi, np.pi, (m, n)))
    B = (rng.gamma(2.0, 1.0, (m, kB)) @ rng.gamma(0.8, 1.0, (kB, n))) \
        * np.exp(1j * rng.uniform(-np.pi, np.pi, (m, n)))
    V = A + B  # complex mixture

    # learn magnitude bases from solo passages
    WA = np.asarray(nt.nmf(np.abs(A), kA, maxiter=150, seed=1).W)
    WB = np.asarray(nt.nmf(np.abs(B), kB, maxiter=150, seed=2).W)

    # joint complex factorization with both bases fixed
    res = nt.cmfwisa(V, [kA, kB], W_init=[WA, WB], W_fixed=True,
                     maxiter=150, tolerance=1e-10, seed=3)
    (HA, HB), (PA, PB) = res.H, res.P
    estA = (WA @ HA) * PA
    estB = (WB @ HB) * PB

    def sdr(ref, est):
        return 10 * np.log10(np.sum(np.abs(ref) ** 2)
                             / np.sum(np.abs(ref - est) ** 2))

    print(f"{res.n_iters} iterations, final cost {res.cost[-1]:.3e}")
    print(f"SDR source A: {sdr(A, estA):6.2f} dB")
    print(f"SDR source B: {sdr(B, estB):6.2f} dB")
    # the estimates reconstruct the mixture coherently
    rel = np.linalg.norm(V - (estA + estB)) / np.linalg.norm(V)
    print(f"mixture reconstruction rel err: {rel:.3f}")


if __name__ == "__main__":
    main()
