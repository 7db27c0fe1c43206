"""Generate the stored golden trajectories in tests/goldens/.

Run ONCE per golden (``python tests/make_goldens.py``) and commit the
npz files; existing files are never overwritten, so the stored
trajectories stay frozen even if the oracle is later edited — that
freeze is the whole point (PARITY.md: goldens are the oracle-independent
drift detector).  Each npz stores the full problem (V, inits, labels)
plus the oracle's factors and complete f64 cost trace at a small shape.

Behavior pinned is the reference's (file:line cites in tests/oracle.py);
paper-correct where the reference is buggy (chnmf.m:187, COMPAT.md).
"""
import pathlib

import numpy as np

import oracle

GOLD = pathlib.Path(__file__).parent / "goldens"


def _save(name, **arrs):
    path = GOLD / f"{name}.npz"
    if path.exists():
        print(f"  {name}: exists, skipped")
        return
    np.savez(path, **arrs)
    print(f"  {name}: written ({', '.join(sorted(arrs))})")


def main():
    rng = np.random.default_rng(42)
    m, n, k, T, p = 12, 16, 3, 3, 5

    # ---- lnmf (KL-based, col-sum-1 W, sqrt H update; lnmf.m:60-92)
    V = rng.gamma(2.0, 1.0, (m, n)) + 0.05
    W0 = rng.uniform(0.1, 1.0, (m, k))
    H0 = rng.uniform(0.1, 1.0, (k, n))
    W, H, cost = oracle.lnmf(V, W0, H0, maxiter=15, tolerance=1e-12)
    _save("lnmf", V=V, W0=W0, H0=H0, W=W, H=H, cost=cost)

    # ---- seminmf (mixed-sign V, exact W solve; seminmf.m:60-89)
    Vm = rng.standard_normal((m, n))
    W0 = rng.uniform(-1.0, 1.0, (m, k))
    H0 = rng.uniform(0.1, 1.0, (k, n))
    W, H, cost = oracle.seminmf(Vm, W0, H0, maxiter=15, tolerance=1e-12)
    _save("seminmf", V=Vm, W0=W0, H0=H0, W=W, H=H, cost=cost)

    # ---- convexnmf (V may be mixed-sign, Gram split; convexnmf.m:81-113)
    Vm = rng.standard_normal((m, n))
    G0 = rng.uniform(0.1, 1.0, (n, k))
    H0 = rng.uniform(0.1, 1.0, (k, n))
    W, H, G, cost = oracle.convexnmf(Vm, G0, H0, maxiter=15, tolerance=1e-12)
    _save("convexnmf", V=Vm, G0=G0, H0=H0, W=W, H=H, G=G, cost=cost)

    # ---- chnmf (hull anchors fixed, paper-correct H update; chnmf.m:169-199)
    V = rng.gamma(2.0, 1.0, (m, n)) + 0.05
    S = V[:, rng.choice(n, p, replace=False)].copy()
    G0 = rng.uniform(0.1, 1.0, (p, k))
    H0 = rng.uniform(0.1, 1.0, (k, n))
    W, H, G, cost = oracle.chnmf(V, S, G0, H0, maxiter=15, tolerance=1e-12)
    _save("chnmf", V=V, S=S, G0=G0, H0=H0, W=W, H=H, G=G, cost=cost)

    # ---- chcnmf (F-space incremental updates; chcnmf.m:297-438)
    V = rng.gamma(2.0, 1.0, (m, n)) + 0.05
    S = V[:, rng.choice(n, p, replace=False)].copy()
    G0 = rng.uniform(0.1, 1.0, (p, k, T))
    H0 = rng.uniform(0.1, 1.0, (k, n))
    W, H, G, cost = oracle.chcnmf(V, S, G0, H0, T, H_sparsity=0.05,
                                  maxiter=12, tolerance=1e-12)
    _save("chcnmf", V=V, S=S, G0=G0, H0=H0, W=W, H=H, G=G, cost=cost,
          T=np.int64(T), H_sparsity=np.float64(0.05))

    # ---- cmfwisa (complex, single source; cmfwisa.m:99-224)
    mag = rng.gamma(2.0, 1.0, (m, n)) + 0.05
    ph = rng.uniform(-np.pi, np.pi, (m, n))
    Vc = mag * np.exp(1j * ph)
    W0 = rng.uniform(0.1, 1.0, (m, k))
    H0 = rng.uniform(0.1, 1.0, (k, n))
    Wl, Hl, Pl, cost = oracle.cmfwisa(Vc, [W0], [H0], H_sparsity=[0.02],
                                      maxiter=15, tolerance=1e-12)
    _save("cmfwisa", V=Vc, W0=W0, H0=H0, W=Wl[0], H=Hl[0], P=Pl[0],
          cost=cost, H_sparsity=np.float64(0.02))

    # ---- constrainednmf (KL, partial labels; constrainednmf.m:144-267)
    V = rng.gamma(2.0, 1.0, (m, n)) + 0.05
    labels = np.full(n, -1)
    labels[:6] = rng.integers(0, 3, 6)      # 3 classes, 6 labeled, scattered
    rng.shuffle(labels)
    n_u = int(np.sum(labels == -1))
    W0 = rng.uniform(0.1, 1.0, (m, k))
    Z0 = rng.uniform(0.1, 1.0, (k, n_u + 3))
    W, H, Z, A, cost = oracle.constrainednmf(V, labels, W0, Z0,
                                             divergence="kl", maxiter=15,
                                             tolerance=1e-12)
    _save("constrainednmf_kl", V=V, labels=labels, W0=W0, Z0=Z0,
          W=W, H=H, Z=Z, A=A, cost=cost)

    # ---- cnmfsc (per-frame stepsizes + double buffer; cnmfsc.m:67-277)
    V = rng.gamma(2.0, 1.0, (m, n)) + 0.05
    W0 = rng.uniform(0.1, 1.0, (m, k, T))
    H0 = rng.uniform(0.1, 1.0, (k, n))
    W, H, cost = oracle.cnmfsc(V, W0, H0, T, W_sparsity=0.4, H_sparsity=0.5,
                               maxiter=10, tolerance=1e-12)
    _save("cnmfsc_sparse", V=V, W0=W0, H0=H0, W=W, H=H, cost=cost,
          T=np.int64(T), W_sparsity=np.float64(0.4),
          H_sparsity=np.float64(0.5))




def nmf2d_golden():
    """Append-mode golden (round 3): 2-D deconvolution, KL."""
    rng = np.random.default_rng(47)
    m, n, k, T, P = 12, 18, 2, 2, 3
    V = rng.gamma(2.0, 1.0, (m, n)) + 0.05
    W0 = rng.uniform(0.1, 1.0, (m, k, T))
    H0 = rng.uniform(0.1, 1.0, (k, n, P))
    W, H, cost = oracle.nmf2d(V, W0, H0, T, P, divergence="kl",
                              maxiter=15, tolerance=1e-12)
    _save("nmf2d_kl", V=V, W0=W0, H0=H0, W=W, H=H, cost=cost)


def symnmf_golden():
    """Append-mode golden (round 3): symmetric NMF."""
    rng = np.random.default_rng(48)
    n, k = 18, 3
    B = rng.uniform(0.1, 1.0, (n, k))
    A = B @ B.T + 0.05 * rng.uniform(size=(n, n))
    A = (A + A.T) / 2
    H0 = rng.uniform(0.1, 1.0, (n, k))
    H, cost = oracle.symnmf(A, H0, maxiter=15, tolerance=1e-12)
    _save("symnmf", A=A, H0=H0, H=H, cost=cost)


if __name__ == "__main__":
    main()
    nmf2d_golden()
    symnmf_golden()
