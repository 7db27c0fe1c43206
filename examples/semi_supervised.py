"""Semi-supervised clustering with constrained NMF (Liu & Wu 2010).

Labels a fraction of samples; the hard constraint H = Z A forces
same-class samples onto identical encodings, and the learned basis
clusters the unlabeled remainder.

Run: python examples/semi_supervised.py
"""
import numpy as np
# repo root on sys.path so `python examples/x.py` works uninstalled
import pathlib as _pl
import sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import nmf_toolbox_tpu as nt


def main():
    rng = np.random.default_rng(0)
    m, per_class, C = 60, 40, 3
    # three nonnegative class prototypes + noise
    protos = rng.gamma(2.0, 1.0, (m, C))
    X, y = [], []
    for c in range(C):
        X.append(protos[:, [c]] * rng.uniform(0.5, 1.5, (1, per_class))
                 + 0.05 * rng.gamma(1.0, 1.0, (m, per_class)))
        y += [c] * per_class
    V = np.concatenate(X, axis=1)
    y = np.array(y)

    # hide 70% of the labels
    labels = y.copy()
    hidden = rng.choice(len(y), int(0.7 * len(y)), replace=False)
    labels[hidden] = -1

    res = nt.constrainednmf(V, labels, C, maxiter=200, tolerance=1e-8,
                            seed=1, dtype=np.float64)
    # predict: each unlabeled sample takes the class of its largest
    # H-coordinate among the labeled class columns of A
    H = np.asarray(res.H)
    pred = np.argmax(H, axis=0)
    # map basis indices to classes via the labeled samples
    mapping = {}
    for c in range(C):
        idx = np.where(labels == c)[0]
        mapping[np.bincount(pred[idx]).argmax()] = c
    pred_classes = np.array([mapping.get(p, -1) for p in pred])
    acc = np.mean(pred_classes[hidden] == y[hidden])
    print(f"converged in {res.n_iters} iterations; "
          f"accuracy on hidden labels: {acc:.1%}")
    assert acc > 0.9


if __name__ == "__main__":
    main()
