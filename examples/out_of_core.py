"""Out-of-core pipeline: train and encode a matrix wider than memory.

Production corpora routinely outgrow device (and even host) memory
along the sample axis.  This demo stages a matrix on DISK as a
memory-mapped .npy, then:

1. trains a dictionary with ``nt.nmf_streaming`` — online sufficient-
   statistics updates over column blocks (an approximation of the
   in-memory solve, Lefevre/Bach/Fevotte 2011 flavor), and
2. encodes the whole corpus with ``nt.nmf_encode_streaming`` — which is
   EXACT: with W frozen the MU H updates are column-local, so blockwise
   encoding reproduces the in-memory ``W_fixed`` trajectory bit for
   bit.  H is written straight into an output memmap, so neither V nor
   H is ever fully resident.

Run: python examples/out_of_core.py
"""
import tempfile
import pathlib

import numpy as np
# repo root on sys.path so `python examples/x.py` works uninstalled
import pathlib as _pl
import sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import nmf_toolbox_tpu as nt


def main():
    rng = np.random.default_rng(0)
    m, n, k = 96, 6000, 12   # demo-sized; the point is the access pattern
    block = 1024

    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        # Stage a low-rank-plus-noise corpus on disk block by block —
        # the full V never exists in this process' memory at once.
        Wtrue = rng.gamma(2.0, 1.0, (m, k)).astype(np.float32)
        v_path = td / "V.npy"
        V = np.lib.format.open_memmap(v_path, mode="w+", dtype=np.float32,
                                      shape=(m, n))
        for a in range(0, n, block):
            b = min(a + block, n)
            V[:, a:b] = (Wtrue @ rng.gamma(0.5, 1.0, (k, b - a))
                         + 0.01).astype(np.float32)
        V.flush()
        V = np.load(v_path, mmap_mode="r")   # read-only window from here

        # 1) stream-train the dictionary (online approximation)
        res = nt.nmf_streaming(V, k, block_size=block, epochs=10,
                               inner_iters=8, seed=1)
        print(f"trained: {res.n_iters} epochs, "
              f"per-epoch cost {np.round(res.cost, 1).tolist()}")

        # 2) exact out-of-core encode against the trained dictionary,
        #    H written in place into an output memmap
        out = np.lib.format.open_memmap(td / "H.npy", mode="w+",
                                        dtype=np.float32, shape=(k, n))
        enc = nt.nmf_encode_streaming(V, res.W, block_size=block,
                                      maxiter=60, seed=2, out=out)
        assert enc.H is out
        out.flush()

        # quality: blockwise relative reconstruction error
        num = den = 0.0
        for a in range(0, n, block):
            b = min(a + block, n)
            E = np.asarray(V[:, a:b]) - np.asarray(enc.W) @ out[:, a:b]
            num += float(np.sum(E * E))
            den += float(np.sum(np.asarray(V[:, a:b]) ** 2))
        rel = np.sqrt(num / den)
        print(f"encoded {n} columns in blocks of {block}: "
              f"relative reconstruction error {rel:.4f}")
        assert rel < 0.16, rel


if __name__ == "__main__":
    main()
