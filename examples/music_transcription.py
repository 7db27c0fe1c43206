"""Pitch-invariant note modelling with 2-D deconvolutional NMF (nmf2d).

On a LOG-frequency spectrogram a pitch transposition is a vertical
shift, so one nmf2d basis element — a time-varying spectral shape that
may slide down the frequency axis — covers every transposition of a
note.  Plain convolutive NMF needs one element per pitch.  The fitted
H (k, time, pitch) reads directly as a piano roll.

Run: python examples/music_transcription.py  (CPU-friendly, ~seconds)
"""
import numpy as np
# repo root on sys.path so `python examples/x.py` works uninstalled
import pathlib as _pl
import sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import nmf_toolbox_tpu as nt


def main():
    m, n, T, P = 48, 240, 3, 5
    # a harmonic comb with a 3-frame decay envelope — "the note"
    comb = np.zeros(m)
    comb[[6, 12, 18, 24]] = [1.0, 0.55, 0.3, 0.15]
    score = [(15, 0), (55, 2), (95, 4), (135, 1), (175, 3), (205, 0)]
    V = np.zeros((m, n))
    for onset, pitch in score:
        for t in range(T):
            V[:, onset + t] += np.roll(comb, pitch) * (1.0 - 0.28 * t)
    V = V.astype(np.float32) + 1e-4

    # ONE basis element, KL objective (the 2006 paper's setting).
    # Deconvolutional MU has seed-dependent local minima — standard
    # practice is a few restarts keeping the best objective.
    res = min((nt.nmf2d(V, 1, T, P, divergence="kl", maxiter=300,
                        seed=s, tolerance=1e-12) for s in (1, 2, 3)),
              key=lambda r: float(r.cost[-1]))
    W = np.asarray(res.W, np.float64)   # (m, 1, T) learned note shape
    H = np.asarray(res.H, np.float64)   # (1, n, P) piano roll

    # transcription: every played (onset, pitch) is the activation peak
    hits = 0
    for onset, pitch in score:
        if int(np.argmax(H[0, onset, :])) == pitch:
            hits += 1
    Lam = np.asarray(nt.reconstruct(W, H))  # dispatches on H's pitch axis
    rel = np.linalg.norm(Lam - V) / np.linalg.norm(V)

    # same budget of plain convolutive elements cannot cover 5 pitches
    c = nt.cnmf(V, 1, T, divergence="kl", maxiter=300, seed=3,
                tolerance=1e-12)
    relc = np.linalg.norm(np.asarray(nt.reconstruct(c.W, c.H)) - V) \
        / np.linalg.norm(V)

    print(f"nmf2d k=1: rel err {rel:.3f}; "
          f"transcribed {hits}/{len(score)} (onset, pitch) events")
    print(f"cnmf  k=1: rel err {relc:.3f} (no pitch axis — "
          f"{relc / rel:.1f}x worse fit with the same budget)")
    assert hits == len(score)
    assert rel < 0.1 and rel < 0.3 * relc

    # Serving: batch-transcribe NEW clips against the frozen note shape
    # (nmf2d_encode: one fused program for the whole batch; each
    # problem's H is its piano roll).  A learned dictionary may carry a
    # constant pitch offset (the model's shift gauge) — calibrate it
    # once from the training fit.
    rng = np.random.default_rng(1)
    off = (score[0][1] - int(np.argmax(H[0, score[0][0], :]))) % P
    new_scores = [[(20, int(rng.integers(0, P))),
                   (140, int(rng.integers(0, P)))] for _ in range(4)]
    Vs = np.stack([
        sum((np.pad(np.roll(comb, p_)[:, None] * (1.0 - 0.28 * t),
                    ((0, 0), (o + t, n - o - t - 1)))
             for o, p_ in ev for t in range(T)),
            np.zeros((m, n))) + 1e-4
        for ev in new_scores]).astype(np.float32)
    enc = nt.nmf2d_encode(Vs, W.astype(np.float32), P, divergence="kl",
                          maxiter=150, seed=2)
    got = sum((int(np.argmax(np.asarray(enc.H)[b, 0, o, :])) + off) % P == p_
              for b, ev in enumerate(new_scores) for o, p_ in ev)
    print(f"batched serving: transcribed {got}/8 events in new clips "
          f"(gauge offset {off})")
    assert got >= 7


if __name__ == "__main__":
    main()
